"""Round-10 tests: the RoundLoop per-round cache-release helper
(verdict item 5 — iterative kernels previously leaked O(rounds)
persisted node relations) plus recomputation checks that the
helper-rewritten loops still produce the pre-helper answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_to_parquet_spark.cache import RoundLoop


def _cached_rdd_ids(spark) -> set[int]:
    """Ids of RDDs currently holding cached blocks (storage info)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {infos[i].id() for i in range(len(infos)) if infos[i].isCached()}


def test_roundloop_bounds_cached_relations(spark):
    """After k steps, at most the LAST round's relation is still
    cached from the loop (plus whatever the suite cached elsewhere) —
    the O(rounds) accumulation is gone."""
    before = _cached_rdd_ids(spark)
    loop = RoundLoop()
    df = spark.range(1000).select(F.col("id"), F.lit(0).alias("v"))
    steps = []
    for i in range(5):
        df = loop.step(
            df.groupBy((F.col("id") % 100).alias("id")).agg(
                (F.sum("v") + F.lit(i)).alias("v")
            )
        )
        steps.append(df)
    after = _cached_rdd_ids(spark)
    new = after - before
    # Exactly one surviving cached relation: the final round.
    assert len(new) <= 1, f"RoundLoop leaked {len(new)} cached relations"
    # Earlier rounds are unpersisted.
    for s in steps[:-1]:
        assert s.storageLevel.useMemory is False
    assert steps[-1].storageLevel.useMemory is True
    # Result is still correct after its predecessors were released.
    assert steps[-1].count() == 100
    steps[-1].unpersist()


def test_roundloop_final_result_survives_predecessor_release(spark):
    """The double-reference round body (union + join, the SSSP shape)
    stays correct when round r−1's blocks are released after round r
    materializes — i.e. the release never forces a recompute through
    an evicted cache entry at answer time."""
    loop = RoundLoop()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    r = spark.createDataFrame([(1, 0)], ["node", "dist"])
    for _ in range(4):
        relaxed = edges.join(r, edges.src == r.node).select(
            F.col("dst").alias("node"), (F.col("dist") + F.lit(1)).alias("dist")
        )
        r = loop.step(
            r.unionByName(relaxed).groupBy("node").agg(
                F.min("dist").alias("dist")
            )
        )
    got = {(row.node, row.dist) for row in r.collect()}
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3), (5, 4)}
    r.unpersist()


def test_iterative_kernels_hold_bounded_storage(run, spark, sf_dir):
    """q_sssp_weighted's loop (deferred RoundLoop since the round-10
    bench guard flagged the eager policy's per-round-job cost): while
    the answer is live the cached rounds are bounded by the CONSTANT
    round count, and clear_result_caches releases every superseded
    round — no leak across samples/queries."""
    from kafka_to_parquet_spark.cache import clear_result_caches
    from kafka_to_parquet_spark.operators.batch8 import SSSP_ROUNDS

    assert SSSP_ROUNDS >= 4  # the test is vacuous for tiny round counts
    clear_result_caches(spark)
    before = _cached_rdd_ids(spark)
    run("q_sssp_weighted").collect()
    new = _cached_rdd_ids(spark) - before
    # edges + per-round distances, all bounded by the fixed constant.
    assert len(new) <= SSSP_ROUNDS + 2, (
        f"q_sssp_weighted holds {len(new)} cached relations; expected "
        f"<= SSSP_ROUNDS+2 — an unbounded accumulation crept in"
    )
    clear_result_caches(spark)
    after = _cached_rdd_ids(spark) & new
    # The deferred rounds are parked in a registered result-level
    # cache, so the sweep-boundary eviction releases them. (The edge
    # relation is a FEATURE cache and may legitimately stay warm.)
    assert len(after) <= 2, (
        f"{len(after)} of the loop's relations survived "
        "clear_result_caches — the deferred rounds were not registered"
    )


def test_roundloop_deferred_parks_rounds_for_sweep_release(spark):
    """Deferred policy: superseded rounds stay cached (one-job
    execution, in-job block reuse) but are parked under the cache
    registry and released by clear_result_caches."""
    from kafka_to_parquet_spark.cache import (
        _DEFERRED_ROUNDS,
        clear_result_caches,
    )

    key = (spark, "/tmp/_roundloop_test")
    loop = RoundLoop(*key)
    df = spark.range(100).select(F.col("id"), F.lit(0).alias("v"))
    steps = []
    for i in range(4):
        df = loop.step(
            df.groupBy((F.col("id") % 10).alias("id")).agg(
                (F.sum("v") + F.lit(i)).alias("v")
            )
        )
        steps.append(df)
    # single final action — the whole chain runs as one job
    assert steps[-1].count() == 10
    assert len(_DEFERRED_ROUNDS.get(key, [])) == 3  # all but the final
    cleared = clear_result_caches(spark, key[1])
    assert cleared >= 1 and key not in _DEFERRED_ROUNDS
    for s in steps[:-1]:
        assert not s.storageLevel.useMemory, "superseded round still persisted"


def test_roundloop_finish_parks_final_round(spark):
    """round-11 advisor fix: without finish(), the FINAL round stayed
    persisted and registered nowhere, so Spark's CacheManager matched
    the identical rebuilt plan on the next timed sample and served the
    memoized answer. finish() (and park() for auxiliary frames) put it
    under the registered result-level cache, so the sweep-boundary
    eviction forces real recomputation."""
    from kafka_to_parquet_spark.cache import (
        _DEFERRED_ROUNDS,
        clear_result_caches,
    )

    key = (spark, "/tmp/_roundloop_finish_test")
    loop = RoundLoop(*key)
    df = spark.range(64).select(F.col("id"), F.lit(0).alias("v"))
    for i in range(3):
        df = loop.step(
            df.groupBy((F.col("id") % 8).alias("id")).agg(
                (F.sum("v") + F.lit(i)).alias("v")
            )
        )
    aux = spark.range(4).persist()
    loop.park(aux)
    final = loop.finish()
    assert final is df and loop.finish() is None  # idempotent
    assert len(_DEFERRED_ROUNDS.get(key, [])) == 4  # 2 superseded + aux + final
    assert final.count() == 8
    assert final.storageLevel.useMemory  # still live for the caller's action
    clear_result_caches(spark, key[1])
    assert key not in _DEFERRED_ROUNDS
    assert not final.storageLevel.useMemory, "final round survived eviction"
    assert not aux.storageLevel.useMemory, "parked aux frame survived eviction"
    # and the answer recomputes correctly without the cache
    assert final.count() == 8
