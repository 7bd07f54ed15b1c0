"""Invariant and plan tests for the round-3 analytics additions:
TPC-H Q4/Q10/Q14/Q18 patterns, funnel, gap-fill, time-range window,
integer-exact outliers, fixed-point PageRank, BM25/AND search.

Value-level correctness is the oracle gate's job (tools/verify_oracle
and the driver); these tests pin semantic invariants the oracle can't
see (mass conservation, Chebyshev bounds, monotonicity) and the
physical-plan shapes that make the queries scale."""

from __future__ import annotations

import math

from kafka_to_parquet_spark.operators.graph import _ROUNDS, _T


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


# ---------------------------------------------------------------- funnel

def test_funnel_stage_counts_are_monotone(run):
    row = run("q_funnel").collect()[0]
    assert row.n_signup >= row.n_click >= row.n_purchase >= 0
    assert row.total_conv_s >= 0
    # conversion time only accrues when stage 3 is reached
    if row.n_purchase == 0:
        assert row.total_conv_s == 0


# --------------------------------------------------------------- gapfill

def test_gapfill_grid_is_dense_and_consistent(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load
    from pyspark.sql import functions as F

    rows = run("q_ts_gapfill").collect()
    assert len(rows) == 30 * 5  # full calendar x type grid, gaps filled
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    total = 0
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.d)
        cum = 0
        for r in rs:
            assert r.n >= 0
            cum += r.n
            assert r.cum == cum  # running total matches marginal counts
        total += cum
    expected = (
        load(spark, sf_dir, "events").filter(F.col("value") >= 480).count()
    )
    assert total == expected


# ---------------------------------------------------------- range window

def test_range_window_frame_bounds(run):
    rows = run("q_win_range_time").collect()
    # every event counts itself; trailing frame is never empty
    assert all(r.n_24h >= 1 for r in rows)
    # brute-force check the frame on one user
    uid = rows[0].user_id
    mine = sorted((r for r in rows if r.user_id == uid), key=lambda r: (r.es, r.event_id))
    es_list = [r.es for r in mine]
    for r in mine:
        n = sum(1 for e in es_list if r.es - 86399 <= e <= r.es)
        assert r.n_24h == n


# ------------------------------------------------------------- outliers

def test_outliers_satisfy_float_zscore_and_chebyshev(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").select("event_type", (F.round(F.col("value") * 100, 0)).alias("c")).collect()
    stats: dict[str, list] = {}
    for r in ev:
        stats.setdefault(r.event_type, []).append(r.c)
    out = run("q_outliers_zscore").collect()
    per_type: dict[str, int] = {}
    for r in out:
        cs = stats[r.event_type]
        n = len(cs)
        mean = sum(cs) / n
        var = sum((x - mean) ** 2 for x in cs) / n
        z = abs(r.cents - mean) / math.sqrt(var)
        assert z > 2.4999  # integer predicate agrees with float z-score
        assert r.grp_n == n
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
    for t, k in per_type.items():
        assert k <= len(stats[t]) / 6.25 + 1  # Chebyshev: P(|z|>2.5) <= 16%


# ------------------------------------------------------------- pagerank

def test_pagerank_mass_conserved_and_bounded(run):
    rows = run("q_graph_pagerank").collect()
    n = len(rows)
    total = sum(r.rank_units for r in rows)
    base = (15 * (_T // n)) // 100
    # every node keeps at least the teleport mass
    assert all(r.rank_units >= base for r in rows)
    # integer truncation loses < 1 unit per (edge, round) + rounding of
    # the 85% scaling; total mass stays within a small fraction of T
    assert 0.95 * _T <= total <= _T
    assert _ROUNDS == 3  # oracle SQL is generated for exactly this depth


def test_pagerank_joins_are_keyed(run):
    # per-round dataflow: keyed joins on src/dst only. The sole
    # nested-loop joins allowed are the broadcast of the 1-row params
    # relation (crossJoin(broadcast(par)) — one per rank generation).
    import re

    plan = plan_of(run("q_graph_pagerank"))
    assert "CartesianProduct" not in plan
    n_bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    assert n_bnlj == _ROUNDS + 1  # r0 + one per round, nothing else


# ------------------------------------------------------------------ bm25

def test_bm25_topk_docs_contain_query_terms(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.search import BM25_TERMS, _TOP_K
    from kafka_to_parquet_spark.tables import load

    rows = run("q_bm25").collect()
    assert 0 < len(rows) <= _TOP_K
    scores = [r.score_units for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    for r in rows:
        words = docs[r.doc_id].lower().split()
        assert any(t in words for t in BM25_TERMS)
        assert 1 <= r.n_terms <= len(BM25_TERMS)


def test_search_and_requires_all_terms(run, spark, sf_dir):
    from kafka_to_parquet_spark.llm.search import AND_TERMS
    from kafka_to_parquet_spark.tables import load

    rows = run("q_search_and").collect()
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    hit_ids = {r.doc_id for r in rows}
    for doc_id, text in docs.items():
        words = set(text.lower().split())
        assert (doc_id in hit_ids) == all(t in words for t in AND_TERMS)


# ------------------------------------------------------------ tpch plans

def test_q4_plans_left_semi(run):
    plan = plan_of(run("q_tpch_q4"))
    assert "LeftSemi" in plan


def test_q10_is_takeordered_with_broadcast_dims(run):
    plan = plan_of(run("q_tpch_q10"))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation


def test_q18_broadcasts_having_subquery(run):
    plan = plan_of(run("q_tpch_q18"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # big-orders list broadcast into orders
    rows = run("q_tpch_q18").collect()
    assert all(r.sum_qty > 250 for r in rows)


def test_q14_single_join_no_second_pass(run):
    plan = plan_of(run("q_tpch_q14"))
    # one broadcast join (part into lineitem), one global agg, no shuffle
    # of the fact side beyond the final single-row exchange
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- sessionize / locf / orc

def test_sessionize_partitions_all_events(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load

    rows = run("q_sessionize").collect()
    total_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total_events
    assert all(r.dur_s >= 0 and r.n_events >= 1 for r in rows)
    # session ordinals are dense per user, starting at 1
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.sess_seq)
    for seqs in by_user.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_locf_holds_after_first_observation(run):
    rows = run("q_ts_locf").collect()
    assert len(rows) == 30 * 5
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.d)
        seen = False
        for r in rs:
            if r.v_filled is not None:
                seen = True
            # once a value has been observed, LOCF never yields NULL again
            if seen:
                assert r.v_filled is not None


def test_orc_roundtrip_row_count(run, spark, sf_dir):
    from kafka_to_parquet_spark.tables import load

    assert run("q_orc_roundtrip").count() == load(spark, sf_dir, "orders").count()
