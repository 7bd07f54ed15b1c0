"""Invariant and plan tests for the fourth TPC-H batch (Q1/Q2/Q9/Q11/
Q12/Q15/Q16/Q19/Q20/Q21 patterns) — the batch that completes all 22
classic decision-support shapes.

Value-level correctness is the oracle gate's job (tools/verify_oracle
and the driver); these pin semantic invariants the oracle can't see
(conservation, bounds, brute-force spot checks) and the physical plan
shapes that make the queries scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_to_parquet_spark.tables import load


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ------------------------------------------------------------------- q1

def test_q1_measures_are_consistent(run):
    rows = run("q_tpch_q1").collect()
    assert rows
    for r in rows:
        # disc price ≤ base price; charge ≥ disc price (tax ≥ 0)
        assert r.sum_disc_price <= r.sum_base_price + 1e-6
        assert r.sum_charge >= r.sum_disc_price - 1e-6
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9
        assert 0.0 <= r.avg_disc <= 0.1
    # group keys unique
    keys = [(r.l_returnflag, r.l_linestatus) for r in rows]
    assert len(set(keys)) == len(keys)


def test_q1_scan_bound_plan(run):
    plan = plan_of(run("q_tpch_q1"))
    # no join anywhere; shipdate filter pushed to the parquet scan
    assert "Join" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan


# ------------------------------------------------------------------- q2

def test_q2_rows_are_the_per_part_minimum(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import (
        Q2_MAX_SIZE,
        Q2_REGION,
        Q2_TYPE,
    )

    rows = run("q_tpch_q2").collect()
    assert rows
    # brute-force recompute of the per-part min unit price
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    supp = (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    base = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            "l_partkey",
            (F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 1000 + 0.5))
            .cast("long")
            .alias("milli"),
        )
        .collect()
    )
    mins: dict[int, int] = {}
    for r in base:
        mins[r.l_partkey] = min(mins.get(r.l_partkey, 1 << 62), r.milli)
    assert {r.p_partkey for r in rows} == set(mins)
    for r in rows:
        assert abs(r.unit_price - mins[r.p_partkey] / 1000.0) < 1e-9


# ------------------------------------------------------------------- q9

def test_q9_profit_is_revenue_minus_cost(run, spark, sf_dir):
    rows = run("q_tpch_q9").collect()
    assert rows
    years = {r.o_year for r in rows}
    assert years <= set(range(1995, 2002))
    # nation names come from the supplier dimension
    nations = {
        r.n_name for r in load(spark, sf_dir, "nation").select("n_name").collect()
    }
    assert {r.nation for r in rows} <= nations


# ------------------------------------------------------------------ q11

def test_q11_gate_is_above_average(run):
    rows = run("q_tpch_q11").collect()
    assert rows, "the 3/2-average gate must be non-degenerate at sf0.001"
    values = [r.value for r in rows]
    # every surviving part is strictly above 3/2 of the average value
    # of the FULL per-part table; the full average is below the
    # survivors' average, so a weak sanity bound:
    assert min(values) > 0


def test_q11_no_fact_sized_broadcast(run):
    plan = plan_of(run("q_tpch_q11"))
    # the 1-row total is broadcast; the per-part table is not rebuilt
    # via nested loop
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ q12

def test_q12_buckets_partition_the_lines(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import (
        Q12_YEAR_HI,
        Q12_YEAR_LO,
    )

    rows = run("q_tpch_q12").collect()
    assert {r.ship_bucket for r in rows} <= {"FAST", "SLOW", "LATE"}
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q12_YEAR_LO} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q12_YEAR_HI} 00:00:00").cast("timestamp"))
    )
    n_lines = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == n_lines


# ------------------------------------------------------------------ q15

def test_q15_winner_has_max_revenue(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import Q15_HI, Q15_LO

    rows = run("q_tpch_q15").collect()
    assert rows
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q15_LO} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q15_HI} 00:00:00").cast("timestamp"))
    )
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000,
                        0,
                    ).cast("long")
                )
                / 10000.0
            ).alias("rev")
        )
        .collect()
    )
    best = max(r.rev for r in per_supp)
    winners = {r.l_suppkey for r in per_supp if r.rev == best}
    assert {r.s_suppkey for r in rows} == winners
    for r in rows:
        assert abs(r.total_revenue - best) < 1e-9


# ------------------------------------------------------------------ q16

def test_q16_excludes_complaint_suppliers(run, spark, sf_dir):
    rows = run("q_tpch_q16").collect()
    assert rows
    n_good = (
        load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0).count()
    )
    for r in rows:
        assert 1 <= r.supplier_cnt <= n_good
    from kafka_to_parquet_spark.operators.tpch_batch4 import (
        Q16_EXCL_BRAND,
        Q16_EXCL_TYPE,
        Q16_SIZES,
    )

    for r in rows:
        assert r.p_brand != Q16_EXCL_BRAND
        assert r.p_type != Q16_EXCL_TYPE
        assert r.p_size in Q16_SIZES


# ------------------------------------------------------------------ q19

def test_q19_plans_as_hash_join_not_nested_loop(run):
    plan = plan_of(run("q_tpch_q19"))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q19_bracket_membership(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import Q19_BRACKETS

    row = run("q_tpch_q19").collect()[0]
    # brute-force count
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand", "p_size", "l_quantity"
    )
    n = 0
    for r in joined.collect():
        for b, sz, qlo, qhi in Q19_BRACKETS:
            if r.p_brand == b and 1 <= r.p_size <= sz and qlo <= r.l_quantity <= qhi:
                n += 1
                break
    assert row.n_lines == n


# ------------------------------------------------------------------ q20

def test_q20_winners_dominate_some_part(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import (
        Q20_HI,
        Q20_LO,
        Q20_NAME_PREFIX,
        Q20_REGION,
    )

    rows = run("q_tpch_q20").collect()
    assert rows
    # suppliers are unique and from the chosen region
    keys = [r.s_suppkey for r in rows]
    assert len(set(keys)) == len(keys)
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    region_supp = {
        r.s_suppkey
        for r in load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
        .collect()
    }
    assert set(keys) <= region_supp
    # spot-check dominance for one winner via brute force
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q20_LO} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q20_HI} 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"{Q20_NAME_PREFIX}%")
    )
    qual = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    totals: dict[int, float] = {}
    by_pair: dict[tuple[int, int], float] = {}
    for r in qual.collect():
        totals[r.l_partkey] = totals.get(r.l_partkey, 0) + r.l_quantity
        k = (r.l_partkey, r.l_suppkey)
        by_pair[k] = by_pair.get(k, 0) + r.l_quantity
    dominators = {
        s for (p, s), q in by_pair.items() if 2 * q > totals[p]
    } & region_supp
    assert set(keys) == dominators


# ------------------------------------------------------------------ q21

def test_q21_numwait_counts_unique_latest_supplier_orders(run, spark, sf_dir):
    from kafka_to_parquet_spark.operators.tpch_batch4 import Q21_STATUS, Q21_TOPK

    rows = run("q_tpch_q21").collect()
    assert rows
    assert len(rows) <= Q21_TOPK
    # monotone non-increasing numwait in report order
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)
    # brute force per-order reconstruction
    orders = {
        r.o_orderkey
        for r in load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == Q21_STATUS)
        .select("o_orderkey")
        .collect()
    }
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    )
    per_order: dict[int, list] = {}
    for r in li:
        if r.l_orderkey in orders:
            per_order.setdefault(r.l_orderkey, []).append(r)
    numwait: dict[int, int] = {}
    for ok, lines in per_order.items():
        supps = {r.l_suppkey for r in lines}
        if len(supps) < 2:
            continue
        mx = max(r.l_shipdate for r in lines)
        late = {r.l_suppkey for r in lines if r.l_shipdate == mx}
        if len(late) == 1:
            s = next(iter(late))
            numwait[s] = numwait.get(s, 0) + 1
    expect = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:Q21_TOPK]
    assert [(r.s_suppkey, r.numwait) for r in rows] == expect


def test_q21_single_exchange_family(run):
    plan = plan_of(run("q_tpch_q21"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- plan-shape pins

def _n_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_single_shuffle_plans(run):
    """Q1 (pure scan-agg), Q9 (broadcast chain + one fact join), and
    Q19 (broadcast join + residual) must each carry exactly ONE
    exchange — the property PLANS.md records; a regression to a second
    fact shuffle is the 100 TB failure mode."""
    for name in ("q_tpch_q1", "q_tpch_q9", "q_tpch_q19"):
        plan = plan_of(run(name))
        assert _n_exchanges(plan) == 1, f"{name}: {_n_exchanges(plan)} exchanges"


def test_q21_single_fact_pass(run):
    """The reformulated Q21 aggregates lineitem to (order, supplier)
    rows immediately; the per-order join-back must be against that
    collapsed table, so the plan contains exactly one scan of
    lineitem... which Spark may clone per join branch — what must NOT
    appear is a join of the per-order aggregate back onto raw
    lineitem-grain rows carrying l_shipdate."""
    plan = plan_of(run("q_tpch_q21"))
    # the late filter happens on smax (supplier-level), never on a
    # raw l_shipdate column post-aggregation
    assert "smax" in plan
