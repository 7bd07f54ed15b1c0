"""100× stress: the SECOND decade (round-9 verdict item 3). Both
historical blowups (q_join_range_binned round 3, q_dedup_span_strip's
quantile-gate fix) were invisible below 10×, so one decade of stress
is a single data point on the scaling curve. This tool materializes
sf≈10 (60M lineitem / 500k 100-way-duplicated documents / 20k
vectors) by replicating the sf≈1 replica ×10 with key offsets and
times the most expensive families at sf≈1 AND sf≈10, reporting the
per-decade ratio next to the first decade's.

Interpretation discipline (carried from stress_big):

- RELATIONAL / ITERATIVE-GRAPH rows measure engine scaling: facts and
  edge multiplicity grow 10×, dimension/node sets stay fixed.
- DOCUMENT-PAIR rows run on UNIQUE-TEXT replication (every copy's
  tokens carry a copy suffix): intra-copy near-dup structure mirrors
  the fixture exactly, cross-copy shingle overlap is zero, so pair
  mass and candidate buckets grow LINEARLY with the corpus — "10×
  more unique data", the question a second decade should ask. Plain
  replication is the wrong corpus for this class at 100-way density:
  the first attempt ran the minhash family on 100-way exact families
  (4,950 intra-family pairs each, ~110× answer mass) and the verify
  leg's candidate-pair × shingle-array shuffle SPILLED THE DISK PAST
  80 GB — the measured, terminal form of the answer-bound blowup the
  split-leakage ordering note prices, and exactly why production runs
  exact dedup before any near-dup audit (SCALING.md round-10 note).
  Each pair query still reports its OUTPUT row count at both scales:
  time growing ~with output = output-bound (sound).
- EMBEDDING rows run on ×10-replicated vectors (vec_id offset): Lloyd
  / grid-density iterations are linear-per-round in n, so replication
  is a legitimate scale axis here (unlike the blocked pairwise ops,
  whose bucket granularity is a corpus-size function — the round-5
  argument — which is why none of those run on replicated vectors).

Usage: python tools/stress_sf10.py [--only q_a,q_b] [--sweeps 3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

# Artifact path is cwd-independent (the sf100 run from tools/ crashed
# at the final write with a relative path).
_SCALING_PATH = "/root/repo/SCALING.md"

from pyspark.sql import functions as F  # noqa: E402

from kafka_to_parquet_spark import registry  # noqa: E402
from kafka_to_parquet_spark.cache import clear_result_caches  # noqa: E402
from kafka_to_parquet_spark.session import get_spark  # noqa: E402

SF1 = "/tmp/ktps_sf1"
SF10 = "/tmp/ktps_sf10"
# Unique-text twins for the pair class: N suffixed copies of the
# sf0.1 documents (other tables symlinked from sf0.1 — the pair
# queries only read documents).
SF1P = "/tmp/ktps_sf1p"
SF10P = "/tmp/ktps_sf10p"
COPIES = 10

# sf≈1 keys were offset by i*10M from sf0.1; the second decade steps
# by 1B so the two offset schemes can never collide.
OFFSETS = {
    "lineitem": {"l_orderkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 0},
    "events": {"event_id": 1_000_000_000, "user_id": 0},
    "documents": {"doc_id": 1_000_000_000},
    "embeddings": {"vec_id": 1_000_000_000},
}

# (query, class) — class drives the note's interpretation column.
#   rel   = relational / fact-10× engine scaling
#   graph = iterative kernel, edge multiplicity 10× over a fixed node set
#   pairs = document near-dup pair join (answer-/cap-bound, outputs reported)
#   embed = replicated-vector iterative kernel
#   text  = vocabulary-bound corpus statistics (types ~flat, counts 10×)
QUERIES: list[tuple[str, str]] = [
    ("q_agg_groupby", "rel"),
    ("q_tpch_q9", "rel"),
    ("q_win_running_scalable", "rel"),
    ("q_join_range_binned", "rel"),
    ("q_dedup_span_strip", "pairs"),
    ("q_dedup_substring", "pairs"),
    ("q_dedup_minhash", "pairs"),
    ("q_dedup_jaccard_prefix", "pairs"),
    ("q_winnowing_fingerprint", "pairs"),
    ("q_dedup_components", "pairs"),
    ("q_sssp_weighted", "graph"),
    ("q_graph_modularity", "graph"),
    ("q_graph_pagerank", "graph"),
    ("q_graph_triangles", "graph"),
    ("q_bpe_learn_k", "text"),
    ("q_suffix_lrs", "text"),
    ("q_kmeans3", "embed"),
    ("q_cluster_dbscan_grid", "embed"),
    # round-11 batch10 data-heavy additions (bench folds them to
    # BENCH_OMITTED; their scale evidence lives here):
    ("q_dup_width_curve", "pairs"),
    ("q_filter_venn", "pairs"),
]

SECTION = "## 100× stress (sf≈10, built by tools/stress_sf10.py)"


def _stale(out: str, src: str) -> bool:
    if not os.path.exists(out):
        return True
    return os.path.getmtime(out) < os.path.getmtime(src)


def build(spark) -> None:
    """sf≈10 = sf≈1 replica ×10 (and ×10 embeddings straight from
    sf0.1×10 since stress_big leaves embeddings unreplicated)."""
    os.makedirs(SF10, exist_ok=True)
    for table, offs in OFFSETS.items():
        out = f"{SF10}/{table}.parquet"
        src = (f"{SF1}/{table}.parquet" if table != "embeddings"
               else "/root/testdata/sf0.1/embeddings.parquet")
        if not _stale(out, src) and not os.path.islink(out):
            continue
        if os.path.islink(out):
            os.remove(out)
        base = spark.read.parquet(src)
        parts = []
        for i in range(COPIES):
            df = base
            for col, step in offs.items():
                if step:
                    df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(out)
    for t in ("region", "nation", "customer", "supplier", "part"):
        link = f"{SF10}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", link)


def build_pair_corpora(spark) -> None:
    """Unique-text replication for the pair class: copy i of a
    document suffixes EVERY token with 'q{i}', so Jaccard within a
    copy equals the fixture's, cross-copy shingle overlap is zero, and
    near-dup pair mass grows linearly with the corpus."""
    src = "/root/testdata/sf0.1/documents.parquet"
    for out_dir, copies in ((SF1P, COPIES), (SF10P, COPIES * 10)):
        os.makedirs(out_dir, exist_ok=True)
        out = f"{out_dir}/documents.parquet"
        if not _stale(out, src):
            continue
        base = spark.read.parquet(src)
        parts = []
        for i in range(copies):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                    F.expr(
                        "array_join(transform(split(text, '\\\\s+'),"
                        f" t -> concat(t, 'q{i}')), ' ')"
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(out)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            link = f"{out_dir}/{t}.parquet"
            if not os.path.exists(link):
                os.symlink(f"/root/testdata/sf0.1/{t}.parquet", link)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--sweeps", type=int, default=3)
    args = ap.parse_args()
    queries = QUERIES
    if args.only:
        only = set(args.only.split(","))
        unknown = only - {n for n, _ in QUERIES}
        if unknown:
            raise SystemExit(f"--only names not in sf10 QUERIES: {sorted(unknown)}")
        queries = [(n, c) for n, c in QUERIES if n in only]

    registry.load_all()
    spark = get_spark("stress_sf10")

    from stress_big import build as build_sf1

    build_sf1(spark)
    build(spark)
    build_pair_corpora(spark)
    n_li = spark.read.parquet(f"{SF10}/lineitem.parquet").count()
    print(f"sf10 lineitem rows: {n_li:,}")

    cls = dict(QUERIES)

    def dirs_for(name: str) -> tuple[str, str]:
        return (SF1P, SF10P) if cls[name] == "pairs" else (SF1, SF10)

    def run_once(name: str, where: str) -> float:
        """noop-sink execution — same timing discipline as stress_big,
        so this table's t(sf≈1) column is directly comparable to the
        stress table's t(sf≈1)."""
        t0 = time.time()
        registry.QUERIES[name](spark, where).write.format("noop").mode(
            "overwrite").save()
        return time.time() - t0

    cells = [(n, w) for n, _ in queries for w in dirs_for(n)]
    clear_result_caches(spark)
    outs: dict[tuple[str, str], int] = {}
    for name, where in cells:  # warm-up pass doubles as the n_out probe
        outs[(name, where)] = registry.QUERIES[name](spark, where).count()
        print(f"warm {name} @ {where}: {outs[(name, where)]:,} rows", flush=True)
    samples: dict[tuple[str, str], list[float]] = {c: [] for c in cells}
    for _ in range(args.sweeps):
        clear_result_caches(spark)
        for name, where in cells:
            samples[(name, where)].append(run_once(name, where))
    noisy = [c for c in cells
             if max(samples[c]) / max(min(samples[c]), 1e-9) > 2.0]
    for _ in range(2 if noisy else 0):
        clear_result_caches(spark)
        for name, where in noisy:
            samples[(name, where)].append(run_once(name, where))

    lines = [
        SECTION, "",
        f"lineitem = {n_li:,} rows (10× the sf≈1 replica, 1B key offsets);",
        "rel/graph/text classes ride plain replication (100-way duplicate",
        "documents, ×10 edge multiplicity); the PAIR class rides unique-",
        "text suffixed replication (ktps_sf1p/sf10p — linear pair mass;",
        "plain 100-way replication disk-spills the verify leg, see tool",
        "docstring); embeddings ×10 (20k vectors). Median of",
        f"{args.sweeps} interleaved noop-sink sweeps after a count warm-up.",
        "`n_out` columns expose output growth per class.", "",
    ]
    if noisy:
        lines.append("Resampled (base spread >2x, 5-sample median): "
                     + ", ".join(sorted({n for n, _ in noisy})) + ".")
        lines.append("")
    lines += ["| query | class | t(sf≈1) | t(sf≈10) | ratio | n_out sf≈1 | n_out sf≈10 |",
              "|---|---|---|---|---|---|---|"]
    for name, c in queries:
        lo, hi = dirs_for(name)
        t1 = statistics.median(samples[(name, lo)])
        t10 = statistics.median(samples[(name, hi)])
        lines.append(
            f"| {name} | {c} | {t1:.2f}s | {t10:.2f}s | {t10 / t1:.1f}× |"
            f" {outs[(name, lo)]:,} | {outs[(name, hi)]:,} |")
        print(lines[-1], flush=True)

    note = "\n".join(lines) + "\n"
    with open(_SCALING_PATH) as f:
        old = f.read()
    idx = old.find(SECTION)
    if idx != -1:
        nxt = old.find("\n## ", idx + 1)
        rest = old[nxt + 1:] if nxt != -1 else ""
        if args.only:
            # incremental merge: replace only the measured rows
            sec = old[idx: nxt if nxt != -1 else len(old)]
            new_rows = {ln.split("|")[1].strip(): ln
                        for ln in lines if ln.startswith("| q_")}
            sec_lines = sec.split("\n")
            for i, ln in enumerate(sec_lines):
                if ln.startswith("| q_"):
                    qn = ln.split("|")[1].strip()
                    if qn in new_rows:
                        sec_lines[i] = new_rows.pop(qn)
            pipe = [i for i, ln in enumerate(sec_lines) if ln.startswith("|")]
            last = pipe[-1] if pipe else len(sec_lines) - 1
            for qn in [q for q, _ in queries if q in new_rows]:
                last += 1
                sec_lines.insert(last, new_rows[qn])
            with open(_SCALING_PATH, "w") as f:
                f.write(old[:idx] + "\n".join(sec_lines) + ("\n" + rest if rest else ""))
            return
        old = old[:idx] + rest
    if not old.endswith("\n"):
        old += "\n"
    with open(_SCALING_PATH, "w") as f:
        f.write(old + "\n" + note)


if __name__ == "__main__":
    main()
