"""Headline benchmark for the driver (BENCH_r{N}.json).

Runs a representative subset of the declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_queries_total", "value": N, "unit": "sec",
     "queries": {"q_agg_groupby": sec, ...}, "sf": 0.1}

Each query is executed end-to-end with the ``noop`` sink, which runs
the full physical plan JVM-side (scan → shuffle → agg/join/window)
without driver-side collection — so timings reflect the distributed
plan, not toPandas serialization.

Timing protocol: ``$SPARK_GRAFT_BENCH_ITERS`` (default 3) full
round-robin sweeps over the headline list; the reported per-query
number is the MEDIAN across sweeps. Round 1→2 showed ~20% uniform
wall-time drift on completely unchanged code (container load), so a
single-shot timing can't distinguish noise from regression; medians
across interleaved sweeps can. Queries that memoize a shared subtree
(simhash fingerprints, angular signatures) are consequently measured
at steady state from sweep 2 on — the median reports the engine's
repeated-query latency, matching the sf0.001 plan warm-up philosophy.

Interleaving alone proved insufficient twice (round 4's embeddings
trio, round 5's q_graph_triangles at 3.5× its isolated time): a
multi-minute GC/page-cache episode spans all three visits to one
query because consecutive sweeps revisit it at the same ~80 s stride.
Queries whose base samples spread past 2× (max/min) therefore get
EXTRA_SWEEPS additional timed runs appended after the base sweeps —
with 5 samples a spike must own 3 disjoint visits to move the median,
which a transient episode cannot.

That resampler is blind to a query that is CONSISTENTLY slow across
all its visits (tight median, wrong level). The cross-artifact guard
(scaling_isolated_figures / xguard_suspects below) triangulates each
sweep median against the query's independent t(sf0.1) figure in
SCALING.md's stress table and re-measures flagged queries isolated at
the end of the run — BENCH_LOCAL.json records all three numbers under
"xguard"; stdout carries only confirmed regressions ("xguard_regressed").

Stdout-key encoding: the driver captures only a ~2000-char tail of
stdout, so the line prints canonical full ``q_*`` names (round 6's
prefix-stripping made cross-round key comparison need normalization —
reverted per the round-6 verdict) with per-query values at 1 decimal.
To fit the budget with full names, variant twins are benched through
ONE family representative — the machine-readable mapping is
FAMILY_REPS below (round-7 verdict item 5: a regression in a folded
member must be traceable to the rep that stands for it); every folded
query keeps its correctness gate, and the heavy ones keep SCALING.md
rows. BENCH_LOCAL.json (written beside this file on every run) keeps
full precision and the raw samples.

Feature-store honesty (round-12 verdict item 4): feature-level caches
stay warm across sweeps by design (they model a shared feature store),
so per-query medians are WARM-kernel figures. The one-time build cost
is reported separately as ``feature_build_total`` (sum of first-sample
overhang above each query's warm median) — full key in
BENCH_LOCAL.json, compact ``fbt`` on the stdout line — so the headline
total is never mistaken for end-to-end cold cost.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_to_parquet_spark import registry
from kafka_to_parquet_spark.session import get_spark

# Representative mix: heavy scan+agg, shuffle joins, windows, sort,
# LLM ops (dedup/similarity/text), streaming-window batch analogs.
HEADLINE = [
    "q_agg_groupby",       # TPC-H-Q1-style hash agg over lineitem
    "q_agg_rollup",        # grouping sets
    "q_tpch_q3",           # join + agg + top-k composite
    "q_tpch_q5",           # 6-table join, broadcast dims
    "q_tpch_q6",           # pushdown-heavy filter agg
    "q_join_asof",         # union+window as-of join
    "q_agg_salted",        # two-phase skew-safe agg
    "q_join_inner",        # orders ⋈ customer ⋈ nation (shuffle + broadcast)
    "q_join_semi_anti",    # semi/anti
    "q_join_range_binned", # big x big range join via bin-equi + residual
    "q_join_skew_salted",  # salted fact x replicated dim skew join
    "q_win_running_scalable",  # two-level prefix-sum (hot-key scale path)
    "q_sort",              # global range-partitioned sort
    "q_dedup_simhash",     # simhash fingerprints
    "q_dedup_ngram_jaccard",  # inverted-index similarity join
    "q_dedup_minhash_lsh", # MLlib MinHash LSH candidate pairs
    "q_dedup_embedding_lsh",  # angular-LSH near-dup (100 TB shape)
    "q_dedup_components",  # min-label-propagation dup clustering
    "q_sim_topk",          # brute-force cosine top-k
    "q_sim_ivf",           # IVF-bucketed ANN
    "q_udf_pandas_cosine", # Arrow pandas-UDF path
    "q_agg_stats",         # exact-moment corr/covar
    "q_agg_percentile",    # exact per-group percentiles
    "q_text_quality",      # quality scoring pipeline
    "q_decontaminate",     # broadcast n-gram benchmark decontamination
    "q_chunk_docs",        # context-window chunking fan-out
    "q_pack_greedy",       # stateful applyInPandas sequence packing
    "q_corpus_shuffle",    # two-level deterministic permutation
    "q_stream_tumbling",   # event-time tumbling window (batch analog)
    "q_tpch_q10",          # returned-items top-k, broadcast dims
    "q_tpch_q18",          # HAVING-subquery broadcast join
    "q_funnel",            # 3-stage ordered funnel on user_id
    "q_win_range_time",    # trailing-24h range window per user
    "q_graph_pagerank",    # 3-round integer fixed-point PageRank
    "q_bm25",              # BM25 top-k retrieval
    "q_tpch_q7",           # bilateral nation-pair volume, 5-dim broadcast chain
    "q_tpch_q13",          # left-outer count histogram (agg-before-join)
    "q_vocab_topk",        # vocabulary head (explode + two-level agg)
    "q_tpch_q1",           # full pricing-summary measure set (scan-bound)
    "q_tpch_q9",           # 5-table profit rollup (broadcast chain + fact shuffle)
    "q_tpch_q19",          # disjunctive-bracket hash join (no nested loop)
    "q_tpch_q21",          # per-order countDistinct/max + join-back chain
    "q_text_unigram_logprob",  # corpus-unigram LM quality score
    "q_kmeans3",           # 3-round integer fixed-point k-means
    "q_graph_triangles",   # degree-ordered triangle count (oriented wedge join)
    "q_pipeline_yield",    # dedup+quality+decontam funnel in one plan
    "q_dedup_minhash",     # deterministic MinHash-LSH (oracle-checked twin)
    "q_semdedup",          # k-means-bucketed semantic dedup
    "q_heavy_hitters_cms", # count-min sketch frequency estimation
    "q_scd2_intervals",    # SCD-2 dimension build from the event log
    "q_quality_checks",    # 8-constraint validation suite
    "q_dedup_jaccard_prefix",  # prefix-filtered set-similarity self-join
    "q_udtf_wordcounts",   # Python UDTF lateral fan-out
    "q_table_checksum",    # order-insensitive table fingerprint
    "q_rerank_mmr",        # MMR diversity reranking over the top-20 pool
    "q_copurchase_pmi",    # PMI association mining over co-order pairs
    "q_snapshot_diff",     # CDF-style version diff (full-outer key join)
    "q_join_dpp",          # dynamic partition pruning star join
    "q_dedup_containment", # asymmetric prefix×full-posting subset join
    "q_ann_recall",        # IVF-vs-brute recall audit (both ANN plans)
    "q_dedup_span_strip",  # duplicated-span removal (cleaned corpus)
    "q_join_bucketed",     # zero-exchange bucketed SMJ
    "q_lsh_recall",        # banded-LSH recall audit per J-decile
    "q_knn_graph_ivf",     # IVF-cell k-NN graph (scale twin)
    "q_quality_gopher",      # composite Gopher-rule quality filter
    "q_sample_temperature",  # sqrt-temperature source resampling
    "q_dedup_keep_best",     # keep-longest-per-component dedup
    "q_skyline",             # Pareto frontier via bucketed local prune
    "q_outliers_mad",        # robust median/MAD outlier screen
    "q_avro_roundtrip",      # Confluent-framed Avro wire decode (pandas UDF + mapInPandas)
    "q_ngram_novelty",       # per-doc novel-trigram fraction (hash postings topology)
    "q_dedup_typo",          # deletion-neighborhood edit-distance-1 vocabulary join
    "q_mann_whitney",        # integer-midrank rank-sum / AUC
    # round-8 batch: one representative per genuinely new shape
    "q_bpe_learn_k",         # 5 chained BPE merges (iterative vocab induction)
    "q_winnowing_fingerprint",  # window-min fingerprints + bucketed pair join
    "q_graph_modularity",    # LPA rounds + two-sided community audit joins
    "q_sssp_weighted",       # 4-round Bellman-Ford (weighted frontier)
    "q_multimodal_probe",    # in-plan encode + REAL decode via mapInPandas
    "q_bootstrap_ci",        # 40-fold in-scan Poisson resampling
    "q_stl_decompose",       # bounded-frame trend + broadcast seasonal join
    "q_collocation_llr",     # bigram-type G² with margin windows
    "q_text_rake",           # running-stopword-count phrase segmentation
    "q_text_textrank",       # integer PageRank on the co-occurrence word graph
    # round-10 batch9: one entry per genuinely new iterative shape
    # (the other ten batch9 queries fold below / into BENCH_OMITTED)
    "q_suffix_lrs",          # prefix-doubling suffix ranks + binary-search LRS
    "q_cluster_dbscan_grid", # cell-grid density clustering + core-cell CC
]

# Bench family representatives: members NOT in HEADLINE are benched
# through the listed representative (same family, same plan shape /
# shared stages). A regression in a folded member surfaces through its
# rep — or through its own SCALING.md / correctness row, which every
# folded query keeps.
FAMILY_REPS = {
    "q_dedup_simhash": ["q_dedup_simhash_pairs"],
    "q_dedup_minhash": ["q_dedup_minhash_incr", "q_split_leakage",
                        "q_stream_minhash_incr"],  # shared band-index machinery
    "q_knn_graph_ivf": ["q_knn_multiprobe", "q_knn_graph"],
    "q_text_unigram_logprob": ["q_text_bigram_logprob", "q_text_entropy",
                               "q_entropy_filter", "q_lm_bigram_logprob"],
    "q_dedup_embedding_lsh": ["q_dedup_embedding"],
    "q_win_running_scalable": ["q_win_running",
                               "q_select_budget"],  # banded two-level prefix sum
    "q_dedup_components": ["q_dup_cluster_stats"],
    # round-11 fold (stdout budget for common_set_ratio): substring's
    # plan is the shared _window_hashes relation + the dup-window
    # predicate, both of which span_strip executes before its
    # island-merge — the rep strictly supersets the folded member.
    "q_dedup_span_strip": ["q_dedup_span_maximal", "q_dedup_substring",
                           "q_dedup_bag"],
    # round-8 folds (freeing stdout budget for the batch8 entries):
    "q_mann_whitney": ["q_chi2_independence"],   # tiny stat-screen aggregations
    "q_sample_temperature": ["q_sample_weighted", "q_mix_curriculum"],  # deterministic sampling/mixing family
    "q_dedup_keep_best": ["q_select_topq"],      # per-group argmax/window select
    "q_agg_percentile": ["q_winsorize"],         # exact grouped percentiles
    "q_funnel": ["q_event_pattern"],             # per-user ordered journey scan
    "q_table_checksum": ["q_zorder_stats"],      # single-pass integer layout audits
    # round-8 second batch folds:
    "q_bpe_learn_k": ["q_bpe_apply"],            # shared merge chain
    "q_stl_decompose": ["q_ts_anomaly_stl"],     # shared decomposition
    "q_graph_triangles": ["q_graph_clustering_coeff"],  # shared oriented wedges
    "q_vocab_topk": ["q_ttr_source", "q_tfidf_top_term"],  # word-count topology
    "q_multimodal_probe": ["q_multimodal_decode"],  # same mapInPandas path, real decode on top
    # round-10 folds (freeing stdout budget for the batch9 entries):
    "q_kmeans3": ["q_kmeans_step",               # one Lloyd round ⊂ the 3-round loop
                  "q_coreset_kcenter"],          # broadcast-center distance-scan rounds
    "q_dedup_keep_best": ["q_dedup_window"],     # per-key window-select dedup family
    # round-10 batch9 folds:
    "q_sim_topk": ["q_knn_classify"],            # broadcast-seed scan + per-vec top-k window
    "q_ngram_novelty": ["q_source_ngram_leak"],  # hash-postings digest-join topology
    "q_copurchase_pmi": ["q_link_adamic_adar"],  # co-purchase pair topology
    "q_pack_greedy": ["q_pack_sequences"],       # source-partitioned packing family
}

# Declared-but-not-benched (beyond FAMILY_REPS): cheap single-pass
# shapes whose plan is a strict subset of a benched query's — listed
# so the omission is explicit, not silent.
BENCH_OMITTED = {
    "q_search_proximity": "two-term postings filter+join ⊂ q_bm25 shape",
    "q_rocchio_expand": "q_bm25 stage + one more token pass (q_bm25 benched)",
    "q_abtest_cuped": "one fact pass + 2-row finish ⊂ q_mann_whitney shape",
    "q_abtest_power": "one fact pass + 1-row moment reduce ⊂ q_abtest_cuped shape",
    "q_kmv_union_audit": "data-sized stage is one distinct+rank ⊂ q_vocab_topk shape; pairwise legs are sketch-sized",
    "q_ts_spectral_dow": "one calendar-grid groupBy ⊂ q_stl_decompose's daily collapse",
    "q_kn_continuation": "doc-keyed adjacency + type distinct ⊂ q_collocation_llr shape",
    "q_kmeans_silhouette": "broadcast centroid scan + K-row agg ⊂ q_kmeans_step shape (benched via q_kmeans3)",
    # round-10 batch9:
    "q_pii_scrub": "one regex scan + per-source agg ⊂ q_text_quality shape",
    "q_pad_waste_buckets": "one tokenize pass + 3-row report ⊂ q_text_quality shape",
    "q_dedup_url": "per-row canonicalize map + one digest-keyed agg ⊂ q_agg_groupby shape",
    "q_quality_ensemble": "one tokenize pass + ≤5-row report ⊂ q_text_quality shape",
    "q_changepoint_cusum": "daily calendar collapse + tiny-series scan ⊂ q_stl_decompose's daily collapse",
    # round-11 batch10 (the two data-heavy ones carry stress_sf10 rows
    # instead — tools/stress_sf10.py QUERIES):
    "q_contamination_attrib": "broadcast-bench gram join ⊂ q_decontaminate shape (benched)",
    "q_contamination_ladder": "4 parametric legs of the q_decontaminate shape",
    "q_repetition_windows": "per-row HOF chunking + source agg ⊂ q_text_quality shape",
    "q_fertility_bytes": "per-row regex counts + (lang,source) agg ⊂ q_text_quality shape",
    "q_dup_width_curve": "4 parametric legs of the q_ngram_novelty hash-postings shape; stress row instead",
    "q_filter_venn": "digest groupBy + broadcast-bench join composition of benched shapes; stress row instead",
    # round-12 batch11:
    "q_quant_error_curve": "3 parametric legs of the q_sim_topk_int8 broadcast-probe shape + per-row error maps",
    "q_sample_hash_stratified": "tiny stats agg broadcast onto one hash-filtered corpus scan ⊂ q_sample_temperature shape",
    # round-13 batch12:
    "q_shard_balance": "two hash aggs over the persisted prefix-posting feature table ⊂ q_dedup_jaccard_prefix shape (benched)",
}


def compact_val(t: float) -> float | int:
    """1-dp timing with integral values emitted as ints (3.0 -> 3) —
    two stdout chars saved per whole-second timing."""
    v = round(t, 1)
    return int(v) if v == int(v) else v


# Cross-artifact guard (round-9 verdict item 6): the in-sweep
# resampler above catches WITHIN-sweep variance, but a query that is
# *consistently* slow across all its sweep visits (a real plan/code
# regression, or a whole-run contention plateau) sails through with a
# tight-but-wrong median. SCALING.md's stress table holds each heavy
# query's t(sf0.1) median from an independent tools/stress_big.py run
# — a second artifact to triangulate against. Any headline query whose
# sweep median exceeds XGUARD_RATIO x that figure (and by more than
# XGUARD_ABS, so sub-second scheduling-floor noise can't trip it) gets
# re-measured ISOLATED at the end of the run; all three numbers land
# in BENCH_LOCAL.json under "xguard". isolated ~= sweep >> scaling
# means a true slowdown vs the artifact (investigate / re-run
# stress_big); isolated << sweep means the sweep itself was the
# anomaly (contention), and the stdout "xguard_regressed" list stays
# empty.
XGUARD_RATIO = 1.5
XGUARD_ABS = 0.5


def scaling_isolated_figures() -> dict[str, float]:
    """t(sf0.1) medians from SCALING.md's 10x-stress table — the
    independent per-query figures the cross-artifact guard compares
    sweep medians against. Empty dict when the artifact or section is
    missing (guard silently disabled rather than crashing the bench)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.md")
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return {}
    idx = text.find("\n## 10× stress")
    if idx == -1:
        return {}
    nxt = text.find("\n## ", idx + 1)
    section = text[idx: nxt if nxt != -1 else len(text)]
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^\| (q_\w+) \| ([0-9.]+)s \|", section, re.M)
    }


def xguard_suspects(timings: dict[str, float],
                    figs: dict[str, float]) -> list[str]:
    """Headline queries whose sweep median is suspicious vs their
    SCALING.md figure (ratio AND absolute-margin gates — see above)."""
    return sorted(
        n for n, t in timings.items()
        if n in figs and t > XGUARD_RATIO * figs[n] and t - figs[n] > XGUARD_ABS
    )


def latest_bench_queries() -> dict[str, float]:
    """Per-query timings from the newest BENCH_r{N}.json on disk (the
    prior round's driver record) — {} when none exists or the newest
    one failed to parse (round 4's BENCH_r04.json is literally the
    string "null")."""
    root = os.path.dirname(os.path.abspath(__file__))
    # Sort by the PARSED round number, not lexicographically — with
    # mixed digit widths "BENCH_r100" < "BENCH_r99" as strings, which
    # would silently compare against the wrong round.
    paths = sorted(
        (p for p in os.listdir(root) if re.fullmatch(r"BENCH_r\d+\.json", p)),
        key=lambda p: int(re.search(r"\d+", p).group()),
    )
    if not paths:
        return {}
    try:
        with open(os.path.join(root, paths[-1])) as f:
            data = json.load(f)
        # The driver wraps bench's stdout line: {"n", "rc", "tail",
        # "parsed": {...the line...}}; older/local copies may be the
        # bare line itself.
        inner = data.get("parsed") if isinstance(data.get("parsed"), dict) else data
        return dict((inner or {}).get("queries") or {})
    except (OSError, json.JSONDecodeError, AttributeError):
        return {}


def common_set_ratio(
    timings: dict[str, float], prior: dict[str, float]
) -> tuple[float, int] | None:
    """(this_total / prior_total over the COMMON query names, size of
    that common set) — the like-for-like round-over-round number the
    round-10 verdict had to compute by hand because headline-set
    composition changes (new entries, family folds) move the raw total
    without any query regressing. None when there is no usable prior
    or the common set is empty/zero-time."""
    common = [n for n in timings if n in prior]
    prior_total = sum(prior[n] for n in common)
    if not common or prior_total <= 0:
        return None
    return round(sum(timings[n] for n in common) / prior_total, 2), len(common)


def run_one(spark, name: str, sf_dir: str) -> float:
    fn = registry.QUERIES[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    registry.load_all()
    spark = get_spark("bench")
    # Warm-up: run every headline plan once at the smallest scale
    # factor so JVM JIT + whole-stage-codegen compilation happen before
    # the timed runs — timings then measure plan execution (the thing
    # that scales), not first-run classloading.
    for name in HEADLINE:
        try:
            run_one(spark, name, "/root/testdata/sf0.001")
        except Exception:
            pass
    # The warm-up sf_dir's memoized intermediates served their purpose
    # (JIT/codegen); free that storage before the timed sweeps so it
    # can't cache-pressure them — unless the timed sweep RUNS at the
    # warm-up sf, where clearing would re-time cold cache construction
    # against the warm-feature-store discipline documented below.
    from kafka_to_parquet_spark.cache import clear_caches, clear_result_caches

    if sf_dir != "/root/testdata/sf0.001":
        clear_caches(spark, "/root/testdata/sf0.001")

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    errors: dict[str, str] = {}
    for _ in range(iters):
        # Feature-level caches (persisted shingle/fingerprint tables)
        # stay warm across sweeps — they model a shared feature store.
        # RESULT-level caches do not: q_dedup_components memoizes its
        # converged labels for q_dedup_keep's reuse, and timing a dict
        # lookup would report 0.02 s for a multi-round iterative job.
        # Clearing them per sweep (the result_level registry in
        # cache.py — one rule, one mechanism) keeps the median an
        # honest measure of the label-propagation work itself.
        clear_result_caches(spark)
        for name in HEADLINE:
            # One failing query must not abort the benchmark — record
            # the error and keep the other timings.
            try:
                samples[name].append(run_one(spark, name, sf_dir))
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:200]

    # Adaptive re-sampling (see module docstring): a query whose base
    # samples spread past 2× was visited during a contention episode —
    # give it EXTRA_SWEEPS more runs so the episode can't own the
    # median. Bounded: only the noisy few re-run, not the whole list.
    EXTRA_SWEEPS = 2
    noisy = [
        n
        for n, ts in samples.items()
        if len(ts) >= 2 and min(ts) > 0 and max(ts) > 2.0 * min(ts)
    ]
    for _ in range(EXTRA_SWEEPS if noisy else 0):
        clear_result_caches(spark)
        for name in noisy:
            try:
                samples[name].append(run_one(spark, name, sf_dir))
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:200]

    timings = {
        n: round(statistics.median(ts), 3) for n, ts in samples.items() if ts
    }

    # Feature-store build cost, reported so warm-kernel totals are
    # never read as end-to-end cost (round-12 verdict item 4): feature-
    # level caches (shingle tables, decorated graph edges) build inside
    # whichever sweep-1 sample first touches them and stay warm for
    # every later sample, so each query's first-sample overhang above
    # its warm median — summed — is the one-time build cost the warm
    # medians amortize away. NOTE: the sum runs over EVERY query, so it
    # is an UPPER BOUND on true feature-build cost — queries with no
    # feature cache contribute their JIT/codegen warm-up and any
    # first-sample host noise (round-13 advisor item 3). fbt_top (the
    # top-5 per-query overhangs, round-13 verdict item 5) makes a
    # drifting total attributable: feature-heavy names at the top mean
    # build cost, a long flat tail of no-cache names means noise.
    # Per-query sample arrays are in BENCH_LOCAL.json for the split.
    overhang = {
        n: round(max(0.0, ts[0] - statistics.median(ts[1:])), 3)
        for n, ts in samples.items()
        if len(ts) >= 2
    }
    feature_build_total = round(sum(overhang.values()), 3)
    fbt_top = dict(
        sorted(overhang.items(), key=lambda kv: -kv[1])[:5]
    )

    # Cross-artifact guard (see scaling_isolated_figures above): only
    # meaningful when the sweep ran at the scale the SCALING.md stress
    # table measured (sf0.1 — its t(sf0.1) column).
    xguard: dict[str, dict[str, float]] = {}
    if sf_dir.rstrip("/").endswith("sf0.1"):
        figs = scaling_isolated_figures()
        for name in xguard_suspects(timings, figs):
            clear_result_caches(spark)
            iso = []
            for _ in range(3):
                try:
                    iso.append(run_one(spark, name, sf_dir))
                except Exception as e:  # noqa: BLE001
                    errors[name] = f"{type(e).__name__}: {e}"[:200]
                    break
            if iso:
                xguard[name] = {
                    "sweep": timings[name],
                    "scaling": figs[name],
                    "isolated": round(statistics.median(iso), 3),
                }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "iters": iters,
        "sf": sf,
        # One-time feature-cache build cost the warm medians amortize
        # (first-sample overhang, see above) — NOT part of `value`.
        # Full key in BENCH_LOCAL.json; the stdout line carries it as
        # compact "fbt" (tail budget). fbt_top = the 5 largest
        # per-query overhangs, so a local-vs-driver fbt spread is
        # attributable per feature; since round 15 the stdout line
        # carries as many of them as the tail budget fits (see below),
        # BENCH_LOCAL.json always all 5 at full precision.
        "feature_build_total": feature_build_total,
        "fbt_top": fbt_top,
    }
    # Like-for-like guard (round-10 verdict item 6): the raw total
    # moves whenever the headline set's composition changes, so also
    # report this run vs the prior BENCH_r{N}.json on the COMMON query
    # names — a set-swap can't mask a real regression behind "the list
    # changed". Only at the driver's scale (prior rounds ran sf0.1).
    if sf_dir.rstrip("/").endswith("sf0.1"):
        csr = common_set_ratio(timings, latest_bench_queries())
        if csr is not None:
            # common_set_n goes to BENCH_LOCAL only (stdout budget).
            out["common_set_ratio"], out["common_set_n"] = csr
    if noisy:
        # Which queries earned extra samples (full sample lists are in
        # BENCH_LOCAL.json) — lets a reader see where contention hit.
        out["resampled"] = noisy
    if errors:
        out["errors"] = errors
    if xguard:
        # Full triangulation detail goes to BENCH_LOCAL.json; stdout
        # carries only the names whose ISOLATED re-measure also exceeds
        # the SCALING.md figure — i.e. confirmed slowdowns vs the
        # independent artifact, not sweep-contention false alarms.
        out["xguard"] = xguard
        regressed = sorted(
            n for n, v in xguard.items()
            if v["isolated"] > XGUARD_RATIO * v["scaling"]
            and v["isolated"] - v["scaling"] > XGUARD_ABS
        )
        if regressed:
            out["xguard_regressed"] = regressed

    # Teardown: evict every memoized/persisted intermediate (shingle
    # tables, edge lists, converged labels, temp-dataset paths) so a
    # caller embedding bench in a longer-lived session doesn't inherit
    # executor storage pinned to this sf_dir.
    clear_caches(spark)
    # Stop Spark BEFORE printing the stdout line: the driver's capture
    # merges the JVM's log4j stderr (the WARN lines visible in every
    # BENCH_r*.json tail), so a stray warning flushed AFTER the line
    # would push its head past the 2000-char tail and kill the parse.
    # With the JVM down and log4j flushed here, the JSON line is
    # provably the last output (the atexit temp-dataset sweep is
    # silent), which is what lets the budget below spend the headroom
    # the old 1930 budget reserved for exactly that stray-warning risk.
    spark.stop()

    # Full-precision copy on disk for humans/the judge — full q_ names,
    # 3-dp medians, raw sample lists for the resampled queries. The
    # stdout line is the driver's parse target and the driver captures
    # only a ~2000-char TAIL of stdout, which truncated round 4's
    # 2020-char line past its own parser (BENCH_r04.json parsed: null).
    if noisy:
        out["samples"] = {n: [round(t, 3) for t in samples[n]] for n in noisy}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as f:
        json.dump(out, f, indent=1)
    out.pop("samples", None)
    # xguard triangulation detail is BENCH_LOCAL-only; the stdout line
    # keeps just the confirmed-regression name list (usually absent).
    out.pop("xguard", None)
    out.pop("common_set_n", None)  # BENCH_LOCAL-only (stdout budget)

    # Stdout line (see module docstring): every query present under its
    # CANONICAL q_* name (round-6 verdict item 5), no queries_omitted —
    # 1-dp values (integral values as ints: 3.0 -> 3) and the trimmed
    # 86-entry list keep the line inside the tail budget. Per-query
    # precision below 0.1 s is noise at sf0.1 anyway; BENCH_LOCAL.json
    # keeps 3-dp and the iters count.
    out["queries"] = {n: compact_val(t) for n, t in timings.items()}
    out.pop("iters", None)
    # feature_build_total -> compact "fbt" on stdout (the descriptive
    # key stays in BENCH_LOCAL.json written above).
    out.pop("feature_build_total", None)
    out["fbt"] = compact_val(feature_build_total)
    # fbt_top on the stdout line (round-14 verdict item 2: the driver's
    # fbt doubled to 105.3 s and its own record could not attribute
    # it). Arithmetic constraint: the driver captures a 2000-char TAIL
    # of merged stdout/stderr; the contract line is ~1915-1925 chars at
    # the current 85-query set (the queries dict alone is ~1810), so
    # the full 5-entry dict (~130 chars with canonical names) cannot
    # ever fit — the shrink chain below keeps the LARGEST overhangs and
    # pops from the smallest until the line fits (typically 2-3 entries
    # — the heaviest builds, which is the attribution that matters).
    # All 5 full-precision entries are always in BENCH_LOCAL.json.
    out["fbt_top"] = {n: compact_val(v) for n, v in fbt_top.items()}
    if noisy:
        out["resampled"] = noisy

    # The driver's tail capture is 2000 chars. spark.stop() above makes
    # the JSON line provably the last output, so the only overhead is
    # the trailing newline — budget 1995 leaves 4 chars of slack. (The
    # old 1930 reserved a full stray-warning line; that risk is closed
    # at the source now, and the reclaimed 65 chars carry fbt_top.)
    budget = 1995
    line = json.dumps(out, separators=(",", ":"))
    # Shrink the ERROR texts first: errors are up to 200 chars each
    # (bench's own cap) while timings are the benchmark's payload —
    # shortening errors to 60 chars often saves enough that no timing
    # has to be dropped at all. BENCH_LOCAL.json (written above,
    # pre-truncation) keeps the full error text either way; the stdout
    # line must parse above all else.
    if len(line) > budget and out.get("errors"):
        out["errors"] = {n: e[:60] for n, e in out["errors"].items()}
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > budget:
        # resampled names drop first (their full sample lists are in
        # BENCH_LOCAL); fbt is the warm-vs-cold honesty figure the
        # round record exists to carry, so it outlives them.
        out.pop("resampled", None)
        out.pop("iters", None)
        line = json.dumps(out, separators=(",", ":"))
    # fbt_top degrades from the smallest overhang up (see comment at
    # its assembly): the heaviest feature builds — the attribution the
    # round record needs — survive the longest.
    while len(line) > budget and out.get("fbt_top"):
        ft = out["fbt_top"]
        del ft[min(ft, key=ft.get)]
        if not ft:
            out.pop("fbt_top", None)
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > budget:
        out.pop("fbt", None)  # advisory; full value in BENCH_LOCAL
        line = json.dumps(out, separators=(",", ":"))
    # Last-resort fallbacks — should be unreachable at the current list
    # size (96 stripped names at 1-dp ≈ 1740 chars); they exist so the
    # line PARSES no matter how the list grows before this is revisited.
    while len(line) > budget and out["queries"]:
        q = out["queries"]
        dropped = min(q, key=q.get)
        del q[dropped]
        out["queries_omitted"] = out.get("queries_omitted", 0) + 1
        line = json.dumps(out, separators=(",", ":"))
    while len(line) > budget and out.get("errors"):
        del out["errors"][next(iter(out["errors"]))]
        out["errors_omitted"] = out.get("errors_omitted", 0) + 1
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
