"""Full-text retrieval over the ``documents`` corpus: BM25 ranking and
conjunctive (AND) keyword search — the query side of a training-data
pipeline (e.g. locating benchmark-adjacent or topic-specific documents
before filtering).

Built on the canonical tokenizer shared with functions/text.py so
token semantics are identical across the text family, with the same
DuckDB mirror.

Engine-stability: BM25 is float math (ln), so per-(doc, term) scores
are fenced to integer micro-units via functions.rounding.int_units and
the per-document score is the exact integer sum of those units; the
scoring expression itself is ONE shared SQL fragment evaluated by both
engines (F.expr on the Spark side), so operand order is identical by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.rounding import int_units
from kafka_to_parquet_spark.functions.text import _TOKENS_SQL, tokens_col
from kafka_to_parquet_spark.registry import query
from kafka_to_parquet_spark.tables import load

BM25_TERMS = ("spark", "merge", "slow")
AND_TERMS = ("spark", "merge", "window")
_TOP_K = 15

# Okapi BM25 with k1 = 1.2, b = 0.75 (so k1+1 = 2.2, 1-b = 0.25).
# Column inputs: tf, df, dl BIGINT; n_docs BIGINT; avgdl DOUBLE.
# Same text on both engines → identical IEEE evaluation order.
_BM25_FRAG = (
    "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
    " * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
)
_AVGDL_FRAG = "CAST(sum_dl AS DOUBLE) / n_docs"


def _sql_list(terms: tuple[str, ...]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


@query(
    "q_bm25",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents),
dl AS (SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS dl FROM documents),
par AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM dl),
par2 AS (SELECT n_docs, {_AVGDL_FRAG} AS avgdl FROM par),
tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE word IN ({_sql_list(BM25_TERMS)}) GROUP BY doc_id, word),
dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
scored AS (
  SELECT tf.doc_id, {int_units(_BM25_FRAG, 6)} AS u
  FROM tf
  JOIN dfq ON tf.word = dfq.word
  JOIN dl  ON tf.doc_id = dl.doc_id
  CROSS JOIN par2
)
SELECT doc_id,
       CAST(sum(u) AS BIGINT) AS score_units,
       CAST(count(*) AS BIGINT) AS n_terms
FROM scored
GROUP BY doc_id
ORDER BY score_units DESC, doc_id
LIMIT {_TOP_K}
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} retrieval for a fixed 3-term query.

    Shape: the corpus-wide constants (N, avgdl) are a 1-row aggregate
    broadcast everywhere; term document-frequencies are a ≤|terms|-row
    aggregate, also broadcast; the only data-sized operations are the
    tokenize→explode→filter (which drops every non-query term BEFORE
    the shuffle, so the (doc, term) tf aggregation moves |matches|
    rows, not |tokens|) and the final per-doc sum. Top-k is
    TakeOrderedAndProject. At 100 TB the inverted-index analog is the
    same plan with the tf relation pre-materialized; nothing here is
    corpus-quadratic.

    The per-(doc, term) float score is fenced to integer micro-units
    (shared fragment, see module docstring) and per-doc totals are
    exact integer sums — ties included, the top-k set is identical in
    both engines with doc_id as the deterministic tiebreak."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("word"))
    dl = docs.select("doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("dl"))
    par2 = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select("n_docs", F.expr(_AVGDL_FRAG).alias("avgdl"))
    tf = (
        toks.filter(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(par2))
        .select("doc_id", F.expr(int_units(_BM25_FRAG, 6)).alias("u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("u").cast("long").alias("score_units"), F.count("*").alias("n_terms"))
        .orderBy(F.desc("score_units"), "doc_id")
        .limit(_TOP_K)
    )


@query(
    "q_search_and",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents),
hits AS (
  SELECT doc_id,
         CAST(count(DISTINCT word) AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n_hits
  FROM toks WHERE word IN ({_sql_list(AND_TERMS)}) GROUP BY doc_id
)
SELECT h.doc_id, h.n_hits, d.n_chars
FROM hits h JOIN documents d ON h.doc_id = d.doc_id
WHERE h.k = {len(AND_TERMS)}
""",
)
def q_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search: documents containing ALL query
    terms, with total term occurrences and document length.

    Shape: explode → filter to query terms (pre-shuffle selectivity,
    same as q_bm25) → per-doc distinct-term count, keep docs hitting
    every term. The distinct-count is over ≤|terms| values per doc —
    constant state per key. The detail rejoin to ``documents`` is on
    doc_id; hit lists are a vanishing fraction of the corpus, so at
    100 TB the hits side broadcasts."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("word"))
    hits = (
        toks.filter(F.col("word").isin(*AND_TERMS))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("word").alias("k"),
            F.count("*").alias("n_hits"),
        )
        .filter(F.col("k") == len(AND_TERMS))
    )
    return hits.join(docs, "doc_id").select("doc_id", "n_hits", "n_chars")


# Reciprocal-rank fusion: query vector id (the embedding of document
# RRF_QV pairs with the BM25 term query), the standard k=60 damping,
# integer contribution scale, and the fused report size.
RRF_QV = 0
RRF_K = 60
RRF_OUT_K = 10

# The BM25 leg reuses q_bm25's registered oracle verbatim as a nested
# CTE (DuckDB allows WITH inside a parenthesized subquery), so the two
# queries can never drift.
from kafka_to_parquet_spark.registry import ORACLE_SQL as _OSQL  # noqa: E402
from kafka_to_parquet_spark.functions.vectors import (  # noqa: E402
    cosine_expr,
    duck_cosine,
)


@query(
    "q_search_rrf",
    oracle=f"""
WITH bmtop AS ({_OSQL['q_bm25']}),
bmr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_units DESC, doc_id) AS BIGINT)
           AS rank_bm25
  FROM bmtop
),
qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {RRF_QV}),
cs AS (
  SELECT vec_id AS doc_id, round({duck_cosine('e.embedding', 'qv.qe')}, 6) AS cos
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> {RRF_QV}
),
cstop AS (SELECT doc_id, cos FROM cs ORDER BY cos DESC, doc_id LIMIT {_TOP_K}),
csr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_cos
  FROM cstop
)
SELECT coalesce(bmr.doc_id, csr.doc_id) AS doc_id,
       CAST(coalesce(1000000000 // ({RRF_K} + rank_bm25), 0)
          + coalesce(1000000000 // ({RRF_K} + rank_cos), 0) AS BIGINT)
         AS fused_units,
       rank_bm25, rank_cos
FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id
ORDER BY fused_units DESC, doc_id
LIMIT {RRF_OUT_K}
""",
)
def q_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.):
    the lexical BM25 top-{k} and the dense cosine top-{k} (the query
    vector is document {RRF_QV}'s embedding, pairing with the BM25
    term query) fused by Σ 1/(60 + rank) — the standard way modern
    retrieval stacks combine keyword and embedding search without
    score calibration.

    Contributions are exact integers (10^9 DIV (60 + rank), pure
    integer division in both engines), so the fused ordering and the
    top-{RRF_OUT_K} set are deterministic with doc_id tiebreak; a
    document present in only one list gets the other leg's
    contribution as 0 via the full outer join, and its missing rank
    stays NULL in the report.

    Plan: both legs are already top-k-truncated (15 rows each) before
    ranking, so the windows, the full outer join, and the final sort
    all run on constant-size data; the heavy lifting is inside the
    legs, each with its own documented scale shape (q_bm25's
    filter-before-shuffle inverted index; the brute-force cosine leg
    broadcasts ONE query vector over the corpus — swap in the IVF/LSH
    path for many-query batches)."""
    bm = q_bm25(spark, sf_dir).select("doc_id", "score_units")
    wb = Window.orderBy(F.desc("score_units"), F.asc("doc_id"))
    bmr = bm.withColumn("rank_bm25", F.row_number().over(wb).cast("long")).select(
        "doc_id", "rank_bm25"
    )
    e = load(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == RRF_QV).select(F.col("embedding").alias("qe"))
    cs = (
        e.filter(F.col("vec_id") != RRF_QV)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(F.expr(cosine_expr("embedding", "qe")), 6).alias("cos"),
        )
    )
    cstop = cs.orderBy(F.desc("cos"), F.asc("doc_id")).limit(_TOP_K)
    wc = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    csr = cstop.withColumn("rank_cos", F.row_number().over(wc).cast("long")).select(
        "doc_id", "rank_cos"
    )
    return (
        bmr.join(csr, "doc_id", "full")
        .select(
            "doc_id",
            F.expr(
                f"CAST(coalesce(1000000000 DIV ({RRF_K} + rank_bm25), 0)"
                f" + coalesce(1000000000 DIV ({RRF_K} + rank_cos), 0) AS BIGINT)"
            ).alias("fused_units"),
            "rank_bm25",
            "rank_cos",
        )
        .orderBy(F.desc("fused_units"), F.asc("doc_id"))
        .limit(RRF_OUT_K)
    )
