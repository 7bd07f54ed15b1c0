"""Batch 12 — shard-planning audit for the PPJoin family (round-12
verdict item 8's scale-hardening slot).

``q_shard_balance`` audits the two assumptions the round-13
auto-sharding (llm/minhash.py ``ppjoin_shards``) rests on, with a full
DuckDB oracle:

1. **Balance** — sharding the token universe by ``pmod(h, S)`` only
   bounds the per-pass working set if posting MASS (not just token
   count) spreads evenly across shards. The audit reports, per shard of
   a fixed ``AUDIT_S``-way split of the tau=0.5 PREFIX postings, the
   posting rows, distinct tokens, hottest token's posting count, and
   the shard's share of total posting mass in basis points — the
   numbers an operator reads before trusting S passes of ~1/S each.
2. **Selection arithmetic** — the ``auto_shards`` column recomputes the
   exact integer selection rule (ceil(full postings / per-pass budget),
   clamped to [1, 64]) from the full posting count in SQL, so the
   driver's value check certifies the same arithmetic
   ``ppjoin_shards`` executes in Python.

Reference parity: the reference (src/main.rs:59-294) has no similarity
surface; this extends the mandated LLM-pipeline near-dup tier
(SURVEY §2.11 X3) with the batch9-11 discipline: exact integer
arithmetic, full oracle, no corpus-quadratic term, bounded report.

Scale shape: the prefix-posting relation is the SAME persisted feature
table q_dedup_jaccard_prefix reads (one pipeline, shared cache); on top
of it the audit is two hash aggregates — (shard, h) with map-side
combine, then shard — plus two 1-row global reduces broadcast onto the
AUDIT_S-row report. Nothing here scales past the posting relation the
PPJoin already materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_to_parquet_spark.functions.hashes import duck_h31
from kafka_to_parquet_spark.registry import query

AUDIT_S = 8  # fixed audit split so the oracle is a closed SQL expression

# ---------------------------------------------------------------------------
# q_shard_balance
# ---------------------------------------------------------------------------


def _shard_balance_oracle() -> str:
    from kafka_to_parquet_spark.llm.dedup import _SHINGLES_SQL
    from kafka_to_parquet_spark.llm.minhash import PPJOIN_TARGET_POSTINGS

    t = PPJOIN_TARGET_POSTINGS
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
hs AS (
  SELECT doc_id, list_distinct(list_transform(sh, s -> {duck_h31('s')})) AS hs
  FROM sh WHERE len(sh) > 0
),
ex AS (SELECT doc_id, unnest(hs) AS h FROM hs),
sized AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM hs),
dfreq AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY h),
rk AS (
  SELECT ex.doc_id, ex.h, sized.n,
         row_number() OVER (PARTITION BY ex.doc_id ORDER BY df, ex.h) AS rk
  FROM ex JOIN dfreq USING (h) JOIN sized USING (doc_id)
),
prefix AS (SELECT doc_id, h FROM rk WHERE rk <= n - ((n + 1) // 2) + 1),
per_tok AS (
  SELECT h % {AUDIT_S} AS shard, h, CAST(count(*) AS BIGINT) AS c
  FROM prefix GROUP BY h % {AUDIT_S}, h
),
agg AS (
  SELECT shard,
         CAST(sum(c) AS BIGINT) AS n_postings,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS max_token_df
  FROM per_tok GROUP BY shard
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM per_tok),
fullp AS (SELECT CAST(count(*) AS BIGINT) AS fp FROM ex)
SELECT CAST(shard AS BIGINT) AS shard, n_postings, n_tokens, max_token_df,
       CAST(n_postings * 10000 // t AS BIGINT) AS share_bp,
       CAST(least(64, greatest(1, (fp + {t - 1}) // {t})) AS BIGINT)
         AS auto_shards
FROM agg, tot, fullp
ORDER BY shard
"""


@query("q_shard_balance", oracle=_shard_balance_oracle())
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-mass balance of the pmod token-universe split the PPJoin
    auto-sharding relies on, plus the selection arithmetic itself.

    Per shard of a fixed {S}-way ``pmod(h, {S})`` split of the tau=0.5
    CLASSIC (1-extended) prefix postings — the posting-budget capacity
    measure ``ppjoin_shards`` prices, pinned since this query was
    certified. NOTE (round-15 doc fix): since round 14 the family
    queries themselves join the K-extended prefix (+PREFIX_K-1 extra
    tokens per doc) for the counting filter, so this audit relation is
    a DIFFERENT, smaller posting table than the one
    q_dedup_jaccard_prefix joins; a full-suite session persists both
    (accepted — the +1 prefix is the quantity the certified capacity
    arithmetic is defined over, and re-pointing the audit would change
    the oracle-pinned output). Columns: posting rows, distinct tokens,
    the hottest token's posting count, and the shard's share of
    posting mass in basis points. A healthy split shows share_bp ≈
    10000/{S} per shard with no shard dominated by one hot token — the
    precondition for "S passes of ~1/S working set each".
    ``auto_shards`` recomputes ``ppjoin_shards``'s integer selection
    (ceil(full postings / per-pass budget), clamped to [1, 64]) in
    both engines, so the hash check certifies the Python rule's
    arithmetic against SQL.

    Plan: reuses the persisted +1-prefix posting feature table (shared
    with any other consumer of the same prefix rule); one (shard, h)
    hash aggregate with map-side combine, one {S}-row shard aggregate,
    and two 1-row global reduces (prefix mass, full posting count)
    broadcast onto the report — the SinglePartition collapses are
    1-row by construction. All integer arithmetic: pmod on the
    non-negative 31-bit shingle hash equals SQL ``%``; shares and the
    ceil-div are integer DIV on both engines."""
    from kafka_to_parquet_spark.llm.minhash import (
        PPJOIN_TARGET_POSTINGS,
        _prefix_postings,
    )

    t = PPJOIN_TARGET_POSTINGS
    _, full, prefix = _prefix_postings(spark, sf_dir, "n - ((n + 1) DIV 2) + 1")
    per_tok = (
        prefix.groupBy(F.pmod(F.col("h"), F.lit(AUDIT_S)).alias("shard"), "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = per_tok.groupBy("shard").agg(
        F.sum("c").cast("long").alias("n_postings"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.max("c").cast("long").alias("max_token_df"),
    )
    tot = per_tok.agg(F.sum("c").cast("long").alias("t"))
    fullp = full.agg(F.count(F.lit(1)).cast("long").alias("fp"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(fullp))
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_postings",
            "n_tokens",
            "max_token_df",
            F.expr("CAST(n_postings * 10000 DIV t AS BIGINT)").alias("share_bp"),
            F.expr(
                f"CAST(least(64, greatest(1, (fp + {t - 1}) DIV {t}))"
                " AS BIGINT)"
            ).alias("auto_shards"),
        )
        .orderBy("shard")
    )


q_shard_balance.__doc__ = q_shard_balance.__doc__.replace("{S}", str(AUDIT_S))
