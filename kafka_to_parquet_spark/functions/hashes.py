"""Cross-engine 31-bit string hash (md5 prefix mod Mersenne-31).

Leaf module — depends on nothing inside the package — so every
consumer (llm/minhash.py, llm/dedup.py, llm/corpus_stats.py) can
import it normally. It previously lived in llm/minhash.py, which
imports llm/dedup.py at its top while dedup's module body needed
``duck_h31`` for an oracle builder: a decoration-time circular import
that only worked because all entrypoints happened to import dedup
first (round-4 ADVICE, medium). Hoisting the pair here removes the
ordering hazard.

Round-4 post-mortem (the q_dedup_substring red row): ``duck_h31``'s
DuckDB form is built from a ``list_transform(range(1, 9), i -> ...)``
nibble fold, and its lambda variable was named ``i``. Embedded inside
an OUTER lambda that also bound ``i`` (the sliding-window oracle's
``list_transform(range(1, len(t) - 6), i -> duck_h31(...t[i:...]...))``)
DuckDB's inner binding shadowed the window index, so each nibble
position i hashed the window STARTING at i — a chimera of 8 different
windows — and the oracle under-counted (45 vs Spark's 47). The lambda
variables are now ``h31_nib`` / ``h31_acc`` / ``h31_c``: names no
outer oracle lambda will ever bind. tests/test_hashes.py pins the
nested-lambda case so the class can't regress.

The Spark form contains no lambda (a ``conv`` of the md5 prefix), so
it composes safely inside any ``transform(...)``.
"""

from __future__ import annotations

# Mersenne prime 2^31 - 1: hash values stay < 2^31, so linear hashes
# a*h + b and band keys m_even * P + m_odd stay < 2^62 — every
# intermediate fits a signed 64-bit integer in both engines.
H31_P = 2_147_483_647


def spark_h31(col: str) -> str:
    """First 8 hex chars of md5(col) as an integer, mod 2^31-1 (Spark
    SQL form — no lambda, safe at any nesting depth)."""
    return f"CAST(conv(substring(md5({col}), 1, 8), 16, 10) AS BIGINT) % {H31_P}"


def duck_h31(col: str) -> str:
    """Same value in DuckDB SQL: fold the 8 nibbles with a list_reduce.
    Lambda variables are h31_-prefixed so the fragment can be embedded
    inside an outer lambda (e.g. a sliding-window ``list_transform(...,
    i -> ...)``) without the shadowing bug documented above."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(range(1, 9),"
        f" h31_nib -> CAST(strpos('0123456789abcdef', substr(md5({col}), h31_nib, 1)) - 1 AS BIGINT))),"
        f" (h31_acc, h31_c) -> h31_acc * 16 + h31_c) % {H31_P}"
    )


# ---------------------------------------------------------------------------
# 62-bit fingerprints for EQUALITY semantics (round-10 sf≈10 finding)
# ---------------------------------------------------------------------------
# The 31-bit space is fine for SKETCH uses (MinHash signatures, KMV
# order statistics, bloom audits — collisions are part of the model),
# but fingerprints whose EQUALITY is taken as text identity saturate
# it: the second stress decade measured 10.1% false-positive duplicate
# window-hashes at ~30M distinct 8-token windows (birthday-quadratic:
# 1.1% at ~3M), which would have q_dedup_span_strip deleting real text
# on hash noise at 100 TB. Identity fingerprints therefore compose TWO
# independent 31-bit hashes (the second salted) into a < 2^62 BIGINT:
# expected FP pairs at N windows ≈ N²/2^63 — ~0.05 at N=1e9.


def spark_h62(col: str) -> str:
    """Collision-safe identity fingerprint (Spark SQL form): two
    independent h31 values (second salted with 'h62:') composed as
    a·P + b < 2^62. Lambda-free like spark_h31 — safe at any nesting
    depth."""
    salted = spark_h31(f"concat('h62:', {col})")
    return f"(({spark_h31(col)}) * CAST({H31_P} AS BIGINT) + ({salted}))"


def duck_h62(col: str) -> str:
    """Same value in DuckDB SQL. The two embedded duck_h31 folds are
    SIBLING expressions (never nested inside each other), so their
    shared h31_-prefixed lambda names cannot shadow each other — and
    remain safe inside an outer query lambda per the h31 rule."""
    salted = duck_h31(f"'h62:' || ({col})")
    return f"(({duck_h31(col)}) * CAST({H31_P} AS BIGINT) + ({salted}))"
