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
