"""Registry / driver-contract consistency checks."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from kafka_to_parquet_spark import registry

registry.load_all()


def test_every_oracle_has_a_query():
    missing = set(registry.ORACLE_SQL) - set(registry.QUERIES)
    assert not missing


def test_rows_only_set_is_intentional():
    # Queries without an oracle get a weaker rows-only check; keep the
    # list explicit so nothing silently drops out of the strong gate.
    rows_only = set(registry.QUERIES) - set(registry.ORACLE_SQL)
    assert rows_only == {
        "q_agg_approx_distinct",  # HLL++ sketch ≠ DuckDB's sketch
        "q_dedup_minhash_lsh",    # LSH banding not SQL-expressible
        "q_stream_watermark",     # emission depends on watermark progression
    }


def test_entry_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 58
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert isinstance(sql, str) and sql.strip(), name
