"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["w_start", "w_end", "top_event_type", "top_cnt"]
    assert df.count() > 0


def test_every_query_has_oracle_or_is_documented(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # total oracle coverage (round 3): EVERY queries() entry has a DuckDB
    # twin — a new query without one should fail here, not ship rows-only
    assert set(oracles) == set(qs)
    # every query is callable with (spark, sf_dir)
    for _name, fn in qs.items():
        assert callable(fn)


def test_queries_run_at_smallest_sf(spark, sf_dir):
    # spot-run a representative subset end-to-end at sf0.001
    qs = entry_mod.queries()
    for name in ["qb_trending_single", "tpch_q1_pricing_summary", "dedup_exact", "text_quality"]:
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0  # materializes without error
