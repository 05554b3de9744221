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


def test_round9_rotation_names_fall_inside_gate_window():
    """The driver verifies only the FIRST 50 queries() entries, and the
    window accounting used to be hand-counted comments (ADVICE r3): pin
    that every name the round-9 rotation plan promises to verify —
    the 12 entry-module queries (incl. the 5 streaming drains) plus
    extensions.ROUND9_WINDOW — actually lands inside the window. Adding
    a query to any family dict can no longer silently push a promised
    entry out of the verified window."""
    from flink_streaming_twitter_spark.plans.extensions import ROUND9_WINDOW

    window = list(entry_mod.queries().keys())[:50]
    entry_module_head = [
        "qa_trending_two_stage",
        "qb_trending_single",
        "qc_running_total",
        "qd_counts_per_window",
        "q_json_extract",
        "q_value_by_window",
        "q_tokenize_topk",
        "stream_qb_counts",
        "stream_dedup_keys",
        "stream_qa_trending",
        "stream_interval_pairs",
        "stream_session_counts",
    ]
    promised = entry_module_head + list(ROUND9_WINDOW)
    assert len(promised) == 50 == len(set(promised))
    assert window == promised
