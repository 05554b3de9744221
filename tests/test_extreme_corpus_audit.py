"""Extreme-value sanity-contract audit (round 11, the probe made
self-sustaining — same pattern as tests/test_null_corpus_audit.py).

The round-11 extreme-boundary probe (SCALE.md) found that finite-but-
insane inputs break the engines in ways the round-10 non-finite
contract cannot see: a 1e300 measurement overflows DuckDB's STDDEV_SAMP
and every DECIMAL hash-stability cast while Spark keeps computing, and
a year-9999 event time poisons a stream's watermark (eviction mechanics
pinned in tests/test_streaming.py). This audit builds the probe's
events-scoped corpus (tools/make_extreme_corpus.py) and proves, on
every pytest run:

1. the sanity-bound variants (q_value_stats_sane /
   q_value_by_window_sane, plans/sanity.py) match their DuckDB oracles
   EXACTLY on data where the bounds bind;
2. the quarantine is visible and exactly sized (the ledger column and
   the window-epoch range), not a silent drop;
3. the BASE family's oracles genuinely error on the same corpus — the
   audit's proof that the variants are load-bearing, not decorative —
   while the base Spark plans silently leak a year-9999 window, which
   is the cross-engine hazard the bounds close.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SANE_ENTRIES = ["q_value_stats_sane", "q_value_by_window_sane"]


@pytest.fixture(scope="module")
def extreme_corpus(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("extremecorpus") / "sfextreme")
    _load_tool("make_extreme_corpus").build("/root/testdata/sf0.001", dst)
    return dst


@pytest.fixture(scope="module")
def duck_views(extreme_corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS FROM '{extreme_corpus}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", SANE_ENTRIES)
def test_sane_entry_matches_oracle_on_extreme_corpus(spark, extreme_corpus, duck_views, name):
    import __spark_entry__ as entry_mod

    check = _load_tool("check_oracle")
    sdf = entry_mod.queries()[name](spark, extreme_corpus)
    ddf = duck_views.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    problems = check.compare(name, sdf, ddf)
    assert not problems, f"{name} diverged on the extreme corpus: {problems}"


def test_quarantine_ledger_binds(spark, extreme_corpus):
    """The magnitude bound quarantines exactly the corpus's four insane
    'view' readings (1e300, 1e30, -1e15, NaN) and keeps the denormal —
    by magnitude, not by weirdness — while every other group stays
    untouched; n keeps counting rows (the event happened)."""
    import __spark_entry__ as entry_mod

    rows = {
        r.event_type: r
        for r in entry_mod.queries()["q_value_stats_sane"](spark, extreme_corpus).collect()
    }
    assert rows["view"].n_quarantined == 4
    assert sum(r.n_quarantined for r in rows.values()) == 4
    # the kept denormal is the group minimum and rounds to exactly 0.0
    assert rows["view"].v_min == 0.0


def test_event_time_bound_binds(spark, extreme_corpus):
    """Sane windows stay inside [EVENT_TIME_LO, EVENT_TIME_HI); the BASE
    plan windows the year-9999 poison row (epoch 253402214400 — the
    exact row class whose watermark eviction
    test_far_future_event_poisons_watermark_and_evicts_stream_tail
    pins). A window's w_start can precede its member row's bound by at
    most size-slide, hence the slack on the lower check."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.plans import params as P

    qs = entry_mod.queries()
    sane = (
        qs["q_value_by_window_sane"](spark, extreme_corpus)
        .agg(F.min("w_start").alias("lo"), F.max("w_start").alias("hi"))
        .collect()[0]
    )
    hi_bound = 4102444800  # epoch of 2100-01-01 (EVENT_TIME_HI)
    assert sane.lo >= -(P.TREND_SIZE_S - P.TREND_SLIDE_S)
    assert sane.hi < hi_bound
    base_hi = (
        qs["q_value_by_window"](spark, extreme_corpus)
        .agg(F.max("w_start"))
        .collect()[0][0]
    )
    assert base_hi >= hi_bound, "corpus must genuinely carry the poison row"


# ADVICE r11: match an error-CLASS pattern, not one exact message —
# DuckDB rephrases these across releases, and the pin's semantic
# content is "the base oracle errors with ITS blowup class on this
# corpus", not the prose it errors with. Case-insensitive because
# DuckDB's class header capitalizes ("Out of Range Error:") while the
# detail lowercases; per-entry patterns so a silent shift WITHIN the
# blowup family (e.g. the stats oracle starting to fail on the cast
# instead of the second moment) still flags.
@pytest.mark.parametrize(
    ("name", "error_class"),
    [
        # second-moment overflow at 1e300 (STDDEV_SAMP out of range)
        ("q_value_stats", r"(?i)out of range|overflow"),
        # DECIMAL(18,6) rounding-cast out-of-range at 1e30 sums
        ("q_value_by_window", r"(?i)could not cast|out of range"),
    ],
)
def test_base_oracle_errors_on_extreme_corpus(duck_views, name, error_class):
    """The probe's red rows, pinned: on this corpus the BASE oracles
    error inside DuckDB (second-moment overflow at 1e300; DECIMAL(18,6)
    cast out-of-range at 1e30) — exactly why the sanity bounds exist.
    If DuckDB ever starts tolerating these, the pin flags that the
    corpus no longer proves the variants load-bearing."""
    import __spark_entry__ as entry_mod

    with pytest.raises(Exception, match=error_class):
        duck_views.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
