"""Sanity-bound params variants of the value-stats / value-by-window
families (round 11): the extreme-boundary probe's deploy guidance as
oracle-checked queries.

``q_value_stats`` and ``q_value_by_window`` carry the round-10
non-finite contract (NaN/±inf readings are no-measurements), which is
necessary but not sufficient at 100 TB: a finite 1e300 "measurement"
(an overflowed upstream parse one step short of inf) still overflows
DuckDB's STDDEV_SAMP and every DECIMAL(18,6) hash-stability cast while
Spark silently keeps computing, and a single year-9999 event time
poisons a stream's watermark (SCALE.md extreme-boundary probe; the
eviction mechanics are pinned by
test_far_future_event_poisons_watermark_and_evicts_stream_tail).
These variants add the ingest-time bounds (functions/sanity.py): a
measurement is usable iff finite AND |x| < MEASUREMENT_MAGNITUDE_BOUND;
an event time is usable iff inside [EVENT_TIME_LO, EVENT_TIME_HI).
Quarantined readings are counted, not dropped — ``n`` stays the row
count and ``n_quarantined`` makes the contract's effect visible in the
driver hash (zero on the gate corpora, which sit far inside every
bound; binding rows live in tests/test_extreme_corpus_audit.py's
corpus, where the BASE family's oracles error by construction).

Reference parity note: the reference assigns event time with a fixed
300 s bounded-disorder assumption and no upstream sanity check
(PrcoessTweetFromKafkaAndWriteToInfluxDatabase.java:66,90 —
BoundedOutOfOrdernessTimestampExtractor(Time.seconds(300))) — one
corrupt future tweet timestamp would silently evict its stream tail
the same way. The bounds here are the PySpark-first answer the probe
documented, not a translated feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sanity import (
    EVENT_TIME_HI,
    EVENT_TIME_LO,
    MEASUREMENT_MAGNITUDE_BOUND,
    sane_event_time,
    sane_measurement,
)
from ..operators.windows import sliding_window_counts
from ..sources.files import load_table
from . import params as P


def q_value_stats_sane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_value_stats with the magnitude bound: moments over sane
    readings only, plus the quarantine ledger. A reading quarantines iff
    it is present but unusable (NULL readings were never measurements
    and don't count as quarantined)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", sane_measurement(F.col("value"))
    )
    return ev.groupBy("event_type").agg(
        F.round(F.min("v"), 6).alias("v_min"),
        F.round(F.max("v"), 6).alias("v_max"),
        F.round(F.avg("v"), 6).alias("v_avg"),
        F.round(F.stddev_samp("v"), 6).alias("v_stddev"),
        F.round(F.var_samp("v"), 6).alias("v_var"),
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(F.col("value").isNotNull() & F.col("v").isNull(), F.lit(1))
        ).alias("n_quarantined"),
    )


def q_value_by_window_sane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_value_by_window with BOTH bounds: insane event times are
    nullified before windowing (window() then drops them down the
    established NULL-ts track — in the streaming twin this guard sits
    before withWatermark, which is what actually prevents the poisoned-
    watermark eviction), and insane measurements are nullified before
    the DECIMAL(18,6) sum whose representable domain defines the bound.
    Same output shape as the base entry; rows differ only when a corpus
    carries out-of-bound rows."""
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts_sane", sane_event_time(F.col("ts")))
        .withColumn(
            "value_d", sane_measurement(F.col("value")).cast("decimal(18,6)")
        )
    )
    out = sliding_window_counts(
        ev,
        "ts_sane",
        "event_type",
        f"{P.TREND_SIZE_S} seconds",
        f"{P.TREND_SLIDE_S} seconds",
        weight_col="value_d",
    )
    return out.select(
        "w_start", "w_end", "event_type", F.col("cnt").cast("double").alias("sum_value")
    )


SANITY_QUERIES = {
    "q_value_stats_sane": q_value_stats_sane,
    "q_value_by_window_sane": q_value_by_window_sane,
}

# CASE twins of sane_measurement / sane_event_time — interpolated from
# the SAME constants the Spark side reads, so the two engines cannot
# drift. abs(NaN) < bound is FALSE (not NULL) in both engines, but the
# isfinite() guard makes the NaN path explicit rather than incidental.
_SANE_VALUE_SQL = (
    f"CASE WHEN isfinite(value) AND abs(value) < {MEASUREMENT_MAGNITUDE_BOUND!r} "
    "THEN value END"
)
_SANE_TS_PRED_SQL = (
    f"ts >= TIMESTAMP '{EVENT_TIME_LO}' AND ts < TIMESTAMP '{EVENT_TIME_HI}'"
)


def sanity_oracles() -> dict[str, str]:
    return {
        "q_value_stats_sane": f"""
SELECT event_type,
       round(min(v), 6) AS v_min,
       round(max(v), 6) AS v_max,
       round(avg(v), 6) AS v_avg,
       round(stddev_samp(v), 6) AS v_stddev,
       round(var_samp(v), 6) AS v_var,
       count(*) AS n,
       count(CASE WHEN value IS NOT NULL AND v IS NULL THEN 1 END) AS n_quarantined
FROM (SELECT event_type, value, {_SANE_VALUE_SQL} AS v FROM events)
GROUP BY event_type
""",
        # the base Q_VALUE_BY_WINDOW shape (plans/oracles.py) with the
        # sanity predicates: out-of-bound event times leave the window
        # explosion entirely (the ts IS NOT NULL filter generalized),
        # and the value CASE keeps a finite-but-1e30 reading from ever
        # reaching the DECIMAL cast that errors on it
        "q_value_by_window_sane": f"""
WITH slid AS (
  SELECT
    CAST(floor(epoch(ts)/{P.TREND_SLIDE_S}) AS BIGINT)*{P.TREND_SLIDE_S} - k.k*{P.TREND_SLIDE_S} AS w_start,
    event_type, value
  FROM events
  CROSS JOIN (FROM range(0, {P.TREND_SIZE_S // P.TREND_SLIDE_S}) t(k)) k
  WHERE {_SANE_TS_PRED_SQL}
)
SELECT w_start, w_start + {P.TREND_SIZE_S} AS w_end, event_type,
       CAST(sum(CAST({_SANE_VALUE_SQL} AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM slid GROUP BY 1, 2, 3
""",
    }
