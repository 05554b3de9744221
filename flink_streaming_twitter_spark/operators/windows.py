"""Event-time window operators (SURVEY.md §2.5/§2.6).

Reference semantics being reproduced:

- W1+A1+A2 (Main.java:85-89, 75-83, 358-383): keyed sliding event-time
  window with incremental per-key sum, output decorated with the window end.
  Spark: ``groupBy(window(ts, size, slide), key).agg(...)`` — the hash
  aggregate already does partial (map-side) + final aggregation, which is
  exactly the Flink AggregateFunction add/merge contract, and the window
  struct column carries start/end natively.
- W2 (Main.java:98): a *sampling* window — size 1 s, slide 5 s, i.e. the
  window covers only the first fifth of each slide period and rows in the
  4 s gaps are dropped. Rather than relying on window() accepting
  slide>size, we express the identical semantics as a modular-arithmetic
  filter + tumbling bucket of the slide period: ts belongs to the sampling
  window starting at w = slide*floor(ts/slide) iff (ts - w) < size. This
  is a narrow (shuffle-free) filter — strictly cheaper at scale.
- W4+T1+A5 (Main.java:148-157): global window + processing-time trigger +
  running sum. Batch twin: cumulative count over time buckets; streaming
  twin: ungrouped agg in update mode (streaming/runner.py).
- W5+A6 (Main.java:159-174): tumbling count.

All outputs expose window boundaries as BIGINT epoch seconds
(``w_start``/``w_end``) — stable to hash across engines, unlike raw
timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win_cols() -> list[Column]:
    return [
        F.col("window.start").cast("long").alias("w_start"),
        F.col("window.end").cast("long").alias("w_end"),
    ]


def sliding_window_counts(
    df: DataFrame,
    ts_col: str,
    key_col: str | None,
    size: str,
    slide: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-(window[, key]) counts (or weighted sums) over a sliding
    event-time window.

    Scale notes: window() explodes each row into size/slide window copies
    before the hash aggregate — the shuffle carries pre-aggregated partial
    sums only (Catalyst plans partial_count → exchange → final_count), so
    the network volume is O(#distinct (window,key)), not O(rows). Skewed
    keys (one viral hashtag) are handled by AQE skew handling plus the
    two-level aggregate; no manual salting needed for counts because the
    partial aggregate already collapses per-partition duplicates.
    """
    keys = [F.window(F.col(ts_col), size, slide).alias("window")]
    if key_col is not None:
        keys.append(F.col(key_col))
    agg = (
        F.sum(F.col(weight_col)).alias("cnt")
        if weight_col
        else F.count(F.lit(1)).alias("cnt")
    )
    out_cols = _win_cols() + ([F.col(key_col)] if key_col else []) + [F.col("cnt")]
    return df.groupBy(*keys).agg(agg).select(*out_cols)


def sampling_filter(df: DataFrame, ts_col: str, size_s: int, slide_s: int) -> DataFrame:
    """W2 semantics (size < slide): keep rows whose event time falls in the
    first ``size_s`` seconds of each ``slide_s``-second period, and stamp
    the sampling-window start (``sample_w_start`` BIGINT epoch seconds).

    Equivalent to Flink's timeWindowAll(Time.seconds(1)) sliding every 5 s
    (Main.java:98) without materializing per-row window copies.
    """
    epoch = F.col(ts_col).cast("double")
    w_start = (F.floor(epoch / slide_s) * slide_s).cast("long")
    return df.withColumn("sample_w_start", w_start).filter(
        epoch - F.col("sample_w_start") < F.lit(size_s)
    )


def tumbling_counts(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    """W5+A6: count per tumbling window (Main.java:159-174)."""
    return (
        df.groupBy(F.window(F.col(ts_col), size).alias("window"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(*_win_cols(), F.col("cnt"))
    )


def running_total(df: DataFrame, ts_col: str, bucket: str = "1 hour") -> DataFrame:
    """Batch twin of the global-window running count (W4+A5,
    Main.java:148-155): per-bucket counts plus the cumulative total as of
    each bucket end.

    The cumulative window function runs unpartitioned — acceptable because
    its input cardinality is the number of *buckets* (hours), not rows: the
    heavy aggregation happened in the distributed groupBy below it. This is
    the standard scale shape for running totals.
    """
    per_bucket = (
        df.groupBy(F.window(F.col(ts_col), bucket).alias("window"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").cast("long").alias("bucket_start"), F.col("cnt"))
    )
    w = Window.orderBy("bucket_start").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_bucket.select(
        "bucket_start",
        "cnt",
        F.sum("cnt").over(w).alias("running_total"),
    )
