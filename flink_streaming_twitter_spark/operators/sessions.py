"""Session windows: an operator the reference lacks (SURVEY.md §2.5 notes
session windows as extension-roadmap) but Spark has natively.

Batch and streaming share ``session_window(ts, gap)``: events from one
user separated by AT MOST the gap merge into one session (Spark merges
sessions whose intervals touch — an event exactly gap seconds after the
previous one still merges; pinned by
test_sessionize_matches_gap_merge_model). The batch
form here is oracle-checked against a DuckDB gaps-and-islands rewrite
(lag + cumulative flag sum) — the classic SQL equivalent.

Scale: groupBy(session_window, user) shuffles once on user; state in
streaming mode is bounded by the watermark (sessions older than watermark
- gap finalize and evict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-(user, session): start/last event epochs, event count, value sum.

    session_start is the first event's epoch second; session_last the
    final event's (NOT start+gap — that is session_window.end semantics,
    which embeds the gap and is less portable)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.col(ts_col).cast("double")).alias("first_ts"),
            F.max(F.col(ts_col).cast("double")).alias("last_ts"),
        )
        .select(
            user_col,
            F.floor(F.col("first_ts")).cast("long").alias("session_start"),
            F.floor(F.col("last_ts")).cast("long").alias("session_last"),
            "n_events",
        )
    )
