"""Sweep ``state_partitions`` for the streaming drain gate entries.

Each stateful operator commits one state-store instance per shuffle
partition per micro-batch, so a bounded replay pays fixed cost per
partition (the rationale already recorded on _drain_events_stream and
measured for stream_qa_trending's RocksDB drain in round 13: 4→1.98 s,
8→2.22 s, 16→2.85 s). Round 14 extends the sweep to the other four
drains so their defaults are measured, not inherited.

Times the QUERY-ONLY window (query_start→query_end from the drain's
timing hook — replay prep and conf bookkeeping excluded), min over
N passes per cell, fresh comparisons within one session per entry.

Usage: python tools/stream_partition_sweep.py [passes=3] [sf_dir]
Prints one JSON line per (entry, partitions) cell.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans import reference_queries as RQ

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    # (name, build lambda, output_mode, state_store) — mirrors the gate
    # entries' _drain_events_stream wiring exactly (plans/reference_queries)
    def interval_build(pipe):
        from flink_streaming_twitter_spark.streaming.runner import stream_interval_join

        s = pipe.raw
        errs = s.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("err_ts")
        )
        purch = s.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
        )
        return stream_interval_join(
            errs, purch, ["user_id"], "err_ts", "p_ts", RQ.STREAM_JOIN_DELAY_S
        ).select("err_id", "p_id")

    cases = [
        (
            "stream_qb_counts",
            lambda pipe: pipe.windowed_counts(
                f"{P.TREND_SIZE_S} seconds", f"{P.TREND_SLIDE_S} seconds"
            ),
            "update",
            None,
        ),
        (
            "stream_dedup_keys",
            lambda pipe: pipe.dedup_within_watermark(
                ["user_id", "event_type"], watermark=RQ.DEDUP_REPLAY_WATERMARK
            ).select("user_id", "event_type"),
            "append",
            None,
        ),
        ("stream_interval_pairs", interval_build, "append", None),
        (
            "stream_qa_trending",
            lambda pipe: pipe.trending_two_stage_append(
                f"{P.TREND_SIZE_S} seconds",
                f"{P.TREND_SLIDE_S} seconds",
                P.SAMPLE_SIZE_S,
                P.SAMPLE_SLIDE_S,
            ),
            "append",
            "rocksdb",
        ),
        (
            "stream_session_counts",
            lambda pipe: pipe.session_counts(
                f"{RQ.STREAM_SESSION_GAP_S} seconds", key_col="user_id"
            ),
            "append",
            None,
        ),
    ]

    spark = build_session("stream-partition-sweep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    for name, build, mode, store in cases:
        for parts in (2, 4, 8):
            secs, rows = [], None
            for _ in range(n_passes):
                timing: dict[str, float] = {}
                sink = RQ._drain_events_stream(
                    spark,
                    sf_dir,
                    f"sweep_{name}",
                    build,
                    output_mode=mode,
                    state_store=store,
                    state_partitions=parts,
                    timing=timing,
                )
                rows = sink.count()
                secs.append(round(timing["query_end"] - timing["query_start"], 3))
                spark.catalog.dropTempView(f"sweep_{name}")
                spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "bench": name,
                        "state_partitions": parts,
                        "query_seconds_min": min(secs),
                        "passes": secs,
                        "rows": rows,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
