"""Round-4 10× scale-up probe: rerun the paths this round CHANGED at
/tmp/sf1 (tools/make_scale10.py — 1 M events, 10× documents) so the new
costs are measured, not asserted:

- the five multi-batch streaming drains (3 time-sliced files,
  maxFilesPerTrigger=1): does per-batch state-commit overhead stay fixed
  while the data cost scales, and do the drains stay inside the 5 s/
  trigger reference envelope at 10× the gate scale?
- multimodal_decode_stats after the decode-once persist() fix: the
  kernel should now scale with corpus size, not corpus size × consumers.

Usage: python tools/scale_bench_r4.py   # one JSON line per cell
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
PASSES = 2

QUERIES = (
    "multimodal_decode_stats",
    "stream_qb_counts",
    "stream_dedup_keys",
    "stream_qa_trending",
    "stream_interval_pairs",
    "stream_session_counts",
)


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = build_session("scale-bench-r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # warm scans
    for d in (SF01, SF1):
        spark.read.parquet(os.path.join(d, "events.parquet")).count()
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()
    from flink_streaming_twitter_spark.plans import reference_queries as RQ

    for name in QUERIES:
        row = {"bench": name}
        best_raw: dict[str, float] = {}
        for tag, d in (("sf0.1", SF01), ("x10", SF1)):
            best = None
            rows = None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                dt = time.perf_counter() - t0
                # stream entries: time ONLY query start → termination via
                # the drain's module-global stamps (same scope as the
                # bench probe, ADVICE r3) — the wall clock would fold the
                # per-pass replay prep (O(n) pyarrow sort+split) into the
                # measurement and overstate drain-cost growth at 10×
                if name.startswith("stream_") and RQ.LAST_DRAIN_TIMING:
                    dt = (
                        RQ.LAST_DRAIN_TIMING["query_end"]
                        - RQ.LAST_DRAIN_TIMING["query_start"]
                    )
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            best_raw[tag] = best
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
        # factor from the UNROUNDED timings (ADVICE r4): rounding first
        # skews fast cells and a sub-5ms sf0.1 best would round to 0.0
        # and divide by zero
        row["factor"] = (
            round(best_raw["x10"] / best_raw["sf0.1"], 2) if best_raw["sf0.1"] > 0 else None
        )
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
