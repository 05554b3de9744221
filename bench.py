"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully materialized via a count() over the result (forces
every exchange/aggregate; avoids driver-side transfer skewing timings).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from flink_streaming_twitter_spark.session import build_session

    import __spark_entry__ as entry_mod

    spark = build_session(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm the JVM/IO once (scan both fact tables) so query timings
    # measure plans, not first-touch page cache
    for t in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    out = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
