"""Isolated N-pass rerun of one queries() entry in a FRESH session —
the run-to-run distribution probe used to separate plan regressions from
JIT/co-tenancy noise in the shared-JVM bench (SCALE.md).

Rationale: the full bench runs ~80 queries in one long-lived JVM, so a
single entry's draw folds in C2 compilation of whichever generated loops
happen to be cold plus GC debt from the preceding queries. Rerunning the
entry alone, several passes, in its own session gives the distribution:
a plan regression shifts EVERY pass; noise shows up as a fat first pass
decaying to a steady state (cf. dedup_clusters: 7.5/5.6/2.4/2.3 s).

Usage: python tools/isolated_rerun.py <query_name> [passes=5] [sf_dir]
Prints one JSON line: {"bench": name, "sf_dir": ..., "passes": [s, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def main() -> None:
    import __spark_entry__ as entry_mod

    name = sys.argv[1]
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = build_session(f"isolated-{name}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]
    passes: list[float] = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        passes.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
    print(json.dumps({"bench": name, "sf_dir": sf_dir, "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
