"""Isolated N-pass rerun of one queries() entry in a FRESH session —
the run-to-run distribution probe used to separate plan regressions from
JIT/co-tenancy noise in the shared-JVM bench (SCALE.md).

Rationale: the full bench runs every queries() entry in one long-lived JVM, so a
single entry's draw folds in C2 compilation of whichever generated loops
happen to be cold plus GC debt from the preceding queries. Rerunning the
entry alone, several passes, in its own session gives the distribution:
a plan regression shifts EVERY pass; noise shows up as a fat first pass
decaying to a steady state (cf. dedup_clusters: 7.5/5.6/2.4/2.3 s).

Both distributions are recorded: ``passes`` (no explicit GC — the
bench's ambient condition, where cleanup debt from persisted blocks and
shuffle files lands as a multi-second burst on whichever pass the
collector fires in) and ``passes_gc`` (System.gc() after each pass —
flushes the debt at a known point, exposing the cold-JIT-then-steady
shape). A plan regression shifts BOTH; GC noise only the first.

Usage: python tools/isolated_rerun.py <query_name> [passes=5] [sf_dir]
Prints one JSON line:
  {"bench": name, "sf_dir": ..., "passes": [...], "passes_gc": [...]}
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

    def run(n: int, gc: bool) -> list[float]:
        out: list[float] = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            out.append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
            if gc:
                spark.sparkContext._jvm.System.gc()
        return out

    passes = run(n_passes, gc=False)
    spark.sparkContext._jvm.System.gc()
    passes_gc = run(n_passes, gc=True)
    print(
        json.dumps(
            {"bench": name, "sf_dir": sf_dir, "passes": passes, "passes_gc": passes_gc}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
