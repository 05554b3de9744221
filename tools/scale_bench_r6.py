"""Round-6 probe: pin the ×100 recall DENOMINATOR at the deploy threshold.

SCALE.md's round-5 headline — `dedup_lsh_exact` recall 99.85% at ×100 —
divided the deploy path's 25,562 emitted pairs by a *construction-pinned*
denominator of 25,600 true J ≥ 0.5 pairs (100 × the sf0.1 exact count,
cross-replica pairs argued away by the salt scheme). The only exact ×100
measurement behind it was at J ≥ 0.8. Round-5 advice: run the env-gated
exact t=0.5 cell once so the denominator is measured, not argued.

This script runs exactly that one cell: `ngram_jaccard_pairs` (exact
PPJoin all-pairs, no LSH pre-filter) on the /tmp/sf10 ×100 corpus at the
gate threshold t = 0.5, ONE pass (the documented-unscalable
configuration — the t=0.8 cell already cost 334 s; the t=0.5 prefix
filter, length floor((1-t)·|set|)+1, prunes far less, so expect tens of
minutes). The pair COUNT is the denominator; wall seconds are recorded
for the SCALE.md table but are not the point.

Usage: python tools/scale_bench_r6.py   # one JSON line
Requires /tmp/sf10 (tools/scale_bench_r5.py builds it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

DST = "/tmp/sf10"
SRC = "/root/testdata/sf0.1"


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    for t in ("documents",):
        marker = os.path.join(DST, f"{t}.parquet", "_SUCCESS")
        if not os.path.exists(marker):
            raise SystemExit(f"missing {marker}; run tools/scale_bench_r5.py first")

    spark = build_session("scale-bench-r6", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # sf0.1 sanity anchor first (cheap): the construction argument says
    # the ×100 count should be exactly 100× this number.
    base = D.ngram_jaccard_pairs(
        load_table(spark, SRC, "documents"),
        threshold=P.JACCARD_THRESHOLD,
        shingle_k=P.SHINGLE_K,
    ).count()
    print(json.dumps({"bench": "exact_jaccard_t0.5", "sf0.1_rows": base}), flush=True)

    t0 = time.perf_counter()
    rows = D.ngram_jaccard_pairs(
        load_table(spark, DST, "documents"),
        threshold=P.JACCARD_THRESHOLD,
        shingle_k=P.SHINGLE_K,
    ).count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "bench": "exact_jaccard_t0.5",
                "x100_rows": rows,
                "x100_seconds": round(dt, 1),
                "construction_denominator": base * 100,
                "matches_construction": rows == base * 100,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
