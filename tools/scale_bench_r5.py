"""Round-5 100× scale probe: measure the OUTPUT-SENSITIVE operators at
two decades above the gate scale (sf0.1 ×100 ≈ 10 M events / 500 k
documents, built in /tmp/sf10) so the "their scale story is parameter
sizing, not plan shape" claim (SCALE.md) is measured at 100×, not
extrapolated from 10×:

- ``dedup_ngram_jaccard`` — the exact all-pairs baseline whose candidate
  pool grows ~quadratically on a correlated corpus. The PARAMETER effect
  is measured at sf0.1 (gate threshold 0.5 vs scale-sized 0.8 —
  SCALE.md's guidance: at higher scale raise the similarity bar so the
  PPJoin prefix filter, prefix length ``floor((1-t)·|set|)+1``, prunes
  more aggressively) and the DATA effect at the sized threshold
  (sf0.1 → ×100 at t=0.8). The ×100-at-gate-threshold cell is
  deliberately behind ``SPARK_GRAFT_X100_GATE_PARAMS=1`` — it is the
  documented-unscalable configuration (9.2× wall at 10×) and can run
  for tens of minutes.
- ``dedup_simhash`` — output-bound (bucket-collision pairs grew 28× at
  10×). Same split: parameter effect at sf0.1 (gate ``max_hamming=3``
  vs sized ``max_hamming=1`` — fewer pairs survive the exact Hamming
  verify; banding itself stays linear), data effect at the sized
  setting; ×100 at the gate setting behind the same env flag.
- ``stream_qb_counts`` — one full multi-batch drain with 10 M events
  through 3 state-commit cycles (query-only timing via the drain's
  stamps); window-count state is span-bound, so wall should stay near
  the 10× figure.
- ``dedup_lsh_exact`` + ``dedup_minhash_lsh`` — the DEPLOY-path
  contrast cells, run at the unchanged gate parameters (banded LSH
  needs no resizing — that is its point): if the exact all-pairs
  baseline goes super-linear at ×100 while these stay near the data
  factor, the "deploy the two-tier form at scale" guidance is measured
  at two decades rather than argued from 10×.

Replica scheme = tools/make_scale10.py's (id offsets; per-replica salt
token every other word so replicas are NOT near-dups of the original),
built lazily on first run. Only events + documents are replicated —
these cells touch nothing else.

Usage: python tools/scale_bench_r5.py   # one JSON line per cell
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf10"
OFFSET = 10_000_000
REPLICAS = 100
PASSES = 2


def build_scale100(spark) -> None:
    # _SUCCESS (Spark's job-commit marker) rather than bare dir existence:
    # a partial directory from an interrupted run must trigger the
    # overwrite rebuild, not be silently reused (round-5 advice).
    if os.path.exists(
        os.path.join(DST, "documents.parquet", "_SUCCESS")
    ) and os.path.exists(os.path.join(DST, "events.parquet", "_SUCCESS")):
        return
    os.makedirs(DST, exist_ok=True)
    # replicate via explode(sequence(...)) — one narrow pass, no
    # 100-way union plan
    docs = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * F.lit(OFFSET))
        .withColumn(
            "text",
            F.when(F.col("k") == 0, F.col("text")).otherwise(
                F.expr(
                    r"regexp_replace(text, '(\\w+ \\w+)',"
                    r" concat('$1 z', cast(k AS string)))"
                )
            ),
        )
        .drop("k")
    )
    docs.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    ev = (
        spark.read.parquet(f"{SRC}/events.parquet")
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .withColumn("event_id", F.col("event_id") + F.col("k") * F.lit(OFFSET))
        .withColumn("user_id", F.col("user_id") + F.col("k") * F.lit(OFFSET))
        .drop("k")
    )
    ev.repartition(32).write.mode("overwrite").parquet(f"{DST}/events.parquet")
    print(
        json.dumps(
            {
                "built": DST,
                "documents": spark.read.parquet(f"{DST}/documents.parquet").count(),
                "events": spark.read.parquet(f"{DST}/events.parquet").count(),
            }
        ),
        flush=True,
    )


def timed(fn, passes: int = PASSES) -> tuple[float, int]:
    best, rows = None, None
    for _ in range(passes):
        t0 = time.perf_counter()
        rows = fn().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans import reference_queries as RQ
    from flink_streaming_twitter_spark.sources.files import load_table

    import __spark_entry__ as entry_mod

    spark = build_session("scale-bench-r5", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    build_scale100(spark)

    include_gate_x100 = os.environ.get("SPARK_GRAFT_X100_GATE_PARAMS") == "1"

    def ngram(d, t):
        return D.ngram_jaccard_pairs(
            load_table(spark, d, "documents"), threshold=t, shingle_k=P.SHINGLE_K
        )

    def simhash(d, h):
        return D.simhash_near_pairs(load_table(spark, d, "documents"), max_hamming=h)

    from flink_streaming_twitter_spark.plans import dedup as PD

    gate_dirs = (("sf0.1", SRC), ("x100", DST)) if include_gate_x100 else (("sf0.1", SRC),)
    both = (("sf0.1", SRC), ("x100", DST))
    cells = (
        ("dedup_ngram_jaccard", {"threshold": P.JACCARD_THRESHOLD},
         lambda d: ngram(d, P.JACCARD_THRESHOLD), gate_dirs),
        ("dedup_ngram_jaccard", {"threshold": 0.8},
         lambda d: ngram(d, 0.8), both),
        ("dedup_simhash", {"max_hamming": P.SIMHASH_MAX_HAMMING},
         lambda d: simhash(d, P.SIMHASH_MAX_HAMMING), gate_dirs),
        ("dedup_simhash", {"max_hamming": 1},
         lambda d: simhash(d, 1), both),
        # deploy-path contrast: gate parameters unchanged by design
        ("dedup_lsh_exact", {"threshold": P.JACCARD_THRESHOLD},
         lambda d: PD.dedup_lsh_exact(spark, d), both),
        ("dedup_minhash_lsh", {"est_threshold": P.MINHASH_EST_THRESHOLD},
         lambda d: PD.dedup_minhash_lsh(spark, d), both),
    )
    for name, knobs, build, dirs in cells:
        row: dict = {"bench": name, **knobs}
        for tag, d in dirs:
            best, rows = timed(lambda: build(d))
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if "x100" in row and row["sf0.1"] > 0:
            row["factor"] = round(row["x100"] / row["sf0.1"], 2)
        print(json.dumps(row), flush=True)

    # one full drain at 100× events (query-only seconds, same scope as
    # the bench probe)
    qs = entry_mod.queries()
    row = {"bench": "stream_qb_counts"}
    for tag, d in (("sf0.1", SRC), ("x100", DST)):
        best, rows = None, None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            rows = qs["stream_qb_counts"](spark, d).count()
            dt = time.perf_counter() - t0
            if RQ.LAST_DRAIN_TIMING:
                dt = RQ.LAST_DRAIN_TIMING["query_end"] - RQ.LAST_DRAIN_TIMING["query_start"]
            best = dt if best is None else min(best, dt)
        row[tag] = round(best, 2)
        row[f"{tag}_rows"] = rows
    row["factor"] = round(row["x100"] / row["sf0.1"], 2) if row["sf0.1"] > 0 else None
    print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
