"""Round-5 ANN + streaming 100× probe (companion to scale_bench_r5.py,
which covers the output-sensitive dedup paths): measure the IVF
index-sizing guidance and the two heaviest streaming drains at two
decades above the gate scale.

- ``similarity_ivf_topk`` — the r3 10× measurement showed the FIXED
  ``seed_mod`` form growing ~quadratically (ncells ∝ n ⇒ n×ncells
  assignment ∝ n²) and SCALE.md's guidance is "deploy with
  seed_mod ∝ √n". That guidance shipped (``ivf_topk(seed_mod=None)``
  auto-sizes to √n) but was never measured at scale. Cells: gate-fixed
  ``seed_mod=53`` at sf0.1 and ×100 (ONE pass — the documented-bad
  configuration, ~750 M pair distances at 200 k vectors), auto-√n at
  sf0.1 and ×100 (2 passes — the deploy form). The contrast converts
  the sizing rule from 10×-extrapolation to measured.
- ``similarity_lsh_topk`` / ``similarity_brute_topk`` — per-query cost
  ∝ corpus/2^planes and ∝ corpus respectively; both expected ~linear,
  measured to close the ANN table at two decades.
- ``stream_qa_trending`` (RocksDB chained two-agg) and
  ``stream_interval_pairs`` (stream-stream interval join, the
  near-envelope entry) — 10 M events through the full multi-batch
  engine, query-only seconds via the drain timing stamps.

Embeddings ×100 replica follows tools/make_scale10.py's convention:
vec_id offsets, vectors IDENTICAL across replicas (deliberate — models
exact-duplicate vectors at scale); the ×100 corpus is 200 k vectors.
Queries stay the original ``vec_id < ANN_NUM_QUERIES`` set, so per-query
cost is what scales. Events come from scale_bench_r5.py's /tmp/sf10
build (run that first, or this builds the events table too).

Usage: python tools/scale_bench_r5_ann.py   # one JSON line per cell
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


def build_embeddings100(spark) -> None:
    path = os.path.join(DST, "embeddings.parquet")
    # _SUCCESS is Spark's job-commit marker: a directory left behind by an
    # interrupted write lacks it, so the rebuild is NOT skipped on a
    # partial corpus (round-5 advice — a bare exists() check silently
    # reused partial data as the ×100 corpus).
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    os.makedirs(DST, exist_ok=True)
    emb = (
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .withColumn("vec_id", F.col("vec_id") + F.col("k") * F.lit(OFFSET))
        .drop("k")
    )
    emb.repartition(32).write.mode("overwrite").parquet(path)
    print(
        json.dumps({"built": path, "vectors": spark.read.parquet(path).count()}),
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
    from flink_streaming_twitter_spark.operators.similarity import ivf_topk
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans import reference_queries as RQ
    from flink_streaming_twitter_spark.plans import similarity as PS
    from flink_streaming_twitter_spark.sources.files import load_table

    import __spark_entry__ as entry_mod

    spark = build_session("scale-bench-r5-ann", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    build_embeddings100(spark)
    if not os.path.exists(os.path.join(DST, "events.parquet")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_bench_r5 import build_scale100

        build_scale100(spark)

    def ivf_auto(d):
        emb = load_table(spark, d, "embeddings")
        return ivf_topk(
            emb,
            emb.filter(F.col("vec_id") < P.ANN_NUM_QUERIES),
            P.ANN_TOP_K,
            nprobe=P.IVF_NPROBE,
            seed_mod=None,  # auto √n — the deploy sizing
            seed_rem=P.IVF_SEED_REM,
        )

    both = (("sf0.1", SRC), ("x100", DST))
    cells = (
        # gate-fixed seed_mod: the documented-unscalable sizing — ONE
        # pass at the expensive ×100 cell only (ncells ∝ n makes
        # assignment ∝ n²; r3 measured 3.9× at 10×, so ~an order of
        # magnitude worse here). sf0.1 keeps the standard 2 passes so
        # the fixed-vs-auto comparison at sf0.1 is warm-vs-warm, not
        # cold-vs-warm (round-5 advice).
        ("similarity_ivf_topk",
         {"seed_mod": P.IVF_SEED_MOD, "passes": {"sf0.1": PASSES, "x100": 1}},
         lambda d: PS.similarity_ivf_topk(spark, d), both,
         {"sf0.1": PASSES, "x100": 1}),
        ("similarity_ivf_topk", {"seed_mod": "auto_sqrt_n"},
         lambda d: ivf_auto(d), both, PASSES),
        ("similarity_lsh_topk", {},
         lambda d: PS.similarity_lsh_topk(spark, d), both, PASSES),
        ("similarity_brute_topk", {},
         lambda d: PS.similarity_brute_topk(spark, d), both, PASSES),
    )
    for name, knobs, build, dirs, passes in cells:
        row: dict = {"bench": name, **knobs}
        for tag, d in dirs:
            n_passes = passes[tag] if isinstance(passes, dict) else passes
            best, rows = timed(lambda: build(d), passes=n_passes)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if "x100" in row and row["sf0.1"] > 0:
            row["factor"] = round(row["x100"] / row["sf0.1"], 2)
        print(json.dumps(row), flush=True)

    # the two heaviest drains at 100× events (query-only seconds via the
    # drain harness's stamps — same scope as bench.py's tracker)
    qs = entry_mod.queries()
    for name in ("stream_qa_trending", "stream_interval_pairs"):
        row = {"bench": name}
        for tag, d in (("sf0.1", SRC), ("x100", DST)):
            best, rows = None, None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = qs[name](spark, d).count()
                dt = time.perf_counter() - t0
                if RQ.LAST_DRAIN_TIMING:
                    dt = (
                        RQ.LAST_DRAIN_TIMING["query_end"]
                        - RQ.LAST_DRAIN_TIMING["query_start"]
                    )
                best = dt if best is None else min(best, dt)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
        row["factor"] = round(row["x100"] / row["sf0.1"], 2) if row["sf0.1"] > 0 else None
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
