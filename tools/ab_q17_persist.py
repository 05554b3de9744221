"""Interleaved A/B for TPC-H q17's decorrelated double fact pass
(VERDICT r14 item 6): the entry joins lineitem⋈broadcast(part) TWICE —
once for the per-part average-quantity aggregate, once for the main
filter arm. The round-14 checklist asserted (by analogy to the measured
q11/q15 rows) that re-running the pruned fact pass is cheaper than a
persist's materialization barrier; this tool turns the analogy into a
number by timing the shipped entry against a variant that persists the
joined prefilter once.

Usage: python tools/ab_q17_persist.py [passes=4] [sf_dir=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def q17_persisted(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.plans.analytics import _dec
    from flink_streaming_twitter_spark.sources.files import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pre = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .persist()
    )
    avg_qty = pre.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        pre.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.plans.analytics import (
        tpch_q17_small_quantity_revenue,
    )

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    spark = build_session("ab-q17", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def fp(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("avg_yearly", "n_items").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        return int(row.n), int(row.h)

    variants = [
        ("base", lambda: tpch_q17_small_quantity_revenue(spark, sf_dir)),
        ("pre_persist", lambda: q17_persisted(spark, sf_dir)),
    ]
    res = {v: [] for v, _ in variants}
    fps = {}
    for p in range(n_passes):
        for vname, make in variants:
            spark.sparkContext.setJobDescription(f"ab_q17 {vname} pass{p}")
            t0 = time.perf_counter()
            f = fp(make())
            res[vname].append(round(time.perf_counter() - t0, 3))
            prev = fps.setdefault(vname, f)
            assert prev == f, f"{vname} drifted: {prev} vs {f}"
            spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    assert fps["base"] == fps["pre_persist"], f"outputs differ: {fps}"
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "passes": n_passes,
                "timings": res,
                "min": {v: min(ts) for v, ts in res.items()},
                "load_15m": round(os.getloadavg()[2], 2),
            },
            indent=2,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
