"""Interleaved A/B: shipped SimHash fingerprint aggregation (explode +
60-conditional-sum hash aggregate) vs a ROW-WISE prototype (one
``F.aggregate`` traversal with a 60-counter struct accumulator, the
``_plane_agg`` pattern from operators/similarity.py).

Arithmetic equivalence: the shipped vote for bit j is
sum(+1 if bit set else -1) > 0 over a doc's DISTINCT token hashes ⟺
2·count_set_j > n — exact integers, so the two forms must produce
bit-identical fingerprints; asserted before timings are trusted. Docs
with zero tokens leave the shipped path via the empty explode and the
prototype via a size(hs) > 0 filter.

The question measured: the shipped form pays row amplification
(explode) plus a 60-column aggregation buffer but runs fully
codegen'd; the prototype avoids explode entirely but walks the token
array through INTERPRETED higher-order-function lambdas. Whichever is
faster on the gate corpus informs the shipped choice; the full
simhash_near_pairs entry is also timed end-to-end both ways (the
fingerprint table feeds a persist + banded self-join either way).

Usage: python tools/ab_simhash_rowwise.py [passes=4] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def rowwise_fingerprints(docs, id_col="doc_id", text_col="text"):
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.functions.hashing import md5_int60
    from flink_streaming_twitter_spark.functions.text import tokens
    from flink_streaming_twitter_spark.operators.dedup import (
        SIMHASH_BITS,
        _spread,
        one_row_per_key,
    )

    resolved = one_row_per_key(
        _spread(docs.select(id_col, text_col), id_col), id_col, text_col
    )
    hs = F.transform(
        F.array_distinct(tokens(F.col(text_col))), lambda t: md5_int60(t)
    )
    base = resolved.select(F.col(id_col), hs.alias("hs")).filter(F.size("hs") > 0)
    n = F.size(F.col("hs"))
    acc0 = F.struct(
        *[F.lit(0).cast("int").alias(f"c{j}") for j in range(SIMHASH_BITS)]
    )

    def step(acc, h):
        return F.struct(
            *[
                (
                    acc[f"c{j}"]
                    + F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(0)
                ).alias(f"c{j}")
                for j in range(SIMHASH_BITS)
            ]
        )

    def finish(acc):
        fp = F.lit(0).cast("long")
        for j in range(SIMHASH_BITS):
            fp = fp + F.when(
                acc[f"c{j}"] * 2 > n, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return fp

    return base.select(
        F.col(id_col), F.aggregate(F.col("hs"), acc0, step, finish).alias("simhash")
    )


def fingerprint_of(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("doc_id", "simhash").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    spark = build_session("ab-simhash-rowwise", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    variants = {
        "shipped": lambda: D.simhash_fingerprints(docs),
        "rowwise": lambda: rowwise_fingerprints(docs),
    }
    results: dict[str, list[float]] = {v: [] for v in variants}
    fps: dict[str, tuple[int, int]] = {}
    for p in range(n_passes):
        for vname, make in variants.items():
            spark.sparkContext.setJobDescription(f"ab_simhash fp {vname} pass{p}")
            t0 = time.perf_counter()
            fp = fingerprint_of(make())
            results[vname].append(round(time.perf_counter() - t0, 3))
            prev = fps.setdefault(vname, fp)
            assert prev == fp, f"{vname}: drift {prev} vs {fp}"
            spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    assert fps["shipped"] == fps["rowwise"], (
        f"fingerprints differ: {fps['shipped']} vs {fps['rowwise']}"
    )

    out = {
        "sf_dir": sf_dir,
        "passes": n_passes,
        "fingerprints_equal": True,
        "timings": results,
        "min": {v: min(ts) for v, ts in results.items()},
        "load_15m": round(os.getloadavg()[2], 2),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
