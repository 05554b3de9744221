"""Skewed-key benchmark (VERDICT r2 item 3): prove the skew story with
numbers instead of prose.

Fixtures (written to /tmp/skewfix as parquet):
- ``big_skew``: 40 M rows (SKEW_BENCH_N) x (id, val, 64-char payload),
  one hot key holding ~30% of them, the rest uniform over 999 cold
  keys — the "one domain is 30% of the corpus" shape from
  operators/sampling.py's docstring;
- ``big_uniform``: the same rows spread evenly over 1000 keys;
- ``dim``: 1000 key rows (made non-broadcastable in the join runs by
  setting autoBroadcastJoinThreshold=-1, so the shuffle path — the one
  skew actually hurts — is what's measured).

Measurements (min over 2 timed passes each):
1. ``cap_per_key`` vs ``cap_per_key_salted`` (k=1000, 16 salts) on both
   fixtures — quantifies when the two-phase form pays for itself given
   that Spark's partial WindowGroupLimit already caps what each map task
   ships;
2. plain shuffled join with AQE skew-split ON, with it OFF (the
   single-hot-reducer worst case), and ``salted_join`` (16 salts, AQE
   skew-split OFF) — on both fixtures.

Usage: python tools/skew_bench.py   # prints one JSON line per cell
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_streaming_twitter_spark.operators.sampling import (  # noqa: E402
    cap_per_key,
    cap_per_key_salted,
)
from flink_streaming_twitter_spark.operators.skew import salted_join  # noqa: E402
from flink_streaming_twitter_spark.session import build_session  # noqa: E402

N = int(os.environ.get("SKEW_BENCH_N", "40000000"))
N_KEYS = 1000
HOT_FRAC = 0.30
CAP_K = 1000
N_SALTS = 16
PASSES = 2
FIX = os.environ.get("SKEW_BENCH_DIR", "/tmp/skewfix")
# a wide-ish payload makes shuffle BYTES track row counts — a hot key of
# 12 M skinny longs fits one reducer too comfortably to show anything
PAYLOAD_CHARS = 64


MANIFEST = os.path.join(FIX, "MANIFEST.json")
_PARAMS = {
    "N": N,
    "N_KEYS": N_KEYS,
    "HOT_FRAC": HOT_FRAC,
    "PAYLOAD_CHARS": PAYLOAD_CHARS,
}


def fixtures_stale() -> bool:
    """Reuse-detection keyed on the build PARAMETERS, not just isdir
    (ADVICE r3): rerunning with a different SKEW_BENCH_N — or after an
    interrupted build that never wrote the manifest — must rebuild
    instead of silently benchmarking stale/truncated fixtures while
    reporting the new N."""
    if not os.path.isdir(FIX):
        return True
    try:
        with open(MANIFEST) as f:
            return json.load(f) != _PARAMS
    except (OSError, ValueError):
        return True  # no/corrupt manifest: assume interrupted build


def build_fixtures(spark) -> None:
    # hot key = 0; a row is hot when its deterministic md5 bucket falls
    # below HOT_FRAC (same engine-portable bucket the sampling ops use)
    bucket = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 10_000
    skew_key = F.when(bucket < int(HOT_FRAC * 10_000), F.lit(0)).otherwise(
        (F.col("id") % (N_KEYS - 1)) + 1
    )
    base = spark.range(N).withColumn(
        "val", (F.col("id") * 2654435761) % 1_000_003
    ).withColumn("payload", F.repeat(F.substring(F.md5(F.col("id").cast("string")), 1, 16), PAYLOAD_CHARS // 16))
    base.withColumn("k", skew_key).write.mode("overwrite").parquet(f"{FIX}/big_skew")
    base.withColumn("k", F.col("id") % N_KEYS).write.mode("overwrite").parquet(
        f"{FIX}/big_uniform"
    )
    spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("label_"), F.col("id")).alias("label")
    ).coalesce(1).write.mode("overwrite").parquet(f"{FIX}/dim")
    # manifest LAST: its presence certifies a complete build with these
    # exact parameters
    with open(MANIFEST, "w") as f:
        json.dump(_PARAMS, f)


def timed(tag: str, thunk, spark, **extra) -> None:
    best = None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        rows = thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    print(json.dumps({"bench": tag, "sec": round(best, 2), "rows": rows, **extra}), flush=True)


def main() -> None:
    spark = build_session("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    if fixtures_stale():
        build_fixtures(spark)

    order = [F.col("val").desc(), F.col("id").asc()]
    for shape in ("skew", "uniform"):
        big = spark.read.parquet(f"{FIX}/big_{shape}")
        timed(
            f"cap_plain_{shape}",
            lambda: cap_per_key(big, ["k"], order, CAP_K).count(),
            spark,
        )
        timed(
            f"cap_salted_{shape}",
            lambda: cap_per_key_salted(
                big, ["k"], order, CAP_K, n_salts=N_SALTS, salt_from=["id"]
            ).count(),
            spark,
        )

    dim = spark.read.parquet(f"{FIX}/dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle joins
    try:
        for shape in ("skew", "uniform"):
            big = spark.read.parquet(f"{FIX}/big_{shape}")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            timed(
                f"join_plain_aqeskew_{shape}",
                lambda: big.join(dim, "k").count(),
                spark,
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            timed(
                f"join_plain_noaqe_{shape}",
                lambda: big.join(dim, "k").count(),
                spark,
            )
            timed(
                f"join_salted_noaqe_{shape}",
                lambda: salted_join(big, dim, "k", n_salts=N_SALTS, salt_from=["id"]).count(),
                spark,
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
