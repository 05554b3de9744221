"""SparkSession factory tuned for the engine.

The reference pins ``env.setParallelism(1)`` (Main.java:54); we instead let
Spark parallelize and encode the scale knobs here so every entry point
(tests, bench, driver harness) runs with the same, 100 TB-minded defaults:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- shuffle partitions sized for the local harness but overridable via env —
  on a 1000-executor cluster this would be set to ~2-4x total cores;
- UTC session timezone so window arithmetic and the DuckDB oracle agree;
- Arrow enabled for the (rare) pandas-UDF paths;
- broadcast threshold left at default 10 MB — dimension tables (region,
  nation, customer at test SF) broadcast automatically; plans additionally
  mark known-small sides with an explicit ``broadcast()`` hint so the plan
  survives stale/absent stats at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "flink-streaming-twitter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_CPUS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # streaming: state compaction-friendly defaults; harmless in batch
        .config("spark.sql.streaming.stateStore.compression.codec", "lz4")
        # local mode runs driver + all 32 task threads + block manager in
        # ONE JVM: 8g was enough for any single query but not for the
        # bench's 72-query sequence (cache blocks + shuffle buffers from
        # 32 concurrent tasks), where GC pressure caused 3x timing swings.
        # 24g mirrors a real cluster's per-executor sizing (~0.75g/core).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # testdata parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as int64 nanos, converted in sources/files.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    """Reuse an externally provided session (the driver passes one) but make
    sure the confs the engine's correctness depends on are applied."""
    if spark is None:
        return build_session()
    # Session timezone must be UTC for window-epoch arithmetic to match the
    # oracle; these are runtime-settable confs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
