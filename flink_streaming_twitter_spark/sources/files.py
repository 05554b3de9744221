"""Batch + streaming file sources.

The driver harness and tests read the synthetic parquet tables
(TESTDATA.md); streaming tests replay the same rows through a file-watched
directory (FIXTURES.md §3) — the test stand-in for the reference's Kafka
source (Main.java:57-61).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tables whose timestamp columns are stored as TIMESTAMP(NANOS) in parquet
_NANO_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table.

    Parquet scans get Catalyst predicate pushdown and column pruning for
    free as long as callers keep filters/selects declarative — at 100 TB
    these tables would be partitioned (events by date, lineitem by
    l_shipdate month) and the same code path would prune partitions.
    """
    # The conf is runtime-settable and must be on for any session reading
    # the testdata (the driver passes a vanilla session); harmless repeat.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns surface as int64 nanos under
    # spark.sql.legacy.parquet.nanosAsLong; project them back to proper
    # timestamps (microsecond truncation — matches every consumer, which
    # buckets at >= 1 s granularity).
    for col_name in _NANO_TS_COLUMNS.get(name, ()):  # noqa: B007
        if dict(df.dtypes).get(col_name) == "bigint":
            df = df.withColumn(
                col_name, F.timestamp_micros((F.col(col_name) / 1000).cast("long"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source replay for stream==batch equivalence tests.

    ``maxFilesPerTrigger`` throttles the replay so multiple micro-batches
    actually occur (otherwise one batch swallows everything and the
    streaming semantics go untested).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
