"""Bucketed (co-located) joins — the shuffle-elimination path for
repeated fact-fact joins at 100 TB.

SCALE.md prescribes bucketing `orders`/`lineitem` on orderkey at ingest so
the q3/q4/q10-style joins never exchange either fact table. This module
makes that concrete: `write_bucketed` persists a DataFrame as a bucketed
managed table, and a plan over two tables bucketed on the join key
sort-merge-joins with ZERO Exchange nodes (asserted in
tests/test_bucketing.py).

Bucket-count choice at scale: buckets ≈ (table bytes / 256 MB), fixed
across both tables so bucket i co-locates; Spark requires equal bucket
counts for exchange-free joins. Bucketed writes also pre-sort within
buckets, removing the join's Sort nodes on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table.
    Overwrites any existing table of the same name."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two tables previously written with the SAME bucket spec on the
    join key: Catalyst sees both sides' HashPartitioning matches the join
    requirement and plans a SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
