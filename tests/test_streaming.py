"""Stream==batch equivalence (FIXTURES.md §3) and sink formatting.

The core Structured Streaming correctness property: replaying the same
rows through readStream + the same logical ops must converge to the batch
answer once the source is drained.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_streaming_twitter_spark.streaming.runner import StreamingPipelines, start_query
from flink_streaming_twitter_spark.streaming.sinks import influx_line, to_influx_points

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def replay_dir(spark):
    d = tempfile.mkdtemp(prefix="replay_")
    rows = [
        (BASE + dt.timedelta(seconds=s), k)
        for s, k in [(0, "a"), (1, "a"), (2, "b"), (6, "a"), (7, "b"), (8, "b"), (11, "a")]
    ]
    # two part files → at least two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(rows[:4], SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(rows[4:], SCHEMA).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_windowed_counts_equal_batch(spark, replay_dir):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(replay_dir)
    pipe = StreamingPipelines(stream, "ts", "event_type")
    q = start_query(
        pipe.windowed_counts("10 seconds", "5 seconds"),
        name="wc_stream",
        output_mode="complete",
        available_now=True,
    )
    q.awaitTermination(120)

    batch = spark.read.schema(SCHEMA).parquet(replay_dir)
    expected = {
        (r.w_start, r.event_type): r.cnt
        for r in (
            batch.groupBy(F.window("ts", "10 seconds", "5 seconds").alias("window"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("window.start").cast("long").alias("w_start"), "event_type", "cnt")
            .collect()
        )
    }
    got = {
        (r.w_start, r.event_type): r.cnt
        for r in spark.sql("SELECT * FROM wc_stream").collect()
    }
    assert got == expected and len(got) > 0


def test_stream_running_total_converges(spark, replay_dir):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(replay_dir)
    pipe = StreamingPipelines(stream, "ts", "event_type")
    q = start_query(
        pipe.running_total(), name="rt_stream", output_mode="complete", available_now=True
    )
    q.awaitTermination(120)
    [row] = spark.sql("SELECT * FROM rt_stream").collect()
    assert row.total == 7


def test_stream_dedup_within_watermark(spark, replay_dir):
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(replay_dir)
    pipe = StreamingPipelines(stream, "ts", "event_type")
    q = start_query(
        pipe.dedup_within_watermark(["event_type"]),
        name="dd_stream",
        output_mode="append",
        available_now=True,
    )
    q.awaitTermination(120)
    kinds = [r.event_type for r in spark.sql("SELECT * FROM dd_stream").collect()]
    assert sorted(kinds) == ["a", "b"]


def test_influx_point_shaping_and_line_protocol(spark):
    df = spark.createDataFrame(
        [(BASE, "a", 5)], ["window_end", "hashtag", "cnt"]
    )
    pts = to_influx_points(
        df, "TrendingHashTagFlink1", "window_end", {"hashtag": "hashtag"}, {"count": "cnt"}
    )
    [p] = pts.collect()
    assert p.measurement == "TrendingHashTagFlink1"
    assert p.tags == {"hashtag": "a"} and p.fields == {"count": "5"}
    line = influx_line(p.measurement, p.tags, p.fields, 1704067200_000_000_000)
    assert line == 'TrendingHashTagFlink1,hashtag=a count="5" 1704067200000000000'


def test_influx_line_escapes_specials():
    line = influx_line("m x", {"t a": "v,1"}, {"f": 2}, 1)
    assert line == r"m\ x,t\ a=v\,1 f=2 1"
