"""JSON ingestion parity with the reference parser (MapToTweet,
Main.java:202-219; Jackson ignore-unknown per Tweet.java:10)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_streaming_twitter_spark.functions.text import hashtags
from flink_streaming_twitter_spark.sources.kafka import parse_tweets

GOOD = json.dumps(
    {
        "text": "hello #Spark world #flink2",
        "createdAt": 1570508135121,
        "lang": "en",
        "unknown_field": {"deeply": ["nested", 1]},
    }
)
NO_TS = json.dumps({"text": "no timestamp here"})
MALFORMED = '{"text": "broken'


def test_parse_projects_three_fields_and_drops_bad_rows(spark):
    raw = spark.createDataFrame([(GOOD,), (NO_TS,), (MALFORMED,)], ["raw_json"])
    out = parse_tweets(raw).collect()
    # malformed JSON → null element dropped (Main.java:209-218 behavior);
    # missing event time → unusable downstream, dropped likewise
    assert len(out) == 1
    row = out[0]
    assert row.text == "hello #Spark world #flink2"
    assert row.lang == "en"
    assert row.ts.isoformat().startswith("2019-10-08")  # epoch ms 1570508135121


def test_hashtag_extraction_matches_reference_pattern(spark):
    # Pattern #\w+ per Main.java:189: stops at punctuation, keeps digits/_
    df = spark.createDataFrame(
        [("a #Tag1 then #foo_bar, #x-y and # none #UPPER",)], ["text"]
    )
    [r] = df.select(hashtags(F.col("text")).alias("h")).collect()
    assert r.h == ["#Tag1", "#foo_bar", "#x", "#UPPER"]


def test_no_hashtags_yields_empty_array_not_null(spark):
    df = spark.createDataFrame([("plain text",)], ["text"])
    [r] = df.select(hashtags(F.col("text")).alias("h")).collect()
    assert r.h == []


def test_kafka_wiring_options_match_reference_consumer_config(spark):
    """The Kafka source options, pinned as data (no broker/connector jar
    exists here, so load() can never run): bootstrap list passes through
    verbatim (Main.java:57-59's 3-broker list), the subscription is the
    reference topic (Main.java:61), and offsets default to latest — the
    live-firehose behavior of a consumer group with no committed
    offsets. Also pins that kafka_tweet_stream reaches DataSource
    resolution with format 'kafka': in this container that resolution
    must fail with the missing-kafka-source error, not a misconfig."""
    import pytest

    from flink_streaming_twitter_spark.sources.kafka import (
        DEFAULT_TOPIC,
        kafka_options,
        kafka_tweet_stream,
    )

    brokers = "10.0.0.1:9092,10.0.0.2:9092,10.0.0.3:9092"
    opts = kafka_options(brokers)
    assert opts == {
        "kafka.bootstrap.servers": brokers,
        "subscribe": DEFAULT_TOPIC,
        "startingOffsets": "latest",
    }
    assert kafka_options(brokers, topic="t2", starting_offsets="earliest")[
        "startingOffsets"
    ] == "earliest"

    # Sandbox-only half: with no spark-sql-kafka connector jar, the
    # stream must fail AT DataSource resolution (proving the wiring gets
    # that far), with the missing-kafka-source error rather than a
    # misconfig. In the documented production setup (spark-submit
    # --packages spark-sql-kafka) readStream.load() succeeds lazily, so
    # guard on the connector actually being absent (ADVICE r7) — the
    # pure kafka_options assertions above run unconditionally.
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        kafka_present = True
    except Exception:
        kafka_present = False
    if kafka_present:
        pytest.skip("kafka connector jar present: resolution succeeds lazily")
    with pytest.raises(Exception) as ei:
        kafka_tweet_stream(spark, brokers)
    assert "kafka" in str(ei.value).lower()
