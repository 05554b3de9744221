"""Schemas for the reference's record types (SURVEY.md §1.1) and the
driver's synthetic tables (FIXTURES.md §2).

The reference's input record is ``Tweet{text, timestamp_ms, lang}``
(Tweet.java:14-21); the JSON property carrying event time is ``createdAt``
(epoch milliseconds — Tweet.java:17-18, used as epoch ms at Main.java:71).
Parsing is loss-tolerant: unknown properties ignored (Tweet.java:10),
malformed JSON → null record (Main.java:209-218). ``from_json`` in its
default PERMISSIVE mode reproduces both behaviors.

Citation note (ADVICE r9): the reference has no literal ``Main.java`` —
per SURVEY.md §1, ``Main.java`` throughout this repo abbreviates its
main class file, ``PrcoessTweetFromKafkaAndWriteToInfluxDatabase.java``
(the filename's typo is the reference's own).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input stream record (Tweet.java:14-21). JSON property for event time is
# `createdAt` even though the POJO field is `timestamp_ms`.
TWEET_JSON_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("createdAt", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)

# Parsed stream element the four pipelines consume (post MapToTweet,
# Main.java:202-219, plus the event-time projection of Main.java:66-73).
TWEET_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
    ]
)

# Intermediate per-hashtag windowed aggregate (Main.java:81: Tuple3<String,
# Long, Timestamp>).
HASHTAG_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("hashtag", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("window_end", T.TimestampType()),
    ]
)

# Sink record (InfluxDBPoint.java:24-27). The reference's fields map is
# Map<String,Object> but only ever holds String/Long (Main.java:230-231,
# 259, 274); tags are always strings in line protocol so they ship as a
# string map, while fields keep their NATIVE column types in a struct —
# influxdb-java renders the reference's Long as `count=5i`, and InfluxDB
# types a field on first write, so stringifying counts would break the
# dashboards. The fields struct is per-measurement; this constant pins
# the shape of OUR four measurements: one BIGINT `count`. That is a
# documented remap, not the reference's exact field set — its two
# trending mappers also put the hashtag STRING in the fields map with
# an empty tags map (Main.java:228-229/242-243); we ship hashtag as a
# TAG instead (indexed, and the series key a dashboard groups by),
# keeping `count` as the sole field across all four measurements.
INFLUX_POINT_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "fields", T.StructType([T.StructField("count", T.LongType())])
        ),
    ]
)

# Driver synthetic tables (TESTDATA.md). Parquet carries the authoritative
# schema; these names are for programmatic access.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
