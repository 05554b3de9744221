"""Sessionization + multimodal metadata queries() entries + oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import payload_metadata
from ..operators.sessions import sessionize
from ..sources.files import load_table

SESSION_GAP_S = 1800


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(
        load_table(spark, sf_dir, "events"), "ts", "user_id", f"{SESSION_GAP_S} seconds"
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass with documents.text bytes standing in
    for media payloads (the container has no real media; the expression
    surface — octet_length / sha2 / size bucketing — is what's checked).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    meta = payload_metadata(docs)
    bucket = (
        F.when(F.col("byte_len") < 100, "tiny")
        .when(F.col("byte_len") < 300, "small")
        .otherwise("medium")
    )
    return meta.select("doc_id", "byte_len", F.col("sha256"), bucket.alias("size_bucket"))


MISC_QUERIES = {
    "events_sessionize": events_sessionize,
    "multimodal_meta": multimodal_meta,
}

EVENTS_SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, epoch(ts) AS e,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
              OR epoch(ts) - lag(epoch(ts)) OVER w >= {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, e,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(min(e)) AS BIGINT) AS session_start,
       CAST(floor(max(e)) AS BIGINT) AS session_last,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""

MULTIMODAL_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS sha256,
       CASE WHEN octet_length(encode(text)) < 100 THEN 'tiny'
            WHEN octet_length(encode(text)) < 300 THEN 'small'
            ELSE 'medium' END AS size_bucket
FROM documents
"""


def misc_oracles() -> dict[str, str]:
    return {
        "events_sessionize": EVENTS_SESSIONIZE_SQL,
        "multimodal_meta": MULTIMODAL_META_SQL,
    }
