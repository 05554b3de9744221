"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_twitter_spark.plans import extensions, oracles, reference_queries
from flink_streaming_twitter_spark.session import get_or_create

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q-B trending (sliding-window top-1 group) on
    sf0.001 — the reference's marquee 'trending hashtag' analytics
    (Main.java:104-146) in its Spark-first form."""
    get_or_create(spark)
    return reference_queries.qb_trending_single(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "qa_trending_two_stage": reference_queries.qa_trending_two_stage,
        "qb_trending_single": reference_queries.qb_trending_single,
        "qc_running_total": reference_queries.qc_running_total,
        "qd_counts_per_window": reference_queries.qd_counts_per_window,
        "q_json_extract": reference_queries.q_json_extract,
        "q_value_by_window": reference_queries.q_value_by_window,
        "q_tokenize_topk": reference_queries.q_tokenize_topk,
        "stream_qb_counts": reference_queries.stream_qb_counts,
        "stream_dedup_keys": reference_queries.stream_dedup_keys,
        "stream_qa_trending": reference_queries.stream_qa_trending,
        "stream_interval_pairs": reference_queries.stream_interval_pairs,
        "stream_session_counts": reference_queries.stream_session_counts,
    }
    q.update(extensions.extension_queries())
    return q


def oracle_sql() -> dict[str, str]:
    o = oracles.reference_oracles()
    o.update(extensions.extension_oracles())
    return o
