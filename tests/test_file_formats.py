"""Format-agnostic ingestion: the same rows round-trip through parquet,
CSV, and JSON-Lines into identical DataFrames."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from flink_streaming_twitter_spark.sources.files import load_file, load_table


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )


def test_csv_and_jsonl_roundtrip_equal_parquet(spark, sample):
    d = tempfile.mkdtemp(prefix="fmt_")
    try:
        schema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
        sample.write.mode("overwrite").parquet(f"{d}/p")
        sample.write.mode("overwrite").option("header", "true").csv(f"{d}/c")
        sample.write.mode("overwrite").json(f"{d}/j")

        def rows(df):
            return {tuple(r) for r in df.collect()}

        base = rows(load_file(spark, f"{d}/p"))
        assert rows(load_file(spark, f"{d}/c", "csv", schema)) == base
        assert rows(load_file(spark, f"{d}/j", "json", schema)) == base
        assert len(base) == 200
    finally:
        shutil.rmtree(d, ignore_errors=True)
