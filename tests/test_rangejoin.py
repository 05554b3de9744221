from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_streaming_twitter_spark.operators.rangejoin import range_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _t(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    # intervals of varying length (some spanning several buckets, one
    # zero-length, one overlapping another) and probes on the exact
    # boundaries: start inclusive, end exclusive
    iv = spark.createDataFrame(
        [
            (1, _t(0), _t(60)),
            (2, _t(30), _t(90)),  # overlaps #1
            (3, _t(100), _t(100)),  # empty [t,t)
            (4, _t(50), _t(400)),  # spans many 60s buckets
        ],
        "iv_id long, s timestamp, e timestamp",
    )
    pr = spark.createDataFrame(
        [(10, _t(0)), (11, _t(59.5)), (12, _t(60)), (13, _t(100)), (14, _t(399.999))],
        "p_id long, ts timestamp",
    )
    return pr, iv


def test_matches_naive_nested_loop(spark, frames):
    pr, iv = frames
    got = {
        (r.p_id, r.iv_id)
        for r in range_join(pr, iv, "ts", "s", "e", 60).collect()
    }
    naive = {
        (r.p_id, r.iv_id)
        for r in pr.join(iv, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive
    assert (10, 1) in got and (12, 2) in got and (14, 4) in got
    assert (12, 1) not in got  # end-exclusive
    assert all(iv_id != 3 for _, iv_id in got)  # empty interval matches nothing


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    pr, iv = frames
    plan = _plan(range_join(pr, iv, "ts", "s", "e", 60))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_rejects_column_collision(spark, frames):
    pr, iv = frames
    with pytest.raises(ValueError, match="disjoint"):
        range_join(pr.withColumnRenamed("p_id", "iv_id"), iv, "ts", "s", "e", 60)
