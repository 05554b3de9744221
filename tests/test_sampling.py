"""Deterministic sampling / split / quota operators
(operators/sampling.py): golden-value portability of the md5 bucket,
split totality+stability, cap determinism under ties."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_streaming_twitter_spark.operators.sampling import (
    cap_per_key,
    cap_per_key_salted,
    hash_bucket,
    hash_sample,
    hash_split,
    weighted_mix,
)


def _py_bucket(key: str, n: int = 10_000) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def test_hash_bucket_matches_python_golden(spark):
    """The engine-portability contract: Spark's bucket equals the
    reference computation (same values DuckDB produces — the oracle
    SQL in plans/pipeline.py uses the identical expression)."""
    keys = ["1", "42", "9999", "hello", ""]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r.k: r.b for r in df.select("k", hash_bucket("k").alias("b")).collect()}
    assert got == {k: _py_bucket(k) for k in keys}


def test_null_key_hashes_as_empty_string_and_is_never_dropped(spark):
    """NULL-key contract (operators/sampling.py::hash_bucket): a missing
    key buckets exactly like the empty string, so admission filters
    never NULL-drop — before the fix, md5(NULL)=NULL made hash_sample
    at fraction 1.0 and weighted_mix at a 100% domain silently discard
    every NULL-keyed row, while hash_split shunted them all to the last
    label through the rounding-remainder branch."""
    df = spark.createDataFrame(
        [(1, "a", "curated"), (2, None, "curated"), (3, "", "crawl")],
        ["id", "k", "dom"],
    )
    buckets = {r.id: r.b for r in df.select("id", hash_bucket("k").alias("b")).collect()}
    assert buckets[2] == buckets[3] == _py_bucket("")  # NULL ≡ '' ≡ the twin
    # fraction-1.0 sample keeps everything, NULL key included
    assert hash_sample(df, "k", 1.0).count() == 3
    # a 100%-admitted domain keeps its NULL-keyed rows
    assert weighted_mix(df, "dom", "k", {"curated": 1.0}, 1.0).count() == 3
    # split stays total and NULL gets the same label as '' (same bucket)
    labels = {r.id: r.split for r in hash_split(df, "k", [("train", 0.8), ("test", 0.2)]).collect()}
    assert len(labels) == 3 and labels[2] == labels[3]


def test_hash_split_total_disjoint_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["id"])
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = hash_split(df, "id", splits).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    # total: every row got exactly one label
    assert sum(counts.values()) == 500
    # roughly proportional (md5 is uniform; 500 rows → loose bounds)
    assert counts["train"] > 350 and counts["val"] > 10 and counts["test"] > 10
    # stability: the label of a given key is a pure function of the key
    one = hash_split(df.filter(F.col("id") == 7), "id", splits).collect()[0].split
    again = hash_split(df, "id", splits).filter(F.col("id") == 7).collect()[0].split
    assert one in counts and one == again


def test_hash_sample_is_subset_and_fraction(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    s10 = hash_sample(df, "id", 0.10)
    s50 = hash_sample(df, "id", 0.50)
    n10, n50 = s10.count(), s50.count()
    assert 50 < n10 < 200 and 400 < n50 < 600
    # nesting: a smaller fraction is a strict subset of a larger one
    # (bucket < t1 implies bucket < t2 for t1 < t2)
    assert s10.exceptAll(s50).count() == 0


def test_hash_sample_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_hash_split_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        hash_split(df, "id", [("a", 0.5), ("b", 0.2)])
    with pytest.raises(ValueError):
        hash_split(df, "id", [("a", 0.5), ("a", 0.5)])


def test_cap_per_key_deterministic_under_ties(spark):
    rows = [("s1", i, 100) for i in range(10)] + [("s2", 50, 7)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = cap_per_key(
        df, ["source"], [F.col("n_chars").desc(), F.col("doc_id").asc()], 3
    )
    got = sorted((r.source, r.doc_id) for r in out.collect())
    # all n_chars tie in s1 → doc_id ascending decides, deterministically
    assert got == [("s1", 0), ("s1", 1), ("s1", 2), ("s2", 50)]


def test_cap_per_key_salted_identical_survivors_on_skew(spark):
    """The two-phase salted top-k must return EXACTLY the plain window's
    survivor set on a skewed fixture (one hot key with 94% of the rows,
    ties included), for k both below and above a salt bucket's share."""
    rows = (
        [("hot", i, 1000 - (i % 7)) for i in range(470)]  # ties every 7
        + [("cold", i, 50 + i) for i in range(20)]
        + [("single", 0, 1)]
    )
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    for k in (3, 40):
        plain = sorted(
            (r.source, r.doc_id)
            for r in cap_per_key(df, ["source"], order, k).collect()
        )
        salted = sorted(
            (r.source, r.doc_id)
            for r in cap_per_key_salted(df, ["source"], order, k, n_salts=8).collect()
        )
        assert salted == plain, f"k={k}"


def test_cap_per_key_salted_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 1)], ["source", "doc_id"])
    with pytest.raises(ValueError):
        cap_per_key_salted(df, ["source"], ["doc_id"], 0)
    with pytest.raises(ValueError):
        cap_per_key_salted(df, ["source"], ["doc_id"], 1, n_salts=1)


def test_weighted_mix_respects_domain_fractions(spark):
    rows = [(f"d{i}", "keep" if i % 2 else "drop") for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "dom"])
    out = weighted_mix(df, "dom", "id", {"keep": 1.0, "drop": 0.0})
    got = {r.dom for r in out.select("dom").distinct().collect()}
    assert got == {"keep"}
    assert out.count() == 200
    # default fraction applies to unlisted domains
    half = weighted_mix(df, "dom", "id", {}, default_fraction=0.5).count()
    assert 120 < half < 280


def test_weighted_mix_is_subset_of_hash_sample(spark):
    """The mix admits exactly the rows hash_sample admits at that
    domain's fraction — one shared bucket function, no second hash."""
    df = spark.createDataFrame([(f"k{i}", "a") for i in range(300)], ["id", "dom"])
    mix = weighted_mix(df, "dom", "id", {"a": 0.3})
    samp = hash_sample(df, "id", 0.3)
    assert mix.exceptAll(samp).count() == 0 and samp.exceptAll(mix).count() == 0


def test_weighted_mix_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "dom"])
    with pytest.raises(ValueError):
        weighted_mix(df, "dom", "id", {"a": 2.0})
