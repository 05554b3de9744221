"""dedup_clusters_char_union semantics (round 13): the two-tier
evidence union must merge exactly what the added char tier can see and
never split what the word-tier entry already joined."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_twitter_spark.plans.dedup import dedup_clusters
from flink_streaming_twitter_spark.plans.dedup_union import dedup_clusters_char_union
from flink_streaming_twitter_spark.sources.files import load_table


def _aug_corpus(spark, sf_dir: str, tmp_path) -> str:
    """The gate corpus plus a planted CJK near-dup pair — zero word-tier
    evidence (the ASCII \\w tokenizer matches nothing), J_char = 0.9 —
    the exact regime the union variant exists for."""
    docs = load_table(spark, sf_dir, "documents")
    template = docs.limit(1)
    planted = template.select(
        F.lit(20_000_000).alias("doc_id"),
        F.lit("日本語のテキスト 中文文本").alias("text"),
        *[F.col(c) for c in docs.columns if c not in ("doc_id", "text")],
    ).unionByName(
        template.select(
            F.lit(20_000_001).alias("doc_id"),
            F.lit("日本語のテキスト 中文文本也").alias("text"),
            *[F.col(c) for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    aug_dir = str(tmp_path / "aug")
    docs.unionByName(planted.select(docs.columns)).coalesce(1).write.parquet(
        f"{aug_dir}/documents.parquet"
    )
    return aug_dir


def test_union_merges_cjk_pair_word_tier_cannot_see(spark, sf_dir, tmp_path):
    aug_dir = _aug_corpus(spark, sf_dir, tmp_path)

    base = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, aug_dir).collect()}
    union = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_char_union(spark, aug_dir).collect()
    }

    # same node universe (both seed from DISTINCT doc_id)
    assert set(base) == set(union)
    # the word-tier entry has no evidence for the CJK pair...
    assert base[20_000_000] != base[20_000_001]
    # ...the union entry pairs them through the char tier
    assert union[20_000_000] == union[20_000_001] == 20_000_000


def test_union_partition_is_a_coarsening_of_word_tier_clusters(spark, sf_dir, tmp_path):
    """Adding an evidence tier can only MERGE components, never split:
    every dedup_clusters cluster must map wholly into one union cluster
    (edges are a superset, closure is monotone), and every union keep
    decision stays the min doc_id of its merged group."""
    aug_dir = _aug_corpus(spark, sf_dir, tmp_path)

    base = dedup_clusters(spark, aug_dir).collect()
    union_rows = dedup_clusters_char_union(spark, aug_dir).collect()
    union = {r.doc_id: r.cluster_id for r in union_rows}

    base_to_union: dict[int, int] = {}
    for r in base:
        mapped = base_to_union.setdefault(r.cluster_id, union[r.doc_id])
        assert mapped == union[r.doc_id], (
            f"base cluster {r.cluster_id} split across union clusters"
        )

    # keep decision: min doc_id per union cluster, flagged exactly once
    members: dict[int, list[int]] = {}
    kept: dict[int, int] = {}
    for r in union_rows:
        members.setdefault(r.cluster_id, []).append(r.doc_id)
        if r.is_kept:
            assert r.cluster_id not in kept
            kept[r.cluster_id] = r.doc_id
    for cid, ids in members.items():
        assert kept[cid] == min(ids) == cid
