"""Corpus-management queries: deterministic train/val/test splitting and
per-domain quota capping (operators/sampling.py), each with a DuckDB
oracle computing the identical md5-bucket assignment.

The reference job has no sampling surface (SURVEY.md §2.7); these are
the reproducible-subset ops a training-data pipeline runs before
anything else touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import cap_per_key, hash_split
from ..sources.files import load_table

SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
N_BUCKETS = 10_000
CAP_K = 10


def q_hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a stable split from md5(doc_id) buckets and
    aggregate the per-split profile. The assignment — not the counts —
    is the product: the same doc_id lands in the same split on any
    engine, any run, any cluster size, which is what makes held-out
    evaluation trustworthy. Narrow transform + one 3-group aggregate;
    at 100 TB the split column is computed inline at scan time (no
    shuffle, no materialization)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", SPLITS, N_BUCKETS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-quota cap: keep the CAP_K longest documents per source
    (ties broken by doc_id — a total order, so the survivor set is
    deterministic). One shuffle on source; skew note in
    operators/sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_key(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id").asc()], CAP_K
    ).select("doc_id", "source", "n_chars")


PIPELINE_QUERIES = {
    "q_hash_split_counts": q_hash_split_counts,
    "q_cap_per_source": q_cap_per_source,
}

_BUCKET = f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {N_BUCKETS})"
_TRAIN_HI = int(round(0.8 * N_BUCKETS))
_VAL_HI = int(round(0.9 * N_BUCKETS))

HASH_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT *,
         CASE WHEN {_BUCKET} < {_TRAIN_HI} THEN 'train'
              WHEN {_BUCKET} < {_VAL_HI} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, sum(n_chars) AS total_chars,
       count(DISTINCT source) AS n_sources
FROM assigned GROUP BY split
"""

CAP_PER_SOURCE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, source, n_chars FROM ranked WHERE rn <= {CAP_K}
"""


def pipeline_oracles() -> dict[str, str]:
    return {
        "q_hash_split_counts": HASH_SPLIT_SQL,
        "q_cap_per_source": CAP_PER_SOURCE_SQL,
    }
