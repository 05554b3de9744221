"""Interleaved A/B: persist the exploded ``ex`` frame in
ngram_jaccard_pairs (VERDICT r14 item 4).

The PPJoin pipeline explodes the persisted shingle sets TWICE — once
for the document-frequency aggregate, once for the prefix arm (the
after-plan's Generate=2). Round 14 measured an ``ex`` persist at the
sf0.1 noise floor twice; this tool re-measures at a scale where the
explode matters (default /tmp/sf1, the x10 corpus from
tools/make_scale10.py) so the ship/no-ship decision rests on a number
from the regime the optimization targets.

The variant duplicates ngram_jaccard_pairs' body with the one-line
persist — an archival measurement harness (like tools/ab_simhash_rowwise),
not product code; outputs are fingerprint-asserted identical.

Usage: python tools/ab_ngram_ex_persist.py [passes=4] [sf_dir=/tmp/sf1] [bits=31]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def ngram_jaccard_pairs_ex_persisted(
    docs, threshold, shingle_k, hash_bits, persist_prefix=True
):
    """ngram_jaccard_pairs with the exploded (doc_id, sz, sh) frame
    persisted so the dfreq aggregate and the prefix arm read one
    materialization instead of exploding the cached sets twice.
    ``persist_prefix=False`` additionally drops the r14 prefix persist
    (the x10 dissection variant: ex cached, prefix recomputed per join
    side from the cache)."""
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators.dedup import doc_shingle_sets

    sets = doc_shingle_sets(docs, k=shingle_k, hash_bits=hash_bits).persist()
    ex = sets.select("doc_id", "sz", F.explode("shs").alias("sh")).persist()
    dfreq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))

    from pyspark.sql import Window

    order = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("sh").asc())
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = (
        ex.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(order))
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "sh", "sz")
    )
    if persist_prefix:
        prefix = prefix.persist()
    a, b = prefix.alias("a"), prefix.alias("b")
    length_ok = F.least(F.col("a.sz"), F.col("b.sz")) >= F.lit(threshold) * F.greatest(
        F.col("a.sz"), F.col("b.sz")
    )
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & length_ok,
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    seta = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("sz").alias("sz_a")
    )
    setb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        cands.join(seta, "doc_a")
        .join(setb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators.dedup import ngram_jaccard_pairs
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 31

    spark = build_session("ab-ngram-ex", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def fp(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("doc_a", "doc_b", F.round("jaccard", 9)).cast("decimal(38,0)")),
                F.lit(0),
            ).alias("h"),
        ).first()
        return int(row.n), int(row.h)

    variants = [
        (
            "base",
            lambda: ngram_jaccard_pairs(
                docs, threshold=P.JACCARD_THRESHOLD, shingle_k=P.SHINGLE_K, hash_bits=bits
            ),
        ),
        (
            "ex_persist",
            lambda: ngram_jaccard_pairs_ex_persisted(
                docs, P.JACCARD_THRESHOLD, P.SHINGLE_K, bits
            ),
        ),
        (
            "ex_only",
            lambda: ngram_jaccard_pairs_ex_persisted(
                docs, P.JACCARD_THRESHOLD, P.SHINGLE_K, bits, persist_prefix=False
            ),
        ),
    ]
    res = {v: [] for v, _ in variants}
    fps = {}
    for p in range(n_passes):
        for vname, make in variants:
            spark.sparkContext.setJobDescription(f"ab_ngram_ex {vname} pass{p}")
            t0 = time.perf_counter()
            f = fp(make())
            res[vname].append(round(time.perf_counter() - t0, 3))
            prev = fps.setdefault(vname, f)
            assert prev == f, f"{vname} drifted: {prev} vs {f}"
            spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    assert fps["base"] == fps["ex_persist"] == fps["ex_only"], f"outputs differ: {fps}"
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "bits": bits,
                "passes": n_passes,
                "rows_hash": fps["base"],
                "timings": res,
                "min": {v: min(ts) for v, ts in res.items()},
                "load_15m": round(os.getloadavg()[2], 2),
            },
            indent=2,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
