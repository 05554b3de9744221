"""Round-3 10x scale-up rerun (VERDICT r2 item 2): time the dedup / ANN /
connected-components families at sf0.1 and at the 10x replica
(/tmp/sf1, built by tools/make_scale10.py), recording wall seconds AND
output rows (candidate counts) so the growth law — not just the wall
clock — is on record. Also measures star-CC vs plain-propagation round
counts on the 10x dup graph.

Usage: python tools/make_scale10.py && python tools/scale_bench_r3.py
Prints one JSON line per (query, sf_dir) plus a CC-rounds record; the
summary table lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_embedding_cosine",
    "similarity_brute_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
]

PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = build_session("scale-bench-r3")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
        if not os.path.isdir(sf_dir) and not os.path.exists(sf_dir):
            print(json.dumps({"skip": sf_dir, "reason": "missing"}))
            continue
        for name in QUERIES:
            best, rows = None, None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            print(
                json.dumps(
                    {"query": name, "sf_dir": sf_dir, "sec": round(best, 2), "rows": rows}
                ),
                flush=True,
            )

        # CC round counts on this scale's dup graph: same edge evidence,
        # plain propagation vs large-star/small-star
        from pyspark.sql import functions as F

        from flink_streaming_twitter_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )
        from flink_streaming_twitter_spark.plans.dedup import _dup_evidence
        from flink_streaming_twitter_spark.sources.files import load_table

        docs = load_table(spark, sf_dir, "documents")
        edges = _dup_evidence(docs).persist()
        nodes = docs.select(F.col("doc_id").alias("id"))
        rec = {"sf_dir": sf_dir, "n_edges": edges.count()}
        for label, fn in (("plain", connected_components), ("star", connected_components_star)):
            stats: dict = {}
            t0 = time.perf_counter()
            n = fn(edges, nodes=nodes, stats=stats).count()
            rec[label] = {
                "rounds": stats.get("rounds", 0),
                "sec": round(time.perf_counter() - t0, 2),
                "labeled": n,
            }
        edges.unpersist()
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
