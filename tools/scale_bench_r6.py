"""Round-6 probe: MEASURE the ×100 recall denominator at the deploy
threshold (t = 0.5) — the number SCALE.md's 99.85% recall figure for
``dedup_lsh_exact`` divides by.

Round 5 pinned that denominator by construction (100 × the sf0.1 exact
count; cross-replica pairs argued away by the salt scheme). Round-5
advice: measure it. The naive measurement — one global exact PPJoin at
t=0.5 over 500 k docs — is the documented-unscalable configuration and
was tried first: it DIED disk-bound after ~20 min (>62 GB of shuffle
spill from ~100× the sf0.1 pre-distinct candidate volume feeding one
global distinct; SparkOutOfMemoryError SPILL_OUT_OF_MEMORY, "No space
left on device"). That failure is itself the measured verdict on the
exact form at two decades.

The denominator is still measurable EXACTLY, by decomposing the join
along a partition the data provably admits:

1. **Measured shingle (near-)disjointness.** make_scale10's replica
   scheme appends a per-replica salt token after every non-overlapping
   word pair, so every 3-word shingle STRING of salted replica k
   contains the token ``zk`` — replica shingle-string sets are pairwise
   disjoint (replica 0 is the unsalted original). The operator, however,
   joins on 31-BIT md5 shingle hashes (md5_int31, sized for DuckDB
   oracle parity), and at ×100 the ~3×10^5 distinct shingle strings
   birthday-collide in 2^31 space (~E[m²/2^32] ≈ 20 colliding hash
   values) — the first run of this probe found exactly that: a handful
   of hashes occurring in 2 replicas each, which the original
   hard-disjointness assertion refused. Measured, not assumed, ever
   since.
2. **Exact cross-replica contribution from the collisions alone.** A
   cross-replica doc pair can only share hashes that occur in ≥2
   replicas (a hash in one replica cannot be in both docs), so joining
   docs through JUST the colliding hashes enumerates every
   cross-replica pair with ANY overlap and yields its EXACT hash-set
   Jaccard c/(sz_a+sz_b−c). The probe computes the max and the count at
   J ≥ t — expected 0 pairs (sharing one 31-bit collision gives
   J ≈ 1/(sz_a+sz_b−1) ≪ 0.5) — closing the decomposition exactly
   instead of by argument.
3. **Blocked exact join.** Given (2), the global exact pair count is the
   SUM of per-block exact counts plus the (measured-zero) cross-replica
   pairs, for any replica-aligned blocking. Blocks of 10 replicas ≈ the
   measured 10× cell (~15 s, spill bounded at ~1/10 of the global run)
   — 10 sequential jobs instead of one disk-breaking job. Per-block
   document frequencies differ from global ones, but df only orders the
   prefix heuristic; prefix filtering is lossless under ANY consistent
   global order, so the counts are exact.

Operator-level takeaway (documented in operators/dedup.py): 31-bit
shingle hashes are an oracle-parity choice. At real corpus scale the
distinct-shingle count crosses the 2^31 birthday regime and spurious
intersections inflate Jaccard by ~sz_a·sz_b/2^31 per pair — switch the
shingle hash to md5_int60 there.

This is the same discipline the operator docstring prescribes for
100 TB: when an exact join must run at all, run it inside provable
blocks (here: verified-disjoint shingle partitions), never globally.

Usage: python tools/scale_bench_r6.py   # JSON lines
Requires /tmp/sf10 (tools/scale_bench_r5.py builds it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

DST = "/tmp/sf10"
SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000
REPLICAS = 100
BLOCK = 10  # replicas per exact-join block


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    marker = os.path.join(DST, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        raise SystemExit(f"missing {marker}; run tools/scale_bench_r5.py first")

    spark = build_session("scale-bench-r6", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # sf0.1 anchor (cheap): the construction argument predicts the ×100
    # count is exactly 100× this.
    base = D.ngram_jaccard_pairs(
        load_table(spark, SRC, "documents"),
        threshold=P.JACCARD_THRESHOLD,
        shingle_k=P.SHINGLE_K,
    ).count()
    print(json.dumps({"bench": "exact_jaccard_t0.5", "sf0.1_rows": base}), flush=True)

    docs100 = load_table(spark, DST, "documents")

    # (1) measure hash-level disjointness: which shingle HASHES occur in
    # more than one replica (expected: ~20 two-replica birthday
    # collisions of md5_int31 over ~3e5 distinct shingle strings)
    t0 = time.perf_counter()
    occ = (
        D.doc_shingle_sets(docs100, k=P.SHINGLE_K)
        .select(
            (F.col("doc_id") / F.lit(OFFSET)).cast("long").alias("replica"),
            "doc_id",
            "sz",
            F.explode("shs").alias("sh"),
        )
        .persist()
    )
    multi = (
        occ.groupBy("sh")
        .agg(F.countDistinct("replica").alias("n_replicas"))
        .filter(F.col("n_replicas") > 1)
    )
    multi_rows = multi.collect()
    print(
        json.dumps(
            {
                "bench": "shingle_disjointness",
                "colliding_hashes": len(multi_rows),
                "max_replicas_per_hash": max((r.n_replicas for r in multi_rows), default=1),
                "seconds": round(time.perf_counter() - t0, 1),
            }
        ),
        flush=True,
    )

    # (2) EXACT cross-replica contribution: every cross-replica pair
    # with any shared hash shares only colliding hashes, so the join
    # over the (tiny) colliding subset enumerates them all with exact
    # hash-set Jaccard.
    t0 = time.perf_counter()
    bad = [r.sh for r in multi_rows]
    cross = {"pairs_with_overlap": 0, "max_jaccard": 0.0, "pairs_ge_t": 0}
    if bad:
        sub = occ.filter(F.col("sh").isin(bad))
        a = sub.select(
            "sh",
            F.col("replica").alias("ra"),
            F.col("doc_id").alias("doc_a"),
            F.col("sz").alias("sz_a"),
        )
        b = sub.select(
            "sh",
            F.col("replica").alias("rb"),
            F.col("doc_id").alias("doc_b"),
            F.col("sz").alias("sz_b"),
        )
        pairs = (
            a.join(b, "sh")
            .filter(F.col("ra") < F.col("rb"))
            .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                (F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c"))).alias("jac")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("jac").alias("mx"),
                F.sum(
                    F.when(F.col("jac") >= F.lit(P.JACCARD_THRESHOLD), 1).otherwise(0)
                ).alias("ge_t"),
            )
            .collect()[0]
        )
        cross = {
            "pairs_with_overlap": pairs.n,
            "max_jaccard": round(float(pairs.mx or 0.0), 6),
            "pairs_ge_t": int(pairs.ge_t or 0),
        }
    print(
        json.dumps(
            {
                "bench": "cross_replica_exact",
                **cross,
                "seconds": round(time.perf_counter() - t0, 1),
            }
        ),
        flush=True,
    )
    occ.unpersist()

    # (3) blocked exact join: global count == sum of per-block counts
    # plus the measured cross-replica pairs_ge_t
    total, block_counts = 0, []
    t0 = time.perf_counter()
    for g in range(REPLICAS // BLOCK):
        lo, hi = g * BLOCK * OFFSET, (g + 1) * BLOCK * OFFSET
        c = D.ngram_jaccard_pairs(
            docs100.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            threshold=P.JACCARD_THRESHOLD,
            shingle_k=P.SHINGLE_K,
        ).count()
        block_counts.append(c)
        total += c
        print(json.dumps({"block": g, "rows": c}), flush=True)
    total += cross["pairs_ge_t"]
    print(
        json.dumps(
            {
                "bench": "exact_jaccard_t0.5",
                "x100_rows": total,
                "x100_seconds_blocked": round(time.perf_counter() - t0, 1),
                "blocks": block_counts,
                "cross_replica_pairs": cross["pairs_ge_t"],
                "construction_denominator": base * 100,
                "matches_construction": total == base * 100,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
