"""A/B: dedup_clusters' per-tier evidence lineage vs a shared-shingle
lineage (VERDICT r11 item 3).

Question under test: the evidence chain behind ``dedup_clusters``
(plans/dedup.py::_dup_evidence — exact-dup star edges + MinHash-LSH
near-dup pairs, then connected components) acquires one
``one_row_per_key`` aggregate per shingle tier it unions (round 11's
duplicate-key contract). Does that per-tier resolution COMPOUND into
measurable wall cost, and would a lineage that computes
``doc_shingle_sets`` once — persisted, shared by the signature pipeline
and any future shingle tier — win?

Variant A is the shipped entry, verbatim. Variant B rebuilds the same
logical result with the shingle sets materialized ONCE up front
(persisted (doc_id, shs, sz) — ~200 B/doc) and the signature pipeline
fed from that table, so a second shingle consumer would start from the
persisted sets instead of re-running resolve+tokenize+hash. Both
variants run in the SAME fresh session, alternating A/B/A/B per pass so
JIT warmup and page-cache state cannot systematically favor either
side; result equality (cluster-count + per-row label hash) is asserted
on the first pass so the timing compares equal answers.

Round 13 extends the harness with the scenario the round-12 verdict
predicted would flip the answer: ``mode=union`` A/Bs the TWO-tier
entry (plans/dedup_union.py::dedup_clusters_char_union — exact + word
+ char evidence), where the shipped per-tier lineage resolves
duplicate keys and scans the text twice (once per shingle tier), vs a
shared lineage that materializes ``one_row_per_key`` ONCE (persisted
(doc_id, text)) and feeds both tiers' shingle pipelines from it. Same
alternating-order, same pass-0 result-equality assertion.

Usage: python tools/ab_shared_lineage.py [sf_dir] [passes=3] [mode=base]
  mode: base  — dedup_clusters vs shared-shingle-set lineage (round 12)
        union — dedup_clusters_char_union vs shared-resolution lineage
Prints one JSON line:
  {"mode":..., "sf_dir":..., "passes_a":[...], "passes_b":[...],
   "min_a":.., "min_b":.., "rows":.., "load_1m_start":..}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def _result_fingerprint(df) -> tuple[int, int]:
    """(row count, order-insensitive value hash) of a cluster labeling."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: the suite runs ANSI mode, where summing ~n
        # full-range 64-bit hashes overflows; xor is order-insensitive
        # and closed over longs
        F.bit_xor(F.xxhash64("doc_id", "cluster_id", "is_kept")).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def variant_a(spark, sf_dir: str):
    """The shipped entry, verbatim — per-tier lineage."""
    from flink_streaming_twitter_spark.plans.dedup import dedup_clusters

    return dedup_clusters(spark, sf_dir)


def variant_b(spark, sf_dir: str):
    """Shared-shingle lineage: doc_shingle_sets materialized once and
    persisted; the MinHash signature/band/cap/verify chain consumes the
    persisted sets (as would any future shingle tier). Exact evidence
    and CC identical to the shipped plan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.operators.graph import connected_components
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    sets = D.doc_shingle_sets(docs, k=P.SHINGLE_K).persist()
    sigs = D.minhash_signatures(sets, P.MINHASH_PERMS).persist()
    banded = D.banded_signatures(sigs, P.MINHASH_PERMS, P.MINHASH_BANDS, carry=("mhs",))
    capped = D.cap_bucket_size(banded, ["band", "sig"], D.DEFAULT_LSH_MAX_BUCKET)
    a, b = capped.alias("a"), capped.alias("b")
    n_eq = F.size(
        F.filter(F.zip_with(F.col("a.mhs"), F.col("b.mhs"), lambda x, y: x == y), lambda v: v)
    )
    near = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            (n_eq / F.lit(float(P.MINHASH_PERMS))).alias("est_jaccard"),
        )
        .distinct()
        .filter(F.col("est_jaccard") >= P.MINHASH_EST_THRESHOLD)
        .select("src", "dst")
    )
    exact = (
        docs.filter(F.col("text").isNotNull())
        .select(D.normalized_text_key(F.col("text")).alias("text_key"), "doc_id")
        .withColumn("kept", F.min("doc_id").over(Window.partitionBy("text_key")))
        .filter(F.col("doc_id") != F.col("kept"))
        .select(F.col("kept").alias("src"), F.col("doc_id").alias("dst"))
    )
    comp = connected_components(
        exact.union(near), nodes=docs.select(F.col("doc_id").alias("id")).distinct()
    )
    out = comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).cast("int").alias("is_kept"),
    )
    # caller fingerprints/collects before we drop the persisted tables,
    # so hand back the unpersist hook alongside the frame
    return out, (sets, sigs)


def variant_c(spark, sf_dir: str):
    """The shipped two-tier union entry, verbatim — per-tier lineage
    (each of the word and char tiers runs its own one_row_per_key
    resolution over its own text scan)."""
    from flink_streaming_twitter_spark.plans.dedup_union import dedup_clusters_char_union

    return dedup_clusters_char_union(spark, sf_dir)


def variant_d(spark, sf_dir: str):
    """Shared-resolution lineage for the union entry: one_row_per_key
    materialized ONCE (persisted (doc_id, text) — the ~raw-text-sized
    table both tiers' evidence starts from), the word and char shingle
    pipelines fed from it, everything downstream (signature persist,
    banding, cap, est-Jaccard filter, exact arm, CC) the shipped plan
    shape — so the timing isolates exactly the duplicate
    resolve+scan work the per-tier lineage pays twice."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.operators.graph import connected_components
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans.dedup import CHAR_SHINGLE_K
    from flink_streaming_twitter_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    resolved = D.one_row_per_key(
        D._spread(docs.select("doc_id", "text"), "doc_id"), "doc_id", "text"
    ).persist()

    # doc_shingle_sets' two mode bodies, fed from the SHARED resolution
    # (the operator re-resolves internally, which is what D avoids)
    word_sets = (
        resolved.filter(F.col("text").isNotNull() & F.lower(F.col("text")).rlike(r"\w"))
        .select(
            "doc_id",
            F.array_distinct(
                D.word_shingle_hashes(F.col("text"), P.SHINGLE_K, bits=31)
            ).alias("shs"),
        )
        .withColumn("sz", F.size("shs"))
    )
    char_sets = (
        resolved.filter(
            F.col("text").isNotNull() & F.col("text").rlike(D.CHAR_EVIDENCE_PATTERN)
        )
        .select("doc_id", D.char_normalized_text(F.col("text")).alias("_nt"))
        .select(
            "doc_id",
            F.array_distinct(
                D.char_shingle_hashes(F.col("_nt"), CHAR_SHINGLE_K, bits=31)
            ).alias("shs"),
        )
        .withColumn("sz", F.size("shs"))
    )

    persisted = [resolved]

    def near(sets):
        # minhash_lsh_dedup's tail, verbatim (signature persist included)
        sigs = D.minhash_signatures(sets, P.MINHASH_PERMS).persist()
        persisted.append(sigs)
        banded = D.banded_signatures(sigs, P.MINHASH_PERMS, P.MINHASH_BANDS, carry=("mhs",))
        capped = D.cap_bucket_size(banded, ["band", "sig"], D.DEFAULT_LSH_MAX_BUCKET)
        a, b = capped.alias("a"), capped.alias("b")
        n_eq = F.size(
            F.filter(F.zip_with(F.col("a.mhs"), F.col("b.mhs"), lambda x, y: x == y), lambda v: v)
        )
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("src"),
                F.col("b.doc_id").alias("dst"),
                (n_eq / F.lit(float(P.MINHASH_PERMS))).alias("est_jaccard"),
            )
            .distinct()
            .filter(F.col("est_jaccard") >= P.MINHASH_EST_THRESHOLD)
            .select("src", "dst")
        )

    exact = (
        docs.filter(F.col("text").isNotNull())
        .select(D.normalized_text_key(F.col("text")).alias("text_key"), "doc_id")
        .withColumn("kept", F.min("doc_id").over(Window.partitionBy("text_key")))
        .filter(F.col("doc_id") != F.col("kept"))
        .select(F.col("kept").alias("src"), F.col("doc_id").alias("dst"))
    )
    comp = connected_components(
        exact.union(near(word_sets)).union(near(char_sets)),
        nodes=docs.select(F.col("doc_id").alias("id")).distinct(),
    )
    out = comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).cast("int").alias("is_kept"),
    )
    return out, tuple(persisted)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "base"
    if passes < 1:
        sys.exit("passes must be >= 1 (pass 0 carries the equality assertion)")
    if mode not in ("base", "union"):
        sys.exit("mode must be 'base' or 'union'")
    va, vb = (variant_a, variant_b) if mode == "base" else (variant_c, variant_d)
    load_1m = os.getloadavg()[0]

    spark = build_session("ab-shared-lineage", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def run_a() -> tuple[float, tuple[int, int]]:
        t0 = time.perf_counter()
        fa = _result_fingerprint(va(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        # the entry persists its signature table(s) internally with no
        # unpersist hook — clear so A does not accumulate orphaned
        # cached blocks across passes that B (which unpersists its own
        # tables) never pays for
        spark.catalog.clearCache()
        return dt, fa

    def run_b() -> tuple[float, tuple[int, int]]:
        t0 = time.perf_counter()
        df_b, persisted = vb(spark, sf_dir)
        fb = _result_fingerprint(df_b)
        dt = round(time.perf_counter() - t0, 3)
        for p in persisted:
            p.unpersist()
        spark.catalog.clearCache()
        return dt, fb

    times_a: list[float] = []
    times_b: list[float] = []
    fp_a = None
    for i in range(passes):
        # swap which variant goes first each pass: the first runner of a
        # pass pays that pass's residual JIT/page-cache warmup, so a
        # fixed order would systematically favor whichever ran second
        first, second = (run_a, run_b) if i % 2 == 0 else (run_b, run_a)
        t1, f1 = first()
        t2, f2 = second()
        (ta, fa), (tb, fb) = ((t1, f1), (t2, f2)) if i % 2 == 0 else ((t2, f2), (t1, f1))
        times_a.append(ta)
        times_b.append(tb)
        if i == 0:
            fp_a = fa
            assert fa == fb, f"variants disagree: A={fa} B={fb}"
        spark.sparkContext._jvm.System.gc()
    print(
        json.dumps(
            {
                "mode": mode,
                "sf_dir": sf_dir,
                "passes_a": times_a,
                "passes_b": times_b,
                "min_a": min(times_a),
                "min_b": min(times_b),
                "rows": fp_a[0],
                "load_1m_start": round(load_1m, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
