"""Consolidated scale-measurement suite (round 7): one runner with named
cells and a manifest, folding the five round-specific probes
(scale_bench_r3/r4/r5/r5_ann/r6) so re-measuring any SCALE.md table is
one command. Cell code is moved, not rewritten — measurement scopes
(min-over-passes, cache clears, drain-timing stamps, _SUCCESS-gated
corpus reuse, the gate-params env flag) are the ones the recorded
numbers were taken under.

Usage:
  python tools/scale_suite.py --list            # manifest (cells + what they measure)
  python tools/scale_suite.py CELL [CELL ...]   # run specific cells
  python tools/scale_suite.py all_x10           # everything at 10x (/tmp/sf1)
  python tools/scale_suite.py all_x100          # everything at 100x (/tmp/sf10)

Env:
  SPARK_GRAFT_BENCH_PASSES      timed passes per cell (default 2)
  SPARK_GRAFT_X100_GATE_PARAMS  =1 also runs the documented-unscalable
                                gate-parameter forms at x100 (tens of
                                minutes; the sized forms always run)

Output: one JSON line per record, each tagged {"cell": <name>, ...};
the summary tables live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_streaming_twitter_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
X10 = "/tmp/sf1"
X100 = "/tmp/sf10"
OFFSET = 10_000_000
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def emit(cell: str, **fields) -> None:
    print(json.dumps({"cell": cell, **fields}), flush=True)


def timed(fn, passes: int = PASSES) -> tuple[float, int]:
    best, rows = None, None
    for _ in range(passes):
        t0 = time.perf_counter()
        rows = fn().count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def _built(table_dir: str) -> bool:
    # _SUCCESS (Spark's job-commit marker) rather than bare dir existence:
    # a partial directory from an interrupted run must trigger a rebuild,
    # not be silently reused (round-5 advice).
    return os.path.exists(os.path.join(table_dir, "_SUCCESS"))


def _drain_seconds(qs, name, d, spark):
    """Stream entries: time ONLY query start -> termination via the drain
    harness's module-global stamps (same scope as bench.py's probe) —
    wall clock would fold the per-pass replay prep (O(n) pyarrow
    sort+split) into the measurement."""
    from flink_streaming_twitter_spark.plans import reference_queries as RQ

    best, rows = None, None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        rows = qs[name](spark, d).count()
        dt = time.perf_counter() - t0
        if RQ.LAST_DRAIN_TIMING:
            dt = RQ.LAST_DRAIN_TIMING["query_end"] - RQ.LAST_DRAIN_TIMING["query_start"]
        best = dt if best is None else min(best, dt)
    return best, rows


# --------------------------------------------------------------- builders


def build_x10(spark) -> None:
    """10x replica of every sf0.1 table in /tmp/sf1 (make_scale10.py's
    replication rules: id offsets; document replicas salted every other
    word so they are NOT near-dups; dimensions copied as-is)."""
    if all(
        _built(os.path.join(X10, f"{t}.parquet"))
        for t in ("documents", "events", "orders", "lineitem", "embeddings")
    ):
        emit("build_x10", reused=X10)
        return
    import make_scale10

    make_scale10.main()
    emit("build_x10", built=X10)


def build_x100(spark) -> None:
    """100x documents+events (/tmp/sf10) via one explode(sequence(...))
    pass — replica scheme matches make_scale10 (id offsets; per-replica
    salt token every other word so replicas are NOT near-dups) — plus
    100x embeddings (vec_id offsets, vectors IDENTICAL across replicas:
    deliberately models exact-duplicate vectors at scale)."""
    os.makedirs(X100, exist_ok=True)
    if not (
        _built(os.path.join(X100, "documents.parquet"))
        and _built(os.path.join(X100, "events.parquet"))
    ):
        docs = (
            spark.read.parquet(f"{SF01}/documents.parquet")
            .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(99))))
            .withColumn("doc_id", F.col("doc_id") + F.col("k") * F.lit(OFFSET))
            .withColumn(
                "text",
                F.when(F.col("k") == 0, F.col("text")).otherwise(
                    F.expr(
                        r"regexp_replace(text, '(\\w+ \\w+)',"
                        r" concat('$1 z', cast(k AS string)))"
                    )
                ),
            )
            .drop("k")
        )
        docs.repartition(32).write.mode("overwrite").parquet(f"{X100}/documents.parquet")
        ev = (
            spark.read.parquet(f"{SF01}/events.parquet")
            .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(99))))
            .withColumn("event_id", F.col("event_id") + F.col("k") * F.lit(OFFSET))
            .withColumn("user_id", F.col("user_id") + F.col("k") * F.lit(OFFSET))
            .drop("k")
        )
        ev.repartition(32).write.mode("overwrite").parquet(f"{X100}/events.parquet")
    if not _built(os.path.join(X100, "embeddings.parquet")):
        emb = (
            spark.read.parquet(f"{SF01}/embeddings.parquet")
            .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(99))))
            .withColumn("vec_id", F.col("vec_id") + F.col("k") * F.lit(OFFSET))
            .drop("k")
        )
        emb.repartition(32).write.mode("overwrite").parquet(f"{X100}/embeddings.parquet")
    emit(
        "build_x100",
        documents=spark.read.parquet(f"{X100}/documents.parquet").count(),
        events=spark.read.parquet(f"{X100}/events.parquet").count(),
        vectors=spark.read.parquet(f"{X100}/embeddings.parquet").count(),
    )


# ----------------------------------------------------------- 10x cells


def dedup_x10(spark) -> None:
    """r3 table: the dedup/ANN/CC families at sf0.1 and 10x — wall
    seconds AND output rows so the growth law is on record, plus
    plain-vs-star CC round counts on each scale's dup graph."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = (
        "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_lsh_char",
        "dedup_lsh_exact", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_clusters", "dedup_clusters_star",
        "dedup_embedding_cosine", "similarity_brute_topk", "similarity_lsh_topk",
        "similarity_ivf_topk",
    )
    for sf_dir in (SF01, X10):
        for name in names:
            best, rows = None, None
            for _ in range(PASSES):
                t0 = time.perf_counter()
                rows = qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            emit("dedup_x10", query=name, sf_dir=sf_dir, sec=round(best, 2), rows=rows)

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
        emit("dedup_x10", **rec)


def streams_x10(spark) -> None:
    """r4 table: the five multi-batch drains + the decode-once multimodal
    kernel at sf0.1 vs 10x (drain-stamp timing scope)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for d in (SF01, X10):
        spark.read.parquet(os.path.join(d, "events.parquet")).count()
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()
    for name in (
        "multimodal_decode_stats", "stream_qb_counts", "stream_dedup_keys",
        "stream_qa_trending", "stream_interval_pairs", "stream_session_counts",
    ):
        row: dict = {"bench": name}
        best_raw: dict[str, float] = {}
        for tag, d in (("sf0.1", SF01), ("x10", X10)):
            if name.startswith("stream_"):
                best, rows = _drain_seconds(qs, name, d, spark)
            else:
                best, rows = timed(lambda: qs[name](spark, d))
            spark.catalog.clearCache()
            best_raw[tag] = best
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
        # factor from UNROUNDED timings (ADVICE r4)
        row["factor"] = (
            round(best_raw["x10"] / best_raw["sf0.1"], 2) if best_raw["sf0.1"] > 0 else None
        )
        emit("streams_x10", **row)


# ---------------------------------------------------------- 100x cells


def dedup_x100(spark) -> None:
    """r5 table: output-sensitive dedup at two decades — parameter effect
    (gate vs scale-sized thresholds at sf0.1), data effect (sized
    thresholds at x100), and the deploy-path contrast (LSH forms at
    unchanged gate parameters). The gate-parameter x100 forms are behind
    SPARK_GRAFT_X100_GATE_PARAMS=1 (documented-unscalable; tens of
    minutes)."""
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import dedup as PD
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    include_gate_x100 = os.environ.get("SPARK_GRAFT_X100_GATE_PARAMS") == "1"

    def ngram(d, t):
        return D.ngram_jaccard_pairs(
            load_table(spark, d, "documents"), threshold=t, shingle_k=P.SHINGLE_K
        )

    def simhash(d, h):
        return D.simhash_near_pairs(load_table(spark, d, "documents"), max_hamming=h)

    gate_dirs = (("sf0.1", SF01), ("x100", X100)) if include_gate_x100 else (("sf0.1", SF01),)
    both = (("sf0.1", SF01), ("x100", X100))
    cells = (
        ("dedup_ngram_jaccard", {"threshold": P.JACCARD_THRESHOLD},
         lambda d: ngram(d, P.JACCARD_THRESHOLD), gate_dirs),
        ("dedup_ngram_jaccard", {"threshold": 0.8},
         lambda d: ngram(d, 0.8), both),
        ("dedup_simhash", {"max_hamming": P.SIMHASH_MAX_HAMMING},
         lambda d: simhash(d, P.SIMHASH_MAX_HAMMING), gate_dirs),
        ("dedup_simhash", {"max_hamming": 1},
         lambda d: simhash(d, 1), both),
        # deploy-path contrast: gate parameters unchanged by design
        ("dedup_lsh_exact", {"threshold": P.JACCARD_THRESHOLD},
         lambda d: PD.dedup_lsh_exact(spark, d), both),
        ("dedup_minhash_lsh", {"est_threshold": P.MINHASH_EST_THRESHOLD},
         lambda d: PD.dedup_minhash_lsh(spark, d), both),
        # round 11: the char-shingle multilingual tier at both decades —
        # same banding/cap machinery, ~4x the per-doc shingle work
        # (row-wise, embarrassingly parallel) plus the Arrow-batched NFC
        # stage; gate parameters unchanged by design
        ("dedup_minhash_lsh_char", {"est_threshold": P.MINHASH_EST_THRESHOLD,
                                    "shingle_mode": "char"},
         lambda d: PD.dedup_minhash_lsh_char(spark, d), both),
    )
    for name, knobs, build, dirs in cells:
        row: dict = {"bench": name, **knobs}
        for tag, d in dirs:
            best, rows = timed(lambda: build(d))
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if "x100" in row and row["sf0.1"] > 0:
            row["factor"] = round(row["x100"] / row["sf0.1"], 2)
        emit("dedup_x100", **row)


def dedup_union_x100(spark) -> None:
    """Round 13: the two-tier evidence-union entry
    (dedup_clusters_char_union) at both decades — the suite's heaviest
    entry, so its data-effect factor gets its own row the round it
    ships. Expectation from its parts (SCALE.md): word tier ~2.9 s →
    ~29 s at ×100, char tier ~2 s → ~8 s, CC 2.6 → 35.2 s; the union
    pays the tiers once each plus the closure over the combined edge
    set. One pass at ×100 (heavy), min-over-PASSES at sf0.1."""
    from flink_streaming_twitter_spark.plans.dedup_union import dedup_clusters_char_union

    row: dict = {"bench": "dedup_clusters_char_union"}
    for tag, d, passes in (("sf0.1", SF01, PASSES), ("x100", X100, 1)):
        best, rows = timed(lambda: dedup_clusters_char_union(spark, d), passes=passes)
        row[tag] = round(best, 2)
        row[f"{tag}_rows"] = rows
        row[f"passes_{tag.replace('.', '_')}"] = passes
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    if row["sf0.1"] > 0:
        row["factor"] = round(row["x100"] / row["sf0.1"], 2)
    emit("dedup_union_x100", **row)


def dedup_union_dial_x100(spark) -> None:
    """Round 14 (VERDICT r13 item 2): measure the union entry's NAMED
    ×100 scale dial instead of leaving it as prose. Round 13 established
    the 47.8× factor is driven by the char tier's estimated-Jaccard gate
    (est ≥ 0.5 passes 48.65 M pairs at ×100 vs ~25.6 K true pairs) and
    ruled OUT in-union exact verification (>50 GB spill, ENOSPC); this
    cell quantifies the dial itself. Gate parameters in the SHIPPED
    entry stay pinned (the oracle certifies union semantics); everything
    here is a tools-only deploy-guidance variant built from the verbatim
    shipped operators. Emits:
      1. char_est_spectrum — edge counts at est ≥ {0.5, 0.625, 0.75,
         0.875} per decade (the dial's response curve, counted from ONE
         pinned-gate pair stream per decade);
      2. recall_cost (sf0.1) — of the exact-verified true char pairs
         (true J ≥ 0.5; LSH-candidate set, banding held fixed), how
         many survive each est gate INCLUDING the pinned one — a LEFT
         join, so pairs whose 16-perm estimate fell below 0.5 count as
         lost rather than silently shrinking the denominator: the
         recall price of the dial, a per-pair property independent of
         corpus size;
      3. union_dialed — the dialed union (char tier at est ≥ DIAL, word
         tier + exact edges untouched) timed at sf0.1 (min-over-PASSES)
         and ×100 (one pass), with the data-effect factor to set against
         the shipped 47.8×; a second row at est ≥ 0.875 runs the
         O(log n) star closure, because the first 0.875 probe MEASURED
         a closure interaction: raising the gate sparsifies the
         evidence graph and GROWS ITS DIAMETER (the removed mid-range
         edges were the shortcuts), and plain min-label propagation
         (O(diameter) rounds) blew its 25-round cap at sf0.1 — deploy a
         raised gate together with the star closure;
      4. refinement_invariant (sf0.1) — raising the gate only REMOVES
         edges, so the dialed partition must refine the pinned one
         (every dialed cluster inside exactly one pinned cluster); the
         coarsening-property test (tests/test_dedup_union.py) pins the
         mirror direction (VERDICT r13 item 7);
      5. cap_dial — the alternate dial: post-cap ×100 edge counts and
         the dropped-bucket loss ledger at the default cap (1024) vs a
         tightened 256, so the accounted loss of capping is on the
         books next to the threshold dial's recall cost."""
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans.dedup import CHAR_SHINGLE_K
    from flink_streaming_twitter_spark.plans.dedup_union import dedup_clusters_char_union
    from flink_streaming_twitter_spark.sources.files import load_table

    DIAL = 0.75  # 12/16 equal minhashes — the deploy-guidance raised gate
    SPECTRUM = (0.5, 0.625, 0.75, 0.875)

    def char_pairs(d, est, max_bucket=D.DEFAULT_LSH_MAX_BUCKET, accounting=False):
        docs = load_table(spark, d, "documents")
        return D.minhash_lsh_dedup(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            est_threshold=est,
            shingle_k=CHAR_SHINGLE_K,
            shingle_mode="char",
            max_bucket=max_bucket,
            accounting=accounting,
        )

    def union_dialed(d, est, closure=None):
        # the SHIPPED entry with only the dial knobs overridden — timing
        # a copy here would silently drift from future contract fixes to
        # the entry's evidence chain (round-14 review finding)
        return dedup_clusters_char_union(
            spark, d, char_est_threshold=est, closure=closure
        )

    def spectrum(tag, pairs):
        agg = pairs.agg(
            *[
                F.sum((F.col("est_jaccard") >= F.lit(t)).cast("long")).alias(f"t{i}")
                for i, t in enumerate(SPECTRUM)
            ]
        ).collect()[0]
        emit(
            "dedup_union_dial_x100",
            bench="char_est_spectrum",
            tag=tag,
            **{f"pairs_est_ge_{t}": int(agg[f"t{i}"] or 0) for i, t in enumerate(SPECTRUM)},
        )

    # 1. dial response curve: one pinned-gate pair stream per decade,
    #    thresholds counted from its est_jaccard column (no re-runs).
    #    The sf0.1 stream stays persisted through section 2's recall
    #    join — it is the identical frame, and both sections are untimed
    #    counting passes, so reuse saves a full MinHash-LSH pass at no
    #    measurement cost (round-14 review finding).
    pinned01 = char_pairs(SF01, P.MINHASH_EST_THRESHOLD).persist()
    spectrum("sf0.1", pinned01)
    pairs_x100 = char_pairs(X100, P.MINHASH_EST_THRESHOLD).persist()
    spectrum("x100", pairs_x100)
    pairs_x100.unpersist()

    # 2. recall cost of the raised gate (sf0.1; per-pair property): true
    #    char pairs (exact-verified J >= 0.5 — the measured recall-1.0
    #    baseline, SCALE.md round-11 block) LEFT-joined to the pinned
    #    est stream; the 16-perm estimate for each true pair decides
    #    whether a gate keeps it. LEFT, not inner: a true pair whose
    #    estimate fell below even the PINNED gate (P(est < 0.5) is large
    #    near J = 0.5 with 16 perms) must stay in the denominator and
    #    count as lost at every threshold — an inner join would make the
    #    pinned row tautologically lossless and overstate raised-gate
    #    recall (round-14 review finding). Scope: the denominator is the
    #    LSH-candidate exact-verified pair set, so band-miss loss is
    #    outside it by construction — banding is held fixed; this cell
    #    measures the EST-GATE dial only.
    docs01_true = D.lsh_verified_jaccard(
        load_table(spark, SF01, "documents"),
        num_perm=P.MINHASH_PERMS,
        bands=P.MINHASH_BANDS,
        threshold=0.5,
        shingle_k=CHAR_SHINGLE_K,
        shingle_mode="char",
    ).select("doc_a", "doc_b")
    joined = docs01_true.join(pinned01, ["doc_a", "doc_b"], "left")
    rc = joined.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("est_jaccard") >= F.lit(t)).cast("long")).alias(f"t{i}")
            for i, t in enumerate(SPECTRUM)
        ],
    ).collect()[0]
    emit(
        "dedup_union_dial_x100",
        bench="recall_cost",
        tag="sf0.1",
        denominator="lsh_candidate_exact_ge_0.5",
        true_pairs=int(rc.n),
        **{f"kept_est_ge_{t}": int(rc[f"t{i}"] or 0) for i, t in enumerate(SPECTRUM)},
    )
    pinned01.unpersist()
    spark.catalog.clearCache()

    # 3. the dialed union, timed at both decades (shipped-entry scopes:
    #    min-over-PASSES at sf0.1, one pass at x100). est >= 0.875 pairs
    #    the raised gate with the star closure: plain propagation blew
    #    its 25-round cap there at sf0.1 (measured — the gate removed
    #    the shortcut edges, so graph diameter exceeds the round cap)
    for dial, closure, cname in (
        (DIAL, connected_components, "plain"),
        (0.875, connected_components_star, "star"),
    ):
        row: dict = {
            "bench": "union_dialed",
            "char_est_threshold": dial,
            "closure": cname,
        }
        for tag, d, passes in (("sf0.1", SF01, PASSES), ("x100", X100, 1)):
            best, rows = timed(lambda: union_dialed(d, dial, closure), passes=passes)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
            row[f"passes_{tag.replace('.', '_')}"] = passes
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if row["sf0.1"] > 0:
            row["factor"] = round(row["x100"] / row["sf0.1"], 2)
        emit("dedup_union_dial_x100", **row)

    # 4. refinement invariant at sf0.1: fewer edges can only split or
    #    preserve clusters, never merge them — every dialed cluster must
    #    sit inside exactly one pinned cluster
    dialed = union_dialed(SF01, DIAL).select(
        "doc_id", F.col("cluster_id").alias("dial_c")
    )
    pinned = dedup_clusters_char_union(spark, SF01).select(
        "doc_id", F.col("cluster_id").alias("pin_c")
    )
    violations = (
        dialed.join(pinned, "doc_id")
        .groupBy("dial_c")
        .agg(F.countDistinct("pin_c").alias("n_pin"))
        .filter(F.col("n_pin") > 1)
        .count()
    )
    emit(
        "dedup_union_dial_x100",
        bench="refinement_invariant",
        tag="sf0.1",
        char_est_threshold=DIAL,
        violations=int(violations),
        refines=violations == 0,
    )
    spark.catalog.clearCache()

    # 5. the alternate dial: tightened band-bucket cap at x100 — post-cap
    #    edge count plus the dropped-bucket ledger (count, max occupancy,
    #    pair-loss upper bound sum n(n-1)/2), at default vs 256
    for cap in (D.DEFAULT_LSH_MAX_BUCKET, 256):
        pairs, dropped = char_pairs(
            X100, P.MINHASH_EST_THRESHOLD, max_bucket=cap, accounting=True
        )
        n_pairs = pairs.count()
        led = dropped.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("occupancy").alias("max_occ"),
            F.sum(
                (F.col("occupancy") * (F.col("occupancy") - 1) / 2).cast("long")
            ).alias("pair_loss_bound"),
        ).collect()[0]
        emit(
            "dedup_union_dial_x100",
            bench="cap_dial",
            tag="x100",
            max_bucket=cap,
            pairs=n_pairs,
            dropped_buckets=int(led.n_buckets or 0),
            max_occupancy=int(led.max_occ or 0),
            pair_loss_bound=int(led.pair_loss_bound or 0),
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


def ann_x100(spark) -> None:
    """r5_ann table: the IVF sizing contrast (gate-fixed seed_mod — ONE
    pass at the expensive x100 cell, the documented-bad configuration —
    vs auto-sqrt(n), the deploy sizing) plus LSH and brute ANN at x100.
    Per-tag pass counts are flat fields (passes_sf0_1/passes_x100), not
    nested knobs (round-6 advice: keep the JSON row shape scalar)."""
    from flink_streaming_twitter_spark.operators.similarity import ivf_topk
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans import similarity as PS
    from flink_streaming_twitter_spark.sources.files import load_table

    def ivf_auto(d):
        emb = load_table(spark, d, "embeddings")
        return ivf_topk(
            emb,
            emb.filter(F.col("vec_id") < P.ANN_NUM_QUERIES),
            P.ANN_TOP_K,
            nprobe=P.IVF_NPROBE,
            seed_mod=None,  # auto sqrt(n) — the deploy sizing
            seed_rem=P.IVF_SEED_REM,
        )

    both = (("sf0.1", SF01), ("x100", X100))
    cells = (
        ("similarity_ivf_topk", {"seed_mod": P.IVF_SEED_MOD},
         lambda d: PS.similarity_ivf_topk(spark, d), both,
         {"sf0.1": PASSES, "x100": 1}),
        ("similarity_ivf_topk", {"seed_mod": "auto_sqrt_n"},
         lambda d: ivf_auto(d), both, PASSES),
        ("similarity_lsh_topk", {},
         lambda d: PS.similarity_lsh_topk(spark, d), both, PASSES),
        ("similarity_lsh_topk_probe3", {},
         lambda d: PS.similarity_lsh_topk_probe3(spark, d), both, PASSES),
        ("similarity_brute_topk", {},
         lambda d: PS.similarity_brute_topk(spark, d), both, PASSES),
    )
    for name, knobs, build, dirs, passes in cells:
        row: dict = {"bench": name, **knobs}
        for tag, d in dirs:
            n_passes = passes[tag] if isinstance(passes, dict) else passes
            row[f"passes_{tag.replace('.', '_')}"] = n_passes
            best, rows = timed(lambda: build(d), passes=n_passes)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        if "x100" in row and row["sf0.1"] > 0:
            row["factor"] = round(row["x100"] / row["sf0.1"], 2)
        emit("ann_x100", **row)


def ann_recall_x100(spark) -> None:
    """Recall@k of each approximate ANN tier against the brute-force
    truth at sf0.1 and x100 — the measured side of the recall dial the
    multi-probe entry exists for. On the x100 corpus true neighbors are
    planted exact-duplicate vectors (build_x100 replicates the corpus),
    so recall there is the meaningful figure; on the sf0.1 corpus
    neighbor structure is noise-level cosine on near-orthogonal
    synthetics, where probe-set choice dominates and sub-1.0 recall is
    expected, not a defect (operators/similarity.py ivf_topk docstring
    records the same caveat for IVF)."""
    from flink_streaming_twitter_spark.operators.similarity import ivf_topk
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans import similarity as PS
    from flink_streaming_twitter_spark.sources.files import load_table

    def ivf_auto(d):
        emb = load_table(spark, d, "embeddings")
        return ivf_topk(
            emb,
            emb.filter(F.col("vec_id") < P.ANN_NUM_QUERIES),
            P.ANN_TOP_K,
            nprobe=P.IVF_NPROBE,
            seed_mod=None,
            seed_rem=P.IVF_SEED_REM,
        )

    tiers = (
        ("similarity_lsh_topk", lambda d: PS.similarity_lsh_topk(spark, d)),
        ("similarity_lsh_topk_probe3",
         lambda d: PS.similarity_lsh_topk_probe3(spark, d)),
        ("similarity_ivf_topk_auto", ivf_auto),
    )
    for tag, d in (("sf0.1", SF01), ("x100", X100)):
        truth = PS.similarity_brute_topk(spark, d).select("q_id", "vec_id").persist()
        n_truth = truth.count()
        for name, build in tiers:
            hits = (
                build(d).select("q_id", "vec_id").join(truth, ["q_id", "vec_id"]).count()
            )
            emit(
                "ann_recall_x100",
                bench=name,
                tag=tag,
                k=P.ANN_TOP_K,
                truth_rows=n_truth,
                hits=hits,
                recall=round(hits / n_truth, 3),
            )
        truth.unpersist()
        spark.catalog.clearCache()


def ann_recall_neardup(spark) -> None:
    """Planted NEAR-duplicate recall (VERDICT r12 item 4): the existing
    ann_recall_x100 cell saturates at 1.00 on x100 because its true
    neighbors are EXACT clones (build_x100 replicates vectors
    bit-identically), and the sf0.1 row measures noise-level neighbor
    structure — neither is a controlled difficulty. This cell plants
    100 perturbed queries q' = q + EPS*|q|/|r|*r (r a deterministic
    md5/xxhash-free-of-entropy noise vector), so cos(q, q') ≈
    1/sqrt(1+EPS²) ≈ 0.970 against a near-orthogonal background — the
    regime where the 1-probe/3-probe/IVF ordering is measurable instead
    of saturated. A hit is the planted original (or, at x100, any of
    its exact clones — same vector, so pmod(vec_id, OFFSET) identifies
    the group) appearing in the tier's top-k. Brute force runs as the
    sanity tier (planted cosine dominates the background, so its recall
    must be 1.00 and the approximate tiers are read against it).
    Achieved planted cosines are emitted per corpus (min/mean/max) so
    the 'controlled difficulty' claim is measured, not asserted."""
    from flink_streaming_twitter_spark.functions.vectors import dot_product, l2_norm
    from flink_streaming_twitter_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans.similarity import EMB_DIM, LSH_N_PROBES
    from flink_streaming_twitter_spark.sources.files import load_table

    EPS = 0.25  # tan(theta) of the planted rotation: cos ≈ 0.9701
    N_PLANT = 100
    OFF_Q = 10_000_000_000  # query ids; corpus ids top out ~ 99*OFFSET+2e3

    def perturbed(emb):
        # planted base: 100 ORIGINAL-block ids (present identically in
        # sf0.1 and x100's k=0 replica; away from the vec_id<5 standard
        # query set). Noise components are xxhash64-derived thousandths
        # — deterministic, so reruns measure the same cohort.
        base = emb.filter(
            (F.col("vec_id") >= 1000) & (F.col("vec_id") < 1000 + N_PLANT)
            & F.col("embedding").isNotNull()
        )
        aug = (
            base.withColumn(
                "noise",
                F.transform(
                    "embedding",
                    lambda _x, j: (
                        F.pmod(F.xxhash64(F.lit("nd"), F.col("vec_id"), j), F.lit(2001))
                        - 1000
                    ).cast("double")
                    / 1000.0,
                ),
            )
            .withColumn("q_norm", l2_norm(F.col("embedding")))
            .withColumn("r_norm", l2_norm(F.col("noise")))
            .withColumn(
                "pert",
                F.zip_with(
                    "embedding",
                    "noise",
                    lambda x, r: x.cast("double")
                    + F.lit(EPS) * F.col("q_norm") / F.col("r_norm") * r,
                ),
            )
        )
        queries = aug.select(
            (F.col("vec_id") + OFF_Q).alias("vec_id"), F.col("pert").alias("embedding")
        )
        planted = aug.select(
            (F.col("vec_id") + OFF_Q).alias("q_id"),
            F.col("vec_id").alias("planted_id"),
            (
                dot_product(F.col("pert"), F.col("embedding"))
                / (l2_norm(F.col("pert")) * F.col("q_norm"))
            ).alias("cos"),
        )
        return queries, planted

    tiers = (
        ("brute_force", lambda c, q: brute_force_topk(c, q, P.ANN_TOP_K)),
        ("lsh_probe1", lambda c, q: lsh_topk(
            c, q, P.ANN_TOP_K, num_planes=P.LSH_NUM_PLANES, dim=EMB_DIM)),
        ("lsh_probe3", lambda c, q: lsh_topk(
            c, q, P.ANN_TOP_K, num_planes=P.LSH_NUM_PLANES, dim=EMB_DIM,
            n_probes=LSH_N_PROBES)),
        ("ivf_auto", lambda c, q: ivf_topk(
            c, q, P.ANN_TOP_K, nprobe=P.IVF_NPROBE, seed_mod=None,
            seed_rem=P.IVF_SEED_REM)),
    )
    for tag, d in (("sf0.1", SF01), ("x100", X100)):
        emb = load_table(spark, d, "embeddings")
        queries, planted = perturbed(emb)
        planted = planted.persist()
        stats = planted.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("cos"), 4).alias("cmin"),
            F.round(F.avg("cos"), 4).alias("cmean"),
            F.round(F.max("cos"), 4).alias("cmax"),
        ).collect()[0]
        if stats.n == 0:
            # ADVICE r13: an empty planted cohort (no embeddings with
            # vec_id 1000-1099 in this table) would make the float()
            # casts raise on NULL aggregates and recall divide by zero —
            # emit a diagnosable row instead and skip the tiers
            emit("ann_recall_neardup", tag=tag, cohort=0, eps=EPS)
            planted.unpersist()
            continue
        emit(
            "ann_recall_neardup", tag=tag, cohort=int(stats.n), eps=EPS,
            cos_min=float(stats.cmin), cos_mean=float(stats.cmean),
            cos_max=float(stats.cmax),
        )
        for name, build in tiers:
            res = build(emb, queries)
            hits = (
                res.join(
                    planted,
                    (res.q_id == planted.q_id)
                    & (F.pmod(res.vec_id, F.lit(OFFSET)) == planted.planted_id),
                )
                .select(planted.q_id)
                .distinct()
                .count()
            )
            emit(
                "ann_recall_neardup",
                bench=name,
                tag=tag,
                k=P.ANN_TOP_K,
                planted=int(stats.n),
                hits=hits,
                recall=round(hits / stats.n, 3),
            )
        # clearCache AFTER the tier loop (the ann_recall_x100 pattern):
        # inside it, the just-persisted planted table would be evicted
        # and its filter+perturb+norm lineage recomputed per tier
        planted.unpersist()
        spark.catalog.clearCache()


def streams_x100(spark) -> None:
    """r5/r5_ann drains at 100x events: one full windowed-count drain plus
    the two heaviest (RocksDB chained two-agg, stream-stream interval
    join) — 10M events through the multi-batch engine, query-only
    seconds."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in ("stream_qb_counts", "stream_qa_trending", "stream_interval_pairs"):
        row = {"bench": name}
        for tag, d in (("sf0.1", SF01), ("x100", X100)):
            best, rows = _drain_seconds(qs, name, d, spark)
            row[tag] = round(best, 2)
            row[f"{tag}_rows"] = rows
        row["factor"] = round(row["x100"] / row["sf0.1"], 2) if row["sf0.1"] > 0 else None
        emit("streams_x100", **row)


def sanity_x100(spark) -> None:
    """Round-11 sanity-bound variants (plans/sanity.py) at two decades,
    each against its base twin: the bounds are one extra `when`
    projection inside the same hash-agg / window-explode-agg plans, so
    the variant/base wall ratio at both scales is the measured proof
    the quarantine contract is plan-shape-free (no new shuffle, no new
    scan). Rows are output rows (group/window counts — identical
    between variant and base on corpora with no insane rows, like these
    replicas)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for base, sane in (
        ("q_value_stats", "q_value_stats_sane"),
        ("q_value_by_window", "q_value_by_window_sane"),
    ):
        row = {"bench": sane}
        for tag, d in (("sf0.1", SF01), ("x100", X100)):
            b_best, b_rows = timed(lambda: qs[base](spark, d))
            s_best, s_rows = timed(lambda: qs[sane](spark, d))
            row[f"{tag}_base"] = round(b_best, 2)
            row[f"{tag}_sane"] = round(s_best, 2)
            row[f"{tag}_rows"] = s_rows
            assert s_rows == b_rows, "replicas carry no insane rows"
        row["x100_factor"] = (
            round(row["x100_sane"] / row["sf0.1_sane"], 2)
            if row["sf0.1_sane"] > 0
            else None
        )
        emit("sanity_x100", **row)


def recall_denominator_x100(spark) -> None:
    """r6 measurement: the exact t=0.5 pair count at x100 (the recall
    denominator for dedup_lsh_exact's 99.85% figure), computed as 10
    spill-bounded per-block exact joins plus the EXACT cross-replica
    contribution enumerated through the (measured) set of shingle hashes
    occurring in >1 replica — the global exact join is disk-bound at
    this scale (died at >62 GB spill; that failure is itself the
    measured verdict on the exact form at two decades)."""
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    REPLICAS, BLOCK = 100, 10

    base = D.ngram_jaccard_pairs(
        load_table(spark, SF01, "documents"),
        threshold=P.JACCARD_THRESHOLD,
        shingle_k=P.SHINGLE_K,
    ).count()
    emit("recall_denominator_x100", bench="exact_jaccard_t0.5", sf0_1_rows=base)

    docs100 = load_table(spark, X100, "documents")

    # (1) hash-level disjointness: shingle hashes in >1 replica (expected:
    # ~20 two-replica birthday collisions of md5_int31 over ~3e5 strings)
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
    emit(
        "recall_denominator_x100",
        bench="shingle_disjointness",
        colliding_hashes=len(multi_rows),
        max_replicas_per_hash=max((r.n_replicas for r in multi_rows), default=1),
        seconds=round(time.perf_counter() - t0, 1),
    )

    # (2) EXACT cross-replica contribution via the colliding subset
    t0 = time.perf_counter()
    bad = [r.sh for r in multi_rows]
    cross = {"pairs_with_overlap": 0, "max_jaccard": 0.0, "pairs_ge_t": 0}
    if bad:
        sub = occ.filter(F.col("sh").isin(bad))
        a = sub.select("sh", F.col("replica").alias("ra"),
                       F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
        b = sub.select("sh", F.col("replica").alias("rb"),
                       F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
        pairs = (
            a.join(b, "sh")
            .filter(F.col("ra") < F.col("rb"))
            .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("c"))
            .select((F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c"))).alias("jac"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("jac").alias("mx"),
                F.sum(F.when(F.col("jac") >= F.lit(P.JACCARD_THRESHOLD), 1).otherwise(0)).alias("ge_t"),
            )
            .collect()[0]
        )
        cross = {
            "pairs_with_overlap": pairs.n,
            "max_jaccard": round(float(pairs.mx or 0.0), 6),
            "pairs_ge_t": int(pairs.ge_t or 0),
        }
    emit("recall_denominator_x100", bench="cross_replica_exact", **cross,
         seconds=round(time.perf_counter() - t0, 1))
    occ.unpersist()

    # (3) blocked exact join: global count == sum of per-block counts +
    # the measured cross-replica pairs (prefix filtering is lossless
    # under ANY consistent df order, so per-block counts are exact)
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
        emit("recall_denominator_x100", block=g, rows=c)
    total += cross["pairs_ge_t"]
    emit(
        "recall_denominator_x100",
        bench="exact_jaccard_t0.5",
        x100_rows=total,
        x100_seconds_blocked=round(time.perf_counter() - t0, 1),
        blocks=block_counts,
        cross_replica_pairs=cross["pairs_ge_t"],
        construction_denominator=base * 100,
        matches_construction=total == base * 100,
    )


def lsh_bucket_cap_x100(spark) -> None:
    """Round-7 cell: does DEFAULT_LSH_MAX_BUCKET (on by default since r7)
    bind at x100? Measures MinHash band-bucket occupancy on the x100
    corpus and the exact pair loss of the default cap (capped vs
    uncapped candidate counts on identical data)."""
    from flink_streaming_twitter_spark.operators import dedup as D
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    docs = load_table(spark, X100, "documents")
    sigs = D.minhash_signatures(
        D.doc_shingle_sets(docs, k=P.SHINGLE_K), P.MINHASH_PERMS
    ).persist()
    banded = D.banded_signatures(sigs, P.MINHASH_PERMS, P.MINHASH_BANDS)
    occ = banded.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n")).persist()
    stats = occ.agg(
        F.max("n").alias("max_occ"),
        F.count(F.lit(1)).alias("buckets"),
        F.sum(F.when(F.col("n") > D.DEFAULT_LSH_MAX_BUCKET, 1).otherwise(0)).alias("over_cap"),
    ).collect()[0]
    t0 = time.perf_counter()
    uncapped = D.lsh_candidate_pairs(
        sigs, P.MINHASH_PERMS, P.MINHASH_BANDS, max_bucket=None
    ).count()
    t_uncapped = time.perf_counter() - t0
    t0 = time.perf_counter()
    capped = D.lsh_candidate_pairs(
        sigs, P.MINHASH_PERMS, P.MINHASH_BANDS, max_bucket=D.DEFAULT_LSH_MAX_BUCKET
    ).count()
    t_capped = time.perf_counter() - t0
    occ.unpersist()
    sigs.unpersist()
    emit(
        "lsh_bucket_cap_x100",
        cap=D.DEFAULT_LSH_MAX_BUCKET,
        max_occupancy=stats.max_occ,
        buckets=stats.buckets,
        buckets_over_cap=int(stats.over_cap or 0),
        pairs_uncapped=uncapped,
        pairs_capped=capped,
        pairs_lost=uncapped - capped,
        sec_uncapped=round(t_uncapped, 2),
        sec_capped=round(t_capped, 2),
    )


# ---------------------------------------------------------------- driver

MANIFEST: dict[str, tuple] = {
    # name: (fn, required corpus tables as "dir/table" markers, description).
    # Per-cell TABLE granularity (ADVICE r7): a partially built corpus —
    # e.g. documents present but embeddings missing after an interrupted
    # build — must SKIP the cells that need the missing table (with the
    # rebuild hint) instead of letting them start and crash mid-run. The
    # gate requires ALL of a cell's declared tables, mirroring the
    # _SUCCESS-gated per-table check the build cells already do.
    "build_x10": (build_x10, (), "build the 10x replica in /tmp/sf1 (all tables)"),
    "build_x100": (build_x100, (), "build 100x documents/events/embeddings in /tmp/sf10"),
    "dedup_x10": (dedup_x10, (f"{X10}/documents", f"{X10}/embeddings"), "dedup/ANN/CC families at sf0.1 + 10x, with row counts and CC rounds"),
    "streams_x10": (streams_x10, (f"{X10}/events", f"{X10}/documents"), "five multi-batch drains + multimodal kernel at 10x"),
    "dedup_x100": (dedup_x100, (f"{X100}/documents",), "output-sensitive dedup at 100x: parameter vs data effects, deploy contrast"),
    "dedup_union_x100": (dedup_union_x100, (f"{X100}/documents",), "the two-tier union clustering entry at sf0.1 + 100x with data-effect factor"),
    "dedup_union_dial_x100": (dedup_union_dial_x100, (f"{X100}/documents",), "the union entry's scale dial, measured: char est-gate spectrum, recall cost, dialed union factor, refinement invariant, cap-dial loss ledger"),
    "ann_x100": (ann_x100, (f"{X100}/embeddings",), "IVF sizing contrast + LSH/brute ANN at 100x"),
    "ann_recall_x100": (ann_recall_x100, (f"{X100}/embeddings",), "recall@k of LSH (1/3 probes) and auto-IVF vs brute truth at sf0.1 + 100x"),
    "ann_recall_neardup": (ann_recall_neardup, (f"{X100}/embeddings",), "planted near-duplicate (cos~0.97) recall@k per tier at sf0.1 + 100x — controlled difficulty"),
    "streams_x100": (streams_x100, (f"{X100}/events",), "heaviest drains at 100x events"),
    "sanity_x100": (sanity_x100, (f"{X100}/events",), "sanity-bound variants vs base twins at sf0.1 + 100x"),
    "recall_denominator_x100": (recall_denominator_x100, (f"{X100}/documents",), "exact t=0.5 pair count at 100x via blocked joins + measured cross-replica term"),
    "lsh_bucket_cap_x100": (lsh_bucket_cap_x100, (f"{X100}/documents",), "band-bucket occupancy and default-cap pair loss at 100x"),
}

GROUPS = {
    "all_x10": ("build_x10", "dedup_x10", "streams_x10"),
    "all_x100": ("build_x100", "dedup_x100", "dedup_union_x100",
                 "dedup_union_dial_x100", "ann_x100",
                 "ann_recall_x100", "ann_recall_neardup", "streams_x100",
                 "sanity_x100", "recall_denominator_x100", "lsh_bucket_cap_x100"),
}


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("--list", "-l"):
        for name, (_fn, reqs, desc) in MANIFEST.items():
            print(f"{name:28s} {desc}" + (f"  [needs {', '.join(reqs)}]" if reqs else ""))
        for g, members in GROUPS.items():
            print(f"{g:28s} group: {', '.join(members)}")
        return 0
    cells: list[str] = []
    for a in argv:
        if a in GROUPS:
            cells.extend(GROUPS[a])
        elif a in MANIFEST:
            cells.append(a)
        else:
            print(f"unknown cell {a!r}; --list shows the manifest", file=sys.stderr)
            return 2
    spark = build_session("scale-suite", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in cells:
            fn, reqs, _ = MANIFEST[name]
            # ALL declared tables must be _SUCCESS-complete — a partial
            # corpus skips the cell with the rebuild hint rather than
            # starting and crashing mid-run
            missing = [r for r in reqs if not _built(f"{r}.parquet")]
            if missing:
                emit(name, skip=True, reason=f"missing corpus tables {missing}; run the build cell first")
                continue
            fn(spark)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
