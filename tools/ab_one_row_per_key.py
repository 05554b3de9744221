"""Interleaved A/B of the round-15 operators/dedup.py changes:

1. one_row_per_key: min_by(struct) SortAggregate -> the hash-aggregable
   two-level (120-bit md5 prefix, 8-bit suffix) form + winner join-back.
2. char_shingle_hashes: md5 over distinct k-grams instead of every
   position.

Loads the OLD operators/dedup.py from a git ref (default HEAD) next to
the working tree's NEW one and times the affected call-site shapes
interleaved A/B in one warm JVM; a third variant ("newgram_oldkey" /
"oldgram_newkey" style isolation) separates the two changes on the char
shape by monkeypatching char_shingle_hashes across module copies.
Outputs asserted identical (row count + order-insensitive hash) before
timings are trusted.

Usage: python tools/ab_one_row_per_key.py [passes=4] [ref=HEAD] [sf_dir]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_streaming_twitter_spark.session import build_session  # noqa: E402


def load_dedup_copy(ref: str | None, tag: str):
    """A package-resident copy of operators/dedup.py: from a git ref, or
    (ref=None) a second instance of the working-tree module so it can be
    monkeypatched without touching the primary import."""
    if ref is None:
        with open(
            os.path.join(REPO, "flink_streaming_twitter_spark/operators/dedup.py")
        ) as f:
            src = f.read()
    else:
        src = subprocess.run(
            ["git", "-C", REPO, "show", f"{ref}:flink_streaming_twitter_spark/operators/dedup.py"],
            check=True,
            capture_output=True,
            text=True,
        ).stdout
    with tempfile.NamedTemporaryFile("w", suffix=f"_{tag}_dedup.py", delete=False) as f:
        f.write(src)
        path = f.name
    name = f"flink_streaming_twitter_spark.operators._ab_{tag}_dedup"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def fingerprint_pairs(df, cols):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators import dedup as new_dedup
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans.dedup import CHAR_SHINGLE_K
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    old_dedup = load_dedup_copy(ref, "old")
    # working-tree copy with ONLY char_shingle_hashes reverted to the
    # old positional form — isolates change 2 on the char shape
    mix_dedup = load_dedup_copy(None, "mix")
    mix_dedup.char_shingle_hashes = old_dedup.char_shingle_hashes

    spark = build_session("ab-one-row-per-key", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def cfg_ingest(mod):
        # the bare ingest resolution, as every shingle tier runs it
        r = mod.one_row_per_key(
            mod._spread(docs.select("doc_id", "text"), "doc_id"), "doc_id", "text"
        )
        return r, [F.col("doc_id"), F.md5(F.col("text"))]

    def cfg_simhash(mod):
        r = mod.simhash_near_pairs(docs, max_hamming=P.SIMHASH_MAX_HAMMING)
        return r, [F.col("doc_a"), F.col("doc_b"), F.col("hamming")]

    def cfg_lsh_word(mod):
        r = mod.minhash_lsh_dedup(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            est_threshold=P.MINHASH_EST_THRESHOLD,
            shingle_k=P.SHINGLE_K,
        )
        return r, [F.col("doc_a"), F.col("doc_b"), F.round("est_jaccard", 9)]

    def cfg_ngram60(mod):
        r = mod.ngram_jaccard_pairs(
            docs,
            threshold=P.JACCARD_THRESHOLD,
            shingle_k=P.SHINGLE_K,
            hash_bits=60,
        )
        return r, [F.col("doc_a"), F.col("doc_b"), F.round("jaccard", 9)]

    def cfg_lsh_char(mod):
        r = mod.minhash_lsh_dedup(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            est_threshold=P.MINHASH_EST_THRESHOLD,
            shingle_k=CHAR_SHINGLE_K,
            shingle_mode="char",
        )
        return r, [F.col("doc_a"), F.col("doc_b"), F.round("est_jaccard", 9)]

    # (config, variants): word shapes isolate change 1 (old vs new);
    # the char shape runs three ways so each change's share is visible
    configs = [
        ("ingest_word", cfg_ingest, [("old", old_dedup), ("new", new_dedup)]),
        ("simhash", cfg_simhash, [("old", old_dedup), ("new", new_dedup)]),
        ("lsh_word", cfg_lsh_word, [("old", old_dedup), ("new", new_dedup)]),
        ("ngram60", cfg_ngram60, [("old", old_dedup), ("new", new_dedup)]),
        (
            "lsh_char",
            cfg_lsh_char,
            [("old", old_dedup), ("mix_oldgram", mix_dedup), ("new", new_dedup)],
        ),
    ]
    results: dict[str, dict[str, list[float]]] = {
        c: {v: [] for v, _m in variants} for c, _f, variants in configs
    }
    fps: dict[str, dict[str, tuple[int, int]]] = {c: {} for c, _f, _v in configs}

    for p in range(n_passes):
        for cname, make, variants in configs:
            for vname, mod in variants:
                spark.sparkContext.setJobDescription(
                    f"ab_one_row_per_key {cname} {vname} pass{p}"
                )
                t0 = time.perf_counter()
                df, cols = make(mod)
                fp = fingerprint_pairs(df, cols)
                dt = time.perf_counter() - t0
                results[cname][vname].append(round(dt, 3))
                prev = fps[cname].setdefault(vname, fp)
                assert prev == fp, f"{cname}/{vname}: fingerprint drifted {prev} vs {fp}"
                spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for cname, _f, variants in configs:
        base = fps[cname][variants[0][0]]
        for vname, _m in variants[1:]:
            assert fps[cname][vname] == base, (
                f"{cname}: {vname} output differs from {variants[0][0]}: "
                f"{fps[cname][vname]} vs {base}"
            )

    out = {
        "sf_dir": sf_dir,
        "passes": n_passes,
        "ref": ref,
        "fingerprints_equal": True,
        "timings": results,
        "min": {
            c: {v: min(ts) for v, ts in results[c].items()} for c, _f, _v in configs
        },
        "load_15m": round(os.getloadavg()[2], 2),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
