"""Interleaved A/B of the round-14 banded-table persist in the
MinHash-LSH candidate paths.

Loads the OLD operators/dedup.py from a git ref (default HEAD) as a
package-resident module next to the working tree's NEW one and times
the three gate configurations that exercise the banding self-join —
minhash_lsh_dedup (word), minhash_lsh_dedup (char) and
lsh_verified_jaccard (the two-tier deploy path) — interleaved A/B/A/B
in one warm JVM. Outputs asserted identical (row count +
order-insensitive hash) before timings are trusted.

Usage: python tools/ab_lsh_banded.py [passes=4] [ref=HEAD] [sf_dir]
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


def load_old_dedup(ref: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:flink_streaming_twitter_spark/operators/dedup.py"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    with tempfile.NamedTemporaryFile("w", suffix="_old_dedup.py", delete=False) as f:
        f.write(src)
        path = f.name
    name = "flink_streaming_twitter_spark.operators._ab_old_dedup_lsh"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def fingerprint_of(df, val_col: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("doc_a", "doc_b", F.round(val_col, 9)).cast("decimal(38,0)")),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as new_dedup
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.plans.dedup import CHAR_SHINGLE_K
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    old_dedup = load_old_dedup(ref)
    spark = build_session("ab-lsh-banded", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def cfg_word(mod):
        return mod.minhash_lsh_dedup(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            est_threshold=P.MINHASH_EST_THRESHOLD,
            shingle_k=P.SHINGLE_K,
        ), "est_jaccard"

    def cfg_char(mod):
        return mod.minhash_lsh_dedup(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            est_threshold=P.MINHASH_EST_THRESHOLD,
            shingle_k=CHAR_SHINGLE_K,
            shingle_mode="char",
        ), "est_jaccard"

    def cfg_verified(mod):
        return mod.lsh_verified_jaccard(
            docs,
            num_perm=P.MINHASH_PERMS,
            bands=P.MINHASH_BANDS,
            threshold=P.JACCARD_THRESHOLD,
            shingle_k=P.SHINGLE_K,
        ), "jaccard"

    configs = [("lsh_word", cfg_word), ("lsh_char", cfg_char), ("lsh_exact", cfg_verified)]
    results: dict[str, dict[str, list[float]]] = {
        c: {"old": [], "new": []} for c, _ in configs
    }
    fps: dict[str, dict[str, tuple[int, int]]] = {c: {} for c, _ in configs}

    for p in range(n_passes):
        for cname, make in configs:
            for vname, mod in (("old", old_dedup), ("new", new_dedup)):
                spark.sparkContext.setJobDescription(f"ab_lsh_banded {cname} {vname} pass{p}")
                t0 = time.perf_counter()
                df, val_col = make(mod)
                fp = fingerprint_of(df, val_col)
                dt = time.perf_counter() - t0
                results[cname][vname].append(round(dt, 3))
                prev = fps[cname].setdefault(vname, fp)
                assert prev == fp, f"{cname}/{vname}: fingerprint drifted {prev} vs {fp}"
                spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for cname, _ in configs:
        assert fps[cname]["old"] == fps[cname]["new"], (
            f"{cname}: OLD and NEW outputs differ: "
            f"{fps[cname]['old']} vs {fps[cname]['new']}"
        )

    out = {
        "sf_dir": sf_dir,
        "passes": n_passes,
        "ref": ref,
        "fingerprints_equal": True,
        "timings": results,
        "min": {c: {v: min(ts) for v, ts in results[c].items()} for c, _ in configs},
        "load_15m": round(os.getloadavg()[2], 2),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
