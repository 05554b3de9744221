"""Interleaved A/B of the round-14 ngram-Jaccard prefix persist.

Loads the OLD operators/dedup.py from a git ref (default HEAD) as a
package-resident module next to the working tree's NEW one, then times
ngram_jaccard_pairs over the identical documents input at sf0.1 for both
hash widths (the dedup_ngram_jaccard / _60bit gate configurations),
interleaved A/B/A/B in one warm JVM. Outputs are asserted identical
(row count + order-insensitive hash) before any timing is trusted.

Usage: python tools/ab_ngram_prefix.py [passes=4] [ref=HEAD] [sf_dir]
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
    """Materialize the old module UNDER THE PACKAGE NAMESPACE so its
    relative imports (..functions.hashing etc.) resolve against the
    working tree's (unchanged) siblings."""
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:flink_streaming_twitter_spark/operators/dedup.py"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    with tempfile.NamedTemporaryFile("w", suffix="_old_dedup.py", delete=False) as f:
        f.write(src)
        path = f.name
    name = "flink_streaming_twitter_spark.operators._ab_old_dedup"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def result_fingerprint(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("doc_a", "doc_b", F.round("jaccard", 9)).cast("decimal(38,0)")),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def main() -> None:
    from flink_streaming_twitter_spark.operators import dedup as new_dedup
    from flink_streaming_twitter_spark.plans import params as P
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    old_dedup = load_old_dedup(ref)
    spark = build_session("ab-ngram-prefix", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan

    configs = [("31bit", 31), ("60bit", 60)]
    results: dict[str, dict[str, list[float]]] = {
        c: {"old": [], "new": []} for c, _ in configs
    }
    fps: dict[str, dict[str, tuple[int, int]]] = {c: {} for c, _ in configs}

    for p in range(n_passes):
        for cname, bits in configs:
            for vname, mod in (("old", old_dedup), ("new", new_dedup)):
                spark.sparkContext.setJobDescription(
                    f"ab_ngram_prefix {cname} {vname} pass{p}"
                )
                t0 = time.perf_counter()
                df = mod.ngram_jaccard_pairs(
                    docs,
                    threshold=P.JACCARD_THRESHOLD,
                    shingle_k=P.SHINGLE_K,
                    hash_bits=bits,
                )
                fp = result_fingerprint(df)
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
        "min": {
            c: {v: min(ts) for v, ts in results[c].items()} for c, _ in configs
        },
        "load_15m": round(os.getloadavg()[2], 2),
    }
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
