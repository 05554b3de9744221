"""Interleaved A/B of the round-14 connected-components refactor.

Loads the OLD operators/graph.py from a git ref (default HEAD) next to
the working tree's NEW one, then times both closures over the identical
dedup_clusters / dedup_clusters_star evidence at sf0.1, interleaved
A/B/A/B in one warm JVM — the only fair comparison on a machine whose
draw-to-draw noise (GC debt bursts, EMA-visible co-tenants) exceeds the
effect size. Min over passes is the steady-state read.

Usage: python tools/ab_graph_closure.py [passes=4] [ref=HEAD] [sf_dir]
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


def load_old_graph(ref: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:flink_streaming_twitter_spark/operators/graph.py"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    # strip package-relative imports (the module has none at top level)
    with tempfile.NamedTemporaryFile("w", suffix="_old_graph.py", delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("old_graph", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.plans.dedup import _dup_evidence
    from flink_streaming_twitter_spark.operators import graph as new_graph
    from flink_streaming_twitter_spark.sources.files import load_table

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    old_graph = load_old_graph(ref)
    spark = build_session("ab-graph-closure", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(closure) -> tuple[float, tuple[int, int]]:
        docs = load_table(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        comp = closure(
            _dup_evidence(docs),
            nodes=docs.select(F.col("doc_id").alias("id")).distinct(),
        )
        # count + order-insensitive CONTENT hash (post-review fix: both
        # closures emit one row per node by construction, so a bare row
        # count would pass even if the comp LABELS regressed — same
        # fingerprint discipline as ab_lsh_banded/ab_ngram_prefix)
        row = comp.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(dt, 2), (int(row.n), int(row.h))

    cells = {
        "plain_old": old_graph.connected_components,
        "plain_new": new_graph.connected_components,
        "star_old": old_graph.connected_components_star,
        "star_new": new_graph.connected_components_star,
    }
    # warm the JVM once per implementation family (JIT of generated loops)
    for fn in cells.values():
        run(fn)
    out: dict[str, list[float]] = {k: [] for k in cells}
    rows: dict[str, tuple[int, int]] = {}
    for _ in range(n_passes):
        for k, fn in cells.items():  # interleaved: A,B,A',B' per sweep
            dt, n = run(fn)
            out[k].append(dt)
            prev = rows.setdefault(k, n)
            assert prev == n, f"{k}: fingerprint drifted across passes {prev} vs {n}"
        spark.sparkContext._jvm.System.gc()
    assert rows["plain_old"] == rows["plain_new"] == rows["star_old"] == rows["star_new"]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": rows["plain_new"][0],
                "fingerprints_equal": True,
                **{k: {"passes": v, "min": min(v)} for k, v in out.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
