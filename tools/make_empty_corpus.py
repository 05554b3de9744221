"""Build the empty-corpus oracle-audit dir: all ten tables with their
exact gate schemas and ZERO rows — the cold-start state every real
pipeline passes through (first run before data lands, a partition with
no files yet, a filter that matched nothing upstream).

Probing all 84 entries on it (round 11) found one divergence class:
Spark's ROLLUP / CUBE / GROUPING SETS emit ZERO rows on zero input
rows (the () super-aggregate is expanded into an ordinary groupBy, so
no groups exist), while standard SQL — and DuckDB — emit the
grand-total row with count 0. The engine's contract is Spark's
no-data-no-rows cold-start semantics; the three super-aggregate
oracles carry a one-line ``HAVING count(*) > 0`` that is exact on
non-empty input (every real group has count >= 1). Everything else —
ungrouped aggregates (both engines emit the single count-0 row),
windows, top-k, percentiles, every dedup/ANN tier, and all five
streaming drains — agreed on empty input with no change.

    python tools/make_empty_corpus.py            # sf0.001 -> /tmp/sfempty
    python tools/check_oracle.py /tmp/sfempty    # expect all entries OK (86 as of round 13)
"""

from __future__ import annotations

import os
import shutil
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build(src: str, dst: str) -> None:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    print(f"{dst}: all {len(TABLES)} tables at zero rows, gate schemas preserved")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfempty"
    build(src, dst)
