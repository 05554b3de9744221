"""Build the duplicate-primary-key oracle-audit corpus: a copy of a
gate SF dir where doc_id / event_id / vec_id / o_orderkey carry the
duplicates at-least-once ingestion actually delivers —

- documents: the min-doc_id row re-delivered byte-identically (a retry)
  AND a second doc_id gaining a row with DIFFERENT text (an upstream
  rewrite / conflicting re-delivery);
- events: the min-event_id row duplicated exactly, plus a second
  event_id re-delivered with a different value;
- embeddings: the min-vec_id row duplicated exactly;
- orders: the min-o_orderkey row duplicated exactly.

This corpus caught the round-11 duplicate-key divergence class
(7 entries): per-ROW shingle evidence emitted duplicate near-dup
pairs and pushed LSH bucket occupancy past the binding cap while the
oracles' ``SELECT DISTINCT doc_id, sh`` silently UNIONED conflicting
texts' shingles into a chimera document; the node seed of the cluster
entries minted one node per ROW where the oracle's recursive UNION
deduped; and the decode pipeline's decoded↔frame-sample join
MULTIPLIED rows on a duplicated media_id (2 copies → 4 joined rows).
All fixed by the duplicate-key contract
(operators/dedup.py::one_row_per_key — one observation per key,
winner = min md5(content) — plus DISTINCT node seeds), with the
oracles arg_min-grouped identically.

Deliberately-row-identity surfaces (consistent across engines by
construction, proven by the same audit): the exact tier (dup_cnt
counts content observations), every events/orders aggregate (rows are
facts), and multimodal_meta (observation-level view). SimHash also
rides the key contract (second pass, same round): before it, a
conflict vote-merged two texts into a chimera fingerprint, with Spark
counting a shared token twice where the oracle's DISTINCT counted
once.

    python tools/make_dupkey_corpus.py           # sf0.001 -> /tmp/sfdup
    python tools/check_oracle.py /tmp/sfdup      # expect all entries OK (86 as of round 13)
"""

from __future__ import annotations

import os
import shutil
import sys

COPY_THROUGH = ("region", "nation", "customer", "supplier", "part", "lineitem")

CONFLICT_TEXT = "completely different rewritten text body"


def build(src: str, dst: str) -> None:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  -- retry: min doc_id re-delivered byte-identically
  UNION ALL SELECT * FROM '{src}/documents.parquet'
            WHERE doc_id = (SELECT min(doc_id) FROM '{src}/documents.parquet')
  -- conflict: the second-lowest EXISTING doc_id re-delivered with
  -- different text (ORDER BY/OFFSET, not min+1: on a src with
  -- non-contiguous ids an arithmetic key silently becomes a fresh
  -- singleton and the conflict scenario goes unexercised)
  UNION ALL SELECT (SELECT doc_id FROM '{src}/documents.parquet'
                    ORDER BY doc_id LIMIT 1 OFFSET 1),
            '{CONFLICT_TEXT}', 'en', 'web', {len(CONFLICT_TEXT)}
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL SELECT * FROM '{src}/events.parquet'
            WHERE event_id = (SELECT min(event_id) FROM '{src}/events.parquet')
  UNION ALL SELECT (SELECT event_id FROM '{src}/events.parquet'
                    ORDER BY event_id LIMIT 1 OFFSET 1),
            (SELECT min(ts) FROM '{src}/events.parquet'), 7, 'click', 99.5, '{{}}'
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    (dim,) = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  -- retry: identical vector re-delivered under its vec_id
  -- (conflict below picks the 8th EXISTING vec_id — past the
  -- ANN query ids — by ORDER BY/OFFSET for the same reason)
  UNION ALL SELECT * FROM '{src}/embeddings.parquet'
            WHERE vec_id = (SELECT min(vec_id) FROM '{src}/embeddings.parquet')
  -- conflict: an existing non-query vec_id gains a DIFFERENT vector —
  -- probed cross-engine-consistent (per-row on both sides) across all
  -- five embedding entries; kept here so that stays audited
  UNION ALL SELECT (SELECT vec_id FROM '{src}/embeddings.parquet'
                    ORDER BY vec_id LIMIT 1 OFFSET 7),
            list_transform(range({dim}), x -> 0.25::FLOAT), 1
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/orders.parquet'
  UNION ALL SELECT * FROM '{src}/orders.parquet'
            WHERE o_orderkey = (SELECT min(o_orderkey) FROM '{src}/orders.parquet')
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    for t in COPY_THROUGH:
        shutil.copy(os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet"))
    docs = con.execute(
        f"SELECT count(*), count(DISTINCT doc_id) FROM '{dst}/documents.parquet'"
    ).fetchone()
    con.close()
    print(
        f"{dst}: documents {docs[0]} rows over {docs[1]} distinct doc_ids "
        "(1 retry dup + 1 conflict dup); events/embeddings/orders each carry dup keys"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdup"
    build(src, dst)
