"""Build the edge-input oracle-audit corpus: a copy of a gate SF dir
with the edge rows real 100 TB corpora contain but the synthetic gate
tables don't (README "Edge-input contracts") — NULLs in every table
(round 9), plus non-finite measurements/components and adversarial
string literals (round 10) —

- documents: 3 NULL-text rows (failed fetches / encoder failures), with
  NULL and non-NULL lang/source so downstream group-bys see both, plus
  (round 10) a literal '<NULL>' text, a quote/backslash text, an exact
  duplicate body under a different source/lang, zero-token texts
  (empty / whitespace-only / CJK — no shingle evidence), an
  emoji-bearing text (multi-byte UTF-8 first bytes: the decode-stub
  oracle must read bytes, not code points), combining-accent text
  (NFC-normalize twin), plus (round 11) the char-shingle-tier binding
  rows: a near-identical CJK pair the word tier cannot see, a
  precomposed twin of the combining-accent doc the exact tier cannot
  see, and a control-chars-only doc with no evidence in ANY tier;
- embeddings: 1 NULL vector + 1 all-zero vector (cosine-unscorable),
  plus (round 10) a NaN-component and an inf-component vector —
  non-finite norms are unscorable under the extended contract;
- events (round 10): one dated row each with value = NaN / +inf / -inf
  — non-finite measurements are no-measurements in every value
  aggregate (functions/numeric.py), where Spark would otherwise
  propagate and DuckDB would crash on decimal casts / STDDEV;
- events: one row each with NULL ts (unwindowable — keyed to a user
  WITH error history so the as-of NULL-probe contract binds, round 10),
  NULL user_id, NULL event_type, NULL value+props, and an undated
  'error' row (a NULL-ts OBSERVATION the as-of join must never carry) —
  the first exercises the windowed-oracle ts IS NOT NULL contract, the
  rest are ordinary NULL group keys both engines must keep identically;
- orders/lineitem/customer: NULL o_orderdate (the engine-default
  NULLS FIRST/LAST window-ordering hazard), NULL measures
  (o_totalprice, l_quantity...), NULL join/group keys (o_custkey,
  o_orderpriority, l_returnflag, c_nationkey) — joins drop NULL keys
  and aggregates skip NULL measures identically in both engines, which
  the audit proves rather than assumes;
- part/supplier/nation/region: NULL dimension join keys and attributes
  (an all-NULL part row, a supplier/nation with no nation/region link,
  a NULL region name) — every TPC-H join path sees a NULL on at least
  one side. ALL TEN tables carry NULL edge rows.

Every queries() entry can then be driven against its DuckDB oracle on
data where the NULL contracts actually bind:

    python tools/make_null_corpus.py            # sf0.001 -> /tmp/sfnull
    python tools/check_oracle.py /tmp/sfnull    # expect all entries OK (86 as of round 13)

Round-9 findings from this audit (all fixed, all pinned by unit tests):
the text-normalize comparison split on None-vs-NaN NULL rendering
(harness canon), the LSH/embedding-cosine oracles crashed on NULL
vectors (DuckDB's list_inner_product rejects any vector batch holding a
NULL list — hence the scorable CTE), the brute/IVF oracles only agreed
because sim=NULL rows happened to rank below top-k, and
dedup_embedding_cosine's OPERATOR crashed with ANSI DIVIDE_BY_ZERO on a
zero-norm vector (the one genuine Spark-side bug: the ANN tiers
filtered on the carried norm, the fourth dedup modality didn't).
"""

from __future__ import annotations

import os
import shutil
import sys


def build(src: str, dst: str) -> None:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    # every table is augmented — there is no copy-through set; the audit
    # claim is "all 10 tables carry NULL edge rows"

    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL SELECT 9000001, NULL, 'en', 'web', NULL
  UNION ALL SELECT 9000002, NULL, NULL, 'web', NULL
  UNION ALL SELECT 9000003, NULL, 'de', NULL,  NULL
  -- adversarial literals (round 10): a text equal to the comparison
  -- harness's old string NULL sentinel (must stay a VALUE, not NULL —
  -- pins the tuple-sentinel fix), and a quote/backslash text through
  -- every tokenizer/normalizer/line-protocol path
  UNION ALL SELECT 9000004, '<NULL>', 'en', 'web', 1
  UNION ALL SELECT 9000005, 'a "quoted" \\ backslash text', 'en', 'web', 1
  -- an exact duplicate of an existing body under a different
  -- source/lang: every dedup modality must pair it deterministically
  UNION ALL SELECT 9000006,
    (SELECT text FROM '{src}/documents.parquet'
     WHERE text IS NOT NULL ORDER BY doc_id LIMIT 1), 'de', 'mail', 1
  -- zero-token texts (round 10, Unicode audit): empty, whitespace-only,
  -- and \\w-tokenless scripts have NO shingle evidence — before the
  -- contract Spark paired them all via a shared md5('') shingle while
  -- DuckDB dropped them via an sh=NULL accident; the exact tier still
  -- legitimately groups the first two (identical normalized-empty text)
  UNION ALL SELECT 9000007, '', 'en', 'web', 1
  UNION ALL SELECT 9000008, '   ' || chr(9) || ' ', 'en', 'web', 1
  UNION ALL SELECT 9000009, '日本語のテキスト 中文文本', 'ja', 'web', 1
  -- non-ASCII payload bytes (round 10): the decode-stub oracle must
  -- read true UTF-8 BYTES, not code points (emoji = 4 bytes/1 code
  -- point; the first byte 0xF0 and ascii() diverge), and combining vs
  -- precomposed accents exercise the NFC normalize twin
  UNION ALL SELECT 9000010, chr(128512) || ' emoji ' || chr(128640) || ' text #tag1', 'en', 'web', 1
  UNION ALL SELECT 9000011, 'cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769), 'fr', 'web', 1
  -- round 11: rows that BIND the char-shingle tier (dedup_minhash_lsh_char).
  -- 9000012 is a near-identical twin of the CJK doc 9000009 (one appended
  -- character; char-5-gram Jaccard 0.9): word mode has ZERO evidence for
  -- either (no \\w chars), so only the char tier can pair them — the
  -- multilingual near-dup hole VERDICT r10 item 2 closes. 9000013 is the
  -- PRECOMPOSED twin of the combining-accent doc 9000011: byte-distinct
  -- (invisible to the exact tier) but NFC-identical, so the char tier
  -- pairs them at est_jaccard 1.0. 9000014 is control-chars-only: its
  -- cleaned text is EMPTY, so it must have no char-tier evidence (the
  -- raw-text CHAR_EVIDENCE_PATTERN prefilter ⟺ the oracle's len(nt)>0).
  UNION ALL SELECT 9000012, '日本語のテキスト 中文文本也', 'ja', 'web', 1
  UNION ALL SELECT 9000013, 'café résumé', 'fr', 'mail', 1
  UNION ALL SELECT 9000014, chr(1) || chr(2), 'en', 'web', 1
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
    (dim,) = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL SELECT 9000001, NULL, 0
  UNION ALL SELECT 9000002, list_transform(range({dim}), x -> 0.0::FLOAT), 1
  -- non-finite components (round 10): NaN/inf norms make a vector
  -- unscorable like NULL/zero — without the contract both engines rank
  -- the NaN vector ABOVE every real neighbor (shared NaN-is-largest
  -- convention: cross-engine parity, garbage answers)
  UNION ALL SELECT 9000003, list_transform(range({dim}),
      x -> CASE WHEN x = 0 THEN 'NaN'::FLOAT ELSE 0.1::FLOAT END), 0
  UNION ALL SELECT 9000004, list_transform(range({dim}),
      x -> CASE WHEN x = 1 THEN 'Infinity'::FLOAT ELSE 0.1::FLOAT END), 1
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
    # The two NULL-ts rows are keyed to a user who HAS error history, so
    # the as-of NULL-time contract actually binds at every source SF:
    # round 10's gate-SF audit caught DuckDB's native ASOF matching an
    # undated probe to the user's LATEST error (its sort treats a NULL
    # probe key as +inf) — invisible on a corpus where the undated row's
    # user has no errors, which is why the sf0.001 audit had missed it.
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL SELECT 9000001, NULL,
    coalesce((SELECT min(user_id) FROM '{src}/events.parquet'
              WHERE event_type = 'error'), 42), 'click', 1.5, '{{}}'
  UNION ALL SELECT 9000002, (SELECT min(ts) FROM '{src}/events.parquet'), NULL, 'click', 2.5, '{{}}'
  UNION ALL SELECT 9000003, (SELECT min(ts) FROM '{src}/events.parquet'), 43, NULL, 3.5, '{{}}'
  UNION ALL SELECT 9000004, (SELECT min(ts) FROM '{src}/events.parquet'), 44, 'view', NULL, NULL
  UNION ALL SELECT 9000005, NULL,
    coalesce((SELECT min(user_id) FROM '{src}/events.parquet'
              WHERE event_type = 'error'), 42), 'error', 4.5, '{{}}'
  UNION ALL SELECT 9000006, (SELECT min(ts) FROM '{src}/events.parquet'), 45, 'view', 'NaN'::DOUBLE, '{{}}'
  UNION ALL SELECT 9000007, (SELECT min(ts) FROM '{src}/events.parquet'), 46, 'purchase', 'Infinity'::DOUBLE, '{{}}'
  UNION ALL SELECT 9000008, (SELECT min(ts) FROM '{src}/events.parquet'), 47, 'click', '-Infinity'::DOUBLE, '{{}}'
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/orders.parquet'
  UNION ALL SELECT 9000001, 1, 'O', 100.0, NULL, '1-URGENT'
  UNION ALL SELECT 9000002, 2, 'F', NULL, (SELECT min(o_orderdate) FROM '{src}/orders.parquet'), NULL
  UNION ALL SELECT 9000003, NULL, NULL, 50.0, (SELECT min(o_orderdate) FROM '{src}/orders.parquet'), '2-HIGH'
) TO '{dst}/orders.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/lineitem.parquet'
  UNION ALL SELECT 1, 1, 1, 901, 1.0, 10.0, 0.0, 0.0, 'N', 'O', NULL
  UNION ALL SELECT 2, 2, 2, 902, NULL, NULL, NULL, NULL, NULL, NULL,
            (SELECT min(l_shipdate) FROM '{src}/lineitem.parquet')
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/customer.parquet'
  UNION ALL SELECT 9000001, 'Customer#9000001', NULL, NULL, NULL
) TO '{dst}/customer.parquet' (FORMAT PARQUET)
""")
    # dimension tables: NULL join keys (dropped from equi-joins by BOTH
    # engines), NULL group attributes, NULL measures
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/part.parquet'
  UNION ALL SELECT 9000001, NULL, NULL, NULL, NULL, NULL
) TO '{dst}/part.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/supplier.parquet'
  UNION ALL SELECT 9000001, 'Supplier#9000001', NULL, NULL
) TO '{dst}/supplier.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/nation.parquet'
  UNION ALL SELECT 90, 'NULLLAND', NULL
) TO '{dst}/nation.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/region.parquet'
  UNION ALL SELECT 90, NULL
) TO '{dst}/region.parquet' (FORMAT PARQUET)
""")
    evs = con.execute(
        f"SELECT count(*), count(ts) FROM '{dst}/events.parquet'"
    ).fetchone()
    docs = con.execute(
        f"SELECT count(*), count(text) FROM '{dst}/documents.parquet'"
    ).fetchone()
    embs = con.execute(
        f"SELECT count(*), count(embedding) FROM '{dst}/embeddings.parquet'"
    ).fetchone()
    con.close()
    print(f"{dst}: documents {docs[0]} rows ({docs[0] - docs[1]} NULL text), "
          f"embeddings {embs[0]} rows ({embs[0] - embs[1]} NULL vec + 1 zero vec), "
          f"events {evs[0]} rows ({evs[0] - evs[1]} NULL ts + 3 NULL-field rows)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfnull"
    build(src, dst)
