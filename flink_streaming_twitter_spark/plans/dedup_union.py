"""dedup_clusters_char_union — the two-tier evidence-union params
variant of dedup_clusters (VERDICT r12 item 7).

Evidence = exact-dup star edges ∪ WORD-tier MinHash-LSH pairs ∪
CHAR-tier MinHash-LSH pairs, closed by connected components — the
deploy shape for a multilingual corpus, where the word tier alone
leaves non-``\\w`` scripts (CJK, emoji-only) without near-dup evidence
(plans/dedup.py::dedup_minhash_lsh_char rationale) and the char tier
alone would skip nothing but costs an extra shingle pass; the union
gives every script SOME evidence tier and one keep-decision per
connected group. Parameters are exactly the two shipped tiers'
(plans/params.py + CHAR_SHINGLE_K), so this entry certifies the UNION
semantics, not new knobs.

This is the scenario the round-12 shared-lineage A/B said would make a
shared materialization worthwhile (SCALE.md round-12 block: per-tier
vs shared lineage was wall-neutral with ONE shingle tier; a second
tier re-runs the duplicate-key resolution + text load). The shipped
plan keeps the family's per-tier lineage (each tier is the verbatim
shipped operator — oracle-comparable by construction); the measured
shared-lineage contrast for THIS entry lives in
tools/ab_shared_lineage.py (variant C/D) and its verdict in SCALE.md.

Module placement: its own module, not plans/dedup.py, for the same
rotation-blast-radius reason the multi-probe constant lives in
plans/similarity.py rather than params.py (round 12) — adding a
variant must not mark the ten sibling dedup entries as
rotation-affected when none of their code changed. Imports FROM
plans.dedup are one-way (this module's closure includes plans/dedup.py,
so a semantic change THERE correctly marks this entry affected too,
never the reverse).

Reference parity: the reference has no dedup at all (its 914 lines are
the streaming trend pipeline, Main.java); this family exists for the
100 TB training-data-pipeline surface (SURVEY.md §2 extension block).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources.files import load_table
from . import params as P
from .dedup import (
    CHAR_SHINGLE_K,
    _char_shingles_sql,
    _cluster_output,
    _dup_evidence,
    _minhash_sig_sql,
    _SHINGLES,
)


def dedup_clusters_char_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union the word-tier evidence chain (exact star edges + word
    MinHash-LSH pairs — plans/dedup.py::_dup_evidence, verbatim) with
    the char-tier near-dup pairs (the dedup_minhash_lsh_char operator,
    verbatim), then one connected-components closure over the combined
    edge set. Same duplicate-key contract as the siblings: the node set
    seeds from DISTINCT doc_id, and every tier resolves re-delivered
    keys via one_row_per_key/arg_min before hashing."""
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    char_pairs = D.minhash_lsh_dedup(
        docs,
        num_perm=P.MINHASH_PERMS,
        bands=P.MINHASH_BANDS,
        est_threshold=P.MINHASH_EST_THRESHOLD,
        shingle_k=CHAR_SHINGLE_K,
        shingle_mode="char",
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(
        _dup_evidence(docs).union(char_pairs),
        nodes=docs.select(F.col("doc_id").alias("id")).distinct(),
    )
    return _cluster_output(comp)


def _suffix_ctes(frag: str, names: tuple[str, ...], suffix: str) -> str:
    """Rename the given CTE identifiers in a generated SQL fragment with
    a word-boundary regex so the word- and char-tier chains (which both
    emit ``shingles``/``sigs``) can coexist in one WITH clause. Safe on
    these fragments by construction: the names appear only as CTE
    identifiers (tokens like ``nfc_normalize`` / ``_shingles_sql`` embed
    them behind word characters, which ``\\b`` does not split)."""
    pat = re.compile(r"\b(" + "|".join(map(re.escape, names)) + r")\b")
    return pat.sub(lambda m: m.group(0) + suffix, frag)


def _clusters_char_union_sql() -> str:
    """The dedup_clusters recursive-CTE oracle with a second near-pair
    tier: both tiers' shingle→signature→band chains run side by side
    (char-tier CTEs suffixed ``_c``), the edge union takes exact + word
    + char pairs bidirectionally, and the closure computes the same
    min-reachable-id labels. Fragments are imported from plans/dedup.py
    so a constant or hash change there flows into this oracle the same
    way it flows into the word/char sibling oracles."""
    n, bands = P.MINHASH_PERMS, P.MINHASH_BANDS
    rows = n // bands

    def band_selects(sigs_name: str) -> str:
        return "\n  UNION ALL\n".join(
            "  SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS sig FROM {s}".format(
                b=b,
                cols=", ".join(f"mh{b * rows + r}" for r in range(rows)),
                s=sigs_name,
            )
            for b in range(bands)
        )

    eq_sum = " + ".join(f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(n))
    char_chain = _suffix_ctes(
        _char_shingles_sql(), ("norm", "nz", "shingles"), "_c"
    )
    char_sigs = _suffix_ctes(_minhash_sig_sql(n), ("sigs", "shingles"), "_c")

    def near_pairs(banded_name: str, sigs_name: str) -> str:
        return f"""
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM {banded_name} a JOIN {banded_name} b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE (SELECT ({eq_sum}) / {float(n)}
         FROM {sigs_name} sa, {sigs_name} sb
         WHERE sa.doc_id = a.doc_id AND sb.doc_id = b.doc_id) >= {P.MINHASH_EST_THRESHOLD}"""

    return f"""
WITH RECURSIVE {_SHINGLES},
{_minhash_sig_sql(n)},
banded AS (
{band_selects("sigs")}
),
{char_chain.strip().rstrip(",")},
{char_sigs},
banded_c AS (
{band_selects("sigs_c")}
),
near_pairs AS ({near_pairs("banded", "sigs")}
),
near_pairs_c AS ({near_pairs("banded_c", "sigs_c")}
),
exact_pairs AS (
  -- NULL text takes no part in dedup (the dedup_clusters oracle's
  -- contract, verbatim): filter before keying so NULL-text docs cannot
  -- form one spurious star
  SELECT kept AS src, doc_id AS dst FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS kept
    FROM documents
    WHERE text IS NOT NULL
  ) WHERE doc_id <> kept
),
edges AS (
  SELECT src AS s, dst AS d FROM exact_pairs
  UNION SELECT dst, src FROM exact_pairs
  UNION SELECT src, dst FROM near_pairs
  UNION SELECT dst, src FROM near_pairs
  UNION SELECT src, dst FROM near_pairs_c
  UNION SELECT dst, src FROM near_pairs_c
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id,
       CASE WHEN id = min(r) THEN 1 ELSE 0 END AS is_kept
FROM reach GROUP BY id
"""


DEDUP_UNION_QUERIES = {
    "dedup_clusters_char_union": dedup_clusters_char_union,
}


def dedup_union_oracles() -> dict[str, str]:
    return {"dedup_clusters_char_union": _clusters_char_union_sql()}
