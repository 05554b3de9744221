"""Duplicate-primary-key contract audit (round 11 — same self-sustaining
pattern as tests/test_null_corpus_audit.py and
tests/test_extreme_corpus_audit.py).

At-least-once ingestion re-delivers rows under an existing primary key:
usually a byte-identical retry, occasionally a conflicting upstream
rewrite. Probing all 84 entries on a corpus carrying such duplicates
(tools/make_dupkey_corpus.py) found 7 divergences — per-ROW shingle
evidence versus the oracles' accidental key-merge, one cluster node per
ROW versus the recursive CTE's deduped seed, and the decode pipeline's
decoded↔frame-sample join MULTIPLYING rows on a duplicated media_id.
The fix is the duplicate-key contract
(operators/dedup.py::one_row_per_key + DISTINCT node seeds, oracles
arg_min-grouped identically); this audit re-proves it per pytest run on
both the formerly-divergent surface and the deliberately-row-identity
representatives (which must stay consistent WITHOUT key resolution).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# the round-11 divergence surface (formerly FAIL on this corpus), plus
# SimHash — which passed the first probe only by arithmetic luck
# (Spark's per-row votes counted a conflict's shared token twice where
# the oracle's DISTINCT counted once; a retry doubled every vote
# sign-preservingly) and now rides the same one_row_per_key resolution
FIXED_ENTRIES = [
    "dedup_minhash_lsh_char",
    "dedup_minhash_lsh_capped",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_60bit",
    "dedup_lsh_exact",
    "dedup_clusters",
    "multimodal_decode_stats",
    "dedup_simhash",
]
# ...plus representatives of every deliberately-ROW-identity surface
# (consistent across engines by construction — the audit proves the
# contract's SCOPE, not just its fixes) and the contract-covered twins
ROW_IDENTITY_REPS = [
    "dedup_exact",          # dup_cnt counts content observations
    "multimodal_meta",      # observation-level view
    "similarity_brute_topk",  # retry AND conflicting-vector vec_id dups
    # multi-probe rep: the flip set is per-ROW (array_sort inside the
    # row), so a re-delivered query vec_id must NOT merge margin lists —
    # the oracle's rid-partitioned flip ranking exists for exactly this
    # corpus (a q_id-partitioned ranking probed one bucket twice and
    # dropped the second-smallest flip; caught by the r12 sweep here)
    "similarity_lsh_topk_probe3",
    "dedup_embedding_cosine",  # same, through the pair-stream modality
    "q_value_stats",        # events rows are facts
    "q_user_top_orders",    # duplicated order row ranks identically
    "dedup_minhash_lsh",    # word tier under the contract
    "dedup_clusters_star",  # must mirror dedup_clusters' DISTINCT seed
    # the two-tier union (round 13): every tier it composes resolves
    # re-delivered keys independently (word + char arg_min, exact-star
    # min-window), and the node seed stays DISTINCT doc_id — a chimera
    # in ANY tier would mislabel whole clusters here
    "dedup_clusters_char_union",
]


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("dupcorpus") / "sfdup")
    _load_tool("make_dupkey_corpus").build("/root/testdata/sf0.001", dst)
    return dst


@pytest.fixture(scope="module")
def duck_views(dup_corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS FROM '{dup_corpus}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FIXED_ENTRIES + ROW_IDENTITY_REPS)
def test_entry_matches_oracle_on_dupkey_corpus(spark, dup_corpus, duck_views, name):
    import __spark_entry__ as entry_mod

    check = _load_tool("check_oracle")
    sdf = entry_mod.queries()[name](spark, dup_corpus)
    ddf = duck_views.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    problems = check.compare(name, sdf, ddf)
    assert not problems, f"{name} diverged on the duplicate-key corpus: {problems}"


def test_one_row_per_key_resolution_model(spark):
    """The resolver's contract on an inline frame: a retry collapses to
    a no-op, a conflict resolves to the content-hash-minimal text, a
    key mixing NULL and real content never resolves to NULL, and an
    all-NULL key keeps exactly one NULL row."""
    import hashlib

    from flink_streaming_twitter_spark.operators.dedup import one_row_per_key

    rows = [
        (1, "same text"), (1, "same text"),          # retry
        (2, "alpha body"), (2, "beta body"),          # conflict
        (3, None), (3, "real content"),               # NULL + content
        (4, None), (4, None),                         # all-NULL
    ]
    got = {
        r.doc_id: r.text
        for r in one_row_per_key(
            spark.createDataFrame(rows, "doc_id INT, text STRING"), "doc_id", "text"
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    winner2 = min(("alpha body", "beta body"), key=md5)
    assert got == {1: "same text", 2: winner2, 3: "real content", 4: None}


def test_shingle_evidence_is_key_idempotent(spark, dup_corpus):
    """doc_shingle_sets over the duplicate-bearing corpus emits exactly
    one evidence row per doc_id in both shingle modes — the property
    whose absence produced duplicate near-dup pairs and cap-breaking
    bucket occupancy."""
    from pyspark.sql import functions as F

    from flink_streaming_twitter_spark.operators.dedup import doc_shingle_sets
    from flink_streaming_twitter_spark.sources.files import load_table

    docs = load_table(spark, dup_corpus, "documents")
    for mode in ("word", "char"):
        mx = (
            doc_shingle_sets(docs, shingle_mode=mode)
            .groupBy("doc_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert mx == 1, f"{mode}-mode evidence must be one row per key"


def test_simhash_fingerprint_is_winner_not_chimera(spark):
    """A conflicting re-delivery must resolve to the content-hash-winner
    text's OWN fingerprint — not the vote-merge of both texts — pinned
    on an inline frame where the chimera is provably distinct from
    either text's fingerprint (the two texts share no tokens, so merged
    votes flip bits of both)."""
    from flink_streaming_twitter_spark.operators.dedup import simhash_fingerprints

    t1 = "alpha beta gamma delta epsilon"
    t2 = "zeta eta theta iota kappa"
    conflict = spark.createDataFrame(
        [(1, t1), (1, t2)], "doc_id INT, text STRING"
    )
    singles = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id INT, text STRING"
    )
    fp_conflict = simhash_fingerprints(conflict).collect()[0].simhash
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(singles).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    winner_id = 1 if md5(t1) < md5(t2) else 2
    assert fp_conflict == fps[winner_id]
    assert fps[1] != fps[2], "fixture texts must fingerprint differently"


def test_decode_counts_keys_not_rows(spark, dup_corpus):
    """multimodal_decode_stats' n_media totals the number of DISTINCT
    media keys — a re-delivered payload row decodes zero extra frames
    (before the contract the duplicated media_id decoded twice and then
    MULTIPLIED through the decoded↔frame-sample join)."""
    import duckdb

    import __spark_entry__ as entry_mod

    total = sum(
        r.n_media
        for r in entry_mod.queries()["multimodal_decode_stats"](spark, dup_corpus).collect()
    )
    con = duckdb.connect()
    (n_keys,) = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM '{dup_corpus}/documents.parquet'"
    ).fetchone()
    (n_rows,) = con.execute(
        f"SELECT count(*) FROM '{dup_corpus}/documents.parquet'"
    ).fetchone()
    con.close()
    assert total == n_keys
    assert n_rows > n_keys, "corpus must genuinely carry duplicate keys"
