"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame compositions (no Python UDFs anywhere):

- exact: hash-groupBy on normalized text — one shuffle of (hash, id).
- MinHash + LSH banding: near-dup candidate generation whose cost is the
  number of *colliding band buckets*, not n² — the standard web-scale
  near-dup design (Broder; see PAPERS.md). Signatures are 16 universal
  hashes over 3-word shingles; 4 bands × 4 rows ⇒ pairs with Jaccard ≥
  ~0.5 collide in some band with high probability.
- n-gram Jaccard verification: exact set overlap for candidate pairs
  found via an inverted shingle index, with a document-frequency cap on
  shingles (df ≤ max_df) — frequent shingles are non-discriminative and
  are exactly the ones that would quadratically blow up the index join at
  100 TB (the classic prefix-filter/stop-shingle optimization).
- SimHash: 60-bit fingerprints (md5-derived bit votes), banded 4×15 bits
  so any pair within Hamming distance 3 shares ≥1 band (pigeonhole);
  exact Hamming check via xor+bit_count on candidates only.

Every hash is md5-derived (functions/hashing.py) so the DuckDB oracle can
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int31, md5_int60, minhash_exprs
from ..functions.text import tokens, word_shingles

SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15


def normalized_text_key(text: F.Column) -> F.Column:
    """Exact-dup grouping key: md5 of lowercased, trimmed,
    whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One surviving row per distinct normalized text: (kept_doc_id = min
    id, dup_cnt). Shuffle carries only (128-bit key, id) pairs; partial
    min/count collapse duplicates map-side."""
    return (
        docs.select(normalized_text_key(F.col(text_col)).alias("text_key"), F.col(id_col))
        .groupBy("text_key")
        .agg(F.min(id_col).alias("kept_doc_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct (doc_id, shingle-hash) pairs; the hash (31-bit md5-derived)
    is what downstream joins and minhashes consume — shuffling 8-byte ints,
    never shingle strings."""
    return (
        docs.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("shingle"))
        .select(id_col, md5_int31(F.col("shingle")).alias("sh"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, num_perm: int, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, mh0..mh{n-1}, mhs ARRAY) — one row per doc; a single hash
    aggregate computes every permutation's min in one pass, plus the
    packed array form that downstream joins carry (one column instead of
    n — smaller exchanges, zip_with-comparable)."""
    hashes = minhash_exprs("sh", num_perm)
    sig = shingles.groupBy(id_col).agg(
        *[F.min(h).alias(f"mh{i}") for i, h in enumerate(hashes)]
    )
    return sig.withColumn("mhs", F.array(*[F.col(f"mh{i}") for i in range(num_perm)]))


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int, bands: int, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature, bucket-join per band → distinct (doc_a, doc_b).

    Banding uses explode over an array of (band, concatenated row hashes)
    structs — one narrow pass; the self-join shuffles on (band, sig)
    buckets, so cost tracks bucket occupancy. At 100 TB a hot bucket (all
    boilerplate docs) would skew the join; AQE skew-join splits it, and a
    df-style cap on bucket size (ignore buckets > N docs, they're
    boilerplate, handle separately) is the documented escape hatch.
    """
    rows = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(F.col(id_col), F.explode(band_structs).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    est_threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs with estimated Jaccard (fraction of equal
    minhashes) ≥ threshold: (doc_a, doc_b, est_jaccard)."""
    sh = doc_shingles(docs, k=shingle_k)
    sigs = minhash_signatures(sh, num_perm)
    # Carry the packed signature array through the band self-join so the
    # estimated Jaccard needs NO extra signature joins; the identical
    # join subtrees hit Spark's ReuseExchange (persist measured slower).
    rows = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("_", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", "mhs", F.explode(band_structs).alias("bs")).select(
        "doc_id", "mhs", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    n_eq = F.size(
        F.filter(F.zip_with(F.col("a.mhs"), F.col("b.mhs"), lambda x, y: x == y), lambda v: v)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (n_eq / F.lit(float(num_perm))).alias("est_jaccard"),
        )
        .distinct()
        .filter(F.col("est_jaccard") >= est_threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_df: int = 10,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity for pairs surfaced by the inverted shingle
    index: (doc_a, doc_b, jaccard).

    Candidates come only from shingles appearing in ≤ max_df documents;
    the Jaccard itself is then computed over the FULL shingle sets of each
    candidate pair (candidate generation is pruned, verification is
    exact). A pair sharing only ultra-common shingles is by construction
    below any useful threshold.
    """
    # the distinct (doc, shingle) set feeds four consumers (sizes, the
    # df-filtered index, and both sides of the verification join) —
    # persist it once instead of recomputing the explode+hash+distinct
    # lineage per branch
    sh = doc_shingles(docs, k=shingle_k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    rare = (
        sh.join(
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_df),
            "sh",
        )
        .select("doc_id", "sh")
        .persist()  # both sides of the candidate self-join
    )
    a, b = rare.alias("a"), rare.alias("b")
    cands = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = (
        cands.join(sha, "doc_a")
        .join(shb, (F.col("doc_b") == F.col("b_id")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(F.broadcast(sza), "doc_a")
        .join(F.broadcast(szb), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per doc from distinct-token bit votes: (doc_id,
    simhash BIGINT). One explode + one hash aggregate with 60 conditional
    sums — wide but shallow, fully codegen'd, no UDF."""
    tok = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
        .select(id_col, md5_int60(F.col("tok")).alias("h"))
    )
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    fp = sum(
        F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        for j in range(SIMHASH_BITS)
    )
    return votes.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs within Hamming distance
    max_hamming, via 4×15-bit band blocking (pigeonhole-complete for
    max_hamming ≤ 3) + exact xor/bit_count verification."""
    # both sides of the band self-join are identical subtrees →
    # ReuseExchange computes the vote aggregate once; persist measured
    # 3x slower here, so deliberately absent
    fps = simhash_fingerprints(docs)
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = fps.select("doc_id", "simhash", F.explode(band_structs).alias("bs")).select(
        "doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
