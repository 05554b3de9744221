"""Sessionization + multimodal metadata + range-join queries() entries
and oracles."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_media, frame_sample, payload_metadata
from ..operators.rangejoin import range_join
from ..operators.sessions import sessionize
from ..sources.files import load_table

SESSION_GAP_S = 1800
RANGE_WINDOW_S = 600

# multimodal_decode_stats decode caches, keyed per (session, sf_dir): a
# new plan only supersedes (and unpersists) the cache for the SAME key,
# so a build-all-plans-then-evaluate driver that requests several sf
# dirs — or several sessions — keeps each decode-once guarantee intact
# (ADVICE r4). Lock because the gate may build plans concurrently.
_DECODED_CACHE: dict[tuple[int, str], DataFrame] = {}
_DECODED_CACHE_LOCK = threading.Lock()


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(
        load_table(spark, sf_dir, "events"), "ts", "user_id", f"{SESSION_GAP_S} seconds"
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass with documents.text bytes standing in
    for media payloads (the container has no real media; the expression
    surface — octet_length / sha2 / size bucketing — is what's checked).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    meta = payload_metadata(docs)
    bucket = (
        F.when(F.col("byte_len") < 100, "tiny")
        .when(F.col("byte_len") < 300, "small")
        .otherwise("medium")
    )
    return meta.select("doc_id", "byte_len", F.col("sha256"), bucket.alias("size_bucket"))


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full media pipeline through the Arrow-batched mapInPandas
    decode kernel (operators/multimodal.py::decode_media) plus frame
    sampling: per mime class, media count, mean decoded dimensions, and
    frames kept at every_n=4.

    The kernel is pinned to the deterministic stub (``force_stub=True``)
    so the DuckDB oracle — which re-derives the stub arithmetic
    (width/height from the first payload bytes, n_frames from the byte
    length, ceil(n_frames/4) frames kept) — matches on any machine,
    with or without Pillow. What the hash compare then certifies is the
    PLUMBING a real media pipeline rides: Arrow batch row alignment
    (media_id ↔ payload), the mapInPandas schema contract, the
    frame-explode arithmetic, and the final aggregate. The real-decode
    branch stays covered by the PIL stub/real switch unit test
    (tests/test_similarity_and_multimodal.py). Oracle byte arithmetic
    reads true payload BYTES via hex(substring(encode(text),B,1))
    (round 10 — the earlier ascii()-on-substr form read code points,
    which diverges from a byte-reading decoder on any non-ASCII text);
    a missing byte is 0, mirroring the stub's zero padding."""
    from ..operators.dedup import one_row_per_key

    # duplicate-key contract (round 11, caught by the duplicate-key
    # corpus audit): media identity is the KEY — a re-delivered payload
    # row must not decode twice, and (worse) the decoded↔frame-sample
    # join below MULTIPLIES rows on a duplicated media_id (2 copies →
    # 4 joined rows), silently inflating every per-mime stat. One
    # deterministic observation per id (content-hash-min winner; NULL
    # payloads keep their one NULL-field row — the r8 degrade contract),
    # resolved BEFORE the decode kernel so the retry costs zero decode.
    docs = one_row_per_key(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        "text",
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/jpeg")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )
    # decoded feeds TWO consumers (the frame-sample aggregate and the
    # final join); without persist() the mapInPandas decode kernel runs
    # once per consumer — harmless on the stub, but at 100 TB of media
    # the decode IS the dominant cost and doubling it is real money
    # (VERDICT r3). MEMORY_AND_DISK default: decoded rows are thin
    # (no payload column), so the cache is cheap relative to re-decoding.
    # The returned DataFrame is lazy, so this function cannot unpersist
    # before returning; instead a new plan for the SAME (session, sf_dir)
    # releases the one it supersedes, bounding a long-lived session to
    # one pinned copy per sf_dir while leaving other keys' still-lazy
    # plans untouched. The superseded entry is unpersisted BEFORE the
    # new persist: Spark's CacheManager keys cache entries by logical-
    # plan equality and same-key rebuilds produce identical plans, so
    # unpersisting AFTER would silently drop the shared entry and lose
    # the decode-once guarantee for the new plan.
    key = (id(spark), sf_dir)
    with _DECODED_CACHE_LOCK:
        superseded = _DECODED_CACHE.pop(key, None)
    if superseded is not None:
        try:
            superseded.unpersist()
        except Exception:
            pass  # superseded cache belonged to an already-stopped session
    decoded = decode_media(media, force_stub=True).persist()
    with _DECODED_CACHE_LOCK:
        _DECODED_CACHE[key] = decoded
    frames = (
        frame_sample(decoded, every_n=4)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        decoded.join(frames, "media_id", "left")
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("width"), 6).alias("avg_width"),
            F.round(F.avg("height"), 6).alias("avg_height"),
            F.sum(F.coalesce(F.col("n_kept"), F.lit(0))).alias("frames_kept"),
        )
    )


def q_range_join_error_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join (operators/rangejoin.py): each
    error event opens a 10-minute window; count/sum the purchases whose
    timestamp falls inside it. No equi key exists, so a naive formulation
    is a nested-loop join — the bucketed decomposition makes it a plain
    shuffled equi-join on the bucket id. Purchase values summed in
    DECIMAL (order-independent), cast to double at output; non-finite
    amounts are nullified first (functions/numeric.py contract — the
    purchase still counts, its amount is unusable; round-10 edge-corpus
    audit caught the oracle's decimal cast erroring on inf)."""
    from ..functions.numeric import finite_or_null

    ev = load_table(spark, sf_dir, "events")
    errs = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_start"),
        (F.col("ts") + F.expr(f"INTERVAL {RANGE_WINDOW_S} SECONDS")).alias("err_end"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        finite_or_null(F.col("value")).cast("decimal(18,6)").alias("p_value"),
    )
    return (
        range_join(purch, errs, "p_ts", "err_start", "err_end", RANGE_WINDOW_S)
        .groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("purchase_cnt"),
            F.sum("p_value").cast("double").alias("purchase_value"),
        )
    )


MISC_QUERIES = {
    "events_sessionize": events_sessionize,
    "multimodal_meta": multimodal_meta,
    "multimodal_decode_stats": multimodal_decode_stats,
    "q_range_join_error_impact": q_range_join_error_impact,
}

EVENTS_SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, epoch(ts) AS e,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
              OR epoch(ts) - lag(epoch(ts)) OVER w > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, e,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id,
       CAST(floor(min(e)) AS BIGINT) AS session_start,
       CAST(floor(max(e)) AS BIGINT) AS session_last,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""

MULTIMODAL_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       sha256(text) AS sha256,
       CASE WHEN octet_length(encode(text)) < 100 THEN 'tiny'
            WHEN octet_length(encode(text)) < 300 THEN 'small'
            ELSE 'medium' END AS size_bucket
FROM documents
"""


# Stub-decode twin: width/height from payload BYTES 1-2 (0 when absent,
# like the stub's ljust(8, b"\0")), n_frames from byte length, frames
# kept at every_n=4 = ceil(n_frames/4) since frame 0 is always kept.
# True byte arithmetic (round 10): the original ascii(substr(text,n,1))
# read CODE POINTS, which only equals the payload byte on pure-ASCII
# text — the Unicode edge-corpus audit caught it diverging on
# emoji/CJK documents (a decoder reads bytes; Java UTF-16 string
# indexing is not even code points). Bytes are extracted engine-
# portably via hex(substring(encode(text), B, 1)) and a hex→int
# strpos lookup; NULL text stays NULL-field (the r8 degrade contract),
# a missing byte is 0 (the stub's zero padding).
def _oracle_payload_byte(b: int) -> str:
    # byte B of the blob = hex-string chars 2B-1..2B (substring over a
    # BLOB is not supported, so hex the whole payload once in the CTE)
    return f"""CASE WHEN p IS NULL THEN NULL
         WHEN octet_length(p) >= {b} THEN
           (strpos('0123456789ABCDEF', substr(ph, {2 * b - 1}, 1)) - 1) * 16
           + (strpos('0123456789ABCDEF', substr(ph, {2 * b}, 1)) - 1)
         ELSE 0 END"""


MULTIMODAL_DECODE_STATS_SQL = f"""
WITH payload AS (
  -- duplicate-key contract (round 11): one payload per doc_id, winner =
  -- min md5(text) — the arg_min twin of one_row_per_key; an all-NULL id
  -- keeps one NULL-field row (arg_min skips NULL args)
  SELECT doc_id, encode(text) AS p, hex(encode(text)) AS ph
  FROM (SELECT doc_id, arg_min(text, md5(text)) AS text
        FROM documents GROUP BY doc_id)
),
decoded AS (
  SELECT
    CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
         WHEN doc_id % 3 = 1 THEN 'audio/wav'
         ELSE 'video/mp4' END AS mime,
    1 + ({_oracle_payload_byte(1)}) % 64 AS width,
    1 + ({_oracle_payload_byte(2)}) % 64 AS height,
    1 + octet_length(p) % 16 AS n_frames
  FROM payload
)
SELECT mime,
       count(*) AS n_media,
       round(avg(width), 6) AS avg_width,
       round(avg(height), 6) AS avg_height,
       CAST(sum((n_frames + 3) // 4) AS BIGINT) AS frames_kept
FROM decoded GROUP BY mime
"""


RANGE_JOIN_SQL = f"""
WITH err AS (
  SELECT event_id AS err_id, ts AS s, ts + INTERVAL {RANGE_WINDOW_S} SECOND AS e
  FROM events WHERE event_type = 'error'
), pur AS (
  -- non-finite contract (functions/numeric.py): guard before the
  -- decimal cast, which DuckDB errors on for inf
  SELECT ts, CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,6)) AS v
  FROM events WHERE event_type = 'purchase'
)
SELECT err_id, count(*) AS purchase_cnt, CAST(sum(v) AS DOUBLE) AS purchase_value
FROM pur JOIN err ON pur.ts >= err.s AND pur.ts < err.e
GROUP BY err_id
"""


def misc_oracles() -> dict[str, str]:
    return {
        "events_sessionize": EVENTS_SESSIONIZE_SQL,
        "multimodal_meta": MULTIMODAL_META_SQL,
        "multimodal_decode_stats": MULTIMODAL_DECODE_STATS_SQL,
        "q_range_join_error_impact": RANGE_JOIN_SQL,
    }
