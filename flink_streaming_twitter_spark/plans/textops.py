"""Text-analysis queries() entries + DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import MERSENNE_31
from ..functions.text import STOPWORDS
from ..operators import textops as X
from ..sources.files import load_table


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_metrics(load_table(spark, sf_dir, "documents"))


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.language_id(load_table(spark, sf_dir, "documents"))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(load_table(spark, sf_dir, "documents"))


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.fingerprints(load_table(spark, sf_dir, "documents"))


TEXTOPS_QUERIES = {
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_token_stats": text_token_stats,
    "doc_fingerprint": doc_fingerprint,
}

_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\w+') AS tk FROM documents
),
m AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         len(list_distinct(tk)) AS n_uniq_tokens,
         length(text) AS n_chars,
         length(regexp_replace(text, '\\s+', '', 'g')) AS nonspace,
         len(list_filter(tk, x -> x IN ({_STOP_LIST}))) AS n_stop
  FROM t
)
SELECT doc_id, n_tokens, n_uniq_tokens, n_chars,
       -- token-free docs (e.g. CJK-only under an ASCII \\w tokenizer) are
       -- ratio 0 by definition, mirroring operators/textops.py
       CASE WHEN n_tokens > 0 THEN nonspace / n_tokens ELSE 0.0 END AS avg_token_len,
       CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_tokens > 0 THEN n_uniq_tokens / n_tokens ELSE 0.0 END AS uniq_ratio,
       CASE WHEN n_tokens > 0 THEN
         0.4 * (n_uniq_tokens / n_tokens)
           + 0.4 * (1.0 - n_stop / n_tokens)
           + 0.2 * least(n_tokens / 100.0, 1.0)
       ELSE 0.0 END AS quality_score
FROM m
"""

TEXT_LANGID_SQL = """
SELECT lang,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
            WHEN regexp_matches(text, '[가-힯]') THEN 'ko'
            WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
            WHEN regexp_matches(text, '[À-ɏ]') THEN 'latin-ext'
            ELSE 'en' END AS predicted_lang,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""

TEXT_TOKEN_STATS_SQL = f"""
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '\\w+')) AS nt,
         len(regexp_extract_all(lower(text), '{X.SUBWORD_PATTERN}')) AS ns,
         length(text) AS nc
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(sum(ns) AS BIGINT) AS total_subwords,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       CAST(sum(nt) AS DOUBLE) / count(*) AS avg_tokens_per_doc,
       CAST(sum(ns) AS DOUBLE) / sum(nt) AS subwords_per_token
FROM per_doc
GROUP BY source
"""

_POWERS = "[" + ", ".join(str(p) for p in X.FP_POWERS) + "]"

DOC_FINGERPRINT_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS tk FROM documents
),
terms AS (
  SELECT doc_id,
         ((('0x' || substr(md5(tk[i]), 1, 15))::BIGINT % {MERSENNE_31})
          * ({_POWERS}[((i - 1) % 8) + 1])) % {MERSENNE_31} AS term
  FROM toks, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) g
)
SELECT doc_id, CAST(sum(term) % {MERSENNE_31} AS BIGINT) AS fingerprint
FROM terms GROUP BY doc_id
"""


def textops_oracles() -> dict[str, str]:
    return {
        "text_quality": TEXT_QUALITY_SQL,
        "text_langid": TEXT_LANGID_SQL,
        "text_token_stats": TEXT_TOKEN_STATS_SQL,
        "doc_fingerprint": DOC_FINGERPRINT_SQL,
    }
