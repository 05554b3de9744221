"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 38 extension entries slotted into the round-4 verified window (the
# driver checks the first 50 queries(); __spark_entry__ contributes 12).
# See the rotation rationale in extension_queries(); the contract test
# asserts these all land inside the first 50 keys.
ROUND4_WINDOW: tuple[str, ...] = (
    # 1. changed this round (plans/misc.py)
    "multimodal_decode_stats",
    "multimodal_meta",
    "events_sessionize",
    "q_range_join_error_impact",
    # 2. the rest of the r3 tail (newest green: round 2)
    "text_quality",
    "text_langid",
    "text_token_stats",
    "doc_fingerprint",
    "q_asof_last_error",
    "q_approx_distinct_users",
    "q_value_stats",
    "q_rollup_counts",
    "q_user_top_orders",
    "q_user_segments",
    "q_pivot_daily",
    "q_distinct_users",
    "q_embedding_norms",
    "similarity_brute_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "dedup_embedding_cosine",
    "q_grouping_sets_sales",
    "q_order_rank_distribution",
    "tpch_q1_pricing_summary",
    "q_price_percentiles",
    "q_approx_percentiles",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q12_late_shipments",
    # 3. stalest r3-green: the dedup family + composed pipeline
    "dedup_exact",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_lsh_exact",
    "dedup_simhash",
    "q_corpus_pipeline",
)


def extension_queries() -> dict[str, QueryFn]:
    from .analytics import ANALYTICS_QUERIES
    from .dedup import DEDUP_QUERIES
    from .misc import MISC_QUERIES
    from .pipeline import PIPELINE_QUERIES
    from .relational import RELATIONAL_QUERIES
    from .similarity import SIMILARITY_QUERIES
    from .textops import TEXTOPS_QUERIES
    from .tpch_extra import TPCH_EXTRA_QUERIES

    # Registration order IS verification priority: the driver's gate
    # checks the first 50 queries() entries (12 in __spark_entry__ — the
    # 7 reference shapes + 5 streaming drains — then the first 38 here).
    # Round-4 rotation discipline (VERDICT r3 item 2, standing rule:
    # changed files first, then stalest green):
    #   1. the misc family (plans/misc.py changed this round —
    #      multimodal_decode_stats gained the persist() single-decode
    #      fix);
    #   2. the 26 remaining entries whose newest green row is round 2
    #      (textops / relational / similarity-ANN / the analytics
    #      q1,q3,q4,q5 + percentile families / tpch_q12) — with the two
    #      misc tail members above, that's the whole 28-entry r3 tail
    #      rotated back in, so no entry's newest green exceeds two
    #      rounds old;
    #   3. the remaining slots go to the stalest r3-green entries: the
    #      full dedup family + the composed corpus pipeline (also the
    #      heaviest operators — the ones a silent regression would hurt
    #      most).
    # Everything else is r3-green over files untouched this round; it
    # takes the tail and rotates back next round.
    # (ROUND4_WINDOW is module-level so the contract test can pin that
    # every intended name really falls inside the verified window.)
    q: dict[str, QueryFn] = {}
    pool: dict[str, QueryFn] = {}
    for fam in (
        MISC_QUERIES,
        TEXTOPS_QUERIES,
        RELATIONAL_QUERIES,
        SIMILARITY_QUERIES,
        ANALYTICS_QUERIES,
        TPCH_EXTRA_QUERIES,
        DEDUP_QUERIES,
        PIPELINE_QUERIES,
    ):
        pool.update(fam)
    for name in ROUND4_WINDOW:
        q[name] = pool[name]
    # tail: everything else, r3-green and untouched this round (dict
    # update keeps first-insertion position, so re-adds are no-ops)
    q.update(PIPELINE_QUERIES)
    q.update(ANALYTICS_QUERIES)
    q.update(TPCH_EXTRA_QUERIES)
    return q


def extension_oracles() -> dict[str, str]:
    from .analytics import ANALYTICS_ORACLES
    from .dedup import dedup_oracles
    from .misc import misc_oracles
    from .pipeline import pipeline_oracles
    from .similarity import similarity_oracles
    from .textops import textops_oracles

    from .relational import RELATIONAL_ORACLES
    from .tpch_extra import TPCH_EXTRA_ORACLES

    o: dict[str, str] = {}
    o.update(ANALYTICS_ORACLES)
    o.update(TPCH_EXTRA_ORACLES)
    o.update(dedup_oracles())
    o.update(similarity_oracles())
    o.update(textops_oracles())
    o.update(misc_oracles())
    o.update(pipeline_oracles())
    o.update(RELATIONAL_ORACLES)
    return o
