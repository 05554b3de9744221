"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 38 extension entries slotted into the round-6 verified window (the
# driver checks the first 50 queries(); __spark_entry__ contributes 12).
# See the rotation rationale in extension_queries(); the contract test
# asserts these all land inside the first 50 keys.
ROUND6_WINDOW: tuple[str, ...] = (
    # 1. the whole 29-entry r5 tail (newest green: round 4) — textops,
    #    the non-window relational/analytics block, the ANN family, the
    #    TPC-H q1-q5/q12 block, and the non-iterative dedup entries
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
    "dedup_exact",
    "dedup_lsh_exact",
    "dedup_simhash",
    # 2. remaining 9 slots: the standing regression-sensitive head —
    #    the multimodal/session/range-join misc family (decode-cache
    #    lifecycle, ×100-measured range join) and the heavy iterative/
    #    self-join dedup family + composed pipeline. These stay pinned
    #    every round: they exercise the most stateful operator code
    #    (persist lifecycle, iterative CC fixpoints, PPJoin filters)
    #    where a silent regression would cost the most.
    "multimodal_decode_stats",
    "multimodal_meta",
    "events_sessionize",
    "q_range_join_error_impact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_clusters_star",
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
    # Round-6 rotation discipline (standing rule: changed files first,
    # then stalest green — no query-defining file changed this round,
    # so stalest-green leads):
    #   1. the whole 29-entry r5 tail, whose newest green row is round 4
    #      (textops, the non-window relational/analytics block, the ANN
    #      family, TPC-H q1-q5/q12, non-iterative dedup) — after this
    #      rotation no entry's newest green verdict is older than two
    #      rounds;
    #   2. the remaining 9 slots: the standing regression-sensitive head
    #      (misc family + iterative/self-join dedup heavies + composed
    #      pipeline), pinned every round because they exercise the most
    #      stateful operator code.
    # Everything else — the sampling/normalize pipeline family, the
    # non-window analytics, the ten heavy TPC-H joins — is r5-green over
    # files untouched this round; it takes the tail and rotates back
    # next round.
    # (ROUND6_WINDOW is module-level so the contract test can pin that
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
    for name in ROUND6_WINDOW:
        q[name] = pool[name]
    # tail: everything else, r4-green and untouched this round (dict
    # update keeps first-insertion position, so re-adds are no-ops)
    q.update(TEXTOPS_QUERIES)
    q.update(RELATIONAL_QUERIES)
    q.update(SIMILARITY_QUERIES)
    q.update(ANALYTICS_QUERIES)
    q.update(TPCH_EXTRA_QUERIES)
    q.update(DEDUP_QUERIES)
    q.update(PIPELINE_QUERIES)
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
