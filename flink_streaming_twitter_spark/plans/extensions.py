"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 38 extension entries slotted into the round-8 verified window (the
# driver checks the first 50 queries(); __spark_entry__ contributes 12).
# See the rotation rationale in extension_queries(); the contract test
# asserts these all land inside the first 50 keys.
ROUND8_WINDOW: tuple[str, ...] = (
    # 1. the whole 30-entry r7 tail (newest green: round 6) — textops,
    #    the non-window relational/analytics block, the ANN family,
    #    TPC-H q1/q3/q4/q5/q12, and the multimodal/session/range-join
    #    misc family. After this rotation no entry's newest green
    #    verdict is older than two rounds.
    "events_sessionize",
    "multimodal_meta",
    "multimodal_decode_stats",
    "q_range_join_error_impact",
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
    # 2. remaining 8 slots: changed-files-first — round 8 changed
    #    plans/dedup.py (the new binding-cap gate entry
    #    dedup_minhash_lsh_capped + the cap-parameterized oracle SQL)
    #    and plans/params.py (LSH_CAP_BINDING), so the dedup family is
    #    pinned in-window: the NEW capped entry (never verified), both
    #    MinHash-LSH-path entries the oracle refactor touches, and the
    #    rest of the family registered in the changed file. One member
    #    must take the tail (30 + 9 > 38): dedup_clusters_star — its
    #    closure runs in untouched operators/graph.py and its plan +
    #    oracle are shared with dedup_clusters, which stays in-window
    #    covering the same SQL. q_corpus_pipeline (r7-green,
    #    plans/pipeline.py untouched) also rotates to the tail.
    "dedup_minhash_lsh_capped",
    "dedup_minhash_lsh",
    "dedup_lsh_exact",
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_60bit",
    "dedup_clusters",
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
    # Round-8 rotation discipline (standing rule: changed files first,
    # then stalest green):
    #   1. the whole 30-entry r7 tail, whose newest green row is round 6
    #      (textops, the non-window relational/analytics block, the ANN
    #      family, TPC-H q1/q3/q4/q5/q12, the multimodal/session/
    #      range-join misc family) — after this rotation no entry's
    #      newest green verdict is older than two rounds;
    #   2. the remaining 8 slots: the dedup family — plans/dedup.py
    #      changed this round (the new binding-cap entry
    #      dedup_minhash_lsh_capped + the cap-parameterized oracle).
    #      dedup_clusters_star takes the tail (r7-green; closure code in
    #      untouched graph.py; oracle shared with in-window
    #      dedup_clusters), as does q_corpus_pipeline (r7-green,
    #      pipeline.py untouched) and the r7 window's TPC-H/sampling/
    #      normalize block (r7-green over untouched files).
    # (ROUND8_WINDOW is module-level so the contract test can pin that
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
    for name in ROUND8_WINDOW:
        q[name] = pool[name]
    # tail: everything else, r7-green and untouched this round (dict
    # update keeps first-insertion position, so re-adds are no-ops).
    # EVERY family dict must appear here even when fully in-window —
    # otherwise rotating it out later silently drops its entries
    # (the r7 registration-bug class).
    q.update(MISC_QUERIES)
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
