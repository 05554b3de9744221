"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 38 extension entries slotted into the round-7 verified window (the
# driver checks the first 50 queries(); __spark_entry__ contributes 12).
# See the rotation rationale in extension_queries(); the contract test
# asserts these all land inside the first 50 keys.
ROUND7_WINDOW: tuple[str, ...] = (
    # 1. the whole 29-entry r6 tail (newest green: round 5) — the
    #    sampling/normalize pipeline family, the non-window analytics,
    #    and the ten heavy TPC-H joins. After this rotation no entry's
    #    newest green verdict is older than two rounds.
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q22_global_sales_opportunity",
    "top_customers",
    "q_inactive_customers",
    "q_cube_order_stats",
    "q_order_deltas",
    "q_trailing_30d_spend",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q14_promo_revenue",
    "tpch_q16_supplier_count",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_inventory",
    "tpch_q21_waiting_suppliers",
    "q_incremental_dedup",
    "q_hash_split_counts",
    "q_cap_per_source",
    "q_cap_per_source_salted",
    "q_mix_weighted",
    "q_text_normalize",
    "q_text_normalize_nfc",
    # 2. remaining 9 slots: changed-files-first — round 7 changed
    #    operators/dedup.py (default LSH bucket cap, shared banding
    #    builder) and plans/dedup.py (the 60-bit exact-Jaccard deploy
    #    entry + parameterized shingle oracle), so the ENTIRE dedup
    #    family plus the composed pipeline that exercises the same
    #    digest/cap machinery is pinned inside the window. The
    #    multimodal/session/range-join misc family rotates out this
    #    round only (r6-green, files untouched) because the tail
    #    rotation + changed-file dependents consume the full budget.
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_60bit",
    "dedup_lsh_exact",
    "dedup_simhash",
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
    # Round-7 rotation discipline (standing rule: changed files first,
    # then stalest green; both pull the same way this round):
    #   1. the whole 29-entry r6 tail, whose newest green row is round 5
    #      (sampling/normalize pipeline family, non-window analytics,
    #      the ten heavy TPC-H joins) — after this rotation no entry's
    #      newest green verdict is older than two rounds;
    #   2. the remaining 9 slots: the dedup family + composed pipeline —
    #      operators/dedup.py and plans/dedup.py changed this round
    #      (default LSH bucket cap; the new 60-bit exact-Jaccard deploy
    #      entry), so every dependent entry is pinned in-window.
    # Everything else — textops, the non-window relational/analytics
    # block, the ANN family, TPC-H q1/q3/q4/q5/q12, the multimodal/
    # session/range-join misc family — is r6-green over files untouched
    # this round; it takes the tail and rotates back next round.
    # (ROUND7_WINDOW is module-level so the contract test can pin that
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
    for name in ROUND7_WINDOW:
        q[name] = pool[name]
    # tail: everything else, r6-green and untouched this round (dict
    # update keeps first-insertion position, so re-adds are no-ops)
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
