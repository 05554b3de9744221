"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The 38 extension entries slotted into the round-9 verified window (the
# driver checks the first 50 queries(); __spark_entry__ contributes 12).
# See the rotation rationale in extension_queries(); the contract test
# asserts these all land inside the first 50 keys.
ROUND9_WINDOW: tuple[str, ...] = (
    # 1. the whole 31-entry r8 tail (newest green: round 7 by the
    #    driver, plus a full-81 local re-verify in r8) — the TPC-H
    #    q2/q6-q22 block, the heavy-join/analytics block, the
    #    sampling/normalize family (whose operators/sampling.py NULL-key
    #    change landed in r8 AFTER that window was pinned — this
    #    rotation gives it its scheduled driver verdict), the star-CC
    #    variant, and the composed pipeline entries (whose NULL-filter
    #    oracle edits in r8 likewise now get their driver verdict —
    #    ADVICE r8 medium, closed by this rotation).
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
    "dedup_clusters_star",
    "q_corpus_pipeline",
    "q_incremental_dedup",
    "q_hash_split_counts",
    "q_cap_per_source",
    "q_cap_per_source_salted",
    "q_mix_weighted",
    "q_text_normalize",
    "q_text_normalize_nfc",
    # 2. remaining 7 slots: changed-files-first, ranked by divergence
    #    risk — round 9 changed plans/dedup.py (WHERE text IS NOT NULL
    #    in DEDUP_EXACT_SQL, _clusters_sql's exact_pairs CTE, and the
    #    shared _shingles_sql CTE), operators/dedup.py (accounting=True
    #    cap-loss ledger, default-off and plan-pinned inert), and —
    #    late-round, from the NULL-corpus oracle audit —
    #    plans/similarity.py (ALL FOUR ANN oracles restructured around
    #    the scorable CTE; dedup_embedding_cosine's operator gained the
    #    unscorable-vector norm filter). In-window: the two direct-SQL
    #    dedup edits (dedup_exact, dedup_clusters; dedup_clusters_star
    #    shares that SQL from block 1), the four restructured-oracle
    #    similarity entries (dedup_embedding_cosine, similarity_brute/
    #    lsh/ivf_topk), and dedup_minhash_lsh as the representative of
    #    the shared _shingles_sql edit + the accounting code path.
    #    Documented tail EXEMPTIONS (31 + 11 changed-file dependents >
    #    38 slots; every exemption re-verified green locally at sf0.01
    #    under final code, plus the full-81 NULL-corpus audit):
    #    dedup_minhash_lsh_capped + dedup_lsh_exact (same _shingles_sql
    #    + accounting paths as in-window dedup_minhash_lsh; the cap CTE
    #    itself is untouched and r8-hash-certified where it binds),
    #    dedup_ngram_jaccard + _60bit (only the one-line _shingles_sql
    #    WHERE; NULL micro-corpus test pins the semantics),
    #    dedup_simhash (oracle untouched — own tok CTE; operator change
    #    is the additive default-off ledger, plan-identical when off),
    #    q_embedding_norms (registered in the changed similarity file
    #    but its SQL and entry code are byte-identical this round), and
    #    events_sessionize (the events leg of the audit added the same
    #    one-line ts IS NOT NULL its gaps-and-islands twin
    #    stream_session_counts carries — THAT twin is in the always-
    #    verified 12-entry head, as are all 8 other windowed oracles the
    #    events leg touched; the Spark drop contract is pinned by
    #    test_null_event_time_takes_part_in_no_window). The relational
    #    leg's two fixes (q_order_deltas explicit NULLS LAST,
    #    q_approx_percentiles vacuous-TRUE coalesce) are both
    #    WINDOW-RESIDENT block-1 entries, so the driver verdict covers
    #    them; the other analytics-file entries rotated to the tail are
    #    byte-identical this round (registration-file-only exposure,
    #    same basis as q_embedding_norms).
    "dedup_exact",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_brute_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
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
    # Round-9 rotation discipline (standing rule: changed files first,
    # then stalest green):
    #   1. the whole 31-entry r8 tail (newest driver-green: round 7) —
    #      the TPC-H q2/q6-q22 + heavy-join/analytics block, the
    #      sampling/normalize family, dedup_clusters_star, and the
    #      composed pipeline entries; the latter two groups carry r8
    #      file changes (sampling NULL keys, pipeline NULL-text oracle)
    #      that were locally 81/81-verified in r8 and now get their
    #      scheduled driver verdict (ADVICE r8 medium, closed);
    #   2. the remaining 7 slots: the dedup entries whose oracle SQL
    #      (plans/dedup.py NULL-text filter) or operator code
    #      (operators/dedup.py accounting ledger) changed this round,
    #      plus dedup_simhash/dedup_ngram_jaccard for family coherence.
    #      Documented tail exemptions: dedup_ngram_jaccard_60bit
    #      (params twin of in-window dedup_ngram_jaccard, untouched
    #      code path) and dedup_embedding_cosine (plans/similarity.py
    #      untouched) — both r8-green.
    # (ROUND9_WINDOW is module-level so the contract test can pin that
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
    for name in ROUND9_WINDOW:
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
