"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


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
    # checks the first 50 queries() entries (10 in __spark_entry__ — the
    # 8 reference shapes + 2 new streaming entries — then the first 40
    # here). Round-3 rotation discipline (VERDICT r2 items 1, 4, 7):
    #   1. families whose files changed this round come first — all of
    #      plans/dedup.py (incl. NEW dedup_clusters_star) and
    #      plans/pipeline.py (incl. NEW q_cap_per_source_salted and
    #      q_text_normalize_nfc), plus operators/multimodal.py's entries
    #      (decode kernel gained the optional real-PIL path) and
    #      events_sessionize to round out the misc family;
    #   2. then the 22 TPC-H/relational entries whose newest green row is
    #      from round 1 (byte-identical since, but rotated back so no
    #      entry's verification goes >2 rounds stale);
    #   3. everything else — r2 hash-green over untouched files — takes
    #      the tail and rotates back next round.
    r1_stale = [
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
    ]
    # (events_sessionize yields its slot to the new stream_interval_pairs
    # entry in __spark_entry__ — its own code is unchanged and r2-green;
    # it rotates back with the rest of the tail next round)
    q: dict[str, QueryFn] = {}
    q.update(DEDUP_QUERIES)
    q.update(PIPELINE_QUERIES)
    for name in ("multimodal_meta", "multimodal_decode_stats"):
        q[name] = MISC_QUERIES[name]
    pool: dict[str, QueryFn] = {}
    pool.update(ANALYTICS_QUERIES)
    pool.update(TPCH_EXTRA_QUERIES)
    for name in r1_stale:
        q[name] = pool[name]
    # tail: everything else, r2-green and untouched this round (dict
    # update keeps first-insertion position, so re-adds are no-ops)
    q.update(TEXTOPS_QUERIES)
    q.update(MISC_QUERIES)
    q.update(RELATIONAL_QUERIES)
    q.update(SIMILARITY_QUERIES)
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
