"""Relational-breadth queries: as-of join, rollup/grouping sets, ranking
windows, set operations, pivot, distinct aggregation — Spark-native
operator families absent from the reference (SURVEY.md §2.6/§2.7 notes
them absent) but required of a complete engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..sources.files import load_table

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the timestamp of that user's most recent STRICTLY prior
    'error' event (-1 if none) — the point-in-time feature-join shape.
    Undated rows follow the operator's NULL-time contract: an undated
    event yields -1, an undated error is never an observation."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_s", F.col("ts").cast("double")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts_s").alias("err_ts")
    )
    left = ev.select("event_id", "user_id", "ts_s")
    out = asof_join_backward(
        left, errors, ["user_id"], "ts_s", "err_ts", "err_ts", out_col="last_err"
    )
    return out.select(
        "event_id",
        "user_id",
        F.floor(F.col("ts_s")).cast("long").alias("ts_sec"),
        F.coalesce(F.floor(F.col("last_err")), F.lit(-1)).cast("long").alias("last_error_sec"),
    )


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(event_type, day): per-type-per-day, per-type, and grand
    totals in one pass (Catalyst expands to a single shuffle)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.floor(F.col("ts").cast("double") / 86400).cast("long")
    )
    return (
        ev.rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("day"), F.lit(-1)).alias("day"),
            "gid",
            "n",
        )
    )


def q_user_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price — the per-group ranking window
    family (row_number over partitioned sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation semantics — users who clicked but never purchased
    (EXCEPT) and users who did both (INTERSECT), tagged in one result —
    evaluated as ONE conditional aggregation (round 14, guide §2.4
    fewer passes): the literal subtract/intersect form scanned the
    events fact FOUR times (two distinct arms, each consumed by an
    anti/semi join) and paid four aggregation exchanges; per-user
    max(is_click)/max(is_purchase) flags over one IN-pruned scan decide
    both segments in a single shuffle. NULL user_ids group exactly as
    the set ops' null-safe equality did. The oracle keeps the literal
    EXCEPT/INTERSECT SQL, so the driver hash certifies the equivalence
    every round."""
    ev = load_table(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "click").alias("has_click"),
            F.max(F.col("event_type") == "purchase").alias("has_purchase"),
        )
    )
    return flags.filter(F.col("has_click")).select(
        "user_id",
        F.when(F.col("has_purchase"), F.lit("click_and_purchase"))
        .otherwise(F.lit("click_no_purchase"))
        .alias("segment"),
    )


def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type matrix via pivot (explicit value list keeps the
    output schema static — mandatory for a streaming-compatible plan and
    for skipping the extra value-discovery scan)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.floor(F.col("ts").cast("double") / 86400).cast("long")
    )
    return (
        ev.groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (the expand+two-phase plan) with the
    total row count alongside."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd 1%) — the sketch every
    100 TB cardinality query should use (the exact expand+two-phase
    distinct in q_distinct_users shuffles one row per distinct value; the
    HLL sketch shuffles a fixed ~KB register set per group).

    HLL++ register values are engine-specific, so the raw estimate can't
    be hash-compared against DuckDB. Instead this emits a BOUNDED oracle:
    the exact count (which DuckDB reproduces) plus ``hll_ok`` — the
    sketch landed within 3·rsd of exact (floor of 5 absolute for tiny
    groups, where HLL++ is exact-by-construction anyway). The oracle
    emits the same exact columns with ``TRUE``, so the driver's hash
    verdict certifies the sketch's error bound, not just row counts.
    In production only the sketch runs; the exact twin here exists to
    power the bound check."""
    ev = load_table(spark, sf_dir, "events")
    tol = F.greatest(F.lit(3 * 0.01) * F.col("exact_users"), F.lit(5.0))
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (F.abs(F.col("approx_users") - F.col("exact_users")) <= tol).alias("hll_ok"),
        )
    )


def q_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregates per event type: min/max/avg/sample
    stddev+variance — the describe() family as an oracle-checked query
    (moments rounded to 6 dp; Spark and DuckDB both use the textbook
    sample formulas, drift lives far below 1e-6). Non-finite readings
    are nullified before the moments (functions/numeric.py contract —
    Spark would otherwise propagate avg=inf/stddev=NaN while DuckDB's
    STDDEV_SAMP overflows outright; round-10 edge-corpus audit). ``n``
    stays the ROW count: the event happened, its reading is unusable."""
    from ..functions.numeric import finite_or_null

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", finite_or_null(F.col("value"))
    )
    return ev.groupBy("event_type").agg(
        F.round(F.min("v"), 6).alias("v_min"),
        F.round(F.max("v"), 6).alias("v_max"),
        F.round(F.avg("v"), 6).alias("v_avg"),
        F.round(F.stddev_samp("v"), 6).alias("v_stddev"),
        F.round(F.var_samp("v"), 6).alias("v_var"),
        F.count(F.lit(1)).alias("n"),
    )


RELATIONAL_QUERIES = {
    "q_asof_last_error": q_asof_last_error,
    "q_approx_distinct_users": q_approx_distinct_users,
    "q_value_stats": q_value_stats,
    "q_rollup_counts": q_rollup_counts,
    "q_user_top_orders": q_user_top_orders,
    "q_user_segments": q_user_segments,
    "q_pivot_daily": q_pivot_daily,
    "q_distinct_users": q_distinct_users,
}

_PIVOT_COLS = ",\n       ".join(
    f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS \"{t}\"" for t in EVENT_TYPES
)

RELATIONAL_ORACLES = {
    # independent algorithm: DuckDB's native ASOF JOIN (strict backward).
    # NULL-time contract (operators/asof.py): undated rows join nothing
    # on either side. SQL inequality semantics give that for free EXCEPT
    # inside DuckDB's sort-based ASOF operator, which treats a NULL
    # probe key as +inf and matches it to the user's LATEST error
    # (caught by the round-10 gate-SF NULL-corpus audit: one undated
    # click by a user with error history drew the last error instead of
    # the no-match -1) — so undated probes route AROUND the ASOF join
    # and undated observations are filtered out of the build side.
    "q_asof_last_error": """
WITH ev AS (SELECT event_id, user_id, epoch(ts) AS ts_s FROM events),
err AS (SELECT user_id, epoch(ts) AS err_ts FROM events
        WHERE event_type = 'error' AND ts IS NOT NULL),
dated AS (SELECT * FROM ev WHERE ts_s IS NOT NULL)
SELECT dated.event_id, dated.user_id,
       CAST(floor(dated.ts_s) AS BIGINT) AS ts_sec,
       CAST(coalesce(floor(err.err_ts), -1) AS BIGINT) AS last_error_sec
FROM dated ASOF LEFT JOIN err
  ON dated.user_id = err.user_id AND dated.ts_s > err.err_ts
UNION ALL
SELECT event_id, user_id,
       CAST(floor(ts_s) AS BIGINT) AS ts_sec,
       CAST(-1 AS BIGINT) AS last_error_sec
FROM ev WHERE ts_s IS NULL
""",
    "q_rollup_counts": """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, -1) AS day,
       grouping(event_type) * 2 + grouping(day) AS gid,
       count(*) AS n
FROM (SELECT event_type, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day FROM events)
GROUP BY ROLLUP(event_type, day)
-- empty-input contract (round 11, caught by the empty-corpus audit):
-- Spark's ROLLUP/CUBE/GROUPING SETS emit ZERO rows on zero input rows
-- (the () super-aggregate is expanded into an ordinary groupBy, so no
-- groups exist), while standard SQL — and DuckDB — emit the
-- grand-total row with count 0. The engine's contract is Spark's
-- no-data-no-rows cold-start semantics; every REAL group has n >= 1,
-- so this filter is exact on non-empty input
HAVING count(*) > 0
""",
    "q_user_top_orders": """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 2
""",
    "q_user_segments": """
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT user_id, 'click_no_purchase' AS segment FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
UNION ALL
SELECT user_id, 'click_and_purchase' AS segment FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
""",
    "q_pivot_daily": f"""
SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
       {_PIVOT_COLS}
FROM events
GROUP BY 1
""",
    "q_distinct_users": """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
""",
    # bounded oracle: exact columns reproduced in SQL, TRUE for the bound
    # flag — hash matches iff Spark's HLL estimate met its error bound
    "q_approx_distinct_users": """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       TRUE AS hll_ok
FROM events
GROUP BY event_type
""",
    # non-finite contract (functions/numeric.py): the CASE twin of the
    # Spark side's finite_or_null; count(*) keeps counting rows
    "q_value_stats": """
SELECT event_type,
       round(min(v), 6) AS v_min,
       round(max(v), 6) AS v_max,
       round(avg(v), 6) AS v_avg,
       round(stddev_samp(v), 6) AS v_stddev,
       round(var_samp(v), 6) AS v_var,
       count(*) AS n
FROM (SELECT event_type, CASE WHEN isfinite(value) THEN value END AS v
      FROM events)
GROUP BY event_type
""",
}
