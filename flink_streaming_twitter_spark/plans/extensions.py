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
    # checks the first 50 queries() entries (8 reference + first 42
    # here), so families that still need a CORRECTNESS row come first
    # (round 1 checked only the first 50 and left textops/misc/pipeline/
    # relational unverified — VERDICT.md §"What's missing" item 1). The
    # TPC-H shapes, all hash-green in round 1, rotate to the tail; dict
    # update keeps first-insertion position, so re-adding
    # tpch_q12_late_shipments with TPCH_EXTRA_QUERIES is a no-op.
    q: dict[str, QueryFn] = {}
    q.update(TEXTOPS_QUERIES)
    q.update(MISC_QUERIES)
    q.update(PIPELINE_QUERIES)
    q.update(RELATIONAL_QUERIES)
    # round-1 hash-fail (oracle HUGEINT artifact, now CAST AS BIGINT):
    # pulled forward so the fixed oracle gets re-verified
    q["tpch_q12_late_shipments"] = TPCH_EXTRA_QUERIES["tpch_q12_late_shipments"]
    q.update(DEDUP_QUERIES)
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
