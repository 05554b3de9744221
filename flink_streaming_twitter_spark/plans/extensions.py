"""Extension query surface: large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, session
windows). Filled in operator-by-operator; each entry here has a matching
oracle in extension_oracles()."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def extension_queries() -> dict[str, QueryFn]:
    return {}


def extension_oracles() -> dict[str, str]:
    return {}
