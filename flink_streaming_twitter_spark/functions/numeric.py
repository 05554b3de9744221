"""Numeric edge-value helpers.

The engine's non-finite contract (round 10, extending the round-9 NULL
contracts): a NaN/±inf measurement is an unusable reading and takes
part in NO aggregate — exactly how the sink already treats non-finite
fields ("no measurement, same as null", streaming/sinks.py) and how SQL
aggregates treat NULL. Real 100 TB corpora contain them (sensor
glitches, overflowed upstream arithmetic, bad float parses), and the
two engines disagree on what happens otherwise: Spark propagates
(avg=inf, stddev=NaN) while DuckDB CRASHES on a decimal cast of NaN and
overflows STDDEV_SAMP on inf — caught by the round-10 edge-corpus
audit. Nullifying at the measure-ingestion point makes both engines
agree by construction and keeps row counts (count(*)) intact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_POS_INF = float("inf")
_NEG_INF = float("-inf")


def finite_or_null(col: Column) -> Column:
    """``col`` if finite, NULL for NaN/±inf (NULL stays NULL).

    The DuckDB-oracle twin is ``CASE WHEN isfinite(x) THEN x END``.
    Composes into filters too: ``finite_or_null(norm) > 0`` is the
    one-predicate scorable test — NULL, NaN, ±inf, and zero all fail it
    (NULL/nullified values compare NULL, which filters drop).
    """
    return F.when(
        F.isnan(col) | (col == F.lit(_POS_INF)) | (col == F.lit(_NEG_INF)),
        F.lit(None),
    ).otherwise(col)
