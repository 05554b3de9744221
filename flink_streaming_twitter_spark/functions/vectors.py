"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with / aggregate), no UDF, so the hot path of
similarity search stays JVM-side and codegen-compiled.

All arithmetic is done in DOUBLE regardless of the storage type (the test
embeddings are float32 parquet): float→double widening is exact and
deterministic, and summation runs left-to-right inside a single row, so the
same value is produced by any engine that walks the array in order. Results
the oracle compares are rounded to 6 decimals to absorb engine-level
summation-order differences (measure-zero boundary risk).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def make_cosine_pandas_udf():
    """Arrow-batched alternative to the HOF ``cosine_sim`` — the
    documented fallback when per-row expression interpretation becomes the
    bottleneck (HOF lambdas are NOT codegen'd; at thousands of dims the
    numpy batch path wins despite the Python hop). Returns a pandas_udf
    (array<float>, array<float>) -> double computing the same
    double-precision cosine; tests assert equality with the HOF path to
    6 decimals. Built lazily so importing this module never requires
    pandas/pyarrow."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def cosine_pd(a, b):
        am = np.stack(a.to_numpy()).astype("float64")
        bm = np.stack(b.to_numpy()).astype("float64")
        dots = (am * bm).sum(axis=1)
        norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(dots / norms)

    # set hints as live objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference cannot resolve
    cosine_pd.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(cosine_pd, "double")
