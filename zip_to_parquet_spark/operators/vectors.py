"""Vector math over ``array<float>`` embedding columns.

Catalyst-only building blocks (`zip_with` + `aggregate` — codegen'd, no
Python in the row path) for exact cosine similarity, plus a fixed-seed
random-hyperplane signature UDF (Arrow-batched numpy matmul — the one place
vectorized Python genuinely beats 64 nested aggregate expressions).
"""

# NOTE: no `from __future__ import annotations` here — it would stringify
# the pandas-UDF type hints, which pandas_udf cannot resolve at runtime.

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "hyperplane_signature_udf",
    "hyperplane_multitable_udf",
]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ, sequential left-to-right — the same evaluation order DuckDB
    uses, so doubles match bit-for-bit in oracle comparisons."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm.

    ``try_divide`` instead of ``/``: Spark 4 runs ANSI mode, where plain
    0.0/0.0 raises DIVIDE_BY_ZERO — an all-zero embedding (padding rows,
    failed encoders) would abort the whole job. NULL similarity then falls
    out of ``>= threshold`` filters and of ``ORDER BY sim DESC`` top-k
    (Spark sorts NULL last on DESC), which is the semantics we want:
    zero vectors are similar to nothing, not similar to everything.
    """
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Returns a pandas UDF mapping array<float> → bigint LSH signature.

    Fixed-seed Gaussian hyperplanes; bit i = sign(v · pᵢ). One numpy matmul
    per Arrow batch — at 100 TB this runs embarrassingly parallel per
    partition with no shuffle; the signature then drives a cheap
    groupBy-bucket instead of an O(n²) cross join.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if n_planes > 63:
        raise ValueError("signature must fit a signed 64-bit integer")

    @pandas_udf("long")
    def signature(v: pd.Series) -> pd.Series:
        planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
        mat = np.vstack(v.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return signature


def hyperplane_multitable_udf(
    dim: int, n_planes: int = 8, n_tables: int = 8, seed: int = 42
):
    """array<float> → array<long>: one hyperplane-LSH bucket per hash table.

    OR-amplification: a single n_planes-bit table only catches pairs at
    angle θ with probability (1-θ/π)^n_planes — near zero for the moderate
    similarities that dominate top-k neighbors. L independent tables lift
    recall to 1-(1-p)^L at the cost of L bucket keys per vector (explode →
    equi-join per (table, bucket), still no cross join). One numpy matmul
    computes all L×n_planes projections per Arrow batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if n_planes > 63:
        raise ValueError("bucket must fit a signed 64-bit integer")

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        planes = np.random.RandomState(seed).standard_normal(
            (dim, n_tables * n_planes)
        )
        mat = np.vstack(v.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, tables*planes)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(list((bits @ weights).astype(np.int64)))

    return buckets
