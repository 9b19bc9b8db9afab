"""Sparse/dense vector math as built-in higher-order functions.

The reference implements cosine similarity and squared Euclidean distance
over string-encoded sparse vectors in Java (``KMeans/task2_2.java:148-200``).
Here sparse vectors are ``map<int,double>`` columns and dense vectors are
``array<double>`` columns, and ALL the math is expressed with Spark's
higher-order functions (``map_zip_with``, ``zip_with``, ``aggregate``) —
JVM-side, no Python UDF in the hot path. At 100 TB this is the difference
between a codegen'd pipeline stage and an Arrow round-trip per batch.

Reference quirk replicated on request (SURVEY.md Q6): ``task2_2.java:179``
rounds cosine to 3 decimals *inside* the metric, which affects argmax
tie-breaks and convergence; ``map_cosine(..., round_dp=3)`` reproduces it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- sparse maps


def _sum_values(m: Column) -> Column:
    return F.aggregate(F.map_values(m), F.lit(0.0), lambda acc, v: acc + v)


def map_dot(a: Column, b: Column) -> Column:
    """Dot product over the key intersection (task2_2.java:156-166)."""
    prod = F.map_zip_with(a, b, lambda _, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0)))
    return _sum_values(prod)


def map_norm(a: Column) -> Column:
    """L2 norm of a sparse map vector."""
    return F.sqrt(F.aggregate(F.map_values(a), F.lit(0.0), lambda acc, v: acc + v * v))


def map_cosine(a: Column, b: Column, round_dp: int | None = None) -> Column:
    """Cosine similarity of two sparse maps; 0.0 when either norm is 0
    (task2_2.java:148-180). ``round_dp=3`` reproduces reference quirk Q6."""
    denom = map_norm(a) * map_norm(b)
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(map_dot(a, b) / denom)
    return F.round(cos, round_dp) if round_dp is not None else cos


def map_sum_squares(a: Column, b: Column) -> Column:
    """Squared Euclidean distance over the key union (task2_2.java:183-200):
    absent keys contribute the present value squared."""
    diff2 = F.map_zip_with(
        a, b, lambda _, x, y: (F.coalesce(x, F.lit(0.0)) - F.coalesce(y, F.lit(0.0))) ** F.lit(2.0)
    )
    return _sum_values(diff2)


# ---------------------------------------------------------------- dense arrays


def array_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def array_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def array_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of dense vectors; 0.0 on zero norm."""
    denom = array_norm(a) * array_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(array_dot(a, b) / denom)


def as_double_array(a: Column) -> Column:
    """Cast array<float> (e.g. parquet FLOAT[] embeddings) → array<double>
    so downstream math is double-precision and oracle-comparable."""
    return F.transform(a, lambda x: x.cast("double"))
