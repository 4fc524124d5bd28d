"""Vector math over array<float> embedding columns — pure built-in
expressions (F.zip_with / F.aggregate), JVM-side, no UDFs.

Floats are widened to double before arithmetic so Spark and the DuckDB
oracle (`embedding::DOUBLE[]`) see identical inputs; at dim ≲ a few
hundred, summation-order noise is ≪ the 6dp round used by the queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
