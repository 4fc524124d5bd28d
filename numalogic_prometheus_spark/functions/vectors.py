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


# Tiebreak modulus for the IVF cell-assignment argmin key. The distance
# bucket round((1-cos)*1e6) is ≤ 2e6, so bucket*MOD + cent_id ≤ ~2.0e15:
# exact in BIGINT on both engines (and still below 2^53 if a double ever
# carries it). cent_id must stay < MOD or the id bleeds into the
# distance component and the "tiebreak" silently stops being one —
# cell_argmin_key raises per-row rather than mis-assign (ADVICE r9).
TIEBREAK_MOD = 1_000_000_000


def cell_argmin_key(v, nv, cv, nc, cent_id) -> Column:
    """Composite argmin key for nearest-centroid assignment: rounded
    cosine distance in 1e-6 units, centroid id as the tiebreak. Norms
    are taken as bound columns (hoisted once per row) so the hot N×C
    expansion runs a single array pass (the dot product)."""
    dist = 1 - dot_product(v, cv) / (nv * nc)
    bucket = F.round(dist * 1000000, 0).cast("long")
    return F.when(
        cent_id < F.lit(TIEBREAK_MOD), bucket * F.lit(TIEBREAK_MOD) + cent_id
    ).otherwise(
        F.raise_error(
            F.format_string(
                "cent_id %d >= tiebreak modulus %d", cent_id, F.lit(TIEBREAK_MOD)
            )
        ).cast("long")
    )
