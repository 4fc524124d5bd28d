"""Column-level helper functions (portable hashing, vector math, text)."""

from numalogic_prometheus_spark.functions.hashing import hash32, hash32_seeded
from numalogic_prometheus_spark.functions.timeutil import epoch_us
from numalogic_prometheus_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    to_double_array,
)

__all__ = [
    "epoch_us",
    "hash32",
    "hash32_seeded",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "to_double_array",
]
