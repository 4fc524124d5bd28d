"""Sources: testdata loader, canonical samples relation, streaming readers."""

from numalogic_prometheus_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from numalogic_prometheus_spark.sources.samples import samples_relation

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "samples_relation",
]
