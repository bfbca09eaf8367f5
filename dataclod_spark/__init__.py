"""dataclod_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the dataclod/dataclod reference engine.

The standard relational surface (scans, filters, joins, aggregation, window
functions, set ops, subqueries — SURVEY.md §2.B) rides directly on Spark
SQL / Catalyst.  The custom surface (spatial functions + spatial join,
pg_catalog emulation, federated scans, pg-compat SQL shims — SURVEY.md §2.A)
is implemented natively in this package, plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).
"""

from dataclod_spark.session import EngineSession, get_spark

__all__ = ["EngineSession", "get_spark"]
__version__ = "0.1.0"
