"""Spatial function library registration — SURVEY.md §2.A.3 (57 ST_* UDFs).

Placeholder hook: the geometry core (``dataclod_spark.geo``) and the pandas
UDF wrappers land in the spatial milestone; ``EngineSession`` calls this at
construction mirroring the reference's registration order
(``spatial/src/function/mod.rs:27-85``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_spatial_functions(spark: SparkSession) -> None:
    if getattr(spark, "_dataclod_spatial_fns_registered", False):
        return
    try:
        from dataclod_spark.functions import spatial_udfs
    except ImportError:
        return
    spark._dataclod_spatial_fns_registered = True
    spatial_udfs.register_all(spark)
    # internal helper for the SQL-path spatial join dispatch
    # (plans/spatial_dispatch.py): bbox struct per geometry, Arrow-batched
    from dataclod_spark.operators.spatial_join import _bbox_udf

    spark.udf.register("__st_bbox", _bbox_udf)
