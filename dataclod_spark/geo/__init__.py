"""Pure-Python computational-geometry core for the spatial surface.

The reference implements its spatial library over GEOS/TG/geo-rs native
backends (``spatial/src/function/udfs.rs``); this container has no shapely/
GEOS, so the geometry model, (E)WKT/(E)WKB/GeoJSON serialization, measures,
predicates and constructive operations are implemented here in pure Python.
The pandas-UDF layer in ``dataclod_spark.functions.spatial_udfs`` vectorizes
over these per batch.

Output formatting (WKT number formatting, MULTIPOINT parenthesization,
``POINT EMPTY`` forms, GeoJSON float rendering) matches the reference's
golden corpus ``src/sqllogictest/test_files/spatial_udf.slt``.
"""

from dataclod_spark.geo.core import (
    Geometry,
    geojson_parse,
    geojson_write,
    wkb_parse,
    wkb_write,
    wkt_parse,
    wkt_write,
)

__all__ = [
    "Geometry",
    "wkt_parse",
    "wkt_write",
    "wkb_parse",
    "wkb_write",
    "geojson_parse",
    "geojson_write",
]
