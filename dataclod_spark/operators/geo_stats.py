"""GeoStatistics accumulator — geometry-column analysis aggregate.

Spark-first re-expression of the reference's ``AnalyzeAccumulator`` /
``GeoStatistics`` (``spatial/src/geometry/analyze.rs:21-120``,
``statistics.rs``): per geometry it captures size-in-bytes, point count,
type class (puntal/lineal/polygonal/collection) and bbox, then aggregates
totals + the envelope union over the column.

Plan shape: one Arrow-batched pandas UDF projects the per-geometry summary
struct (the only Python step — same cost class as any geometry decode),
then a plain JVM ``agg`` of sums/min/max produces the statistics row.
Partial (map-side) aggregation applies, so at 100 TB the shuffle is one
row per task.  The reference accumulates per-partition then merges
(``Accumulator::merge_batch``) — Spark's two-phase agg is the same shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("size_bytes", T.LongType()),
        T.StructField("point_count", T.LongType()),
        T.StructField("puntal", T.IntegerType()),
        T.StructField("lineal", T.IntegerType()),
        T.StructField("polygonal", T.IntegerType()),
        T.StructField("collection", T.IntegerType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


def _count_points(g) -> int:
    from dataclod_spark.geo import core as GC

    if g.kind == GC.POINT:
        return 0 if g.data is None else 1
    if g.kind == GC.MULTIPOINT:
        return len(g.data)
    if g.kind == GC.LINESTRING:
        return len(g.data)
    if g.kind == GC.MULTILINESTRING:
        return sum(len(p) for p in g.data)
    if g.kind == GC.POLYGON:
        return sum(len(r) for r in g.data)
    if g.kind == GC.MULTIPOLYGON:
        return sum(len(r) for p in g.data for r in p)
    return sum(_count_points(c) for c in g.data)  # collection


@pandas_udf(_SUMMARY_SCHEMA)
def _analyze_udf(wkb: pd.Series) -> pd.DataFrame:
    """analyze_geometry (analyze.rs:38-87) over one Arrow batch."""
    from dataclod_spark.geo import core as GC
    from dataclod_spark.geo.algos import bounds

    out = {k: [] for k in _SUMMARY_SCHEMA.fieldNames()}
    for b in wkb:
        if b is None:
            for k in out:
                out[k].append(None)
            continue
        try:
            g = GC.wkb_parse(bytes(b))
            bb = bounds(g)
        except Exception:
            for k in out:
                out[k].append(None)
            continue
        out["size_bytes"].append(len(b))
        out["point_count"].append(_count_points(g))
        out["puntal"].append(int(g.kind in (GC.POINT, GC.MULTIPOINT)))
        out["lineal"].append(int(g.kind in (GC.LINESTRING, GC.MULTILINESTRING)))
        out["polygonal"].append(int(g.kind in (GC.POLYGON, GC.MULTIPOLYGON)))
        out["collection"].append(int(g.kind == GC.GEOMETRYCOLLECTION))
        if bb is None:
            out["xmin"].append(None)
            out["ymin"].append(None)
            out["xmax"].append(None)
            out["ymax"].append(None)
        else:
            out["xmin"].append(bb[0])
            out["ymin"].append(bb[1])
            out["xmax"].append(bb[2])
            out["ymax"].append(bb[3])
    return pd.DataFrame(out)


def geometry_statistics(df: DataFrame, geom: str | Column) -> DataFrame:
    """Aggregate GeoStatistics over a WKB geometry column → one row:

    ``total_geometries, total_size_bytes, total_points, puntal_count,
    lineal_count, polygonal_count, collection_count, xmin, ymin, xmax,
    ymax`` (envelope union; NULL geometries are counted out, matching the
    accumulator skipping null inputs).
    """
    col = F.col(geom) if isinstance(geom, str) else geom
    a = df.select(_analyze_udf(col).alias("a")).select("a.*")
    return a.agg(
        F.count("size_bytes").alias("total_geometries"),
        F.sum("size_bytes").alias("total_size_bytes"),
        F.sum("point_count").alias("total_points"),
        F.sum("puntal").cast("bigint").alias("puntal_count"),
        F.sum("lineal").cast("bigint").alias("lineal_count"),
        F.sum("polygonal").cast("bigint").alias("polygonal_count"),
        F.sum("collection").cast("bigint").alias("collection_count"),
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
    )
