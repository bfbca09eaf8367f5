"""Partitioned build/probe spatial join — SURVEY.md §2.A.1 / §7 Phase 4.

Re-expresses the reference's out-of-core SpatialJoinExec
(``spatial/src/join/exec.rs:32-131``: build-side R-tree index, grid/KDB
spatial partitioning, candidate refinement, outer-join completion) in
Spark's execution model:

1. **bbox projection** (≈ OperandEvaluator, ``operand_evaluator.rs:23-66``):
   one Arrow-batched pandas UDF adds (xmin,ymin,xmax,ymax) per geometry —
   the only Python touch before refinement.
2. **Equi-depth grid partitioner** (≈ KDB partitioner
   ``partitioning/kdb.rs:378-393``): a seeded 1% bbox sample (10k max /
   1k min, mirroring ``option.rs:60-70``'s reservoir sampler) drives
   per-axis quantile boundaries, so skewed extents still give balanced
   cells (the KDB tree's axis-alternating median splits give the same
   marginal balancing).  Boundaries broadcast as plan literals; cell
   lookup is a pure-JVM count-of-boundaries-≤-coordinate expression.
3. **Cell assignment** (≈ partition contract ``partitioning/mod.rs:42-77``):
   BOTH sides explode to every grid cell their bbox intersects — pure JVM
   ``sequence``/``explode`` arithmetic, no Python.  (The reference assigns
   build-side rows to exactly one partition and handles probe Multi-cells
   with dedup bitmaps; with a shuffle-based engine the symmetric-explode +
   reference-point scheme below is equivalent and needs no shared state.)
4. **Cell equi-join + bbox filter**: the shuffle is on the cell id; Catalyst
   plans a hash join with the bbox range condition applied in codegen.
5. **Reference-point dedup** (replaces the Multi-cell visited bitmaps,
   ``stream.rs:82-86``): a candidate pair is emitted only in the cell that
   contains the top-left corner of the bbox intersection — each pair
   survives exactly once, with no distinct/shuffle.
6. **Exact refinement** (≈ ``refine/{geo,geos,tg}.rs``): one pandas UDF
   evaluates the exact predicate on candidate WKB pairs.
7. **Outer-join completion** (≈ ``stream.rs`` final emission): unmatched
   rows are recovered with anti-joins on row ids and unioned in.

Scale: the only shuffles are (a) the cell-id hash join and (b) outer-join
anti-joins; skewed cells are split by AQE skew-join handling.  Candidate
refinement is Arrow-batched.  At 100 TB the grid is sized from the sample so
that one cell's build rows fit an executor; heavily skewed data can lower
``cell_target`` (finer grid) without touching the plan shape.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dataclod_spark.geo import core as GC
from dataclod_spark.geo import predicates as GP

# mirrors the reference's bbox sampler bounds (option.rs:60-70):
# 1% target rate, bounded to [1k, 10k] samples, deterministic seed
MAX_BBOX_SAMPLES = 10_000
MIN_BBOX_SAMPLES = 1_000
BBOX_SAMPLE_RATE = 0.01
SAMPLE_SEED = 42

PREDICATES = {
    "intersects": GP.intersects,
    "contains": GP.contains,
    "within": GP.within,
    "covers": GP.covers,
    "covered_by": GP.covered_by,
    "touches": GP.touches,
    "overlaps": GP.overlaps,
    "equals": GP.equals,
}

_BBOX_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        # geometry equals its own bbox (point / axis-aligned rectangle):
        # for such pairs the JVM bbox join condition IS the exact intersects
        # predicate and Python refinement can be skipped entirely
        T.StructField("bbox_exact", T.BooleanType()),
    ]
)


@pandas_udf(_BBOX_SCHEMA)
def _bbox_udf(wkb: pd.Series) -> pd.DataFrame:
    import numpy as np

    from dataclod_spark.geo.algos import bounds

    vals = wkb.to_numpy()
    n = len(vals)
    # vectorized fast path: homogeneous little-endian WKB/EWKB points are
    # fixed-width (21 bytes, 25 with the SRID flag) — decode the whole batch
    # with one frombuffer instead of n Python parses.
    if n and all(v is not None and len(v) in (21, 25) for v in vals):
        width = len(vals[0])
        if all(len(v) == width and v[0] == 1 for v in vals):
            buf = b"".join(bytes(v) for v in vals)
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, width)
            code = arr[:, 1:5].copy().view("<u4")[:, 0]
            plain = (code == 1).all() if width == 21 else ((code & 0x20000000) != 0).all()
            if plain:
                xy = arr[:, width - 16 :].copy().view("<f8")
                x, y = xy[:, 0], xy[:, 1]
                ok = ~(np.isnan(x) | np.isnan(y))
                return pd.DataFrame(
                    {
                        "xmin": np.where(ok, x, np.nan),
                        "ymin": np.where(ok, y, np.nan),
                        "xmax": np.where(ok, x, np.nan),
                        "ymax": np.where(ok, y, np.nan),
                        "bbox_exact": ok,
                    }
                )
    out = {"xmin": [], "ymin": [], "xmax": [], "ymax": [], "bbox_exact": []}
    cache: dict[bytes, tuple] = {}
    for b in vals:
        bb = None
        exact = False
        if b is not None:
            key = bytes(b)
            if key in cache:
                bb, exact = cache[key]
            else:
                try:
                    g = GC.wkb_parse(key)
                    bb = bounds(g)
                    exact = g.kind == GC.POINT or _axis_rect(g) is not None
                except Exception:
                    bb = None
                cache[key] = (bb, exact)
        if bb is None:
            out["xmin"].append(None)
            out["ymin"].append(None)
            out["xmax"].append(None)
            out["ymax"].append(None)
            out["bbox_exact"].append(False)
        else:
            out["xmin"].append(bb[0])
            out["ymin"].append(bb[1])
            out["xmax"].append(bb[2])
            out["ymax"].append(bb[3])
            out["bbox_exact"].append(exact)
    return pd.DataFrame(out)


def _axis_rect(g: GC.Geometry):
    """(xmin,ymin,xmax,ymax) if g is an axis-aligned rectangle polygon."""
    if g.kind != GC.POLYGON or len(g.data) != 1:
        return None
    ring = g.data[0]
    if len(ring) != 5 or ring[0] != ring[-1]:
        return None
    xs = {p[0] for p in ring}
    ys = {p[1] for p in ring}
    if len(xs) != 2 or len(ys) != 2:
        return None
    return (min(xs), min(ys), max(xs), max(ys))


def _refine_udf(predicate: str, distance: Optional[float]):
    pred_fn = None if predicate == "dwithin" else PREDICATES[predicate]

    @pandas_udf(T.BooleanType())
    def refine(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
        import numpy as np

        from dataclod_spark.geo.predicates import dwithin

        # build-side geometries repeat across many candidate pairs — parse
        # each distinct blob once per batch (≈ the reference's prepared-
        # geometry caching, refine/geos.rs)
        cache: dict[bytes, GC.Geometry] = {}
        rect_cache: dict[bytes, tuple | None] = {}

        # fully vectorized path: homogeneous point-WKB probe batch against
        # axis-aligned rectangles, intersects predicate
        if predicate == "intersects":
            vals1 = wkb1.to_numpy()
            n = len(vals1)
            if n and all(v is not None and len(v) == 21 and v[0] == 1 for v in vals1):
                buf = b"".join(bytes(v) for v in vals1)
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, 21)
                if (arr[:, 1:5].copy().view("<u4")[:, 0] == 1).all():
                    xy = arr[:, 5:21].copy().view("<f8")
                    rects = np.empty((n, 4), dtype="f8")
                    general_rows = []
                    for i, b2 in enumerate(wkb2.to_numpy()):
                        key = bytes(b2)
                        if key not in rect_cache:
                            try:
                                g2 = GC.wkb_parse(key)
                                cache[key] = g2
                                rect_cache[key] = _axis_rect(g2)
                            except Exception:
                                rect_cache[key] = None
                        rect = rect_cache[key]
                        if rect is None:
                            general_rows.append(i)
                            rects[i] = (1.0, 1.0, 0.0, 0.0)  # never matches
                        else:
                            rects[i] = rect
                    res_arr = (
                        (rects[:, 0] <= xy[:, 0])
                        & (xy[:, 0] <= rects[:, 2])
                        & (rects[:, 1] <= xy[:, 1])
                        & (xy[:, 1] <= rects[:, 3])
                    )
                    if general_rows:
                        from dataclod_spark.geo.predicates import intersects as gen_int

                        for i in general_rows:
                            try:
                                g1 = GC.wkb_parse(bytes(vals1[i]))
                                g2 = cache.get(bytes(wkb2.iloc[i]))
                                if g2 is None:
                                    g2 = GC.wkb_parse(bytes(wkb2.iloc[i]))
                                res_arr[i] = bool(gen_int(g1, g2))
                            except Exception:
                                res_arr[i] = False
                    return pd.Series(res_arr)

        def parse(b) -> GC.Geometry:
            key = bytes(b)
            g = cache.get(key)
            if g is None:
                g = GC.wkb_parse(key)
                cache[key] = g
                rect_cache[key] = _axis_rect(g)
            return g

        res = []
        for b1, b2 in zip(wkb1, wkb2):
            try:
                g1 = parse(b1)
                g2 = parse(b2)
                if pred_fn is None:
                    res.append(bool(dwithin(g1, g2, distance)))
                    continue
                # point × axis-aligned rectangle: intersects ≡ closed bbox
                # test (boundary inclusive on both sides) — skip the general
                # predicate machinery for the dominant point-in-box workload
                if predicate == "intersects" and g1.kind == GC.POINT and g1.data is not None:
                    rect = rect_cache.get(bytes(b2))
                    if rect is not None:
                        x, y = g1.data
                        res.append(rect[0] <= x <= rect[2] and rect[1] <= y <= rect[3])
                        continue
                res.append(bool(pred_fn(g1, g2)))
            except Exception:
                res.append(False)
        return pd.Series(res)

    return refine


@pandas_udf(T.BinaryType())
def point_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    """Vectorized WKB point constructor (little-endian, 21 bytes/row)."""
    import numpy as np

    n = len(x)
    arr = np.zeros((n, 21), dtype=np.uint8)
    arr[:, 0] = 1
    arr[:, 1:5] = np.frombuffer(np.uint32(1).tobytes() * n, dtype=np.uint8).reshape(n, 4)
    arr[:, 5:13] = x.to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
    arr[:, 13:21] = y.to_numpy(dtype="<f8").view(np.uint8).reshape(n, 8)
    return pd.Series(list(arr.tobytes()[i * 21 : (i + 1) * 21] for i in range(n)))


@pandas_udf(T.BinaryType())
def envelope_wkb(x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series) -> pd.Series:
    """Vectorized WKB rectangle constructor (ST_MakeEnvelope ring order)."""
    import numpy as np
    import struct

    out = []
    hdr = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", 1) + struct.pack("<I", 5)
    for a, b, c, d in zip(
        x1.to_numpy(dtype="f8"),
        y1.to_numpy(dtype="f8"),
        x2.to_numpy(dtype="f8"),
        y2.to_numpy(dtype="f8"),
    ):
        out.append(
            hdr + struct.pack("<10d", a, b, a, d, c, d, c, b, a, b)
        )
    return pd.Series(out)


def with_bbox(df: DataFrame, geom_col: str, prefix: str) -> DataFrame:
    """Add {prefix}xmin..{prefix}ymax bbox columns for a WKB geometry column."""
    b = _bbox_udf(F.col(geom_col))
    return (
        df.withColumn("__bb", b)
        .select(
            "*",
            F.col("__bb.xmin").alias(f"{prefix}xmin"),
            F.col("__bb.ymin").alias(f"{prefix}ymin"),
            F.col("__bb.xmax").alias(f"{prefix}xmax"),
            F.col("__bb.ymax").alias(f"{prefix}ymax"),
            F.col("__bb.bbox_exact").alias(f"{prefix}exact"),
        )
        .drop("__bb")
    )


class _Grid:
    """Equi-depth (quantile) grid from a bbox sample.

    ≈ the KDB partitioner's contract (balanced leaf regions from a bbox
    sample, ``partitioning/kdb.rs:378-393``): per-axis boundaries are
    placed at sample quantiles of the bbox centers, so a skewed extent
    (data clustered in one corner) still yields cells with ~equal row
    counts — the same marginal balancing the KDB tree's axis-alternating
    median splits provide.  Cells are open-ended at the extent borders
    (first/last cell extend to ±inf), so out-of-sample rows always land in
    a cell (partition contract: rows are never dropped —
    ``partitioning/mod.rs:42-77``).
    """

    def __init__(self, samples: list[tuple[float, float, float, float]], cell_target: int):
        n = max(1, int(math.sqrt(cell_target)))
        cx = sorted((s[0] + s[2]) / 2.0 for s in samples)
        cy = sorted((s[1] + s[3]) / 2.0 for s in samples)
        self.xb = self._quantile_bounds(cx, n)
        self.yb = self._quantile_bounds(cy, n)
        self.nx = len(self.xb) + 1
        self.ny = len(self.yb) + 1

    @staticmethod
    def _quantile_bounds(sorted_vals: list[float], n: int) -> list[float]:
        if not sorted_vals or n <= 1:
            return []
        m = len(sorted_vals)
        bounds: list[float] = []
        for i in range(1, n):
            v = sorted_vals[min(m - 1, (i * m) // n)]
            if not bounds or v > bounds[-1]:
                bounds.append(v)
        return bounds

    @staticmethod
    def _bucket(bounds: list[float], coord: Column) -> Column:
        """Index of the cell containing ``coord`` = #boundaries <= coord.

        Pure-JVM O(len(bounds)) fold inside codegen — no Python, no lookup
        table shuffle; bounds ride into the plan as a broadcast literal
        array (the Spark analogue of the reference broadcasting partition
        boundaries to every probe task).
        """
        if not bounds:
            return F.lit(0)
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(b <= coord, 1).otherwise(0),
        )

    def cells_expr(self, prefix: str, expand: float) -> Column:
        """Array of cell ids intersecting the (possibly expanded) bbox."""
        ix0 = self._bucket(self.xb, F.col(f"{prefix}xmin") - expand)
        ix1 = self._bucket(self.xb, F.col(f"{prefix}xmax") + expand)
        iy0 = self._bucket(self.yb, F.col(f"{prefix}ymin") - expand)
        iy1 = self._bucket(self.yb, F.col(f"{prefix}ymax") + expand)
        ny = self.ny
        xs = F.sequence(ix0, ix1)
        ys = F.sequence(iy0, iy1)
        return F.flatten(F.transform(xs, lambda ix: F.transform(ys, lambda iy: ix * ny + iy)))

    def ref_point_in_cell(self, expand: float) -> Column:
        """Reference-point dedup: emit the pair only in the cell holding the
        top-left corner of the (expanded) bbox intersection — each pair
        survives exactly once with no distinct/shuffle (replaces the
        reference's Multi-cell visited bitmaps, ``stream.rs:82-86``)."""
        rx = F.greatest(F.col("l_xmin") - expand, F.col("r_xmin"))
        ry = F.greatest(F.col("l_ymin") - expand, F.col("r_ymin"))
        cell = self._bucket(self.xb, rx) * self.ny + self._bucket(self.yb, ry)
        return cell == F.col("__cell")


def collect_bbox_sample(src: DataFrame, geom_col: str) -> list[tuple]:
    """Seeded 1% bbox sample, 10k cap / 1k min (≈ BoundingBoxSampler,
    ``join/utils/bbox_sampler.rs:61-88`` + ``option.rs:60-70``).

    Sampling happens on the raw geometry column, so the bbox UDF runs only
    over sampled rows; for small inputs (where 1% is under the minimum) the
    head of the data is used instead — at that size partition skew is moot.
    """
    base = src.select(F.col(geom_col).alias("__g")).dropna()
    samp = base.sample(fraction=BBOX_SAMPLE_RATE, seed=SAMPLE_SEED).limit(
        MAX_BBOX_SAMPLES
    )
    rows = (
        with_bbox(samp, "__g", "s_")
        .select("s_xmin", "s_ymin", "s_xmax", "s_ymax")
        .dropna()
        .collect()
    )
    if len(rows) < MIN_BBOX_SAMPLES:
        rows = (
            with_bbox(base.limit(MAX_BBOX_SAMPLES), "__g", "s_")
            .select("s_xmin", "s_ymin", "s_xmax", "s_ymax")
            .dropna()
            .collect()
        )
    return [(row[0], row[1], row[2], row[3]) for row in rows]


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    left_geom: str = "geom",
    right_geom: str = "geom",
    how: str = "inner",
    distance: Optional[float] = None,
    cell_target: int = 1024,
) -> DataFrame:
    """Spatial join of two DataFrames with WKB geometry columns.

    predicate: intersects|contains|within|covers|covered_by|touches|
               overlaps|equals|dwithin (dwithin requires ``distance``).
    how: inner|left|right|full|left_semi|left_anti.

    Output: left columns + right columns (both sides' geometry included);
    for semi/anti only left columns.
    """
    if predicate == "dwithin" and distance is None:
        raise ValueError("dwithin requires distance=")
    expand = float(distance or 0.0)

    lcols = left.columns
    rcols = right.columns
    overlap = set(lcols) & set(rcols)
    right_renamed = right
    for c in overlap:
        right_renamed = right_renamed.withColumnRenamed(c, f"{c}_right")
    rcols_out = [c if c not in overlap else f"{c}_right" for c in rcols]
    rgeom = right_geom if right_geom not in overlap else f"{right_geom}_right"

    # Deterministic 128-bit row ids (two independent xxhash64 seeds over the
    # natural columns).  Unlike monotonically_increasing_id, these survive
    # partition recomputation, so the outer-join anti-joins below are exact
    # without pinning the inputs in cache (≈ the reference's positional
    # visited bitmaps, which are likewise recompute-stable).  Identical rows
    # share an id; that is correct here — twins match or miss identically.
    def _rowid(cols: list[str]) -> Column:
        return F.struct(
            F.xxhash64(*[F.col(c) for c in cols]).alias("h1"),
            F.xxhash64(F.lit(0x9E3779B9), *[F.col(c) for c in cols]).alias("h2"),
        )

    l = with_bbox(left, left_geom, "l_").withColumn("__lid", _rowid(lcols))
    r = with_bbox(right_renamed, rgeom, "r_").withColumn("__rid", _rowid(rcols_out))

    # grid from a seeded 1% sample of the right (build) side, 10k cap / 1k
    # min (option.rs:60-70); the bbox UDF runs only over the sampled rows.
    # Falls back to the left side if the right has no geometries.
    sample = collect_bbox_sample(right_renamed, rgeom) or collect_bbox_sample(
        left, left_geom
    ) or [(0.0, 0.0, 1.0, 1.0)]
    grid = _Grid(sample, cell_target)

    le = l.dropna(subset=["l_xmin"]).withColumn(
        "__cell", F.explode(grid.cells_expr("l_", expand))
    )
    re = r.dropna(subset=["r_xmin"]).withColumn(
        "__cell", F.explode(grid.cells_expr("r_", 0.0))
    )

    bbox_cond = (
        (F.col("l_xmin") - expand <= F.col("r_xmax"))
        & (F.col("r_xmin") <= F.col("l_xmax") + expand)
        & (F.col("l_ymin") - expand <= F.col("r_ymax"))
        & (F.col("r_ymin") <= F.col("l_ymax") + expand)
    )
    cand = le.join(re, "__cell").filter(bbox_cond).filter(grid.ref_point_in_cell(expand))

    refine = _refine_udf(predicate, distance)
    if predicate == "intersects":
        # pairs where both geometries equal their own bbox are already
        # exactly decided by the JVM bbox condition — no Python round-trip
        both_exact = F.col("l_exact") & F.col("r_exact")
        fast = cand.filter(both_exact)
        slow = cand.filter(~both_exact).filter(refine(F.col(left_geom), F.col(rgeom)))
        matched = fast.unionAll(slow)
    else:
        matched = cand.filter(refine(F.col(left_geom), F.col(rgeom)))

    bbox_helper = [
        c
        for c in matched.columns
        if c.startswith(("l_x", "l_y", "r_x", "r_y")) or c in ("l_exact", "r_exact")
    ]
    pairs = matched.drop("__cell", *bbox_helper)

    if how == "inner":
        return pairs.drop("__lid", "__rid")
    if how == "left_semi":
        keep = pairs.select("__lid").distinct()
        return l.join(keep, "__lid", "left_semi").select(*lcols)
    if how == "left_anti":
        keep = pairs.select("__lid").distinct()
        return l.join(keep, "__lid", "left_anti").select(*lcols)

    out_cols = lcols + rcols_out
    inner = pairs.select(*out_cols, "__lid", "__rid")
    if how in ("left", "full"):
        unmatched_l = l.join(inner.select("__lid").distinct(), "__lid", "left_anti")
        null_r = unmatched_l.select(
            *lcols, *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in rcols_out]
        )
    if how in ("right", "full"):
        unmatched_r = r.join(inner.select("__rid").distinct(), "__rid", "left_anti")
        null_l = unmatched_r.select(
            *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in lcols], *rcols_out
        )
    res = inner.drop("__lid", "__rid")
    if how == "left":
        return res.unionByName(null_r)
    if how == "right":
        return res.unionByName(null_l)
    if how == "full":
        return res.unionByName(null_r).unionByName(null_l)
    raise ValueError(f"unsupported how={how}")
