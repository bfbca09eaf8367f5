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

# adaptive grid sizing (≈ the reference choosing partition count from
# GeoStatistics during build collection, exec_mode_selector.rs /
# memory_plan.rs): aim for this many build rows per cell, bounded so the
# grid neither under-parallelizes nor explodes large bboxes across cells
TARGET_BUILD_ROWS_PER_CELL = 2048
MIN_AUTO_CELLS = 64
MAX_AUTO_CELLS = 65_536


def auto_cell_target(sample: list[tuple]) -> int:
    """Pick the grid cell budget from the bbox sample's GeoStatistics.

    Two constraints, both computed from the (≤11k-row) driver-side sample —
    no extra job over the data:

    * **row budget**: estimated build rows / TARGET_BUILD_ROWS_PER_CELL,
      clamped to [MIN_AUTO_CELLS, MAX_AUTO_CELLS] — more rows, finer grid
      (the sample size inverts the 1%/10k-cap sampling policy);
    * **explode budget**: a cell must not be smaller than the mean bbox,
      or every build row explodes into many cells (the reference's
      partitioner derives leaf extents from the same sampled boxes) —
      cells_x*cells_y is capped at (extent/mean_bbox) per axis, measured
      on the middle 98% of bbox centers so outliers don't inflate it.
    """
    n = len(sample)
    if not n:
        return 1024
    ws = [max(0.0, s[2] - s[0]) for s in sample]
    hs = [max(0.0, s[3] - s[1]) for s in sample]
    cxs = sorted((s[0] + s[2]) / 2.0 for s in sample)
    cys = sorted((s[1] + s[3]) / 2.0 for s in sample)
    lo, hi = int(0.01 * n), max(int(0.99 * n), 1)
    ext_w = max(cxs[hi - 1] - cxs[lo], 0.0)
    ext_h = max(cys[hi - 1] - cys[lo], 0.0)
    mean_w = sum(ws) / n
    mean_h = sum(hs) / n
    shape_cap = (ext_w / mean_w if mean_w > 0 else float("inf")) * (
        ext_h / mean_h if mean_h > 0 else float("inf")
    )
    est_rows = max(n, (n - MIN_BBOX_SAMPLES) / BBOX_SAMPLE_RATE)
    rows_cells = min(
        max(est_rows / TARGET_BUILD_ROWS_PER_CELL, MIN_AUTO_CELLS), MAX_AUTO_CELLS
    )
    return max(1, int(min(shape_cap, rows_cells)))

# Speculative refine-mode selection (refine/exec_mode_selector.rs:12-100 +
# the geo backend's selector, refine/geo.rs:23-47): distance predicates
# never prepare; relation predicates prepare when the sampled mean point
# count per probe geometry exceeds this threshold (geo.rs uses 50.0)
SPECULATIVE_MEAN_POINTS = 50.0


def select_exec_mode(predicate: str, mean_points: Optional[float]) -> str:
    """Pick the refinement execution mode from sampled GeoStatistics.

    ≈ ``GeoOptimalModeSelector::select`` (refine/geo.rs:23-40): ``dwithin``
    (the distance predicate) → ``"none"``; relation predicates → ``"none"``
    for simple geometries (mean points <= 50, where building prepared
    structures costs more than it saves) and ``"prepare"`` for complex ones.
    Unknown stats (no sample — e.g. bbox-exact column sides that never
    reach Python refinement) default to ``"none"``."""
    if predicate == "dwithin":
        return "none"
    if mean_points is None or mean_points <= SPECULATIVE_MEAN_POINTS:
        return "none"
    return "prepare"


_MEAN_POINTS_CACHE: dict[int, Optional[float]] = {}
_PLAN_MEMO_MAX = 32


def _plan_memoized(cache: dict, pool: DataFrame, compute):
    """Memoize ``compute()`` by the semantic hash of ``pool``'s plan, with
    bounded FIFO eviction — shared by the bbox grid sample and the
    exec-mode mean-points stats (both invalidated together by
    :func:`clear_bbox_sample_cache`; semanticHash does not see file
    rewrites at the same path)."""
    try:
        key: Optional[int] = pool.semanticHash()
    except Exception:
        key = None
    if key is not None and key in cache:
        return cache[key]
    out = compute()
    if key is not None:
        if len(cache) >= _PLAN_MEMO_MAX:
            cache.pop(next(iter(cache)))
        cache[key] = out
    return out


def collect_mean_points(src: DataFrame, geom_col: str) -> Optional[float]:
    """Sampled mean point count per geometry (``GeoStatistics.
    mean_points_per_geometry``, statistics.rs): the same seeded 1%/cap
    sample policy as the grid sample, analyzed by the geo_stats summary
    UDF and aggregated to one row — the Spark analogue of the reference
    analyzing the first ``min_required_count`` probe geometries
    (exec_mode_selector.rs:63-71).  Memoized per semantic plan like
    ``_cached_sample`` so rebuilding the same join doesn't re-run the
    sampling job."""
    from dataclod_spark.operators.geo_stats import geometry_statistics

    base = src.select(F.col(geom_col).alias("__g")).dropna()
    samp = base.sample(fraction=BBOX_SAMPLE_RATE, seed=SAMPLE_SEED).limit(
        MAX_BBOX_SAMPLES
    )
    pool = samp.unionAll(base.limit(MIN_BBOX_SAMPLES)).coalesce(1)

    def compute() -> Optional[float]:
        row = geometry_statistics(pool, "__g").collect()[0]
        if not row["total_geometries"]:
            return None
        return float(row["total_points"]) / float(row["total_geometries"])

    return _plan_memoized(_MEAN_POINTS_CACHE, pool, compute)


PREDICATES = {
    "intersects": GP.intersects,
    "contains": GP.contains,
    "within": GP.within,
    "covers": GP.covers,
    "covered_by": GP.covered_by,
    "touches": GP.touches,
    "overlaps": GP.overlaps,
    "equals": GP.equals,
    "crosses": GP.crosses,
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
def _bbox_udf_impl(wkb: pd.Series) -> pd.DataFrame:
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


# The bbox projection IS deterministic, but is declared nondeterministic so
# Catalyst never clones it: InferFiltersFromConstraints otherwise derives
# isnotnull(bbox.xmin) from the join's bbox conjuncts and pushes it below
# the exchange, re-running the whole Python bbox (and any upstream geometry
# constructor) a second time over every input row.  Nondeterministic
# expressions are a pushdown/substitution barrier, so the UDF runs exactly
# once per side.
_bbox_udf = _bbox_udf_impl.asNondeterministic()


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


def _refine_udf(predicate: str, distance: Optional[float], prepare: bool = False):
    pred_fn = None if predicate == "dwithin" else PREDICATES[predicate]

    @pandas_udf(T.BooleanType())
    def refine(wkb1: pd.Series, wkb2: pd.Series) -> pd.Series:
        import numpy as np

        from dataclod_spark.geo.predicates import dwithin

        n = len(wkb1)
        out = np.zeros(n, dtype=bool)
        # pairs already decided JVM-side arrive masked to NULL — skip them
        # at batch level, no per-row Python
        mask = wkb1.notna().to_numpy() & wkb2.notna().to_numpy()
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return pd.Series(out)

        # build-side geometries repeat across many candidate pairs — parse
        # each distinct blob once per batch (≈ the reference's prepared-
        # geometry caching, refine/geos.rs)
        cache: dict[bytes, GC.Geometry] = {}
        rect_cache: dict[bytes, tuple | None] = {}

        vals1 = wkb1.to_numpy()
        vals2 = wkb2.to_numpy()

        # fully vectorized path: homogeneous point-WKB probe batch against
        # axis-aligned rectangles, intersects predicate
        if predicate == "intersects":
            sub1 = vals1[idx]
            m = len(sub1)
            if m and all(len(v) == 21 and v[0] == 1 for v in sub1):
                buf = b"".join(bytes(v) for v in sub1)
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(m, 21)
                if (arr[:, 1:5].copy().view("<u4")[:, 0] == 1).all():
                    xy = arr[:, 5:21].copy().view("<f8")
                    rects = np.empty((m, 4), dtype="f8")
                    general_rows = []
                    for j, b2 in enumerate(vals2[idx]):
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
                            general_rows.append(j)
                            rects[j] = (1.0, 1.0, 0.0, 0.0)  # never matches
                        else:
                            rects[j] = rect
                    res_arr = (
                        (rects[:, 0] <= xy[:, 0])
                        & (xy[:, 0] <= rects[:, 2])
                        & (rects[:, 1] <= xy[:, 1])
                        & (xy[:, 1] <= rects[:, 3])
                    )
                    if general_rows:
                        from dataclod_spark.geo.predicates import intersects as gen_int

                        for j in general_rows:
                            i = idx[j]
                            try:
                                g1 = GC.wkb_parse(bytes(vals1[i]))
                                g2 = cache.get(bytes(vals2[i]))
                                if g2 is None:
                                    g2 = GC.wkb_parse(bytes(vals2[i]))
                                res_arr[j] = bool(gen_int(g1, g2))
                            except Exception:
                                res_arr[j] = False
                    out[idx] = res_arr
                    return pd.Series(out)

        def parse(b) -> GC.Geometry:
            key = bytes(b)
            g = cache.get(key)
            if g is None:
                g = GC.wkb_parse(key)
                if prepare:
                    # prepared mode: parsed geometries memoize their derived
                    # segment structures across the candidate pairs of the
                    # batch (selected by sampled GeoStatistics — see
                    # select_exec_mode)
                    GP.prepare(g)
                cache[key] = g
                rect_cache[key] = _axis_rect(g)
            return g

        for i in idx:
            b1, b2 = vals1[i], vals2[i]
            try:
                g1 = parse(b1)
                g2 = parse(b2)
                if pred_fn is None:
                    out[i] = bool(dwithin(g1, g2, distance))
                    continue
                # point × axis-aligned rectangle: intersects ≡ closed bbox
                # test (boundary inclusive on both sides) — skip the general
                # predicate machinery for the dominant point-in-box workload
                if predicate == "intersects" and g1.kind == GC.POINT and g1.data is not None:
                    rect = rect_cache.get(bytes(b2))
                    if rect is not None:
                        x, y = g1.data
                        out[i] = rect[0] <= x <= rect[2] and rect[1] <= y <= rect[3]
                        continue
                out[i] = bool(pred_fn(g1, g2))
            except Exception:
                out[i] = False
        return pd.Series(out)

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

        Built as a flat sum of ``when`` terms — a plain expression tree that
        stays inside whole-stage codegen.  (A higher-order ``aggregate``
        over a literal array computes the same thing but is evaluated
        interpreted per row, ~10x slower in the hot explode/join path.)
        Bounds ride into the plan as literals — the Spark analogue of the
        reference broadcasting partition boundaries to every probe task.
        """
        expr: Column = F.lit(0)
        for b in bounds:
            expr = expr + F.when(coord >= float(b), 1).otherwise(0)
        return expr

    @staticmethod
    def _bucket_expr(bounds: list[float], coord_sql: str) -> Column:
        """:meth:`_bucket` built as ONE parsed SQL string (the identical
        CASE-sum Catalyst tree the dispatch path's ``_bucket_sql`` emits).
        The per-term Column build costs ~4 py4j round trips per boundary ×
        8 bucket chains per join — measured 0.35 s of g6's ~1.0 s plan
        CONSTRUCTION per run (driver-side, guide §5); one ``F.expr`` parse
        replaces all of it.  Falls back to the Column build when a boundary
        is non-finite (repr round-trips only finite doubles through the
        SQL parser)."""
        if not bounds:
            return F.lit(0)
        if all(math.isfinite(b) for b in bounds):
            return F.expr(
                "(" + " + ".join(
                    f"(CASE WHEN {coord_sql} >= CAST({float(b)!r} AS DOUBLE) "
                    "THEN 1 ELSE 0 END)"
                    for b in bounds
                ) + ")"
            )
        return _Grid._bucket(bounds, F.expr(coord_sql))

    def explode_cells(self, df: DataFrame, prefix: str, expand: float) -> DataFrame:
        """Add ``__cell`` rows for every grid cell the (expanded) bbox
        intersects: two plain ``explode(sequence(lo, hi))`` generators (x
        then y) — ordinary expressions that stay in codegen, no
        higher-order array construction.

        The min cell indices ride along as ``__{prefix}ix0``/``__{prefix}iy0``
        so the per-pair reference-point dedup downstream is O(1): the bucket
        function is monotone, hence bucket(max(a, b)) = max(bucket(a),
        bucket(b)) — the O(#boundaries) bucket scan runs once per input row
        here, never per candidate pair."""
        ex = float(expand)
        ix0 = self._bucket_expr(self.xb, f"(`{prefix}xmin` - CAST({ex!r} AS DOUBLE))")
        ix1 = self._bucket_expr(self.xb, f"(`{prefix}xmax` + CAST({ex!r} AS DOUBLE))")
        iy0 = self._bucket_expr(self.yb, f"(`{prefix}ymin` - CAST({ex!r} AS DOUBLE))")
        iy1 = self._bucket_expr(self.yb, f"(`{prefix}ymax` + CAST({ex!r} AS DOUBLE))")
        return (
            df.withColumn(f"__{prefix}ix0", ix0)
            .withColumn(f"__{prefix}iy0", iy0)
            .withColumn("__cx", F.explode(F.sequence(F.col(f"__{prefix}ix0"), ix1)))
            .withColumn("__cy", F.explode(F.sequence(F.col(f"__{prefix}iy0"), iy1)))
            .withColumn("__cell", F.col("__cx") * self.ny + F.col("__cy"))
            .drop("__cx", "__cy")
        )

    def ref_point_in_cell(self) -> Column:
        """Reference-point dedup: emit the pair only in the cell holding the
        top-left corner of the (expanded) bbox intersection — each pair
        survives exactly once with no distinct/shuffle (replaces the
        reference's Multi-cell visited bitmaps, ``stream.rs:82-86``).

        The intersection corner's cell is ``max`` of the two sides'
        precomputed min cell indices (bucket is monotone), so this is a
        constant-work predicate per candidate pair."""
        cell = (
            F.greatest(F.col("__l_ix0"), F.col("__r_ix0")) * self.ny
            + F.greatest(F.col("__l_iy0"), F.col("__r_iy0"))
        )
        return cell == F.col("__cell")


def exact_verdict(predicate: str, distance: Optional[float]) -> Column:
    """Exact predicate verdict for pairs where BOTH geometries equal their
    own bbox (point or axis-aligned rectangle — ``bbox_exact``): every join
    predicate is then decidable from the bbox coordinates alone, entirely
    inside whole-stage codegen.  This is the Spark analogue of the
    reference's dedicated point/rect refinement fast paths — for workloads
    of points and axis rectangles no row ever crosses into Python.

    OGC semantics notes (interior/boundary handled per dimension pairing):
    a bbox-exact geometry is a POINT iff its bbox is degenerate in both
    axes; otherwise it is a non-degenerate axis rectangle POLYGON.
    """
    lx0, ly0 = F.col("l_xmin"), F.col("l_ymin")
    lx1, ly1 = F.col("l_xmax"), F.col("l_ymax")
    rx0, ry0 = F.col("r_xmin"), F.col("r_ymin")
    rx1, ry1 = F.col("r_xmax"), F.col("r_ymax")
    lpt = (lx0 == lx1) & (ly0 == ly1)
    rpt = (rx0 == rx1) & (ry0 == ry1)
    overlap = (lx0 <= rx1) & (rx0 <= lx1) & (ly0 <= ry1) & (ry0 <= ly1)
    eq = (lx0 == rx0) & (lx1 == rx1) & (ly0 == ry0) & (ly1 == ry1)
    l_in_r = (rx0 <= lx0) & (lx1 <= rx1) & (ry0 <= ly0) & (ly1 <= ry1)
    r_in_l = (lx0 <= rx0) & (rx1 <= lx1) & (ly0 <= ry0) & (ry1 <= ly1)
    # strictly inside the other's interior
    l_in_r_open = (rx0 < lx0) & (lx1 < rx1) & (ry0 < ly0) & (ly1 < ry1)
    r_in_l_open = (lx0 < rx0) & (rx1 < lx1) & (ly0 < ry0) & (ry1 < ly1)
    if predicate == "intersects":
        return overlap
    if predicate == "equals":
        return eq
    if predicate == "covered_by":
        return l_in_r
    if predicate == "covers":
        return r_in_l
    if predicate == "within":
        # point-on-rect-boundary is NOT within (interior test is strict);
        # rect-in-rect may share boundary (interiors still intersect)
        return (
            F.when(lpt & rpt, eq)
            .when(lpt, l_in_r_open)
            .when(rpt, F.lit(False))
            .otherwise(l_in_r)
        )
    if predicate == "contains":
        return (
            F.when(lpt & rpt, eq)
            .when(rpt, r_in_l_open)
            .when(lpt, F.lit(False))
            .otherwise(r_in_l)
        )
    if predicate == "touches":
        # boundaries meet, interiors don't
        degenerate = (F.greatest(lx0, rx0) == F.least(lx1, rx1)) | (
            F.greatest(ly0, ry0) == F.least(ly1, ry1)
        )
        l_on_r_bnd = overlap & ((lx0 == rx0) | (lx0 == rx1) | (ly0 == ry0) | (ly0 == ry1))
        r_on_l_bnd = overlap & ((rx0 == lx0) | (rx0 == lx1) | (ry0 == ly0) | (ry0 == ly1))
        return (
            F.when(lpt & rpt, F.lit(False))
            .when(lpt, l_on_r_bnd)
            .when(rpt, r_on_l_bnd)
            .otherwise(overlap & degenerate)
        )
    if predicate == "overlaps":
        # same-dimension proper overlap: 2D interior intersection, neither
        # side contained in the other; any point operand -> false
        proper = (F.greatest(lx0, rx0) < F.least(lx1, rx1)) & (
            F.greatest(ly0, ry0) < F.least(ly1, ry1)
        )
        return F.when(lpt | rpt, F.lit(False)).otherwise(proper & ~l_in_r & ~r_in_l)
    if predicate == "crosses":
        # bbox-exact operands are points (dim 0) or axis rectangles (dim 2):
        # P×P and R×R have equal non-lineal dims (false); P×R intersecting
        # is always fully covered ("all interior points in common") — false
        return F.lit(False)
    if predicate == "dwithin":
        d = float(distance or 0.0)
        dx = F.greatest(lx0 - rx1, rx0 - lx1, F.lit(0.0))
        dy = F.greatest(ly0 - ry1, ry0 - ly1, F.lit(0.0))
        return dx * dx + dy * dy <= F.lit(d * d)
    raise ValueError(f"unknown predicate {predicate}")


def bbox_prefilter(predicate: str) -> Optional[Column]:
    """Necessary bbox condition per predicate — tightens the generic bbox
    overlap before refinement for ANY geometry (≈ the reference evaluating
    the predicate's bbox implication during candidate generation).
    ``within(l, r)`` implies bbox(l) ⊆ bbox(r), ``equals`` implies equal
    bboxes, etc.  Returns None when plain overlap is already tight.
    """
    lx0, ly0 = F.col("l_xmin"), F.col("l_ymin")
    lx1, ly1 = F.col("l_xmax"), F.col("l_ymax")
    rx0, ry0 = F.col("r_xmin"), F.col("r_ymin")
    rx1, ry1 = F.col("r_xmax"), F.col("r_ymax")
    if predicate in ("within", "covered_by"):
        return (rx0 <= lx0) & (lx1 <= rx1) & (ry0 <= ly0) & (ly1 <= ry1)
    if predicate in ("contains", "covers"):
        return (lx0 <= rx0) & (rx1 <= lx1) & (ly0 <= ry0) & (ry1 <= ly1)
    if predicate == "equals":
        return (lx0 == rx0) & (lx1 == rx1) & (ly0 == ry0) & (ly1 == ry1)
    return None


def _bbcol(c) -> Column:
    """Bbox operand: a column name or a Column expression."""
    return c if isinstance(c, Column) else F.col(c)


# Session-lifetime bbox-sample cache: repeated spatial joins over a
# semantically identical build side (the common interactive / re-run shape)
# skip the sampling job entirely.  Keyed on the *sampled projection's*
# semantic hash, so any change to the plan — source files, filters,
# expressions — changes the key.  Bounded FIFO (each entry ≤11k tuples);
# ≈ the dispatch path's per-EngineSession grid cache, at the operator level.
_SAMPLE_CACHE: dict[int, list[tuple]] = {}


def clear_bbox_sample_cache() -> None:
    """Clear the per-plan sample memos (bbox grid sample AND the
    exec-mode mean-points stats — both key on semanticHash, which does
    not see file rewrites at the same path)."""
    _SAMPLE_CACHE.clear()
    _MEAN_POINTS_CACHE.clear()


def _cached_sample(pool: DataFrame) -> list[tuple]:
    def compute() -> list[tuple]:
        rows = pool.collect()
        return [
            (r[0], r[1], r[2], r[3])
            for r in rows[: MAX_BBOX_SAMPLES + MIN_BBOX_SAMPLES]
        ]

    return _plan_memoized(_SAMPLE_CACHE, pool, compute)


def collect_bbox_sample_cols(src: DataFrame, cols: tuple) -> list[tuple]:
    """Bbox sample from precomputed coordinate columns — same seeded
    sample/limit policy as :func:`collect_bbox_sample`, zero Python."""
    base = src.select(
        *[_bbcol(c).cast("double").alias(a) for c, a in zip(cols[:4], "abcd")]
    ).dropna()
    samp = base.sample(fraction=BBOX_SAMPLE_RATE, seed=SAMPLE_SEED).limit(
        MAX_BBOX_SAMPLES
    )
    pool = samp.unionAll(base.limit(MIN_BBOX_SAMPLES)).coalesce(1)
    return _cached_sample(pool)


def collect_bbox_sample(src: DataFrame, geom_col: str) -> list[tuple]:
    """Seeded 1% bbox sample, 10k cap / 1k min (≈ BoundingBoxSampler,
    ``join/utils/bbox_sampler.rs:61-88`` + ``option.rs:60-70``).

    Sampling happens on the raw geometry column, so the bbox UDF runs only
    over sampled rows; for small inputs (where 1% is under the minimum) the
    head of the data is used instead — at that size partition skew is moot.
    """
    base = src.select(F.col(geom_col).alias("__g")).dropna()
    # one job: the seeded 1% sample plus a fixed head slice.  For large
    # inputs the head is a ≤10% admixture of the 10k-cap sample; for small
    # inputs (where 1% yields almost nothing) the head alone provides the
    # minimum sample — no second fallback pass over the data.  The ≤11k
    # pooled rows are coalesced to ONE partition before the bbox UDF so the
    # sampling job costs one task + one Python worker, not one per input
    # partition.
    samp = base.sample(fraction=BBOX_SAMPLE_RATE, seed=SAMPLE_SEED).limit(
        MAX_BBOX_SAMPLES
    )
    pool = samp.unionAll(base.limit(MIN_BBOX_SAMPLES)).coalesce(1)
    return _cached_sample(
        with_bbox(pool, "__g", "s_")
        .select("s_xmin", "s_ymin", "s_xmax", "s_ymax")
        .dropna()
    )


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    left_geom: str = "geom",
    right_geom: str = "geom",
    how: str = "inner",
    distance: Optional[float] = None,
    cell_target: Optional[int] = None,
    left_bbox: Optional[tuple] = None,
    right_bbox: Optional[tuple] = None,
    refine: str = "auto",
    exec_mode: str = "speculative",
    extra_condition: Optional[str] = None,
) -> DataFrame:
    """Spatial join of two DataFrames with WKB geometry columns.

    predicate: intersects|contains|within|covers|covered_by|touches|
               overlaps|equals|dwithin (dwithin requires ``distance``).
    how: inner|left|right|full|left_semi|left_anti.

    left_bbox/right_bbox: optional (xmin, ymin, xmax, ymax) column-name
    tuples with the geometry's bbox already materialized — skips the bbox
    UDF on that side AND makes grid sampling pure JVM (≈ the reference's
    OperandEvaluator consuming a precomputed box operand).  An optional 5th
    name supplies the ``bbox_exact`` flag; with 4 names the geometries are
    asserted bbox-exact (points / axis-aligned rectangles).

    cell_target: grid cell budget; ``None`` (default) sizes the grid from
    the bbox sample's statistics (:func:`auto_cell_target`) — row count
    drives fineness, mean bbox size caps it so large geometries don't
    explode across cells.

    refine: ``"auto"`` (default) refines non-bbox-exact candidate pairs
    with the exact Python predicate; ``"none"`` asserts every geometry is
    bbox-exact and resolves ALL pairs with the pure-JVM bbox verdict — the
    whole join then runs without a single Python crossing (the right plan
    shape for point/rect workloads at scale; results are exact under the
    assertion, callers with arbitrary polygons must keep "auto").

    exec_mode: refinement execution mode (≈ ``ExecutionMode``, option.rs:
    230-243 + refine/exec_mode_selector.rs).  ``"speculative"`` (default)
    samples the probe (left) side's GeoStatistics and prepares geometries
    only when they are complex (mean points > 50, refine/geo.rs:23-40);
    ``"prepare"`` / ``"none"`` force the choice.  Results are identical in
    every mode — preparation memoizes derived segment structures per
    distinct geometry, trading memory for per-pair rebuild time.  The
    chosen mode is recorded on the result as ``_spatial_exec_mode``.

    extra_condition: optional SQL boolean expression over the OUTPUT
    column names (left columns + overlap-renamed ``*_right`` columns)
    AND-ed into the join condition — evaluated on candidate pairs BEFORE
    outer/semi/anti completion, i.e. genuine ON-clause semantics (the
    reference models this as the join filter on SpatialJoinExec's
    candidate pairs).

    Output: left columns + right columns (both sides' geometry included);
    for semi/anti only left columns.
    """
    if predicate == "dwithin" and distance is None:
        raise ValueError("dwithin requires distance=")
    if refine not in ("auto", "none"):
        raise ValueError(f"refine must be 'auto' or 'none', got {refine!r}")
    if exec_mode not in ("speculative", "prepare", "none"):
        raise ValueError(
            f"exec_mode must be 'speculative', 'prepare' or 'none', got {exec_mode!r}"
        )
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

    # bbox column names renamed alongside the rest of the right side
    # (Column expressions pass through untouched)
    rbbox = right_bbox
    if rbbox is not None:
        rbbox = tuple(
            f"{c}_right" if isinstance(c, str) and c in overlap else c for c in rbbox
        )

    # grid from a seeded 1% sample of the right (build) side, 10k cap / 1k
    # min (option.rs:60-70); taken from the raw (pre-repartition) input so
    # the sampling job stays narrow.  Falls back to the left side if the
    # right has no geometries.
    if rbbox is not None:
        sample = collect_bbox_sample_cols(right_renamed, rbbox)
    else:
        sample = collect_bbox_sample(right_renamed, rgeom)
    if not sample:
        if left_bbox is not None:
            sample = collect_bbox_sample_cols(left, left_bbox)
        else:
            sample = collect_bbox_sample(left, left_geom)
    sample = sample or [(0.0, 0.0, 1.0, 1.0)]

    # Parallelism guard: a small local input may arrive as a single file
    # split, serializing the whole pipeline onto one core.  Round-robin
    # repartition up to the cluster's parallelism — a no-op at scale, where
    # the scan already yields >= defaultParallelism splits.
    par = left.sparkSession.sparkContext.defaultParallelism
    if left.rdd.getNumPartitions() < par:
        left = left.repartition(par)
    if right_renamed.rdd.getNumPartitions() < par:
        right_renamed = right_renamed.repartition(par)

    def _attach_bbox(df: DataFrame, bbox: Optional[tuple], geom: str, p: str) -> DataFrame:
        if bbox is None:
            return with_bbox(df, geom, p)
        exact = _bbcol(bbox[4]) if len(bbox) > 4 else F.lit(True)
        return df.select(
            "*",
            _bbcol(bbox[0]).cast("double").alias(f"{p}xmin"),
            _bbcol(bbox[1]).cast("double").alias(f"{p}ymin"),
            _bbcol(bbox[2]).cast("double").alias(f"{p}xmax"),
            _bbcol(bbox[3]).cast("double").alias(f"{p}ymax"),
            exact.alias(f"{p}exact"),
        )

    l = _attach_bbox(left, left_bbox, left_geom, "l_").withColumn("__lid", _rowid(lcols))
    r = _attach_bbox(right_renamed, rbbox, rgeom, "r_").withColumn("__rid", _rowid(rcols_out))

    if cell_target is None:
        cell_target = auto_cell_target(sample)
    grid = _Grid(sample, cell_target)

    # No explicit null-bbox filter: explode(sequence(...)) over a null bbox
    # yields cell 0 and the null bbox comparisons below drop the row — an
    # explicit dropna would split the bbox UDF into a second ArrowEvalPython
    # (Catalyst pushes the filter through the projection, duplicating the
    # Python call per side).
    le = grid.explode_cells(l, "l_", expand)
    re = grid.explode_cells(r, "r_", 0.0)

    bbox_cond = (
        (F.col("l_xmin") - expand <= F.col("r_xmax"))
        & (F.col("r_xmin") <= F.col("l_xmax") + expand)
        & (F.col("l_ymin") - expand <= F.col("r_ymax"))
        & (F.col("r_ymin") <= F.col("l_ymax") + expand)
    )
    cand = le.join(re, "__cell").filter(bbox_cond)
    pre = bbox_prefilter(predicate)
    if pre is not None:
        cand = cand.filter(pre)
    cand = cand.filter(grid.ref_point_in_cell())

    # Pairs where both geometries equal their own bbox (points / axis
    # rectangles) get an exact pure-JVM verdict; only the remaining pairs'
    # geometry bytes cross to Python.  The plan stays single-pass (a
    # fast/slow filter split would execute the join subtree twice): the
    # UDF's inputs are masked to NULL for JVM-decided pairs — the Arrow
    # batch carries no geometry bytes and the UDF short-circuits on them.
    # refine="none" drops the Python stage entirely (caller asserts
    # bbox-exactness; the verdict is then the exact predicate).
    if refine == "none":
        matched = cand.filter(exact_verdict(predicate, distance))
        chosen_mode = "none"
    else:
        if exec_mode == "speculative":
            # probe-side stats drive the choice (refine/geo.rs selects on
            # probe stats only); distance predicates and bbox-declared-exact
            # probe sides (points/rects by contract) resolve without the
            # sampling job — select_without_probe_stats parity
            if predicate == "dwithin" or (left_bbox is not None and len(left_bbox) == 4):
                chosen_mode = "none"
            else:
                chosen_mode = select_exec_mode(
                    predicate, collect_mean_points(left, left_geom)
                )
        else:
            chosen_mode = exec_mode
        refine_udf = _refine_udf(predicate, distance, prepare=chosen_mode == "prepare")
        both_exact = F.col("l_exact") & F.col("r_exact")
        refined = refine_udf(
            F.when(~both_exact, F.col(left_geom)),
            F.when(~both_exact, F.col(rgeom)),
        )
        matched = cand.filter(
            F.when(both_exact, exact_verdict(predicate, distance)).otherwise(
                F.coalesce(refined, F.lit(False))
            )
        )

    bbox_helper = [
        c
        for c in matched.columns
        if c.startswith(("l_x", "l_y", "r_x", "r_y", "__l_i", "__r_i"))
        or c in ("l_exact", "r_exact")
    ]
    pairs = matched.drop("__cell", *bbox_helper)
    if extra_condition is not None:
        # extra ON conjuncts (SQL expr over the OUTPUT columns: left names
        # + overlap-renamed right names).  Filtering the matched pairs
        # BEFORE outer/semi/anti completion is exactly ON-clause
        # semantics: an outer row is unmatched unless some pair satisfies
        # the WHOLE condition — a post-join WHERE would instead drop the
        # null-completed rows (DataFusion models this the same way: the
        # join *filter* runs on candidate pairs inside the join).
        pairs = pairs.filter(F.expr(extra_condition))

    def _finish(df0: DataFrame) -> DataFrame:
        # expose the refine-mode decision for tests/metrics (≈ the
        # reference surfacing ExecutionMode::as_gauge in join metrics)
        df0._spatial_exec_mode = chosen_mode
        return df0

    if how == "inner":
        return _finish(pairs.drop("__lid", "__rid"))
    if how == "left_semi":
        keep = pairs.select("__lid").distinct()
        return _finish(l.join(keep, "__lid", "left_semi").select(*lcols))
    if how == "left_anti":
        keep = pairs.select("__lid").distinct()
        return _finish(l.join(keep, "__lid", "left_anti").select(*lcols))

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
        return _finish(res.unionByName(null_r))
    if how == "right":
        return _finish(res.unionByName(null_l))
    if how == "full":
        return _finish(res.unionByName(null_r).unionByName(null_l))
    raise ValueError(f"unsupported how={how}")


def dbscan_clusters(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Density-based clustering of a point set — PostGIS
    ``ST_ClusterDBSCAN`` semantics, Spark-first:

    * **eps-neighbor pairs** via the grid-partitioned dwithin self-join
      (bbox-exact point operands → the whole pair stage is pure JVM);
    * **core points**: >= ``min_pts`` neighbors within eps, self
      included (one partial-aggregated count over the pairs);
    * **clusters**: connected components over core-core edges
      (:func:`operators.dedup.connected_components` — adaptive driver
      union-find for bounded graphs, distributed O(log n)
      large-star/small-star beyond);
    * **border points**: non-core within eps of a core join the MINIMUM
      adjacent core's cluster (the deterministic tie-break PostGIS
      leaves unspecified);
    * noise points are omitted.

    Returns ``(id, cluster, is_core)``; ``cluster`` is the minimum core
    point id of the component.  Every stage is a bounded shuffle: the
    pair join is grid-partitioned (never all-pairs), counts and labels
    partial-aggregate, and the core graph is tiny next to the corpus.
    """
    p = points.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    # POSITION-SPACE evaluation (exact, any input): exactly-coincident
    # points are mutually distance-0, so core-ness depends only on the
    # position (neighbor counts are sums of position multiplicities), all
    # points at one position share a label, and the core graph's
    # components equal the core-POSITION graph's components with each
    # position represented by its minimum point id.  The eps-join,
    # counts, components and border attachment therefore run over
    # DISTINCT POSITIONS — the pair stage is bounded by position pairs,
    # not point pairs, which is what blows up on duplicate-heavy clouds
    # (the Sum |C|^2 trap: 1.4M point pairs vs 19k position pairs on the
    # g23 grid cloud).  Unique-position inputs pay one extra narrow
    # hash-agg + one final attach join.  NULL/NaN coordinates never
    # satisfy the distance predicate (no self-pair either), so those
    # points are noise on both forms.  Verified row-identical to the
    # point-space form by the g23 oracle at sf0.001/0.01/0.1 and the
    # coincident/NULL operator tests.
    pos = (
        p.groupBy("px", "py")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.min("pid").alias("__mpid"))
        .localCheckpoint(eager=True)  # feeds both join sides + label attach
    )
    # eps-pairs via a 3x3 CELL-HASH equi-join instead of the generic grid
    # spatial_join: point-dwithin needs no polygon refinement, and the
    # grid machinery's fixed costs (bbox sample collect + equi-depth grid
    # build — separate Spark jobs) dominate position-sized inputs
    # (measured 1.8 s of 6.2 on g23's 3,827 positions).  Any pair within
    # eps has cell coordinates differing by <= 1 per axis, so exploding
    # one side to its 3x3 cell neighborhood and equi-joining on the cell
    # is a provable superset; the exact squared-distance filter keeps the
    # identical pair set.  (The <=1-cell claim holds in exact arithmetic;
    # for |coord/eps| approaching 2^53 the FP division's rounding could
    # make floors differ by 2 and silently drop a within-eps pair — the
    # cell key is load-bearing for RECALL, unlike the filter.  Domain
    # assumption: coordinate magnitudes stay far below eps*2^52, which
    # every geographic/projected CRS satisfies by ~15 orders of
    # magnitude; the saturation note below is about exactness of the
    # VALUES, this note is about completeness of the CANDIDATES.)  Each b-row owns ONE cell, so a qualifying pair
    # matches in exactly one exploded cell — no dedup pass.  Exactness
    # never depends on the cell key (floor saturates on +-9e18 extremes
    # and maps NaN to 0): the distance filter alone decides membership,
    # so NULL/NaN coordinates drop exactly as before.  Self-pairs are
    # included (distance 0 <= eps), so the neighbor count is DBSCAN's
    # |N_eps(p)| with self.  The pair set feeds three consumers (counts,
    # core edges, border) — materialize it once (SCALE.md pitfall #6).
    a = pos.select(
        F.col("px").alias("ax"), F.col("py").alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.floor(F.col("px") / eps) + dx).cast("double").alias("cx"),
                        (F.floor(F.col("py") / eps) + dy).cast("double").alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("__c"),
    ).select("ax", "ay", F.col("__c.cx").alias("cx"), F.col("__c.cy").alias("cy"))
    b = pos.select(
        F.col("px").alias("bx"), F.col("py").alias("by"),
        F.col("__cnt").alias("__bcnt"), F.col("__mpid").alias("__bmpid"),
        F.floor(F.col("px") / eps).cast("double").alias("cx"),
        F.floor(F.col("py") / eps).cast("double").alias("cy"),
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .filter(dist2 <= F.lit(float(eps) * float(eps)))
        .select("ax", "ay", "bx", "by", "__bcnt", "__bmpid")
        .localCheckpoint(eager=True)
    )
    counts = pairs.groupBy("ax", "ay").agg(F.sum("__bcnt").alias("__n"))
    core_pos = (
        counts.filter(F.col("__n") >= min_pts)
        .join(
            pos,
            (F.col("ax") == F.col("px")) & (F.col("ay") == F.col("py")),
        )
        .select("px", "py", "__mpid")
        .localCheckpoint(eager=True)  # feeds core edges (x2), border, labels
    )
    core_edges = (
        pairs.join(
            core_pos.select(
                F.col("px").alias("ax"), F.col("py").alias("ay"),
                F.col("__mpid").alias("__ampid"),
            ),
            ["ax", "ay"],
        )
        .join(
            core_pos.select(
                F.col("px").alias("bx"), F.col("py").alias("by")
            ),
            ["bx", "by"],
        )
        .filter(F.col("__ampid") < F.col("__bmpid"))
        .select(F.col("__ampid").alias("id_1"), F.col("__bmpid").alias("id_2"))
    )
    from dataclod_spark.operators.dedup import connected_components

    # the driver union-find runs over numpy int64 buffers (no boxed
    # Python ints), so 5M edges is ~80 MB of driver arrays; beyond that
    # the distributed path is alternating large-star/small-star, whose
    # O(log n) rounds handle the O(extent) diameter of lattice-like core
    # graphs that would starve min-label propagation
    comp = connected_components(
        core_edges, "id_1", "id_2", max_iter=128, driver_edge_limit=5_000_000
    )
    # isolated core positions (no core neighbor) form their own
    # singleton cluster labeled by their minimum point id
    core_labels = (
        core_pos.join(comp, core_pos["__mpid"] == comp["id"], "left")
        .select(
            "px", "py",
            F.coalesce(F.col("component"), F.col("__mpid")).alias("cluster"),
        )
        .localCheckpoint(eager=True)  # consumed by border + the final union
    )
    border = (
        pairs.join(
            core_labels.select(
                F.col("px").alias("bx"), F.col("py").alias("by"), "cluster"
            ),
            ["bx", "by"],
        )
        .join(
            core_pos.select(
                F.col("px").alias("ax"), F.col("py").alias("ay")
            ),
            ["ax", "ay"],
            "left_anti",
        )
        .groupBy(F.col("ax").alias("px"), F.col("ay").alias("py"))
        .agg(F.min("cluster").alias("cluster"))
        .withColumn("is_core", F.lit(False))
    )
    labels = core_labels.withColumn("is_core", F.lit(True)).unionByName(border)
    # attach per-point: every point at a labeled position gets that
    # position's (cluster, is_core); noise positions drop in the inner join
    return p.join(labels, ["px", "py"]).select(
        F.col("pid").alias("id"), "cluster", "is_core"
    )
