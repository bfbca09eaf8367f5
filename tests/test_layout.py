"""Z-order layout key: bit-exactness vs a Python Morton reference, the
locality property that justifies it, and the zero-Python plan guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataclod_spark.operators.layout import zorder_key


def _morton_ref(px: float, py: float, bounds, bits: int = 16) -> int:
    xmin, ymin, xmax, ymax = bounds
    cells = (1 << bits) - 1

    def q(v, lo, hi):
        c = int((v - lo) / (hi - lo) * (cells + 1))
        return max(0, min(cells, c))

    qx, qy = q(px, xmin, xmax), q(py, ymin, ymax)
    key = 0
    for i in range(bits):
        key |= ((qx >> i) & 1) << (2 * i)
        key |= ((qy >> i) & 1) << (2 * i + 1)
    return key


def test_zorder_matches_python_reference(spark):
    bounds = (0.0, 0.0, 100.0, 50.0)
    pts = [(float(x) * 0.73, float(y) * 1.31) for x in range(40) for y in range(30)]
    df = spark.createDataFrame(pts, "px double, py double")
    got = {
        (r.px, r.py): r.z
        for r in df.select(
            "px", "py", zorder_key(F.col("px"), F.col("py"), bounds).alias("z")
        ).collect()
    }
    for (px, py), z in got.items():
        assert z == _morton_ref(px, py, bounds), (px, py)


def test_zorder_clamps_out_of_bounds(spark):
    bounds = (0.0, 0.0, 10.0, 10.0)
    df = spark.createDataFrame(
        [(-5.0, 5.0), (15.0, 5.0), (5.0, 999.0)], "px double, py double"
    )
    rows = df.select(zorder_key(F.col("px"), F.col("py"), bounds).alias("z")).collect()
    lo = _morton_ref(0.0, 5.0, bounds)
    hi = _morton_ref(10.0, 5.0, bounds)
    assert rows[0].z == lo and rows[1].z == hi
    assert rows[2].z == _morton_ref(5.0, 10.0, bounds)


def test_zorder_locality_beats_row_order(spark):
    """The point of the key: chunks of consecutive z-ordered rows have far
    smaller bounding boxes than chunks of the natural (row-id) order —
    that bbox shrinkage is exactly what row-group min/max pruning buys."""
    bounds = (0.0, 0.0, 64.0, 64.0)
    n = 4096
    pts = [(float((i * 2654435761) % 64), float((i * 40503) % 64)) for i in range(n)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "rid long, px double, py double"
    )
    keyed = df.select(
        "rid", "px", "py", zorder_key(F.col("px"), F.col("py"), bounds).alias("z")
    ).collect()

    def avg_chunk_area(rows, chunk=64):
        areas = []
        for s in range(0, len(rows), chunk):
            c = rows[s : s + chunk]
            xs = [r.px for r in c]
            ys = [r.py for r in c]
            areas.append((max(xs) - min(xs)) * (max(ys) - min(ys)))
        return sum(areas) / len(areas)

    natural = avg_chunk_area(sorted(keyed, key=lambda r: r.rid))
    zordered = avg_chunk_area(sorted(keyed, key=lambda r: r.z))
    assert zordered < natural / 4  # at least 4x tighter row-group boxes


def test_zorder_plan_pure_codegen(spark):
    from dataclod_spark.registry import load

    from conftest import SF_SMOKE

    e = load(spark, SF_SMOKE, "events").select(
        (F.col("event_id") % 100).cast("double").alias("px"),
        (F.col("user_id") % 50).cast("double").alias("py"),
    )
    keyed = e.select(zorder_key(F.col("px"), F.col("py"), (0.0, 0.0, 100.0, 50.0)))
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    # load's scan-spread round-robin exchange is allowed (absent at scale)
    assert "Python" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
