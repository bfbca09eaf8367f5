"""Polygon overlay (intersection/union/difference) property tests.

No Spark needed — pure geometry core.  Checked via exact area identities:
area(A∩B) + area(A\\B) = area(A); area(A∪B) = area(A) + area(B) − area(A∩B).
"""

from __future__ import annotations

import random

import pytest

from dataclod_spark.geo.algos import area, difference, intersection, make_envelope, union
from dataclod_spark.geo.core import Geometry, wkt_parse


def _areas(a, b):
    i = intersection(a, b)
    d = difference(a, b)
    u = union(a, b)
    return area(i), area(d), area(u)


def test_rect_overlap_exact():
    a = make_envelope(0, 0, 10, 10)
    b = make_envelope(5, 5, 15, 15)
    ai, ad, au = _areas(a, b)
    assert ai == 25.0
    assert ad == 75.0
    assert au == 175.0


def test_disjoint_and_touching():
    a = make_envelope(0, 0, 10, 10)
    b = make_envelope(20, 0, 30, 10)
    assert intersection(a, b).is_empty() or area(intersection(a, b)) == 0.0
    assert area(union(a, b)) == 200.0
    # edge-touching rectangles: union dissolves the shared edge
    c = make_envelope(10, 0, 20, 10)
    u = union(a, c)
    assert area(u) == 200.0
    assert u.kind == "Polygon"  # single dissolved polygon, not multi


def test_triangle_rect():
    # square [0,6]² pokes through the hypotenuse x+y=10 of the triangle
    t = wkt_parse("POLYGON((0 0, 10 0, 0 10, 0 0))")
    r = make_envelope(0, 0, 6, 6)
    ai, ad, au = _areas(t, r)
    assert ai == pytest.approx(34.0)  # 36 − corner triangle (2·2/2)
    assert ad == pytest.approx(area(t) - ai)
    assert au == pytest.approx(area(t) + 36.0 - ai)


def test_hole_punch():
    outer = make_envelope(0, 0, 10, 10)
    inner = make_envelope(4, 4, 6, 6)
    d = difference(outer, inner)
    assert area(d) == pytest.approx(96.0)
    # result is a polygon with a hole
    assert d.kind == "Polygon" and len(d.data) == 2
    # intersection with the hole region is the inner box itself
    i = intersection(d, inner)
    assert area(i) == pytest.approx(0.0)


def test_random_quads_area_identities():
    rnd = random.Random(3)
    for trial in range(25):
        x1, y1 = rnd.randint(0, 20), rnd.randint(0, 20)
        a = make_envelope(x1, y1, x1 + rnd.randint(2, 15), y1 + rnd.randint(2, 15))
        x2, y2 = rnd.randint(0, 20), rnd.randint(0, 20)
        b = make_envelope(x2, y2, x2 + rnd.randint(2, 15), y2 + rnd.randint(2, 15))
        ai, ad, au = _areas(a, b)
        assert ai + ad == pytest.approx(area(a), abs=1e-9), trial
        assert au == pytest.approx(area(a) + area(b) - ai, abs=1e-9), trial


def test_concave_overlay():
    # L-shaped concave polygon vs rectangle crossing the notch
    l_shape = wkt_parse("POLYGON((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))")
    r = make_envelope(2, 2, 8, 8)
    ai, ad, au = _areas(l_shape, r)
    # intersection: part of rect inside the L
    #   strip y∈[2,4] x∈[2,8] (12) + strip x∈[2,4] y∈[4,8] (8) = 20
    assert ai == pytest.approx(20.0)
    assert ai + ad == pytest.approx(area(l_shape), abs=1e-9)
    assert au == pytest.approx(area(l_shape) + 36.0 - ai, abs=1e-9)


def test_make_valid_node_splitting():
    """Node-splitting MakeValid: semantically exact vs the reference's slt
    goldens (same face decomposition, exact areas, valid output) — byte-level
    ring ordering differs from GEOS and is xfailed in the slt harness."""
    from dataclod_spark.geo.algos import is_valid, make_valid_entry

    g = wkt_parse(
        "MULTIPOLYGON(((186 194,187 194,188 195,189 195,190 195,191 195,"
        "192 195,193 194,194 194,194 193,195 192,195 191,195 190,195 189,"
        "195 188,194 187,194 186,14 6,13 6,12 5,11 5,10 5,9 5,8 5,7 6,6 6,"
        "6 7,5 8,5 9,5 10,5 11,5 12,6 13,6 14,186 194)),((150 90,149 80,"
        "146 71,142 62,135 55,128 48,119 44,110 41,100 40,90 41,81 44,72 48,"
        "65 55,58 62,54 71,51 80,50 90,51 100,54 109,58 118,65 125,72 132,"
        "81 136,90 139,100 140,110 139,119 136,128 132,135 125,142 118,"
        "146 109,149 100,150 90)))"
    )
    assert not is_valid(g)
    r = make_valid_entry(g)
    assert is_valid(r)
    assert r.kind == "MultiPolygon" and len(r.data) == 4
    assert area(r) == pytest.approx(8534.153846153846)


def test_make_valid_six_octagons():
    from dataclod_spark.geo.algos import is_valid, make_valid_entry

    g = wkt_parse(
        "MULTIPOLYGON(((91 50,79 22,51 10,23 22,11 50,23 78,51 90,79 78,91 50)),"
        "((91 100,79 72,51 60,23 72,11 100,23 128,51 140,79 128,91 100)),"
        "((91 150,79 122,51 110,23 122,11 150,23 178,51 190,79 178,91 150)),"
        "((141 50,129 22,101 10,73 22,61 50,73 78,101 90,129 78,141 50)),"
        "((141 100,129 72,101 60,73 72,61 100,73 128,101 140,129 128,141 100)),"
        "((141 150,129 122,101 110,73 122,61 150,73 178,101 190,129 178,141 150)))"
    )
    r = make_valid_entry(g)
    assert is_valid(r)
    assert len(r.data) == 14  # 6 odd-parity regions + 8 triple-covered lenses
    assert area(r) == pytest.approx(13380.0)


def test_buffer_lines_and_polygons():
    """Capsule-union buffer: exact discretized areas for simple shapes."""
    import math

    from dataclod_spark.geo.algos import buffer, is_valid

    # 32-gon circle area at r=2: (1/2)·n·r²·sin(2π/n)
    circle32 = 0.5 * 32 * 4 * math.sin(2 * math.pi / 32)
    line = buffer(wkt_parse("LINESTRING(0 0, 10 0)"), 2.0)
    assert is_valid(line)
    assert area(line) == pytest.approx(40 + circle32, abs=1e-9)

    poly = buffer(wkt_parse("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"), 2.0)
    assert is_valid(poly)
    assert area(poly) == pytest.approx(100 + 80 + circle32, abs=1e-9)

    # buffering fills a hole narrower than 2×dist
    holed = buffer(
        wkt_parse("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"), 1.0
    )
    assert is_valid(holed)
    assert holed.kind == "Polygon" and len(holed.data) == 1  # hole filled


def test_mvt_geom():
    from dataclod_spark.geo.algos import make_envelope
    from dataclod_spark.geo.core import wkt_write
    from dataclod_spark.geo.mvt import as_mvt_geom

    bounds = make_envelope(0, 0, 100, 100)
    assert wkt_write(as_mvt_geom(wkt_parse("POINT(50 50)"), bounds)) == "POINT (2048 2048)"
    # Y axis flips: north edge of the tile is tile-y 0
    assert wkt_write(as_mvt_geom(wkt_parse("POINT(0 100)"), bounds)) == "POINT (0 0)"
    # clip to tile+buffer
    line = as_mvt_geom(wkt_parse("LINESTRING(-50 50, 150 50)"), bounds)
    assert wkt_write(line) == "LINESTRING (-256 2048, 4352 2048)"
    assert as_mvt_geom(wkt_parse("POINT(500 500)"), bounds) is None


def test_corner_touching_squares_union():
    """Round-3 hypothesis find: rings meeting at a single point made
    build_area classify every cycle as a hole (the unbounded face's
    figure-eight boundary survived dedupe and poisoned the even-odd
    depths) — union returned EMPTY."""
    a = wkt_parse("POLYGON((0 1,1 1,1 2,0 2,0 1))")
    b = wkt_parse("POLYGON((1 0,2 0,2 1,1 1,1 0))")
    assert area(union(a, b)) == 2.0
    assert area(intersection(a, b)) == 0.0
    assert area(difference(a, b)) == 1.0


def test_shared_edge_difference():
    """Round-3 hypothesis find: rect \\ triangle with shared edges — the
    kept faces touch only at a point and must re-assemble as a
    MULTIPOLYGON, not collapse to EMPTY."""
    t = wkt_parse("POLYGON((1 0,2 0,1 1,1 0))")
    r = wkt_parse("POLYGON((0 0,2 0,2 1,0 1,0 0))")
    assert area(difference(r, t)) == 1.5
    assert area(difference(t, r)) == 0.0
    assert area(union(r, t)) == 2.0


def test_area_far_from_origin():
    """Round-3 hypothesis find: naive shoelace cancels catastrophically
    far from the origin; anchored shoelace keeps unit-square area exact
    at 1e6 and overlay areas translation-invariant."""
    near = wkt_parse("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    far = wkt_parse(
        "POLYGON((1000000 1000000,1000001 1000000,1000001 1000001,1000000 1000001,1000000 1000000))"
    )
    assert area(near) == 1.0
    assert area(far) == 1.0
    sq = wkt_parse("POLYGON((1000 1000000,1001 1000000,1001 1000001,1000 1000001,1000 1000000))")
    tr = wkt_parse("POLYGON((1000 1000000,1001 1000000,1000 1000003,1000 1000000))")
    import math as _m

    assert _m.isclose(area(intersection(sq, tr)), 5.0 / 6.0, rel_tol=1e-12)
