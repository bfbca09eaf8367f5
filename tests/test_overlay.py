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
