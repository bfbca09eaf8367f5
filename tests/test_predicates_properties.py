"""Metamorphic property tests for the OGC predicate engine
(geo/predicates.py) — generative coverage beyond the reference's SLT truth
tables (SURVEY.md §5).

Integer coordinates keep every incidence decision exact (orientation
determinants of ints are ints), so the properties hold with no epsilon:

* symmetry: intersects/touches/overlaps/equals(a,b) == same(b,a)
* duality: contains(a,b) == within(b,a); covers(a,b) == covered_by(b,a)
* implications: contains → covers; touches → intersects ∧ ¬overlaps;
  equals → covers ∧ covered_by
* translation invariance under integer shifts
* bbox soundness: intersects → bbox_intersects
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataclod_spark.geo import predicates as P
from dataclod_spark.geo.algos import area, intersection, make_envelope, make_point, translate
from dataclod_spark.geo.core import Geometry

_I = st.integers(-8, 8)


@st.composite
def rect(draw):
    x0, y0 = draw(_I), draw(_I)
    return make_envelope(x0, y0, x0 + draw(st.integers(1, 6)), y0 + draw(st.integers(1, 6)))


@st.composite
def segment(draw):
    a = (draw(_I), draw(_I))
    b = (draw(_I), draw(_I))
    if a == b:
        b = (a[0] + 1, a[1])
    return Geometry("LineString", [a, b])


@st.composite
def triangle(draw):
    x0, y0 = draw(_I), draw(_I)
    w, h = draw(st.integers(1, 6)), draw(st.integers(1, 6))
    return Geometry("Polygon", [[(x0, y0), (x0 + w, y0), (x0, y0 + h), (x0, y0)]])


@st.composite
def two_part_line(draw):
    parts = []
    for _ in range(2):
        a = (draw(_I), draw(_I))
        b = (draw(_I), draw(_I))
        if a == b:
            b = (a[0] + 1, a[1])
        parts.append([a, b])
    return Geometry("MultiLineString", parts)


point = st.builds(make_point, _I, _I)
geom = st.one_of(point, segment(), rect(), triangle(), two_part_line())

_SYMMETRIC = [P.intersects, P.touches, P.overlaps, P.equals]


@settings(max_examples=200, deadline=None)
@given(geom, geom)
def test_symmetry(a, b):
    for pred in _SYMMETRIC:
        assert pred(a, b) == pred(b, a), pred.__name__


@settings(max_examples=200, deadline=None)
@given(geom, geom)
def test_duality(a, b):
    assert P.contains(a, b) == P.within(b, a)
    assert P.covers(a, b) == P.covered_by(b, a)


@settings(max_examples=200, deadline=None)
@given(geom, geom)
def test_implications(a, b):
    if P.contains(a, b):
        assert P.covers(a, b)
    if P.touches(a, b):
        assert P.intersects(a, b)
        assert not P.overlaps(a, b)
    if P.equals(a, b):
        assert P.covers(a, b) and P.covered_by(a, b)
    if P.intersects(a, b):
        assert P.bbox_intersects(a, b)


@settings(max_examples=200, deadline=None)
@given(geom, geom, _I, _I)
def test_translation_invariance(a, b, dx, dy):
    ta, tb = translate(a, dx, dy), translate(b, dx, dy)
    assert P.intersects(a, b) == P.intersects(ta, tb)
    assert P.contains(a, b) == P.contains(ta, tb)
    assert P.touches(a, b) == P.touches(ta, tb)


@settings(max_examples=200, deadline=None)
@given(rect(), rect())
def test_rect_intersection_area_bound(a, b):
    """area(a ∩ b) <= min(area(a), area(b)); nonzero iff overlaps-or-
    contains relation holds for axis rectangles."""
    inter = intersection(a, b)
    ia = area(inter) if inter is not None else 0.0
    assert ia <= min(area(a), area(b)) + 1e-9
    if not P.intersects(a, b):
        assert ia == 0.0


@settings(max_examples=100, deadline=None)
@given(geom)
def test_reflexivity(a):
    assert P.equals(a, a)
    assert P.covers(a, a)
    assert P.intersects(a, a)
    assert not P.touches(a, a)


@settings(max_examples=200, deadline=None)
@given(geom, geom)
def test_distance_laws(a, b):
    """distance symmetry; dwithin ⇔ distance ≤ d; intersects ⇒ distance 0."""
    from dataclod_spark.geo.algos import distance

    d_ab = distance(a, b)
    d_ba = distance(b, a)
    assert d_ab == d_ba
    assert P.dwithin(a, b, d_ab) is True
    if d_ab > 0:
        assert P.dwithin(a, b, d_ab * 0.99) is False
        assert not P.intersects(a, b)
    if P.intersects(a, b):
        assert d_ab == 0.0


@settings(max_examples=150, deadline=None)
@given(geom, geom, geom)
def test_distance_triangle_inequality(a, b, c):
    """Hausdorff-free set-distance triangle inequality needs the bridging
    set's diameter: d(a,c) <= d(a,b) + diam(b) + d(b,c)."""
    from dataclod_spark.geo.algos import distance

    xs = [p[0] for p in b.points()]
    ys = [p[1] for p in b.points()]
    diam = ((max(xs) - min(xs)) ** 2 + (max(ys) - min(ys)) ** 2) ** 0.5
    assert distance(a, c) <= distance(a, b) + diam + distance(b, c) + 1e-9
