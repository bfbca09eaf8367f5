"""Metamorphic property tests for the polygon overlay engine.

Pure geometry core (no Spark).  Random rectangles and right triangles with
integer-derived coordinates, checked via the algebra the operators must
satisfy regardless of input:

* area(A∩B) + area(A∪B) = area(A) + area(B)   (inclusion–exclusion)
* area(A\\B) = area(A) − area(A∩B)
* commutativity of ∩ and ∪ (by area)
* idempotence: A∪A and A∩A have area(A)
* translation invariance, including large offsets — the rounding
  granularity of crossing coordinates changes with magnitude (the bug
  class hypothesis found in the predicate engine's ε-probes)
"""

from __future__ import annotations

import math

from hypothesis import example, given, settings
from hypothesis import strategies as st

from dataclod_spark.geo.algos import area, difference, intersection, union
from dataclod_spark.geo.core import Geometry


def _rect(x, y, w, h):
    return Geometry(
        kind="Polygon",
        data=[[(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]],
        srid=0,
    )


def _tri(x, y, w, h):
    return Geometry(kind="Polygon", data=[[(x, y), (x + w, y), (x, y + h), (x, y)]], srid=0)


coord = st.integers(min_value=-20, max_value=20)
size = st.integers(min_value=1, max_value=15)
shape = st.one_of(
    st.builds(_rect, coord, coord, size, size),
    st.builds(_tri, coord, coord, size, size),
)


def _close(a, b):
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=120, deadline=None)
@given(shape, shape)
def test_inclusion_exclusion(a, b):
    ai = area(intersection(a, b))
    au = area(union(a, b))
    assert _close(ai + au, area(a) + area(b))


@settings(max_examples=120, deadline=None)
@given(shape, shape)
def test_difference_area(a, b):
    assert _close(area(difference(a, b)), area(a) - area(intersection(a, b)))
    assert _close(area(difference(b, a)), area(b) - area(intersection(a, b)))


@settings(max_examples=120, deadline=None)
@given(shape, shape)
def test_commutativity_by_area(a, b):
    assert _close(area(intersection(a, b)), area(intersection(b, a)))
    assert _close(area(union(a, b)), area(union(b, a)))


@settings(max_examples=60, deadline=None)
@given(shape)
def test_idempotence(a):
    assert _close(area(union(a, a)), area(a))
    assert _close(area(intersection(a, a)), area(a))


@settings(max_examples=80, deadline=None)
@given(shape, shape, st.sampled_from([1, 7, 1000, 10**6]), st.sampled_from([0, 3, -999, 10**6]))
def test_translation_invariance(a, b, dx, dy):
    def shift(g):
        return Geometry(
            kind=g.kind,
            data=[[(x + dx, y + dy) for (x, y) in ring] for ring in g.data],
            srid=0,
        )

    base = area(intersection(a, b))
    moved = area(intersection(shift(a), shift(b)))
    assert _close(base, moved)


def _rect_with_hole(x, y, w, h):
    """Rectangle with a centered hole of half extent (integer coords)."""
    hx0, hy0 = x + max(1, w // 4), y + max(1, h // 4)
    hx1, hy1 = min(x + w - 1, hx0 + max(1, w // 2)), min(y + h - 1, hy0 + max(1, h // 2))
    if hx1 <= hx0 or hy1 <= hy0:
        return _rect(x, y, w, h)
    return Geometry(
        kind="Polygon",
        data=[
            [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)],
            [(hx0, hy0), (hx0, hy1), (hx1, hy1), (hx1, hy0), (hx0, hy0)],
        ],
        srid=0,
    )


holey = st.builds(
    _rect_with_hole,
    st.integers(-15, 15),
    st.integers(-15, 15),
    st.integers(4, 12),
    st.integers(4, 12),
)
shape_h = st.one_of(shape, holey)


@settings(max_examples=150, deadline=None)
@given(shape_h, shape_h)
@example(
    a=Geometry(kind='Polygon',
     data=[[(3, 0), (6, 0), (3, 1), (3, 0)]],
     srid=0),
    b=Geometry(kind='Polygon',
     data=[[(0, -2), (8, -2), (8, 2), (0, 2), (0, -2)],
      [(2, -1), (2, 1), (6, 1), (6, -1), (2, -1)]],
     srid=0),
).via('discovered failure')
def test_inclusion_exclusion_with_holes(a, b):
    ai = area(intersection(a, b))
    au = area(union(a, b))
    assert _close(ai + au, area(a) + area(b))


@settings(max_examples=150, deadline=None)
@given(shape_h, shape_h)
def test_difference_area_with_holes(a, b):
    assert _close(area(difference(a, b)), area(a) - area(intersection(a, b)))
