"""Property-based round-trip tests for the geometry serialization layer
(WKT / WKB / GeoJSON) — extends the reference's golden-file strategy with
generative coverage (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataclod_spark.geo.core import (
    Geometry,
    geojson_parse,
    geojson_write,
    wkb_parse,
    wkb_write,
    wkt_parse,
    wkt_write,
)

coord = st.tuples(
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 6)),
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 6)),
)


def ring():
    return st.lists(coord, min_size=3, max_size=6).map(lambda pts: pts + [pts[0]])


geometry = st.one_of(
    st.just(None).map(lambda _: Geometry("Point", None)),
    coord.map(lambda c: Geometry("Point", c)),
    st.lists(coord, min_size=2, max_size=8).map(lambda l: Geometry("LineString", l)),
    st.lists(ring(), min_size=1, max_size=3).map(lambda r: Geometry("Polygon", r)),
    st.lists(coord, min_size=1, max_size=6).map(lambda p: Geometry("MultiPoint", p)),
    st.lists(st.lists(coord, min_size=2, max_size=5), min_size=1, max_size=3).map(
        lambda ls: Geometry("MultiLineString", ls)
    ),
    st.lists(st.lists(ring(), min_size=1, max_size=2), min_size=1, max_size=2).map(
        lambda ps: Geometry("MultiPolygon", ps)
    ),
)
geometry_with_srid = st.tuples(geometry, st.sampled_from([0, 4326, 3857])).map(
    lambda t: t[0].with_srid(t[1])
)


@settings(max_examples=200, deadline=None)
@given(geometry_with_srid)
def test_wkb_roundtrip(g):
    back = wkb_parse(wkb_write(g))
    assert back.kind == g.kind
    assert back.srid == g.srid
    assert back.data == g.data or (g.kind == "Point" and g.data is None and back.data is None)


@settings(max_examples=200, deadline=None)
@given(geometry)
def test_wkt_roundtrip(g):
    back = wkt_parse(wkt_write(g))
    assert back.kind == g.kind
    assert back.data == g.data


@settings(max_examples=200, deadline=None)
@given(geometry)
def test_geojson_roundtrip(g):
    if g.kind == "Point" and g.data is None:
        return  # GeoJSON has no empty-point representation
    back = geojson_parse(geojson_write(g))
    assert back.kind == g.kind
    assert back.data == g.data


@settings(max_examples=100, deadline=None)
@given(geometry_with_srid)
def test_wkt_stable_under_reserialization(g):
    """write(parse(write(g))) == write(g) — formatting is a fixpoint."""
    w1 = wkt_write(g)
    w2 = wkt_write(wkt_parse(w1))
    assert w1 == w2


@settings(max_examples=100, deadline=None)
@given(st.lists(coord, min_size=3, max_size=12))
def test_convex_hull_contains_all_points(pts):
    from dataclod_spark.geo.algos import convex_hull
    from dataclod_spark.geo.predicates import covers

    hull = convex_hull(Geometry("MultiPoint", pts))
    if hull.kind != "Polygon":
        return  # collinear/degenerate inputs
    for p in pts:
        assert covers(hull, Geometry("Point", p)), p
