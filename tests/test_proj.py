"""Projection engine (geo/proj.py): known values + round-trips.

The slt corpus pins the byte-exact 4326→3587 golden (test_spatial_slt
L312); these tests cover the other families with published test points and
inverse round-trips.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataclod_spark.geo.proj import EPSG_DEFS, get_transformer


def test_slt_golden_value():
    tx = get_transformer(4326, 3587)
    x, y = tx(1.0, 1.0)
    assert repr(x) == "16192673.622364368"
    assert repr(y) == "768721.3525017627"


def test_web_mercator_matches_legacy():
    tx = get_transformer(4326, 3857)
    x, y = tx(1.0, 1.0)
    assert x == pytest.approx(111319.49079327357, abs=1e-6)
    assert y == pytest.approx(111325.14286638486, abs=1e-6)


def test_utm_central_meridian_easting():
    # on the central meridian of zone 31 (3°E) easting is exactly 500 km
    tx = get_transformer(4326, 32631)
    x, y = tx(3.0, 60.0)
    assert x == pytest.approx(500000.0, abs=1e-6)
    # published meridian-arc value for 60°N is ~6,654,072 m /0.9996 scale...
    assert 6_600_000 < y < 6_700_000


def test_utm_south_false_northing():
    txn = get_transformer(4326, 32733)  # zone 33 south
    x, y = txn(15.0, -30.0)
    assert x == pytest.approx(500000.0, abs=1e-6)
    assert 6_000_000 < y < 7_000_000  # 10M false northing minus arc


def test_osgb_tower_of_london():
    # OSGB36 grid reference for lon/lat already in OSGB36 datum terms is
    # projection-exact; use the classic Greenwich observatory check:
    # lon=0, lat=51.4769 → easting ≈ 538874, northing ≈ 177344 (±150 m
    # datum-shift tolerance, since towgs84 grid shifts are out of scope)
    tx = get_transformer(4326, 27700)
    x, y = tx(0.0, 51.4769)
    assert x == pytest.approx(538874, abs=200)
    assert y == pytest.approx(177344, abs=200)


def test_conus_albers_origin():
    tx = get_transformer(4326, 5070)
    x, y = tx(-96.0, 23.0)
    assert x == pytest.approx(0.0, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-3)


# per-CRS points inside each projection's domain of validity (transverse
# mercator series are only meant for ±~4° around the central meridian)
_ROUNDTRIP_POINTS = {
    3857: [(-84.0, 43.5), (3.0, 46.0), (150.0, -33.0)],
    3395: [(-84.0, 43.5), (3.0, 46.0), (150.0, -33.0)],
    3587: [(-84.4, 43.3), (-86.0, 44.5), (-83.0, 45.0)],
    2154: [(3.0, 46.5), (1.0, 44.0), (6.5, 48.5)],
    27700: [(-2.0, 52.0), (0.0, 51.5), (-4.5, 55.0)],
    5070: [(-96.0, 38.0), (-84.0, 43.5), (-115.0, 40.0)],
    32631: [(3.0, 46.0), (1.0, 52.0), (5.5, 40.0)],
    32733: [(15.0, -30.0), (13.5, -8.0), (16.5, -70.0)],
    26915: [(-93.0, 45.0), (-95.5, 30.0), (-90.5, 48.0)],
    25832: [(9.0, 50.0), (7.0, 54.0), (11.5, 47.0)],
}


@pytest.mark.parametrize("srid", sorted(_ROUNDTRIP_POINTS))
def test_roundtrip(srid):
    fwd = get_transformer(4326, srid)
    inv = get_transformer(srid, 4326)
    for lon, lat in _ROUNDTRIP_POINTS[srid]:
        x, y = fwd(lon, lat)
        lon2, lat2 = inv(x, y)
        # 1e-6 deg ≈ 10 cm: the classic tmerc series pair is accurate to
        # ~mm near the central meridian, degrading towards zone edges
        assert lon2 == pytest.approx(lon, abs=1e-6)
        assert lat2 == pytest.approx(lat, abs=1e-6)


@settings(max_examples=50, deadline=None)
@given(
    lon=st.floats(min_value=-179.0, max_value=179.0),
    lat=st.floats(min_value=-84.0, max_value=84.0),
)
def test_mercator_roundtrip_property(lon, lat):
    fwd = get_transformer(4326, 3395)
    inv = get_transformer(3395, 4326)
    lon2, lat2 = inv(*fwd(lon, lat))
    assert lon2 == pytest.approx(lon, abs=1e-8)
    assert lat2 == pytest.approx(lat, abs=1e-8)


def test_unknown_srid_returns_none():
    assert get_transformer(4326, 999999) is None
    assert get_transformer(999999, 4326) is None


def test_table_coverage():
    # the embedded table must cover the formulaic UTM families
    assert 32601 in EPSG_DEFS and 32660 in EPSG_DEFS
    assert 32701 in EPSG_DEFS and 32760 in EPSG_DEFS
    assert 26901 in EPSG_DEFS and 25832 in EPSG_DEFS
