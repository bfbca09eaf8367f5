"""Negative-distance ST_Buffer (erosion) and ST_TileEnvelope 4/5-arg forms.

Parity gaps closed in round 2 (VERDICT items 5/6): goldens follow GEOS
erosion semantics and PostGIS/liblwgeom tile-envelope semantics, which the
reference delegates to (udfs.rs:321, udfs.rs:426).
"""

from __future__ import annotations

import pytest

from dataclod_spark.geo import core as C
from dataclod_spark.geo import algos as A


def _w(g):
    return C.wkt_write(g)


class TestNegativeBuffer:
    def test_square_erosion_exact(self):
        g = C.wkt_parse("POLYGON((0 0,10 0,10 10,0 10,0 0))")
        out = A.buffer(g, -2.0)
        assert A.area(out) == pytest.approx(36.0)
        # erosion of a square is the exact inset square (sharp corners)
        assert sorted(out.data[0][:-1]) == [(2.0, 2.0), (2.0, 8.0), (8.0, 2.0), (8.0, 8.0)]

    def test_full_erosion_is_empty(self):
        g = C.wkt_parse("POLYGON((0 0,10 0,10 10,0 10,0 0))")
        out = A.buffer(g, -6.0)
        assert out.is_empty()

    def test_nonareal_negative_is_empty(self):
        assert A.buffer(C.wkt_parse("LINESTRING(0 0,5 5)"), -1.0).is_empty()
        assert A.buffer(C.wkt_parse("POINT(1 1)"), -1.0).is_empty()

    def test_hole_expands_with_rounded_corners(self):
        g = C.wkt_parse("POLYGON((0 0,20 0,20 10,0 10,0 0),(8 3,12 3,12 7,8 7,8 3))")
        out = A.buffer(g, -1.0)
        # outer inset: 18x8 = 144; hole grows to 6x6 minus rounded corners:
        # 36 - (4 - pi) ≈ 35.14; total ≈ 108.86
        assert A.area(out) == pytest.approx(144 - (36 - (4 - 3.141592653589793)), abs=0.05)

    def test_multipolygon_erosion(self):
        g = C.wkt_parse(
            "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((10 0,30 0,30 20,10 20,10 0)))"
        )
        out = A.buffer(g, -1.0)
        assert A.area(out) == pytest.approx(2 * 2 + 18 * 18)

    def test_zero_buffer(self):
        g = C.wkt_parse("POLYGON((0 0,10 0,10 10,0 10,0 0))")
        assert _w(A.buffer(g, 0.0)) == _w(g)
        assert A.buffer(C.wkt_parse("LINESTRING(0 0,1 1)"), 0.0).is_empty()


class TestTileEnvelope:
    def test_default_bounds_golden(self):
        # slt L354 golden (byte-exact via the slt suite too)
        assert _w(A.tile_envelope(2, 1, 1)) == (
            "POLYGON ((-10018754.1713945 0, -10018754.1713945 10018754.1713945, "
            "0 10018754.1713945, 0 0, -10018754.1713945 0))"
        )

    def test_custom_bounds(self):
        b = C.wkt_parse("POLYGON((0 0,16 0,16 16,0 16,0 0))")
        assert _w(A.tile_envelope(2, 1, 1, b)) == "POLYGON ((4 8, 4 12, 8 12, 8 8, 4 8))"

    def test_margin(self):
        b = C.wkt_parse("POLYGON((0 0,16 0,16 16,0 16,0 0))")
        assert (
            _w(A.tile_envelope(2, 1, 1, b, 0.125))
            == "POLYGON ((3.5 7.5, 3.5 12.5, 8.5 12.5, 8.5 7.5, 3.5 7.5))"
        )

    def test_margin_clipped_to_bounds(self):
        b = C.wkt_parse("POLYGON((0 0,16 0,16 16,0 16,0 0))")
        assert (
            _w(A.tile_envelope(2, 0, 0, b, 0.5))
            == "POLYGON ((0 10, 0 16, 6 16, 6 10, 0 10))"
        )

    def test_invalid_margin_and_coords(self):
        b = C.wkt_parse("POLYGON((0 0,16 0,16 16,0 16,0 0))")
        assert A.tile_envelope(2, 1, 1, b, -0.75) is None
        assert A.tile_envelope(2, 4, 1) is None
        assert A.tile_envelope(-1, 0, 0) is None

    def test_srid_from_bounds(self):
        b = C.wkt_parse("POLYGON((0 0,16 0,16 16,0 16,0 0))").with_srid(2154)
        assert A.tile_envelope(1, 0, 0, b).srid == 2154
        assert A.tile_envelope(1, 0, 0).srid == 3857


def test_sql_arity(spark):
    from dataclod_spark.functions.spatial_udfs import register_all

    register_all(spark)
    rows = spark.sql(
        """
        SELECT ST_AsText(ST_TileEnvelope(2, 1, 1,
                 ST_GeomFromText('POLYGON((0 0,16 0,16 16,0 16,0 0))'))) AS t4,
               ST_AsText(ST_TileEnvelope(2, 1, 1,
                 ST_GeomFromText('POLYGON((0 0,16 0,16 16,0 16,0 0))'), 0.125)) AS t5,
               ST_AsText(ST_Buffer(
                 ST_GeomFromText('POLYGON((0 0,10 0,10 10,0 10,0 0))'), -2.0)) AS erode
        """
    ).collect()
    assert rows[0].t4 == "POLYGON ((4 8, 4 12, 8 12, 8 8, 4 8))"
    assert rows[0].t5 == "POLYGON ((3.5 7.5, 3.5 12.5, 8.5 12.5, 8.5 7.5, 3.5 7.5))"
    assert "8 8" in rows[0].erode
