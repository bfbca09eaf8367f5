"""ST_AsMVTGeom — Mapbox-Vector-Tile coordinate transform + clip.

Reimplements the reference's lwgeom-backed implementation
(``spatial/src/function/st_asmvtgeom.rs:23-120``): affine-transform the
geometry into tile-local coordinates (origin top-left, Y down, ``extent``
units across the bounds box), optionally clip to the tile plus ``buffer``
margin, and snap coordinates to integers.  Returns None (SQL NULL) when the
result degenerates to nothing inside the tile.
"""

from __future__ import annotations

from typing import Optional

from dataclod_spark.geo.algos import bounds as geom_bounds
from dataclod_spark.geo.algos import intersection, make_envelope, _map_coords
from dataclod_spark.geo.core import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    POINT,
    POLYGON,
    MULTIPOLYGON,
    Coord,
    Geometry,
)


def _clip_segment(p1: Coord, p2: Coord, box: tuple[float, float, float, float]):
    """Liang–Barsky segment clip; returns clipped (a, b) or None."""
    xmin, ymin, xmax, ymax = box
    x1, y1 = p1
    x2, y2 = p2
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x1 - xmin),
        (dx, xmax - x1),
        (-dy, y1 - ymin),
        (dy, ymax - y1),
    ):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    return (
        (x1 + t0 * dx, y1 + t0 * dy),
        (x1 + t1 * dx, y1 + t1 * dy),
    )


def _clip_lines(lines: list[list[Coord]], box) -> list[list[Coord]]:
    out: list[list[Coord]] = []
    for line in lines:
        cur: list[Coord] = []
        for a, b in zip(line, line[1:]):
            seg = _clip_segment(a, b, box)
            if seg is None:
                if len(cur) >= 2:
                    out.append(cur)
                cur = []
                continue
            ca, cb = seg
            if not cur or cur[-1] != ca:
                if len(cur) >= 2:
                    out.append(cur)
                cur = [ca]
            cur.append(cb)
        if len(cur) >= 2:
            out.append(cur)
    return out


def as_mvt_geom(
    g: Geometry,
    tile_bounds: Geometry,
    extent: int = 4096,
    buffer: int = 256,
    clip: bool = True,
) -> Optional[Geometry]:
    bb = geom_bounds(tile_bounds)
    if bb is None:
        return None
    x0, y0, x1, y1 = bb
    width = x1 - x0
    height = y1 - y0
    if width <= 0 or height <= 0:
        return None

    def fwd(p: Coord) -> Coord:
        return (
            round((p[0] - x0) * extent / width),
            round((y1 - p[1]) * extent / height),
        )

    # transform FIRST in float, clip in tile space, then snap
    def fwd_f(p: Coord) -> Coord:
        return ((p[0] - x0) * extent / width, (y1 - p[1]) * extent / height)

    t = _map_coords(g, fwd_f)
    if clip:
        box = (-float(buffer), -float(buffer), extent + float(buffer), extent + float(buffer))
        if t.dimension() == 2:
            clip_poly = make_envelope(box[0], box[1], box[2], box[3])
            t = intersection(t, clip_poly)
            if t is None or t.is_empty():
                return None
        elif t.kind in (LINESTRING, MULTILINESTRING):
            lines = [t.data] if t.kind == LINESTRING else t.data
            clipped = _clip_lines(lines, box)
            if not clipped:
                return None
            t = (
                Geometry(LINESTRING, clipped[0], g.srid)
                if len(clipped) == 1
                else Geometry(MULTILINESTRING, clipped, g.srid)
            )
        elif t.kind in (POINT, MULTIPOINT):
            pts = [p for p in t.points() if box[0] <= p[0] <= box[2] and box[1] <= p[1] <= box[3]]
            if not pts:
                return None
            t = (
                Geometry(POINT, pts[0], g.srid)
                if len(pts) == 1
                else Geometry(MULTIPOINT, pts, g.srid)
            )

    snapped = _map_coords(t, lambda p: (float(round(p[0])), float(round(p[1]))))
    # drop degenerate snapped output
    if snapped.kind in (LINESTRING, MULTILINESTRING):
        lines = [snapped.data] if snapped.kind == LINESTRING else snapped.data
        lines = [
            [p for i, p in enumerate(l) if i == 0 or p != l[i - 1]] for l in lines
        ]
        lines = [l for l in lines if len(l) >= 2]
        if not lines:
            return None
        snapped = (
            Geometry(LINESTRING, lines[0], g.srid)
            if len(lines) == 1
            else Geometry(MULTILINESTRING, lines, g.srid)
        )
    if snapped.kind in (POLYGON, MULTIPOLYGON):
        from dataclod_spark.geo.algos import area

        if area(snapped) == 0:
            return None
    return snapped.with_srid(0)
