"""Geometry model + (E)WKT / (E)WKB / GeoJSON serialization.

Geometry is a single tagged class (2D; Z/M input coordinates are accepted
and dropped, matching the reference's slt behavior — ``ST_X(POINT(1 2 3 4))``
→ 1).  The WKB layout follows the OGC standard with the PostGIS EWKB SRID
flag (0x20000000), mirroring the reference's Geometry extension type over
(E)WKB bytes (``spatial/src/lib.rs:16-20``).
"""

from __future__ import annotations

import json
import math
import re
import struct
from dataclasses import dataclass, field
from typing import Any, Optional

POINT = "Point"
LINESTRING = "LineString"
POLYGON = "Polygon"
MULTIPOINT = "MultiPoint"
MULTILINESTRING = "MultiLineString"
MULTIPOLYGON = "MultiPolygon"
GEOMETRYCOLLECTION = "GeometryCollection"

_WKB_CODE = {
    POINT: 1,
    LINESTRING: 2,
    POLYGON: 3,
    MULTIPOINT: 4,
    MULTILINESTRING: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}
_WKB_KIND = {v: k for k, v in _WKB_CODE.items()}
_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000
_EWKB_M_FLAG = 0x40000000

Coord = tuple[float, float]


@dataclass
class Geometry:
    """Tagged 2D geometry.

    data layout by kind:
      Point               Coord | None (None = EMPTY)
      LineString          list[Coord]
      Polygon             list[list[Coord]]  (first ring = shell)
      MultiPoint          list[Coord]
      MultiLineString     list[list[Coord]]
      MultiPolygon        list[list[list[Coord]]]
      GeometryCollection  list[Geometry]
    """

    kind: str
    data: Any
    srid: int = 0

    # -- structure helpers -------------------------------------------------
    def is_empty(self) -> bool:
        if self.kind == POINT:
            return self.data is None
        if self.kind == GEOMETRYCOLLECTION:
            return all(g.is_empty() for g in self.data) if self.data else True
        return not self.data

    def dimension(self) -> int:
        """Topological dimension (highest component dimension for GC)."""
        if self.kind in (POINT, MULTIPOINT):
            return 0
        if self.kind in (LINESTRING, MULTILINESTRING):
            return 1
        if self.kind in (POLYGON, MULTIPOLYGON):
            return 2
        dims = [g.dimension() for g in self.data if not g.is_empty()]
        return max(dims) if dims else 0

    def points(self) -> list[Coord]:
        """All coordinates (flattened)."""
        if self.kind == POINT:
            return [] if self.data is None else [self.data]
        if self.kind in (LINESTRING, MULTIPOINT):
            return list(self.data)
        if self.kind in (POLYGON, MULTILINESTRING):
            return [p for part in self.data for p in part]
        if self.kind == MULTIPOLYGON:
            return [p for poly in self.data for ring in poly for p in ring]
        return [p for g in self.data for p in g.points()]

    def flatten(self) -> list["Geometry"]:
        """Decompose into simple (non-multi, non-collection) components."""
        if self.kind == POINT:
            return [] if self.data is None else [self]
        if self.kind in (LINESTRING, POLYGON):
            return [self] if self.data else []
        if self.kind == MULTIPOINT:
            return [Geometry(POINT, p, self.srid) for p in self.data]
        if self.kind == MULTILINESTRING:
            return [Geometry(LINESTRING, l, self.srid) for l in self.data if l]
        if self.kind == MULTIPOLYGON:
            return [Geometry(POLYGON, p, self.srid) for p in self.data if p]
        return [s for g in self.data for s in g.flatten()]

    def with_srid(self, srid: int) -> "Geometry":
        return Geometry(self.kind, self.data, srid)


# --------------------------------------------------------------------------
# Number formatting (matches GEOS/Rust f64 Display: shortest repr, integers
# without a decimal point)
# --------------------------------------------------------------------------


def fmt_num(x: float) -> str:
    if x == 0:
        x = 0.0  # normalize -0.0
    if math.isfinite(x) and x == int(x) and abs(x) < 1e16:
        return str(int(x))
    return repr(float(x))


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------


def _wkt_coords(pts: list[Coord]) -> str:
    return ", ".join(f"{fmt_num(x)} {fmt_num(y)}" for x, y in pts)


def wkt_write(g: Geometry) -> str:
    k = g.kind.upper()
    if g.is_empty():
        return f"{k} EMPTY"
    if g.kind == POINT:
        return f"POINT ({_wkt_coords([g.data])})"
    if g.kind == LINESTRING:
        return f"LINESTRING ({_wkt_coords(g.data)})"
    if g.kind == POLYGON:
        rings = ", ".join(f"({_wkt_coords(r)})" for r in g.data)
        return f"POLYGON ({rings})"
    if g.kind == MULTIPOINT:
        pts = ", ".join(f"({_wkt_coords([p])})" for p in g.data)
        return f"MULTIPOINT ({pts})"
    if g.kind == MULTILINESTRING:
        lines = ", ".join(f"({_wkt_coords(l)})" for l in g.data)
        return f"MULTILINESTRING ({lines})"
    if g.kind == MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_wkt_coords(r)})" for r in poly) + ")" for poly in g.data
        )
        return f"MULTIPOLYGON ({polys})"
    parts = ", ".join(wkt_write(sub) for sub in g.data)
    return f"GEOMETRYCOLLECTION ({parts})"


def ewkt_write(g: Geometry) -> str:
    base = wkt_write(g)
    return f"SRID={g.srid};{base}" if g.srid else base


class _Tok:
    def __init__(self, s: str):
        self.toks = re.findall(r"[A-Za-z]+|-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|[(),;=]", s)
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t}, got {got}")


def _parse_coord(tk: _Tok) -> Coord:
    x = float(tk.next())
    y = float(tk.next())
    # swallow optional Z / M ordinates (2D projection, slt: ST_X(POINT(1 2 3 4)))
    while tk.peek() not in (",", ")", None):
        tk.next()
    return (x, y)


def _parse_coord_list(tk: _Tok) -> list[Coord]:
    tk.expect("(")
    pts = [_parse_coord(tk)]
    while tk.peek() == ",":
        tk.next()
        pts.append(_parse_coord(tk))
    tk.expect(")")
    return pts


def _parse_ring_list(tk: _Tok) -> list[list[Coord]]:
    tk.expect("(")
    rings = [_parse_coord_list(tk)]
    while tk.peek() == ",":
        tk.next()
        rings.append(_parse_coord_list(tk))
    tk.expect(")")
    return rings


def wkt_parse(s: str, srid: int = 0) -> Geometry:
    """Parse WKT (or EWKT when it starts with SRID=...)."""
    s = s.strip()
    m = re.match(r"^\s*srid\s*=\s*(\d+)\s*;\s*(.*)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        srid = int(m.group(1))
        s = m.group(2)
    tk = _Tok(s)
    g = _parse_geom(tk)
    if tk.peek() is not None:
        raise ValueError(f"trailing WKT tokens: {tk.peek()}")
    return g.with_srid(srid)


def _parse_geom(tk: _Tok) -> Geometry:
    kw = tk.next().upper()
    # swallow dimension qualifiers
    while tk.peek() and tk.peek().upper() in ("Z", "M", "ZM"):
        tk.next()
    nxt = tk.peek()
    empty = nxt is not None and nxt.upper() == "EMPTY"
    if empty:
        tk.next()
    if kw == "POINT":
        if empty:
            return Geometry(POINT, None)
        tk.expect("(")
        c = _parse_coord(tk)
        tk.expect(")")
        return Geometry(POINT, c)
    if kw == "LINESTRING":
        return Geometry(LINESTRING, [] if empty else _parse_coord_list(tk))
    if kw == "POLYGON":
        return Geometry(POLYGON, [] if empty else _parse_ring_list(tk))
    if kw == "MULTIPOINT":
        if empty:
            return Geometry(MULTIPOINT, [])
        # accept both MULTIPOINT((1 2),(3 4)) and MULTIPOINT(1 2,3 4)
        tk.expect("(")
        pts: list[Coord] = []
        while True:
            if tk.peek() == "(":
                tk.expect("(")
                pts.append(_parse_coord(tk))
                tk.expect(")")
            else:
                pts.append(_parse_coord(tk))
            if tk.peek() == ",":
                tk.next()
                continue
            break
        tk.expect(")")
        return Geometry(MULTIPOINT, pts)
    if kw == "MULTILINESTRING":
        return Geometry(MULTILINESTRING, [] if empty else _parse_ring_list(tk))
    if kw == "MULTIPOLYGON":
        if empty:
            return Geometry(MULTIPOLYGON, [])
        tk.expect("(")
        polys = [_parse_ring_list(tk)]
        while tk.peek() == ",":
            tk.next()
            polys.append(_parse_ring_list(tk))
        tk.expect(")")
        return Geometry(MULTIPOLYGON, polys)
    if kw == "GEOMETRYCOLLECTION":
        if empty:
            return Geometry(GEOMETRYCOLLECTION, [])
        tk.expect("(")
        geoms = [_parse_geom(tk)]
        while tk.peek() == ",":
            tk.next()
            geoms.append(_parse_geom(tk))
        tk.expect(")")
        return Geometry(GEOMETRYCOLLECTION, geoms)
    raise ValueError(f"unknown WKT type {kw}")


# --------------------------------------------------------------------------
# WKB / EWKB (little-endian)
# --------------------------------------------------------------------------


def wkb_write(g: Geometry, with_srid: bool = True) -> bytes:
    out = bytearray()
    _wkb_write_geom(out, g, g.srid if with_srid else 0)
    return bytes(out)


def _wkb_write_geom(out: bytearray, g: Geometry, srid: int) -> None:
    out.append(1)  # little endian
    code = _WKB_CODE[g.kind]
    if srid:
        out += struct.pack("<I", code | _EWKB_SRID_FLAG)
        out += struct.pack("<i", srid)
    else:
        out += struct.pack("<I", code)
    if g.kind == POINT:
        if g.data is None:
            out += struct.pack("<dd", math.nan, math.nan)
        else:
            out += struct.pack("<dd", *g.data)
    elif g.kind in (LINESTRING, MULTIPOINT):
        if g.kind == MULTIPOINT:
            out += struct.pack("<I", len(g.data))
            for p in g.data:
                _wkb_write_geom(out, Geometry(POINT, p), 0)
        else:
            # bulk-pack the coordinate run (one struct call per part, not
            # per point) — byte-identical to the per-point loop
            out += struct.pack("<I", len(g.data))
            out += struct.pack(
                f"<{2 * len(g.data)}d", *[v for p in g.data for v in p]
            )
    elif g.kind == POLYGON:
        out += struct.pack("<I", len(g.data))
        for ring in g.data:
            out += struct.pack("<I", len(ring))
            out += struct.pack(f"<{2 * len(ring)}d", *[v for p in ring for v in p])
    elif g.kind == MULTILINESTRING:
        out += struct.pack("<I", len(g.data))
        for line in g.data:
            _wkb_write_geom(out, Geometry(LINESTRING, line), 0)
    elif g.kind == MULTIPOLYGON:
        out += struct.pack("<I", len(g.data))
        for poly in g.data:
            _wkb_write_geom(out, Geometry(POLYGON, poly), 0)
    else:
        out += struct.pack("<I", len(g.data))
        for sub in g.data:
            _wkb_write_geom(out, sub, 0)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(fmt, self.buf, self.i)
        self.i += size
        return vals


_PT2 = struct.Struct("<dd")


def wkb_parse(buf: bytes) -> Geometry:
    b = bytes(buf)
    # fast path for the dominant shape: little-endian, plain 2-D codes
    # 1/2/3 with no SRID/Z/M flags (exactly what wkb_write emits for
    # srid-0 geometries).  Coordinates are read with ONE bulk unpack per
    # part instead of a Reader + per-coordinate format-string unpack —
    # same values, same Geometry; anything else (flags, big-endian,
    # multi/collection, truncated buffers) falls through to the general
    # reader unchanged.
    if len(b) >= 5 and b[0] == 1:
        code = int.from_bytes(b[1:5], "little")
        if code == 1 and len(b) == 21:
            x, y = _PT2.unpack_from(b, 5)
            if x != x and y != y:  # NaN/NaN marker = POINT EMPTY
                return Geometry(POINT, None, 0)
            return Geometry(POINT, (x, y), 0)
        if code == 2 and len(b) >= 9:
            n = int.from_bytes(b[5:9], "little")
            if len(b) >= 9 + 16 * n:
                flat = struct.unpack_from(f"<{2 * n}d", b, 9)
                return Geometry(
                    LINESTRING, list(zip(flat[0::2], flat[1::2])), 0
                )
        if code == 3 and len(b) >= 9:
            nr = int.from_bytes(b[5:9], "little")
            pos = 9
            rings = []
            ok = True
            for _ in range(nr):
                if len(b) < pos + 4:
                    ok = False
                    break
                m = int.from_bytes(b[pos : pos + 4], "little")
                pos += 4
                if len(b) < pos + 16 * m:
                    ok = False
                    break
                flat = struct.unpack_from(f"<{2 * m}d", b, pos)
                pos += 16 * m
                rings.append(list(zip(flat[0::2], flat[1::2])))
            if ok:
                return Geometry(POLYGON, rings, 0)
    return _wkb_read_geom(_Reader(b))


def _wkb_read_geom(r: _Reader) -> Geometry:
    (byte_order,) = r.read("<B")
    end = "<" if byte_order == 1 else ">"
    (code,) = r.read(f"{end}I")
    srid = 0
    if code & _EWKB_SRID_FLAG:
        code &= ~_EWKB_SRID_FLAG
    else:
        srid = -1  # sentinel: no srid present
    has_z = bool(code & _EWKB_Z_FLAG)
    has_m = bool(code & _EWKB_M_FLAG)
    code &= ~(_EWKB_Z_FLAG | _EWKB_M_FLAG)
    iso_dims = 2
    if code > 1000:  # ISO WKB Z/M offsets
        iso = code // 1000
        code = code % 1000
        if iso in (1, 3):
            has_z = True
        if iso in (2, 3):
            has_m = True
    extra = (1 if has_z else 0) + (1 if has_m else 0)
    if srid != -1:
        (srid,) = r.read(f"{end}i")
    else:
        srid = 0
    kind = _WKB_KIND.get(code)
    if kind is None:
        raise ValueError(f"unknown WKB geometry code {code}")

    def read_coord() -> Coord:
        vals = r.read(f"{end}{2 + extra}d")
        return (vals[0], vals[1])

    if kind == POINT:
        c = read_coord()
        if math.isnan(c[0]) and math.isnan(c[1]):
            return Geometry(POINT, None, srid)
        return Geometry(POINT, c, srid)
    if kind == LINESTRING:
        (n,) = r.read(f"{end}I")
        return Geometry(LINESTRING, [read_coord() for _ in range(n)], srid)
    if kind == POLYGON:
        (n,) = r.read(f"{end}I")
        rings = []
        for _ in range(n):
            (m,) = r.read(f"{end}I")
            rings.append([read_coord() for _ in range(m)])
        return Geometry(POLYGON, rings, srid)
    (n,) = r.read(f"{end}I")
    subs = [_wkb_read_geom(r) for _ in range(n)]
    if kind == MULTIPOINT:
        return Geometry(MULTIPOINT, [s.data for s in subs if s.data is not None], srid)
    if kind == MULTILINESTRING:
        return Geometry(MULTILINESTRING, [s.data for s in subs], srid)
    if kind == MULTIPOLYGON:
        return Geometry(MULTIPOLYGON, [s.data for s in subs], srid)
    return Geometry(GEOMETRYCOLLECTION, subs, srid)


# --------------------------------------------------------------------------
# GeoJSON
# --------------------------------------------------------------------------


def _gj_num(x: float) -> float:
    return float(x)


def _gj_coords(g: Geometry) -> Any:
    if g.kind == POINT:
        return [] if g.data is None else [_gj_num(g.data[0]), _gj_num(g.data[1])]
    if g.kind in (LINESTRING, MULTIPOINT):
        return [[_gj_num(x), _gj_num(y)] for x, y in g.data]
    if g.kind in (POLYGON, MULTILINESTRING):
        return [[[_gj_num(x), _gj_num(y)] for x, y in part] for part in g.data]
    if g.kind == MULTIPOLYGON:
        return [
            [[[_gj_num(x), _gj_num(y)] for x, y in ring] for ring in poly] for poly in g.data
        ]
    raise ValueError("GeometryCollection handled separately")


def geojson_write(g: Geometry) -> str:
    """GeoJSON with floats always carrying a decimal point (slt format:
    {"type":"LineString","coordinates":[[0.0,0.0],...]})."""
    if g.kind == GEOMETRYCOLLECTION:
        parts = ",".join(geojson_write(sub) for sub in g.data)
        return f'{{"type":"GeometryCollection","geometries":[{parts}]}}'
    coords = json.dumps(_gj_coords(g), separators=(",", ":"))
    # json.dumps renders 0.0 as 0.0 only for floats; our _gj_num ensures float
    return f'{{"type":"{g.kind}","coordinates":{coords}}}'


def geojson_parse(s: str) -> Geometry:
    obj = json.loads(s)
    return _geojson_obj(obj)


def _geojson_obj(obj: dict) -> Geometry:
    t = obj["type"]
    if t == "GeometryCollection":
        return Geometry(GEOMETRYCOLLECTION, [_geojson_obj(o) for o in obj["geometries"]])
    c = obj["coordinates"]
    if t == "Point":
        return Geometry(POINT, (float(c[0]), float(c[1])) if c else None)
    if t == "LineString":
        return Geometry(LINESTRING, [(float(x), float(y)) for x, y, *_ in c])
    if t == "Polygon":
        return Geometry(POLYGON, [[(float(x), float(y)) for x, y, *_ in r] for r in c])
    if t == "MultiPoint":
        return Geometry(MULTIPOINT, [(float(x), float(y)) for x, y, *_ in c])
    if t == "MultiLineString":
        return Geometry(
            MULTILINESTRING, [[(float(x), float(y)) for x, y, *_ in l] for l in c]
        )
    if t == "MultiPolygon":
        return Geometry(
            MULTIPOLYGON,
            [[[(float(x), float(y)) for x, y, *_ in r] for r in p] for p in c],
        )
    raise ValueError(f"unknown GeoJSON type {t}")
