"""Polygon overlay (intersection / union / difference) via arrangement faces.

Classic planar-overlay construction (the same structure GEOS's OverlayNG
computes), in pure Python:

1. **Node** both polygons' boundary segments against each other (split at
   pairwise intersection points, including collinear-overlap endpoints).
2. **Face extraction**: walk the noded planar graph with the leftmost-turn
   rule to enumerate minimal faces (shared with ``algos.build_area``).
3. **Classify** each bounded face by a representative interior point
   against the two ORIGINAL polygons (point-in-polygon).
4. **Dissolve** edges between two kept faces; re-polygonize the remaining
   boundary edges with even-odd nesting (build_area) to get shells+holes.

Output ring orientation/rotation follows this engine's conventions — the
reference's golden corpus has no polygon-overlay WKT records, so only set
semantics (verified by area identities in tests) matter here.
"""

from __future__ import annotations

import math
from typing import Optional

from dataclod_spark.geo.algos import (
    _on_segment,
    _orient,
    _ring_area2,
    _seg_param,
    build_area,
)
from dataclod_spark.geo.core import (
    GEOMETRYCOLLECTION,
    MULTILINESTRING,
    MULTIPOLYGON,
    POLYGON,
    Coord,
    Geometry,
)
from dataclod_spark.geo.predicates import EXTERIOR, _locate_point


def _poly_segments(g: Geometry) -> list[tuple[Coord, Coord]]:
    segs = []
    for comp in g.flatten():
        if comp.kind != POLYGON:
            continue
        for ring in comp.data:
            for a, b in zip(ring, ring[1:]):
                if a != b:
                    segs.append((a, b))
    return segs


def _seg_pair_points(s1: tuple[Coord, Coord], s2: tuple[Coord, Coord]) -> list[Coord]:
    """Canonical intersection point(s) of two segments — computed ONCE per
    pair (with a fixed parameterization) so both segments split at the
    bit-identical coordinate.  Computing the point per-segment yields
    slightly different doubles and disconnects the noded graph."""
    a1, a2 = s1
    b1, b2 = s2
    d1 = _orient(b1, b2, a1)
    d2 = _orient(b1, b2, a2)
    d3 = _orient(a1, a2, b1)
    d4 = _orient(a1, a2, b2)
    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        pts = []
        for p in (b1, b2):
            if _on_segment(a1, a2, p):
                pts.append(p)
        for p in (a1, a2):
            if _on_segment(b1, b2, p):
                pts.append(p)
        return pts
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        denom = (a2[0] - a1[0]) * (b2[1] - b1[1]) - (a2[1] - a1[1]) * (b2[0] - b1[0])
        if denom == 0:
            return []
        t = (
            (b1[0] - a1[0]) * (b2[1] - b1[1]) - (b1[1] - a1[1]) * (b2[0] - b1[0])
        ) / denom
        return [(a1[0] + t * (a2[0] - a1[0]), a1[1] + t * (a2[1] - a1[1]))]
    pts = []
    for p, d in ((b1, d3), (b2, d4)):
        if d == 0 and _on_segment(a1, a2, p):
            pts.append(p)
    for p, d in ((a1, d1), (a2, d2)):
        if d == 0 and _on_segment(b1, b2, p):
            pts.append(p)
    return pts


def node_segments(segs: list[tuple[Coord, Coord]]) -> list[tuple[Coord, Coord]]:
    """Split every segment at all pairwise intersections (canonical points)."""
    splits: dict[int, list[Coord]] = {i: [] for i in range(len(segs))}
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            for p in _seg_pair_points(segs[i], segs[j]):
                # p lies on both segments by construction (modulo FP); an
                # exact-collinearity recheck would reject it and re-create
                # the T-junction this canonical noding exists to prevent
                for k in (i, j):
                    a, b = segs[k]
                    if p != a and p != b:
                        t = _seg_param(a, b, p)
                        if 0.0 < t < 1.0 and p not in splits[k]:
                            splits[k].append(p)
    edges: list[tuple[Coord, Coord]] = []
    seen: set[tuple[Coord, Coord]] = set()
    for i, (a, b) in enumerate(segs):
        pts = sorted(splits[i], key=lambda p: _seg_param(a, b, p))
        chain = [a] + pts + [b]
        for u, v in zip(chain, chain[1:]):
            if u == v or (u, v) in seen or (v, u) in seen:
                continue
            seen.add((u, v))
            edges.append((u, v))
    return edges


def _noded_edges(g1: Geometry, g2: Geometry) -> list[tuple[Coord, Coord]]:
    return node_segments(_poly_segments(g1) + _poly_segments(g2))


def _faces(edges: list[tuple[Coord, Coord]]) -> list[list[Coord]]:
    from dataclod_spark.geo.algos import trace_faces

    return trace_faces(edges)


def _face_rep_point(ring: list[Coord]) -> Coord:
    """Interior point of the face bounded by ``ring`` (nudged from the
    midpoint of its longest edge toward the inside)."""
    best = None
    best_len = -1.0
    for a, b in zip(ring, ring[1:]):
        l = math.dist(a, b)
        if l > best_len:
            best_len = l
            best = (a, b)
    (x1, y1), (x2, y2) = best
    mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    nx, ny = -(y2 - y1), (x2 - x1)
    n = math.hypot(nx, ny) or 1.0
    side = 1.0 if _ring_area2(ring) > 0 else -1.0
    scale = max(best_len, 1.0)
    eps = 1e-9 * scale
    return (mx + side * nx / n * eps, my + side * ny / n * eps)


def make_valid_structure(g: Geometry) -> Optional[Geometry]:
    """Node-splitting MakeValid for invalid (self-intersecting/overlapping)
    polygonal input — GEOS 'linework' semantics: the even-odd fill rule over
    the noded boundary arrangement decides which faces are filled.

    Parity flips across every noded edge, so filled faces are never
    edge-adjacent — each becomes its own output polygon (matching the
    reference's MakeValid goldens structurally).
    """
    if g.dimension() != 2:
        return None
    segs = _poly_segments(g)
    if not segs:
        return None
    # self-node the boundary linework (canonical pairwise points)
    edges = node_segments(segs)

    all_rings = [ring for comp in g.flatten() if comp.kind == POLYGON for ring in comp.data]

    def even_odd(p: Coord) -> bool:
        """Even-odd fill rule: total ray crossings over ALL ring segments."""
        x, y = p
        crossings = 0
        for ring in all_rings:
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                if (y1 > y) != (y2 > y):
                    xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                    if x < xin:
                        crossings += 1
        return crossings % 2 == 1

    cycles = _faces(edges)
    faces = [r for r in cycles if _ring_area2(r) < 0]
    pos_cycles = [r for r in cycles if _ring_area2(r) > 0]
    kept = [f for f in faces if even_odd(_face_rep_point(f))]
    if not kept:
        return Geometry(POLYGON, [], g.srid)
    kept_set = {id(f) for f in kept}
    from dataclod_spark.geo.predicates import INTERIOR, _point_in_ring

    hole_cycles: list[list[Coord]] = []
    for pc in pos_cycles:
        rep = _face_rep_point(pc)
        c_area = abs(_ring_area2(pc))
        parent, parent_area = None, math.inf
        for f in faces:
            a = abs(_ring_area2(f))
            if a <= c_area or a >= parent_area:
                continue
            if _point_in_ring(rep, f) == INTERIOR or _point_in_ring(pc[0], f) == INTERIOR:
                parent, parent_area = f, a
        if parent is not None and id(parent) in kept_set:
            hole_cycles.append((pc, parent))
    # assemble directly: each kept face is its own polygon (parity flips
    # across every edge, so kept faces are never edge-adjacent — dissolving
    # via build_area would re-fill dropped even-parity faces)
    polys: list[list[list[Coord]]] = []
    for f in kept:
        shell_ccw = _ring_area2(f) > 0
        rings = [f]
        for pc, parent in hole_cycles:
            if parent is f:
                h = pc
                if (_ring_area2(h) > 0) == shell_ccw:
                    h = list(reversed(h[:-1])) + [h[-2]]
                rings.append(h)
        polys.append(rings)
    if len(polys) == 1:
        return Geometry(POLYGON, polys[0], g.srid)
    return Geometry(MULTIPOLYGON, polys, g.srid)


def overlay(g1: Geometry, g2: Geometry, op: str) -> Optional[Geometry]:
    """Polygon overlay: op in {intersection, union, difference}."""
    if g1.dimension() != 2 or g2.dimension() != 2:
        return None
    edges = _noded_edges(g1, g2)
    all_cycles = _faces(edges)
    # bounded face outlines are CW under the sharpest-right-turn trace (see
    # algos.trace_faces) → negative signed area; positive cycles are either
    # the unbounded face or hole-side boundaries of faces containing holes
    faces = [r for r in all_cycles if _ring_area2(r) < 0]
    pos_cycles = [r for r in all_cycles if _ring_area2(r) > 0]

    def keep(face: list[Coord]) -> bool:
        p = _face_rep_point(face)
        in1 = _locate_point(p, g1) != EXTERIOR
        in2 = _locate_point(p, g2) != EXTERIOR
        if op == "intersection":
            return in1 and in2
        if op == "union":
            return in1 or in2
        if op == "difference":
            return in1 and not in2
        raise ValueError(op)

    kept = [f for f in faces if keep(f)]
    if not kept:
        return Geometry(POLYGON, [], g1.srid)
    kept_set = {id(f) for f in kept}
    # assign each hole-side cycle to its parent face (smallest CW outline
    # containing it); a hole cycle of a KEPT face contributes its edges to
    # that region's boundary (the inner ring of an annulus face)
    from dataclod_spark.geo.predicates import INTERIOR, _point_in_ring

    hole_cycles_of_kept: list[list[Coord]] = []
    for pc in pos_cycles:
        rep = _face_rep_point(pc)
        c_area = abs(_ring_area2(pc))
        parent = None
        parent_area = math.inf
        for f in faces:
            a = abs(_ring_area2(f))
            # a hole cycle is strictly smaller than its containing outline —
            # this also rejects the unbounded face's cycle (which CONTAINS
            # the faces rather than being contained)
            if a <= c_area or a >= parent_area:
                continue
            if (
                _point_in_ring(rep, f) == INTERIOR
                or _point_in_ring(pc[0], f) == INTERIOR
            ):
                parent = f
                parent_area = a
        if parent is not None and id(parent) in kept_set:
            hole_cycles_of_kept.append(pc)
    # dissolve: boundary edges are those used by exactly one kept region
    # cycle (face outlines + their hole-side cycles)
    count: dict[frozenset, int] = {}
    for f in kept + hole_cycles_of_kept:
        for a, b in zip(f, f[1:]):
            k = frozenset((a, b))
            count[k] = count.get(k, 0) + 1
    boundary: list[list[Coord]] = []
    emitted: set[frozenset] = set()
    for f in kept + hole_cycles_of_kept:
        for a, b in zip(f, f[1:]):
            k = frozenset((a, b))
            if count[k] == 1 and k not in emitted:
                emitted.add(k)
                boundary.append([a, b])
    # assemble directly from the DIRECTED boundary edges.  Each surviving
    # edge was emitted as traversed by its (unique) kept cycle, and kept
    # cycles — CW face outlines and CCW hole-side cycles alike — always
    # carry the kept region on the traversal's RIGHT.  Tracing this
    # directed graph with the leftmost-turn rule (first outgoing edge
    # counterclockwise from the reversed incoming direction) therefore
    # never crosses between two kept regions that merely touch at a
    # vertex, and ring orientation alone classifies the result: CW ring
    # (kept on the right = inside) → SHELL, CCW ring → HOLE of the
    # smallest shell containing it.  (The previous even-odd
    # re-polygonization — build_area — could not express a kept face
    # inside another kept face's HOLE: a polygon lying in the hole of the
    # other operand sits at even ring depth next to not-kept hole
    # remnants, and parity fills the wrong faces.)
    outs: dict[Coord, list[tuple[Coord, Coord]]] = {}
    for a, b in ((seg[0], seg[1]) for seg in boundary):
        outs.setdefault(a, []).append((a, b))
    used: set[tuple[Coord, Coord]] = set()
    shells: list[list[Coord]] = []
    holes: list[list[Coord]] = []
    for seg in boundary:
        e0 = (seg[0], seg[1])
        if e0 in used:
            continue
        ring = [e0[0]]
        e = e0
        while True:
            used.add(e)
            ring.append(e[1])
            v = e[1]
            rev = math.atan2(e[0][1] - v[1], e[0][0] - v[0])
            nxt, best = None, math.inf
            for cand in outs.get(v, ()):  # leftmost turn: min CCW angle
                if cand in used and cand != e0:
                    continue
                ang = math.atan2(cand[1][1] - v[1], cand[1][0] - v[0])
                d = (ang - rev) % (2 * math.pi)
                if d == 0.0:
                    d = 2 * math.pi  # U-turn only as a last resort
                if d < best:
                    best, nxt = d, cand
            if nxt is None or nxt == e0:
                break
            e = nxt
        if ring[0] != ring[-1] or _ring_area2(ring) == 0:
            continue  # open walk (degenerate input) or zero area: drop
        (shells if _ring_area2(ring) < 0 else holes).append(ring)
    if not shells:
        return Geometry(POLYGON, [], g1.srid)
    owners: dict[int, int] = {}  # hole index -> shell index
    for hi, h in enumerate(holes):
        owner, owner_area = None, math.inf
        hrep = _face_rep_point(h)
        ha = abs(_ring_area2(h))
        for si, s in enumerate(shells):
            a = abs(_ring_area2(s))
            if a >= owner_area or a <= ha:
                continue
            if _point_in_ring(hrep, s) == INTERIOR:
                owner, owner_area = si, a
        if owner is not None:
            owners[hi] = owner
    polys: list[list[list[Coord]]] = []
    for si, shell in enumerate(shells):
        # orientation invariant by construction of the face walk: shells
        # are CW (_ring_area2 < 0) and holes CCW (> 0) — see the
        # shells/holes split above; downstream consumers (_poly_area,
        # the predicates) are orientation-agnostic, so no re-orientation
        rings = [shell]
        for hi, h in enumerate(holes):
            if owners.get(hi) != si:
                continue
            rings.append(h)
        polys.append(rings)
    if len(polys) == 1:
        return Geometry(POLYGON, polys[0], g1.srid).with_srid(g1.srid)
    return Geometry(MULTIPOLYGON, polys, g1.srid).with_srid(g1.srid)
