"""ST_ConcaveHull — concave hull of points by edge-length ratio.

Pipeline (the published JTS/GEOS ConcaveHull design): Delaunay triangulation
(Bowyer–Watson), target edge length = min + ratio·(max−min) over all
triangulation edges, then erode border triangles whose longest border edge
exceeds the target, keeping the region simply connected (a border triangle
is only removable if its removal neither pinches — opposite vertex already
on the border — nor disconnects the region).

Output ring is the remaining border walked from the lowest vertex in CW
orientation (this engine's hull convention).
"""

from __future__ import annotations

import heapq
import math
from typing import Optional

from dataclod_spark.geo.core import POLYGON, Coord, Geometry

Tri = tuple[int, int, int]  # vertex indices, sorted


def _circumcircle_contains(pts: list[Coord], tri: Tri, p: Coord) -> bool:
    ax, ay = pts[tri[0]]
    bx, by = pts[tri[1]]
    cx, cy = pts[tri[2]]
    dx, dy = p
    # orientation-normalized in-circumcircle determinant
    d = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if d == 0:
        return False
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    d2 = dx * dx + dy * dy
    m = [
        [ax - dx, ay - dy, a2 - d2],
        [bx - dx, by - dy, b2 - d2],
        [cx - dx, cy - dy, c2 - d2],
    ]
    det = (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )
    return det > 0 if d > 0 else det < 0


def delaunay(pts: list[Coord]) -> list[Tri]:
    """Bowyer–Watson over unique points; returns sorted vertex-index tris."""
    n = len(pts)
    if n < 3:
        return []
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    span = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    midx = (max(xs) + min(xs)) / 2.0
    midy = (max(ys) + min(ys)) / 2.0
    allp = list(pts) + [
        (midx - 30 * span, midy - 10 * span),
        (midx + 30 * span, midy - 10 * span),
        (midx, midy + 30 * span),
    ]
    s1, s2, s3 = n, n + 1, n + 2
    tris: set[Tri] = {tuple(sorted((s1, s2, s3)))}
    for i in range(n):
        p = allp[i]
        bad = [t for t in tris if _circumcircle_contains(allp, t, p)]
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            tris.discard(t)
            for e in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
                edge_count[e] = edge_count.get(e, 0) + 1
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                tris.add(tuple(sorted((a, b, i))))
    return [t for t in tris if all(v < n for v in t)]


def _edges(t: Tri) -> list[tuple[int, int]]:
    return [(t[0], t[1]), (t[0], t[2]), (t[1], t[2])]


def concave_hull(
    points: list[Coord], length_ratio: float, allow_holes: bool = False
) -> Optional[Geometry]:
    uniq: list[Coord] = []
    seen = set()
    for p in points:
        if p not in seen:
            seen.add(p)
            uniq.append(p)
    tris = set(delaunay(uniq))
    if not tris:
        return None

    def elen(e: tuple[int, int]) -> float:
        return math.dist(uniq[e[0]], uniq[e[1]])

    all_edges = {e for t in tris for e in _edges(t)}
    lens = [elen(e) for e in all_edges]
    target = min(lens) + length_ratio * (max(lens) - min(lens))

    edge_tris: dict[tuple[int, int], set[Tri]] = {}
    for t in tris:
        for e in _edges(t):
            edge_tris.setdefault(e, set()).add(t)

    def border_edges_of(t: Tri) -> list[tuple[int, int]]:
        return [e for e in _edges(t) if len(edge_tris[e] & tris) == 1]

    def border_vertices() -> set[int]:
        vs: set[int] = set()
        for t in tris:
            for e in border_edges_of(t):
                vs.update(e)
        return vs

    vertex_tris: dict[int, int] = {}
    for t in tris:
        for v in t:
            vertex_tris[v] = vertex_tris.get(v, 0) + 1

    # erosion queue: border tris keyed by longest border edge (interior tris
    # by longest edge when holes are allowed), largest first
    def tri_size(t: Tri) -> float:
        be = border_edges_of(t)
        if be:
            return max(elen(e) for e in be)
        if allow_holes:
            return max(elen(e) for e in _edges(t))
        return 0.0

    heap: list[tuple[float, Tri]] = []
    for t in tris:
        s = tri_size(t)
        if s > 0:
            heapq.heappush(heap, (-s, t))

    bverts = border_vertices()
    while heap:
        negsize, t = heapq.heappop(heap)
        if t not in tris:
            continue
        size = -negsize
        cur = tri_size(t)
        if cur != size:  # stale entry
            heapq.heappush(heap, (-cur, t))
            continue
        if size <= target:
            break
        be = border_edges_of(t)
        if len(be) == 3:
            continue
        if not be:
            # interior hole seed (allow_holes): removable only if fully
            # interior — no vertex on any border (keeps hole borders apart)
            if not allow_holes or any(v in bverts for v in t):
                continue
        elif len(be) == 1:
            # removable only if the opposite vertex is interior (no pinch)
            opp = next(v for v in t if v not in be[0])
            if opp in bverts:
                continue
        elif len(be) == 2:
            # ear: the apex (shared by both border edges) must survive in
            # another triangle — the hull must contain every input point
            apex = next(v for v in t if v in be[0] and v in be[1])
            if vertex_tris.get(apex, 0) <= 1:
                continue
        # remove
        tris.discard(t)
        for v in t:
            vertex_tris[v] -= 1
        bverts.update(t)
        for e in _edges(t):
            for nb in edge_tris[e] & tris:
                heapq.heappush(heap, (-tri_size(nb), nb))
    # assemble border ring(s)
    border: dict[int, list[int]] = {}
    for t in tris:
        for a, b in border_edges_of(t):
            border.setdefault(a, []).append(b)
            border.setdefault(b, []).append(a)
    if not border:
        return None
    rings: list[list[Coord]] = []
    visited_e: set[frozenset] = set()
    for start in sorted(border):
        for nxt in border[start]:
            if frozenset((start, nxt)) in visited_e:
                continue
            ring = [start]
            prev, cur = start, nxt
            visited_e.add(frozenset((start, nxt)))
            while cur != start:
                ring.append(cur)
                nbrs = [v for v in border[cur] if v != prev]
                if not nbrs:
                    break
                # prefer unvisited edges
                nxt2 = None
                for v in nbrs:
                    if frozenset((cur, v)) not in visited_e:
                        nxt2 = v
                        break
                if nxt2 is None:
                    break
                visited_e.add(frozenset((cur, nxt2)))
                prev, cur = cur, nxt2
            if cur == start and len(ring) >= 3:
                rings.append([uniq[i] for i in ring])
    if not rings:
        return None
    rings.sort(key=lambda r: -abs(_signed_area2(r)))
    shell = rings[0]
    holes = rings[1:] if allow_holes else []
    # orient: shell CW starting at lowest vertex (engine hull convention)
    shell = _orient_ring(shell, ccw=False)
    out_rings = [shell]
    for h in holes:
        out_rings.append(_orient_ring(h, ccw=True))
    return Geometry(POLYGON, out_rings)


def _signed_area2(ring: list[Coord]) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _orient_ring(ring: list[Coord], ccw: bool) -> list[Coord]:
    start = min(range(len(ring)), key=lambda i: (ring[i][1], ring[i][0]))
    r = ring[start:] + ring[:start]
    if (_signed_area2(r) > 0) != ccw:
        r = [r[0]] + list(reversed(r[1:]))
    r.append(r[0])
    return r
