"""SQL-path spatial join dispatch — SURVEY.md §2.A.1 / §7 Phase 4 v2.

The reference's optimizer rewrites ``JOIN ... ON ST_Intersects(a.g, b.g)``
into its SpatialJoinExec (``spatial/src/join/planner/optimizer.rs:33-113``;
recognized predicate set incl. the ``ST_Distance(a,b) < d`` pattern in
``spatial_expr_utils.rs:20-76``).  Without that dispatch, Spark plans the
same SQL as a BroadcastNestedLoopJoin evaluating the predicate UDF on the
full cross product — O(n·m) rows through Python.

This module is the Spark-side analogue, applied at the SQL-text level in
``EngineSession.sql`` (the engine's only SQL entry, mirroring where the
reference hooks its logical rewrite): a join whose ON condition is a
recognized spatial predicate is rewritten into the *same* grid equi-join the
DataFrame operator ``operators.spatial_join`` produces —

  1. each side gains ``__bb`` (bbox struct, one Arrow-batched UDF) and
     explodes to its grid cells (pure-JVM quantile-bucket arithmetic over
     boundary literals sampled from the build side);
  2. the ON condition becomes ``a.__cell = b.__cell`` + bbox-overlap
     conjuncts + reference-point dedup + the original predicate as the
     exact refine filter.

Catalyst then plans a shuffled hash / sort-merge join on the cell id with
the refine UDF as a post-join filter — the scalable plan shape — instead of
a nested-loop cross product.

Scope (v1, conservative — anything else falls back to default planning
unchanged, which is always correct, just slower):
* single ``FROM <ident> [AS] a [INNER] JOIN <ident> [AS] b ON <pred>``;
* ``<pred>`` is one of the reference's join predicates over ``alias.column``
  geometry references, optionally AND-ed with extra conjuncts (kept as
  plain join filters);
* inner joins only (outer-join completion stays on the DataFrame API).
"""

from __future__ import annotations

import re
from typing import Optional

# join predicates recognized by the reference's planner
# (spatial_expr_utils.rs:20-76)
_SYMMETRIC = {"st_intersects", "st_touches", "st_overlaps", "st_equals", "bbox_intersects"}
_ASYMMETRIC = {"st_contains", "st_within", "st_covers", "st_coveredby", "st_covered_by"}
_JOIN_PREDICATES = _SYMMETRIC | _ASYMMETRIC

_FROM_JOIN_RE = re.compile(
    r"\bFROM\s+(?P<lt>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<la>[A-Za-z_]\w*)\s+"
    r"(?:INNER\s+)?JOIN\s+(?P<rt>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<ra>[A-Za-z_]\w*)\s+"
    r"ON\s+",
    re.IGNORECASE,
)

_RESERVED_ALIAS = {
    "on", "where", "group", "order", "having", "limit", "join", "inner",
    "left", "right", "full", "cross", "union", "intersect", "except",
}

# ST_Pred(a.g, b.g[, extra literal args])
_PRED_CALL_RE = re.compile(
    r"^(?P<fn>ST_\w+|BBox_Intersects)\s*\(\s*"
    r"(?P<a1>[A-Za-z_]\w*)\.(?P<c1>[A-Za-z_]\w*)\s*,\s*"
    r"(?P<a2>[A-Za-z_]\w*)\.(?P<c2>[A-Za-z_]\w*)\s*"
    r"(?:,\s*(?P<extra>[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)\s*)?\)$",
    re.IGNORECASE,
)

# ST_Distance(a.g, b.g) < d  /  <= d   (spatial_expr_utils.rs:29-36)
_DIST_CMP_RE = re.compile(
    r"^(?P<call>ST_Distance\s*\(\s*[A-Za-z_]\w*\.[A-Za-z_]\w*\s*,\s*"
    r"[A-Za-z_]\w*\.[A-Za-z_]\w*\s*\))\s*(?:<=|<)\s*"
    r"(?P<d>[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)$",
    re.IGNORECASE,
)

_ON_END_KEYWORDS = re.compile(
    r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION|INTERSECT|EXCEPT|WINDOW)\b",
    re.IGNORECASE,
)


def _scan_on_clause(sql: str, start: int) -> tuple[str, int]:
    """Return (on_text, end_index): the ON expression from ``start`` up to
    the next top-level (paren-balanced) clause keyword or end of string."""
    depth = 0
    i = start
    end = len(sql)
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = _ON_END_KEYWORDS.match(sql, i)
            if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                end = i
                break
        i += 1
    return sql[start:end].strip(), end


def _split_top_and(expr: str) -> list[str]:
    """Split an expression on top-level AND keywords."""
    parts: list[str] = []
    depth = 0
    last = 0
    i = 0
    up = expr.upper()
    while i < len(expr):
        ch = expr[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith("AND", i):
            before_ok = i == 0 or not (expr[i - 1].isalnum() or expr[i - 1] == "_")
            after = i + 3
            after_ok = after >= len(expr) or not (expr[after].isalnum() or expr[after] == "_")
            if before_ok and after_ok:
                parts.append(expr[last:i].strip())
                last = after
                i = after
                continue
        i += 1
    parts.append(expr[last:].strip())
    return [p[1:-1].strip() if _is_wrapped(p) else p for p in parts if p]


def _is_wrapped(p: str) -> bool:
    if not (p.startswith("(") and p.endswith(")")):
        return False
    depth = 0
    for i, ch in enumerate(p):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(p) - 1
    return False


def _match_spatial_conjunct(c: str):
    """Recognize one conjunct as a dispatchable spatial predicate.

    Returns (alias1, col1, alias2, col2, expand_distance) or None.
    """
    m = _DIST_CMP_RE.match(c)
    if m:
        inner = _PRED_CALL_RE.match(m.group("call").strip())
        if inner:
            return (
                inner.group("a1"), inner.group("c1"),
                inner.group("a2"), inner.group("c2"),
                float(m.group("d")),
            )
        return None
    m = _PRED_CALL_RE.match(c)
    if not m:
        return None
    fn = m.group("fn").lower()
    if fn == "st_dwithin":
        if m.group("extra") is None:
            return None
        return (
            m.group("a1"), m.group("c1"), m.group("a2"), m.group("c2"),
            float(m.group("extra")),
        )
    if fn in _JOIN_PREDICATES and m.group("extra") is None:
        return m.group("a1"), m.group("c1"), m.group("a2"), m.group("c2"), 0.0
    return None


def _bucket_sql(bounds: list[float], coord: str) -> str:
    """#boundaries <= coord — pure-JVM fold over a literal boundary array
    (same expression ``operators.spatial_join._Grid._bucket`` builds via the
    Column API)."""
    if not bounds:
        return "0"
    arr = "array(" + ", ".join(f"CAST({b!r} AS DOUBLE)" for b in bounds) + ")"
    # lambda variables get engine-reserved names so they can never shadow a
    # user table alias referenced inside ``coord``
    return f"aggregate({arr}, 0, (__acc, __bv) -> __acc + IF(__bv <= {coord}, 1, 0))"


def _cells_sql(grid, expand: float) -> str:
    e = float(expand)
    ix0 = _bucket_sql(grid.xb, f"(__s.__bb.xmin - {e!r})")
    ix1 = _bucket_sql(grid.xb, f"(__s.__bb.xmax + {e!r})")
    iy0 = _bucket_sql(grid.yb, f"(__s.__bb.ymin - {e!r})")
    iy1 = _bucket_sql(grid.yb, f"(__s.__bb.ymax + {e!r})")
    return (
        f"flatten(transform(sequence({ix0}, {ix1}), "
        f"__ix -> transform(sequence({iy0}, {iy1}), __iy -> __ix * {grid.ny} + __iy)))"
    )


def _side_sql(table: str, geom_col: str, grid, expand: float) -> str:
    return (
        f"(SELECT __s.*, explode({_cells_sql(grid, expand)}) AS __cell "
        f"FROM (SELECT *, __st_bbox(`{geom_col}`) AS __bb FROM {table}) __s)"
    )


def try_rewrite_spatial_join(session, sql: str) -> Optional[str]:
    """Rewrite ``FROM a JOIN b ON ST_Pred(...)`` into the grid equi-join.

    ``session`` is the EngineSession (used to sample the build side for the
    grid).  Returns the rewritten SQL, or None when the query does not match
    the conservative dispatch pattern (caller falls back to default
    planning).
    """
    if sql.upper().count("JOIN") != 1:
        return None
    m = _FROM_JOIN_RE.search(sql)
    if not m:
        return None
    lt, la, rt, ra = m.group("lt"), m.group("la"), m.group("rt"), m.group("ra")
    if la.lower() in _RESERVED_ALIAS or ra.lower() in _RESERVED_ALIAS:
        return None
    on_text, on_end = _scan_on_clause(sql, m.end())
    conjuncts = _split_top_and(on_text)
    spatial_idx = None
    parsed = None
    for i, c in enumerate(conjuncts):
        p = _match_spatial_conjunct(c)
        if p is not None:
            spatial_idx = i
            parsed = p
            break
    if parsed is None:
        return None
    a1, c1, a2, c2, expand = parsed
    aliases = {a1.lower(), a2.lower()}
    if aliases != {la.lower(), ra.lower()}:
        return None
    lgeom = c1 if a1.lower() == la.lower() else c2
    rgeom = c2 if a2.lower() == ra.lower() else c1

    from dataclod_spark.operators.spatial_join import _Grid, collect_bbox_sample

    try:
        rdf = session.spark.table(rt)
        ldf = session.spark.table(lt)
    except Exception:
        return None
    if rgeom not in rdf.columns or lgeom not in ldf.columns:
        return None
    sample = collect_bbox_sample(rdf, rgeom) or collect_bbox_sample(ldf, lgeom)
    if not sample:
        sample = [(0.0, 0.0, 1.0, 1.0)]
    grid = _Grid(sample, session.spatial_join_cells)

    e = float(expand)
    bb = lambda a, f: f"{a}.__bb.{f}"  # noqa: E731
    ref_cx = _bucket_sql(grid.xb, f"greatest({bb(la,'xmin')} - {e!r}, {bb(ra,'xmin')})")
    ref_cy = _bucket_sql(grid.yb, f"greatest({bb(la,'ymin')} - {e!r}, {bb(ra,'ymin')})")
    on_parts = [
        f"{la}.__cell = {ra}.__cell",
        f"{bb(la,'xmin')} - {e!r} <= {bb(ra,'xmax')}",
        f"{bb(ra,'xmin')} <= {bb(la,'xmax')} + {e!r}",
        f"{bb(la,'ymin')} - {e!r} <= {bb(ra,'ymax')}",
        f"{bb(ra,'ymin')} <= {bb(la,'ymax')} + {e!r}",
        f"(({ref_cx}) * {grid.ny} + ({ref_cy})) = {la}.__cell",
    ]
    # original predicate (exact refine) + any extra conjuncts ride along as
    # join filters evaluated after the cell equi-join
    on_parts.extend(conjuncts[i] for i in range(len(conjuncts)))
    new_from = (
        f"FROM {_side_sql(lt, lgeom, grid, e)} {la} "
        f"JOIN {_side_sql(rt, rgeom, grid, 0.0)} {ra} "
        f"ON {' AND '.join(on_parts)} "
    )
    return sql[: m.start()] + new_from + sql[on_end:]
