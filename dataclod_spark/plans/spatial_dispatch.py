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

Scope (conservative — anything else falls back to default planning
unchanged, which is always correct, just slower):
* single ``FROM <rel> [AS] a [INNER] JOIN <rel> [AS] b ON <pred>`` where
  ``<rel>`` is a named relation — a table, temp view, or a CTE defined in
  the query's own WITH clause (resolved against the WITH prefix);
* ``<pred>`` is one of the reference's join predicates over ``alias.column``
  geometry references, optionally AND-ed with extra conjuncts (kept as
  plain join filters);
* LEFT/RIGHT/FULL OUTER spatial joins (single spatial conjunct) route
  through the DataFrame operator's outer completion
  (:func:`try_outer_spatial_join`): the joined frame is registered as a
  temp view and the statement's alias-qualified references are rewritten
  against it — mirroring ``optimizer.rs:33-113`` + ``exec.rs:47-131``
  supporting every join type.
"""

from __future__ import annotations

import itertools
import re
from typing import Optional

from dataclod_spark.plans.rewrites import scan_noncode_span

# join predicates recognized by the reference's planner
# (spatial_expr_utils.rs:20-76)
_SYMMETRIC = {
    "st_intersects", "st_touches", "st_overlaps", "st_equals",
    "st_crosses", "bbox_intersects",
}
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
    r"[A-Za-z_]\w*\.[A-Za-z_]\w*\s*\))\s*(?P<op><=|<)\s*"
    r"(?P<d>[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)$",
    re.IGNORECASE,
)

# fn name -> exact-verdict predicate key (``bbox`` = the bbox conjuncts ARE
# the whole predicate; no refine stage at all)
_PRED_KEY = {
    "st_intersects": "intersects",
    "bbox_intersects": "bbox",
    "st_touches": "touches",
    "st_overlaps": "overlaps",
    "st_crosses": "crosses",
    "st_equals": "equals",
    "st_contains": "contains",
    "st_within": "within",
    "st_covers": "covers",
    "st_coveredby": "covered_by",
    "st_covered_by": "covered_by",
    "st_dwithin": "dwithin",
    "st_distance": "dwithin",
}

_ON_END_KEYWORDS = re.compile(
    r"\b(WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION|INTERSECT|EXCEPT|WINDOW"
    r"|(?:LEFT|RIGHT|FULL|INNER|CROSS)\s+(?:OUTER\s+)?JOIN|JOIN)\b",
    re.IGNORECASE,
)


def _scan_on_clause(sql: str, start: int) -> tuple[str, int]:
    """Return (on_text, end_index): the ON expression from ``start`` up to
    the next top-level (paren-balanced) clause keyword or end of string.
    Literal/comment spans are skipped via the shared scanner so a ``(``
    or clause keyword inside a string cannot corrupt the scan."""
    depth = 0
    i = start
    end = len(sql)
    while i < len(sql):
        kind, j = scan_noncode_span(sql, i)
        if kind is not None:
            i = j
            continue
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                # closing paren of an ENCLOSING group (the join sits inside
                # a derived table / CTE body): the ON expression ends here
                end = i
                break
        elif depth == 0:
            m = _ON_END_KEYWORDS.match(sql, i)
            if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                end = i
                break
        i += 1
    return sql[start:end].strip(), end


def _split_top_and(expr: str) -> list[str]:
    """Split an expression on top-level AND keywords (outside literals)."""
    parts: list[str] = []
    depth = 0
    last = 0
    i = 0
    up = expr.upper()
    while i < len(expr):
        kind, j = scan_noncode_span(expr, i)
        if kind is not None:
            i = j
            continue
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


def _split_top_commas(expr: str) -> list[str]:
    """Split a select list on top-level commas (outside parens/literals)."""
    parts: list[str] = []
    depth, last, i = 0, 0, 0
    while i < len(expr):
        kind, j = scan_noncode_span(expr, i)
        if kind is not None:
            i = j
            continue
        ch = expr[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(expr[last:i])
            last = i + 1
        i += 1
    parts.append(expr[last:])
    return parts


def _paren_depth_at(sql: str, pos: int) -> int:
    """Paren depth of code position ``pos`` (literals/comments skipped)."""
    depth, i = 0, 0
    while i < pos:
        kind, j = scan_noncode_span(sql, i)
        if kind is not None:
            i = j
            continue
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    return depth


def _subquery_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) index pairs of every parenthesized ``(SELECT …)``
    group — subqueries and CTE bodies; expression parens are excluded."""
    spans: list[tuple[int, int]] = []
    stack: list[int] = []
    i, n = 0, len(sql)
    while i < n:
        kind, j = scan_noncode_span(sql, i)
        if kind is not None:
            i = j
            continue
        ch = sql[i]
        if ch == "(":
            stack.append(i)
        elif ch == ")" and stack:
            s = stack.pop()
            k = s + 1
            while k < i:
                kd, j2 = scan_noncode_span(sql, k)
                if kd is not None:
                    k = j2
                    continue
                if sql[k].isspace():
                    k += 1
                    continue
                break
            if re.match(r"SELECT\b", sql[k:i], re.IGNORECASE):
                spans.append((s, i))
        i += 1
    return spans


def _noncode_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) index pairs of every literal/comment span."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        kind, j = scan_noncode_span(sql, i)
        if kind is not None:
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _search_code(pattern: re.Pattern, sql: str) -> Optional[re.Match]:
    """First match of ``pattern`` whose start lies OUTSIDE every literal
    and comment — a ``FROM x JOIN y`` inside a string must not anchor a
    rewrite against the wrong (or non-existent) relations."""
    spans = _noncode_spans(sql)
    for m in pattern.finditer(sql):
        if not any(s <= m.start() < e for s, e in spans):
            return m
    return None


def _code_text(fragment: str) -> str:
    """``fragment`` with comments removed (string literals kept verbatim),
    for matching select-list items: ``* -- note`` must still be
    recognized as a bare star, or the unexpanded star would leak the
    rewrite's internal columns."""
    out: list[str] = []
    i, n = 0, len(fragment)
    while i < n:
        kind, j = scan_noncode_span(fragment, i)
        if kind in ("line", "block"):
            out.append(" ")
            i = j
        elif kind is not None:
            out.append(fragment[i:j])
            i = j
        else:
            out.append(fragment[i])
            i += 1
    return "".join(out).strip()


def _setop_positions(sql: str) -> list[int]:
    """Indexes of every depth-0 UNION/INTERSECT/EXCEPT keyword (outside
    literals) — the set-op arm boundaries of the statement."""
    out: list[int] = []
    i, depth, n = 0, 0, len(sql)
    while i < n:
        kind, j = scan_noncode_span(sql, i)
        if kind is not None:
            i = j
            continue
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "UIEuie":
            m = re.match(r"(UNION|INTERSECT|EXCEPT)\b", sql[i:], re.IGNORECASE)
            if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                out.append(i)
        i += 1
    return out


def _arm_bounds(sql: str, pos: int) -> tuple[int, int]:
    """(start, end) of the set-op arm containing position ``pos``.
    View-rewriting dispatches substitute alias references only within
    this window — the other arms have their own FROMs whose identical
    aliases must stay untouched."""
    start, end = 0, len(sql)
    for p in _setop_positions(sql):
        if p <= pos:
            start = p
        else:
            end = p
            break
    return start, end


def _has_top_level_setop(sql: str) -> bool:
    """True when a depth-0 UNION/INTERSECT/EXCEPT exists outside literals
    — each set-op arm has its own FROM, so single-relation rewrites must
    decline rather than attach the first arm's table metadata to every
    arm's predicates.  One scanner: ``_setop_positions`` IS the
    definition (a second hand-rolled copy of the scan drifted once —
    review find, round 5)."""
    return bool(_setop_positions(sql))


def _cols_sql(alias: str, cols: list[str]) -> str:
    """Explicit alias-qualified column list for a star expansion."""
    return ", ".join(f"{alias}.`{c}`" for c in cols)


_SELECT_KW_RE = re.compile(r"\bSELECT\b", re.IGNORECASE)
# aliases may be backtick-quoted (`b`.*) — \b can't sit before a backtick,
# so the any-position form uses a lookbehind instead
_ALIAS_STAR_RE = re.compile(r"^`?([A-Za-z_]\w*)`?\s*\.\s*\*$")
_ALIAS_STAR_ANY_RE = re.compile(r"(?<![\w`])`?([A-Za-z_]\w*)`?\s*\.\s*\*")
_COUNT_STAR_RE = re.compile(r"\bcount\s*\(\s*\*\s*\)", re.IGNORECASE)
_ARG_STAR_RE = re.compile(r"[(,]\s*\*\s*[),]")


def _star_leaks_into_expression(code: str, expansions: dict[str, str]) -> bool:
    """True when a select-list item that is NOT itself a star would still
    expand one inside an expression — ``struct(a.*)`` / ``xxhash64(*)``:
    after the FROM is replaced by the derived grid side, such stars
    silently gain the rewrite's internal ``__cell``/``__bb*`` columns
    (review find, round 5).  ``count(*)`` is exempt (it counts rows, no
    schema).  ``a * b`` multiplication never sits in argument position
    (``(``/``,`` before AND ``)``/``,`` after), so it never trips this.

    String literals and comments are blinded first (a regex literal
    ``'b.*'`` or ``'(*)'`` inside instr() is data, not a star — matching
    it falsely declined the dispatch, which for OUTER spatial joins means
    an unplannable fallback: second-pass review find, round 5); backtick
    identifier spans stay visible so quoted alias stars are caught."""
    out: list[str] = []
    i, n = 0, len(code)
    while i < n:
        kind, j = scan_noncode_span(code, i)
        if kind is not None:
            # blind literals to a LETTER, not a space: a space placeholder
            # turned ('a' * 'b') into '(  *  )', which the argument-
            # position star regex matched — a real multiplication of two
            # literals falsely declined the dispatch (third-pass find)
            out.append(code[i:j] if code[i] == "`" else "L")
            i = j
            continue
        out.append(code[i])
        i += 1
    blinded = "".join(out)
    for am in _ALIAS_STAR_ANY_RE.finditer(blinded):
        if am.group(1).lower() in expansions:
            return True
    return bool(_ARG_STAR_RE.search(_COUNT_STAR_RE.sub("count(1)", blinded)))


def _expand_select_stars(
    prefix: str, expansions: dict[str, str], all_sides: Optional[list[str]]
) -> Optional[str]:
    """Expand ``*`` / ``alias.*`` items of the select list OWNING the FROM
    being rewritten to explicit column lists.  The grid rewrite substitutes
    derived relations carrying internal ``__cell``/``__bb``/``__ix0``/
    ``__iy0`` columns, so a star over a rewritten side would silently
    change the query's output schema.

    ``prefix`` is everything before the FROM being rewritten (may include a
    WITH chain and enclosing subqueries).  The owning select list is the
    LAST ``SELECT`` at the same paren depth as the FROM (= the depth at the
    end of the prefix): when the spatial join sits inside a derived table
    ``(SELECT * FROM a JOIN b ON ST_..) q``, the inner star is the one that
    must expand — earlier same-depth SELECTs belong to already-closed
    sibling groups.  ``expansions`` maps lowercased alias → explicit column
    SQL; ``all_sides`` is the full left-to-right expansion for a bare
    ``*``, or None when the caller cannot produce one (bare ``*`` then
    returns None = decline the dispatch).  Items that are not exactly ``*``
    or ``alias.*`` after comment stripping pass through byte-identical (a
    depth-0 ``*`` inside an expression is multiplication; ``count(*)``
    sits inside parens); when nothing matches, the prefix is returned
    unchanged."""
    from_depth = _paren_depth_at(prefix, len(prefix))
    # locate the owning SELECT: last SELECT keyword at the FROM's depth
    depth, i, sel_end = 0, 0, None
    while i < len(prefix):
        kind, j = scan_noncode_span(prefix, i)
        if kind is not None:
            i = j
            continue
        ch = prefix[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == from_depth:
            m = _SELECT_KW_RE.match(prefix, i)
            if m and (i == 0 or not (prefix[i - 1].isalnum() or prefix[i - 1] == "_")):
                sel_end = m.end()
                i = m.end()
                continue
        i += 1
    if sel_end is None:
        return prefix  # no owning select list (shouldn't happen) — unchanged
    head, body = prefix[:sel_end], prefix[sel_end:]
    lead = ""
    lm = re.match(r"\s*(DISTINCT|ALL)\b", body, re.IGNORECASE)
    if lm:
        lead, body = body[: lm.end()], body[lm.end() :]
    items = _split_top_commas(body)
    out_items: list[str] = []
    changed = False
    for it in items:
        s = _code_text(it)
        if s == "*":
            if all_sides is None:
                return None
            out_items.append(" " + ", ".join(all_sides))
            changed = True
            continue
        am = _ALIAS_STAR_RE.match(s)
        if am and am.group(1).lower() in expansions:
            out_items.append(" " + expansions[am.group(1).lower()])
            changed = True
        else:
            if _star_leaks_into_expression(s, expansions):
                return None  # decline the dispatch — schema would change
            # byte-identical pass-through: stripping would detach a
            # trailing `-- comment` from its newline and comment out the
            # FROM clause the caller appends
            out_items.append(it)
    if not changed:
        return prefix
    return head + lead + ",".join(out_items) + " "


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

    Returns (alias1, col1, alias2, col2, expand_distance, pred_key, strict)
    or None.  ``strict`` marks the ``ST_Distance(..) < d`` form (boundary
    excluded); the ``<=`` / ST_DWithin forms are inclusive.
    """
    m = _DIST_CMP_RE.match(c)
    if m:
        inner = _PRED_CALL_RE.match(m.group("call").strip())
        if inner:
            return (
                inner.group("a1"), inner.group("c1"),
                inner.group("a2"), inner.group("c2"),
                float(m.group("d")), "dwithin", m.group("op") == "<",
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
            float(m.group("extra")), "dwithin", False,
        )
    if fn in _JOIN_PREDICATES and m.group("extra") is None:
        return (
            m.group("a1"), m.group("c1"), m.group("a2"), m.group("c2"),
            0.0, _PRED_KEY[fn], False,
        )
    return None


def _verdict_sql(key: str, b1: str, b2: str, e: float = 0.0, strict: bool = False) -> str:
    """SQL spelling of ``operators.spatial_join.exact_verdict`` over two
    ``__bb`` struct references — the exact predicate for bbox-exact pairs
    (point / axis rectangle), decided fully JVM-side.  ``b1``/``b2`` follow
    the predicate's argument order (g1 = b1's geometry)."""
    return _verdict_sql_fields(
        key,
        (f"{b1}.xmin", f"{b1}.ymin", f"{b1}.xmax", f"{b1}.ymax"),
        (f"{b2}.xmin", f"{b2}.ymin", f"{b2}.xmax", f"{b2}.ymax"),
        e,
        strict,
    )


def _verdict_sql_fields(
    key: str,
    lf: tuple[str, str, str, str],
    rf: tuple[str, str, str, str],
    e: float = 0.0,
    strict: bool = False,
) -> str:
    """:func:`_verdict_sql` over explicit (xmin, ymin, xmax, ymax) SQL
    field expressions — shared with the filter pushdown's exact
    elimination so the boundary semantics (open intervals for point
    within/contains) cannot drift between the two paths."""
    lx0, ly0, lx1, ly1 = lf
    rx0, ry0, rx1, ry1 = rf
    lpt = f"({lx0} = {lx1} AND {ly0} = {ly1})"
    rpt = f"({rx0} = {rx1} AND {ry0} = {ry1})"
    overlap = f"({lx0} <= {rx1} AND {rx0} <= {lx1} AND {ly0} <= {ry1} AND {ry0} <= {ly1})"
    eq = f"({lx0} = {rx0} AND {lx1} = {rx1} AND {ly0} = {ry0} AND {ly1} = {ry1})"
    l_in_r = f"({rx0} <= {lx0} AND {lx1} <= {rx1} AND {ry0} <= {ly0} AND {ly1} <= {ry1})"
    r_in_l = f"({lx0} <= {rx0} AND {rx1} <= {lx1} AND {ly0} <= {ry0} AND {ry1} <= {ly1})"
    l_in_r_open = f"({rx0} < {lx0} AND {lx1} < {rx1} AND {ry0} < {ly0} AND {ly1} < {ry1})"
    r_in_l_open = f"({lx0} < {rx0} AND {rx1} < {lx1} AND {ly0} < {ry0} AND {ry1} < {ly1})"
    if key in ("intersects", "bbox"):
        return overlap
    if key == "equals":
        return eq
    if key == "covered_by":
        return l_in_r
    if key == "covers":
        return r_in_l
    if key == "within":
        return (
            f"(CASE WHEN {lpt} AND {rpt} THEN {eq} "
            f"WHEN {lpt} THEN {l_in_r_open} "
            f"WHEN {rpt} THEN false ELSE {l_in_r} END)"
        )
    if key == "contains":
        return (
            f"(CASE WHEN {lpt} AND {rpt} THEN {eq} "
            f"WHEN {rpt} THEN {r_in_l_open} "
            f"WHEN {lpt} THEN false ELSE {r_in_l} END)"
        )
    if key == "touches":
        degen = (
            f"(greatest({lx0}, {rx0}) = least({lx1}, {rx1}) "
            f"OR greatest({ly0}, {ry0}) = least({ly1}, {ry1}))"
        )
        l_on_r = f"({overlap} AND ({lx0} = {rx0} OR {lx0} = {rx1} OR {ly0} = {ry0} OR {ly0} = {ry1}))"
        r_on_l = f"({overlap} AND ({rx0} = {lx0} OR {rx0} = {lx1} OR {ry0} = {ly0} OR {ry0} = {ly1}))"
        return (
            f"(CASE WHEN {lpt} AND {rpt} THEN false "
            f"WHEN {lpt} THEN {l_on_r} WHEN {rpt} THEN {r_on_l} "
            f"ELSE ({overlap} AND {degen}) END)"
        )
    if key == "overlaps":
        proper = (
            f"(greatest({lx0}, {rx0}) < least({lx1}, {rx1}) "
            f"AND greatest({ly0}, {ry0}) < least({ly1}, {ry1}))"
        )
        return (
            f"(CASE WHEN {lpt} OR {rpt} THEN false "
            f"ELSE ({proper} AND NOT {l_in_r} AND NOT {r_in_l}) END)"
        )
    if key == "crosses":
        # bbox-exact pairs are points/axis-rects: crosses is always false
        # (equal non-lineal dims, or point fully covered by the rect)
        return "false"
    if key == "dwithin":
        dx = f"greatest({lx0} - {rx1}, {rx0} - {lx1}, CAST(0.0 AS DOUBLE))"
        dy = f"greatest({ly0} - {ry1}, {ry0} - {ly1}, CAST(0.0 AS DOUBLE))"
        op = "<" if strict else "<="
        return f"(({dx}) * ({dx}) + ({dy}) * ({dy}) {op} CAST({e * e!r} AS DOUBLE))"
    raise ValueError(f"unknown predicate key {key}")


def _bucket_sql(bounds: list[float], coord: str) -> str:
    """#boundaries <= coord as a flat sum of CASE terms — a plain
    expression tree that stays inside whole-stage codegen (same shape as
    ``operators.spatial_join._Grid._bucket``; a higher-order ``aggregate``
    over a literal array is evaluated interpreted and is ~10x slower in
    the hot join path)."""
    if not bounds:
        return "0"
    return "(" + " + ".join(
        f"(CASE WHEN {coord} >= CAST({b!r} AS DOUBLE) THEN 1 ELSE 0 END)"
        for b in bounds
    ) + ")"


def _side_sql(
    table: str,
    geom_col: str,
    grid,
    expand: float,
    repartition: int | None = None,
    bbox_meta=None,
) -> str:
    """Derived relation with ``__bb`` + one ``__cell`` row per grid cell the
    (expanded) bbox intersects — two plain explode(sequence(..)) generators,
    mirroring ``_Grid.explode_cells``.  The min cell indices stay exposed as
    ``__ix0``/``__iy0`` so the per-pair reference-point dedup in the ON
    clause is O(1) (bucket is monotone: bucket(max) = max(bucket)).

    ``repartition`` injects a REPARTITION hint below the bbox UDF when the
    source scan has fewer splits than the cluster's parallelism (the
    DataFrame path's parallelism guard; a no-op at scale).

    ``bbox_meta`` (session.register_bbox) replaces the ``__st_bbox`` pandas
    UDF with pure codegen expressions over the view's own columns — the
    bbox pass then costs zero Python (and lets Catalyst prune the geometry
    column entirely when the refine stage is skipped too)."""
    e = float(expand)
    src = table
    if repartition:
        src = f"(SELECT /*+ REPARTITION({int(repartition)}) */ * FROM {table})"
    if bbox_meta is not None:
        # flat codegen columns straight from the registered expressions
        flat = (
            f"(SELECT *, CAST(({bbox_meta.xmin}) AS DOUBLE) AS __bbx0, "
            f"CAST(({bbox_meta.ymin}) AS DOUBLE) AS __bby0, "
            f"CAST(({bbox_meta.xmax}) AS DOUBLE) AS __bbx1, "
            f"CAST(({bbox_meta.ymax}) AS DOUBLE) AS __bby1, "
            f"{'true' if bbox_meta.exact else 'false'} AS __bbe FROM {src})"
        )
    else:
        flat = (
            f"(SELECT * EXCEPT (__bb), __bb.xmin AS __bbx0, __bb.ymin AS __bby0, "
            f"__bb.xmax AS __bbx1, __bb.ymax AS __bby1, __bb.bbox_exact AS __bbe FROM "
            f"(SELECT *, __st_bbox(`{geom_col}`) AS __bb FROM {src}))"
        )
    ix0 = _bucket_sql(grid.xb, f"(__bbx0 - {e!r})")
    ix1 = _bucket_sql(grid.xb, f"(__bbx1 + {e!r})")
    iy0 = _bucket_sql(grid.yb, f"(__bby0 - {e!r})")
    iy1 = _bucket_sql(grid.yb, f"(__bby1 + {e!r})")
    # the bbox rides through the explodes as FLAT doubles; the __bb struct is
    # rebuilt above the Generates (struct extraction over a top-level
    # named_struct folds in SimplifyExtractValueOps — pushing extraction
    # through Generate trips Catalyst's nested-column aliasing instead)
    return (
        f"(SELECT * EXCEPT (__cx, __cy, __ix1, __iy1, __bbx0, __bby0, __bbx1, __bby1, __bbe), "
        f"__cx * {grid.ny} + __cy AS __cell, "
        f"named_struct('xmin', __bbx0, 'ymin', __bby0, 'xmax', __bbx1, 'ymax', __bby1, "
        f"'bbox_exact', __bbe) AS __bb FROM "
        f"(SELECT __s3.*, explode(sequence(__s3.__iy0, __s3.__iy1)) AS __cy FROM "
        f"(SELECT __s2.*, explode(sequence(__s2.__ix0, __s2.__ix1)) AS __cx FROM "
        f"(SELECT *, {ix0} AS __ix0, {ix1} AS __ix1, {iy0} AS __iy0, {iy1} AS __iy1 FROM "
        f"{flat} __s1) __s2) __s3) __s4)"
    )


_WITH_START_RE = re.compile(r"^\s*WITH\s+", re.IGNORECASE)
_CTE_HEAD_RE = re.compile(r"\s*(?P<name>[A-Za-z_]\w*)\s+AS\s*\(", re.IGNORECASE)

_outer_view_counter = itertools.count()


def _parse_with_prefix(sql: str) -> tuple[str, list[str]]:
    """Split a leading ``WITH a AS (...), b AS (...)`` prefix off ``sql``.

    Returns (prefix_text, cte_names); prefix_text is '' when the query has
    no WITH clause.  Only simple (non-recursive, unparenthesized-name) CTE
    lists are recognized — anything else returns ('', [])."""
    m = _WITH_START_RE.match(sql)
    if not m:
        return "", []
    pos = m.end()
    names: list[str] = []
    while True:
        h = _CTE_HEAD_RE.match(sql, pos)
        if not h:
            return "", []
        names.append(h.group("name"))
        depth = 1
        i = h.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            return "", []
        pos = i
        nxt = re.match(r"\s*,", sql[pos:])
        if nxt:
            pos += nxt.end()
            continue
        return sql[:pos], names


def _resolve_relation(session, sql: str, name: str):
    """DataFrame for a join side: a CTE from the query's own WITH prefix,
    else a catalog table/view (planned but unexecuted — used for schema
    checks, grid sampling, and the outer path's operator input).  CTE
    lookup comes FIRST: SQL scoping lets a CTE shadow a catalog table of
    the same name, and resolving the catalog table instead would run the
    outer spatial join against the unfiltered base relation."""
    prefix, names = _parse_with_prefix(sql)
    if prefix and name.lower() in {n.lower() for n in names}:
        try:
            return session.spark.sql(f"{prefix} SELECT * FROM {name}")
        except Exception:
            return None
    try:
        return session.spark.table(name)
    except Exception:
        return None


def _meta_cols_exprs(meta):
    from pyspark.sql import functions as F

    return tuple(F.expr(x) for x in (meta.xmin, meta.ymin, meta.xmax, meta.ymax))


def _get_grid(session, rt, rgeom, rdf, rmeta, ldf, lgeom, lmeta):
    """Session-cached quantile grid sampled from the build (right) side,
    falling back to the probe side when the build sample is empty."""
    from dataclod_spark.operators.spatial_join import (
        auto_cell_target,
        collect_bbox_sample,
        collect_bbox_sample_cols,
        _Grid,
    )

    cache_key = (rt.lower(), rgeom.lower(), session.spatial_join_cells)
    grid = getattr(session, "_grid_cache", {}).get(cache_key)
    if grid is not None:
        return grid
    if rmeta is not None:
        sample = collect_bbox_sample_cols(rdf, _meta_cols_exprs(rmeta))
    else:
        sample = collect_bbox_sample(rdf, rgeom)
    if not sample:
        if lmeta is not None:
            sample = collect_bbox_sample_cols(ldf, _meta_cols_exprs(lmeta))
        else:
            sample = collect_bbox_sample(ldf, lgeom)
    if not sample:
        sample = [(0.0, 0.0, 1.0, 1.0)]
    cells = session.spatial_join_cells or auto_cell_target(sample)
    grid = _Grid(sample, cells)
    if hasattr(session, "_grid_cache"):
        session._grid_cache[cache_key] = grid
    return grid


def _grid_on_parts(
    la, ra, a1, c1, a2, c2, grid, e, pred_key, strict,
    lmeta, rmeta, conjuncts, spatial_idx,
) -> list[str]:
    """ON-clause conjuncts of the grid equi-join: cell equality, bbox
    overlap, reference-point dedup, predicate-specific bbox tightening, the
    NULL-masked exact refine, and any extra user conjuncts."""
    bb = lambda a, f: f"{a}.__bb.{f}"  # noqa: E731
    on_parts = [
        f"{la}.__cell = {ra}.__cell",
        f"{bb(la,'xmin')} - {e!r} <= {bb(ra,'xmax')}",
        f"{bb(ra,'xmin')} <= {bb(la,'xmax')} + {e!r}",
        f"{bb(la,'ymin')} - {e!r} <= {bb(ra,'ymax')}",
        f"{bb(ra,'ymin')} <= {bb(la,'ymax')} + {e!r}",
        # reference-point dedup from the precomputed min cell indices —
        # O(1) per pair (bucket is monotone, so the intersection corner's
        # bucket is the max of the two sides' min indices)
        f"(greatest({la}.__ix0, {ra}.__ix0) * {grid.ny}"
        f" + greatest({la}.__iy0, {ra}.__iy0)) = {la}.__cell",
    ]
    # predicate-direction bbox refs (a1 holds the predicate's 1st argument)
    b1 = f"{a1}.__bb"
    b2 = f"{a2}.__bb"
    # necessary bbox tightening per predicate (any geometry)
    if pred_key in ("within", "covered_by"):
        on_parts.append(
            f"({b2}.xmin <= {b1}.xmin AND {b1}.xmax <= {b2}.xmax "
            f"AND {b2}.ymin <= {b1}.ymin AND {b1}.ymax <= {b2}.ymax)"
        )
    elif pred_key in ("contains", "covers"):
        on_parts.append(
            f"({b1}.xmin <= {b2}.xmin AND {b2}.xmax <= {b1}.xmax "
            f"AND {b1}.ymin <= {b2}.ymin AND {b2}.ymax <= {b1}.ymax)"
        )
    elif pred_key == "equals":
        on_parts.append(
            f"({b1}.xmin = {b2}.xmin AND {b1}.xmax = {b2}.xmax "
            f"AND {b1}.ymin = {b2}.ymin AND {b1}.ymax = {b2}.ymax)"
        )

    # the spatial conjunct itself: bbox-exact pairs (points / axis rects)
    # resolve with the pure-JVM verdict; only the rest cross into the ST_*
    # pandas UDF, with NULL-masked inputs so the batch carries no geometry
    # bytes for JVM-decided pairs (≈ the reference's point/rect refine fast
    # paths; optimizer.rs keeps the predicate as the refine filter)
    if pred_key == "bbox":
        spatial_sql = None  # the bbox conjuncts ARE the predicate
    elif lmeta is not None and lmeta.exact and rmeta is not None and rmeta.exact:
        # both sides declared bbox-exact: the pure-JVM verdict IS the exact
        # predicate — no refine stage, and (if unprojected) the geometry
        # column is pruned from the scan entirely
        spatial_sql = _verdict_sql(pred_key, b1, b2, e, strict)
    else:
        both = f"({bb(la,'bbox_exact')} AND {bb(ra,'bbox_exact')})"
        verdict = _verdict_sql(pred_key, b1, b2, e, strict)
        g1 = f"IF(NOT {both}, {a1}.`{c1}`, NULL)"
        g2 = f"IF(NOT {both}, {a2}.`{c2}`, NULL)"
        dm = _DIST_CMP_RE.match(conjuncts[spatial_idx])
        if dm:
            masked = f"ST_Distance({g1}, {g2}) {dm.group('op')} {dm.group('d')}"
        else:
            pm = _PRED_CALL_RE.match(conjuncts[spatial_idx])
            extra = f", {pm.group('extra')}" if pm.group("extra") else ""
            masked = f"{pm.group('fn')}({g1}, {g2}{extra})"
        spatial_sql = f"IF({both}, {verdict}, coalesce({masked}, false))"
    if spatial_sql is not None:
        on_parts.append(spatial_sql)
    # any extra conjuncts ride along as join filters after the cell
    # equi-join — re-parenthesized: _split_top_and strips a conjunct's
    # wrapping parens, and an OR spliced bare into the AND-joined ON
    # clause would change precedence (silently wrong rows)
    on_parts.extend(
        f"({conjuncts[i]})" for i in range(len(conjuncts)) if i != spatial_idx
    )
    return on_parts


def try_rewrite_spatial_join(session, sql: str) -> Optional[str]:
    """Rewrite ``FROM a JOIN b ON ST_Pred(...)`` into the grid equi-join.

    ``session`` is the EngineSession (used to sample the build side for the
    grid).  Returns the rewritten SQL, or None when the query does not match
    the conservative dispatch pattern (caller falls back to default
    planning).

    Multi-join queries dispatch when the FIRST join of the chain is the
    spatial one (``FROM a JOIN b ON ST_pred(..) JOIN dim d ON ..``): the
    ON-clause scan stops at the next top-level JOIN keyword, so only the
    spatial segment is rewritten and the remaining joins ride along
    verbatim (left-associative parse order is unchanged).
    """
    m = _search_code(_FROM_JOIN_RE, sql)
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
    a1, c1, a2, c2, expand, pred_key, strict = parsed
    aliases = {a1.lower(), a2.lower()}
    if aliases != {la.lower(), ra.lower()}:
        return None
    lgeom = c1 if a1.lower() == la.lower() else c2
    rgeom = c2 if a2.lower() == ra.lower() else c1

    from pyspark.sql import functions as F

    from dataclod_spark.operators.spatial_join import (
        _Grid,
        collect_bbox_sample,
        collect_bbox_sample_cols,
    )

    rdf = _resolve_relation(session, sql, rt)
    ldf = _resolve_relation(session, sql, lt)
    if rdf is None or ldf is None:
        return None
    if rgeom not in rdf.columns or lgeom not in ldf.columns:
        return None
    # registered bbox expressions (session.register_bbox): bbox pass and
    # grid sampling become pure JVM on that side
    lmeta = session.bbox_meta(lt, lgeom) if hasattr(session, "bbox_meta") else None
    rmeta = session.bbox_meta(rt, rgeom) if hasattr(session, "bbox_meta") else None

    def _meta_cols(meta):
        return tuple(F.expr(x) for x in (meta.xmin, meta.ymin, meta.xmax, meta.ymax))

    grid = _get_grid(session, rt, rgeom, rdf, rmeta, ldf, lgeom, lmeta)

    # parallelism guard (mirrors the DataFrame operator): repartition a
    # single-split local source up to the cluster's parallelism
    par = session.spark.sparkContext.defaultParallelism
    lpar = par if ldf.rdd.getNumPartitions() < par else None
    rpar = par if rdf.rdd.getNumPartitions() < par else None

    e = float(expand)
    on_parts = _grid_on_parts(
        la, ra, a1, c1, a2, c2, grid, e, pred_key, strict,
        lmeta, rmeta, conjuncts, spatial_idx,
    )
    new_from = (
        f"FROM {_side_sql(lt, lgeom, grid, e, lpar, lmeta)} {la} "
        f"JOIN {_side_sql(rt, rgeom, grid, 0.0, rpar, rmeta)} {ra} "
        f"ON {' AND '.join(on_parts)} "
    )
    # the derived sides carry internal __cell/__bb columns: stars in the
    # outer select list must expand to the ORIGINAL columns or the result
    # schema silently changes.  A bare `*` is only expandable when the two
    # spatial relations are the WHOLE from-list: with ride-along joins
    # after the rewritten ON, [lsql, rsql] would drop the later relations'
    # columns — decline and let default planning keep the schema.
    lsql, rsql = _cols_sql(la, ldf.columns), _cols_sql(ra, rdf.columns)
    tail_has_join = re.match(
        r"\s*(?:(?:LEFT|RIGHT|FULL|INNER|CROSS)\s+(?:OUTER\s+)?)?JOIN\b",
        sql[on_end:],
        re.IGNORECASE,
    )
    prefix = _expand_select_stars(
        sql[: m.start()],
        {la.lower(): lsql, ra.lower(): rsql},
        None if tail_has_join else [lsql, rsql],
    )
    if prefix is None:
        return None
    return prefix + new_from + sql[on_end:]


_CHAIN_FROM_RE = re.compile(
    r"\bFROM\s+(?P<t>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<a>[A-Za-z_]\w*)\s+",
    re.IGNORECASE,
)
_CHAIN_JOIN_RE = re.compile(
    r"\s*(?:INNER\s+)?JOIN\s+(?P<t>[A-Za-z_][\w.]*)\s+(?:AS\s+)?"
    r"(?P<a>[A-Za-z_]\w*)\s+ON\s+",
    re.IGNORECASE,
)


def try_chain_spatial_join(session, sql: str) -> Optional[str]:
    """Dispatch a spatial join sitting at ANY position of an inner-join
    chain — ``FROM dim d JOIN pts p ON d.k = p.k JOIN boxes b ON
    ST_Pred(p.geom, b.geom)`` — where :func:`try_rewrite_spatial_join`
    only handles the chain's first join.

    The reference's optimizer rule matches the spatial Join node wherever
    it appears in the logical plan (``optimizer.rs:33-113``); this is the
    SQL-text equivalent: parse the FROM chain of named inner-join
    relations, find the first ON carrying a spatial conjunct between the
    newly joined alias and any earlier alias, swap both relations for
    their cell-exploded derived forms, and rewrite that ON into the grid
    equi-join.  Earlier/later joins ride along verbatim — the exploded
    copies of the probe side are collapsed by the reference-point dedup in
    the rewritten ON, so inner-chain multiplicities are unchanged.
    """
    fm = _search_code(_CHAIN_FROM_RE, sql)
    if not fm or fm.group("a").lower() in _RESERVED_ALIAS:
        return None
    # rels: (table, alias, span of the "table alias" text)
    rels = [(fm.group("t"), fm.group("a"), (fm.start("t"), fm.end("a")))]
    joins = []  # (table, alias, rel_span, on_span, on_text)
    pos = fm.end("a")
    while True:
        jm = _CHAIN_JOIN_RE.match(sql, pos)
        if not jm:
            break
        if jm.group("a").lower() in _RESERVED_ALIAS:
            return None
        on_text, on_end = _scan_on_clause(sql, jm.end())
        rels.append((jm.group("t"), jm.group("a"), (jm.start("t"), jm.end("a"))))
        joins.append((jm.group("t"), jm.group("a"), (jm.start("t"), jm.end("a")),
                      (jm.end(), on_end), on_text))
        pos = on_end
    if len(joins) < 2:
        return None  # single-join chains are try_rewrite_spatial_join's case
    aliases = [a.lower() for _, a, _ in rels]
    if len(set(aliases)) != len(aliases):
        return None

    for k in range(1, len(joins)):  # k=0 == first join == already handled
        jt, ja, jrel_span, jon_span, jon_text = joins[k]
        conjuncts = _split_top_and(jon_text)
        for si, c in enumerate(conjuncts):
            p = _match_spatial_conjunct(c)
            if p is None:
                continue
            a1, c1, a2, c2, expand, pred_key, strict = p
            pair = {a1.lower(), a2.lower()}
            if ja.lower() not in pair:
                continue
            other = (pair - {ja.lower()}).pop() if len(pair) == 2 else None
            if other is None or other not in aliases[: k + 1]:
                continue
            ra = ja
            la_idx = aliases.index(other)
            lt, la, lrel_span = rels[la_idx][0], rels[la_idx][1], rels[la_idx][2]
            lgeom = c1 if a1.lower() == la.lower() else c2
            rgeom = c2 if a2.lower() == ra.lower() else c1
            ldf = _resolve_relation(session, sql, lt)
            rdf = _resolve_relation(session, sql, jt)
            if ldf is None or rdf is None:
                return None
            if lgeom not in ldf.columns or rgeom not in rdf.columns:
                return None
            lmeta = session.bbox_meta(lt, lgeom) if hasattr(session, "bbox_meta") else None
            rmeta = session.bbox_meta(jt, rgeom) if hasattr(session, "bbox_meta") else None
            grid = _get_grid(session, jt, rgeom, rdf, rmeta, ldf, lgeom, lmeta)
            par = session.spark.sparkContext.defaultParallelism
            lpar = par if ldf.rdd.getNumPartitions() < par else None
            rpar = par if rdf.rdd.getNumPartitions() < par else None
            e = float(expand)
            on_parts = _grid_on_parts(
                la, ra, a1, c1, a2, c2, grid, e, pred_key, strict,
                lmeta, rmeta, conjuncts, si,
            )
            # splice: both relation texts swapped for their exploded forms,
            # the spatial ON replaced, everything else verbatim
            pieces = [
                (lrel_span, f"{_side_sql(lt, lgeom, grid, e, lpar, lmeta)} {la}"),
                (jrel_span, f"{_side_sql(jt, rgeom, grid, 0.0, rpar, rmeta)} {ra}"),
                (jon_span, " AND ".join(on_parts) + " "),
            ]
            pieces.sort(key=lambda pr: pr[0][0])
            out, cur = [], 0
            for (s0, s1), txt in pieces:
                out.append(sql[cur:s0])
                out.append(txt)
                cur = s1
            out.append(sql[cur:])
            rewritten = "".join(out)
            # star discipline for the two swapped (derived) sides; a bare
            # `*` would need every chain relation's columns — decline and
            # let default planning produce the correct schema
            prefix = _expand_select_stars(
                sql[: fm.start()],
                {la.lower(): _cols_sql(la, ldf.columns),
                 ra.lower(): _cols_sql(ra, rdf.columns)},
                None,
            )
            if prefix is None:
                return None
            return prefix + rewritten[fm.start():]
    return None


_OUTER_FROM_JOIN_RE = re.compile(
    r"\bFROM\s+(?P<lt>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<la>[A-Za-z_]\w*)\s+"
    r"(?P<jt>LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?"
    r"JOIN\s+(?P<rt>[A-Za-z_][\w.]*)\s+(?:AS\s+)?(?P<ra>[A-Za-z_]\w*)\s+"
    r"ON\s+",
    re.IGNORECASE,
)

# asymmetric predicates flip when the SQL lists the right alias's geometry
# as the predicate's first argument
_SWAPPED = {
    "contains": "within",
    "within": "contains",
    "covers": "covered_by",
    "covered_by": "covers",
    "intersects": "intersects",
    "touches": "touches",
    "overlaps": "overlaps",
    "equals": "equals",
    "crosses": "crosses",
    "dwithin": "dwithin",
}


# identifiers an extra outer-join conjunct may contain besides
# alias-qualified column refs: operators/keywords and total scalar
# functions.  Anything else (unqualified columns, subqueries, UDFs)
# declines the dispatch — conservative by construction.
_OUTER_CONJ_ALLOWED = {
    "and", "or", "not", "is", "null", "in", "between", "like", "rlike",
    "true", "false", "case", "when", "then", "else", "end", "cast", "as",
    "int", "bigint", "integer", "smallint", "tinyint", "double", "float",
    "decimal", "string", "varchar", "boolean", "date", "timestamp",
    "abs", "coalesce", "nullif", "greatest", "least", "mod", "pmod",
    "round", "floor", "ceil", "ceiling", "sign", "sqrt", "pow", "power",
    "upper", "lower", "length", "substr", "substring", "concat", "trim",
    "ltrim", "rtrim", "instr", "left", "right", "lpad", "rpad", "split",
    "year", "month", "day", "hour", "minute", "second", "to_date",
    "to_timestamp", "date_add", "date_sub", "datediff", "if", "ifnull",
    "nvl", "exp", "ln", "log", "log10", "log2",
}

_IDENT_RE = re.compile(r"[A-Za-z_]\w*")


def _map_outer_conjunct(
    c: str, la: str, ra: str, lcols: set, rcols: set
) -> Optional[str]:
    """Map an extra ON conjunct's ``alias.col`` references onto the
    spatial-join OUTPUT columns (left names; right names suffixed
    ``_right`` on overlap), validating that every other identifier is a
    whitelisted keyword/function.  Returns the mapped SQL expression, or
    None when the conjunct is out of the conservative scope."""
    qual_re = re.compile(
        rf"\b(?P<al>{re.escape(la)}|{re.escape(ra)})\s*\.\s*`?(?P<col>\w+)`?",
        re.IGNORECASE,
    )
    bad = False

    def _sub(mm: re.Match) -> str:
        nonlocal bad
        al, col = mm.group("al").lower(), mm.group("col")
        if al == la.lower():
            if col not in lcols:
                bad = True
                return mm.group(0)
            return f"`{col}`"
        if col not in rcols:
            bad = True
            return mm.group(0)
        return f"`{col}_right`" if col in lcols else f"`{col}`"

    # substitute outside literals/comments only
    out: list[str] = []
    i, n = 0, len(c)
    while i < n:
        kind, j = scan_noncode_span(c, i)
        if kind is not None:
            out.append(c[i:j])
            i = j
            continue
        mm = qual_re.match(c, i)
        if mm:
            out.append(_sub(mm))
            i = mm.end()
            continue
        out.append(c[i])
        i += 1
    if bad:
        return None
    mapped = "".join(out)
    # validate the residue of the ORIGINAL conjunct: skip string literals
    # and comments, skip the alias-qualified refs we substituted, then
    # (a) DECLINE on any other backtick span — an unqualified backticked
    # column (`flag` = 1) is an identifier, not a literal, and stripping
    # it as a quote span let it bypass the whitelist entirely: a query
    # Spark would reject as ambiguous got silently rewritten against the
    # join output (review find, round 5) — and (b) whitelist every
    # remaining bare identifier
    residue: list[str] = []
    i = 0
    while i < len(c):
        mm = qual_re.match(c, i)
        if mm:
            i = mm.end()
            continue
        kind, j = scan_noncode_span(c, i)
        if kind is not None:
            if c[i] == "`":
                return None
            i = j
            continue
        residue.append(c[i])
        i += 1
    for ident in _IDENT_RE.findall("".join(residue)):
        if ident.lower() not in _OUTER_CONJ_ALLOWED:
            return None
    return mapped


def try_outer_spatial_join(session, sql: str) -> Optional[str]:
    """Rewrite ``FROM a LEFT|RIGHT|FULL JOIN b ON ST_Pred(...)`` through the
    DataFrame spatial-join operator (which owns outer completion —
    anti-join recovery of unmatched rows), exposed back to SQL as a temp
    view with the statement's alias-qualified references rewritten.

    Scope: one spatial conjunct plus optional extra conjuncts over the two
    aliases (routed to the operator's ``extra_condition`` join filter —
    ON-clause semantics, applied before outer completion); named
    relations; no ``ST_Distance < d`` strict form (the operator's dwithin
    is boundary-inclusive).  Subsequent joins after the outer spatial one
    ride along against the temp view.  Without this dispatch these
    queries are not merely slow but UNPLANNABLE: Spark rejects a Python
    UDF in an outer-join condition outright.
    Returns the rewritten SQL or None (fall back to default planning)."""
    m = _search_code(_OUTER_FROM_JOIN_RE, sql)
    if not m:
        return None
    lt, la, rt, ra = m.group("lt"), m.group("la"), m.group("rt"), m.group("ra")
    how = m.group("jt").lower()
    if la.lower() in _RESERVED_ALIAS or ra.lower() in _RESERVED_ALIAS:
        return None
    on_text, on_end = _scan_on_clause(sql, m.end())
    conjuncts = _split_top_and(on_text)
    spatial_idx, parsed = None, None
    for ci, c in enumerate(conjuncts):
        p_ = _match_spatial_conjunct(c)
        if p_ is not None:
            if spatial_idx is not None:
                return None  # two spatial conjuncts — out of scope
            spatial_idx, parsed = ci, p_
    if parsed is None:
        return None
    extra = [c for ci, c in enumerate(conjuncts) if ci != spatial_idx]
    a1, c1, a2, c2, expand, pred_key, strict = parsed
    if strict or pred_key == "bbox":
        return None
    aliases = {a1.lower(), a2.lower()}
    if aliases != {la.lower(), ra.lower()}:
        return None
    if a1.lower() == la.lower():
        lgeom, rgeom, predicate = c1, c2, pred_key
    else:
        lgeom, rgeom, predicate = c2, c1, _SWAPPED[pred_key]

    ldf = _resolve_relation(session, sql, lt)
    rdf = _resolve_relation(session, sql, rt)
    if ldf is None or rdf is None:
        return None
    if lgeom not in ldf.columns or rgeom not in rdf.columns:
        return None
    extra_cond = None
    if extra:
        lcols_set, rcols_set = set(ldf.columns), set(rdf.columns)
        mapped_parts = []
        for c in extra:
            mc = _map_outer_conjunct(c, la, ra, lcols_set, rcols_set)
            if mc is None:
                return None
            mapped_parts.append(f"({mc})")
        extra_cond = " AND ".join(mapped_parts)

    from pyspark.sql import functions as F

    from dataclod_spark.operators.spatial_join import spatial_join

    lmeta = session.bbox_meta(lt, lgeom) if hasattr(session, "bbox_meta") else None
    rmeta = session.bbox_meta(rt, rgeom) if hasattr(session, "bbox_meta") else None

    def _meta_bbox(meta):
        if meta is None:
            return None
        return tuple(F.expr(x) for x in (meta.xmin, meta.ymin, meta.xmax, meta.ymax))

    refine = (
        "none"
        if (lmeta is not None and lmeta.exact and rmeta is not None and rmeta.exact)
        else "auto"
    )

    lcols = set(ldf.columns)

    def _map_ref(alias: str, col: str) -> str:
        if alias.lower() == la.lower():
            return col
        return f"{col}_right" if col in lcols else col

    # star discipline FIRST — before the eager join build: the view's
    # overlap columns carry the _right suffix, so `b.*` (and b's slice of
    # a bare `*`) must alias them BACK to the original names or the
    # result schema silently changes; and when the expansion declines,
    # declining HERE means no grid-sampling jobs ran and no temp view
    # leaked for a query we then hand back to default planning (review
    # find, round 5).
    star_l = ", ".join(f"`{c}`" for c in ldf.columns)
    star_r = ", ".join(
        f"`{m_}` AS `{c}`" if (m_ := _map_ref(ra, c)) != c else f"`{c}`"
        for c in rdf.columns
    )
    tail_has_join = re.match(
        r"\s*(?:(?:LEFT|RIGHT|FULL|INNER|CROSS)\s+(?:OUTER\s+)?)?JOIN\b",
        sql[on_end:],
        re.IGNORECASE,
    )
    prefix = _expand_select_stars(
        sql[: m.start()],
        {la.lower(): star_l, ra.lower(): star_r},
        None if tail_has_join else [star_l, star_r],
    )
    if prefix is None:
        return None

    joined = spatial_join(
        ldf,
        rdf,
        predicate,
        left_geom=lgeom,
        right_geom=rgeom,
        how=how,
        distance=(expand if predicate == "dwithin" else None),
        cell_target=getattr(session, "spatial_join_cells", None),
        left_bbox=_meta_bbox(lmeta),
        right_bbox=_meta_bbox(rmeta),
        refine=refine,
        extra_condition=extra_cond,
    )
    view = f"__spatial_outer_join_{next(_outer_view_counter)}"
    joined.createOrReplaceTempView(view)
    rest = prefix + f"FROM {view} " + sql[on_end:]
    # rewrite remaining alias-qualified references (a.x / b.`x` / a.* in
    # clauses outside the owning select list) against the view — but only
    # within THIS set-op arm: a later UNION/INTERSECT/EXCEPT arm has its
    # own FROM whose identical aliases must stay untouched (the fixpoint
    # loop in session.sql rewrites that arm on its own pass)
    arm_start, cut = _arm_bounds(rest, len(prefix))
    head, arm, rest_tail = rest[:arm_start], rest[arm_start:cut], rest[cut:]
    arm = re.sub(
        rf"\b{re.escape(la)}\.\*", star_l.replace("`", ""), arm, flags=re.IGNORECASE
    )
    arm = re.sub(
        rf"\b{re.escape(ra)}\.\*",
        ", ".join(_map_ref(ra, c) for c in rdf.columns),
        arm,
        flags=re.IGNORECASE,
    )
    arm = re.sub(
        rf"\b({re.escape(la)}|{re.escape(ra)})\.`?(\w+)`?",
        lambda mm: _map_ref(mm.group(1), mm.group(2)),
        arm,
        flags=re.IGNORECASE,
    )
    return head + arm + rest_tail


_EXISTS_RE = re.compile(
    r"\bFROM\s+(?P<lt>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?P<la>[A-Za-z_]\w*))?\s+"
    r"WHERE\s+(?P<neg>NOT\s+)?EXISTS\s*\(",
    re.IGNORECASE,
)

_EXISTS_SUB_RE = re.compile(
    r"^\s*SELECT\s+.+?\s+FROM\s+(?P<rt>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?"
    r"(?P<ra>[A-Za-z_]\w*))?\s+WHERE\s+(?P<conds>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def try_exists_spatial_join(session, sql: str) -> Optional[str]:
    """Rewrite a correlated spatial ``[NOT] EXISTS`` into the grid
    semi/anti join.

    The reference's SpatialJoinExec supports semi/anti join types
    (``spatial/src/join/exec.rs:47-131``) and its optimizer rewrites any
    join shape carrying a spatial predicate — including the ExistenceJoins
    DataFusion decorrelates ``EXISTS`` subqueries into
    (``optimizer.rs:33-113``).  Without dispatch, Spark plans

        SELECT .. FROM a WHERE [NOT] EXISTS
          (SELECT 1 FROM b WHERE ST_Pred(a.g, b.g))

    as a BroadcastNestedLoopJoin ExistenceJoin running the predicate UDF
    over the full cross product.  This routes it through the DataFrame
    operator's ``left_semi`` / ``left_anti`` path (same grid build/probe,
    same refine) and rewrites the statement against a temp view.

    Scope (conservative): the outer FROM is a single named relation and the
    EXISTS is the first WHERE predicate (optionally ``AND <rest>`` after
    it, which stays a post-filter on the outer side); the subquery is
    ``SELECT .. FROM <rel> <alias> WHERE <spatial pred> [AND <right-only
    conjuncts>]`` — right-only conjuncts become a pre-filter on the inner
    side; any conjunct touching the outer alias beyond the spatial
    predicate falls back.
    """
    m = _search_code(_EXISTS_RE, sql)
    if not m:
        return None
    lt, la, neg = m.group("lt"), m.group("la"), bool(m.group("neg"))
    if la is None:
        la = lt  # no alias: the subquery correlates by table name
    elif la.lower() in _RESERVED_ALIAS:
        return None
    # balanced-paren scan for the subquery body
    depth = 1
    i = m.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    sub, sub_end = sql[m.end() : i - 1], i
    sm = _EXISTS_SUB_RE.match(sub)
    if not sm:
        return None
    rt, ra, conds = sm.group("rt"), sm.group("ra"), sm.group("conds")
    if ra is None:
        ra = rt  # no alias: predicate references the inner table name
    elif ra.lower() in _RESERVED_ALIAS:
        return None
    if ra.lower() == la.lower():
        return None
    conjuncts = _split_top_and(conds)
    spatial_idx, parsed = None, None
    for ci, c in enumerate(conjuncts):
        p = _match_spatial_conjunct(c)
        if p is not None and {p[0].lower(), p[2].lower()} == {la.lower(), ra.lower()}:
            spatial_idx, parsed = ci, p
            break
    if parsed is None:
        return None
    a1, c1, a2, c2, expand, pred_key, strict = parsed
    if strict or pred_key == "bbox":
        return None
    if a1.lower() == la.lower():
        lgeom, rgeom, predicate = c1, c2, pred_key
    else:
        lgeom, rgeom, predicate = c2, c1, _SWAPPED[pred_key]

    ldf = _resolve_relation(session, sql, lt)
    rdf = _resolve_relation(session, sql, rt)
    if ldf is None or rdf is None:
        return None
    if lgeom not in ldf.columns or rgeom not in rdf.columns:
        return None

    # classify non-spatial conjuncts: inner-only refs become a pre-filter
    # on the inner side (cheapest); conjuncts correlating the outer alias
    # route through the inner-join + row-id path below (Spark itself cannot
    # plan these at all — PYTHON_UDF_IN_ON_CLAUSE — so there is no slower
    # fallback to fall back to); bare identifiers that could name an
    # outer-only column are ambiguous → fall back to default planning's
    # error, which names the real problem
    lcols_lower = {c.lower() for c in ldf.columns}
    rcols_lower = {c.lower() for c in rdf.columns}
    extras = [c for ci, c in enumerate(conjuncts) if ci != spatial_idx]
    right_filters: list[str] = []
    correlated_filters: list[str] = []
    for extra in extras:
        refs = re.findall(r"\b([A-Za-z_]\w*)\s*\.\s*`?(\w+)`?", extra)
        aliases = {a.lower() for a, _ in refs}
        if not aliases <= {la.lower(), ra.lower()}:
            return None
        for a, col in refs:
            have = lcols_lower if a.lower() == la.lower() else rcols_lower
            if col.lower() not in have:
                return None
        stripped = re.sub(
            rf"\b(?:{re.escape(la)}|{re.escape(ra)})\s*\.\s*`?\w+`?", "", extra,
            flags=re.IGNORECASE,
        )
        bare = {b.lower() for b in re.findall(r"\b[A-Za-z_]\w*\b", stripped)}
        if la.lower() in aliases:
            if bare & (lcols_lower | rcols_lower):
                return None
            correlated_filters.append(extra)
        else:
            if (bare & lcols_lower) - rcols_lower:
                return None
            right_filters.append(
                re.sub(
                    rf"\b{re.escape(ra)}\s*\.\s*(`?\w+`?)", r"\1", extra,
                    flags=re.IGNORECASE,
                )
            )

    from pyspark.sql import functions as F

    from dataclod_spark.operators.spatial_join import spatial_join

    for flt in right_filters:
        try:
            rdf = rdf.where(flt)
        except Exception:
            return None

    lmeta = session.bbox_meta(lt, lgeom) if hasattr(session, "bbox_meta") else None
    rmeta = session.bbox_meta(rt, rgeom) if hasattr(session, "bbox_meta") else None

    def _meta_bbox(meta):
        if meta is None:
            return None
        return tuple(F.expr(x) for x in (meta.xmin, meta.ymin, meta.xmax, meta.ymax))

    refine = (
        "none"
        if (lmeta is not None and lmeta.exact and rmeta is not None and rmeta.exact)
        else "auto"
    )
    common = dict(
        left_geom=lgeom,
        right_geom=rgeom,
        distance=(expand if predicate == "dwithin" else None),
        cell_target=getattr(session, "spatial_join_cells", None),
        left_bbox=_meta_bbox(lmeta),
        right_bbox=_meta_bbox(rmeta),
        refine=refine,
    )
    how = "left_anti" if neg else "left_semi"
    if not correlated_filters:
        joined = spatial_join(ldf, rdf, predicate, how=how, **common)
    else:
        # correlated extras join the semi/anti condition itself: run the
        # inner grid join, apply them post-join, then semi/anti the outer
        # side on the operator's deterministic row-id convention (two
        # xxhash64 seeds over the natural columns — recompute-stable,
        # identical rows share a verdict, which is exactly semi/anti
        # semantics)
        inner = spatial_join(ldf, rdf, predicate, how="inner", **common)
        overlap = set(ldf.columns) & set(rdf.columns)

        def _qref(mm: re.Match) -> str:
            alias, col = mm.group(1), mm.group(2)
            if alias.lower() == la.lower():
                return col
            return f"{col}_right" if col in overlap else col

        flt = " AND ".join(
            "("
            + re.sub(
                rf"\b({re.escape(la)}|{re.escape(ra)})\s*\.\s*`?(\w+)`?",
                _qref, c, flags=re.IGNORECASE,
            )
            + ")"
            for c in correlated_filters
        )

        def _rowid(df):
            cols = [F.col(c) for c in ldf.columns]
            return F.struct(
                F.xxhash64(*cols).alias("h1"),
                F.xxhash64(F.lit(0x9E3779B9), *cols).alias("h2"),
            )

        try:
            matched = inner.where(flt).select(_rowid(inner).alias("__eid")).distinct()
        except Exception:
            return None
        joined = (
            ldf.withColumn("__eid", _rowid(ldf))
            .join(matched, "__eid", how)
            .drop("__eid")
        )
    view = f"__spatial_semi_join_{next(_outer_view_counter)}"
    joined.createOrReplaceTempView(view)

    tail = sql[sub_end:]
    tm = re.match(r"\s*AND\b", tail, re.IGNORECASE)
    if tm:
        tail = " WHERE " + tail[tm.end() :]
    rest = sql[: m.start()] + f"FROM {view}" + tail
    # alias substitution only within THIS set-op arm (other arms own their
    # identical aliases; the session fixpoint loop rewrites them later)
    arm_start, cut = _arm_bounds(rest, m.start())
    head, arm, rest_tail = rest[:arm_start], rest[arm_start:cut], rest[cut:]
    star_l = ", ".join(ldf.columns)
    arm = re.sub(rf"\b{re.escape(la)}\.\*", star_l, arm, flags=re.IGNORECASE)
    arm = re.sub(
        rf"\b{re.escape(la)}\.`?(\w+)`?", r"\1", arm, flags=re.IGNORECASE
    )
    return head + arm + rest_tail


# ST_Pred(alias.col | col, ST_GeomFromText('WKT'[, srid])[, d]) — both
# argument orders; used for scan-level filter pushdown
_LIT_PRED_RE = re.compile(
    r"(?P<fn>ST_\w+)\s*\(\s*"
    r"(?:"
    r"(?:(?P<al>[A-Za-z_]\w*)\s*\.\s*)?(?P<col>[A-Za-z_]\w*)"
    r"\s*,\s*"
    r"ST_GeomFromText\s*\(\s*'(?P<wkt>[^']+)'\s*(?:,\s*\d+\s*)?\)"
    r"|"
    r"ST_GeomFromText\s*\(\s*'(?P<wkt2>[^']+)'\s*(?:,\s*\d+\s*)?\)"
    r"\s*,\s*"
    r"(?:(?P<al2>[A-Za-z_]\w*)\s*\.\s*)?(?P<col2>[A-Za-z_]\w*)"
    r")"
    r"(?:\s*,\s*(?P<d>[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?))?\s*\)",
    re.IGNORECASE,
)

_FROM_SINGLE_RE = re.compile(
    r"\bFROM\s+(?P<t>[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?P<a>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)

_JOIN_TOKEN_RE = re.compile(r"\bJOIN\b", re.IGNORECASE)


def _axis_rect_bounds(g) -> Optional[tuple[float, float, float, float]]:
    """(xmin, ymin, xmax, ymax) when the geometry is exactly its envelope
    (an axis-aligned rectangle, point, or degenerate axis segment)."""
    from dataclod_spark.geo.algos import bounds as gbounds

    b = gbounds(g)
    if b is None:
        return None
    x0, y0, x1, y1 = b
    if g.kind == "Point":
        return b
    if g.kind == "Polygon" and len(g.data) == 1:
        corners = {(x0, y0), (x0, y1), (x1, y0), (x1, y1)}
        if set(g.data[0]) == corners:
            return b
    return None


def try_spatial_filter_pushdown(session, sql: str) -> Optional[str]:
    """Inject codegen bbox conjuncts for spatial predicates against literal
    geometries — the PostGIS "region query" (``WHERE ST_Intersects(t.geom,
    ST_GeomFromText('POLYGON …'))``).

    The reference gets this for free: its predicates are native expressions
    DataFusion folds and pushes down.  Here the predicate is a pandas UDF,
    which Catalyst can neither fold nor push — every row crosses into
    Python.  When the session has bbox covering columns registered for the
    scanned view (``register_bbox`` ≈ GeoParquet bbox metadata), this
    rewrite ANDs pure-column bbox conjuncts derived from the literal's
    envelope in front of the predicate.  Those conjuncts reach the parquet
    scan as PushedFilters → row-group skipping at 100 TB; the UDF remains
    only as the exact refine over surviving rows.  If the covering is
    ``exact`` and the literal is an axis rectangle, the conjuncts ARE the
    predicate and the UDF is dropped (zero Python in the plan).

    Scope: single-relation FROM (no JOIN); literal via ST_GeomFromText.
    Unmatched predicates are left untouched — the rewrite only ever ANDs
    necessary conditions, so it is correctness-preserving everywhere.
    """
    if not _LIT_PRED_RE.search(sql):
        return None
    # any JOIN anywhere (token match, not whitespace-fragile substring)
    # declines the single-relation rewrite; declining is always safe
    if _search_code(_JOIN_TOKEN_RE, sql):
        return None
    # set-op arms each have their own FROM: attaching the first arm's
    # covering metadata to the other arms' predicates would be wrong
    if _has_top_level_setop(sql):
        return None
    # the FROM this rewrite resolves covering metadata against must be the
    # statement's own (depth-0) FROM — a match inside a CTE body, a
    # subquery, or a string literal would attach the wrong table's
    # covering columns
    lit_spans = _noncode_spans(sql)
    fm = next(
        (
            m_
            for m_ in _FROM_SINGLE_RE.finditer(sql)
            if not any(s <= m_.start() < e_ for s, e_ in lit_spans)
            and _paren_depth_at(sql, m_.start()) == 0
        ),
        None,
    )
    if not fm:
        return None
    table = fm.group("t")
    alias = fm.group("a")
    if alias and alias.lower() in _RESERVED_ALIAS:
        alias = None
    # predicates inside subqueries scan OTHER relations: only rewrite
    # matches that sit outside every (SELECT ...) span
    sub_spans = _subquery_spans(sql)

    from dataclod_spark.geo.core import wkt_parse
    from dataclod_spark.geo.algos import bounds as gbounds

    changed = False

    def _repl(mm: re.Match) -> str:
        nonlocal changed
        if any(s < mm.start() < e_ for s, e_ in sub_spans):
            return mm.group(0)
        fn = mm.group("fn").lower()
        col_first = mm.group("col") is not None
        al = mm.group("al") if col_first else mm.group("al2")
        col = mm.group("col") if col_first else mm.group("col2")
        wkt = mm.group("wkt") if col_first else mm.group("wkt2")
        dtxt = mm.group("d")
        orig = mm.group(0)
        if fn == "st_dwithin":
            if dtxt is None:
                return orig
            pred_key = "dwithin"
        elif fn in _PRED_KEY and dtxt is None:
            pred_key = _PRED_KEY[fn]
        else:
            return orig
        if pred_key == "bbox":
            return orig
        if al is not None and (alias is None or al.lower() != alias.lower()):
            return orig
        meta = session.bbox_meta(table, col) if hasattr(session, "bbox_meta") else None
        if meta is None:
            return orig
        try:
            lit = wkt_parse(wkt)
            lb = gbounds(lit)
        except Exception:
            return orig
        if lb is None:
            return orig
        e = float(dtxt) if pred_key == "dwithin" else 0.0
        x0, y0, x1, y1 = lb[0] - e, lb[1] - e, lb[2] + e, lb[3] + e
        # predicate direction: col-first means the column geometry is the
        # predicate's first argument
        key = pred_key if col_first else _SWAPPED[pred_key]
        cx0, cy0, cx1, cy1 = meta.xmin, meta.ymin, meta.xmax, meta.ymax
        if key in ("within", "covered_by"):
            conj = (
                f"({cx0}) >= {x0!r} AND ({cx1}) <= {x1!r} "
                f"AND ({cy0}) >= {y0!r} AND ({cy1}) <= {y1!r}"
            )
        elif key in ("contains", "covers"):
            conj = (
                f"({cx0}) <= {x0!r} AND ({cx1}) >= {x1!r} "
                f"AND ({cy0}) <= {y0!r} AND ({cy1}) >= {y1!r}"
            )
        else:  # overlap classes: intersects/touches/overlaps/crosses/equals/dwithin
            conj = (
                f"({cx0}) <= {x1!r} AND ({cx1}) >= {x0!r} "
                f"AND ({cy0}) <= {y1!r} AND ({cy1}) >= {y0!r}"
            )
        changed = True
        # exact elimination: covering is exact (bbox IS the geometry) and
        # the literal is an axis rectangle → the shared JVM verdict IS the
        # predicate (NOT the closed-interval covering conjuncts alone:
        # ST_Within is false for a point ON the boundary, so within/
        # contains need _verdict_sql's open-interval point cases).  The
        # simple covering conjuncts still ride along — they are the part
        # that reaches the parquet scan as PushedFilters.
        if (
            meta.exact
            and _axis_rect_bounds(lit) is not None
            and key in ("intersects", "within", "covered_by", "contains", "covers")
        ):
            verdict = _verdict_sql_fields(
                key,
                (f"({cx0})", f"({cy0})", f"({cx1})", f"({cy1})"),
                (f"{x0!r}", f"{y0!r}", f"{x1!r}", f"{y1!r}"),
            )
            return f"(({conj}) AND {verdict})"
        return f"(({conj}) AND {orig})"

    out = _LIT_PRED_RE.sub(_repl, sql)
    return out if changed else None
