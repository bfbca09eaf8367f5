"""Statement rewrites applied by ``EngineSession.sql`` before planning.

Mirrors the reference's parse-level statement-rewrite stage
(``src/core/src/rewrite/mod.rs:17-20``, applied per statement in
``context.rs:87-95``).  The reference rewrites pg-specific AST shapes; our
engine-specific rewrite handles a Spark limitation instead: inline ``VALUES``
tables must be foldable, so rows containing non-foldable expressions (e.g.
Python-backed ``ST_*`` UDF calls) are rewritten to a ``UNION ALL`` chain of
SELECTs, which Spark evaluates fine.
"""

from __future__ import annotations

import re


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur, in_str = [], 0, [], False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append(s[i + 1])
                    i += 1
                else:
                    in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _find_matching(s: str, start: int) -> int:
    """Index of the ')' matching the '(' at s[start]."""
    depth, in_str = 0, False
    for i in range(start, len(s)):
        ch = s[i]
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parentheses")


_VALUES_RE = re.compile(r"\(\s*VALUES\b", re.IGNORECASE)
_ALIAS_RE = re.compile(r"\s*(?:AS\s+)?(\w+)\s*\(([^)]*)\)", re.IGNORECASE)
_ALIAS_WORD_RE = re.compile(r"\s*(?:AS\s+)?(\w+)", re.IGNORECASE)
_IDENT_RE = re.compile(r"[A-Za-z_]\w*$")
# words that can legally follow a closing ')' and must never be consumed as a
# table alias (otherwise e.g. `... (VALUES (f(x))) AND (y > 1)` mis-captures
# `AND (y > 1)` as an alias-with-columns and corrupts the statement)
_RESERVED_ALIAS = frozenset(
    """and or not in is between like where group order union intersect except
    join inner left right full cross natural on using having limit offset
    select from when then else end window qualify asc desc""".split()
)


def _match_alias(after: str):
    """Parse an optional `[AS] name[(col,...)]` table alias at the start of
    ``after``.  Returns (alias, cols, consumed_chars).  Reserved keywords are
    never an alias, and a parenthesized list only counts as alias columns
    when every element is a bare identifier."""
    m = _ALIAS_RE.match(after)
    if m:
        word = m.group(1)
        cols = [c.strip() for c in m.group(2).split(",")]
        if word.lower() not in _RESERVED_ALIAS and all(
            _IDENT_RE.fullmatch(c) for c in cols
        ):
            return word, cols, m.end()
    m = _ALIAS_WORD_RE.match(after)
    if m and m.group(1).lower() not in _RESERVED_ALIAS:
        return m.group(1), None, m.end()
    return None, None, 0


def rewrite_values_tables(sql: str) -> str:
    """Rewrite ``(VALUES (a,b),(c,d)) AS t(x,y)`` → UNION ALL of SELECTs.

    Only fires when the statement contains both VALUES and a non-foldable
    function marker (``ST_`` prefix) — plain literal VALUES stay native.
    """
    if "values" not in sql.lower() or "st_" not in sql.lower():
        return sql
    out = sql
    while True:
        m = _VALUES_RE.search(out)
        if m is None:
            return out
        open_paren = m.start()
        close_paren = _find_matching(out, open_paren)
        inner = out[m.end() : close_paren]  # the rows: (..), (..)
        after = out[close_paren + 1 :]
        alias, cols, consumed = _match_alias(after)
        after = after[consumed:]
        rows = _split_top_level(inner.strip())
        selects = []
        for row in rows:
            row = row.strip()
            if not (row.startswith("(") and row.endswith(")")):
                return sql  # unexpected shape — leave untouched
            exprs = _split_top_level(row[1:-1])
            if cols is not None:
                if len(exprs) != len(cols):
                    return sql
                sel = ", ".join(f"{e.strip()} AS {c}" for e, c in zip(exprs, cols))
            else:
                sel = ", ".join(e.strip() for e in exprs)
            selects.append(f"SELECT {sel}")
        union = " UNION ALL ".join(selects)
        alias_sql = f" {alias}" if alias else ""
        out = out[:open_paren] + f"({union}){alias_sql}" + after


class SqlFragmentParam:
    """A bind-parameter value that must be spliced into the SQL text as a
    fixed server-generated fragment instead of passed through
    ``spark.sql(args=...)`` — Spark only accepts literals / collection
    constructors as args, so e.g. a typed empty array parameter
    (``CAST(array() AS array<int>)``) has no args representation.  The
    fragment is authored by the server (never client text), so splicing
    it is not an injection surface."""

    __slots__ = ("fragment",)

    def __init__(self, fragment: str):
        self.fragment = fragment

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"SqlFragmentParam({self.fragment!r})"


def _quoted_span(sql: str, i: int) -> int:
    """``sql[i]`` is a quote character (``'``, ``"`` or backtick): return
    the index one past the closing quote.  Matches Spark's default
    tokenization: backslash escapes are live inside ``'…'`` and ``"…"``
    string literals (``escapedStringLiterals=false``), doubled quotes
    escape in all three forms, backticks know no backslash."""
    q = sql[i]
    n = len(sql)
    backslash = q in "'\""
    j = i + 1
    while j < n:
        c = sql[j]
        if backslash and c == "\\":
            j += 2
            continue
        if c == q:
            if j + 1 < n and sql[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return n


_DOLLAR_TAG_RE = re.compile(r"\$(?:[A-Za-z_][A-Za-z0-9_]*)?\$")


def scan_noncode_span(sql: str, i: int) -> tuple[str | None, int]:
    """If ``sql[i]`` starts a non-code span, return ``(kind, end)`` with
    ``end`` one past the span; otherwise ``(None, i)``.  Kinds:

    * ``"quote"`` — single/double/backtick literal (Spark escape rules,
      via :func:`_quoted_span`);
    * ``"dollar"`` — PG dollar-quoted string (tags may contain digits
      after the first character, e.g. ``$q1$``);
    * ``"line"`` — ``--`` comment, ending BEFORE the newline (the newline
      stays code so statement splitting keeps it as whitespace);
    * ``"block"`` — ``/* */`` comment; PG block comments NEST (scan.l).

    This is the single source of truth for "what is not SQL code" —
    statement splitting (:meth:`_split_statements`), statement-head
    classification (``_top_level_words``) and any future scanner must all
    consume it so their escape rules cannot diverge."""
    n = len(sql)
    ch = sql[i]
    if ch in "'\"`":
        return "quote", _quoted_span(sql, i)
    if ch == "$":
        m = _DOLLAR_TAG_RE.match(sql, i)
        if m:
            tag = m.group(0)
            end = sql.find(tag, i + len(tag))
            return "dollar", (n if end < 0 else end + len(tag))
        return None, i
    if ch == "-" and sql[i : i + 2] == "--":
        nl = sql.find("\n", i)
        return "line", (n if nl < 0 else nl)
    if ch == "/" and sql[i : i + 2] == "/*":
        depth, j = 1, i + 2
        while j < n and depth:
            if sql[j : j + 2] == "/*":
                depth, j = depth + 1, j + 2
            elif sql[j : j + 2] == "*/":
                depth, j = depth - 1, j + 2
            else:
                j += 1
        return "block", j
    return None, i


def splice_named_params(sql: str, fragments: dict[str, str]) -> str:
    """Replace ``:name`` markers with server-generated SQL fragments
    (parenthesized), using the same literal-aware scan as
    :func:`rewrite_dollar_params` (shared ``_quoted_span``): quoted
    strings, quoted identifiers and backticked identifiers are never
    touched, so a literal that happens to contain ``:__p1`` survives.
    Only for :class:`SqlFragmentParam` values, which have no
    ``spark.sql(args=…)`` representation; plain string concatenation (no
    regex templates) so fragments containing backslashes pass through
    verbatim."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            j = _quoted_span(sql, i)
            out.append(sql[i:j])
            i = j
        elif ch == ":":
            j = i + 1
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            name = sql[i + 1 : j]
            if name in fragments:
                out.append(f"({fragments[name]})")
                i = j
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def rewrite_dollar_params(sql: str) -> tuple[str, list[int]]:
    """Rewrite PostgreSQL positional parameters ``$1..$n`` to Spark named
    parameters ``:__p1..:__pn``.

    The reference accepts ``$n`` placeholders through the extended protocol
    (``server/src/postgres/parser.rs:31-44`` → LogicalPlan parameter
    substitution); Spark's parameterized SQL uses named ``:name`` markers,
    so the shim renames them and EngineSession maps a positional argument
    list onto the generated names.  Quoted strings, quoted identifiers and
    backticked identifiers are left untouched (shared ``_quoted_span``
    scan — backslash escapes honored the way Spark's parser does).

    Returns (rewritten_sql, sorted list of parameter indices used).
    """
    out: list[str] = []
    used: set[int] = set()
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in "'\"`":
            j = _quoted_span(sql, i)
            out.append(sql[i:j])
            i = j
        elif ch == "$" and i + 1 < n and sql[i + 1].isdigit():
            j = i + 1
            while j < n and sql[j].isdigit():
                j += 1
            idx = int(sql[i + 1 : j])
            used.add(idx)
            out.append(f":__p{idx}")
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out), sorted(used)


_PG_CATALOG_QUAL_RE = re.compile(r"\bpg_catalog\s*\.\s*(pg_\w+)", re.IGNORECASE)


def rewrite_pg_catalog_refs(sql: str) -> str:
    """``pg_catalog.pg_X`` → ``pg_catalog_pg_X``.

    The pg_catalog tables are Spark temp views, which cannot be
    schema-qualified; the reference registers them under the real
    ``pg_catalog`` schema (``catalog/mod.rs``), and pg clients (psql's
    ``\\d``, BI tools) always qualify.  The prefixed spelling is registered
    by catalog.pg_catalog.register_pg_catalog."""
    return _PG_CATALOG_QUAL_RE.sub(lambda m: f"pg_catalog_{m.group(1)}", sql)


_INFO_SCHEMA_QUAL_RE = re.compile(
    r"\binformation_schema\s*\.\s*(tables|columns|schemata)", re.IGNORECASE
)


def rewrite_information_schema_refs(sql: str) -> str:
    """``information_schema.X`` → ``information_schema_X`` temp views
    (rebuilt on use by EngineSession.sql; reference enables DataFusion's
    information_schema at context.rs:33)."""
    return _INFO_SCHEMA_QUAL_RE.sub(
        lambda m: f"information_schema_{m.group(1).lower()}", sql
    )
