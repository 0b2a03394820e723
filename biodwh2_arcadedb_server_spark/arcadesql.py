"""ArcadeDB SQL dialect → Spark translation (the reference's native
query surface).

The reference serves BioDWH2 graphs through ArcadeDB's SQL dialect
(`ArcadeDBService.java:81-105` executes user command strings; the
Studio UI the README demos speaks the same language). A user
switching engines keeps their queries: this module parses the
dialect subset that covers the reference's documented query surface
(SURVEY.md §2.2 B1–B19) and compiles it to Spark — SELECT statements
become ONE Spark SQL string over the workspace views (so Catalyst
sees the whole plan: pushdown, pruning, join strategy all apply),
TRAVERSE statements compile onto the tested iterative BFS operator.

Supported subset (documented contract, tested differentially):

- ``SELECT [projections] FROM <Type | (subselect)> [WHERE expr]
  [GROUP BY ...] [ORDER BY f [ASC|DESC], ...] [SKIP n] [LIMIT n]``
- projections: ``*``, properties, ``@rid``/``@type``, aliases via
  ``AS``, aggregates (count/sum/avg/min/max/first/last plus
  stddev/variance/median/percentile, ``count(*)``), scalar
  functions passed through to Spark when name-compatible, ArcadeDB
  field-METHOD chaining (``name.toUpperCase()``,
  ``text.substring(0, 5).trim()``, ``x.asInteger()``,
  left/right/replace/indexOf/charAt/append/prefix/split/length/size
  and the as* casts — Java 0-based offsets shifted to Spark's
  1-based forms), and the graph projections
  ``out('E')``/``in('E')``/``both('E')`` (arrays of neighbor ids)
  plus ``out('E').size()`` degree shorthand.
- ``SELECT expand(out('E')) FROM ...`` — neighbor node rows from the
  unified ``nodes`` view.
- WHERE operators: ``= <> != < <= > >= LIKE ILIKE MATCHES
  CONTAINSTEXT IN [..] BETWEEN x AND y IS [NOT] NULL CONTAINS
  CONTAINSANY CONTAINSALL AND OR NOT ()``; literals: numbers,
  'strings', true/false/null, [lists]. Collection/map element access:
  ``field[0]`` (0-based), ``field[1-3]`` (inclusive range sublist),
  ``field['key']`` (map value) — interleaves freely with method
  chains (``csv.split(',')[0].trim()``).
- Query parameters: ``:name`` (dict) and positional ``?`` (list)
  placeholders via ``execute(..., params=...)`` /
  ``bind_params(sql, params)`` — the ``{"command", "params"}`` REST
  wire contract; values bind as escaped literals (injection-safe).
- ``TRAVERSE out('E'[, 'F'...]) FROM (SELECT FROM Type [WHERE ...])
  [MAXDEPTH n | WHILE [(]$depth < n[)]]`` — reachable node set
  (ArcadeDB TRAVERSE semantics:
  the root rows are depth 0 and included). Each step contributes its
  own hop leg — ``out('A'), in('B')`` follows out-A and in-B edges
  only, and an unlabeled step follows every edge type.
- ``MATCH {type: T, as: a, where: (...)}-E->{...} ... RETURN expr
  [AS alias], ... [GROUP BY][ORDER BY][SKIP][LIMIT]`` — pattern
  chains with arrow (``-E->``, ``<-E-``, ``-->``, ``<--``) or method
  (``.out('E')``/``.in()``/``.both()``) edge steps; compiles to ONE
  Spark SQL join chain (per-label typed views JOIN edges JOIN ...),
  so Catalyst sees the whole motif — pushdown into the anchored
  pattern, broadcast of small legs, AQE join re-planning all apply.
  Aggregates in RETURN get ArcadeDB-style implicit grouping. (The
  DataFrame twin for anchored motifs is ``operators.graph.
  motif_chain``, which force-broadcasts the accumulated prefix.)
  Extensions: ``optional: true`` node patterns (LEFT JOIN of a
  derived leg subquery, the node's ``where:`` folded inside);
  comma-separated additional chains anchored at bound aliases
  (including cycle closes); ``NOT { … }`` negative chains
  (NOT EXISTS → left-anti plan); ``$matched.<alias>.<prop>``
  cross-alias predicates inside node ``where:``.
- ``UNWIND <field>[, ...]`` after a SELECT — flattens projected
  collection fields one row per element (LATERAL VIEW OUTER explode;
  empty/null collections keep the record with a null element).
- ``LET $var = <expr | (SELECT ...)>`` context variables in SELECT:
  bindings inline where ``$var`` is referenced; an uncorrelated
  ``(SELECT agg ...)`` binding becomes a Spark scalar subquery that
  Catalyst evaluates once and broadcasts (q67 semantics). A binding
  may reference the CURRENT outer record via
  ``$parent.$current.<field>`` (ArcadeDB's per-record correlated LET,
  round 8): it compiles to a correlated scalar subquery over the
  outer FROM alias, which Catalyst decorrelates into a left outer
  join + partial aggregate — one shuffle on the correlation key, not
  a per-row execution. ``$current.<field>`` resolves to the current
  scope's own record.
- ``shortestPath(<src-id>, <dst-expr> [, 'OUT'|'IN'|'BOTH'
  [, 'EdgeLabel' [, maxDepth]]])`` — ArcadeDB's path function
  (default direction BOTH, like ArcadeDB). The source must be a
  literal node id: ONE BFS tree is computed from it
  (operators.graph.shortest_path_tree — frontier joins, min-pred
  deterministic paths) and registered as a temp view; the call site
  compiles to a correlated scalar subquery against that view, which
  Catalyst decorrelates into a left join — per-row destinations cost
  one join, not one BFS per row. ``.size()`` after the call gives
  path length. NULL for unreachable destinations. Plan-level like
  TRAVERSE: use ``execute()``, not ``translate()``.

- ``UPDATE <T> [SET k = <expr>[, ...]] [REMOVE p[, ...]]
  [WHERE ...]`` (REMOVE clears the value — schema-full engine, the
  typed column stays), ``INSERT INTO
  <T> SET ... [UPSERT] | (cols) VALUES (...)[, ...]``, ``CREATE
  VERTEX <T> [SET ...]``, ``CREATE EDGE <T> FROM <key | (SELECT …)>
  TO <key | (SELECT …)> [SET ...]`` (set-valued endpoints create an
  edge per (src, dst) pair — ArcadeDB's canonical bulk-edge form),
  ``DELETE [VERTEX | FROM] <T> [WHERE ...]``, ``DELETE EDGE <T>
  [FROM <key | (SELECT …)> TO <key | (SELECT …)>] [WHERE ...]``
  (endpoint-scoped deletion: every edge between the two sets goes,
  duplicates included)
  (UPSERT inserts the SET row when nothing matches) — routed
  to the workspace batch-recompute DML API (insert/update/
  delete_nodes; DELETE cascades to connected edges, ArcadeDB
  semantics) but ONLY behind ``execute(..., allow_writes=True,
  workspace_dir=...)``. Default OFF raises a clear error — the
  reference serves the database read-only over HTTP.

- DDL (behind the same ``allow_writes`` gate): ``CREATE VERTEX TYPE
  <T>``; ``CREATE EDGE TYPE <T> FROM <SrcType> TO <DstType>``
  (endpoint labels are an engine requirement — edge appends validate
  against the typed node sets, A11); ``CREATE PROPERTY <T>.<p>
  <TYPE>`` (typed null column, partition-parallel rewrite);
  ``CREATE INDEX ON <T> (cols) [UNIQUE]`` — UNIQUE runs the A13
  uniqueness validation and fails loud; both flavors are recorded in
  the manifest as clustering hints (at 100 TB the "index" is layout
  + parquet footer stats, sources/layout.py). The inverses:
  ``DROP TYPE <T> [UNSAFE]`` (populated types require UNSAFE; node
  types referenced by edge types must drop those first),
  ``DROP PROPERTY <T>.<p>``, ``DROP INDEX ON <T> (cols)``, and
  ``ALTER TYPE <T> NAME <New>`` — a rename CASCADES the derived
  identity (node ids are xxhash64(label, natural_key)): ids are
  recomputed and every touching edge dataset's src/dst remapped via
  an (old, new) id join.

Out of scope (raise a clear error): projections mixing expand() with
other fields — the same restriction ArcadeDB itself enforces.

Scale notes: the compiled SQL references only the per-label views
(typed, pruned scans) and the unified ``edges`` view (partitioned on
``src``). Graph projections compile to correlated aggregate
subqueries, which Catalyst decorrelates into a left outer join +
partial aggregate — shuffle on the edge key, no driver loops, no
per-row Python. TRAVERSE reuses ``operators.graph.bfs``
(frontier-join iteration, checkpoint every 3 rounds).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from biodwh2_arcadedb_server_spark.localrel import local_df

# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<rid>\#\d+:-?\d+)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<at>@\w+)
  | (?P<var>\$\w+)
  | (?P<arrow><-|->)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|\[|\]|\{|\}|,|\.|\*|\+|-|/|%|:)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "from", "where", "group", "order", "by", "asc", "desc",
    "skip", "limit", "and", "or", "not", "in", "between", "is", "null",
    "like", "contains", "as", "true", "false", "traverse", "maxdepth",
    "distinct", "match", "return", "let",
}


@dataclass
class _Tok:
    kind: str  # number | string | ident | kw | op | at | var | arrow
    text: str
    raw: str = ""  # original spelling (keywords lowercase `text`)

    def __post_init__(self) -> None:
        if not self.raw:
            self.raw = self.text


def _lex(sql: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ArcadeSQLError(f"unexpected character {sql[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.lower() in _KEYWORDS:
            toks.append(_Tok("kw", text.lower(), text))
        else:
            toks.append(_Tok(kind, text))
    toks.append(_Tok("eof", ""))
    return toks


class ArcadeSQLError(ValueError):
    """Parse/translate failure with a user-facing message."""


def _sql_str(val: str) -> str:
    """Re-escape a user-supplied string (e.g. an edge label) for safe
    interpolation as a Spark SQL single-quoted literal."""
    return val.replace("\\", "\\\\").replace("'", "\\'")


# ------------------------------------------------------------- parameters
_NAMED_PARAM_RE = re.compile(r":([A-Za-z_]\w*)")


def _render_param(val) -> str:
    """Render a Python parameter value as a dialect literal. Strings
    go through ``_sql_str`` (quote + backslash escaping) so a value
    like ``O'Brien' OR 1=1 --`` stays ONE string literal — binding is
    the injection boundary, exactly like a real driver's."""
    import datetime as _dt

    if val is None:
        return "null"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, int):
        return str(val)
    if isinstance(val, float):
        import math
        from decimal import Decimal

        if not math.isfinite(val):
            raise ArcadeSQLError(f"non-finite parameter value {val!r}")
        # plain decimal notation, never scientific — the dialect
        # lexer's number token is \\d+(\\.\\d+)?, so repr()'s '1e-05'
        # would tokenize as number/ident/op/number and fail to parse
        # (round-8 review finding). Decimal(repr()) keeps the exact
        # shortest-round-trip digits.
        return format(Decimal(repr(val)), "f")
    if isinstance(val, (list, tuple)):
        return "[" + ", ".join(_render_param(v) for v in val) + "]"
    if isinstance(val, _dt.datetime):
        return f"'{val.isoformat(sep=' ')}'"
    if isinstance(val, _dt.date):
        return f"'{val.isoformat()}'"
    if isinstance(val, str):
        return f"'{_sql_str(val)}'"
    raise ArcadeSQLError(
        f"unsupported parameter type {type(val).__name__}"
    )


def bind_params(sql: str, params) -> str:
    """Bind query parameters into an ArcadeDB-dialect statement —
    the wire behavior of ArcadeDB's ``{"command": ..., "params":
    ...}`` REST payload and of every client driver. A dict binds
    named ``:name`` placeholders; a list/tuple binds positional
    ``?`` placeholders in order. Replacement happens only OUTSIDE
    single-quoted string literals, and only for names present in
    the dict — ``{type: Person}`` MATCH syntax and user text like
    ':noon' are never touched. Values are rendered as escaped
    literals (``_render_param``), so binding cannot change the
    statement shape. Unbound placeholders fail loudly downstream
    (``?`` is not a dialect token; a dangling ``:name`` does not
    parse)."""
    if params is None:
        return sql
    parts = _STRING_SPAN_RE.split(sql)
    if isinstance(params, dict):
        rendered = {k: _render_param(v) for k, v in params.items()}

        def _sub(m: re.Match) -> str:
            return rendered.get(m.group(1), m.group(0))

        return "".join(
            p if i % 2 else _NAMED_PARAM_RE.sub(_sub, p)
            for i, p in enumerate(parts)
        )
    if isinstance(params, (list, tuple)):
        n_slots = sum(p.count("?") for i, p in enumerate(parts) if i % 2 == 0)
        if n_slots != len(params):
            raise ArcadeSQLError(
                f"statement has {n_slots} positional placeholder(s) "
                f"but {len(params)} parameter(s) were supplied"
            )
        vals = iter(params)
        out: list[str] = []
        for i, p in enumerate(parts):
            if i % 2:
                out.append(p)
            else:
                out.append(
                    re.sub(r"\?", lambda _m: _render_param(next(vals)), p)
                )
        return "".join(out)
    raise ArcadeSQLError(
        f"params must be a dict (named) or list (positional), "
        f"got {type(params).__name__}"
    )


def split_script(text: str) -> list[str]:
    """Split an ArcadeDB ``sqlscript`` body into statements on ``;``
    OUTSIDE single-quoted string literals (the Studio multi-statement
    language; the v1 REST API accepts ``language: "sqlscript"``).
    Empty statements (trailing ``;``, blank lines between) are
    dropped."""
    parts = _STRING_SPAN_RE.split(text)
    stmts: list[str] = [""]
    for i, p in enumerate(parts):
        if i % 2:
            stmts[-1] += p
            continue
        pieces = p.split(";")
        stmts[-1] += pieces[0]
        stmts.extend(pieces[1:])
    return [s.strip() for s in stmts if s.strip()]


# ---------------------------------------------------------------- parser
@dataclass
class _Select:
    projections: list[tuple[str, str | None]]  # (spark_expr, alias)
    star: bool
    expand_edge: tuple[str, str] | None  # (direction, edge label)
    source_type: str | None
    subquery: "_Select | None"
    where: str | None
    group_by: list[str]
    order_by: list[tuple[str, str]]
    skip: int | None
    limit: int | None
    distinct: bool = False
    uses_graph_projection: bool = False
    lets: dict = field(default_factory=dict)  # $var -> compiled expr
    # FROM alias of this SELECT in the compiled SQL. Top-level keeps
    # "__self"; every nested (scalar / LET) subquery gets a fresh
    # "__subN" so a correlated reference to the OUTER record
    # ($parent.$current.<field>, round 8) is not shadowed by the
    # inner scope's own alias.
    alias: str = "__self"
    unwind: list[str] = field(default_factory=list)  # result fields to explode
    # SELECT ... FROM (TRAVERSE ...) — the Studio filter-a-traversal
    # pattern; materialized to a temp view by execute() (plan-level,
    # like shortestPath), with $depth bound to the depth column
    traverse_subquery: "_Traverse | None" = None
    # SELECT FROM #bucket:pos — ArcadeDB record-id addressing (how
    # Studio deep-links records). Resolved at compile time against the
    # workspace's manifest-recorded bucket order; pos is the
    # content-derived node_id (our documented id divergence).
    rid: "tuple[int, int] | None" = None
    # SELECT FROM schema:{types|indexes|buckets} — ArcadeDB's system
    # table-valued FROM targets (Studio's schema browser issues
    # these). Materialized from the loaded workspace's manifest at
    # query time by execute(), so DDL since the load is visible.
    schema_source: str | None = None


@dataclass
class _Traverse:
    steps: list[tuple[str, str | None]]  # (direction, edge label or None)
    inner: _Select = None  # type: ignore[assignment]
    maxdepth: int | None = None


@dataclass
class _Match:
    nodes: list[dict]  # {"type":, "as":, "where": compiled expr | None, "optional": bool}
    steps: list[tuple[str, str | None]]  # (direction, edge label or None)
    returns: list[tuple[str, str | None]]  # (spark_expr, alias)
    group_by: list[str] = field(default_factory=list)
    order_by: list[tuple[str, str]] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    # comma-separated additional pattern chains sharing aliases with
    # the first; each {"negated": bool, "nodes": [...], "steps": [...]}.
    # A negated chain compiles to a NOT EXISTS anti-join leg.
    extra: list[dict] = field(default_factory=list)


@dataclass
class _DML:
    """UPDATE / INSERT / DELETE / CREATE VERTEX statement (B19).

    ArcadeDB accepts these through the same SQL endpoint the reference
    serves (`pom.xml:104-108` [B]); the engine routes them to the
    workspace batch-recompute DML API (`workspace.py` insert/update/
    delete_nodes) behind an explicit ``allow_writes`` opt-in —
    default off preserves the reference's read-only-over-HTTP posture.

    ``rows``: for insert — one dict of column → compiled Spark-SQL
    expression per inserted record (SET form yields one row; the
    VALUES form yields one per tuple)."""

    kind: str  # update | insert | delete | insert_edge | update_edge | delete_edge
    label: str
    assignments: list[tuple[str, str]] = field(default_factory=list)
    where: str | None = None
    rows: list[dict] = field(default_factory=list)
    # CREATE EDGE endpoints — compiled expressions yielding the
    # src/dst NATURAL KEYS (node ids derive as xxhash64(label, key))
    edge_from: str | None = None
    edge_to: str | None = None
    # DDL payload (kind = ddl_node_type / ddl_edge_type /
    # ddl_property / ddl_index)
    ddl: dict = field(default_factory=dict)


_AGGS = {
    "count", "sum", "avg", "min", "max", "first", "last",
    # ArcadeDB also ships these; names are Spark-compatible
    "stddev", "variance", "median", "percentile",
}
# scalar functions whose ArcadeDB name is directly Spark-compatible
_PASSTHROUGH_FNS = {
    "abs", "ceil", "floor", "round", "sqrt", "upper", "lower", "trim",
    "length", "concat", "coalesce", "substring", "if", "ifnull", "format",
}


class _Parser:
    def __init__(self, sql: str):
        self.toks = _lex(sql)
        self.i = 0
        # When set, plain property references compile qualified
        # (`<qual>.<prop>`) — used for MATCH node-pattern wheres.
        self.qual: str | None = None
        # shortestPath() call specs collected during parsing — each
        # becomes a BFS-tree temp view registered by execute() before
        # the compiled SQL runs (plan-level, like TRAVERSE).
        self.shortest_paths: list[dict] = []
        # set when a $matched.<alias>.<prop> reference was compiled —
        # used to reject cross-alias predicates on optional patterns
        # (they cannot correlate out of the optional-leg subquery).
        self.matched_used = False
        # SELECT-nesting stack: $current resolves against the top,
        # $parent.$current against the element below it (per-record
        # correlated LET subqueries, round 8). Each nested select
        # draws a fresh alias from the counter.
        self._sel_stack: list[_Select] = []
        self._sub_counter = 0

    # -- token helpers
    def peek(self, k: int = 0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> _Tok | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise ArcadeSQLError(
                f"expected {text or kind}, got {got.text or got.kind!r}"
            )
        return t

    def _int(self, what: str) -> int:
        t = self.expect("number")
        try:
            return int(t.text)
        except ValueError as exc:
            raise ArcadeSQLError(f"{what} must be an integer, got {t.text}") from exc

    def _name(self, what: str) -> str:
        """A type or edge-label name — may collide with a keyword
        (e.g. the ArcadeDB-typical labels ``Order``, ``CONTAINS``).
        Returns the original spelling: edge labels are data compared
        case-sensitively against the label column."""
        t = self.next()
        if t.kind not in ("ident", "kw"):
            raise ArcadeSQLError(f"expected {what}, got {t.text or t.kind!r}")
        return t.raw

    def _direction(self, ctx: str, edges_ok: bool = False) -> str:
        """out/in/both (— `in` lexes as a keyword, so accept both
        kinds). With ``edges_ok``, also the edge-returning variants
        outE/inE/bothE (returned with the E suffix preserved)."""
        t = self.next()
        d = t.text.lower()
        allowed = ("out", "in", "both") + (
            ("oute", "ine", "bothe") if edges_ok else ()
        )
        if t.kind not in ("ident", "kw") or d not in allowed:
            raise ArcadeSQLError(f"{ctx} supports {'/'.join(allowed)}, got {t.text!r}")
        return d

    # -- entry
    def parse(self) -> "_Select | _Traverse | _Match | _DML":
        head = self.peek()
        if head.kind == "kw" and head.text == "traverse":
            stmt: _Select | _Traverse | _Match | _DML = self._traverse()
        elif head.kind == "kw" and head.text == "match":
            stmt = self._match()
        elif head.kind == "ident" and head.text.lower() in (
            "update", "insert", "delete", "create", "drop", "alter",
        ):
            stmt = self._dml()
        else:
            stmt = self._select()
        self.expect("eof")
        return stmt

    # -- DML (B19: UPDATE / INSERT / DELETE / CREATE VERTEX)
    def _accept_word(self, word: str) -> bool:
        """Case-insensitive soft keyword (SET/INTO/VALUES/VERTEX…) —
        these lex as plain idents so adding DML cannot change how any
        existing SELECT expression parses."""
        t = self.peek()
        if t.kind == "ident" and t.text.lower() == word:
            self.next()
            return True
        return False

    def _expect_word(self, word: str) -> None:
        if not self._accept_word(word):
            got = self.peek()
            raise ArcadeSQLError(
                f"expected {word.upper()}, got {got.text or got.kind!r}"
            )

    def _dml_assignments(self, dml: _DML) -> None:
        """``SET col = <expr> [, ...]`` — values are full dialect
        expressions compiled to Spark SQL strings."""
        dummy = _Select(
            projections=[], star=False, expand_edge=None, source_type=None,
            subquery=None, where=None, group_by=[], order_by=[], skip=None,
            limit=None,
        )
        while True:
            col = self._name("property name")
            self.expect("op", "=")
            dml.assignments.append((col, self._expr(dummy)))
            if not self.accept("op", ","):
                break

    def _dml_return(self, dml: _DML, allow: set[str]) -> None:
        """``RETURN AFTER [$current]`` / ``RETURN BEFORE [$current]``
        (ArcadeDB DML result projection): instead of the affected
        count, the statement returns the mutated records — AFTER the
        mutation (UPDATE) or their pre-mutation state (UPDATE/
        DELETE)."""
        if not self.accept("kw", "return"):
            return
        mode = None
        for m in ("after", "before"):
            if self._accept_word(m):
                mode = m
                break
        if mode is None or mode not in allow:
            raise ArcadeSQLError(
                f"RETURN supports {' / '.join(sorted(allow)).upper()} "
                "here"
            )
        # optional $current (the whole-record projection — the only
        # one supported; field projections are out of scope)
        t = self.peek()
        if t.kind == "var" and t.text.lower() == "$current":
            self.next()
        dml.ddl["return"] = mode

    def _dml(self) -> _DML:
        head = self.next().text.lower()
        dummy = _Select(
            projections=[], star=False, expand_edge=None, source_type=None,
            subquery=None, where=None, group_by=[], order_by=[], skip=None,
            limit=None,
        )
        if head == "update":
            kind = "update_edge" if self._accept_word("edge") else "update"
            dml = _DML(kind=kind, label=self._name("type name"))
            clauses = 0
            if self._accept_word("set"):
                self._dml_assignments(dml)
                clauses += 1
            if self._accept_word("remove"):
                # UPDATE ... REMOVE p1[, p2]: clear the property on
                # matching records (schema-full engine: the column
                # stays, the value goes NULL — typed by the when/
                # otherwise coercion in update_nodes)
                while True:
                    dml.assignments.append(
                        (self._name("property name"), "NULL")
                    )
                    if not self.accept("op", ","):
                        break
                clauses += 1
            if not clauses:
                raise ArcadeSQLError("UPDATE requires SET and/or REMOVE")
            if self._accept_word("upsert"):
                # UPDATE ... SET ... UPSERT [WHERE ...]: insert the SET
                # row when nothing matches (ArcadeDB semantics)
                if kind != "update":
                    raise ArcadeSQLError("UPSERT applies to vertex UPDATE only")
                dml.ddl["upsert"] = True
            self._dml_return(dml, allow={"after", "before"})
            if self.accept("kw", "where"):
                dml.where = self._expr(dummy)
            return dml
        if head == "delete":
            # DELETE VERTEX <T> | DELETE EDGE <T> | DELETE FROM <T>
            if self._accept_word("edge"):
                dml = _DML(kind="delete_edge", label=self._name("edge type"))
                if self.accept("kw", "from"):
                    # DELETE EDGE <T> FROM <key|(SELECT…)> TO
                    # <key|(SELECT…)> — ArcadeDB's endpoint form;
                    # deletes every edge between the two sets
                    dml.edge_from = self._expr(dummy)
                    self._expect_word("to")
                    dml.edge_to = self._expr(dummy)
                if self.accept("kw", "where"):
                    dml.where = self._expr(dummy)
                return dml
            if not self._accept_word("vertex"):
                self.expect("kw", "from")
            dml = _DML(kind="delete", label=self._name("type name"))
            self._dml_return(dml, allow={"before"})
            if self.accept("kw", "where"):
                dml.where = self._expr(dummy)
            return dml
        if head == "drop":
            # DROP TYPE <T> [UNSAFE] | DROP PROPERTY <T>.<p> |
            # DROP INDEX ON <T> (cols) — the CREATE DDL inverses
            if self._accept_word("type"):
                label = self._name("type name")
                unsafe = bool(self._accept_word("unsafe"))
                return _DML(
                    kind="ddl_drop_type", label=label, ddl={"unsafe": unsafe}
                )
            if self._accept_word("property"):
                label = self._name("type name")
                self.expect("op", ".")
                prop = self._name("property name")
                return _DML(
                    kind="ddl_drop_property", label=label, ddl={"prop": prop}
                )
            if self._accept_word("index"):
                self._expect_word("on")
                label = self._name("type name")
                self.expect("op", "(")
                cols = [self._name("column name")]
                while self.accept("op", ","):
                    cols.append(self._name("column name"))
                self.expect("op", ")")
                return _DML(
                    kind="ddl_drop_index", label=label, ddl={"columns": cols}
                )
            raise ArcadeSQLError(
                "DROP supports TYPE <T> [UNSAFE], PROPERTY <T>.<p>, "
                "INDEX ON <T> (cols)"
            )
        if head == "alter":
            # ALTER TYPE <T> NAME <New> — the rename cascade
            self._expect_word("type")
            label = self._name("type name")
            self._expect_word("name")
            new = self._name("new type name")
            return _DML(kind="ddl_rename_type", label=label, ddl={"new": new})
        if head == "create":
            # DDL forms: CREATE VERTEX TYPE <T> | CREATE EDGE TYPE <T>
            # FROM <L> TO <L> | CREATE PROPERTY <T>.<p> <TYPE> |
            # CREATE INDEX ON <T> (cols) [UNIQUE] — plus the DML
            # forms CREATE VERTEX <T> [SET ...] (insert-one alias)
            # and CREATE EDGE <T> FROM <key> TO <key> [SET ...]
            if self._accept_word("property"):
                label = self._name("type name")
                self.expect("op", ".")
                prop = self._name("property name")
                type_name = self._name("type keyword")
                return _DML(
                    kind="ddl_property", label=label,
                    ddl={"prop": prop, "type": type_name},
                )
            if self._accept_word("index"):
                self._expect_word("on")
                label = self._name("type name")
                self.expect("op", "(")
                cols = [self._name("column name")]
                while self.accept("op", ","):
                    cols.append(self._name("column name"))
                self.expect("op", ")")
                unique = bool(self._accept_word("unique"))
                if not unique:
                    self._accept_word("notunique")
                return _DML(
                    kind="ddl_index", label=label,
                    ddl={"columns": cols, "unique": unique},
                )
            if self._accept_word("edge"):
                if self._accept_word("type"):
                    dml = _DML(kind="ddl_edge_type", label=self._name("edge type"))
                    self.expect("kw", "from")
                    dml.ddl["src_label"] = self._name("source node type")
                    self._expect_word("to")
                    dml.ddl["dst_label"] = self._name("target node type")
                    return dml
                dml = _DML(kind="insert_edge", label=self._name("edge type"))
                self.expect("kw", "from")
                dml.edge_from = self._expr(dummy)
                self._expect_word("to")
                dml.edge_to = self._expr(dummy)
                row: dict = {}
                if self._accept_word("set"):
                    self._dml_assignments(dml)
                    row = dict(dml.assignments)
                    dml.assignments = []
                dml.rows = [row]
                return dml
            self._expect_word("vertex")
            if self._accept_word("type"):
                return _DML(kind="ddl_node_type", label=self._name("type name"))
            dml = _DML(kind="insert", label=self._name("type name"))
            row = {}
            if self._accept_word("set"):
                self._dml_assignments(dml)
                row = dict(dml.assignments)
                dml.assignments = []
            dml.rows = [row]
            return dml
        # INSERT INTO <T> SET ...  |  INSERT INTO <T> (cols) VALUES (...)[, (...)]
        self._expect_word("into")
        dml = _DML(kind="insert", label=self._name("type name"))
        if self._accept_word("set"):
            self._dml_assignments(dml)
            dml.rows = [dict(dml.assignments)]
            dml.assignments = []
            return dml
        self.expect("op", "(")
        cols: list[str] = []
        while True:
            cols.append(self._name("column name"))
            if not self.accept("op", ","):
                break
        self.expect("op", ")")
        self._expect_word("values")
        while True:
            self.expect("op", "(")
            vals: list[str] = []
            while True:
                vals.append(self._expr(dummy))
                if not self.accept("op", ","):
                    break
            self.expect("op", ")")
            if len(vals) != len(cols):
                raise ArcadeSQLError(
                    f"INSERT arity mismatch: {len(cols)} columns, "
                    f"{len(vals)} values"
                )
            dml.rows.append(dict(zip(cols, vals)))
            if not self.accept("op", ","):
                break
        return dml

    # -- MATCH pattern blocks (ArcadeDB/OrientDB MATCH syntax)
    def _match_chain(
        self,
    ) -> tuple[list[dict], list[tuple[str, str | None, str | None]]]:
        nodes = [self._node_pattern()]
        steps: list[tuple[str, str | None]] = []
        while True:
            step = self._edge_step()
            if step is None:
                break
            steps.append(step)
            nodes.append(self._node_pattern())
        return nodes, steps

    def _match(self) -> _Match:
        self.expect("kw", "match")
        nodes, steps = self._match_chain()
        extra: list[dict] = []
        # comma-separated additional chains (ArcadeDB multi-pattern
        # MATCH); `NOT { ... }` chains are negative patterns.
        while self.accept("op", ","):
            negated = bool(self.accept("kw", "not"))
            c_nodes, c_steps = self._match_chain()
            if not c_steps:
                raise ArcadeSQLError(
                    "an additional MATCH pattern must contain at least "
                    "one edge step"
                )
            extra.append({"negated": negated, "nodes": c_nodes, "steps": c_steps})
        self.expect("kw", "return")
        dummy = _Select(
            projections=[], star=False, expand_edge=None, source_type=None,
            subquery=None, where=None, group_by=[], order_by=[], skip=None,
            limit=None,
        )
        # Assign SQL aliases (user `as:` or generated) across ALL
        # chains — a pattern whose `as:` names an already-seen alias
        # BINDS to it (shared node, no new join) — then compile the
        # deferred node-pattern wheres qualified with that alias.
        bound: dict[str, dict] = {}
        counter = 0

        def assign(pat: dict, inner_prefix: str | None = None) -> None:
            nonlocal counter
            if pat["as"] and pat["as"] in bound:
                pat["alias"] = pat["as"]
                pat["bound"] = True
                prev = bound[pat["as"]]
                if pat["type"] and not prev.get("type"):
                    raise ArcadeSQLError(
                        f"alias {pat['as']!r} was first bound untyped — "
                        "declare the type at its first occurrence"
                    )
            elif inner_prefix is not None:
                # fresh node inside a NOT pattern: scoped to the
                # NOT EXISTS subquery — never visible to RETURN, so
                # it is not registered as a shared alias.
                pat["alias"] = f"{inner_prefix}_{counter}"
                counter += 1
                pat["bound"] = False
            else:
                pat["alias"] = pat["as"] or f"__m{counter}"
                counter += 1
                pat["bound"] = False
                if pat["as"]:
                    bound[pat["as"]] = pat
            toks = pat.pop("_where_toks", None)
            if toks is not None:
                sub = _Parser.__new__(_Parser)
                sub.toks = list(toks) + [_Tok("eof", "")]
                sub.i = 0
                sub.qual = pat["alias"]
                sub.shortest_paths = self.shortest_paths
                sub.matched_used = False
                pat["where"] = sub._expr(dummy)
                sub.expect("eof")
                pat["matched_used"] = sub.matched_used

        for pat in nodes:
            assign(pat)
        for k, chain in enumerate(extra):
            first = chain["nodes"][0]
            if not (first["as"] and first["as"] in bound):
                raise ArcadeSQLError(
                    "an additional MATCH pattern must start at an "
                    "already-bound alias (connected patterns only — a "
                    "disconnected pattern would be a cartesian product)"
                )
            prefix = f"__neg{k}" if chain["negated"] else None
            for pat in chain["nodes"]:
                if chain["negated"] and pat.get("optional"):
                    raise ArcadeSQLError(
                        "optional: true inside a NOT pattern is "
                        "contradictory"
                    )
                assign(pat, inner_prefix=prefix)
        # edge aliases ({as: e} on a step) share the compiled SQL
        # namespace with node aliases — collisions are a user error
        node_aliases = {p["alias"] for p in nodes}
        for chain in extra:
            node_aliases |= {p["alias"] for p in chain["nodes"]}
        seen_edges: set[str] = set()
        for st in (steps, *[c["steps"] for c in extra]):
            for _d, _lbl, ea in st:
                if ea is None:
                    continue
                if ea in node_aliases or ea in seen_edges:
                    raise ArcadeSQLError(
                        f"edge alias {ea!r} collides with another alias "
                        "in this MATCH"
                    )
                seen_edges.add(ea)
        returns: list[tuple[str, str | None]] = []
        while True:
            expr = self._expr(dummy)
            alias = None
            if self.accept("kw", "as"):
                alias = self.expect("ident").text
            returns.append((expr, alias))
            if not self.accept("op", ","):
                break
        m = _Match(nodes=nodes, steps=steps, returns=returns, extra=extra)
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            while True:
                m.group_by.append(self._expr(dummy))
                if not self.accept("op", ","):
                    break
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self._expr(dummy)
                direction = "ASC"
                if self.accept("kw", "desc"):
                    direction = "DESC"
                elif self.accept("kw", "asc"):
                    pass
                m.order_by.append((e, direction))
                if not self.accept("op", ","):
                    break
        if self.accept("kw", "skip"):
            m.skip = self._int("SKIP")
        if self.accept("kw", "limit"):
            m.limit = self._int("LIMIT")
        return m

    def _node_pattern(self) -> dict:
        """``{type: T, as: a, where: (expr)}`` — keys in any order,
        optional commas. The where expr is captured as a token slice
        and compiled AFTER the pattern closes, so it can be qualified
        with the node's alias even when ``as:`` follows ``where:``."""
        self.expect("op", "{")
        pat: dict = {
            "type": None, "as": None, "where": None, "optional": False,
            "vl": None,  # (min_depth, max_depth) for variable-length steps
        }
        where_slice: list[_Tok] | None = None
        while not self.accept("op", "}"):
            self.accept("op", ",")
            if self.peek().kind == "op" and self.peek().text == "}":
                continue
            key_t = self.next()
            key = key_t.text.lower()
            if key not in ("type", "as", "where", "optional", "maxdepth", "while"):
                raise ArcadeSQLError(
                    "MATCH node pattern supports type/as/where/optional/"
                    f"maxDepth/while, got {key!r}"
                )
            self.expect("op", ":")
            if key == "type":
                pat["type"] = self._name("type name")
            elif key == "as":
                pat["as"] = self.expect("ident").text
            elif key == "optional":
                t = self.next()
                if t.kind != "kw" or t.text not in ("true", "false"):
                    raise ArcadeSQLError(
                        f"optional: expects true/false, got {t.text!r}"
                    )
                pat["optional"] = t.text == "true"
            elif key == "maxdepth":
                n = self._int("maxDepth")
                lo = pat["vl"][0] if pat["vl"] else 1
                pat["vl"] = (lo, n)
            elif key == "while":
                # the documented ArcadeDB/OrientDB repeat form is a
                # depth bound: while: ($depth < N) / ($depth <= N).
                # Depth 0 (the anchor itself) is part of the result
                # set, per the OrientDB MATCH contract.
                self.expect("op", "(")
                v = self.expect("var")
                if v.text.lower() != "$depth":
                    raise ArcadeSQLError(
                        f"while: supports only $depth bounds, got {v.text}"
                    )
                op_t = self.expect("op")
                if op_t.text not in ("<", "<="):
                    raise ArcadeSQLError(
                        f"while: supports $depth < N / <= N, got {op_t.text}"
                    )
                n = self._int("while depth bound")
                self.expect("op", ")")
                # the condition gates STEPPING from depth d, so
                # $depth < N reaches depth N and $depth <= N reaches
                # N+1; depth 0 (the anchor) is always in the set
                pat["vl"] = (0, n if op_t.text == "<" else n + 1)
            else:
                self.expect("op", "(")
                depth = 1
                start = self.i
                while depth > 0:
                    t = self.next()
                    if t.kind == "eof":
                        raise ArcadeSQLError("unterminated where: ( in MATCH")
                    if t.kind == "op" and t.text == "(":
                        depth += 1
                    elif t.kind == "op" and t.text == ")":
                        depth -= 1
                where_slice = self.toks[start : self.i - 1]
        if where_slice is not None:
            pat["_where_toks"] = where_slice
        return pat

    def _edge_alias(self) -> str | None:
        """Optional ``{as: e}`` suffix on an edge step — a PATH
        variable binding the traversed edge, so RETURN (and the
        global WHERE) can project its properties from the typed
        ``e_<LABEL>`` view."""
        if not (self.peek().kind == "op" and self.peek().text == "{"):
            return None
        self.next()
        word = self._name("edge pattern key")
        if word.lower() != "as":
            raise ArcadeSQLError(
                f"edge patterns support only {{as: <alias>}}, got {word!r}"
            )
        self.expect("op", ":")
        alias = self._name("edge alias")
        self.expect("op", "}")
        return alias

    def _edge_step(self) -> tuple[str, str | None, str | None] | None:
        """``-LABEL->`` / ``-->`` (out), ``<-LABEL-`` / ``<--`` (in),
        or method form ``.out('LABEL')`` / ``.in()`` / ``.both()`` —
        each optionally carrying a ``{as: e}`` edge binding."""
        t = self.peek()
        if t.kind == "op" and t.text == "-":
            self.next()
            if self.peek().kind == "arrow" and self.peek().text == "->":
                self.next()
                return ("out", None, None)  # -->
            label = self._name("edge label")
            ealias = self._edge_alias()
            self.expect("arrow", "->")
            return ("out", label, ealias)
        if t.kind == "arrow" and t.text == "<-":
            self.next()
            if self.accept("op", "-"):
                return ("in", None, None)  # <--
            label = self._name("edge label")
            ealias = self._edge_alias()
            self.expect("op", "-")
            return ("in", label, ealias)
        if t.kind == "op" and t.text == ".":
            # method form: the brace group FOLLOWING `.out('X')` is the
            # next NODE pattern (OrientDB grammar), so edge aliases are
            # an arrow-form-only feature — no ambiguity there because
            # the alias braces sit before the arrow head
            self.next()
            d = self._direction("MATCH edge step")
            self.expect("op", "(")
            label = None
            if self.peek().kind == "string":
                label = self._string_val(self.next().text)
            self.expect("op", ")")
            return (d, label, None)
        return None

    # -- statements
    def _traverse(self) -> _Traverse:
        self.expect("kw", "traverse")
        steps: list[tuple[str, str | None]] = []
        while True:
            d = self._direction("TRAVERSE")
            self.expect("op", "(")
            label = None
            if self.peek().kind == "string":
                label = self._string_val(self.next().text)
            self.expect("op", ")")
            steps.append((d, label))
            if not self.accept("op", ","):
                break
        self.expect("kw", "from")
        self.expect("op", "(")
        inner = self._select()
        self.expect("op", ")")
        maxdepth = None
        if self.accept("kw", "maxdepth"):
            maxdepth = self._int("MAXDEPTH")
        elif self._accept_word("while"):
            # ArcadeDB's other depth-bound spelling: WHILE $depth < n
            # / <= n (the same $depth-only restriction MATCH while:
            # enforces — arbitrary WHILE predicates would require
            # per-path evaluation, which the set-based BFS
            # deliberately avoids). Parens optional, like ArcadeDB.
            parens = bool(self.accept("op", "("))
            v = self.expect("var")
            if v.text != "$depth":
                raise ArcadeSQLError(
                    f"TRAVERSE WHILE supports only $depth bounds, "
                    f"got {v.text}"
                )
            op_t = self.next()
            if op_t.kind != "op" or op_t.text not in ("<", "<="):
                raise ArcadeSQLError(
                    "TRAVERSE WHILE supports $depth < N / <= N, got "
                    f"{op_t.text!r}"
                )
            neg = self.accept("op", "-") is not None
            n = self._int("WHILE depth bound")
            if neg:
                n = -n
            if parens:
                self.expect("op", ")")
            # TRAVERSE WHILE gates record INCLUSION (OrientDB/ArcadeDB
            # semantics: the condition is evaluated per visited
            # record; false -> not included, not expanded), so
            # WHILE $depth <= N is exactly MAXDEPTH N and
            # WHILE $depth < N is MAXDEPTH N-1 (round-8 review
            # finding — the first cut mapped expansion, one frontier
            # too deep). MATCH while: keeps its documented
            # expansion-gating reading, which matches MATCH's
            # per-step evaluation point.
            # the condition is evaluated on the ROOTS too (depth 0):
            # a bound false at 0 (`< 0`, `<= -1`) includes nothing —
            # keep the negative value as an empty-result sentinel
            # instead of clamping to MAXDEPTH 0, which would still
            # return the roots (round-9 advice finding)
            maxdepth = n if op_t.text == "<=" else n - 1
        return _Traverse(steps=steps, inner=inner, maxdepth=maxdepth)

    def _select(self) -> _Select:
        self.expect("kw", "select")
        sel = _Select(
            projections=[], star=False, expand_edge=None, source_type=None,
            subquery=None, where=None, group_by=[], order_by=[], skip=None,
            limit=None,
        )
        if self._sel_stack:
            # nested (scalar / LET / FROM) subquery: fresh alias so an
            # outer-record correlation ($parent.$current.<field>) is
            # not shadowed by this scope's own FROM alias
            self._sub_counter += 1
            sel.alias = f"__sub{self._sub_counter}"
        self._sel_stack.append(sel)
        try:
            return self._select_tail(sel)
        finally:
            self._sel_stack.pop()

    def _select_tail(self, sel: _Select) -> _Select:
        if self.accept("kw", "distinct"):
            sel.distinct = True
        # projections (may be empty: ArcadeDB `SELECT FROM X` == SELECT *)
        if self.peek().kind == "kw" and self.peek().text == "from":
            sel.star = True
        elif self.accept("op", "*"):
            sel.star = True
        elif (
            self.peek().kind == "ident"
            and self.peek().text.lower() == "expand"
        ):
            self.next()
            self.expect("op", "(")
            d = self._direction("expand()", edges_ok=True)
            self.expect("op", "(")
            label = None
            if self.peek().kind == "string":
                label = self._string_val(self.next().text)
            self.expect("op", ")")
            self.expect("op", ")")
            sel.expand_edge = (d, label or "")
        else:
            while True:
                expr = self._expr(sel)
                alias = None
                if self.accept("kw", "as"):
                    alias = self.expect("ident").text
                sel.projections.append((expr, alias))
                if not self.accept("op", ","):
                    break
        self.expect("kw", "from")
        if self.accept("op", "("):
            if self.peek().kind == "kw" and self.peek().text == "traverse":
                sel.traverse_subquery = self._traverse()
                # $depth in the outer WHERE/projections refers to the
                # traversal depth column (ArcadeDB context variable)
                sel.lets.setdefault("depth", f"{sel.alias}.depth")
            else:
                sel.subquery = self._select()
            self.expect("op", ")")
        elif self.peek().kind == "rid":
            # RID literal source: `SELECT FROM #bucket:pos` returns
            # the one addressed record (ArcadeDB SQL [B]; RIDs are how
            # Studio deep-links records). bucket→label resolves at
            # compile time; pos is the node_id the same session's
            # `SELECT @rid FROM T` echoes.
            b, p = self.next().text[1:].split(":")
            sel.rid = (int(b), int(p))
        elif (
            self.peek().kind == "ident"
            and self.peek().text.lower() == "schema"
            and self.peek(1).kind == "op"
            and self.peek(1).text == ":"
        ):
            # schema:{types|indexes|buckets} — system TVF targets
            self.next()
            self.next()
            which = self._name("schema table").lower()
            if which not in ("types", "indexes", "buckets"):
                raise ArcadeSQLError(
                    f"unknown schema table 'schema:{which}' — use "
                    "schema:types, schema:indexes or schema:buckets"
                )
            sel.schema_source = which
        else:
            sel.source_type = self._name("type name")
        # LET $var = <expr | (SELECT ...)> [, ...] — ArcadeDB context
        # variables. Bindings are inlined where $var is referenced; an
        # uncorrelated (SELECT agg ...) binding becomes a Spark scalar
        # subquery, which Catalyst executes once and broadcasts (the
        # q67 broadcast 1-row-agg semantics).
        if self.accept("kw", "let"):
            while True:
                var = self.expect("var").text[1:]
                self.expect("op", "=")
                sel.lets[var] = self._expr(sel)
                if not self.accept("op", ","):
                    break
        if self.accept("kw", "where"):
            sel.where = self._expr(sel)
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            while True:
                sel.group_by.append(self._expr(sel))
                if not self.accept("op", ","):
                    break
        # UNWIND <field>[, ...] — flatten a projected collection field
        # into one row per element (ArcadeDB/OrientDB UNWIND clause).
        # Grammar places it after ORDER BY, but users type both
        # orders; accept it on either side.
        def _unwind_clause() -> None:
            if self._accept_word("unwind"):
                while True:
                    sel.unwind.append(self._name("UNWIND field"))
                    if not self.accept("op", ","):
                        break

        _unwind_clause()
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self._expr(sel)
                direction = "ASC"
                if self.accept("kw", "desc"):
                    direction = "DESC"
                elif self.accept("kw", "asc"):
                    pass
                sel.order_by.append((e, direction))
                if not self.accept("op", ","):
                    break
        _unwind_clause()
        if self.accept("kw", "skip"):
            sel.skip = self._int("SKIP")
        if self.accept("kw", "limit"):
            sel.limit = self._int("LIMIT")
        # ArcadeDB also allows LIMIT before SKIP; accept a trailing SKIP
        if sel.skip is None and self.accept("kw", "skip"):
            sel.skip = self._int("SKIP")
        return sel

    # -- expressions (precedence: OR < AND < NOT < cmp < add < mul < unary)
    def _expr(self, sel: _Select) -> str:
        return self._or(sel)

    def _or(self, sel: _Select) -> str:
        left = self._and(sel)
        while self.accept("kw", "or"):
            left = f"({left} OR {self._and(sel)})"
        return left

    def _and(self, sel: _Select) -> str:
        left = self._not(sel)
        while self.accept("kw", "and"):
            left = f"({left} AND {self._not(sel)})"
        return left

    def _not(self, sel: _Select) -> str:
        if self.accept("kw", "not"):
            return f"(NOT {self._not(sel)})"
        return self._cmp(sel)

    _RID_MARK = re.compile(r"^/\*RID:(\d+)\*/(.+)$")

    def _rid_equality(self, left: str, right: str, op: str) -> str | None:
        """ArcadeDB RID equality includes the BUCKET: `@rid = #b:p`
        must constrain both the position (node_id) and the bucket's
        type, matching the FROM-position path (`SELECT FROM #b:p`) —
        otherwise a wrong-bucket RID (e.g. Region's bucket with a
        Nation node_id) would still match (ADVICE r9). Returns the
        compiled predicate when one side is a bare RID literal and
        the other is @rid; None defers to the generic comparison
        (pos-only — also the no-workspace fallback, where buckets
        cannot resolve to labels)."""
        for rid_side, other in ((right, left), (left, right)):
            m = self._RID_MARK.match(rid_side)
            if m is None:
                continue
            if other != "node_id" and not other.endswith(".node_id"):
                return None  # RID compared against a non-@rid expr
            from biodwh2_arcadedb_server_spark import workspace as ws

            if not ws.RID_BUCKET_LABELS:
                return None
            label = _rid_bucket_label(int(m.group(1)))
            label_col = other[: -len("node_id")] + "label"
            eq = f"({other} = {m.group(2)} AND {label_col} = '{label}')"
            return eq if op == "=" else f"(NOT {eq})"
        return None

    def _cmp(self, sel: _Select) -> str:
        left = self._add(sel)
        t = self.peek()
        if t.kind == "arrow":
            # `<-`/`->` lex as MATCH arrows everywhere; in expression
            # context re-split into operator chars so `age<-1` parses
            # as `age < -1` (valid ArcadeDB SQL — ADVICE r4). MATCH
            # edge steps consume arrow tokens before reaching here.
            self.toks[self.i : self.i + 1] = [
                _Tok("op", t.text[0]),
                _Tok("op", t.text[1]),
            ]
            t = self.peek()
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            if op == "!=":
                op = "<>"
            right = self._add(sel)
            if op in ("=", "<>"):
                rid_eq = self._rid_equality(left, right, op)
                if rid_eq is not None:
                    return rid_eq
            return f"({left} {op} {right})"
        if t.kind == "kw" and t.text == "like":
            self.next()
            return f"({left} LIKE {self._add(sel)})"
        if t.kind == "kw" and t.text == "contains":
            # ArcadeDB: <collection-or-string field> CONTAINS value
            self.next()
            rhs = self._add(sel)
            return f"array_contains({left}, {rhs})"
        if t.kind == "ident" and t.text.lower() in (
            "containstext", "ilike", "matches",
            "containsany", "containsall",
        ):
            # soft-keyword predicates (idents, so no lexing impact):
            # CONTAINSTEXT = case-insensitive substring, ILIKE =
            # case-insensitive LIKE, MATCHES = regex (Spark RLIKE),
            # CONTAINSANY/CONTAINSALL = collection-vs-collection
            # membership (ArcadeDB SQL where-operators) — both compile
            # to JVM higher-order/array builtins, no shuffle, pushdown
            # of the surrounding conjuncts unaffected
            op_name = self.next().text.lower()
            rhs = self._add(sel)
            if op_name == "containstext":
                return f"(instr(lower({left}), lower({rhs})) > 0)"
            if op_name == "ilike":
                return f"(lower({left}) LIKE lower({rhs}))"
            if op_name == "containsany":
                return f"arrays_overlap({left}, {rhs})"
            if op_name == "containsall":
                # every rhs element present in the lhs collection
                return (
                    f"(size(array_except({rhs}, {left})) = 0 "
                    f"AND {rhs} IS NOT NULL AND {left} IS NOT NULL)"
                )
            return f"({left} RLIKE {rhs})"
        if t.kind == "kw" and t.text == "in":
            self.next()
            rhs = self._add(sel)
            if rhs.startswith("array("):
                return f"({left} IN ({rhs[len('array('):-1]}))"
            if rhs.startswith("(SELECT"):
                # IN-subquery (ArcadeDB supports it; previously this
                # miscompiled to array_contains(<scalar subquery>, x)
                # — VERDICT r4). `rhs` carries exactly one paren layer
                # from _primary, so this emits `x IN (SELECT ...)`.
                return f"({left} IN {rhs})"
            if rhs.startswith("__LET_"):
                # $var bound to a [list] — the documented collection
                # membership path; shape is checked after inlining.
                return f"array_contains({rhs}, {left})"
            raise ArcadeSQLError(
                "IN requires a [list], a (SELECT ...) subquery, or a "
                f"$var list binding; got expression {rhs!r}"
            )
        if t.kind == "kw" and t.text == "between":
            self.next()
            lo = self._add(sel)
            self.expect("kw", "and")
            hi = self._add(sel)
            return f"({left} BETWEEN {lo} AND {hi})"
        if t.kind == "kw" and t.text == "is":
            self.next()
            if self.accept("kw", "not"):
                self.expect("kw", "null")
                return f"({left} IS NOT NULL)"
            self.expect("kw", "null")
            return f"({left} IS NULL)"
        return left

    def _add(self, sel: _Select) -> str:
        left = self._mul(sel)
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("+", "-"):
                op = self.next().text
                left = f"({left} {op} {self._mul(sel)})"
            else:
                return left

    def _mul(self, sel: _Select) -> str:
        left = self._unary(sel)
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("*", "/", "%"):
                op = self.next().text
                left = f"({left} {op} {self._unary(sel)})"
            else:
                return left

    def _unary(self, sel: _Select) -> str:
        if self.accept("op", "-"):
            return f"(-{self._unary(sel)})"
        return self._postfix_methods(self._primary(sel), sel)

    # ArcadeDB field-method chaining (`name.toUpperCase()`,
    # `text.substring(0, 5).trim()`, `x.asInteger()` …) — the Studio
    # idiom — compiled to the equivalent Spark expressions. Java
    # 0-based substring/indexOf/charAt shift to Spark's 1-based forms.
    _ZERO_ARG_METHODS = {
        "touppercase": "upper({x})",
        "tolowercase": "lower({x})",
        "trim": "trim({x})",
        "length": "length({x})",
        "size": "size({x})",
        "asstring": "CAST({x} AS STRING)",
        "asinteger": "CAST({x} AS INT)",
        "aslong": "CAST({x} AS BIGINT)",
        "asfloat": "CAST({x} AS DOUBLE)",
        "asdecimal": "CAST({x} AS DECIMAL(38,18))",
        "asboolean": "CAST({x} AS BOOLEAN)",
        "asdate": "to_date({x})",
        "asdatetime": "to_timestamp({x})",
    }

    def _index_suffix(self, expr: str, sel: _Select) -> str:
        """ArcadeDB collection/map access: ``field[0]`` (0-based
        element), ``field[1-3]`` (inclusive range sublist),
        ``field['key']`` (map value). Compiles to ``element_at`` /
        ``slice`` — JVM builtins, codegen-friendly, index shifted to
        Spark's 1-based convention."""
        self.expect("op", "[")
        t = self.peek()
        if t.kind == "string":
            key = self.next().text
            self.expect("op", "]")
            return f"element_at({expr}, {key})"
        lo = self._int("collection index")
        if self.accept("op", "-"):
            hi = self._int("collection range end")
            self.expect("op", "]")
            if hi < lo:
                raise ArcadeSQLError(
                    f"collection range [{lo}-{hi}] is reversed"
                )
            return f"slice({expr}, {lo + 1}, {hi - lo + 1})"
        self.expect("op", "]")
        return f"element_at({expr}, {lo + 1})"

    def _postfix_methods(self, expr: str, sel: _Select) -> str:
        while True:
            # indexing and method calls interleave freely:
            # x.split(',')[0].trim()
            if self.peek().kind == "op" and self.peek().text == "[":
                expr = self._index_suffix(expr, sel)
                continue
            if not (
                self.peek().kind == "op"
                and self.peek().text == "."
                and self.peek(1).kind == "ident"
                and self.peek(2).kind == "op"
                and self.peek(2).text == "("
            ):
                return expr
            self.next()  # .
            meth = self.next().text.lower()
            self.next()  # (
            args: list[str] = []
            if not (self.peek().kind == "op" and self.peek().text == ")"):
                while True:
                    args.append(self._expr(sel))
                    if not self.accept("op", ","):
                        break
            self.expect("op", ")")
            if meth in self._ZERO_ARG_METHODS and not args:
                expr = self._ZERO_ARG_METHODS[meth].format(x=expr)
            elif meth == "left" and len(args) == 1:
                expr = f"left({expr}, {args[0]})"
            elif meth == "right" and len(args) == 1:
                expr = f"right({expr}, {args[0]})"
            elif meth == "substring" and len(args) == 1:
                expr = f"substring({expr}, ({args[0]}) + 1)"
            elif meth == "substring" and len(args) == 2:
                # Java semantics: [begin, end) 0-based
                expr = (
                    f"substring({expr}, ({args[0]}) + 1, "
                    f"({args[1]}) - ({args[0]}))"
                )
            elif meth == "replace" and len(args) == 2:
                expr = f"replace({expr}, {args[0]}, {args[1]})"
            elif meth == "indexof" and len(args) == 1:
                # instr is 1-based with 0 = absent; Java wants
                # 0-based with -1 = absent — the shift aligns both
                expr = f"(instr({expr}, {args[0]}) - 1)"
            elif meth == "charat" and len(args) == 1:
                expr = f"substring({expr}, ({args[0]}) + 1, 1)"
            elif meth == "append" and len(args) == 1:
                expr = f"concat({expr}, {args[0]})"
            elif meth == "prefix" and len(args) == 1:
                expr = f"concat({args[0]}, {expr})"
            elif meth == "split" and len(args) == 1:
                expr = f"split({expr}, {args[0]})"
            else:
                raise ArcadeSQLError(
                    f"unsupported method .{meth}() with {len(args)} "
                    "argument(s)"
                )

    def _string_val(self, raw: str) -> str:
        return raw[1:-1].replace("\\'", "'")

    def _primary(self, sel: _Select) -> str:
        t = self.peek()
        if t.kind == "number":
            return self.next().text
        if t.kind == "rid":
            # RID literal in expression position (`WHERE @rid = #b:p`):
            # the position component is the node_id (globally unique
            # content-derived hash); the bucket component is carried
            # through a marker comment so the equality compiler can
            # ALSO constrain the record's type — ArcadeDB RID equality
            # includes the bucket, and the FROM-position path
            # (`SELECT FROM #b:p`) resolves the bucket to a label, so
            # the two forms must agree (ADVICE r9). The marker is a
            # valid SQL bracketed comment, so any unhandled position
            # (arithmetic, IN lists) degrades to the pos-only compare.
            b, p = self.next().text[1:].split(":")
            from biodwh2_arcadedb_server_spark import workspace as ws

            if ws.RID_BUCKET_LABELS and not (
                0 <= int(b) < len(ws.RID_BUCKET_LABELS)
            ):
                raise ArcadeSQLError(
                    f"RID bucket {b} out of range — this workspace has "
                    f"buckets 0..{len(ws.RID_BUCKET_LABELS) - 1}"
                )
            return f"/*RID:{b}*/CAST({p} AS BIGINT)"
        if t.kind == "string":
            return self.next().text  # keep quoted — valid Spark literal
        if t.kind == "kw" and t.text in ("true", "false", "null"):
            return self.next().text.upper()
        if t.kind == "at":
            at = self.next().text.lower()
            if at == "@rid":
                return f"{self.qual}.node_id" if self.qual else "node_id"
            if at == "@type":
                return f"{self.qual}.label" if self.qual else "label"
            raise ArcadeSQLError(f"unsupported attribute {at}")
        if t.kind == "var":
            v = self.next().text
            if v.lower() == "$current":
                # $current.<field> — the record of the CURRENT select
                # context (ArcadeDB context variable); compiles to the
                # current scope's FROM alias.
                if not self._sel_stack:
                    raise ArcadeSQLError(
                        "$current is only valid inside a SELECT"
                    )
                self.expect("op", ".")
                prop = self._name("property name")
                return f"{self._sel_stack[-1].alias}.{prop}"
            if v.lower() == "$parent":
                # $parent.$current.<field> — the OUTER record's field
                # inside a LET / scalar subquery (per-record
                # correlated LET, round 8). Compiles to the enclosing
                # select's FROM alias: a correlated scalar subquery
                # that Catalyst decorrelates into a left outer join +
                # partial aggregate — one shuffle on the correlation
                # key, never a per-row execution.
                self.expect("op", ".")
                nxt = self.next()
                if nxt.kind != "var" or nxt.text.lower() != "$current":
                    raise ArcadeSQLError(
                        "$parent must be followed by .$current.<field>"
                    )
                self.expect("op", ".")
                prop = self._name("property name")
                if len(self._sel_stack) < 2:
                    raise ArcadeSQLError(
                        "$parent.$current.<field> is only valid inside "
                        "a subquery (no enclosing SELECT here)"
                    )
                return f"{self._sel_stack[-2].alias}.{prop}"
            if v.lower() == "$matched":
                # $matched.<alias>.<prop> — ArcadeDB's cross-alias
                # pattern-variable reference inside a node where:.
                # Compiles to the plain qualified column, which lands
                # in the global WHERE of the single join-chain SQL.
                self.expect("op", ".")
                alias = self.expect("ident").text
                self.expect("op", ".")
                prop = self._name("property name")
                self.matched_used = True
                return f"{alias}.{prop}"
            # $var — resolved against the LET bindings at compile time
            return f"__LET_{v[1:]}__"
        if t.kind == "op" and t.text == "(":
            self.next()
            if self.peek().kind == "kw" and self.peek().text == "select":
                sub = self._select()
                self.expect("op", ")")
                return f"({_compile_select(sub)})"  # scalar subquery
            inner = self._expr(sel)
            self.expect("op", ")")
            return f"({inner})"
        if t.kind == "op" and t.text == "[":
            self.next()
            items = []
            if not self.accept("op", "]"):
                while True:
                    items.append(self._expr(sel))
                    if not self.accept("op", ","):
                        break
                self.expect("op", "]")
            return f"array({', '.join(items)})"
        if t.kind == "ident" or (
            t.kind == "kw" and t.text == "in" and self.peek(1).text == "("
        ):
            # (a leading in('E') graph projection lexes `in` as keyword)
            name = self.next().text
            low = name.lower()
            if re.fullmatch(r"__LET_\w+__", name):
                # reserved: the LET-inlining sentinel (hardening —
                # a property with this name would be rewritten)
                raise ArcadeSQLError(f"reserved identifier {name}")
            if low in ("oute", "ine", "bothe") and self.peek().text == "(":
                # scalar-position outE/inE/bothE: identical multiset
                # cardinality to out/in/both in this encoding (the
                # neighbor-id projection keeps duplicate edges), so
                # .size() degree shorthand maps directly
                low = {"oute": "out", "ine": "in", "bothe": "both"}[low]
            if low in ("out", "in", "both") and self.peek().text == "(":
                self.next()
                label = None
                if self.peek().kind == "string":
                    label = self._string_val(self.next().text)
                self.expect("op", ")")
                expr = self._graph_projection(sel, low, label)
                # degree shorthand: out('E').size()
                if self.accept("op", "."):
                    fn = self.expect("ident").text.lower()
                    if fn != "size":
                        raise ArcadeSQLError(
                            f"only .size() is supported after {low}(), got .{fn}"
                        )
                    self.expect("op", "(")
                    self.expect("op", ")")
                    return f"size({expr})"
                return expr
            if low == "shortestpath" and self.peek().text == "(":
                return self._shortest_path_call(sel)
            if self.peek().text == "(":  # function call
                self.next()
                star = False
                prefix = ""
                args = []
                if low in _AGGS and self.accept("kw", "distinct"):
                    prefix = "DISTINCT "
                if self.accept("op", "*"):
                    star = True
                elif not (self.peek().kind == "op" and self.peek().text == ")"):
                    while True:
                        args.append(self._expr(sel))
                        if not self.accept("op", ","):
                            break
                self.expect("op", ")")
                if low == "count" and star:
                    return "count(*)"
                if low in ("set", "list"):
                    # ArcadeDB collection aggregates: set() dedupes,
                    # list() keeps multiplicity; both sorted — ArcadeDB
                    # guarantees no order, a stable one keeps results
                    # deterministic and oracle-able
                    if star or len(args) != 1:
                        raise ArcadeSQLError(
                            f"{low}() takes exactly one expression"
                        )
                    inner = "collect_set" if low == "set" else "collect_list"
                    return f"sort_array({inner}({args[0]}))"
                if low in _AGGS or low in _PASSTHROUGH_FNS:
                    return f"{low}({prefix}{', '.join(args)})"
                raise ArcadeSQLError(f"unsupported function {name}()")
            # alias-qualified reference (a.prop) — used by MATCH RETURN
            if (
                self.peek().kind == "op"
                and self.peek().text == "."
                and self.peek(1).kind == "ident"
                and self.peek(2).text != "("
            ):
                self.next()
                prop = self.next().text
                return f"{name}.{prop}"
            # plain property reference (qualified inside MATCH wheres)
            return f"{self.qual}.{name}" if self.qual else name
        raise ArcadeSQLError(f"unexpected token {t.text or t.kind!r}")

    def _shortest_path_call(self, sel: _Select) -> str:
        """``shortestPath(src, dstExpr [, dir [, label [, maxDepth]]])``
        → a correlated scalar subquery against a BFS-tree temp view
        (one tree per distinct spec, registered by ``execute()``).
        The source must be a LITERAL node id: that is what makes the
        compilation scale — one frontier-join BFS amortized over every
        row, instead of a per-row traversal."""
        self.expect("op", "(")
        src_tok = self.peek()
        if src_tok.kind != "number" or "." in src_tok.text:
            raise ArcadeSQLError(
                "shortestPath() source must be a literal node id — a "
                "per-row source would require one BFS per row; anchor "
                "the query on the source instead"
            )
        source = int(self.next().text)
        self.expect("op", ",")
        dst = self._expr(sel)
        direction = "both"  # ArcadeDB's documented default
        label: str | None = None
        maxdepth = 10
        pos = 0
        while self.accept("op", ","):
            t = self.next()
            if t.kind == "string" and pos == 0:
                val = self._string_val(t.text).lower()
                if val not in ("out", "in", "both"):
                    raise ArcadeSQLError(
                        f"shortestPath() direction must be OUT/IN/BOTH, got {t.text}"
                    )
                direction = val
            elif t.kind == "string" and pos == 1:
                label = self._string_val(t.text)
            elif t.kind == "number" and pos in (1, 2) and "." not in t.text:
                maxdepth = int(t.text)
                self.expect("op", ")")
                pos = -1  # consumed closing paren
                break
            else:
                raise ArcadeSQLError(
                    f"unexpected shortestPath() argument {t.text!r}"
                )
            pos += 1
        if pos >= 0:
            self.expect("op", ")")
        spec_key = (source, direction, label, maxdepth)
        for existing in self.shortest_paths:
            if existing["key"] == spec_key:
                view = existing["view"]
                break
        else:
            # View name is derived from the spec itself (not a
            # per-statement counter): the query server is a
            # ThreadingHTTPServer, so concurrent execute() calls with
            # DIFFERENT specs must never share a temp-view name, and
            # identical specs registering the identical BFS tree under
            # the identical name is harmlessly idempotent.
            import hashlib

            digest = hashlib.md5(repr(spec_key).encode()).hexdigest()[:12]
            view = f"__arcade_sp_{digest}"
            self.shortest_paths.append(
                {
                    "key": spec_key,
                    "view": view,
                    "source": source,
                    "direction": direction,
                    "label": label,
                    "maxdepth": maxdepth,
                }
            )
        # View columns are sentinel-prefixed (__sp_dst/__sp_hops/
        # __sp_path) so an outer column named dst/hops/path inside the
        # destination expression resolves against the OUTER relation,
        # never silently against the BFS view.
        expr = f"(SELECT __p.__sp_path FROM {view} __p WHERE __p.__sp_dst = ({dst}))"
        if self.accept("op", "."):
            fn = self.expect("ident").text.lower()
            if fn != "size":
                raise ArcadeSQLError(
                    f"only .size() is supported after shortestPath(), got .{fn}"
                )
            self.expect("op", "(")
            self.expect("op", ")")
            return f"size({expr})"
        return expr

    def _graph_projection(self, sel: _Select, direction: str, label: str | None) -> str:
        """out('E') → array of neighbor ids, as a correlated aggregate
        subquery over the unified edges view (Catalyst decorrelates it
        into a left join + partial aggregate)."""
        sel.uses_graph_projection = True
        a = sel.alias
        cond = {"out": f"e.src = {a}.node_id", "in": f"e.dst = {a}.node_id"}
        pick = {"out": "e.dst", "in": "e.src"}
        lbl = f" AND e.label = '{_sql_str(label)}'" if label else ""
        if direction == "both":
            return (
                "(SELECT sort_array(collect_list(x)) FROM (SELECT e.dst AS x "
                f"FROM edges e WHERE e.src = {a}.node_id{lbl} UNION ALL "
                "SELECT e.src AS x FROM edges e WHERE e.dst = "
                f"{a}.node_id{lbl}))"
            )
        return (
            f"(SELECT sort_array(collect_list({pick[direction]})) FROM edges e "
            f"WHERE {cond[direction]}{lbl})"
        )


# ---------------------------------------------------------------- compiler
_STRING_SPAN_RE = re.compile(r"('(?:[^'\\]|\\.)*')")


def _replace_outside_strings(sql: str, needle: str, repl: str) -> str:
    """Replace ``needle`` only OUTSIDE single-quoted SQL literals, so
    a user string containing the LET sentinel pattern is never
    rewritten (ADVICE r4: the old whole-string replace was textual)."""
    parts = _STRING_SPAN_RE.split(sql)
    return "".join(
        p if i % 2 else p.replace(needle, repl) for i, p in enumerate(parts)
    )


def _top_level_conjuncts(expr: str) -> list[str]:
    """Split a compiled boolean expression on top-level ``AND``
    (outside string literals and parentheses) — the UPSERT insert
    branch folds simple equality conjuncts into the new row."""
    out: list[str] = []
    depth = i = start = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c == "'":
            j = i + 1
            while j < n:
                if expr[j] == "\\":
                    j += 2
                    continue
                if expr[j] == "'":
                    break
                j += 1
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and expr[i : i + 5].upper() == " AND ":
            out.append(expr[start:i])
            start = i + 5
            i += 5
            continue
        i += 1
    out.append(expr[start:])
    return [p for p in (s.strip() for s in out) if p]


def _fold_equality_conjuncts(expr: str, row: dict) -> None:
    """Collect top-level ``col = literal`` conjuncts of a compiled
    WHERE into ``row`` (UPSERT's insert branch), unwrapping balanced
    outer parentheses recursively. Existing keys (SET wins) and
    non-equality conjuncts are left alone."""
    for part in _top_level_conjuncts(expr):
        while part.startswith("(") and part.endswith(")"):
            # strip only a paren pair that wraps the WHOLE part
            depth = 0
            wraps = True
            i, n = 0, len(part)
            while i < n:
                c = part[i]
                if c == "'":
                    j = i + 1
                    while j < n:
                        if part[j] == "\\":
                            j += 2
                            continue
                        if part[j] == "'":
                            break
                        j += 1
                    i = j + 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0 and i < n - 1:
                        wraps = False
                        break
                i += 1
            if not wraps:
                break
            inner = part[1:-1].strip()
            subs = _top_level_conjuncts(inner)
            if len(subs) > 1:
                for sp in subs:
                    _fold_equality_conjuncts(sp, row)
                return
            part = inner
        m = re.fullmatch(
            r"\s*([A-Za-z_]\w*)\s*=\s*"
            r"('(?:[^'\\]|\\.)*'|-?\d+(?:\.\d+)?)\s*",
            part,
        )
        if m and m.group(1) not in row:
            row[m.group(1)] = m.group(2)


def _requalify_alias(sql: str, alias: str, new_alias: str) -> str:
    """Rewrite ``alias.`` qualifiers to ``new_alias.`` — only OUTSIDE
    single-quoted literals and only at identifier boundaries. The old
    naive ``str.replace`` rewrote occurrences inside string literals
    (``where: (o_orderstatus = 'o.x')`` silently became a comparison
    against ``'__t0.x'``) and inside longer aliases (ADVICE r6)."""
    pat = re.compile(rf"(?<![A-Za-z0-9_$]){re.escape(alias)}\.")
    parts = _STRING_SPAN_RE.split(sql)
    return "".join(
        p if i % 2 else pat.sub(new_alias + ".", p)
        for i, p in enumerate(parts)
    )


def _finalize_lets(sql: str, sel: _Select) -> str:
    """Inline LET bindings (in definition order, so later bindings may
    reference earlier $vars) and reject any unbound $var. Applied to
    EVERY return path of _compile_select — the outE/inE/bothE expand
    branch used to return early and skip it (ADVICE r4). Substitution
    and the unbound check both skip string-literal spans."""
    if sel.lets:
        resolved: dict[str, str] = {}
        for name, binding in sel.lets.items():
            for prev, val in resolved.items():
                binding = _replace_outside_strings(
                    binding, f"__LET_{prev}__", f"({val})"
                )
            resolved[name] = binding
        for name, val in resolved.items():
            sql = _replace_outside_strings(sql, f"__LET_{name}__", f"({val})")
    bare = _STRING_SPAN_RE.sub("''", sql)
    if "__LET_" in bare:
        unbound = re.search(r"__LET_(\w+)__", bare)
        raise ArcadeSQLError(
            f"unbound context variable ${unbound.group(1)} (no LET binding)"
        )
    return sql


_IDENT_RE = re.compile(r"[A-Za-z_]\w*$")


def _apply_unwind(sql: str, sel: _Select) -> str:
    """``UNWIND f[, g]`` → wrap the compiled SELECT in LATERAL VIEW
    OUTER explode legs, one row per collection element (several
    UNWIND fields multiply per-row, like ArcadeDB). OUTER keeps a
    record whose collection is empty/null as ONE row with a null
    element — the record is never dropped. ORDER BY / SKIP / LIMIT
    apply to the unwound rows (they follow UNWIND in the grammar) and
    therefore resolve against the projected column names.

    Scale: explode is a whole-stage-codegen Generate node — map-side
    row expansion, no shuffle; filters above it on non-generated
    columns still push through to the scan."""
    if sel.star:
        raise ArcadeSQLError(
            "UNWIND requires explicit projections (it unwinds a "
            "projected result field)"
        )
    names: list[str] = []
    for expr, alias in sel.projections:
        if alias:
            names.append(alias)
        elif _IDENT_RE.fullmatch(expr):
            names.append(expr)
        else:
            raise ArcadeSQLError(
                "UNWIND requires every projection to carry a result "
                f"name — add AS to {expr!r}"
            )
    unknown = [u for u in sel.unwind if u not in names]
    if unknown:
        raise ArcadeSQLError(
            f"UNWIND field(s) {unknown} not found among the projected "
            f"result fields {[n for n in names if n]}"
        )
    laterals = []
    out_cols = []
    for name in names:
        if name in sel.unwind:
            j = sel.unwind.index(name)
            laterals.append(
                f"LATERAL VIEW OUTER explode(__unw.{name}) "
                f"__lv{j} AS __unw_val{j}"
            )
            out_cols.append(f"__unw_val{j} AS {name}")
        else:
            out_cols.append(f"__unw.{name}")
    return (
        f"SELECT {', '.join(out_cols)} FROM ({sql}) __unw "
        + " ".join(laterals)
    )


def _explain_dml(stmt: "_DML") -> str:
    """One-string staged-write summary for EXPLAIN <dml> (round 9):
    names the operation, target dataset, predicate, and payload shape
    so an interactive user can inspect the mutation BEFORE flipping
    the writes gate. Mirrors what _execute_dml will do — a dataset
    recompute + atomic swap, never an in-place record edit."""
    lines = [f"operation: {stmt.kind.upper()} on {stmt.label}"]
    if stmt.where:
        lines.append(f"predicate: {stmt.where}")
    if stmt.assignments:
        cols = ", ".join(c for c, _ in stmt.assignments)
        lines.append(f"assignments: {cols}")
    if stmt.rows:
        lines.append(f"rows staged: {len(stmt.rows)}")
    if stmt.edge_from is not None:
        lines.append(
            f"endpoints: FROM {stmt.edge_from} TO {stmt.edge_to} "
            "(left_semi validated; dangling skipped)"
        )
    if stmt.ddl:
        lines.append(f"ddl: {stmt.ddl}")
    lines.append(
        "execution: predicate-matched dataset recompute + atomic swap "
        "(gated by allow_writes; session views re-registered after)"
    )
    return "\n".join(lines)


def _explain_traverse(stmt: "_Traverse") -> str:
    """BFS plan summary for EXPLAIN TRAVERSE: depth bound and the
    per-step edge legs (direction + label) the frontier join unions
    each round."""
    legs = ", ".join(
        f"{d}({lbl!r})" if lbl else f"{d}()" for d, lbl in stmt.steps
    )
    if stmt.maxdepth is None:
        bound = "unbounded (until frontier exhausts)"
    elif stmt.maxdepth < 0:
        bound = "empty result (WHILE bound false at depth 0)"
    else:
        bound = f"maxdepth {stmt.maxdepth}"
    return (
        "operation: TRAVERSE (iterative frontier BFS, roots at depth 0)\n"
        f"edge legs: {legs}\n"
        f"depth bound: {bound}\n"
        "execution: per-round frontier join against the unified edges "
        "view, localCheckpoint-truncated lineage, visited-set anti-join"
    )


def _rid_bucket_label(bucket: int) -> str:
    """Resolve a RID literal's bucket index to its node label via the
    manifest-recorded bucket order (workspace.RID_BUCKET_LABELS,
    refreshed by every load_workspace). Clear errors for no-workspace
    sessions and out-of-range buckets (ArcadeDB raises on an invalid
    RID rather than returning empty)."""
    from biodwh2_arcadedb_server_spark import workspace as ws

    if not ws.RID_BUCKET_LABELS:
        raise ArcadeSQLError(
            "RID literals (#bucket:pos) require a loaded workspace "
            "(load_workspace registers the bucket→type order)"
        )
    if not 0 <= bucket < len(ws.RID_BUCKET_LABELS):
        raise ArcadeSQLError(
            f"RID bucket {bucket} out of range — this workspace has "
            f"buckets 0..{len(ws.RID_BUCKET_LABELS) - 1} "
            f"({', '.join(l or '<dropped>' for l in ws.RID_BUCKET_LABELS)})"
        )
    label = ws.RID_BUCKET_LABELS[bucket]
    if label is None:
        # manifest tombstone: DROP TYPE keeps the slot so later
        # buckets never shift (previously-echoed RIDs stay stable —
        # ADVICE r9); addressing the dropped slot errors loudly
        raise ArcadeSQLError(
            f"RID bucket {bucket} addresses a dropped type"
        )
    return label


def _compile_select(sel: _Select) -> str:
    if sel.traverse_subquery is not None:
        raise ArcadeSQLError(
            "SELECT over a TRAVERSE subquery is plan-level (it runs "
            "the frontier BFS first) — use execute()"
        )
    if sel.subquery is not None:
        source = f"({_compile_select(sel.subquery)}) {sel.alias}"
    elif sel.rid is not None:
        # resolve ONCE into plain (source_type, where) form so a
        # recompile of the same parsed statement stays idempotent
        label = _rid_bucket_label(sel.rid[0])
        rid_pred = f"{sel.alias}.node_id = {sel.rid[1]}"
        sel.where = f"({rid_pred}) AND ({sel.where})" if sel.where else rid_pred
        sel.source_type, sel.rid = label, None
        source = f"n_{label} {sel.alias}"
    else:
        source = f"n_{sel.source_type} {sel.alias}"

    if sel.expand_edge is not None:
        d, label = sel.expand_edge
        lbl = f" AND e.label = '{_sql_str(label)}'" if label else ""
        inner = f"SELECT node_id FROM {source}"
        if sel.where:
            inner += f" WHERE {sel.where}"
        if d in ("oute", "ine", "bothe"):
            # edge-returning expand: outE()/inE()/bothE() — edge rows,
            # not neighbor nodes (ArcadeDB returns edge records; our
            # edge identity is the (src, dst, label) triple)
            elegs = []
            if d in ("oute", "bothe"):
                elegs.append(
                    f"SELECT e.src, e.dst, e.label FROM edges e "
                    f"WHERE e.src IN ({inner}){lbl}"
                )
            if d in ("ine", "bothe"):
                elegs.append(
                    f"SELECT e.src, e.dst, e.label FROM edges e "
                    f"WHERE e.dst IN ({inner}){lbl}"
                )
            sql = " UNION ALL ".join(elegs)
            if sel.order_by:
                sql += " ORDER BY " + ", ".join(
                    f"{e} {dd}" for e, dd in sel.order_by
                )
            if sel.limit is not None:
                sql += f" LIMIT {sel.limit}"
            if sel.skip:
                sql += f" OFFSET {sel.skip}"
            return _finalize_lets(sql, sel)
        legs = []
        if d in ("out", "both"):
            legs.append(
                f"SELECT e.dst AS __nid FROM edges e WHERE e.src IN ({inner}){lbl}"
            )
        if d in ("in", "both"):
            legs.append(
                f"SELECT e.src AS __nid FROM edges e WHERE e.dst IN ({inner}){lbl}"
            )
        nbr = " UNION ALL ".join(legs)
        sql = (
            "SELECT n.node_id, n.label, n.natural_key, n.props FROM nodes n "
            f"WHERE n.node_id IN (SELECT __nid FROM ({nbr}))"
        )
    else:
        if sel.star:
            proj = f"{sel.alias}.*"
        else:
            parts = []
            for expr, alias in sel.projections:
                parts.append(f"{expr} AS {alias}" if alias else expr)
            proj = ", ".join(parts)
        head = "SELECT DISTINCT" if sel.distinct else "SELECT"
        sql = f"{head} {proj} FROM {source}"
        if sel.where:
            sql += f" WHERE {sel.where}"
        if sel.group_by:
            sql += " GROUP BY " + ", ".join(sel.group_by)
        if sel.unwind:
            sql = _apply_unwind(sql, sel)
    if sel.unwind and sel.expand_edge is not None:
        raise ArcadeSQLError("UNWIND cannot combine with expand()")
    if sel.order_by:
        sql += " ORDER BY " + ", ".join(f"{e} {d}" for e, d in sel.order_by)
    if sel.limit is not None:
        sql += f" LIMIT {sel.limit}"
    if sel.skip:
        sql += f" OFFSET {sel.skip}"
    # An uncorrelated (SELECT agg) LET binding inlines as a scalar
    # subquery — Catalyst evaluates it once and broadcasts the 1-row
    # result.
    return _finalize_lets(sql, sel)


_AGG_RE = re.compile(
    r"\b(count|sum|avg|min|max|first|last|collect_set|collect_list)\s*\(",
    re.I,
)


def _match_leg(
    e: str, a: str, b: str, d: str, label: str | None
) -> tuple[str, str]:
    """Join conditions for one edge step: (edge-join cond anchored at
    ``a``, node-join cond binding ``b``)."""
    lbl = f" AND {e}.label = '{_sql_str(label)}'" if label else ""
    if d == "out":
        return f"{e}.src = {a}.node_id{lbl}", f"{b}.node_id = {e}.dst"
    if d == "in":
        return f"{e}.dst = {a}.node_id{lbl}", f"{b}.node_id = {e}.src"
    return (
        f"({e}.src = {a}.node_id OR {e}.dst = {a}.node_id){lbl}",
        f"{b}.node_id = CASE WHEN {e}.src = {a}.node_id "
        f"THEN {e}.dst ELSE {e}.src END",
    )


def _compile_chain(
    nodes: list[dict],
    steps: list[tuple[str, str | None]],
    froms: list[str],
    wheres: list[str],
    tag: str,
) -> None:
    """Append one pattern chain's joins to ``froms``/``wheres``.
    The chain's first node must already be in scope (``bound`` or
    emitted by the caller). Non-optional steps are inner equi-joins;
    an ``optional: true`` node turns its step — and every later step
    in the chain — into a LEFT JOIN of a derived leg subquery
    (edge ⋈ typed view, the node's own ``where:`` folded inside), so
    per anchor row the leg yields its matches or ONE all-null row,
    exactly ArcadeDB's optional-pattern semantics. Catalyst still
    sees one join chain: pushdown and broadcast apply per leg."""
    optional = False
    for i, (d, label, ealias) in enumerate(steps):
        e = ealias or f"__e{tag}{i}"
        a = nodes[i]["alias"]
        nt = nodes[i + 1]
        b = nt["alias"]
        optional = optional or nt.get("optional", False)
        if ealias is not None:
            # the arrow grammar guarantees a label precedes the alias
            # braces, so e_<label> always resolves here
            if optional or nt.get("vl") is not None:
                raise ArcadeSQLError(
                    "edge aliases are not supported on optional or "
                    "variable-length steps"
                )
        vl = nt.get("vl")
        if vl is not None:
            # variable-length step (while: ($depth < N) / maxDepth: N)
            # → bounded unroll: UNION ALL of the L-fold edge
            # self-joins for L in [lo..hi], DISTINCT endpoint pairs
            # (MATCH binds only the endpoints, so distinct variable
            # assignments collapse multiple paths — the OrientDB
            # result contract), joined once onto the chain. Bounded by
            # construction: each L is a hash-join chain Catalyst
            # plans normally; unbounded reachability is TRAVERSE's
            # job (frontier BFS), and the depth cap enforces that
            # boundary.
            lo, hi = vl
            if hi > 10:
                raise ArcadeSQLError(
                    f"variable-length MATCH is capped at depth 10 "
                    f"(got {hi}) — use TRAVERSE for deep reachability"
                )
            if optional or nt.get("bound"):
                raise ArcadeSQLError(
                    "variable-length steps cannot be optional or close "
                    "a cycle"
                )
            lbl_w = f" WHERE label = '{_sql_str(label)}'" if label else ""
            legs = []
            if d in ("out", "both"):
                legs.append(f"SELECT src AS s, dst AS t FROM edges{lbl_w}")
            if d in ("in", "both"):
                legs.append(f"SELECT dst AS s, src AS t FROM edges{lbl_w}")
            leg = "(" + " UNION ALL ".join(legs) + ")"
            view = f"n_{nt['type']}" if nt["type"] else "nodes"
            # seed the unroll from the ANCHOR node set (its typed view
            # + its own where:, requalified) instead of expanding the
            # whole edge table and joining last — DISTINCT below a
            # join blocks predicate pushdown, so an unseeded unroll
            # would pay the global pair closure for a handful of
            # anchors. The seed is a superset of the chain-constrained
            # anchors (later joins still apply), so results are
            # identical; the frontier just starts small.
            src_pat = nodes[i]
            seed_view = f"n_{src_pat['type']}" if src_pat["type"] else "nodes"
            seed_where = ""
            # the anchor's own where tightens the seed — but only when
            # it references no OTHER alias ($matched): a cross-alias
            # predicate can't resolve inside the seed subquery, and
            # omitting it is safe (the seed is a superset; the outer
            # join + global WHERE still constrain the result)
            if src_pat.get("where") and not src_pat.get("matched_used"):
                seed_where = " WHERE " + _requalify_alias(
                    src_pat["where"], a, "__seed"
                )
            anchors = (
                f"(SELECT __seed.node_id FROM {seed_view} __seed{seed_where})"
            )
            unions = []
            if lo == 0:
                unions.append(
                    f"SELECT __s.node_id AS __vsrc, __s.node_id AS __vdst "
                    f"FROM {anchors} __s"
                )
            for L in range(max(lo, 1), hi + 1):
                hop_from = (
                    f"{anchors} __s JOIN {leg} __h0 ON __h0.s = __s.node_id"
                )
                for j in range(1, L):
                    hop_from += f" JOIN {leg} __h{j} ON __h{j}.s = __h{j-1}.t"
                unions.append(
                    f"SELECT __s.node_id AS __vsrc, __h{L-1}.t AS __vdst "
                    f"FROM {hop_from}"
                )
            vl_name = f"__vl{tag}{i}"
            vl_sub = (
                "(SELECT DISTINCT __vsrc, __vdst FROM ("
                + " UNION ALL ".join(unions)
                + f") {vl_name}_u)"
            )
            froms.append(
                f"JOIN {vl_sub} {vl_name} ON {vl_name}.__vsrc = {a}.node_id"
            )
            froms.append(f"JOIN {view} {b} ON {b}.node_id = {vl_name}.__vdst")
            if nt.get("where"):
                wheres.append(nt["where"])
            continue
        if not optional:
            cond, nxt = _match_leg(e, a, b, d, label)
            # a user-bound edge alias joins the TYPED edge view so
            # RETURN can project edge properties (the unified `edges`
            # view is the 3-column (src, dst, label) slice)
            etable = f"e_{label}" if ealias else "edges"
            froms.append(f"JOIN {etable} {e} ON {cond}")
            if nt.get("bound"):
                # cycle-closing step: the target alias is already in
                # scope — constrain it instead of re-joining its view
                wheres.append(nxt)
                if nt.get("where"):
                    wheres.append(nt["where"])
            else:
                src = f"n_{nt['type']} {b}" if nt["type"] else f"nodes {b}"
                froms.append(f"JOIN {src} ON {nxt}")
                if nt.get("where"):
                    wheres.append(nt["where"])
            continue
        # optional leg: LEFT JOIN (edge ⋈ node view) keyed on a
        # sentinel anchor column, so a failed `where:` inside the leg
        # nulls the whole leg instead of leaking a half-matched row.
        if nt.get("bound"):
            raise ArcadeSQLError(
                "optional: true cannot close a cycle onto an "
                "already-bound alias"
            )
        if nt.get("matched_used"):
            raise ArcadeSQLError(
                "$matched references inside an optional pattern's "
                "where: cannot correlate out of the optional leg"
            )
        view = f"n_{nt['type']}" if nt["type"] else "nodes"
        inner_t = f"__t{tag}{i}"
        inner_where = ""
        if nt.get("where"):
            # the deferred where was compiled qualified with the
            # node's public alias; requalify onto the inner table
            inner_where = " AND " + _requalify_alias(nt["where"], b, inner_t)
        lbl = f" AND {e}.label = '{_sql_str(label)}'" if label else ""
        anchor = f"__anchor{tag}{i}"
        if d == "both":
            leg = (
                f"(SELECT {e}.src AS {anchor}, {inner_t}.* FROM edges {e} "
                f"JOIN {view} {inner_t} ON {inner_t}.node_id = {e}.dst"
                f"{lbl}{inner_where} UNION ALL "
                f"SELECT {e}.dst AS {anchor}, {inner_t}.* FROM edges {e} "
                f"JOIN {view} {inner_t} ON {inner_t}.node_id = {e}.src"
                f"{lbl}{inner_where})"
            )
        else:
            key, other = ("src", "dst") if d == "out" else ("dst", "src")
            leg = (
                f"(SELECT {e}.{key} AS {anchor}, {inner_t}.* FROM edges {e} "
                f"JOIN {view} {inner_t} ON {inner_t}.node_id = {e}.{other}"
                f"{lbl}{inner_where})"
            )
        froms.append(f"LEFT JOIN {leg} {b} ON {b}.{anchor} = {a}.node_id")


def _compile_neg_chain(chain: dict, idx: int) -> str:
    """NOT { … } pattern → a NOT EXISTS anti-join leg correlated on
    the chain's bound anchor alias(es). Catalyst plans this as a
    LeftAnti join on the edge key — one shuffle, no cartesian."""
    nodes, steps = chain["nodes"], chain["steps"]
    froms: list[str] = []
    conds: list[str] = []
    # the chain's anchor alias is bound in the OUTER scope; its where
    # is part of the negated pattern, so it belongs inside the NOT
    # EXISTS conds (correlated) — dropping it excluded rows that
    # should survive the anti-join (ADVICE r6)
    if nodes[0].get("where"):
        conds.append(nodes[0]["where"])
    for i, (d, label, ealias) in enumerate(steps):
        if ealias is not None:
            raise ArcadeSQLError(
                "edge aliases inside a NOT pattern are scoped to the "
                "anti-join and never visible to RETURN — remove {as: "
                f"{ealias}}}"
            )
        e = f"__ne{idx}_{i}"
        a = nodes[i]["alias"]
        nt = nodes[i + 1]
        b = nt["alias"]
        cond, nxt = _match_leg(e, a, b, d, label)
        froms.append(f"edges {e}")
        conds.append(cond)
        if nt.get("bound"):
            conds.append(nxt)
            if nt.get("where"):
                conds.append(nt["where"])
        else:
            froms.append(f"n_{nt['type']} {b}" if nt["type"] else f"nodes {b}")
            conds.append(nxt)
            if nt.get("where"):
                conds.append(nt["where"])
    return (
        f"NOT EXISTS (SELECT 1 FROM {', '.join(froms)} "
        f"WHERE {' AND '.join(conds)})"
    )


def _compile_match(m: _Match) -> str:
    """MATCH pattern chains → ONE Spark SQL join chain over the
    per-label views and the unified ``edges`` view: each edge step is
    an equi-join on the edge key (shuffle on src/dst — or a broadcast
    probe when the anchored side is small, AQE's call), each node
    pattern a join back to its typed view; ``optional: true`` legs
    are LEFT JOINs of derived leg subqueries, additional comma chains
    extend the same join chain, and ``NOT { … }`` chains become
    NOT EXISTS anti-join legs. Aggregates in RETURN get ArcadeDB-style
    implicit grouping by the non-aggregate items."""
    froms: list[str] = []
    wheres: list[str] = []
    first = m.nodes[0]
    a0 = first["alias"]
    froms.append(
        f"n_{first['type']} {a0}" if first["type"] else f"nodes {a0}"
    )
    if first.get("where"):
        wheres.append(first["where"])
    _compile_chain(m.nodes, m.steps, froms, wheres, tag="")
    for k, chain in enumerate(m.extra):
        if chain["negated"]:
            wheres.append(_compile_neg_chain(chain, k))
        else:
            anchor0 = chain["nodes"][0]
            if anchor0.get("where"):
                wheres.append(anchor0["where"])
            _compile_chain(
                chain["nodes"], chain["steps"], froms, wheres, tag=f"x{k}_"
            )
    parts = []
    plain: list[str] = []
    has_agg = False
    for expr, alias in m.returns:
        parts.append(f"{expr} AS {alias}" if alias else expr)
        if _AGG_RE.search(expr):
            has_agg = True
        else:
            plain.append(expr)
    sql = f"SELECT {', '.join(parts)} FROM {' '.join(froms)}"
    if wheres:
        sql += " WHERE " + " AND ".join(wheres)
    group = m.group_by or (plain if has_agg else [])
    if group:
        sql += " GROUP BY " + ", ".join(group)
    if m.order_by:
        sql += " ORDER BY " + ", ".join(f"{e} {d}" for e, d in m.order_by)
    if m.limit is not None:
        sql += f" LIMIT {m.limit}"
    if m.skip:
        sql += f" OFFSET {m.skip}"
    return sql


def translate(sql: str, params=None) -> str:
    """ArcadeDB-dialect SELECT or MATCH → one Spark SQL string over
    the workspace views (``n_<Label>``, unified ``nodes``/``edges``).
    TRAVERSE statements are plan-level (use :func:`execute`)."""
    sql = bind_params(sql, params)
    p = _Parser(sql)
    stmt = p.parse()
    if isinstance(stmt, _Traverse):
        raise ArcadeSQLError("TRAVERSE is executed, not translated — use execute()")
    if isinstance(stmt, _DML):
        raise ArcadeSQLError(
            "DML statements mutate the workspace — use execute(spark, sql, "
            "workspace_dir=..., allow_writes=True)"
        )
    if p.shortest_paths:
        raise ArcadeSQLError(
            "shortestPath() is plan-level (registers a BFS-tree view) "
            "— use execute()"
        )
    if isinstance(stmt, _Match):
        return _compile_match(stmt)
    return _compile_select(stmt)


def _register_shortest_path_views(spark: SparkSession, specs: list[dict]) -> None:
    """Materialize each ``shortestPath()`` spec as a BFS-tree temp
    view (dst, hops, path) over the unified ``edges`` view. One
    frontier-join BFS per DISTINCT spec (the parser dedups), amortized
    across every call-site row via the correlated-subquery-turned-join
    the compiled SQL contains."""
    if not specs:
        return
    from biodwh2_arcadedb_server_spark.operators.graph import shortest_path_tree

    edges = spark.table("edges")
    for spec in specs:
        e = edges
        if spec["label"]:
            e = e.where(F.col("label") == F.lit(spec["label"]))
        if spec["direction"] == "in":
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        tree = shortest_path_tree(
            e.select("src", "dst"),
            source=spec["source"],
            max_depth=spec["maxdepth"],
            directed=spec["direction"] != "both",
        )
        tree = tree.select(
            F.col("dst").alias("__sp_dst"),
            F.col("hops").alias("__sp_hops"),
            F.col("path").alias("__sp_path"),
        )
        tree.createOrReplaceTempView(spec["view"])


# Dialect DML mutates on-disk datasets via rewrite-and-swap; the query
# server is a ThreadingHTTPServer, so two concurrent write statements
# could interleave rmtree/os.replace on the same dataset. One process-
# wide lock serializes them (reads stay lock-free — they only see
# either the old or the new swapped dataset, never a partial one).
# Reentrant: DML paths hold it across helper calls that themselves
# take it (load_workspace guards the RID bucket-order swap — ADVICE r9)
_DML_LOCK = __import__("threading").RLock()


def _endpoint_df(spark, ws, expr: str, side_label: str, out: str):
    """Resolve a CREATE/DELETE EDGE endpoint: a literal/expression
    endpoint is ONE natural key (node id derives as xxhash64(label,
    key)); a ``(SELECT …)`` endpoint is the ArcadeDB set form — the
    statement applies to every (src, dst) pair of the two result
    sets. Returns (1-column node-id DataFrame named ``out``,
    is_set)."""
    s = expr.strip()
    if s.startswith("(SELECT"):
        sub = spark.sql(s[1:-1])
        if "node_id" not in sub.columns:
            raise ArcadeSQLError(
                "edge endpoint subquery must return node rows "
                "(missing node_id)"
            )
        return sub.select(F.col("node_id").alias(out)), True
    return (
        spark.range(1).select(
            ws.node_id(side_label, F.expr(expr)).alias(out)
        ),
        False,
    )


def _execute_dml(
    spark: SparkSession,
    stmt: _DML,
    workspace_dir: str | None,
    allow_writes: bool,
    refresh_views: bool = True,
) -> DataFrame:
    """Route a dialect DML statement to the workspace batch-recompute
    API (B19). Gated: ``allow_writes`` defaults OFF everywhere —
    matching the reference's posture of serving the database read-only
    over HTTP — so enabling writes is an explicit operator decision.
    After a successful mutation the workspace views are re-registered,
    so the next dialect SELECT in the same session reads the new data.

    Returns a 1-row DataFrame ``(operation, label, count)`` — the
    rows-affected result shape ArcadeDB's SQL endpoint reports."""
    if not allow_writes:
        raise ArcadeSQLError(
            f"{stmt.kind.upper()} is disabled: the endpoint is read-only "
            "by default (reference posture). Pass allow_writes=True and "
            "workspace_dir=<ws> to execute() to enable dialect DML."
        )
    if workspace_dir is None:
        raise ArcadeSQLError(
            "DML requires workspace_dir=<workspace path> so the mutation "
            "can rewrite the label dataset"
        )
    import os

    from biodwh2_arcadedb_server_spark import workspace as ws

    pred = F.expr(stmt.where) if stmt.where else F.lit(True)
    with _DML_LOCK:
        return _execute_dml_locked(
            spark, stmt, workspace_dir, pred, ws, os, refresh_views
        )


def _execute_dml_locked(
    spark, stmt, workspace_dir, pred, ws, os, refresh_views=True
):
    if stmt.kind.startswith("ddl_"):
        n_ddl = 0
        try:
            if stmt.kind == "ddl_node_type":
                ws.create_node_type(spark, workspace_dir, stmt.label)
            elif stmt.kind == "ddl_edge_type":
                ws.create_edge_type(
                    spark, workspace_dir, stmt.label,
                    stmt.ddl["src_label"], stmt.ddl["dst_label"],
                )
            elif stmt.kind == "ddl_property":
                ws.add_property(
                    spark, workspace_dir, stmt.label,
                    stmt.ddl["prop"], stmt.ddl["type"],
                )
            elif stmt.kind == "ddl_index":
                ws.create_index(
                    spark, workspace_dir, stmt.label,
                    stmt.ddl["columns"], stmt.ddl["unique"],
                )
            elif stmt.kind == "ddl_drop_type":
                n_ddl = ws.drop_type(
                    spark, workspace_dir, stmt.label, stmt.ddl["unsafe"]
                )
                spark.catalog.dropTempView(f"n_{stmt.label}")
                spark.catalog.dropTempView(f"e_{stmt.label}")
            elif stmt.kind == "ddl_drop_property":
                ws.drop_property(
                    spark, workspace_dir, stmt.label, stmt.ddl["prop"]
                )
            elif stmt.kind == "ddl_drop_index":
                ws.drop_index(
                    spark, workspace_dir, stmt.label, stmt.ddl["columns"]
                )
            else:  # ddl_rename_type
                n_ddl = ws.rename_type(
                    spark, workspace_dir, stmt.label, stmt.ddl["new"]
                )
                if refresh_views:
                    # staged (shadow) application must not touch the
                    # session's live views — commit re-registers once
                    spark.catalog.dropTempView(f"n_{stmt.label}")
                    spark.catalog.dropTempView(f"e_{stmt.label}")
        except ValueError as exc:
            raise ArcadeSQLError(str(exc)) from exc
        if refresh_views and stmt.kind not in ("ddl_index", "ddl_drop_index"):
            # index DDL is manifest-only — no dataset or schema
            # changed, so the registered views stay valid (round-8
            # interactive-DDL trim)
            ws.load_workspace(spark, workspace_dir)
        return local_df(
            spark,
            [(stmt.kind, stmt.label, n_ddl)],
            "operation string, label string, count long",
        )
    ret_mode = stmt.ddl.get("return")
    if ret_mode and stmt.kind not in ("update", "delete"):
        raise ArcadeSQLError(
            "RETURN AFTER/BEFORE supports vertex UPDATE and DELETE"
        )
    before_rows = ret_ids = None
    if ret_mode:
        # Snapshot the matched records (BEFORE) or their stable ids
        # (AFTER) ahead of the mutation: the dataset swap invalidates
        # any lazy plan over the old files, so materialize via
        # localCheckpoint. node_id is immutable under UPDATE (identity
        # columns are guarded), which is what makes the AFTER
        # semi-join correct.
        npath = os.path.join(workspace_dir, "nodes", stmt.label)
        try:
            matched = spark.read.parquet(npath).where(pred)
        except Exception as exc:
            raise ArcadeSQLError(
                f"unknown vertex type {stmt.label!r}"
            ) from exc
        if ret_mode == "before":
            before_rows = matched.localCheckpoint(eager=True)
        else:
            ret_ids = matched.select("node_id").localCheckpoint(eager=True)
    if stmt.kind == "update":
        try:
            n = ws.update_nodes(
                spark, workspace_dir, stmt.label, pred,
                {col: F.expr(expr) for col, expr in stmt.assignments},
            )
        except ValueError as exc:  # identity-column guard
            raise ArcadeSQLError(str(exc)) from exc
        if n == 0 and stmt.ddl.get("upsert"):
            # nothing matched: insert the SET row (ArcadeDB UPSERT) —
            # the result row reports operation "insert" so the caller
            # sees which branch ran. ArcadeDB folds the WHERE's
            # matched attributes into the inserted record, so simple
            # `col = literal` conjuncts join the row (round-7 review:
            # without this, the idiomatic `SET name='x' UPSERT WHERE
            # natural_key = 9` form could never supply the key — and
            # putting the key in SET is rejected as an identity
            # UPDATE). SET wins on conflict.
            row = dict(stmt.assignments)
            _fold_equality_conjuncts(stmt.where or "", row)
            ins = _DML(kind="insert", label=stmt.label, rows=[row])
            # forward refresh_views: inside a transaction commit the
            # recursion must NOT repoint the live session views at the
            # uncommitted shadow workspace (dirty read)
            res = _execute_dml_locked(
                spark, ins, workspace_dir, pred, ws, os, refresh_views
            )
            if ret_mode == "after":
                # RETURN AFTER on the upsert-insert branch: the WHERE's
                # key equality selects the freshly inserted record
                return spark.read.parquet(
                    os.path.join(workspace_dir, "nodes", stmt.label)
                ).where(pred).localCheckpoint(eager=True)
            if ret_mode == "before":
                return before_rows  # nothing matched: empty
            return res
        if ret_mode:
            # early result return still must re-register the session
            # views — the dataset swap invalidated their file listing
            if refresh_views:
                ws.load_workspace(spark, workspace_dir)
            if ret_mode == "before":
                return before_rows
            # materialize: the returned rows must survive the NEXT
            # mutation's dataset swap (a lazy plan over the current
            # files would die on it)
            return (
                spark.read.parquet(os.path.join(workspace_dir, "nodes", stmt.label))
                .join(ret_ids, "node_id", "left_semi")
                .localCheckpoint(eager=True)
            )
    elif stmt.kind == "delete":
        n = ws.delete_nodes(spark, workspace_dir, stmt.label, pred)
        if ret_mode == "before":
            if refresh_views:
                ws.load_workspace(spark, workspace_dir)
            return before_rows
    elif stmt.kind == "update_edge":
        try:
            n = ws.update_edges(
                spark, workspace_dir, stmt.label, pred,
                {col: F.expr(expr) for col, expr in stmt.assignments},
            )
        except ValueError as exc:  # structural-column guard
            raise ArcadeSQLError(str(exc)) from exc
    elif stmt.kind == "delete_edge":
        if stmt.edge_from is not None:
            import json as _json

            with open(os.path.join(workspace_dir, "manifest.json")) as mh:
                e_info = _json.load(mh)["edges"].get(stmt.label)
            if e_info is None:
                raise ArcadeSQLError(f"unknown edge type {stmt.label!r}")
            s_df, _ = _endpoint_df(
                spark, ws, stmt.edge_from, e_info["src_label"], "src"
            )
            d_df, _ = _endpoint_df(
                spark, ws, stmt.edge_to, e_info["dst_label"], "dst"
            )
            n = ws.delete_edges_between(
                spark, workspace_dir, stmt.label, s_df, d_df, pred,
                info=e_info,
            )
        else:
            n = ws.delete_edges(spark, workspace_dir, stmt.label, pred)
    elif stmt.kind == "insert_edge":
        import json as _json

        with open(os.path.join(workspace_dir, "manifest.json")) as mh:
            manifest = _json.load(mh)
        if stmt.label not in manifest["edges"]:
            raise ArcadeSQLError(
                f"unknown edge type {stmt.label!r} "
                f"(known: {sorted(manifest['edges'])})"
            )
        info = manifest["edges"][stmt.label]
        e_schema = spark.read.parquet(info["path"]).schema
        props = stmt.rows[0]
        unknown = set(props) - {
            f.name for f in e_schema.fields
            if f.name not in ("src", "src2", "dst", "dst2", "label")
        }
        if unknown:
            raise ArcadeSQLError(
                f"unknown edge propert{'ies' if len(unknown) > 1 else 'y'} "
                f"for {stmt.label}: {sorted(unknown)}"
            )
        src_df, src_set = _endpoint_df(spark, ws, stmt.edge_from, info["src_label"], "src")
        dst_df, dst_set = _endpoint_df(spark, ws, stmt.edge_to, info["dst_label"], "dst")
        # pair product of the endpoint sets (1×1 for literal keys).
        # Interactive endpoint selections are small; broadcasting the
        # dst side keeps the product shuffle-free — the cross join IS
        # the requested semantics, not an accident.
        rows = src_df.crossJoin(F.broadcast(dst_df))
        for f in e_schema.fields:
            if f.name in ("src", "src2", "dst", "dst2", "label"):
                # structural columns, never statement-settable; on a
                # 128-bit workspace materializing src2/dst2 here (as
                # NULL) would suppress insert_edges' second-lane
                # derivation from the endpoint node tables — the
                # appended edge would then dodge every pair-keyed
                # remap (round-12 finding via q186)
                continue
            rows = rows.withColumn(
                f.name,
                (F.expr(props[f.name]) if f.name in props else F.lit(None))
                .cast(f.dataType),
            )
        n = ws.insert_edges(spark, workspace_dir, stmt.label, rows)
    else:  # insert
        path = os.path.join(workspace_dir, "nodes", stmt.label)
        cur_schema = spark.read.parquet(path).schema
        writable = [
            f for f in cur_schema.fields
            if f.name not in ("node_id", "node_id2", "label")
        ]
        frames = []
        # statement-level within-batch dedupe, FIRST literal wins —
        # deterministic, unlike a plan-level dropDuplicates whose
        # survivor is partitioning-dependent (round-7 review finding);
        # the node_id-level dropDuplicates in insert_nodes stays as
        # the safety net for differently-spelled equal keys
        seen_keys: set[str] = set()
        rows_in_order = []
        for row in stmt.rows:
            k = row.get("natural_key")
            if k is not None:
                if k in seen_keys:
                    continue
                seen_keys.add(k)
            rows_in_order.append(row)
        for row in rows_in_order:
            if "natural_key" not in row:
                raise ArcadeSQLError(
                    "INSERT must assign natural_key — node ids are derived "
                    "from it (xxhash64(label, natural_key))"
                )
            unknown = set(row) - {f.name for f in writable}
            if unknown:
                raise ArcadeSQLError(
                    f"unknown propert{'ies' if len(unknown) > 1 else 'y'} "
                    f"for {stmt.label}: {sorted(unknown)}"
                )
            cols = [
                (F.expr(row[f.name]) if f.name in row else F.lit(None))
                .cast(f.dataType)
                .alias(f.name)
                for f in writable
            ]
            frames.append(spark.range(1).select(*cols))
        rows_df = frames[0]
        for fr in frames[1:]:
            rows_df = rows_df.unionByName(fr)
        with open(os.path.join(workspace_dir, "manifest.json")) as mh:
            import json as _json

            before = _json.load(mh)["nodes"][stmt.label]["count"]
        n = ws.insert_nodes(spark, workspace_dir, stmt.label, rows_df) - before
    if refresh_views:
        ws.load_workspace(spark, workspace_dir)
    return local_df(
        spark, [(stmt.kind, stmt.label, n)],
        "operation string, label string, count long",
    )


_DIALECT_CREATE_KINDS = frozenset(
    {"vertex", "edge", "property", "index", "document"}
)


def claims_statement(sql: str) -> bool:
    """Router helper for the server/CLI head-keyword dispatch: True
    when the statement is a dialect DML/DDL form that should route
    STRAIGHT to the dialect (so its clear writes-disabled error
    surfaces instead of an opaque Spark one). CREATE is claimed only
    for dialect object kinds — ``CREATE [TEMPORARY] VIEW/TABLE/
    FUNCTION`` stays Spark SQL (ADVICE r6: blanket head capture broke
    previously-working ``CREATE TEMPORARY VIEW``). UPDATE/INSERT/
    DELETE are claimed only when the statement actually PARSES as
    dialect DML, so Spark-only shapes (``INSERT INTO tbl SELECT …``
    into a real catalog table) fall through to Spark SQL."""
    toks = sql.lstrip().split(None, 2)
    if not toks:
        return False
    head = toks[0].lower()
    if head == "create":
        return len(toks) > 1 and toks[1].lower() in _DIALECT_CREATE_KINDS
    if head == "drop":
        # DROP TYPE/PROPERTY + DROP INDEX ON are dialect; Spark's
        # DROP TABLE/VIEW/FUNCTION stay Spark SQL
        if len(toks) < 2:
            return False
        second = toks[1].lower()
        return second in ("type", "property") or (
            second == "index" and len(toks) > 2 and toks[2].lower().startswith("on")
        )
    if head == "alter":
        return len(toks) > 1 and toks[1].lower() == "type"
    if head not in ("update", "insert", "delete"):
        return False
    try:
        _Parser(sql).parse()
        return True
    except ArcadeSQLError:
        return False


def execute(
    spark: SparkSession,
    sql: str,
    *,
    workspace_dir: str | None = None,
    allow_writes: bool = False,
    params=None,
    refresh_views: bool = True,
) -> DataFrame:
    """Run an ArcadeDB-dialect statement against the registered
    workspace views. SELECT/MATCH → ``spark.sql(translate(...))``;
    TRAVERSE → the iterative BFS operator (roots at depth 0 included,
    ArcadeDB semantics), returning unified node rows + depth;
    UPDATE/INSERT/DELETE/CREATE VERTEX → the workspace DML API, but
    ONLY when ``allow_writes=True`` (read-only by default, like the
    reference's HTTP endpoint). ``params`` binds ``:name`` (dict) or
    positional ``?`` (list) placeholders before parsing — the REST
    ``{"command", "params"}`` wire contract.

    ``EXPLAIN <select|match>`` returns Spark's FORMATTED physical
    plan (one ``plan`` column) for the compiled statement — the
    dialect's answer to ArcadeDB's EXPLAIN: the user sees pushed
    filters, join strategies and codegen spans instead of ArcadeDB
    step trees."""
    sql = bind_params(sql, params)
    head_m = re.match(r"\s*explain\b\s*", sql, re.IGNORECASE)
    if head_m:
        inner = sql[head_m.end():]
        ip = _Parser(inner)
        istmt = ip.parse()
        if isinstance(istmt, _DML):
            # staged-write summary (round 9): what WOULD run, so a
            # user can inspect before enabling the writes gate —
            # ArcadeDB's EXPLAIN covers DML the same way
            return local_df(
                spark, [(_explain_dml(istmt),)], "plan string"
            )
        if isinstance(istmt, _Traverse):
            # BFS plan summary + the roots' physical plan (the one
            # SQL leg a TRAVERSE compiles; the frontier expansion is
            # the iterative operator described in the header)
            header = _explain_traverse(istmt)
            roots_plan = spark.sql(
                f"EXPLAIN FORMATTED {_compile_select(istmt.inner)}"
            ).collect()[0][0]
            return local_df(
                spark,
                [(f"{header}\nroots physical plan:\n{roots_plan}",)],
                "plan string",
            )
        _register_shortest_path_views(spark, ip.shortest_paths)
        if isinstance(istmt, _Select):
            _materialize_schema_sources(spark, istmt)
        compiled = (
            _compile_match(istmt) if isinstance(istmt, _Match)
            else _compile_select(istmt)
        )
        return spark.sql(f"EXPLAIN FORMATTED {compiled}")
    p = _Parser(sql)
    stmt = p.parse()
    if isinstance(stmt, _DML):
        return _execute_dml(
            spark, stmt, workspace_dir, allow_writes,
            refresh_views=refresh_views,
        )
    _register_shortest_path_views(spark, p.shortest_paths)
    if isinstance(stmt, _Match):
        return spark.sql(_compile_match(stmt))
    if isinstance(stmt, _Select):
        _materialize_traverse_sources(spark, stmt)
        _materialize_schema_sources(spark, stmt)
        return spark.sql(_compile_select(stmt))
    return _run_traverse(spark, stmt)


def _materialize_schema_sources(spark: SparkSession, sel: _Select) -> None:
    """``SELECT ... FROM schema:{types|indexes|buckets}`` — ArcadeDB's
    system TVF targets (the Studio schema browser's queries). Rows
    come from the loaded workspace's manifest, re-read at query time
    so DDL since the load is visible; the tiny frame registers under a
    spec-named temp view and the SELECT machinery (WHERE/ORDER/
    projections) applies unchanged. Recurses into subqueries."""
    if sel.subquery is not None:
        _materialize_schema_sources(spark, sel.subquery)
    if sel.schema_source is None:
        return
    import json as _json
    import os as _os

    from biodwh2_arcadedb_server_spark import workspace as ws

    which = sel.schema_source
    if ws.LAST_WS_DIR is None:
        raise ArcadeSQLError(
            f"schema:{which} requires a loaded workspace "
            "(load_workspace records the manifest location)"
        )
    with open(_os.path.join(ws.LAST_WS_DIR, "manifest.json")) as mh:
        manifest = _json.load(mh)

    def _props(info, internals) -> list[str]:
        schema_json = info.get("schema")
        if not schema_json:
            return []
        return sorted(
            f["name"]
            for f in schema_json.get("fields", [])
            if f["name"] not in internals
        )

    if which == "types":
        rows = []
        for kind, tag, internals in (
            ("nodes", "vertex", {"node_id", "node_id2", "label", "natural_key"}),
            ("edges", "edge", {"src", "dst", "label"}),
        ):
            for label, info in manifest.get(kind, {}).items():
                rows.append(
                    (label, tag, int(info.get("count", 0)), _props(info, internals))
                )
        df = local_df(
            spark,
            sorted(rows),
            "name string, kind string, records long, properties array<string>",
        )
    elif which == "indexes":
        rows = []
        for kind in ("nodes", "edges"):
            for label, info in manifest.get(kind, {}).items():
                for ix in info.get("indexes", []):
                    rows.append(
                        (
                            f"{label}[{','.join(ix['columns'])}]",
                            label,
                            list(ix["columns"]),
                            bool(ix.get("unique")),
                        )
                    )
        df = local_df(
            spark,
            sorted(rows),
            "name string, type_name string, columns array<string>, "
            "is_unique boolean",
        )
    else:  # buckets — the RID addressing order (documented divergence:
        # pos is the content-derived node_id, bucket the manifest slot)
        rows = [
            (i, lbl, lbl)
            for i, lbl in enumerate(ws.RID_BUCKET_LABELS)
            if lbl is not None
        ]
        df = local_df(
            spark, rows, "bucket int, name string, type_name string"
        )
    view = f"__schema_{which}"
    df.createOrReplaceTempView(f"n_{view}")
    sel.source_type, sel.schema_source = view, None


def _materialize_traverse_sources(spark: SparkSession, sel: _Select) -> None:
    """``SELECT ... FROM (TRAVERSE ...)`` — the Studio
    filter-a-traversal pattern: run the frontier BFS, register its
    result (node rows + ``depth``) under a spec-hashed view name
    (idempotent under the ThreadingHTTPServer, same convention as the
    shortestPath views), and point the SELECT at it. Recurses so the
    pattern composes under nested SELECT subqueries."""
    if sel.subquery is not None:
        _materialize_traverse_sources(spark, sel.subquery)
    if sel.traverse_subquery is None:
        return
    import hashlib

    tag = hashlib.md5(repr(sel.traverse_subquery).encode()).hexdigest()[:10]
    _run_traverse(spark, sel.traverse_subquery).createOrReplaceTempView(
        f"n___trav{tag}"
    )
    sel.source_type = f"__trav{tag}"
    sel.traverse_subquery = None


def _run_traverse(spark: SparkSession, stmt: "_Traverse") -> DataFrame:
    from biodwh2_arcadedb_server_spark.operators.graph import bfs

    roots = spark.sql(_compile_select(stmt.inner)).select("node_id")
    edges = spark.table("edges")
    # Build the hop relation PER STEP: each step's label (or lack of one)
    # and direction apply only to that step's leg — TRAVERSE out('A'),
    # in('B') follows out-A edges and in-B edges, never in-A or out-B,
    # and an unlabeled out() leg follows every edge type.
    legs = []
    for d, lbl in stmt.steps:
        e = edges.where(F.col("label") == F.lit(lbl)) if lbl else edges
        if d in ("out", "both"):
            legs.append(e.select("src", "dst"))
        if d in ("in", "both"):
            legs.append(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
    hop = legs[0]
    for leg in legs[1:]:
        hop = hop.unionByName(leg)
    depth = stmt.maxdepth if stmt.maxdepth is not None else 2**31 - 1
    if depth < 0:
        # WHILE bound false at depth 0 — inclusion-gated TRAVERSE
        # returns nothing, roots included (parser sentinel)
        roots = roots.where(F.lit(False))
        depth = 0
    reach = bfs(hop, roots, max_depth=depth)  # (node_id, depth)
    nodes = spark.table("nodes")
    return reach.alias("r").join(
        nodes.alias("n"), F.col("r.node_id") == F.col("n.node_id")
    ).select(
        F.col("n.node_id"), "n.label", "n.natural_key", "n.props", "r.depth"
    )
