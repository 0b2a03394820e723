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
  ``AS``, aggregates (count/sum/avg/min/max, ``count(*)``), scalar
  functions passed through to Spark when name-compatible, and the
  graph projections ``out('E')``/``in('E')``/``both('E')`` (arrays
  of neighbor ids) plus ``out('E').size()`` degree shorthand.
- ``SELECT expand(out('E')) FROM ...`` — neighbor node rows from the
  unified ``nodes`` view.
- WHERE operators: ``= <> != < <= > >= LIKE IN [..] BETWEEN x AND y
  IS [NOT] NULL CONTAINS AND OR NOT ()``; literals: numbers,
  'strings', true/false/null, [lists].
- ``TRAVERSE out('E'[, 'F'...]) FROM (SELECT FROM Type [WHERE ...])
  [MAXDEPTH n]`` — reachable node set (ArcadeDB TRAVERSE semantics:
  the root rows are depth 0 and included).

Out of scope (raise a clear error): MATCH pattern blocks, LET,
UPDATE/INSERT/DELETE (DML goes through the workspace API — the
reference exposes the database read-only over HTTP by default),
schema/index DDL, projections mixing expand() with other fields —
same restriction ArcadeDB itself enforces.

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

# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<at>@\w+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|\[|\]|,|\.|\*|\+|-|/|%)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "from", "where", "group", "order", "by", "asc", "desc",
    "skip", "limit", "and", "or", "not", "in", "between", "is", "null",
    "like", "contains", "as", "true", "false", "traverse", "maxdepth",
    "distinct",
}


@dataclass
class _Tok:
    kind: str  # number | string | ident | kw | op | at
    text: str


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
            toks.append(_Tok("kw", text.lower()))
        else:
            toks.append(_Tok(kind, text))
    toks.append(_Tok("eof", ""))
    return toks


class ArcadeSQLError(ValueError):
    """Parse/translate failure with a user-facing message."""


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


@dataclass
class _Traverse:
    steps: list[tuple[str, str | None]]  # (direction, edge label or None)
    inner: _Select = None  # type: ignore[assignment]
    maxdepth: int | None = None


_AGGS = {"count", "sum", "avg", "min", "max", "first", "last"}
# scalar functions whose ArcadeDB name is directly Spark-compatible
_PASSTHROUGH_FNS = {
    "abs", "ceil", "floor", "round", "sqrt", "upper", "lower", "trim",
    "length", "concat", "coalesce", "substring", "if", "ifnull", "format",
}


class _Parser:
    def __init__(self, sql: str):
        self.toks = _lex(sql)
        self.i = 0

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

    # -- entry
    def parse(self) -> "_Select | _Traverse":
        if self.peek().kind == "kw" and self.peek().text == "traverse":
            stmt = self._traverse()
        else:
            stmt = self._select()
        self.expect("eof")
        return stmt

    # -- statements
    def _traverse(self) -> _Traverse:
        self.expect("kw", "traverse")
        steps: list[tuple[str, str | None]] = []
        while True:
            d = self.expect("ident").text.lower()
            if d not in ("out", "in", "both"):
                raise ArcadeSQLError(f"TRAVERSE supports out/in/both, got {d}")
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
            maxdepth = int(self.expect("number").text)
        return _Traverse(steps=steps, inner=inner, maxdepth=maxdepth)

    def _select(self) -> _Select:
        self.expect("kw", "select")
        sel = _Select(
            projections=[], star=False, expand_edge=None, source_type=None,
            subquery=None, where=None, group_by=[], order_by=[], skip=None,
            limit=None,
        )
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
            d = self.expect("ident").text.lower()
            if d not in ("out", "in", "both"):
                raise ArcadeSQLError("expand() supports out/in/both")
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
            sel.subquery = self._select()
            self.expect("op", ")")
        else:
            sel.source_type = self.expect("ident").text
        if self.accept("kw", "where"):
            sel.where = self._expr(sel)
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            while True:
                sel.group_by.append(self._expr(sel))
                if not self.accept("op", ","):
                    break
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
        if self.accept("kw", "skip"):
            sel.skip = int(self.expect("number").text)
        if self.accept("kw", "limit"):
            sel.limit = int(self.expect("number").text)
        # ArcadeDB also allows LIMIT before SKIP; accept a trailing SKIP
        if sel.skip is None and self.accept("kw", "skip"):
            sel.skip = int(self.expect("number").text)
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

    def _cmp(self, sel: _Select) -> str:
        left = self._add(sel)
        t = self.peek()
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            if op == "!=":
                op = "<>"
            return f"({left} {op} {self._add(sel)})"
        if t.kind == "kw" and t.text == "like":
            self.next()
            return f"({left} LIKE {self._add(sel)})"
        if t.kind == "kw" and t.text == "contains":
            # ArcadeDB: <collection-or-string field> CONTAINS value
            self.next()
            rhs = self._add(sel)
            return f"array_contains({left}, {rhs})"
        if t.kind == "kw" and t.text == "in":
            self.next()
            rhs = self._add(sel)
            if rhs.startswith("array("):
                return f"({left} IN ({rhs[len('array('):-1]}))"
            return f"array_contains({rhs}, {left})"
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
        return self._primary(sel)

    def _string_val(self, raw: str) -> str:
        return raw[1:-1].replace("\\'", "'")

    def _primary(self, sel: _Select) -> str:
        t = self.peek()
        if t.kind == "number":
            return self.next().text
        if t.kind == "string":
            return self.next().text  # keep quoted — valid Spark literal
        if t.kind == "kw" and t.text in ("true", "false", "null"):
            return self.next().text.upper()
        if t.kind == "at":
            at = self.next().text.lower()
            if at == "@rid":
                return "node_id"
            if at == "@type":
                return "label"
            raise ArcadeSQLError(f"unsupported attribute {at}")
        if t.kind == "op" and t.text == "(":
            self.next()
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
        if t.kind == "ident":
            name = self.next().text
            low = name.lower()
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
            if self.peek().text == "(":  # function call
                self.next()
                star = False
                args = []
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
                if low in _AGGS or low in _PASSTHROUGH_FNS:
                    return f"{low}({', '.join(args)})"
                raise ArcadeSQLError(f"unsupported function {name}()")
            return name  # plain property reference
        raise ArcadeSQLError(f"unexpected token {t.text or t.kind!r}")

    def _graph_projection(self, sel: _Select, direction: str, label: str | None) -> str:
        """out('E') → array of neighbor ids, as a correlated aggregate
        subquery over the unified edges view (Catalyst decorrelates it
        into a left join + partial aggregate)."""
        sel.uses_graph_projection = True
        cond = {"out": "e.src = __self.node_id", "in": "e.dst = __self.node_id"}
        pick = {"out": "e.dst", "in": "e.src"}
        lbl = f" AND e.label = '{label}'" if label else ""
        if direction == "both":
            return (
                "(SELECT sort_array(collect_list(x)) FROM (SELECT e.dst AS x "
                f"FROM edges e WHERE e.src = __self.node_id{lbl} UNION ALL "
                "SELECT e.src AS x FROM edges e WHERE e.dst = "
                f"__self.node_id{lbl}))"
            )
        return (
            f"(SELECT sort_array(collect_list({pick[direction]})) FROM edges e "
            f"WHERE {cond[direction]}{lbl})"
        )


# ---------------------------------------------------------------- compiler
def _compile_select(sel: _Select) -> str:
    if sel.subquery is not None:
        source = f"({_compile_select(sel.subquery)}) __self"
    else:
        source = f"n_{sel.source_type} __self"

    if sel.expand_edge is not None:
        d, label = sel.expand_edge
        lbl = f" AND e.label = '{label}'" if label else ""
        inner = f"SELECT node_id FROM {source}"
        if sel.where:
            inner += f" WHERE {sel.where}"
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
            proj = "__self.*"
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
    if sel.order_by:
        sql += " ORDER BY " + ", ".join(f"{e} {d}" for e, d in sel.order_by)
    if sel.limit is not None:
        sql += f" LIMIT {sel.limit}"
    if sel.skip:
        sql += f" OFFSET {sel.skip}"
    return sql


def translate(sql: str) -> str:
    """ArcadeDB-dialect SELECT → one Spark SQL string over the
    workspace views (``n_<Label>``, unified ``nodes``/``edges``).
    TRAVERSE statements are plan-level (use :func:`execute`)."""
    stmt = _Parser(sql).parse()
    if isinstance(stmt, _Traverse):
        raise ArcadeSQLError("TRAVERSE is executed, not translated — use execute()")
    return _compile_select(stmt)


def execute(spark: SparkSession, sql: str) -> DataFrame:
    """Run an ArcadeDB-dialect statement against the registered
    workspace views. SELECT → ``spark.sql(translate(...))``;
    TRAVERSE → the iterative BFS operator (roots at depth 0 included,
    ArcadeDB semantics), returning unified node rows + depth."""
    stmt = _Parser(sql).parse()
    if isinstance(stmt, _Select):
        return spark.sql(_compile_select(stmt))
    # TRAVERSE
    from biodwh2_arcadedb_server_spark.operators.graph import bfs

    roots = spark.sql(_compile_select(stmt.inner)).select("node_id")
    edges = spark.table("edges")
    labels = [lbl for _, lbl in stmt.steps if lbl]
    if labels:
        edges = edges.where(F.col("label").isin(labels))
    dirs = {d for d, _ in stmt.steps}
    legs = []
    if dirs & {"out", "both"}:
        legs.append(edges.select("src", "dst"))
    if dirs & {"in", "both"}:
        legs.append(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    hop = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    depth = stmt.maxdepth if stmt.maxdepth is not None else 2**31 - 1
    reach = bfs(hop, roots.withColumnRenamed("node_id", "id"), max_depth=depth)
    nodes = spark.table("nodes")
    return reach.join(nodes, reach["id"] == nodes["node_id"]).select(
        "node_id", "label", "natural_key", "props", "depth"
    )
