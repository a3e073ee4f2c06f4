"""OGR SQL dialect text front-end: parse an OGR SQL string and run it
as a Spark job with the dialect's quirks applied automatically.

Re-expresses the reference's ``ExecuteSQL(..., dialect='OGRSQL')``
surface: grammar ``ogr/swq_parser.cpp`` (3,068 LoC bison grammar),
evaluator ``ogr/ogrsf_frmts/generic/ogr_gensql.cpp``, documented
semantics ``doc/source/user/ogr_sql_dialect.rst``. Round 3 shipped the
dialect *semantics* as DataFrame shims (``operators/ogr_join.py``,
LIKE/ILIKE + 3VL + CAST tests in ``tests/test_ogr_sql_semantics.py``);
this module is the missing *front end* (VERDICT r03 item 4): a user
can paste the SQL strings they feed ``ExecuteSQL`` today.

Supported grammar (the swq surface minus what the engine models
differently):

    SELECT [DISTINCT] item[, ...]
    FROM table [alias]
    [ [LEFT] JOIN table2 [alias] ON a.f = b.f ]...
    [ WHERE expr ]
    [ ORDER BY field [ASC|DESC][, ...] ]
    [ LIMIT n ] [ OFFSET n ]

with items ``*``, ``tbl.*``, ``* EXCLUDE (f, ...)``, expressions,
aggregates (MIN/MAX/AVG/SUM/COUNT[ DISTINCT]/STDDEV_POP/STDDEV_SAMP),
``CAST(x AS character(n)|integer|bigint|float|numeric(p,s)|...)``,
``HSTORE_GET_VALUE``, CONCAT/SUBSTR (1-based), arithmetic,
IN/BETWEEN/IS NULL/LIKE/ILIKE (+ ESCAPE), and the special fields
FID / OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA / OGR_STYLE.

Dialect quirks applied:

- **first-match LEFT JOIN** (``ogr_sql_dialect.rst:508-513``,
  ``ogr_gensql.cpp:1516-1546``): each JOIN's secondary is pre-deduped
  to its first row per key in FID order (row_number window) before a
  plain left join — one output row per primary row, always.
- **LIKE case sensitivity**: modern reference default is
  case-SENSITIVE LIKE with a separate ILIKE (``autotest/ogr/
  ogr_sql_test.py`` test_ogr_sql_like/ilike); ``like_as_ilike=True``
  restores the pre-3.1 LIKE-is-ILIKE behavior
  (``OGR_SQL_LIKE_AS_ILIKE``).
- **summary naming**: unaliased aggregates are named
  ``{func}_{field}`` (``count_*``, ``max_eas_id`` — test_ogr_sql_11),
  other unaliased expressions ``field_{n}``; aggregates over an empty
  table yield one all-NULL row, DISTINCT over empty yields zero rows
  (test_ogr_sql_11/12) — Spark's native behavior, asserted in tests.
- **special fields** resolve per table: FID to the caller-declared
  (or first) column, geometry fields through the registered ST_
  functions on the table's WKB column.

Column naming deviation (documented): OGR names joined secondary
fields ``"table.field"``; dots inside Spark column names fight the
resolver everywhere downstream, so ``SELECT *`` emits them as
``table_field`` instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class OgrSqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""(?P<ws>\s+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<qid>"(?:[^"]|"")*")
      | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
      | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><>|!=|<=|>=|\|\||[-+*/%(),.=<>])
    """,
    re.X,
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "JOIN", "LEFT", "ON", "WHERE", "ORDER",
    "BY", "ASC", "DESC", "LIMIT", "OFFSET", "AND", "OR", "NOT", "IN",
    "BETWEEN", "IS", "NULL", "LIKE", "ILIKE", "ESCAPE", "AS", "CAST",
    "EXCLUDE", "UNION", "ALL",
}

_AGGS = {"MIN", "MAX", "AVG", "SUM", "COUNT", "STDDEV_POP", "STDDEV_SAMP"}

_SPECIAL = {"FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA", "OGR_STYLE"}

_CAST_TYPES = {
    "CHARACTER": "STRING",
    "STRING": "STRING",
    "INTEGER": "INT",
    "SMALLINT": "SMALLINT",
    "BIGINT": "BIGINT",
    "FLOAT": "DOUBLE",
    "REAL": "DOUBLE",
    "DOUBLE": "DOUBLE",
    "NUMERIC": "DOUBLE",
    "DATE": "DATE",
    "TIME": "TIMESTAMP",
    "TIMESTAMP": "TIMESTAMP",
    "BOOLEAN": "BOOLEAN",
}


@dataclass
class Tok:
    kind: str  # str | qid | num | id | op
    val: str

    def isid(self, *names: str) -> bool:
        return self.kind == "id" and self.val.upper() in names


def tokenize(sql: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise OgrSqlError(f"cannot tokenize at: {sql[pos:pos + 25]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append(Tok(kind, m.group()))
    return out


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


@dataclass
class SelectItem:
    tokens: list[Tok]  # expression tokens ('*' cases handled separately)
    alias: str | None
    star_table: str | None = None  # '*' or 'tbl.*'
    exclude: tuple[str, ...] = ()


@dataclass
class JoinClause:
    table: str
    alias: str
    on_tokens: list[Tok]


@dataclass
class Query:
    distinct: bool
    items: list[SelectItem]
    table: str
    alias: str
    joins: list[JoinClause]
    where: list[Tok] = field(default_factory=list)
    order_by: list[tuple[list[Tok], bool]] = field(default_factory=list)  # (expr, desc)
    limit: int | None = None
    offset: int | None = None


class _P:
    def __init__(self, toks: list[Tok]):
        self.t = toks
        self.i = 0

    def peek(self, k: int = 0) -> Tok | None:
        return self.t[self.i + k] if self.i + k < len(self.t) else None

    def next(self) -> Tok:
        if self.i >= len(self.t):
            raise OgrSqlError("unexpected end of statement")
        tok = self.t[self.i]
        self.i += 1
        return tok

    def accept_kw(self, *names: str) -> bool:
        p = self.peek()
        if p is not None and p.isid(*names):
            self.i += 1
            return True
        return False

    def expect_kw(self, name: str) -> None:
        if not self.accept_kw(name):
            got = self.peek().val if self.peek() else "<eof>"
            raise OgrSqlError(f"expected {name}, got {got!r}")

    def expect_op(self, op: str) -> None:
        p = self.peek()
        if p is None or p.kind != "op" or p.val != op:
            got = p.val if p else "<eof>"
            raise OgrSqlError(f"expected {op!r}, got {got!r}")
        self.i += 1


_CLAUSE_STOPS = ("JOIN", "LEFT", "WHERE", "ORDER", "LIMIT", "OFFSET")


def split_union_all(toks: list[Tok]) -> list[list[Tok]]:
    """Split a token stream on top-level UNION ALL boundaries — the
    reference splits the statement text the same way before feeding
    each SELECT to swq (`ogr/ogr_swq.h:486-487` ``PushUnionAll``,
    split loop `gcore/gdaldataset.cpp:7560-7580`). Plain UNION
    (dedup) is not OGR SQL and raises."""
    segs: list[list[Tok]] = [[]]
    depth = 0
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "op" and t.val == "(":
            depth += 1
        elif t.kind == "op" and t.val == ")":
            depth -= 1
        elif depth == 0 and t.isid("UNION"):
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if nxt is None or not nxt.isid("ALL"):
                raise OgrSqlError(
                    "UNION without ALL is not supported in OGR SQL"
                )
            segs.append([])
            i += 2
            continue
        segs[-1].append(t)
        i += 1
    if any(not s for s in segs):
        raise OgrSqlError("empty SELECT in UNION ALL chain")
    return segs


def parse(sql: str) -> Query:
    return _parse_toks(tokenize(sql))


def _parse_toks(toks: list[Tok]) -> Query:
    p = _P(toks)
    p.expect_kw("SELECT")
    distinct = p.accept_kw("DISTINCT")
    items = _parse_select_list(p)
    p.expect_kw("FROM")
    table, alias = _parse_table_ref(p)
    joins = []
    while True:
        if p.accept_kw("LEFT"):
            p.expect_kw("JOIN")
        elif p.accept_kw("JOIN"):
            pass
        else:
            break
        jt, ja = _parse_table_ref(p)
        p.expect_kw("ON")
        on = _take_until(p, _CLAUSE_STOPS)
        joins.append(JoinClause(jt, ja, on))
    q = Query(distinct, items, table, alias, joins)
    if p.accept_kw("WHERE"):
        q.where = _take_until(p, ("ORDER", "LIMIT", "OFFSET"))
    if p.accept_kw("ORDER"):
        p.expect_kw("BY")
        while True:
            expr = _take_until_any(p, stop_kw=("ASC", "DESC", "LIMIT", "OFFSET"), stop_comma=True)
            desc = False
            if p.accept_kw("DESC"):
                desc = True
            else:
                p.accept_kw("ASC")
            q.order_by.append((expr, desc))
            pk = p.peek()
            if pk is not None and pk.kind == "op" and pk.val == ",":
                p.next()
                continue
            break
    if p.accept_kw("LIMIT"):
        q.limit = int(p.next().val)
    if p.accept_kw("OFFSET"):
        q.offset = int(p.next().val)
    if p.peek() is not None:
        raise OgrSqlError(f"trailing tokens at {p.peek().val!r}")
    return q


def _parse_table_ref(p: _P) -> tuple[str, str]:
    t = p.next()
    if t.kind == "qid":
        name = t.val[1:-1].replace('""', '"')
    elif t.kind == "id":
        name = t.val
    else:
        raise OgrSqlError(f"expected table name, got {t.val!r}")
    alias = name
    nxt = p.peek()
    if nxt is not None and nxt.kind == "id" and nxt.val.upper() not in _KEYWORDS:
        alias = p.next().val
    return name, alias


def _take_until(p: _P, stop_kws) -> list[Tok]:
    out: list[Tok] = []
    depth = 0
    while p.peek() is not None:
        t = p.peek()
        if depth == 0 and t.kind == "id" and t.val.upper() in stop_kws:
            break
        if t.kind == "op" and t.val == "(":
            depth += 1
        if t.kind == "op" and t.val == ")":
            depth -= 1
        out.append(p.next())
    return out


def _take_until_any(p: _P, stop_kw, stop_comma: bool) -> list[Tok]:
    out: list[Tok] = []
    depth = 0
    while p.peek() is not None:
        t = p.peek()
        if depth == 0:
            if t.kind == "id" and t.val.upper() in stop_kw:
                break
            if stop_comma and t.kind == "op" and t.val == ",":
                break
        if t.kind == "op" and t.val == "(":
            depth += 1
        if t.kind == "op" and t.val == ")":
            depth -= 1
        out.append(p.next())
    return out


def _parse_select_list(p: _P) -> list[SelectItem]:
    items: list[SelectItem] = []
    while True:
        t = p.peek()
        if t is None:
            raise OgrSqlError("unexpected end in select list")
        # '*' or 'tbl.*' (optionally '* EXCLUDE (a, b)')
        if t.kind == "op" and t.val == "*":
            p.next()
            exclude: tuple[str, ...] = ()
            if p.accept_kw("EXCLUDE"):
                p.expect_op("(")
                names = []
                while True:
                    names.append(_ident_val(p.next()))
                    nx = p.peek()
                    if nx is not None and nx.kind == "op" and nx.val == ",":
                        p.next()
                        continue
                    break
                p.expect_op(")")
                exclude = tuple(names)
            items.append(SelectItem([], None, star_table="*", exclude=exclude))
        elif (
            t.kind == "id"
            and t.val.upper() not in _KEYWORDS
            and p.peek(1) is not None
            and p.peek(1).kind == "op"
            and p.peek(1).val == "."
            and p.peek(2) is not None
            and p.peek(2).kind == "op"
            and p.peek(2).val == "*"
        ):
            tbl = p.next().val
            p.next()
            p.next()
            items.append(SelectItem([], None, star_table=tbl))
        else:
            expr = _take_until_any(p, stop_kw=("FROM", "AS"), stop_comma=True)
            alias = None
            if p.accept_kw("AS"):
                alias = _ident_val(p.next())
            items.append(SelectItem(expr, alias))
        nxt = p.peek()
        if nxt is not None and nxt.kind == "op" and nxt.val == ",":
            p.next()
            continue
        break
    return items


def _ident_val(t: Tok) -> str:
    if t.kind == "qid":
        return t.val[1:-1].replace('""', '"')
    if t.kind == "id":
        return t.val
    raise OgrSqlError(f"expected identifier, got {t.val!r}")


# ---------------------------------------------------------------------------
# Rewriter (OGR expression tokens → Spark SQL text)
# ---------------------------------------------------------------------------


@dataclass
class TableCtx:
    view: str
    columns: list[str]
    fid: str
    geom: str | None


class _Rewriter:
    def __init__(self, ctx: dict[str, TableCtx], primary_alias: str, like_as_ilike: bool):
        self.ctx = ctx
        self.primary = primary_alias
        self.like_as_ilike = like_as_ilike
        self.lower = {a.lower(): a for a in ctx}

    def rewrite(self, toks: list[Tok]) -> str:
        out: list[str] = []
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            if t.kind == "str":
                body = t.val[1:-1].replace("''", "'")
                out.append("'" + body.replace("\\", "\\\\").replace("'", "\\'") + "'")
                i += 1
            elif t.kind == "qid":
                out.append("`" + t.val[1:-1].replace('""', '"') + "`")
                i += 1
            elif t.kind == "num":
                out.append(t.val)
                i += 1
            elif t.kind == "op":
                out.append("!=" if t.val == "<>" else t.val)
                i += 1
            else:  # identifier / keyword / function
                u = t.val.upper()
                # table-qualified reference a.f / a.FID / a.OGR_*
                if (
                    t.val.lower() in self.lower
                    and i + 2 < n
                    and toks[i + 1].kind == "op"
                    and toks[i + 1].val == "."
                ):
                    alias = self.lower[t.val.lower()]
                    fld = toks[i + 2]
                    out.append(self._field(alias, fld))
                    i += 3
                elif u == "LIKE" and self.like_as_ilike:
                    out.append("ILIKE")
                    i += 1
                elif u == "CAST":
                    text, i = self._cast(toks, i)
                    out.append(text)
                elif u == "HSTORE_GET_VALUE":
                    text, i = self._hstore(toks, i)
                    out.append(text)
                elif u in _SPECIAL:
                    out.append(self._field(self.primary, t))
                    i += 1
                else:
                    out.append(t.val)
                    i += 1
        return " ".join(out)

    def _field(self, alias: str, fld: Tok) -> str:
        tc = self.ctx[alias]
        u = fld.val.upper() if fld.kind == "id" else None
        if u == "FID":
            return f"{tc.view}.`{tc.fid}`"
        if u in ("OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA", "OGR_STYLE"):
            if u == "OGR_STYLE":
                return "CAST(NULL AS STRING)"
            if tc.geom is None:
                raise OgrSqlError(f"table {alias!r} has no geometry column for {u}")
            g = f"{tc.view}.`{tc.geom}`"
            return {
                "OGR_GEOMETRY": f"ST_GeometryType({g})",
                "OGR_GEOM_WKT": f"ST_AsText({g})",
                "OGR_GEOM_AREA": f"ST_Area({g})",
            }[u]
        return f"{tc.view}.`{_ident_val(fld)}`"

    def _args(self, toks: list[Tok], i: int) -> tuple[list[list[Tok]], int]:
        """Parse '( arg, arg, ... )' starting at toks[i] == '('."""
        assert toks[i].kind == "op" and toks[i].val == "("
        i += 1
        args: list[list[Tok]] = [[]]
        depth = 0
        while i < len(toks):
            t = toks[i]
            if t.kind == "op" and t.val == "(":
                depth += 1
            elif t.kind == "op" and t.val == ")":
                if depth == 0:
                    return args, i + 1
                depth -= 1
            elif t.kind == "op" and t.val == "," and depth == 0:
                args.append([])
                i += 1
                continue
            args[-1].append(t)
            i += 1
        raise OgrSqlError("unbalanced parentheses")

    def _cast(self, toks: list[Tok], i: int) -> tuple[str, int]:
        # CAST ( expr AS type [( n[, m] )] )
        args, j = self._args(toks, i + 1)
        if len(args) != 1:
            raise OgrSqlError("CAST takes one argument")
        inner = args[0]
        # split at top-level AS
        depth = 0
        for k, t in enumerate(inner):
            if t.kind == "op" and t.val == "(":
                depth += 1
            elif t.kind == "op" and t.val == ")":
                depth -= 1
            elif depth == 0 and t.isid("AS"):
                break
        else:
            raise OgrSqlError("CAST without AS")
        expr = self.rewrite(inner[:k])
        tname = inner[k + 1].val.upper()
        if tname not in _CAST_TYPES:
            raise OgrSqlError(f"unsupported CAST type {tname}")
        params = [t.val for t in inner[k + 2 :] if t.kind == "num"]
        if tname == "CHARACTER" and params:
            # OGR character(n) truncates (swq CAST semantics)
            return f"substring(CAST({expr} AS STRING), 1, {params[0]})", j
        if tname == "NUMERIC" and params:
            p0 = params[0]
            p1 = params[1] if len(params) > 1 else "0"
            return f"CAST({expr} AS DECIMAL({p0},{p1}))", j
        return f"CAST({expr} AS {_CAST_TYPES[tname]})", j

    def _hstore(self, toks: list[Tok], i: int) -> tuple[str, int]:
        args, j = self._args(toks, i + 1)
        if len(args) != 2:
            raise OgrSqlError("HSTORE_GET_VALUE takes 2 arguments")
        col = self.rewrite(args[0])
        key = self.rewrite(args[1])
        m = f"str_to_map(regexp_replace({col}, ' *, *', ','), ',', '=>')"
        return f"element_at({m}, {key})", j


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def _agg_name(toks: list[Tok]) -> str | None:
    """OGR unaliased-aggregate naming: min(x) → 'min_x', count(*) →
    'count_*', count(distinct x) → 'count_x'."""
    if len(toks) >= 3 and toks[0].kind == "id" and toks[0].val.upper() in _AGGS:
        inner = toks[2:-1]
        fn = toks[0].val.lower()
        if len(inner) == 1 and inner[0].kind == "op" and inner[0].val == "*":
            return f"{fn}_*"
        if inner and inner[0].isid("DISTINCT"):
            inner = inner[1:]
        if len(inner) == 1 and inner[0].kind in ("id", "qid"):
            return f"{fn}_{_ident_val(inner[0])}"
        return f"{fn}_field"
    return None


def execute_ogr_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, DataFrame],
    fids: dict[str, str] | None = None,
    geoms: dict[str, str] | None = None,
    like_as_ilike: bool = False,
) -> DataFrame:
    """Run an OGR SQL statement over the given layer DataFrames.

    ``fids`` maps table name → FID column (default: first column,
    matching the layers' insertion order); ``geoms`` maps table name →
    WKB geometry column (default: a column literally named ``geom``
    when present). ``like_as_ilike`` restores the pre-GDAL-3.1
    LIKE-is-ILIKE behavior (``OGR_SQL_LIKE_AS_ILIKE=YES``).

    Top-level ``UNION ALL`` chains execute each SELECT and concatenate
    positionally with the first statement's schema, matching the
    reference's split-and-concatenate (`gcore/gdaldataset.cpp:7560`)."""
    segs = split_union_all(tokenize(sql))
    out = _execute_one(spark, segs[0], tables, fids, geoms, like_as_ilike)
    for seg in segs[1:]:
        nxt = _execute_one(spark, seg, tables, fids, geoms, like_as_ilike)
        if len(nxt.columns) != len(out.columns):
            raise OgrSqlError(
                "UNION ALL branches must produce the same column count"
            )
        out = out.union(nxt)
    return out


def _execute_one(
    spark: SparkSession,
    toks: list,
    tables: dict[str, DataFrame],
    fids: dict[str, str] | None,
    geoms: dict[str, str] | None,
    like_as_ilike: bool,
) -> DataFrame:
    from gdal_spark.functions.st import register_st_functions
    from gdal_spark.operators.ogr_join import first_match_left_join  # noqa: F401

    q = _parse_toks(toks)
    fids = fids or {}
    geoms = geoms or {}

    def resolve(name: str) -> DataFrame:
        if name not in tables:
            raise OgrSqlError(f"unknown table {name!r}")
        return tables[name]

    register_st_functions(spark)

    ctx: dict[str, TableCtx] = {}

    def declare(name: str, alias: str, df: DataFrame) -> TableCtx:
        view = f"__ogr_{len(ctx)}_{re.sub('[^A-Za-z0-9_]', '_', alias)}"
        df.createOrReplaceTempView(view)
        fid_val = fids.get(name, df.columns[0])
        tc = TableCtx(
            view=view,
            columns=list(df.columns),
            # compound FIDs order the first-match dedup; the scalar FID
            # special field resolves to the leading component
            fid=fid_val if isinstance(fid_val, str) else fid_val[0],
            geom=geoms.get(name, "geom" if "geom" in df.columns else None),
        )
        ctx[alias] = tc
        return tc

    primary = declare(q.table, q.alias, resolve(q.table))

    # first-match JOIN rewrite: pre-dedup each secondary per join key in
    # FID order (the quirk of ogr_gensql.cpp:1516-1546)
    join_sql_parts: list[str] = []
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for j in q.joins:
        # ON must be a.f = b.f (the swq restriction)
        on = [t for t in j.on_tokens]
        eq = next(
            (k for k, t in enumerate(on) if t.kind == "op" and t.val == "="), None
        )
        if eq is None:
            raise OgrSqlError("JOIN ... ON must be field = field (OGR restriction)")

        def side(ts):
            if len(ts) == 3 and ts[1].val == ".":
                return ts[0].val, _ident_val(ts[2])
            if len(ts) == 1:
                return None, _ident_val(ts[0])
            raise OgrSqlError("JOIN ON sides must be [table.]field")

        la, lf = side(on[:eq])
        ra, rf = side(on[eq + 1 :])
        # which side names the joined table?
        if ra is not None and ra.lower() == j.alias.lower():
            sec_field, prim_side = rf, (la, lf)
        elif la is not None and la.lower() == j.alias.lower():
            sec_field, prim_side = lf, (ra, rf)
        else:
            # unqualified: assume right side is the secondary's field
            sec_field, prim_side = rf, (la, lf)
        sdf = resolve(j.table)
        fid_col = fids.get(j.table, sdf.columns[0])
        fid_cols = [fid_col] if isinstance(fid_col, str) else list(fid_col)
        w = Window.partitionBy(sec_field).orderBy(
            *[F.col(c).asc() for c in fid_cols]
        )
        first = (
            sdf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tc = declare(j.table, j.alias, first)
        # resolve the primary-side alias case-insensitively (defaults
        # to the FROM table when unqualified)
        pa = prim_side[0]
        p_resolved = next(
            (a for a in ctx if pa is not None and a.lower() == pa.lower()), q.alias
        )
        join_sql_parts.append(
            f"LEFT JOIN {tc.view} ON "
            f"{ctx[p_resolved].view}.`{prim_side[1]}` = {tc.view}.`{sec_field}`"
        )

    rw = _Rewriter(ctx, q.alias, like_as_ilike)

    # select list
    sel: list[str] = []
    n_expr = 0
    for it in q.items:
        if it.star_table is not None:
            star_aliases = (
                list(ctx) if it.star_table == "*" else [
                    next(a for a in ctx if a.lower() == it.star_table.lower())
                ]
            )
            for a in star_aliases:
                tc = ctx[a]
                prefix = "" if a == q.alias else f"{a}_"
                for c in tc.columns:
                    if c in it.exclude:
                        continue
                    sel.append(f"{tc.view}.`{c}` AS `{prefix}{c}`")
        else:
            text = rw.rewrite(it.tokens)
            if it.alias:
                name = it.alias
            elif len(it.tokens) == 1 and it.tokens[0].kind in ("id", "qid"):
                name = _ident_val(it.tokens[0])
            elif (
                len(it.tokens) == 3
                and it.tokens[1].kind == "op"
                and it.tokens[1].val == "."
            ):
                name = _ident_val(it.tokens[2])
            else:
                name = _agg_name(it.tokens)
                if name is None:
                    n_expr += 1
                    name = f"field_{n_expr}"
            sel.append(f"{text} AS `{name}`")

    parts = ["SELECT"]
    if q.distinct:
        parts.append("DISTINCT")
    parts.append(", ".join(sel))
    parts.append(f"FROM {primary.view}")
    parts.extend(join_sql_parts)
    if q.where:
        parts.append("WHERE " + rw.rewrite(q.where))
    if q.order_by:
        obs = []
        for expr, desc in q.order_by:
            obs.append(rw.rewrite(expr) + (" DESC" if desc else " ASC"))
        parts.append("ORDER BY " + ", ".join(obs))
    if q.limit is not None:
        parts.append(f"LIMIT {q.limit}")
    if q.offset is not None:
        parts.append(f"OFFSET {q.offset}")
    return spark.sql(" ".join(parts))
