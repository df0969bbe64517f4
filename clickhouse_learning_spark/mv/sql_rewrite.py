"""Automatic MV rewrite for SQL queries (SURVEY §7 phase-5 stretch).

The reference's users query raw logs with plain SQL and rely on
ClickHouse to keep the MV state table in sync; the explicit
:class:`~clickhouse_learning_spark.mv.router.MetricRouter` covers the
metric-request API, and this module closes the remaining gap: take a
raw-log aggregate **SQL string**, decide whether a registered MV can
answer it, and transparently emit the merge/finalize query over the
state table instead — the OSS-Spark analog of ClickHouse's implicit
"query the MV, not the log" usage (reference
docs/物化视图的实战经验分享.md:1159 vs :1205 shows the 7.4× IO win).

Spark-first mechanics: the SQL is parsed with **Spark's own parser**
(``sessionState().sqlParser().parsePlan``) and the *unresolved* logical
plan is pattern-matched — no hand-rolled SQL grammar, so expression
normalization (parenthesization, CAST spelling, CASE sugar) is exactly
Spark's. A true Catalyst rule would need a JVM extension (Scala
``spark.sql.extensions``); matching the unresolved plan from Python
covers the same query shapes for this engine's surface, and anything
that doesn't match falls back to ``spark.sql(query)`` verbatim —
rewrite-or-fallback, never rewrite-or-fail.

Supported shape (the reference's entire query surface, SURVEY §3):

    SELECT dim..., agg(expr) AS alias...
    FROM <raw log>
    [WHERE <conjunction of dim = literal>]
    GROUP BY dim...
    [ORDER BY col [ASC|DESC]...]

Aggregate ↔ metric-kind mapping (the -If combinator is recognized both
as ``FILTER (WHERE c)`` and as ``agg(CASE WHEN c THEN x END)``):

    sum(x)                      → kind="sum",       source=x
    coalesce(agg(...), 0)       → unwrapped for sum/count kinds — the
        ANSI spelling of ClickHouse's empty-aggregate-is-0, which is
        what the MV finalize emits. A *conditional* sum without the
        wrapper does NOT route (SQL gives NULL on no-match groups,
        the MV gives 0).
    count(*) / count(1)         → kind="count"
    count(DISTINCT x)           → kind="uniq_exact", source=x
    approx_count_distinct(x)    → kind="uniq",       source=x  (both
        sides approximate: the routed answer is the Datasketches HLL
        estimate, the raw answer Spark's HLL++ — equal only within ε)
    min/max/avg(x)              → kind="min"/"max"/"avg"
    max_by(x, o) / min_by(x, o) → kind="argmax"/"argmin", order_by=o
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_learning_spark.functions.metrics import MetricSpec
from clickhouse_learning_spark.mv.router import MetricRouter

_FN_KIND = {
    "sum": "sum",
    "min": "min",
    "max": "max",
    "avg": "avg",
    "mean": "avg",
    "approx_count_distinct": "uniq",
    "max_by": "argmax",
    "min_by": "argmin",
}


@dataclass
class _AggReq:
    alias: str
    kind: str
    source_sql: str | None  # normalized; None for count(*)
    cond_sql: str | None
    order_by_sql: str | None = None


class RouteMiss(Exception):
    """Why a query stayed on the raw path (surfaced by explain_route)."""


class SqlRewriter:
    """Routes raw-log aggregate SQL onto registered MVs.

    ``raw_name`` is the table name queries use in FROM; the fallback
    path registers ``router.raw_source`` under that name as a temp view.
    """

    def __init__(self, router: MetricRouter, raw_name: str):
        self.router = router
        self.raw_name = raw_name

    # -- public API -----------------------------------------------------------
    def sql(self, spark: SparkSession, query: str) -> DataFrame:
        try:
            return self._route(spark, query)
        except RouteMiss:
            self.router.raw_source(spark).createOrReplaceTempView(self.raw_name)
            return spark.sql(query)

    def explain_route(self, spark: SparkSession, query: str) -> str:
        """"mv:<name>" when the query rewrites, else "raw:<reason>"."""
        try:
            mv, req = self._match(spark, query)
            return f"mv:{mv.name}"
        except RouteMiss as e:
            return f"raw:{e}"

    # -- plan pattern-match ---------------------------------------------------
    def _parse(self, spark: SparkSession, query: str):
        return spark._jsparkSession.sessionState().sqlParser().parsePlan(query)

    def _norm_expr(self, spark: SparkSession, sql: str) -> str:
        """Normalize an expression through Spark's parser so hand-written
        metric sources compare equal to parser output."""
        return (
            spark._jsparkSession.sessionState()
            .sqlParser()
            .parseExpression(sql)
            .sql()
        )

    def _spec_sig(self, spark: SparkSession, m: MetricSpec):
        """(kind, source_sql, cond_sql, order_by_sql) for matching, or
        None when the spec's exprs are Columns we can't re-render."""

        def norm(x):
            if x is None:
                return None
            if isinstance(x, str):
                return self._norm_expr(spark, x)
            try:  # classic-mode Column → underlying Catalyst expression
                return x._jc.expr().sql()
            except Exception:
                return NotImplemented

        src = norm(m.source) if m.kind != "count" else None
        cond = norm(m.cond)
        order = norm(m.order_by)
        if NotImplemented in (src, cond, order):
            return None
        return (m.kind, src, cond, order)

    def _match(self, spark: SparkSession, query: str):
        plan = self._parse(spark, query)
        order = []
        if plan.getClass().getSimpleName() == "Sort":
            order = self._sort_keys(plan)
            plan = plan.children().apply(0)
        if plan.getClass().getSimpleName() != "Aggregate":
            raise RouteMiss("not a plain GROUP BY aggregate")
        child = plan.children().apply(0)
        where_sql, filter_cols = None, set()
        if child.getClass().getSimpleName() == "Filter":
            cond = child.condition()
            where_sql = cond.sql()
            filter_cols = set(self._attrs(cond))
            child = child.children().apply(0)
        if child.getClass().getSimpleName() != "UnresolvedRelation":
            raise RouteMiss("FROM is not a single raw table")
        if child.multipartIdentifier().mkString(".") != self.raw_name:
            raise RouteMiss(f"relation is not {self.raw_name}")

        ge = plan.groupingExpressions()
        group_by = []
        for i in range(ge.size()):
            g = ge.apply(i)
            if g.getClass().getSimpleName() != "UnresolvedAttribute":
                raise RouteMiss(f"non-column grouping expr {g.sql()}")
            group_by.append(g.sql())

        reqs: list[_AggReq] = []
        out_cols: list[tuple[str, str | None]] = []  # (name, metric-alias|None)
        ae = plan.aggregateExpressions()
        for i in range(ae.size()):
            e = ae.apply(i)
            cls = e.getClass().getSimpleName()
            if cls == "UnresolvedAttribute":
                if e.sql() not in group_by:
                    raise RouteMiss(f"non-grouped bare column {e.sql()}")
                out_cols.append((e.sql(), None))
                continue
            if cls != "Alias":
                raise RouteMiss(f"unaliased aggregate: {e.sql()}")
            fn = e.child()
            if fn.getClass().getSimpleName() != "UnresolvedFunction":
                raise RouteMiss(f"not a plain aggregate call: {e.sql()}")
            reqs.append(self._agg_req(e.name(), fn))
            out_cols.append((e.name(), e.name()))

        mv = self._choose(spark, group_by, reqs, filter_cols)
        return mv, (group_by, reqs, where_sql, out_cols, order)

    def _agg_req(self, alias: str, fn) -> _AggReq:
        # unwrap the coalesce(agg(...), 0) idiom — it spells ClickHouse's
        # "empty aggregate is 0" semantics in ANSI SQL, which is exactly
        # what sum/count metric finalize emits. Without the wrapper a
        # conditional sum must NOT route: SQL sum(CASE WHEN..) yields
        # NULL for a group with no matching rows, the MV yields 0.
        coalesced = False
        if (
            fn.nameParts().mkString(".").lower() == "coalesce"
            and fn.arguments().size() == 2
            and fn.arguments().apply(1).getClass().getSimpleName() == "Literal"
            and fn.arguments().apply(1).sql() == "0"
            and fn.arguments().apply(0).getClass().getSimpleName()
            == "UnresolvedFunction"
        ):
            fn = fn.arguments().apply(0)
            coalesced = True
        name = fn.nameParts().mkString(".").lower()
        args = fn.arguments()
        arg_sql = [args.apply(j) for j in range(args.size())]
        cond_sql = None
        filt = fn.filter()
        if filt.isDefined():
            cond_sql = filt.get().sql()
        src, order_by = None, None

        if name == "count" and not fn.isDistinct():
            if args.size() != 1 or arg_sql[0].sql() != "1":
                raise RouteMiss(f"count over expression: {alias}")
            kind = "count"
        elif name == "count" and fn.isDistinct():
            if args.size() != 1:
                raise RouteMiss("multi-arg count distinct")
            kind, src = "uniq_exact", arg_sql[0]
        elif name in _FN_KIND:
            kind = _FN_KIND[name]
            if kind in ("argmax", "argmin"):
                if args.size() != 2:
                    raise RouteMiss(f"{name} needs 2 args")
                src, order_by = arg_sql[0], arg_sql[1]
            else:
                if args.size() != 1:
                    raise RouteMiss(f"multi-arg {name}")
                src = arg_sql[0]
        else:
            raise RouteMiss(f"unsupported aggregate {name}")

        # CASE WHEN c THEN x END sugar for the -If combinator
        if src is not None and src.getClass().getSimpleName() == "CaseWhen":
            branches = src.branches()
            if branches.size() == 1 and src.elseValue().isEmpty():
                pair = branches.apply(0)
                if cond_sql is not None:
                    raise RouteMiss("both FILTER and CASE WHEN conditions")
                cond_sql = pair._1().sql()
                src = pair._2()

        if coalesced and kind not in ("sum", "count"):
            raise RouteMiss(f"coalesce(...,0) over {kind} differs from MV NULL")
        if kind == "sum" and cond_sql is not None and not coalesced:
            raise RouteMiss(
                "conditional sum without coalesce(...,0): SQL NULL vs MV 0"
            )

        return _AggReq(
            alias,
            kind,
            src.sql() if src is not None else None,
            cond_sql,
            order_by.sql() if order_by is not None else None,
        )

    def _sort_keys(self, sort_plan) -> list[tuple[str, bool]]:
        keys = []
        so = sort_plan.order()
        for i in range(so.size()):
            o = so.apply(i)
            ch = o.child()
            if ch.getClass().getSimpleName() != "UnresolvedAttribute":
                raise RouteMiss(f"non-column sort key {ch.sql()}")
            keys.append((ch.sql(), "DESC" not in o.direction().sql().upper()))
        return keys

    def _attrs(self, expr) -> list[str]:
        """All column names referenced under an (unresolved) expression."""
        out = []
        stack = [expr]
        while stack:
            e = stack.pop()
            if e.getClass().getSimpleName() == "UnresolvedAttribute":
                out.append(e.sql())
            ch = e.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return out

    # -- MV selection ---------------------------------------------------------
    def _choose(self, spark, group_by, reqs, filter_cols):
        cands = []
        for mv in self.router.views:
            if not (set(group_by) <= set(mv.dims) and filter_cols <= set(mv.dims)):
                continue
            mapping = self._map_metrics(spark, mv, reqs)
            if mapping is not None:
                cands.append((mv, mapping))
        if not cands:
            raise RouteMiss("no MV covers dims+metrics+filters")
        mv, mapping = min(cands, key=lambda c: len(c[0].dims))
        self._mapping = mapping  # req.alias -> metric name, for _route
        return mv

    def _map_metrics(self, spark, mv, reqs) -> dict | None:
        sigs = {}
        for m in mv.metrics:
            sig = self._spec_sig(spark, m)
            if sig is not None:
                sigs.setdefault(sig, m.name)
        mapping = {}
        for r in reqs:
            sig = (
                r.kind,
                self._norm_expr(spark, r.source_sql) if r.source_sql else None,
                self._norm_expr(spark, r.cond_sql) if r.cond_sql else None,
                self._norm_expr(spark, r.order_by_sql) if r.order_by_sql else None,
            )
            if sig not in sigs:
                return None
            mapping[r.alias] = sigs[sig]
        return mapping

    # -- routed query emission ------------------------------------------------
    def _route(self, spark: SparkSession, query: str) -> DataFrame:
        mv, (group_by, reqs, where_sql, out_cols, order) = self._match(spark, query)
        mapping = self._mapping
        df = mv.merge_query(
            spark, group_by, list(dict.fromkeys(mapping.values())), where=where_sql
        )
        proj = [
            F.col(mapping[name]).alias(name) if metric else F.col(name)
            for name, metric in out_cols
        ]
        df = df.select(*proj)
        if order:
            df = df.orderBy(
                *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
            )
        return df


def run_clickhouse(
    spark: SparkSession,
    ch_sql: str,
    rewriter: "SqlRewriter | None" = None,
    dictionaries: dict | None = None,
) -> DataFrame:
    """The full switch-without-rewriting path in one call: translate a
    ClickHouse query (functions/dialect.translate — combinators, clause
    rewrites, dictGet) and, when a rewriter is given, answer it from a
    registered MV's state table if the aggregate shape matches
    (rewrite-or-fallback; a non-matching query runs verbatim over the
    raw source). A reference user's day-one loop is exactly this
    function."""
    from clickhouse_learning_spark.functions.dialect import translate

    sql = translate(ch_sql, dictionaries)
    if rewriter is not None:
        return rewriter.sql(spark, sql)
    return spark.sql(sql)
