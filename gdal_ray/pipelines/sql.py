"""SQL string front-end — the OGR SQL dialect subset.

Reference semantics: the reference compiles attribute-query / SELECT
strings with the SWQ engine (ogr/ogrfeaturequery.cpp:68 Compile,
grammar ogr/swq_parser.y, operator registry
ogr/swq_op_registrar.cpp:28-62; JOIN / GROUP-BY execution in
ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1319-1510).  This module parses
the same surface (SELECT list with aliases and scalar expressions,
aggregates COUNT/SUM/AVG/MIN/MAX — usable inside expressions, e.g.
``CAST(SUM(x) AS BIGINT)`` — FROM with [LEFT] JOIN ... ON equi-join
chains, derived tables ``FROM/JOIN (SELECT ...) alias`` (subquery
plans execute first, register under the alias, nest arbitrarily),
qualified ``table.column`` refs, WHERE with AND/OR/NOT,
comparison ops, LIKE/ILIKE, IN, BETWEEN, arithmetic incl %, CONCAT,
SUBSTR, CAST, CASE WHEN (searched + simple), COALESCE, NULLIF,
GROUP BY incl. GROUP BY <expression> — lowered onto an internal
derived table precomputing each expression as a hidden column, with
structurally-equal SELECT/WHERE/HAVING occurrences rewritten to it)
and compiles it to vectorized pyarrow.compute kernels
through ``Dataset.map_batches``:

- single-table WHERE conjuncts push down BELOW the join (per-table
  filter before the shuffle);
- joins lower onto ``Dataset.join`` (hash shuffle; the small-side
  broadcast variant stays available via pipelines.relational);
- GROUP BY lowers onto relational.grouped_aggregate (per-batch pyarrow
  partial aggregation, then one tiny keyed shuffle); HAVING filters
  the summary table (its aggregates join the same pass);
- COUNT/SUM/AVG(DISTINCT x) lower to distinct-of-(keys, x) -> per-key
  aggregate over the distinct set -> left-outer join back onto the
  summary (NULL-only groups report COUNT 0 / SUM,AVG NULL; SUM/AVG
  results are double, matching the swq summary accumulators);
  MIN/MAX(DISTINCT) collapse to plain MIN/MAX;
- scalar subqueries ``(SELECT agg FROM ...)`` in SELECT/WHERE/HAVING
  execute once and substitute as literals; ``[NOT] IN (SELECT ...)``
  as a top-level WHERE conjunct lowers onto a co-partitioned
  semi/anti join (three-valued NOT IN NULL semantics preserved);
- UNION ALL chains branches with Dataset.union; bare UNION dedups
  (left-associative with mixed modes) via the distributed DISTINCT;
  trailing ORDER BY / LIMIT apply to the whole union;
- INTERSECT / EXCEPT: distinct left rows semi/anti-join the right
  branch on a NULL-safe positional row key (set-op NULLs compare
  EQUAL, unlike join equality) — one co-partitioned shuffle; mixing
  INTERSECT into a UNION/EXCEPT chain raises (precedence differs from
  left-associative execution — parenthesize via a derived table);
- SELECT DISTINCT (the swq SWQM_DISTINCT_LIST mode, multi-column)
  lowers onto relational.distinct after the projection;
- ORDER BY / LIMIT lower onto the distributed top-k;
- CORRELATED scalar subqueries ``(SELECT agg(x) FROM t2 WHERE
  t2.k = outer.k)`` decorrelate to a grouped aggregate + one
  co-partitioned left-outer join (bare COUNT null-fills to 0);
  ``[NOT] EXISTS (SELECT ... WHERE inner = outer)`` lowers to a
  co-partitioned semi/anti join (uncorrelated EXISTS is a single
  boolean gate);
- window functions ROW_NUMBER/RANK/DENSE_RANK () OVER (PARTITION BY k
  ORDER BY s [DESC]) and COUNT/SUM/AVG/MIN/MAX(x) OVER (PARTITION BY
  k [ORDER BY s]): one hash shuffle on the partition key, vectorized
  dense-rank + lexsort + reduceat per task; aggregates with ORDER BY
  use the SQL default running frame (RANGE UNBOUNDED..CURRENT ROW,
  peers included: segmented cumsum/cummin/cummax + peer-end
  broadcast); explicit ``ROWS BETWEEN <b> AND <b>`` and ``RANGE
  BETWEEN <b> AND <b>`` frames accept UNBOUNDED / n PRECEDING /
  CURRENT ROW / n FOLLOWING on both ends — every frame lowers to
  per-row inclusive index windows [lo, hi] (ROWS: clamped offsets;
  RANGE: one vectorized merge-searchsorted per bound over the single
  numeric ORDER BY key, DuckDB NULL-peer-run semantics), then
  SUM/COUNT/AVG via prefix-sum differences and MIN/MAX via a
  NaN-skipping doubling (sparse) table built to the deepest needed
  level; LAG/LEAD/FIRST_VALUE are typed gathers over the sorted
  partition (any column type), NTILE uses the SQL remainder-bucket
  rule.  PARTITION BY is required — a global window would serialize
  through one task.

- [NOT] IN / EXISTS conjuncts on JOIN outer queries route the
  semi/anti join to the ONE table owning the probe expression, below
  the main join (raises for probes on the null-filled side of a LEFT
  JOIN, where the filter would not commute).

- window functions over GROUP BY results (``RANK() OVER (PARTITION
  BY r ORDER BY SUM(x))`` with GROUP BY, joins included): the grouped
  aggregate runs first, then the window machinery over the aggregated
  table with aggregates/group keys rewritten to column references.

- correlated subqueries / EXISTS accept multiple correlated
  equalities: N ``inner = outer`` conjuncts pair into one exact
  composite join key (length-prefixed string encoding, NULL when any
  component is NULL so SQL's never-match-NULL holds).

- JOIN ON accepts extra conjuncts beyond the hash equality (band /
  inequality predicates): the first inner=outer column equality keys
  the hash join, the residual conjuncts filter post-join (inner joins
  only — on a LEFT JOIN they would alter match semantics and raise).

- CROSS JOIN and joins with NO column equality in ON (pure non-equi)
  lower to a broadcast nested-loop join: the right side materializes
  once (after its pushed-down WHERE conjuncts), broadcasts via one
  ray.put, and every left batch emits the cartesian product in bounded
  chunks with the ON residual filtering fused into the same task;
  right sides beyond 65,536 rows raise with a rewrite hint (inner
  joins only — LEFT JOIN still requires an equality).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<op><=|>=|<>|!=|[=<>(),*%+\-/.])|(?P<ident>[A-Za-z_][A-Za-z_0-9]*))"
)

_KEYWORDS = {
    "select", "from", "where", "order", "by", "asc", "desc", "limit",
    "offset", "as",
    "and", "or", "not", "like", "ilike", "in", "between", "cast", "concat",
    "substr", "case", "when", "then", "else", "end", "coalesce", "nullif",
    "is", "null", "true", "false",
    "join", "on", "left", "inner", "outer", "cross", "group", "having",
    "union", "all", "intersect", "except",
    "count", "sum", "avg", "min", "max", "distinct",
    "exists", "over", "partition",
}

_AGG_FNS = ("count", "sum", "avg", "min", "max")


def _tokenize(sql: str):
    pos, out = 0, []
    while pos < len(sql):
        m = _TOKEN.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"SQL tokenize error at {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            txt = m.group("num")
            out.append(("num", float(txt) if "." in txt else int(txt)))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "op":
            out.append(("op", m.group("op")))
        else:
            w = m.group("ident")
            out.append(
                ("kw", w.lower()) if w.lower() in _KEYWORDS else ("ident", w)
            )
    out.append(("end", None))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {kind} {val}, got {k} {v}")
        return v

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            self.i += 1
            return True
        return False

    # ---- expression grammar (precedence climbing) ----
    # or < and < not < comparison/LIKE/IN/BETWEEN < add < mul < unary

    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.and_expr()
        while self.accept("kw", "or"):
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "and"):
            e = ("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.accept("kw", "not"):
            return ("not", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        k, v = self.peek()
        if k == "op" and v in ("=", "!=", "<>", "<", "<=", ">", ">="):
            self.next()
            return ({"=": "eq", "!=": "ne", "<>": "ne", "<": "lt", "<=": "le",
                     ">": "gt", ">=": "ge"}[v], e, self.add_expr())
        if k == "kw" and v == "is":
            self.next()
            neg = self.accept("kw", "not")
            self.expect("kw", "null")
            return ("notnull" if neg else "isnull", e)
        neg = False
        if k == "kw" and v == "not":
            # NOT LIKE / NOT IN / NOT BETWEEN
            nk, nv = self.toks[self.i + 1]
            if nk == "kw" and nv in ("like", "ilike", "in", "between"):
                self.next()
                neg = True
                k, v = self.peek()
        if k == "kw" and v in ("like", "ilike"):
            self.next()
            rhs = self.add_expr()
            e = (v, e, rhs)
            return ("not", e) if neg else e
        if k == "kw" and v == "in":
            self.next()
            self.expect("op", "(")
            if self.peek() == ("kw", "select"):
                sub = _parse_one(self, sub=True)
                self.expect("op", ")")
                e = ("in_subq", e, sub)
                return ("not", e) if neg else e
            vals = [self.expr()]
            while self.accept("op", ","):
                vals.append(self.expr())
            self.expect("op", ")")
            e = ("in", e, vals)
            return ("not", e) if neg else e
        if k == "kw" and v == "between":
            self.next()
            lo = self.add_expr()
            self.expect("kw", "and")
            hi = self.add_expr()
            e = ("between", e, lo, hi)
            return ("not", e) if neg else e
        return e

    def add_expr(self):
        e = self.mul_expr()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                e = ("add" if v == "+" else "sub", e, self.mul_expr())
            else:
                return e

    def mul_expr(self):
        e = self.unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                e = ({"*": "mul", "/": "div", "%": "mod"}[v], e, self.unary())
            else:
                return e

    def unary(self):
        if self.accept("op", "-"):
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        k, v = self.next()
        if k == "num":
            return ("lit", v)
        if k == "str":
            return ("lit", v)
        if k == "kw" and v in ("true", "false"):
            return ("lit", v == "true")
        if k == "kw" and v == "null":
            return ("lit", None)
        if k == "kw" and v == "cast":
            self.expect("op", "(")
            e = self.expr()
            self.expect("kw", "as")
            ty = self.expect("ident").lower()
            self.expect("op", ")")
            return ("cast", e, ty)
        if k == "kw" and v == "concat":
            self.expect("op", "(")
            args = [self.expr()]
            while self.accept("op", ","):
                args.append(self.expr())
            self.expect("op", ")")
            return ("concat", args)
        if k == "kw" and v == "coalesce":
            self.expect("op", "(")
            args = [self.expr()]
            while self.accept("op", ","):
                args.append(self.expr())
            self.expect("op", ")")
            if len(args) < 2:
                raise ValueError("COALESCE requires at least two arguments")
            return ("coalesce", *args)
        if k == "kw" and v == "nullif":
            self.expect("op", "(")
            a = self.expr()
            self.expect("op", ",")
            b = self.expr()
            self.expect("op", ")")
            return ("nullif", a, b)
        if k == "kw" and v == "case":
            # searched: CASE WHEN c THEN v ... [ELSE e] END
            # simple:   CASE base WHEN x THEN v ... [ELSE e] END
            #           (desugars to eq(base, x) — SQL equality, so a
            #           NULL base/operand never matches a WHEN)
            base = None
            if self.peek() != ("kw", "when"):
                base = self.expr()
            parts = []
            while self.accept("kw", "when"):
                c = self.expr()
                if base is not None:
                    c = ("eq", base, c)
                self.expect("kw", "then")
                parts.append(c)
                parts.append(self.expr())
            if not parts:
                raise ValueError("CASE requires at least one WHEN branch")
            els = self.expr() if self.accept("kw", "else") else ("lit", None)
            self.expect("kw", "end")
            return ("case", *parts, els)
        if k == "kw" and v == "substr":
            self.expect("op", "(")
            e = self.expr()
            self.expect("op", ",")
            start = self.expr()
            ln = None
            if self.accept("op", ","):
                ln = self.expr()
            self.expect("op", ")")
            return ("substr", e, start, ln)
        if k == "kw" and v in _AGG_FNS:
            self.expect("op", "(")
            if v == "count" and self.accept("op", "*"):
                self.expect("op", ")")
                node = ("agg", "count", None, False)
            else:
                distinct = self.accept("kw", "distinct")
                arg = self.expr()
                self.expect("op", ")")
                node = ("agg", v, arg, distinct)
            if self.peek() == ("kw", "over"):
                if node[3]:
                    raise ValueError("DISTINCT aggregate windows unsupported")
                return self._over_clause(node[1], node[2])
            return node
        if k == "kw" and v == "exists":
            self.expect("op", "(")
            sub = _parse_one(self, sub=True)
            self.expect("op", ")")
            return ("exists", sub)
        if k == "op" and v == "(":
            if self.peek() == ("kw", "select"):
                sub = _parse_one(self, sub=True)
                self.expect("op", ")")
                return ("subq", sub)
            e = self.expr()
            self.expect("op", ")")
            return e
        if k == "ident":
            lf = v.lower()
            if (lf in ("row_number", "rank", "dense_rank")
                    and self.peek() == ("op", "(")):
                self.next()
                self.expect("op", ")")
                return self._over_clause(lf, None)
            if lf == "ntile" and self.peek() == ("op", "("):
                self.next()
                nb = self.next()
                if nb[0] != "num" or not isinstance(nb[1], int) or nb[1] < 1:
                    raise ValueError("NTILE needs a positive int literal")
                self.expect("op", ")")
                return self._over_clause(lf, None, param=nb[1])
            if lf in ("lag", "lead") and self.peek() == ("op", "("):
                self.next()
                arg = self.expr()
                off = 1
                if self.accept("op", ","):
                    ot = self.next()
                    if ot[0] != "num" or not isinstance(ot[1], int) or ot[1] < 0:
                        raise ValueError(
                            f"{lf.upper()} offset must be an int literal"
                        )
                    off = ot[1]
                self.expect("op", ")")
                return self._over_clause(lf, arg, param=off)
            if lf == "first_value" and self.peek() == ("op", "("):
                self.next()
                arg = self.expr()
                self.expect("op", ")")
                return self._over_clause(lf, arg)
            if self.accept("op", "."):
                return ("qcol", v, self.expect("ident"))
            return ("col", v)
        raise ValueError(f"unexpected token {k} {v}")

    def _over_clause(self, fn, arg, param=None):
        """fn(...) OVER (PARTITION BY e, ... [ORDER BY e [DESC], ...])
        -> ("win", fn, arg, parts, orders).  Engine extension (the swq
        dialect has no window functions); PARTITION BY is REQUIRED — a
        global window would funnel every row through one task."""
        self.expect("kw", "over")
        self.expect("op", "(")
        parts, orders = [], []
        if self.accept("kw", "partition"):
            self.expect("kw", "by")
            parts.append(self.expr())
            while self.accept("op", ","):
                parts.append(self.expr())
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self.expr()
                desc = False
                if self.accept("kw", "desc"):
                    desc = True
                else:
                    self.accept("kw", "asc")
                orders.append((e, desc))
                if not self.accept("op", ","):
                    break
        frame = None  # None = default RANGE running frame (with peers)
        k, v = self.peek()
        if k == "ident" and v.lower() in ("rows", "range"):
            mode = v.lower()
            self.next()
            self.expect("kw", "between")
            lo = self._frame_bound(mode, is_start=True)
            self.expect("kw", "and")
            hi = self._frame_bound(mode, is_start=False)
            if lo is not None and hi is not None and lo > hi:
                raise ValueError(
                    f"{mode.upper()} frame start bound exceeds end bound"
                )
            frame = (mode, lo, hi)
            if not orders:
                raise ValueError(
                    f"a {mode.upper()} frame requires ORDER BY"
                )
            if mode == "range" and len(orders) != 1:
                raise ValueError(
                    "an explicit RANGE frame requires exactly one "
                    "ORDER BY key"
                )
        self.expect("op", ")")
        ranking = fn in ("row_number", "rank", "dense_rank",
                         "ntile", "lag", "lead", "first_value")
        if frame is not None:
            if ranking:
                raise ValueError(
                    "ROWS/RANGE frames apply to aggregates only"
                )
            if param is not None:
                raise ValueError("conflicting window parameters")
            param = frame
        if ranking and not orders:
            raise ValueError(f"{fn}() OVER requires ORDER BY")
        # aggregates WITH orders use the SQL default running frame
        # (RANGE UNBOUNDED PRECEDING .. CURRENT ROW, peers included)
        if not parts:
            raise ValueError(
                "OVER requires PARTITION BY (a global window would "
                "serialize the whole dataset through one task)"
            )
        return ("win", fn, arg, tuple(parts), tuple(orders), param)

    def _frame_bound(self, mode: str, is_start: bool):
        """One bound of ROWS|RANGE BETWEEN ... AND ... — returns a
        signed offset (PRECEDING negative, FOLLOWING positive, CURRENT
        ROW 0) or None for the UNBOUNDED end in that direction."""
        k, v = self.next()
        if k == "ident" and v.lower() == "unbounded":
            d = self.expect("ident").lower()
            if is_start and d != "preceding":
                raise ValueError("frame start: UNBOUNDED PRECEDING only")
            if not is_start and d != "following":
                raise ValueError("frame end: UNBOUNDED FOLLOWING only")
            return None
        if k == "ident" and v.lower() == "current":
            if self.expect("ident").lower() != "row":
                raise ValueError("expected CURRENT ROW")
            return 0
        if k == "num" and v >= 0:
            if mode == "rows" and not isinstance(v, int):
                raise ValueError("ROWS frame offsets must be integers")
            d = self.expect("ident").lower()
            if d == "preceding":
                return -v
            if d == "following":
                return v
            raise ValueError("expected PRECEDING or FOLLOWING")
        raise ValueError(
            f"bad frame bound token {k} {v!r} (expected UNBOUNDED, "
            "CURRENT ROW or <literal> PRECEDING|FOLLOWING)"
        )


_TYPES = {
    "bigint": pa.int64(), "integer": pa.int64(), "int": pa.int64(),
    "double": pa.float64(), "float": pa.float64(),
    "varchar": pa.string(), "text": pa.string(), "character": pa.string(),
}


def _case_common_type(types) -> pa.DataType:
    """Result type of a CASE across its branch value types: NULL
    branches adopt the others' type, mixed int/float widens to double
    (the swq/DuckDB promotion), anything else must agree exactly."""
    types = [ty for ty in types if not pa.types.is_null(ty)]
    if not types:
        return pa.null()
    if all(ty.equals(types[0]) for ty in types):
        return types[0]
    if all(pa.types.is_integer(ty) or pa.types.is_floating(ty)
           for ty in types):
        if any(pa.types.is_floating(ty) for ty in types):
            return pa.float64()
        return pa.int64()
    raise ValueError(
        "CASE branches have incompatible types: "
        + ", ".join(str(ty) for ty in types)
    )


def _eval(node, t: pa.Table):
    op = node[0]
    if op == "lit":
        return pa.scalar(node[1])
    if op == "col":
        return t.column(node[1])
    if op == "qcol":  # single-table path: alias-qualified ref
        return t.column(node[2])
    if op in ("and", "or"):
        a, b = _eval(node[1], t), _eval(node[2], t)
        return (pc.and_kleene if op == "and" else pc.or_kleene)(a, b)
    if op == "not":
        return pc.invert(_eval(node[1], t))
    if op in ("eq", "ne", "lt", "le", "gt", "ge"):
        return getattr(pc, {"eq": "equal", "ne": "not_equal", "lt": "less",
                            "le": "less_equal", "gt": "greater",
                            "ge": "greater_equal"}[op])(
            _eval(node[1], t), _eval(node[2], t)
        )
    if op == "add":
        return pc.add(_eval(node[1], t), _eval(node[2], t))
    if op == "sub":
        return pc.subtract(_eval(node[1], t), _eval(node[2], t))
    if op == "mul":
        return pc.multiply(_eval(node[1], t), _eval(node[2], t))
    if op == "div":
        a, b = _eval(node[1], t), _eval(node[2], t)
        # SQL integer division stays integral (DuckDB // is separate; OGR
        # SQL divides doubles) — promote to float64 like OGR swq
        return pc.divide(pc.cast(a, pa.float64()), pc.cast(b, pa.float64()))
    if op == "mod":
        a, b = _eval(node[1], t), _eval(node[2], t)
        for v in (a, b):
            ty = v.type
            if pa.types.is_floating(ty):
                raise ValueError(
                    "modulo requires integer operands (pc.divide on floats "
                    "is true division, which would make a %% b always 0)"
                )
        # pyarrow divide on integers truncates, so this is truncated
        # integer modulo (matches DuckDB % on BIGINT)
        return pc.subtract(a, pc.multiply(pc.divide(a, b), b))
    if op == "neg":
        return pc.negate(_eval(node[1], t))
    if op == "like":
        return pc.match_like(_eval(node[1], t), _eval(node[2], t).as_py())
    if op == "ilike":
        return pc.match_like(
            _eval(node[1], t), _eval(node[2], t).as_py(), ignore_case=True
        )
    if op == "coalesce":
        vals = [_eval(a, t) for a in node[1:]]
        # a null-TYPED argument (e.g. a rolled-up group key replaced
        # by a NULL literal) is always NULL — drop it, pyarrow's
        # kernel has no (null, T) signature
        typed = [v for v in vals if v.type != pa.null()]
        if not typed:
            return vals[0]
        if len(typed) == 1:
            return typed[0]
        return pc.coalesce(*typed)
    if op == "nullif":
        a = _eval(node[1], t)
        eq = pc.fill_null(pc.equal(a, _eval(node[2], t)), False)
        if isinstance(a, pa.Scalar):
            return pa.scalar(None, a.type) if eq.as_py() else a
        return pc.if_else(eq, pa.scalar(None, a.type), a)
    if op == "case":
        # flat node: ("case", c1, v1, c2, v2, ..., else); a NULL
        # condition is not-matched (SQL three-valued WHEN)
        branches = node[1:-1]
        conds = [_eval(branches[i], t) for i in range(0, len(branches), 2)]
        vals = [_eval(branches[i], t) for i in range(1, len(branches), 2)]
        vals.append(_eval(node[-1], t))
        ty = _case_common_type([v.type for v in vals])
        if pa.types.is_null(ty):
            return pa.scalar(None)
        vals = [v if v.type.equals(ty) else pc.cast(v, ty) for v in vals]
        res = vals[-1]
        for cond, val in zip(reversed(conds), reversed(vals[:-1])):
            if isinstance(cond, pa.Scalar):
                res = val if bool(cond.as_py()) else res
            else:
                res = pc.if_else(pc.fill_null(cond, False), val, res)
        return res
    if op == "in":
        col = _eval(node[1], t)
        vals = []
        for v in node[2]:
            s = _eval(v, t)
            if not isinstance(s, pa.Scalar):
                raise ValueError(
                    "IN list elements must be scalar literals, got "
                    f"expression {v[0]!r}"
                )
            vals.append(s.as_py())
        return pc.is_in(col, value_set=pa.array(vals).cast(col.type))
    if op == "between":
        e = _eval(node[1], t)
        return pc.and_(
            pc.greater_equal(e, _eval(node[2], t)),
            pc.less_equal(e, _eval(node[3], t)),
        )
    if op == "isnull":
        return pc.is_null(_eval(node[1], t))
    if op == "notnull":
        return pc.is_valid(_eval(node[1], t))
    if op == "cast":
        return pc.cast(_eval(node[1], t), _TYPES[node[2]])
    if op == "concat":
        args = [pc.cast(_eval(a, t), pa.string()) for a in node[1]]
        return pc.binary_join_element_wise(*args, "")
    if op == "substr":
        e = _eval(node[1], t)
        start = node[2][1] - 1  # SQL is 1-based
        if node[3] is None:
            return pc.utf8_slice_codeunits(e, start)
        return pc.utf8_slice_codeunits(e, start, start + node[3][1])
    raise ValueError(f"cannot evaluate {op}")


def parse_select(sql: str) -> dict:
    """Parse a SELECT statement (optionally a UNION ALL chain) into a
    plan dict.  For a chain, returns {"union_all": [branch plans...]};
    ORDER BY / LIMIT written after the LAST branch apply to the whole
    union (hoisted by the executor); earlier branches may not carry
    them."""
    p = _Parser(_tokenize(sql))
    branches = [_parse_one(p)]
    modes = []  # mode joining branch i and i+1: "all" | "distinct"
    while True:
        m = branches[-1].pop("union_next")
        if not m:
            break
        modes.append(m)
        branches.append(_parse_one(p))
    branches[-1].pop("union_next", None)
    if len(branches) == 1:
        return branches[0]
    for b in branches[:-1]:
        if b["order"] or b["limit"] is not None or b.get("offset"):
            raise ValueError(
                "ORDER BY/LIMIT/OFFSET inside a non-final UNION ALL branch"
            )
    return {"union_all": branches, "union_modes": modes}


def _parse_one(p: "_Parser", sub: bool = False) -> dict:
    p.expect("kw", "select")
    # SELECT DISTINCT (the swq SWQM_DISTINCT_LIST mode generalized to
    # multi-column: ogr/ogr_swq.h:382 oSetDistinctValues)
    select_distinct = p.accept("kw", "distinct")
    items = []
    if p.accept("op", "*"):
        items = None
    else:
        while True:
            e = p.expr()
            alias = None
            if p.accept("kw", "as"):
                alias = p.expect("ident")
            elif p.peek()[0] == "ident":
                alias = p.expect("ident")
            items.append((e, alias))
            if not p.accept("op", ","):
                break
    p.expect("kw", "from")
    derived = None
    if p.accept("op", "("):
        # derived table: FROM (SELECT ...) alias — the subquery plan
        # executes first and registers under the alias
        derived = _parse_one(p, sub=True)
        p.expect("op", ")")
        table = None
        p.accept("kw", "as")
        table_alias = p.expect("ident")
    else:
        table = p.expect("ident")
        table_alias = table
        if p.accept("kw", "as"):
            table_alias = p.expect("ident")
        elif p.peek()[0] == "ident":
            table_alias = p.expect("ident")
    joins = []
    while True:
        k, v = p.peek()
        if k == "kw" and v == "left":
            p.next()
            p.accept("kw", "outer")
            p.expect("kw", "join")
            how = "left_outer"
        elif k == "kw" and v == "inner":
            p.next()
            p.expect("kw", "join")
            how = "inner"
        elif k == "kw" and v == "cross":
            p.next()
            p.expect("kw", "join")
            how = "cross"
        elif k == "kw" and v == "join":
            p.next()
            how = "inner"
        else:
            break
        jderived = None
        if p.accept("op", "("):
            jderived = _parse_one(p, sub=True)
            p.expect("op", ")")
            jt = None
            p.accept("kw", "as")
            ja = p.expect("ident")
        else:
            jt = p.expect("ident")
            ja = jt
            if p.accept("kw", "as"):
                ja = p.expect("ident")
            elif p.peek()[0] == "ident" and p.toks[p.i][1].lower() != "on":
                ja = p.expect("ident")
        if how == "cross":
            cond = None
        else:
            p.expect("kw", "on")
            cond = p.expr()
        joins.append({"table": jt, "alias": ja, "how": how, "on": cond,
                      "derived": jderived})
    where = None
    if p.accept("kw", "where"):
        where = p.expr()
    group = []
    group_mode = None
    if p.accept("kw", "group"):
        p.expect("kw", "by")
        nk, nv = p.peek()
        if nk == "ident" and nv.lower() in ("rollup", "cube"):
            # GROUP BY ROLLUP (a, b) / CUBE (a, b): executed as the
            # standard grouping-set expansion (_run_grouping_sets)
            group_mode = nv.lower()
            p.next()
            p.expect("op", "(")
            while True:
                g = p.expr()
                if _has_agg(g):
                    raise ValueError(
                        "aggregates are not allowed in GROUP BY")
                group.append(g)
                if not p.accept("op", ","):
                    break
            p.expect("op", ")")
        else:
            while True:
                g = p.expr()
                if _has_agg(g):
                    raise ValueError(
                        "aggregates are not allowed in GROUP BY")
                group.append(g)
                if not p.accept("op", ","):
                    break
    having = None
    if p.accept("kw", "having"):
        having = p.expr()
    order = []
    if p.accept("kw", "order"):
        p.expect("kw", "by")
        while True:
            col = p.expect("ident")
            desc = False
            if p.accept("kw", "desc"):
                desc = True
            else:
                p.accept("kw", "asc")
            order.append((col, desc))
            if not p.accept("op", ","):
                break
    limit = None
    if p.accept("kw", "limit"):
        limit = int(p.next()[1])
    offset = None
    if p.accept("kw", "offset"):
        offset = int(p.next()[1])
    union_next = False  # False | "all" | "distinct" | "intersect" | "except"
    if not sub and p.accept("kw", "union"):
        union_next = "all" if p.accept("kw", "all") else "distinct"
    elif not sub and p.accept("kw", "intersect"):
        union_next = "intersect"
    elif not sub and p.accept("kw", "except"):
        union_next = "except"
    elif not sub and p.peek()[0] != "end":
        raise ValueError(f"trailing tokens at {p.peek()}")
    return {"items": items, "table": table, "table_alias": table_alias,
            "derived": derived, "joins": joins, "where": where,
            "group": group, "group_mode": group_mode, "having": having,
            "order": order, "limit": limit, "offset": offset,
            "distinct": select_distinct, "union_next": union_next}


# ------------------------------------------------ AST utilities


def _transform(node, fn):
    """Bottom-up rewrite: apply fn to each node after recursing."""
    op = node[0]
    if op in ("lit", "col", "qcol", "subq"):
        return fn(node)
    if op == "in_subq":  # node[2] is a plan dict, opaque to rewrites
        return fn(("in_subq", _transform(node[1], fn), node[2]))
    if op == "in":
        return fn(("in", _transform(node[1], fn),
                   [_transform(v, fn) for v in node[2]]))
    if op == "concat":
        return fn(("concat", [_transform(a, fn) for a in node[1]]))
    if op == "substr":
        return fn(("substr", _transform(node[1], fn),
                   _transform(node[2], fn),
                   None if node[3] is None else _transform(node[3], fn)))
    if op == "cast":
        return fn(("cast", _transform(node[1], fn), node[2]))
    if op == "agg":
        return fn(("agg", node[1],
                   None if node[2] is None else _transform(node[2], fn),
                   node[3]))
    if op == "exists":  # node[1] is a plan dict, opaque to rewrites
        return fn(node)
    if op == "win":
        return fn(("win", node[1],
                   None if node[2] is None else _transform(node[2], fn),
                   tuple(_transform(p, fn) for p in node[3]),
                   tuple((_transform(e, fn), d) for e, d in node[4]),
                   node[5]))
    return fn((op, *(_transform(c, fn) for c in node[1:])))


def _walk(node):
    yield node
    op = node[0]
    if op in ("lit", "col", "qcol", "subq"):
        return
    if op == "in_subq":
        yield from _walk(node[1])
        return
    if op == "in":
        yield from _walk(node[1])
        for v in node[2]:
            yield from _walk(v)
    elif op == "concat":
        for a in node[1]:
            yield from _walk(a)
    elif op == "substr":
        yield from _walk(node[1])
        yield from _walk(node[2])
        if node[3] is not None:
            yield from _walk(node[3])
    elif op == "cast":
        yield from _walk(node[1])
    elif op == "agg":
        if node[2] is not None:
            yield from _walk(node[2])
    elif op == "exists":
        return
    elif op == "win":
        if node[2] is not None:
            yield from _walk(node[2])
        for p2 in node[3]:
            yield from _walk(p2)
        for e2, _ in node[4]:
            yield from _walk(e2)
    else:
        for c in node[1:]:
            if isinstance(c, tuple):
                yield from _walk(c)


def _has_agg(node) -> bool:
    return any(n[0] == "agg" for n in _walk(node))


def _split_conjuncts(node):
    if node[0] == "and":
        return _split_conjuncts(node[1]) + _split_conjuncts(node[2])
    return [node]


def _out_name(e, alias, idx) -> str:
    if alias:
        return alias
    if e[0] == "col":
        return e[1]
    if e[0] == "qcol":
        return e[2]
    return f"expr_{idx}"


_NL_CAP = 1 << 16  # broadcast nested-loop right-side row cap


def _nl_join(left_ds, right_ds, right_cols, renames, right_schema,
             cap: int = _NL_CAP):
    """CROSS JOIN / pure non-equi ON: broadcast nested-loop join.

    The right side must be small: it materializes once (AFTER its
    pushed-down WHERE conjuncts), broadcasts via one ray.put, and every
    left batch emits the cartesian product in bounded chunks; the ON
    residual / WHERE conjuncts filter immediately after, fused into the
    same task.  Beyond the cap the query raises with a rewrite hint —
    an uncapped distributed cross product is never what a user wants."""
    import ray

    from ..stages.knn import dataset_to_table

    r = dataset_to_table(right_ds)
    if r.num_rows == 0 and not r.column_names:
        # fully-empty materialization loses the schema; rebuild typed
        r = pa.table({c: pa.array([], type=t) for c, t in right_schema})
    if r.num_rows > cap:
        raise ValueError(
            f"CROSS / non-equi JOIN right side has {r.num_rows} rows "
            f"(cap {cap}); pre-filter or pre-aggregate it (a derived "
            "table works), or add a column equality to key a hash join"
        )
    r = r.select(right_cols).rename_columns([renames[c] for c in right_cols])
    ref = ray.put(r)

    def fn(t: pa.Table) -> pa.Table:
        rt = ray.get(ref)
        m = rt.num_rows
        out = []
        step = max(1, (1 << 18) // max(m, 1))
        for s in range(0, max(t.num_rows, 1), step):
            lt = t.slice(s, step)
            n = lt.num_rows
            li = np.repeat(np.arange(n, dtype=np.int64), m)
            ri = np.tile(np.arange(m, dtype=np.int64), n)
            comb = lt.take(li)
            for k, col in zip(rt.column_names, rt.columns):
                comb = comb.append_column(k, col.take(ri))
            out.append(comb)
        return pa.concat_tables(out)

    return left_ds.map_batches(fn, batch_format="pyarrow")


def _match_range_on(residual, side_of, ja):
    """Pattern-match a non-equi ON for the interval-join lowering:
    returns (probe=(alias,col), lo=(alias,col), hi=(alias,col)) where
    lo/hi live on ONE table and the probe on the other, one of them
    being ``ja`` — from either a single BETWEEN conjunct or a
    lower+upper inequality pair over the same probe column.  Strict
    bounds still match (the lowering co-locates the INCLUSIVE superset;
    the original conjuncts re-filter post-join).  None when the shape
    is absent."""
    def col_side(node):
        try:
            return side_of(node)
        except ValueError:
            return None

    # single BETWEEN: X BETWEEN lo AND hi
    for c in residual:
        if c[0] != "between":
            continue
        x, lo, hi = col_side(c[1]), col_side(c[2]), col_side(c[3])
        if None in (x, lo, hi) or lo[0] != hi[0] or x[0] == lo[0]:
            continue
        if ja in (x[0], lo[0]):
            return x, lo, hi
    # lower + upper inequality pair over the same probe column
    lowers, uppers = {}, {}
    for c in residual:
        if c[0] not in ("ge", "gt", "le", "lt"):
            continue
        a, b = col_side(c[1]), col_side(c[2])
        if a is None or b is None or a[0] == b[0]:
            continue
        # normalize to bound <= probe (lower) / probe <= bound (upper)
        if c[0] in ("ge", "gt"):  # a >= b: b is a lower bound of a
            lowers.setdefault(a, b)
            uppers.setdefault(b, a)
        else:  # a <= b
            uppers.setdefault(a, b)
            lowers.setdefault(b, a)
    for probe, lo in lowers.items():
        hi = uppers.get(probe)
        if hi is None or lo[0] != hi[0] or probe[0] == lo[0]:
            continue
        if ja in (probe[0], lo[0]):
            return probe, lo, hi
    return None


def _interval_band_of(interval_ds, lo: str, hi: str) -> int:
    """Auto band width for the interval-join fallback: one tiny
    per-block partial pass (3 int64 ticks per block, driver-reduced)
    gives max interval width and global span; band =
    max(max_width, span/4096, 1) bounds replication at 2 bands per
    interval and the band count at ~4096."""
    def part(t: pa.Table) -> pa.Table:
        def ticks(col):
            a = col.to_numpy(zero_copy_only=False)
            return a.view("i8") if a.dtype.kind in "mM" else a

        v = pc.and_(pc.is_valid(t.column(lo)), pc.is_valid(t.column(hi)))
        t = t.filter(v)
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        a, b = ticks(t.column(lo)), ticks(t.column(hi))
        return pa.table({"mn": pa.array([int(a.min())], pa.int64()),
                         "mx": pa.array([int(b.max())], pa.int64()),
                         "w": pa.array([int((b - a).max())], pa.int64())})

    parts = interval_ds.map_batches(part, batch_format="pyarrow").take_all()
    if not parts:
        return 1
    span = max(p["mx"] for p in parts) - min(p["mn"] for p in parts)
    max_w = max(p["w"] for p in parts)
    return max(int(max_w), int(span // 4096), 1)


def _range_lowerable(tys) -> bool:
    """The interval lowering bands raw int64 ticks, so probe/lo/hi
    must share ONE tick space: all three types IDENTICAL and in the
    supported set (integers, tz-naive timestamps, dates — time32/64
    arrive as Python time objects and mixed units would band into
    incomparable spaces, silently dropping matches)."""
    t0 = tys[0]
    if not all(t.equals(t0) for t in tys[1:]):
        return False
    if pa.types.is_integer(t0) or pa.types.is_date(t0):
        return True
    return pa.types.is_timestamp(t0) and t0.tz is None


def _run_join_agg(plan, tables, num_partitions: int):
    """JOIN chain + GROUP-BY/aggregate lowering (ogr_gensql.cpp
    analog).  Single-table WHERE conjuncts push below the join (never
    below the null-filling side of a LEFT JOIN); aggregation lowers
    onto relational.grouped_aggregate's partial-then-shuffle plan."""
    from . import relational as R

    items = plan["items"]
    aliases = [(plan["table_alias"], plan["table"])] + [
        (j["alias"], j["table"]) for j in plan["joins"]
    ]
    if len({a for a, _ in aliases}) != len(aliases):
        raise ValueError("duplicate table alias in FROM")
    for _, tbl in aliases:
        if tbl not in tables:
            raise ValueError(f"unknown table {tbl}")
    schemas = {a: list(tables[t].schema().names) for a, t in aliases}
    stypes = {
        a: dict(zip(tables[t].schema().names, tables[t].schema().types))
        for a, t in aliases
    }
    no_push = {
        j["alias"] for j in plan["joins"] if j["how"] == "left_outer"
    }

    # ---- WHERE pushdown: single-table conjuncts filter pre-shuffle
    conjuncts = _split_conjuncts(plan["where"]) if plan["where"] else []
    pushed: dict[str, list] = {a: [] for a, _ in aliases}
    post_where = []
    for c in conjuncts:
        if _has_agg(c):
            raise ValueError("aggregates are not allowed in WHERE")
        try:
            refs = _refs(c, schemas, aliases)
        except ValueError:
            refs = None
        if refs is not None and len(refs) == 1 and not (refs & no_push):
            pushed[next(iter(refs))].append(c)
        else:
            post_where.append(c)

    def _to_source(node):
        # resolve refs to source-table column names (pre-join)
        def fn(n):
            if n[0] == "qcol":
                return ("col", n[2])
            return n

        return _transform(node, fn)

    def _prefilter(ds, preds):
        if not preds:
            return ds
        exprs = [_to_source(p) for p in preds]

        def f(t: pa.Table) -> pa.Table:
            for e in exprs:
                t = t.filter(pc.cast(_eval(e, t), pa.bool_()))
            return t

        return ds.map_batches(f, batch_format="pyarrow")

    src = {a: _prefilter(tables[t], pushed[a]) for a, t in aliases}

    # ---- join chain; outname maps (alias, col) -> joined column name
    base = plan["table_alias"]
    outname = {(base, c): c for c in schemas[base]}
    cur = set(schemas[base])
    cur_schema = [(c, stypes[base][c]) for c in schemas[base]]
    display: list[tuple[str, str]] = [(c, c) for c in schemas[base]]

    def _side(node):
        if node[0] == "qcol":
            return node[1], node[2]
        if node[0] == "col":
            return _owner_of(node[1], schemas, aliases), node[1]
        raise ValueError("JOIN ON sides must be column references")

    ds = src[base]
    deferred_on: list = []  # non-equi / extra ON conjuncts (inner only)
    for i, j in enumerate(plan["joins"]):
        ja, suf = j["alias"], f"_j{i}"
        equi = None
        residual = []
        for c in (_split_conjuncts(j["on"]) if j["on"] is not None else []):
            if equi is None and c[0] == "eq":
                try:
                    t1, t2 = _side(c[1]), _side(c[2])
                except ValueError:
                    t1 = t2 = None
                if t1 is not None and (t1[0] == ja) != (t2[0] == ja):
                    equi = (t1, t2)
                    continue
            residual.append(c)
        if equi is None:
            # CROSS JOIN / pure non-equi ON: interval-join lowering
            # when the ON carries a range predicate (scales past the
            # broadcast cap), else broadcast nested-loop.
            if j["how"] == "left_outer":
                raise ValueError(
                    f"LEFT JOIN {ja} ON needs at least one column "
                    "equality relating it to an earlier table"
                )
            deferred_on.extend(residual)
            renames = {}
            for c in schemas[ja]:
                nm = c if c not in cur else c + suf
                renames[c] = nm
                outname[(ja, c)] = nm
                cur.add(nm)
                cur_schema.append((nm, stypes[ja][c]))
                display.append((nm, nm))
            rng = _match_range_on(residual, _side, ja)
            if rng is not None:
                pr, rlo, rhi = rng
                earlier = (pr,) if rlo[0] == ja else (rlo, rhi)
                ok_ty = _range_lowerable(
                    [stypes[a][c] for a, c in (pr, rlo, rhi)]
                ) and all(k in outname for k in earlier)
            if rng is not None and ok_ty:
                # inclusive superset co-location; the original
                # conjuncts (already in deferred_on) re-filter exactly
                if rlo[0] == ja:  # probe on the earlier chain
                    # src[ja] is consumed twice (band estimation + the
                    # join itself) — materialize once, mirroring the
                    # swapped orientation below
                    ja_ds = src[ja].materialize()
                    band = _interval_band_of(ja_ds, rlo[1], rhi[1])
                    ds = R.interval_join(
                        ds, ja_ds, on=outname[pr], by=None,
                        lo=rlo[1], hi=rhi[1], band=band,
                        right_suffix=suf, num_partitions=num_partitions,
                    )
                else:  # probe on ja; intervals on the earlier chain
                    ren_ja = src[ja].map_batches(
                        lambda t, _r=renames: t.rename_columns(
                            [_r[c] for c in t.column_names]),
                        batch_format="pyarrow",
                    )
                    # the chain is consumed twice (band estimation +
                    # the join itself) — materialize once
                    ds = ds.materialize()
                    band = _interval_band_of(
                        ds, outname[rlo], outname[rhi])
                    ds = R.interval_join(
                        ren_ja, ds, on=renames[pr[1]], by=None,
                        lo=outname[rlo], hi=outname[rhi], band=band,
                        right_suffix=suf, num_partitions=num_partitions,
                    )
                continue
            ds = _nl_join(ds, src[ja], list(schemas[ja]), renames,
                          [(c, stypes[ja][c]) for c in schemas[ja]])
            continue
        if residual and j["how"] == "left_outer":
            raise ValueError(
                "extra ON conditions on a LEFT JOIN are not supported "
                "(they alter match semantics; move them to WHERE for "
                "filter semantics)"
            )
        # residual inner-join ON conjuncts commute with the rest of
        # the chain: apply them with the post-join WHERE filters
        deferred_on.extend(residual)
        s1, s2 = equi
        if s1[0] == ja and s2[0] != ja:
            (la, lc), rk = s2, s1[1]
        elif s2[0] == ja and s1[0] != ja:
            (la, lc), rk = s1, s2[1]
        else:
            raise ValueError(
                f"JOIN ON must relate {ja} to an earlier table"
            )
        if (la, lc) not in outname:
            raise ValueError(f"unknown join key {la}.{lc}")
        rk_dup = f"__rk{i}"

        def dup(t: pa.Table, _rk=rk, _nm=rk_dup) -> pa.Table:
            return t.append_column(_nm, t.column(_rk))  # zero-copy

        right = src[ja].map_batches(dup, batch_format="pyarrow")
        right_schema = [(c, stypes[ja][c]) for c in schemas[ja]] + [
            (rk_dup, stypes[ja][rk])
        ]
        ds = R.copartition_equi_join(
            ds,
            right,
            lkey=outname[(la, lc)],
            rkey=rk,
            how=j["how"],
            num_partitions=num_partitions,
            right_suffix=suf,
            left_schema=cur_schema,
            right_schema=right_schema,
        )
        for c in schemas[ja]:
            if c == rk:
                outname[(ja, c)] = rk_dup
                cur.add(rk_dup)
                cur_schema.append((rk_dup, stypes[ja][c]))
                display.append((rk_dup, c if c not in {d for _, d in display} else c + suf))
            else:
                nm = c if c not in cur else c + suf
                outname[(ja, c)] = nm
                cur.add(nm)
                cur_schema.append((nm, stypes[ja][c]))
                display.append((nm, nm))

    def _resolve(node):
        def fn(n):
            if n[0] == "qcol":
                if (n[1], n[2]) not in outname:
                    raise ValueError(f"unknown column {n[1]}.{n[2]}")
                return ("col", outname[(n[1], n[2])])
            if n[0] == "col":
                owner = _owner_of(n[1], schemas, aliases)
                return ("col", outname[(owner, n[1])])
            return n

        return _transform(node, fn)

    post_where = deferred_on + post_where
    if post_where:
        exprs = [_resolve(p) for p in post_where]

        def post_f(t: pa.Table) -> pa.Table:
            for e in exprs:
                t = t.filter(pc.cast(_eval(e, t), pa.bool_()))
            return t

        ds = ds.map_batches(post_f, batch_format="pyarrow")

    # ---- aggregation
    having = plan.get("having")
    has_agg = plan["group"] or having is not None or (
        items is not None and any(_has_agg(e) for e, _ in items)
    )
    if has_agg:
        if items is None:
            raise ValueError("SELECT * is not valid with GROUP BY")
        keys = []
        for g in plan["group"]:
            r = _resolve(g)
            keys.append(r[1])
        # collect distinct aggregate nodes from the select items AND
        # the HAVING predicate (ogr_gensql.cpp evaluates HAVING over
        # the summary table, so its aggregates share the same pass)
        agg_nodes: list = []
        agg_sources = [e for e, _ in items]
        if having is not None:
            agg_sources.append(having)
        for e in agg_sources:
            for n in _walk(e):
                if n[0] == "agg" and n not in agg_nodes:
                    agg_nodes.append(n)
        specs, pre_cols = [], {}
        distinct_ais: list[tuple[int, str]] = []
        for ai, n in enumerate(agg_nodes):
            _, fn, arg, distinct = n
            out_c = f"__agg{ai}"
            if distinct and fn in ("min", "max"):
                distinct = False  # MIN/MAX(DISTINCT x) == MIN/MAX(x)
            if distinct:
                # COUNT/SUM/AVG(DISTINCT): lowered separately —
                # distinct of (keys, arg), then a per-key aggregate
                # over the distinct set, joined back onto the summary
                # (SUM/AVG results are double, matching the swq
                # summary's double accumulators, ogr/ogr_swq.h)
                pre_cols[f"__in{ai}"] = ("expr", _resolve(arg))
                distinct_ais.append((ai, fn))
            elif fn == "count" and arg is None:
                specs.append(("*", "count", out_c))
            elif fn == "count":
                pre_cols[f"__in{ai}"] = (
                    "cast_valid", _resolve(arg)
                )
                specs.append((f"__in{ai}", "sum", out_c))
            else:
                pre_cols[f"__in{ai}"] = ("expr", _resolve(arg))
                specs.append(
                    (f"__in{ai}", {"avg": "mean"}.get(fn, fn), out_c)
                )

        # keyless COUNT(DISTINCT) still needs a join key: inject a
        # constant group and let the post-projection drop it
        use_keys = keys or (["__g"] if distinct_ais else [])
        inject_g = bool(distinct_ais) and not keys

        def pre(t: pa.Table) -> pa.Table:
            cols = {k: t.column(k) for k in keys}
            if inject_g:
                cols["__g"] = pa.array(
                    np.zeros(t.num_rows, np.int64), pa.int64()
                )
            for name, (kind, e) in pre_cols.items():
                v = _eval(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * t.num_rows, type=v.type)
                if kind == "cast_valid":
                    v = pc.cast(pc.is_valid(v), pa.int64())
                cols[name] = v
            if not cols:
                # COUNT(*)-only summary: a zero-column pa.table would
                # report zero rows — keep the count with a stub column
                cols["__cnt_stub"] = pa.array(
                    np.zeros(t.num_rows, np.int8)
                )
            return pa.table(cols)

        pre_ds = ds.map_batches(pre, batch_format="pyarrow")
        if specs:
            agg_ds = (
                R.grouped_aggregate(pre_ds, use_keys, specs)
                if use_keys
                else R.global_aggregate(pre_ds, specs)
            )
        else:
            # only COUNT(DISTINCT) aggregates: the summary rows are
            # just the distinct keys
            agg_ds = R.distinct(pre_ds, use_keys)

        def _with_jk(t: pa.Table) -> pa.Table:
            # injective composite join key over the group columns
            # (length-prefixed string encoding); Dataset.join's native
            # hash shuffle loses empty-partition schemas, so the attach
            # below rides the sparse-domain-robust copartition join
            parts = []
            for k in use_keys:
                s = pc.fill_null(pc.cast(t.column(k), pa.string()), "\x00")
                parts.append(
                    pc.binary_join_element_wise(
                        pc.cast(pc.utf8_length(s), pa.string()), s, ":"
                    )
                )
            jk = parts[0]
            for p in parts[1:]:
                jk = pc.binary_join_element_wise(jk, p, ";")
            return t.append_column("__jk", jk)

        for ai, dfn in distinct_ais:
            in_c = f"__in{ai}"

            def dpart(t: pa.Table, _c=in_c) -> pa.Table:
                t = t.filter(pc.is_valid(t.column(_c)))
                return _with_jk(t).select(["__jk", _c])

            dd = R.distinct(
                pre_ds.map_batches(dpart, batch_format="pyarrow"),
                ["__jk", in_c],
            )
            if dfn == "count":
                spec = ("*", "count", f"__agg{ai}")
                out_ty = pa.int64()
            else:
                # cast AFTER distinct so the distinct set is taken over
                # the original values, not their float images
                def dcast(t: pa.Table, _c=in_c) -> pa.Table:
                    return t.set_column(
                        t.column_names.index(_c), _c,
                        pc.cast(t.column(_c), pa.float64()),
                    )

                dd = dd.map_batches(dcast, batch_format="pyarrow")
                spec = (in_c, "sum" if dfn == "sum" else "mean",
                        f"__agg{ai}")
                out_ty = pa.float64()
            dcnt = R.grouped_aggregate(dd, ["__jk"], [spec])
            agg_ds = R.copartition_equi_join(
                agg_ds.map_batches(_with_jk, batch_format="pyarrow"),
                dcnt,
                "__jk", "__jk", how="left_outer",
                num_partitions=max(2, num_partitions // 4),
                right_schema=[("__jk", pa.string()),
                              (f"__agg{ai}", out_ty)],
            ).drop_columns(["__jk"])

        count_ais = [ai for ai, f in distinct_ais if f == "count"]
        if count_ais:
            fill_cols = [f"__agg{ai}" for ai in count_ais]

            def fill0(t: pa.Table) -> pa.Table:
                # an all-NULL group has no distinct rows but reports 0
                for c in fill_cols:
                    t = t.set_column(
                        t.column_names.index(c), c,
                        pc.fill_null(pc.cast(t.column(c), pa.int64()), 0),
                    )
                return t

            agg_ds = agg_ds.map_batches(fill0, batch_format="pyarrow")

        def sub(n, _nodes=agg_nodes):
            if n[0] == "agg":
                return ("col", f"__agg{_nodes.index(n)}")
            return n

        if having is not None:
            hav = _transform(_resolve_skip_aggs(having, _resolve), sub)

            def hfilter(t: pa.Table) -> pa.Table:
                return t.filter(pc.cast(_eval(hav, t), pa.bool_()))

            agg_ds = agg_ds.map_batches(hfilter, batch_format="pyarrow")

        # post-projection over the aggregated table
        rewritten = []
        for idx, (e, alias) in enumerate(items):
            re_e = _transform(_resolve_skip_aggs(e, _resolve), sub)
            rewritten.append((re_e, _out_name(e, alias, idx)))

        def post(t: pa.Table) -> pa.Table:
            cols = {}
            for e, name in rewritten:
                v = _eval(e, t)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * t.num_rows, type=v.type)
                cols[name] = v
            return pa.table(cols)

        out = agg_ds.map_batches(post, batch_format="pyarrow")
        out_names = [name for _, name in rewritten]
    else:
        if items is None:
            sel = [(a, d) for a, d in display]

            def star(t: pa.Table) -> pa.Table:
                return pa.table({d: t.column(a) for a, d in sel})

            out = ds.map_batches(star, batch_format="pyarrow")
            out_names = [d for _, d in sel]
        else:
            rewritten = [
                (_resolve(e), _out_name(e, alias, idx))
                for idx, (e, alias) in enumerate(items)
            ]

            def proj(t: pa.Table) -> pa.Table:
                cols = {}
                for e, name in rewritten:
                    v = _eval(e, t)
                    if isinstance(v, pa.Scalar):
                        v = pa.array([v.as_py()] * t.num_rows, type=v.type)
                    cols[name] = v
                return pa.table(cols)

            out = ds.map_batches(proj, batch_format="pyarrow")
            out_names = [name for _, name in rewritten]

    if plan.get("distinct"):
        out = R.distinct(out, list(out_names))
    if plan["order"]:
        for c, _ in plan["order"]:
            if c not in out_names:
                raise ValueError(
                    f"ORDER BY {c} must reference an output column here"
                )
        keys_o = [c for c, _ in plan["order"]]
        desc = [d for _, d in plan["order"]]
        off = plan.get("offset") or 0
        if plan["limit"] is not None:
            out = R.order_by_limit(out, keys_o, descending=desc,
                                   limit=plan["limit"] + off)
            return _skip_prefix(out, off) if off else out
        if off:
            _require_offset_shape(plan["order"], plan["limit"])
        return out.sort(keys_o, descending=desc)
    if plan.get("offset"):
        _require_offset_shape(plan["order"], plan["limit"])
    if plan["limit"] is not None:
        return out.limit(plan["limit"])
    return out


def _resolve_skip_aggs(node, resolve):
    """Resolve col refs OUTSIDE agg nodes only (agg args were resolved
    into the pre-projection; the agg node itself becomes a column)."""
    if node[0] in ("agg", "subq", "exists", "win"):
        return node
    if node[0] in ("lit", "col", "qcol"):
        return resolve(node)
    if node[0] == "in_subq":
        return ("in_subq", _resolve_skip_aggs(node[1], resolve), node[2])
    if node[0] == "in":
        return ("in", _resolve_skip_aggs(node[1], resolve),
                [_resolve_skip_aggs(v, resolve) for v in node[2]])
    if node[0] == "concat":
        return ("concat", [_resolve_skip_aggs(a, resolve) for a in node[1]])
    if node[0] == "substr":
        return ("substr", _resolve_skip_aggs(node[1], resolve),
                _resolve_skip_aggs(node[2], resolve),
                None if node[3] is None
                else _resolve_skip_aggs(node[3], resolve))
    if node[0] == "cast":
        return ("cast", _resolve_skip_aggs(node[1], resolve), node[2])
    return (node[0], *(_resolve_skip_aggs(c, resolve) for c in node[1:]))


def _build_scope(plan, tables):
    """Name resolution across the FROM/JOIN chain: returns
    (aliases, schemas, outname) where outname maps (alias, col) to the
    column name in the joined output (Dataset.join drops the right key
    and suffixes collisions)."""
    aliases = [(plan["table_alias"], plan["table"])] + [
        (j["alias"], j["table"]) for j in plan["joins"]
    ]
    for alias, tbl in aliases:
        if tbl not in tables:
            raise ValueError(f"unknown table {tbl}")
    schemas = {a: list(tables[t].schema().names) for a, t in aliases}
    outname: dict[tuple[str, str], str] = {}
    cur: set[str] = set()
    base = plan["table_alias"]
    for c in schemas[base]:
        outname[(base, c)] = c
        cur.add(c)
    for i, j in enumerate(plan["joins"]):
        suf = f"_j{i}"
        for c in schemas[j["alias"]]:
            nm = c if c not in cur else c + suf
            outname[(j["alias"], c)] = nm
            cur.add(nm)
    return aliases, schemas, outname


def _owner_of(col, schemas, aliases):
    owners = [a for a, _ in aliases if col in schemas[a]]
    if not owners:
        raise ValueError(f"unknown column {col}")
    if len(owners) > 1:
        raise ValueError(f"ambiguous column {col} (in {owners})")
    return owners[0]


def _refs(node, schemas, aliases):
    """Aliases referenced by an expression (bare cols resolved by
    unique ownership)."""
    out = set()
    for n in _walk(node):
        if n[0] == "qcol":
            out.add(n[1])
        elif n[0] == "col":
            out.add(_owner_of(n[1], schemas, aliases))
    return out


# ------------------------------------------------ subquery lowering


def _scalar_of(subplan: dict, tables: dict, num_partitions: int):
    """Execute a scalar subquery; must yield exactly one row and one
    column.  The single value is substituted as a literal — a tiny,
    fully-aggregated result, so the driver-side take is bounded."""
    out = _exec_plan(subplan, tables, num_partitions)
    rows = out.take(2)
    if len(rows) != 1 or len(rows[0]) != 1:
        raise ValueError(
            "scalar subquery must return exactly one row and one column"
        )
    return next(iter(rows[0].values()))


def _empty_like(ds):
    """A one-block zero-row Dataset with ``ds``'s schema.  Used by the
    boolean gates (uncorrelated EXISTS, NOT IN with NULLs): plain
    ``limit(0)`` / per-batch zero-slices leave downstream schema
    inference with nothing to sample, so the result would report a
    None schema."""
    import ray.data as rd

    sch = ds.schema()
    fields = [
        (n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
        for n, t in zip(sch.names, sch.types)
    ]
    return rd.from_arrow(pa.schema(fields).empty_table())


def _composite_key(t: pa.Table, exprs: list) -> pa.Array:
    """Exact single-column join key from N expressions: a single key
    evaluates as-is; multiple keys encode injectively as
    length-prefixed string segments (``<len>:<value>;...``), NULL when
    ANY component is NULL (SQL equality with NULL never matches, and a
    NULL key never joins)."""
    vals = []
    for e in exprs:
        v = _eval(e, t)
        if isinstance(v, pa.Scalar):
            v = pa.array([v.as_py()] * t.num_rows, type=v.type)
        vals.append(v)
    if len(vals) == 1:
        return vals[0]
    anynull = pc.is_null(vals[0])
    parts = []
    for v in vals:
        anynull = pc.or_(anynull, pc.is_null(v))
        s = pc.fill_null(_canon_str(v), "")
        parts.append(pc.cast(pc.utf8_length(s), pa.string()))
        parts.append(pa.array([":"] * t.num_rows, pa.string()))
        parts.append(s)
        parts.append(pa.array([";"] * t.num_rows, pa.string()))
    joined = pc.binary_join_element_wise(*parts, "")
    return pc.if_else(anynull, pa.scalar(None, pa.string()), joined)


def _canon_str(v) -> "pa.Array":
    """Canonical text of a column, NULLs preserved: integral
    in-int64-range floats render as integers and -0.0 -> 0 so numeric
    equality across types matches SQL (shared by the composite join
    key and the set-op row key)."""
    if pa.types.is_floating(v.type) or pa.types.is_decimal(v.type):
        f = pc.add(pc.cast(v, pa.float64()), 0.0)  # -0.0 -> 0.0
        is_int = pc.and_(
            pc.equal(pc.floor(f), f),
            pc.and_(pc.greater(f, -9.2e18), pc.less(f, 9.2e18)),
        )
        is_int = pc.fill_null(is_int, False)
        as_int = pc.cast(
            pc.cast(pc.if_else(is_int, f, 0.0), pa.int64()),
            pa.string(),
        )
        return pc.if_else(is_int, as_int, pc.cast(f, pa.string()))
    return pc.cast(v, pa.string())


def _setop_key(t: pa.Table) -> "pa.Array":
    """Injective NULL-safe row encoding over ALL columns in positional
    order — SQL set operations (INTERSECT/EXCEPT) compare rows with
    NULLs EQUAL, unlike join equality, so NULL encodes as its own
    token ("N;") distinct from every value encoding ("<len>:<text>;")."""
    parts = []
    n = t.num_rows
    for name in t.column_names:
        s = _canon_str(t.column(name))
        enc = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(s), pa.string()),
            pa.array([":"] * n, pa.string()),
            s,
            pa.array([";"] * n, pa.string()),
            "",
        )
        parts.append(pc.fill_null(enc, "N;"))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def _corr_split(subplan: dict, tables: dict, outer_aliases: set,
                outer_cols: set):
    """Detect correlation of a subquery plan against the outer scope.
    Returns None when the subquery is self-contained, else
    ``(inner_key_nodes, outer_key_nodes, rest_where)`` where the
    correlation is one or more WHERE conjuncts ``inner = outer``
    (paired positionally in the two lists) and ``rest_where`` is the
    AND-fold of the remaining (inner-only) conjuncts.  Non-equality
    correlation raises."""
    sub_aliases = {subplan["table_alias"]} | {
        j["alias"] for j in subplan["joins"]
    }
    sub_cols: set = set()
    for tbl in [subplan["table"]] + [j["table"] for j in subplan["joins"]]:
        if tbl in tables:
            sub_cols.update(tables[tbl].schema().names)

    def side(n):
        if n[0] == "qcol":
            if n[1] in sub_aliases:
                return "sub"
            if n[1] in outer_aliases:
                return "outer"
            raise ValueError(f"unknown table alias {n[1]!r} in subquery")
        if n[0] == "col":
            # inner scope shadows outer (standard SQL name resolution)
            if n[1] in sub_cols:
                return "sub"
            if n[1] in outer_cols:
                return "outer"
            raise ValueError(f"unknown column {n[1]!r} in subquery")
        return None

    where = subplan.get("where")
    if where is None:
        return None
    inner_keys, outer_keys = [], []
    rest = []
    for c in _split_conjuncts(where):
        refs_outer = any(
            side(n) == "outer"
            for n in _walk(c)
            if n[0] in ("col", "qcol")
        )
        if not refs_outer:
            rest.append(c)
            continue
        if c[0] != "eq":
            raise ValueError(
                "correlated subquery predicates must be "
                "inner_col = outer_col equalities"
            )
        sa, sb = side(c[1]), side(c[2])
        if {sa, sb} != {"sub", "outer"}:
            raise ValueError(
                "correlated equality must compare an inner column with "
                "an outer column"
            )
        ik, ok = (c[1], c[2]) if sa == "sub" else (c[2], c[1])
        inner_keys.append(ik)
        outer_keys.append(ok)
    if not inner_keys:
        return None
    rest_where = None
    for c in rest:
        rest_where = c if rest_where is None else ("and", rest_where, c)
    return inner_keys, outer_keys, rest_where


def _lower_subqueries(plan: dict, tables: dict, num_partitions: int):
    """Rewrite subqueries out of a plan before execution (an engine
    extension — the reference swq dialect has no subqueries):

    - scalar ``(SELECT agg FROM ...)`` anywhere in SELECT items, WHERE
      or HAVING becomes a literal (executed once, one value);
    - CORRELATED scalar ``(SELECT agg(x) FROM t2 WHERE t2.k = outer.k
      [AND inner-only predicates])`` decorrelates to a distributed
      grouped aggregate over t2 plus ONE co-partitioned left-outer
      join back onto the outer table (a bare COUNT fills its no-match
      NULLs with 0, per SQL semantics; other aggregates stay NULL);
    - ``[NOT] IN (SELECT col FROM ...)`` and ``[NOT] EXISTS (SELECT
      ... WHERE inner = outer)`` as top-level WHERE conjuncts of a
      single-table plan lower onto co-partitioned semi/anti joins
      (never a driver-side value list — the subquery result may be
      arbitrarily large); elsewhere they raise.  NOT IN keeps the
      three-valued NULL semantics; [NOT] EXISTS is plain equality
      matching (NULL keys never match), exactly SQL's.

    Returns (plan, tables) — the table map gains a ``__subq_base``
    binding when a lowering replaced the base table."""
    from . import relational as R

    outer_alias = plan["table_alias"]
    outer_aliases = {outer_alias} | {j["alias"] for j in plan["joins"]}
    outer_cols: set = set()
    for tbl in [plan["table"]] + [j["table"] for j in plan["joins"]]:
        if tbl in tables:
            outer_cols.update(tables[tbl].schema().names)
    corr_base = [None]  # boxed: the attach-rewritten base dataset
    attach_i = [0]

    def _attach_corr(sub: dict, corr) -> tuple:
        """Decorrelate one scalar subquery: grouped aggregate keyed by
        the inner column + left-outer join onto the (single-table)
        outer; returns the replacement column-ref node."""
        if plan["joins"]:
            raise ValueError(
                "correlated subquery on a JOIN outer query is not "
                "supported"
            )
        inner_keys, outer_keys, rest_where = corr
        s_items = sub["items"]
        if (s_items is None or len(s_items) != 1
                or not _has_agg(s_items[0][0])):
            raise ValueError(
                "correlated scalar subquery must select exactly one "
                "aggregate expression"
            )
        if (sub["group"] or sub["order"] or sub["limit"] is not None
                or sub.get("distinct") or sub.get("having") is not None):
            raise ValueError(
                "correlated scalar subquery supports a plain aggregate "
                "over WHERE only"
            )
        i = attach_i[0]
        attach_i[0] += 1
        ckey, cval, okey = f"__ck{i}", f"__cv{i}", f"__ok{i}"
        knames = [f"{ckey}_{j}" for j in range(len(inner_keys))]
        agg_expr = s_items[0][0]
        subplan2 = dict(
            sub,
            items=list(zip(inner_keys, knames)) + [(agg_expr, cval)],
            where=rest_where, group=list(inner_keys), having=None,
            order=[], limit=None, distinct=False, union_next=False,
        )
        sub_ds = _exec_plan(subplan2, tables, num_partitions)

        def pack_sub(t: pa.Table, _ks=knames, _ck=ckey,
                     _cv=cval) -> pa.Table:
            key = _composite_key(t, [("col", k) for k in _ks])
            return pa.table({_ck: key, _cv: t.column(_cv)})

        sub_ds = sub_ds.map_batches(pack_sub, batch_format="pyarrow")
        base = corr_base[0] if corr_base[0] is not None else tables[plan["table"]]

        def add_key(t: pa.Table, _es=outer_keys, _k=okey) -> pa.Table:
            return t.append_column(_k, _composite_key(t, list(_es)))

        joined = R.copartition_equi_join(
            base.map_batches(add_key, batch_format="pyarrow"),
            sub_ds, okey, ckey, how="left_outer",
            num_partitions=num_partitions,
        ).drop_columns([okey])
        if agg_expr[0] == "agg" and agg_expr[1] == "count":
            # COUNT over an empty correlated set is 0, not NULL
            def fill0(t: pa.Table, _c=cval) -> pa.Table:
                idx = t.schema.get_field_index(_c)
                return t.set_column(
                    idx, _c, pc.fill_null(t.column(_c), 0)
                )

            joined = joined.map_batches(fill0, batch_format="pyarrow")
        corr_base[0] = joined
        return ("col", cval)

    def scal(n):
        if n[0] == "subq":
            corr = _corr_split(n[1], tables, outer_aliases, outer_cols)
            if corr is not None:
                return _attach_corr(n[1], corr)
            return ("lit", _scalar_of(n[1], tables, num_partitions))
        return n

    items = plan["items"]
    if items is not None:
        items = [(_transform(e, scal), a) for e, a in items]
    where = plan["where"]
    if where is not None:
        where = _transform(where, scal)
    having = plan.get("having")
    if having is not None:
        having = _transform(having, scal)
    plan = dict(plan, items=items, where=where, having=having)
    if corr_base[0] is not None:
        tables = dict(tables)
        tables["__corr_base"] = corr_base[0]
        plan = dict(plan, table="__corr_base", table_alias=outer_alias)

    if where is None or not any(
        n[0] in ("in_subq", "exists") for n in _walk(where)
    ):
        return plan, tables

    # routing: each [NOT] IN / EXISTS conjunct applies its semi/anti
    # join to the ONE table that owns the probe expression, BEFORE the
    # main join (filtering a table below an inner join, or the left
    # side of a LEFT JOIN, commutes with the join; filtering the
    # null-filled right side of a LEFT JOIN does not -> raise)
    aliases_s, schemas_s, _ = _build_scope(plan, tables)
    left_right = {j["alias"] for j in plan["joins"]
                  if j["how"] == "left_outer"}

    def _probe_alias(expr) -> str:
        owners = _refs(expr, schemas_s, aliases_s)
        if len(owners) != 1:
            raise ValueError(
                "IN/EXISTS probe expression must reference exactly one "
                f"table (got {sorted(owners)})"
            )
        (a,) = owners
        if a in left_right:
            raise ValueError(
                "IN/EXISTS probe on the null-filled side of a LEFT "
                "JOIN is not supported (the filter would not commute "
                "with the join)"
            )
        return a

    alias_to_table = {plan["table_alias"]: plan["table"]}
    for j in plan["joins"]:
        alias_to_table[j["alias"]] = j["table"]
    tgt_ds: dict = {}  # alias -> rewritten dataset

    def _get_tgt(a: str):
        return tgt_ds.get(a, tables[alias_to_table[a]])

    conjs = _split_conjuncts(where)
    rest = []
    si = 0
    gate_empty = False
    for c in conjs:
        anti = c[0] == "not" and c[1][0] in ("in_subq", "exists")
        node = c[1] if anti else c
        if node[0] == "exists":
            sub = node[1]
            corr = _corr_split(sub, tables, outer_aliases, outer_cols)
            if corr is None:
                # uncorrelated EXISTS: one boolean gate for every row
                nonempty = (
                    _exec_plan(
                        dict(sub, order=[], limit=1),
                        tables, num_partitions,
                    ).limit(1).count() > 0
                )
                if nonempty == anti:
                    ba = plan["table_alias"]
                    tgt_ds[ba] = _empty_like(_get_tgt(ba))
                    gate_empty = True
                continue
            inner_keys, outer_keys, rest_where = corr
            if sub["group"] or sub.get("having") is not None:
                raise ValueError("EXISTS subquery with GROUP BY unsupported")
            i = si
            si += 1
            ekey, okey = f"__ek{i}", f"__eo{i}"
            knames = [f"{ekey}_{j}" for j in range(len(inner_keys))]
            subplan2 = dict(
                sub, items=list(zip(inner_keys, knames)),
                where=rest_where,
                group=[], having=None, order=[], limit=None,
                distinct=False, union_next=False,
            )
            sub_ds = _exec_plan(subplan2, tables, num_partitions)

            def pack_ekey(t: pa.Table, _ks=knames, _ek=ekey) -> pa.Table:
                key = _composite_key(t, [("col", k) for k in _ks])
                return pa.table({_ek: key})

            sub_ds = sub_ds.map_batches(pack_ekey, batch_format="pyarrow")

            def add_ekey(t: pa.Table, _es=outer_keys, _k=okey) -> pa.Table:
                return t.append_column(_k, _composite_key(t, list(_es)))

            if len(outer_keys) == 1:
                ta = _probe_alias(outer_keys[0])
            else:
                owners = set()
                for ok_ in outer_keys:
                    owners.add(_probe_alias(ok_))
                if len(owners) != 1:
                    raise ValueError(
                        "correlated EXISTS equalities must probe one "
                        f"outer table (got {sorted(owners)})"
                    )
                (ta,) = owners
            tgt_ds[ta] = R.copartition_equi_join(
                _get_tgt(ta).map_batches(add_ekey, batch_format="pyarrow"),
                sub_ds, okey, ekey,
                how="anti" if anti else "semi",
                num_partitions=num_partitions,
            ).drop_columns([okey])
            continue
        if node[0] != "in_subq":
            if any(n[0] in ("in_subq", "exists") for n in _walk(c)):
                raise ValueError(
                    "IN/EXISTS (SELECT ...) only supported as a "
                    "top-level WHERE conjunct"
                )
            rest.append(c)
            continue
        expr, subplan = node[1], node[2]
        ta = _probe_alias(expr)
        sub_ds = _exec_plan(subplan, tables, num_partitions)
        sub_names = sub_ds.schema().names
        if len(sub_names) != 1:
            raise ValueError("IN subquery must select exactly one column")
        vcol = sub_names[0]

        def prep(t: pa.Table, _v=vcol) -> pa.Table:
            col = t.column(_v)
            return pa.table({"__sqv": col.filter(pc.is_valid(col))})

        sub_vals = sub_ds.map_batches(prep, batch_format="pyarrow")
        if anti:
            # SQL three-valued logic: if the subquery result contains
            # any NULL, `x NOT IN (...)` is never TRUE -> empty result
            def nulls(t: pa.Table, _v=vcol) -> pa.Table:
                return pa.table(
                    {"n": pa.array([t.column(_v).null_count], pa.int64())}
                )

            if sub_ds.map_batches(nulls, batch_format="pyarrow").sum("n"):
                tgt_ds[ta] = _empty_like(_get_tgt(ta))
                gate_empty = True
                continue

        key = f"__sq{si}"
        si += 1

        def add_key(t: pa.Table, _e=expr, _k=key) -> pa.Table:
            v = _eval(_e, t)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * t.num_rows, type=v.type)
            return t.append_column(_k, v)

        keyed = _get_tgt(ta).map_batches(add_key, batch_format="pyarrow")
        if anti:
            # NULL probe values never satisfy NOT IN (NULL, not TRUE)
            def drop_null_key(t: pa.Table, _k=key) -> pa.Table:
                return t.filter(pc.is_valid(t.column(_k)))

            keyed = keyed.map_batches(drop_null_key, batch_format="pyarrow")
        tgt_ds[ta] = R.copartition_equi_join(
            keyed, sub_vals, key, "__sqv",
            how="anti" if anti else "semi",
            num_partitions=num_partitions,
        ).drop_columns([key])

    residual = None
    for c in rest:
        residual = c if residual is None else ("and", residual, c)
    tables = dict(tables)
    new_joins = [dict(j) for j in plan["joins"]]
    new_table = plan["table"]
    for a, dset in tgt_ds.items():
        name = f"__subq_{a}"
        tables[name] = dset
        if a == plan["table_alias"]:
            new_table = name
        else:
            for j in new_joins:
                if j["alias"] == a:
                    j["table"] = name
    plan = dict(plan, table=new_table, joins=new_joins, where=residual,
                gate_empty=gate_empty)
    return plan, tables


def _skip_prefix(out, offset: int):
    """Drop the first ``offset`` rows of an (already sorted, already
    LIMIT-bounded) Dataset.  The input is at most limit+offset rows by
    construction — OFFSET requires ORDER BY and LIMIT — so a local
    ordered concat is bounded and exact."""
    import ray.data as rd

    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return out
    tbl = pa.concat_tables(batches)
    return rd.from_arrow(tbl.slice(offset))


def _require_offset_shape(order, limit):
    raise ValueError(
        "OFFSET requires ORDER BY and LIMIT (a deterministic, bounded "
        "prefix; swq applies OFFSET to the layer's scan order, which "
        "is not stable across a distributed read)"
    )


def _setop_join(left, right, mode: str, num_partitions: int):
    """INTERSECT/EXCEPT tail: the (already distinct) left rows
    semi/anti-join the right branch on the NULL-safe positional row
    key — one co-partitioned shuffle, set semantics (NULLs equal)."""
    from . import relational as R

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("__sok", _setop_key(t))

    def key_only(t: pa.Table) -> pa.Table:
        return pa.table({"__sok_r": _setop_key(t)})

    keyed = left.map_batches(add_key, batch_format="pyarrow")
    rkeys = right.map_batches(key_only, batch_format="pyarrow")
    return R.copartition_equi_join(
        keyed, rkeys, "__sok", "__sok_r",
        how="semi" if mode == "intersect" else "anti",
        num_partitions=num_partitions,
    ).drop_columns(["__sok"])


def sql_query(sql: str, tables: dict, num_partitions: int = 16):
    """Execute a SELECT string against named Datasets.  Returns a
    Dataset; lazy/streaming except for the join / GROUP BY shuffles and
    the distributed ORDER BY/LIMIT tail."""
    from . import relational as R

    plan = parse_select(sql)
    if "union_all" in plan:
        branches = plan["union_all"]
        last = branches[-1]
        order, limit = last["order"], last["limit"]
        offset = last.get("offset") or 0
        last = dict(last, order=[], limit=None, offset=None)
        parts = [
            _exec_plan(b, tables, num_partitions)
            for b in branches[:-1] + [last]
        ]
        modes = plan["union_modes"]
        if "intersect" in modes and any(
            m in ("all", "distinct", "except") for m in modes
        ):
            # standard SQL binds INTERSECT tighter than UNION/EXCEPT;
            # this executor is left-associative, so a mixed chain would
            # silently mis-evaluate — parenthesize via a derived table
            raise ValueError(
                "mixing INTERSECT with UNION/EXCEPT in one chain is "
                "unsupported (INTERSECT has higher precedence; wrap a "
                "branch in FROM (SELECT ...) instead)"
            )
        if all(m == "all" for m in modes):
            out = parts[0].union(*parts[1:])
        else:
            # bare UNION dedups; UNION/EXCEPT are left-associative
            # (same precedence, per standard SQL); INTERSECT chains
            # are left-associative among themselves
            out = parts[0]
            names = None
            for m, p_ in zip(modes, parts[1:]):
                if m in ("all", "distinct"):
                    out = out.union(p_)
                    if m == "distinct":
                        if names is None:
                            names = out.schema().names
                        out = R.distinct(out, list(names))
                else:
                    if names is None:
                        names = out.schema().names
                    out = R.distinct(out, list(names))
                    out = _setop_join(out, p_, m, num_partitions)
        if order:
            keys = [c for c, _ in order]
            desc = [d for _, d in order]
            if limit is not None:
                out = R.order_by_limit(out, keys, descending=desc,
                                       limit=limit + offset)
                return _skip_prefix(out, offset) if offset else out
            if offset:
                _require_offset_shape(order, limit)
            return out.sort(keys, descending=desc)
        if offset:
            _require_offset_shape(order, limit)
        if limit is not None:
            return out.limit(limit)
        return out
    return _exec_plan(plan, tables, num_partitions)


def _col_hash(col) -> "np.ndarray":
    """Per-row uint64 hash of an Arrow column (splitmix finalizer for
    numerics, crc32 for everything else).  Used only to SCATTER window
    partitions across tasks — group identity inside a task is decided
    by exact dense ranks, so hash collisions merely co-locate groups."""
    import zlib

    ty = col.type
    if pa.types.is_integer(ty) or pa.types.is_boolean(ty):
        c = pc.cast(pc.fill_null(col, 0), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
    elif pa.types.is_floating(ty):
        c = pc.cast(pc.fill_null(col, 0.0), pa.float64()).to_numpy(
            zero_copy_only=False
        ).view(np.uint64).copy()
    else:
        vals = pc.cast(col, pa.string()).to_pylist()
        return np.array(
            [zlib.crc32(v.encode()) if v is not None else 0 for v in vals],
            np.uint64,
        )
    c = (c ^ (c >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return c ^ (c >> np.uint64(33))


def _merge_search(pid: "np.ndarray", val_d: "np.ndarray",
                  val_q: "np.ndarray", side: str) -> "np.ndarray":
    """Vectorized per-partition searchsorted: for each query value
    ``val_q[i]`` (belonging to partition ``pid[i]``) return the global
    insertion index into the partition-major sorted data sequence
    ``(pid, val_d)`` — i.e. the count of data rows in earlier
    partitions plus data rows in the same partition that sort before
    the query ('left': strictly less; 'right': less-or-equal).  One
    lexsort over the 2n merged elements instead of one
    np.searchsorted call per partition."""
    nd = len(val_d)
    pid_all = np.concatenate([pid, pid])
    val_all = np.concatenate([val_d, val_q])
    # 'left': queries sort BEFORE equal data values, 'right': after
    dtag = 1 if side == "left" else 0
    tag = np.concatenate([
        np.full(nd, dtag, np.int8),
        np.full(nd, 1 - dtag, np.int8),
    ])
    m = np.lexsort((tag, val_all, pid_all))
    isq = m >= nd
    excl = np.cumsum(~isq) - ~isq  # data rows strictly before each slot
    res = np.empty(nd, np.int64)
    res[m[isq] - nd] = excl[isq]
    return res


def _range_extrema(xm: "np.ndarray", lo: "np.ndarray", hi: "np.ndarray",
                   empty: "np.ndarray", want_max: bool) -> "np.ndarray":
    """NaN-skipping extremum of ``xm`` over per-row inclusive index
    windows ``[lo, hi]`` (``empty`` rows -> NaN): a doubling (sparse)
    table built only to the deepest level any window actually needs,
    then two overlapping power-of-two gathers per row.  O(n * log wmax)
    build, fully vectorized — typical moving-window frames have small
    wmax so only a few levels materialize."""
    n = len(xm)
    if n == 0:
        return xm.copy()
    red = np.fmax if want_max else np.fmin
    w = np.where(empty, 1, hi - lo + 1).astype(np.int64)
    # floor(log2(w)) exactly: frexp gives w = m * 2**e with m in [0.5,1)
    kq = (np.frexp(w.astype(np.float64))[1] - 1).astype(np.int64)
    kmax = int(kq.max())
    tables = [xm]
    for k in range(1, kmax + 1):
        h = 1 << (k - 1)
        prev = tables[-1]
        tables.append(
            red(prev[:-h], prev[h:]) if len(prev) > h else prev[:0]
        )
    out = np.full(n, np.nan)
    for k in range(kmax + 1):
        sel = (kq == k) & ~empty
        if not sel.any():
            continue
        tk = tables[k]
        out[sel] = red(tk[lo[sel]], tk[hi[sel] - (1 << k) + 1])
    return out


def _run_window(plan: dict, tables: dict, num_partitions: int):
    """Distributed window functions (engine extension; the swq dialect
    has none): ROW_NUMBER / RANK / DENSE_RANK () OVER (PARTITION BY k
    ORDER BY s [DESC]) and COUNT/SUM/AVG/MIN/MAX(x) OVER (PARTITION BY
    k) with the unbounded partition frame.

    Lowering: ONE hash shuffle on the shared PARTITION BY key
    (groupby on hash(key) % P so each task holds whole key groups,
    many groups per task), then fully vectorized per-partition
    compute: order-preserving dense ranks per column (pc.rank), one
    lexsort, run boundaries, reduceat for the aggregates — never one
    Python call per key group.  Numeric results: ranks/counts int64,
    SUM/AVG/MIN/MAX float64 (NULL where the partition has no valid
    input, per SQL)."""
    items, where = plan["items"], plan["where"]
    if plan["joins"] or plan["group"] or plan.get("having") is not None:
        raise ValueError(
            "window functions are supported on single-table SELECTs "
            "without GROUP BY (nest the grouped query if needed)"
        )
    if where is not None and any(n[0] == "win" for n in _walk(where)):
        raise ValueError("window functions are not allowed in WHERE")
    if plan["table"] not in tables:
        raise ValueError(f"unknown table {plan['table']}")
    ds = tables[plan["table"]]

    wins: list = []
    for e, _ in items:
        for n in _walk(e):
            if n[0] == "win" and n not in wins:
                wins.append(n)
    parts0 = wins[0][3]
    for wn in wins[1:]:
        if wn[3] != parts0:
            raise ValueError(
                "all window functions in one SELECT must share the same "
                "PARTITION BY (one shuffle per window set)"
            )

    key_cols = [f"__wk{j}" for j in range(len(parts0))]
    helper: dict = {}
    win_specs = []  # (fn, arg_col|None, [(order_col, desc)...], out_col)
    for i, wn in enumerate(wins):
        _, fn, arg, _parts, orders, param = wn
        argc = None
        if arg is not None:
            argc = f"__wa{i}"
            helper[argc] = arg
        ocs = []
        for j, (oe, od) in enumerate(orders):
            oc = f"__wo{i}_{j}"
            helper[oc] = oe
            ocs.append((oc, od))
        win_specs.append((fn, argc, ocs, f"__win{i}", param))

    def prep(t: pa.Table) -> pa.Table:
        if where is not None:
            t = t.filter(pc.cast(_eval(where, t), pa.bool_()))
        cols = {c: t.column(c) for c in t.schema.names}
        for name, e in list(zip(key_cols, parts0)) + list(helper.items()):
            v = _eval(e, t)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * t.num_rows, type=v.type)
            cols[name] = v
        out = pa.table(cols)
        h = np.zeros(out.num_rows, np.uint64)
        for kc in key_cols:
            h = h * np.uint64(1099511628211) ^ _col_hash(out.column(kc))
        return out.append_column(
            "__wpart",
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        )

    def win_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        gcodes = [
            pc.rank(g.column(kc), sort_keys="ascending",
                    null_placement="at_end", tiebreaker="dense")
            .to_numpy(zero_copy_only=False).astype(np.int64)
            for kc in key_cols
        ]
        outs = {}
        for fn, argc, ocs, outc, param in win_specs:
            keys = list(gcodes)
            for oc, od in ocs:
                keys.append(
                    pc.rank(g.column(oc),
                            sort_keys="descending" if od else "ascending",
                            null_placement="at_end", tiebreaker="dense")
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                )
            order = np.lexsort(tuple(reversed(keys)))
            pk = np.stack([k[order] for k in gcodes], axis=1)
            newpart = np.ones(n, bool)
            if n > 1:
                newpart[1:] = (pk[1:] != pk[:-1]).any(axis=1)
            idx = np.arange(n, dtype=np.int64)
            part_start = np.maximum.accumulate(np.where(newpart, idx, 0))
            if fn in ("lag", "lead", "first_value"):
                # typed gather over the sorted partition: src index per
                # row, out-of-partition -> null; preserves the arg type
                starts_n = np.flatnonzero(newpart)
                ends_n = np.concatenate([starts_n[1:] - 1, [n - 1]])
                pid_n = np.cumsum(newpart) - 1
                if fn == "first_value":
                    src = part_start
                    ok_src = np.ones(n, bool)
                else:
                    k = 1 if param is None else int(param)
                    src = idx - k if fn == "lag" else idx + k
                    ok_src = (src >= part_start) & (src <= ends_n[pid_n])
                arg_s = g.column(argc).combine_chunks().take(
                    pa.array(order)
                )
                gathered = arg_s.take(
                    pa.array(np.where(ok_src, src, 0), mask=~ok_src)
                )
                inv = np.empty(n, np.int64)
                inv[order] = np.arange(n, dtype=np.int64)
                outs[outc] = gathered.take(pa.array(inv))
                continue
            if fn == "ntile":
                nb = int(param)
                starts_n = np.flatnonzero(newpart)
                pid_n = np.cumsum(newpart) - 1
                sz = np.diff(np.concatenate([starts_n, [n]]))[pid_n]
                r = idx - part_start
                big = sz % nb
                size_big = sz // nb + 1
                cut = big * size_big
                small = np.maximum(sz // nb, 1)
                out_sorted = np.where(
                    r < cut,
                    r // size_big + 1,
                    big + (r - cut) // small + 1,
                ).astype(np.int64)
                res = np.empty(n, np.int64)
                res[order] = out_sorted
                outs[outc] = pa.array(res, type=pa.int64())
                continue
            if fn == "row_number":
                out_sorted = idx - part_start + 1
                arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
            elif fn in ("rank", "dense_rank"):
                ok = np.stack(
                    [k[order] for k in keys[len(gcodes):]], axis=1
                )
                newval = newpart.copy()
                if n > 1:
                    newval[1:] |= (ok[1:] != ok[:-1]).any(axis=1)
                if fn == "rank":
                    val_start = np.maximum.accumulate(
                        np.where(newval, idx, 0)
                    )
                    out_sorted = val_start - part_start + 1
                else:
                    inc = newval & ~newpart
                    cum = np.cumsum(inc)
                    out_sorted = cum - cum[part_start] + 1
                arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
            elif ocs and param is not None:  # explicit ROWS/RANGE frame
                mode, lo_off, hi_off = param
                pid = np.cumsum(newpart) - 1
                starts_n = np.flatnonzero(newpart)
                ends_n = np.concatenate([starts_n[1:] - 1, [n - 1]])
                pend = ends_n[pid]
                if argc is None:  # COUNT(*)
                    av = np.ones(n, np.float64)
                    valid = np.ones(n, bool)
                else:
                    a = g.column(argc)
                    av = pc.cast(a, pa.float64()).to_numpy(
                        zero_copy_only=False
                    )[order]
                    valid = pc.is_valid(a).to_numpy(
                        zero_copy_only=False
                    )[order]
                if mode == "rows":
                    lo = (
                        part_start
                        if lo_off is None
                        else np.maximum(idx + lo_off, part_start)
                    )
                    hi = (
                        pend
                        if hi_off is None
                        else np.minimum(idx + hi_off, pend)
                    )
                else:
                    # RANGE: value bounds over the single ORDER BY key.
                    # DuckDB-verified semantics: NULL order keys sort at
                    # the partition end and a bounded offset resolves to
                    # the NULL peer run's edge (start for a bounded
                    # start, partition end for a bounded end), while
                    # UNBOUNDED bounds stay positional; a bounded start
                    # past every non-null value lands on the first NULL
                    # row (so an unbounded end still reaches the NULLs).
                    oc0, od0 = ocs[0]
                    ocol = g.column(oc0)
                    ov = pc.cast(ocol, pa.float64()).to_numpy(
                        zero_copy_only=False
                    )[order]
                    onn = pc.is_valid(ocol).to_numpy(
                        zero_copy_only=False
                    )[order]
                    if od0:  # DESC: negate -> ascending formulas apply
                        ov = -ov
                    nncnt = np.add.reduceat(
                        onn.astype(np.int64), starts_n
                    )
                    nnstart_p = np.concatenate(
                        [[0], np.cumsum(nncnt)[:-1]]
                    )
                    first_null = part_start + nncnt[pid]
                    nn_idx = np.flatnonzero(onn)
                    pid_nn = pid[nn_idx]
                    v_nn = ov[nn_idx]
                    nn_hi_excl = (nnstart_p + nncnt)[pid_nn]
                    if lo_off is None:
                        lo = part_start.copy()
                    else:
                        lo = first_null.copy()  # NULL rows: peer run
                        if len(nn_idx):
                            cl = _merge_search(
                                pid_nn, v_nn, v_nn + lo_off, "left"
                            )
                            lo[nn_idx] = np.where(
                                cl < nn_hi_excl,
                                nn_idx[np.minimum(cl, len(nn_idx) - 1)],
                                first_null[nn_idx],
                            )
                    if hi_off is None:
                        hi = pend.copy()
                    else:
                        hi = pend.copy()  # NULL rows: run ends at pend
                        if len(nn_idx):
                            cr = _merge_search(
                                pid_nn, v_nn, v_nn + hi_off, "right"
                            )
                            hi[nn_idx] = np.where(
                                cr - 1 >= nnstart_p[pid_nn],
                                nn_idx[np.maximum(cr - 1, 0)],
                                part_start[nn_idx] - 1,  # empty frame
                            )
                empty = lo > hi
                lo_c = np.clip(lo, 0, n - 1)
                hi_c = np.clip(hi, 0, n - 1)
                if fn in ("count", "sum", "avg"):
                    x = np.where(valid, av, 0.0)
                    cum = np.cumsum(x)
                    cumc = np.cumsum(valid.astype(np.int64))
                    excl = cum - x       # prefix sum BEFORE each row
                    exclc = cumc - valid
                    rs = np.where(empty, 0.0, cum[hi_c] - excl[lo_c])
                    rc = np.where(
                        empty, 0, cumc[hi_c] - exclc[lo_c]
                    ).astype(np.int64)
                    if fn == "count":
                        out_sorted = rc
                        arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
                    else:
                        vals = rs if fn == "sum" else rs / np.maximum(rc, 1)
                        out_sorted = np.where(rc > 0, vals, np.nan)

                        def arr_of(r):
                            arr = pa.array(r, type=pa.float64())
                            return pc.if_else(
                                pc.is_nan(arr),
                                pa.scalar(None, pa.float64()), arr,
                            )
                else:  # moving min / max over arbitrary index windows
                    xm = np.where(valid, av, np.nan)
                    out_sorted = _range_extrema(
                        xm, lo_c, hi_c, empty, fn == "max"
                    )

                    def arr_of(r):
                        arr = pa.array(r, type=pa.float64())
                        return pc.if_else(
                            pc.is_nan(arr),
                            pa.scalar(None, pa.float64()), arr,
                        )
            elif ocs:  # running frame (RANGE UNBOUNDED..CURRENT + peers)
                import pandas as pd

                pid = np.cumsum(newpart) - 1
                ok = np.stack(
                    [k[order] for k in keys[len(gcodes):]], axis=1
                )
                newval = newpart.copy()
                if n > 1:
                    newval[1:] |= (ok[1:] != ok[:-1]).any(axis=1)
                peer = np.cumsum(newval) - 1
                if argc is None:  # COUNT(*)
                    av = np.ones(n, np.float64)
                    valid = np.ones(n, bool)
                else:
                    a = g.column(argc)
                    av = pc.cast(a, pa.float64()).to_numpy(
                        zero_copy_only=False
                    )[order]
                    valid = pc.is_valid(a).to_numpy(
                        zero_copy_only=False
                    )[order]
                df = pd.DataFrame({"pid": pid, "peer": peer})
                gp_ = df["pid"]
                if fn in ("count", "sum", "avg"):
                    df["cs"] = (
                        pd.Series(np.where(valid, av, 0.0))
                        .groupby(gp_).cumsum()
                    )
                    df["cc"] = (
                        pd.Series(valid.astype(np.int64))
                        .groupby(gp_).cumsum()
                    )
                    ge = df.groupby(["pid", "peer"], sort=False)
                    cs_e = ge["cs"].transform("last").to_numpy()
                    cc_e = ge["cc"].transform("last").to_numpy()
                    if fn == "count":
                        out_sorted = cc_e.astype(np.int64)
                        arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
                    else:
                        vals = (
                            cs_e if fn == "sum"
                            else cs_e / np.maximum(cc_e, 1)
                        )
                        out_sorted = np.where(cc_e > 0, vals, np.nan)

                        def arr_of(r):
                            arr = pa.array(r, type=pa.float64())
                            return pc.if_else(
                                pc.is_nan(arr),
                                pa.scalar(None, pa.float64()), arr,
                            )
                else:  # running min / max
                    s_ = pd.Series(np.where(valid, av, np.nan))
                    cm = (
                        s_.groupby(gp_).cummax() if fn == "max"
                        else s_.groupby(gp_).cummin()
                    )
                    # null rows don't move the extremum: carry forward
                    df["cm"] = cm.groupby(gp_).ffill()
                    out_sorted = (
                        df.groupby(["pid", "peer"], sort=False)["cm"]
                        .transform("last").to_numpy()
                    )

                    def arr_of(r):
                        arr = pa.array(r, type=pa.float64())
                        return pc.if_else(
                            pc.is_nan(arr),
                            pa.scalar(None, pa.float64()), arr,
                        )
            else:  # whole-partition aggregate
                starts = np.flatnonzero(newpart)
                pid = np.cumsum(newpart) - 1
                if argc is None:  # COUNT(*) OVER
                    cnt = np.add.reduceat(np.ones(n, np.int64), starts)
                    out_sorted = cnt[pid]
                    arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
                else:
                    a = g.column(argc)
                    av = pc.cast(a, pa.float64()).to_numpy(
                        zero_copy_only=False
                    )[order]
                    valid = pc.is_valid(a).to_numpy(
                        zero_copy_only=False
                    )[order]
                    cnt = np.add.reduceat(valid.astype(np.int64), starts)
                    if fn == "count":
                        out_sorted = cnt[pid]
                        arr_of = lambda r: pa.array(r, type=pa.int64())  # noqa: E731
                    else:
                        if fn in ("sum", "avg"):
                            x = np.where(valid, av, 0.0)
                            s = np.add.reduceat(x, starts)
                            vals = (
                                s if fn == "sum"
                                else s / np.maximum(cnt, 1)
                            )
                        else:
                            x = np.where(valid, av, np.nan)
                            red = np.fmin if fn == "min" else np.fmax
                            vals = red.reduceat(x, starts)
                        out_sorted = np.where(
                            cnt[pid] > 0, vals[pid], np.nan
                        )

                        def arr_of(r):
                            arr = pa.array(r, type=pa.float64())
                            return pc.if_else(
                                pc.is_nan(arr),
                                pa.scalar(None, pa.float64()), arr,
                            )

            res = np.empty(n, out_sorted.dtype)
            res[order] = out_sorted
            outs[outc] = arr_of(res)
        cols = {
            c: g.column(c)
            for c in g.schema.names
            if not c.startswith("__w")
        }
        cols.update(outs)
        return pa.table(cols)

    wds = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__wpart")
        .map_groups(win_group, batch_format="pyarrow")
    )

    repl = {wn: ("col", spec[3]) for wn, spec in zip(wins, win_specs)}

    def sub_win(n):
        return repl.get(n, n) if n[0] == "win" else n

    items2 = [(_transform(e, sub_win), a) for e, a in items]
    tables2 = dict(tables)
    tables2["__win_base"] = wds
    return _exec_plan(
        dict(plan, table="__win_base", where=None, items=items2),
        tables2, num_partitions,
    )


def _run_window_over_agg(plan: dict, tables: dict, num_partitions: int):
    """Windows over GROUP BY results (engine extension): run the
    grouped aggregate first (joins / WHERE / HAVING included), then
    the window machinery over the aggregated table with every
    aggregate expression and group key rewritten to a plain column
    reference — e.g. ``SELECT k, SUM(x) AS s, RANK() OVER (PARTITION
    BY r ORDER BY SUM(x) DESC) FROM t GROUP BY k, r``."""
    items, group = plan["items"], plan["group"]
    if not group:
        raise ValueError(
            "window functions mixed with aggregates require GROUP BY "
            "(a windowed global aggregate would be a single row)"
        )
    aggs: list = []
    for e, _ in items:
        for n in _walk(e):
            if n[0] == "agg" and n not in aggs:
                aggs.append(n)
    gnames = [_out_name(g_, None, i) for i, g_ in enumerate(group)]
    if len(set(gnames)) != len(gnames):
        raise ValueError("duplicate group key names under a window")
    inner_items = list(zip(group, gnames)) + [
        (a_, f"__ga{j}") for j, a_ in enumerate(aggs)
    ]
    inner = dict(plan, items=inner_items, order=[], limit=None,
                 distinct=False)
    base = _run_join_agg(inner, tables, num_partitions)

    gk_map = {g_: ("col", gn) for g_, gn in zip(group, gnames)}
    # the bottom-up rewrite transforms an agg node's children (group
    # keys inside its argument) before visiting the agg itself — key
    # the lookup by both the original and the child-rewritten node
    agg_keys: dict = {}
    for j, a_ in enumerate(aggs):
        agg_keys[a_] = f"__ga{j}"
        agg_keys[_transform(a_, lambda n: gk_map.get(n, n))] = f"__ga{j}"

    def sub(n):
        if n[0] == "agg":
            return ("col", agg_keys[n])
        return gk_map.get(n, n)

    items2 = [(_transform(e, sub), al) for e, al in items]
    tables2 = dict(tables)
    tables2["__gwin_base"] = base
    plan2 = dict(plan, table="__gwin_base", table_alias="__gwin_base",
                 joins=[], where=None, group=[], having=None,
                 items=items2)
    return _run_window(plan2, tables2, num_partitions)


def _lower_derived(plan: dict, tables: dict, num_partitions: int):
    """Execute FROM/JOIN derived tables (subquery plans) into Datasets
    registered under their aliases, so downstream execution sees plain
    named tables."""
    if plan.get("derived") is None and not any(
        j.get("derived") is not None for j in plan["joins"]
    ):
        return plan, tables
    tables = dict(tables)
    plan = dict(plan)
    if plan.get("derived") is not None:
        name = plan["table_alias"]
        if name in tables:
            raise ValueError(f"derived table alias {name!r} shadows a table")
        tables[name] = _exec_plan(plan["derived"], tables, num_partitions)
        plan["table"] = name
        plan["derived"] = None
    joins = []
    for j in plan["joins"]:
        if j.get("derived") is not None:
            name = j["alias"]
            if name in tables:
                raise ValueError(
                    f"derived table alias {name!r} shadows a table"
                )
            tables[name] = _exec_plan(j["derived"], tables, num_partitions)
            j = dict(j, table=name, derived=None)
        joins.append(j)
    plan["joins"] = joins
    return plan, tables


def _lower_group_exprs(plan: dict, tables: dict, num_partitions: int):
    """GROUP BY <expression>: rewrite onto an internal derived table
    that precomputes each non-column group expression as a hidden
    column (``SELECT *, expr AS __gx<i> FROM t``), then group by the
    hidden columns with every structurally-equal occurrence in
    SELECT/WHERE/HAVING rewritten to the column reference.  Single
    table only — with a JOIN, wrap the join in an explicit derived
    table first (raised with that hint)."""
    group = plan.get("group") or []
    if not group or all(g[0] in ("col", "qcol") for g in group):
        return plan, tables

    if plan["joins"]:
        raise ValueError(
            "GROUP BY expressions over a JOIN: wrap the join in a "
            "derived table (FROM (SELECT ...) t) and group over it"
        )

    alias = plan["table_alias"]

    def localize(n):
        def fn(x):
            if x[0] == "qcol":
                if x[1] != alias:
                    raise ValueError(f"unknown table alias {x[1]!r}")
                return ("col", x[2])
            return x

        return _transform(n, fn)

    cols = list(tables[plan["table"]].schema().names)
    extras, new_group, subs = [], [], []
    for i, g in enumerate(group):
        if g[0] in ("col", "qcol"):
            new_group.append(localize(g))
            continue
        gl = localize(g)
        name = f"__gx{i}"
        if name in cols:
            raise ValueError(f"column {name!r} collides with a hidden "
                             "group-expression column")
        extras.append((gl, name))
        subs.append((gl, ("col", name)))
        new_group.append(("col", name))

    inner = {
        "items": [(("col", c), None) for c in cols] + list(extras),
        "table": plan["table"], "table_alias": alias, "derived": None,
        "joins": [], "where": None, "group": [], "having": None,
        "order": [], "limit": None, "offset": None, "distinct": False,
        "union_next": False,
    }
    src = "__gx_src"
    if src in tables:
        raise ValueError(f"table name {src!r} is reserved")
    tables = dict(tables)
    tables[src] = _exec_plan(inner, tables, num_partitions)

    def rewrite(n):
        n = localize(n)
        for gl, ref in subs:
            n = _transform(n, lambda x, _g=gl, _r=ref: _r if x == _g else x)
        return n

    plan = dict(plan)
    plan["table"] = src
    plan["table_alias"] = src
    plan["group"] = new_group
    if plan["items"] is not None:
        plan["items"] = [(rewrite(e), a) for e, a in plan["items"]]
    if plan["where"] is not None:
        plan["where"] = rewrite(plan["where"])
    if plan.get("having") is not None:
        plan["having"] = rewrite(plan["having"])
    return plan, tables


def _run_grouping_sets(plan: dict, tables: dict, num_partitions: int):
    """GROUP BY ROLLUP/CUBE — the standard grouping-set expansion:
    one branch per grouping set (full set first), rolled-away group
    columns projected as NULL, branch schemas cast to the full-set
    branch's types, UNION ALL, then the original ORDER BY/LIMIT.
    HAVING applies per grouping set (standard semantics) because each
    branch keeps the original HAVING."""
    import copy

    from . import relational as R

    mode = plan["group_mode"]
    base = plan["group"]
    if not base:
        raise ValueError(f"{mode} needs at least one group expression")
    if mode == "rollup":
        sets = [base[:k] for k in range(len(base), -1, -1)]
    else:                                    # cube
        from itertools import combinations

        sets = []
        for r in range(len(base), -1, -1):
            for combo in combinations(range(len(base)), r):
                sets.append([base[i] for i in combo])
    base_keys = {repr(g) for g in base}
    branches = []
    for S in sets:
        cp = copy.deepcopy(plan)
        cp["group_mode"] = None
        cp["group"] = copy.deepcopy(S)
        cp["order"], cp["limit"], cp["offset"] = [], None, None
        cp["union_next"] = False
        skeys = {repr(g) for g in S}
        rolled = base_keys - skeys

        def null_rolled(n):
            # rolled-away group keys become NULL OUTSIDE aggregates
            # only — COUNT(DISTINCT key) etc. still see the column
            if repr(n) in rolled:
                return ("lit", None)
            if isinstance(n, tuple) and n and n[0] in ("agg", "win"):
                return n
            if isinstance(n, tuple):
                return tuple(
                    null_rolled(x) if isinstance(x, (tuple, list))
                    else x for x in n)
            if isinstance(n, list):
                return [null_rolled(x) if isinstance(x, (tuple, list))
                        else x for x in n]
            return n

        items = []
        for i, (e, alias) in enumerate(cp["items"]):
            nm = _out_name(e, alias, i)
            items.append((null_rolled(e), nm))
        cp["items"] = items
        if cp.get("having") is not None:
            cp["having"] = null_rolled(cp["having"])
        branches.append(_exec_plan(cp, tables, num_partitions))
    sch = branches[0].schema()
    fields = list(zip(sch.names, sch.types))

    def cast_to(t: pa.Table) -> pa.Table:
        cols = {}
        for n, ty in fields:
            c = t.column(n)
            cols[n] = c if c.type == ty else pc.cast(c, ty)
        return pa.table(cols)

    out = branches[0].union(*[
        b.map_batches(cast_to, batch_format="pyarrow")
        for b in branches[1:]])
    order, limit = plan["order"], plan["limit"]
    offset = plan.get("offset") or 0
    if order:
        # rolled-up rows carry NULL group keys; Ray's sort cannot
        # compare None against values, so sort on (is_null, filled)
        # key pairs (NULLS LAST, DuckDB's default null order)
        keys = [c for c, _ in order]
        desc = {c: d for c, d in order}
        out_names = [n for n, _ in fields]

        def add_keys(t: pa.Table) -> pa.Table:
            cols = {n: t.column(n) for n in t.column_names}
            for c in keys:
                col = t.column(c)
                cols[f"__nul_{c}"] = pc.cast(pc.is_null(col), pa.int8())
                if pa.types.is_string(col.type) or \
                        pa.types.is_large_string(col.type):
                    fill = pa.scalar("", col.type)
                else:
                    fill = pa.scalar(0, col.type)
                cols[f"__key_{c}"] = pc.fill_null(col, fill)
            return pa.table(cols)

        sort_keys = []
        sort_desc = []
        for c in keys:
            sort_keys += [f"__nul_{c}", f"__key_{c}"]
            sort_desc += [False, desc[c]]
        out = (out.map_batches(add_keys, batch_format="pyarrow")
               .sort(sort_keys, descending=sort_desc)
               .map_batches(lambda t: t.select(out_names),
                            batch_format="pyarrow"))
        if offset:
            _require_offset_shape(order, limit)
        if limit is not None:
            out = out.limit(limit + offset)
            return _skip_prefix(out, offset) if offset else out
        return out
    if limit is not None:
        return out.limit(limit)
    return out


def _exec_plan(plan: dict, tables: dict, num_partitions: int = 16):
    from . import relational as R

    if plan.get("group_mode"):
        return _run_grouping_sets(plan, tables, num_partitions)
    plan, tables = _lower_derived(plan, tables, num_partitions)
    plan, tables = _lower_group_exprs(plan, tables, num_partitions)
    plan, tables = _lower_subqueries(plan, tables, num_partitions)
    where, items = plan["where"], plan["items"]

    if items is not None and any(
        n[0] == "win" for e, _ in items for n in _walk(e)
    ):
        if (plan["group"] or plan.get("having") is not None
                or any(_has_agg(e) for e, _ in items)):
            return _run_window_over_agg(plan, tables, num_partitions)
        return _run_window(plan, tables, num_partitions)

    if plan["joins"] or plan["group"] or plan["having"] is not None or (
        items is not None and any(_has_agg(e) for e, _ in items)
    ):
        return _run_join_agg(plan, tables, num_partitions)

    if plan["table"] not in tables:
        raise ValueError(f"unknown table {plan['table']}")
    ds = tables[plan["table"]]

    out_names = (
        None
        if items is None
        else [_out_name(e, alias, i) for i, (e, alias) in enumerate(items)]
    )
    # ORDER BY may reference source columns the projection drops: carry
    # them through under mangled names and drop after the sort
    extra_keys = []
    if plan["order"] and items is not None:
        for c, _ in plan["order"]:
            if c not in out_names:
                extra_keys.append(c)

    def run(t: pa.Table) -> pa.Table:
        if where is not None:
            t = t.filter(pc.cast(_eval(where, t), pa.bool_()))
        if items is None:
            return t
        cols = {}
        for idx, (e, alias) in enumerate(items):
            v = _eval(e, t)
            if isinstance(v, pa.Scalar):
                # explicit type so zero-row batches (WHERE filtered all
                # rows) don't produce null-typed arrays that break
                # cross-batch schema unification
                v = pa.array([v.as_py()] * t.num_rows, type=v.type)
            cols[_out_name(e, alias, idx)] = v
        for c in extra_keys:
            cols[f"__ob_{c}"] = t.column(c)
        return pa.table(cols)

    if plan.get("gate_empty"):
        # a WHERE gate (uncorrelated EXISTS / NOT IN with NULLs) proved
        # the result empty: materialize the zero-row projection locally
        # so the schema survives (Ray cannot infer schema through map
        # stages whose every block is empty)
        import ray.data as rd

        sch = ds.schema()
        fields = [
            (n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in zip(sch.names, sch.types)
        ]
        res = run(pa.schema(fields).empty_table())
        if items is not None:
            res = res.select(out_names)
        return rd.from_arrow(res)

    out = ds.map_batches(run, batch_format="pyarrow")
    if plan.get("distinct"):
        if extra_keys:
            raise ValueError(
                "SELECT DISTINCT with ORDER BY on a non-output column"
            )
        names = (
            out_names if items is not None else list(ds.schema().names)
        )
        out = R.distinct(out, list(names))
    if plan["order"]:
        keys = [
            c if (items is None or c in out_names) else f"__ob_{c}"
            for c, _ in plan["order"]
        ]
        desc = [d for _, d in plan["order"]]
        off = plan.get("offset") or 0
        if plan["limit"] is not None:
            out = R.order_by_limit(out, keys, descending=desc,
                                   limit=plan["limit"] + off)
            if off:
                out = _skip_prefix(out, off)
        else:
            if off:
                _require_offset_shape(plan["order"], plan["limit"])
            out = out.sort(keys, descending=desc)
        if extra_keys:
            out = out.drop_columns([f"__ob_{c}" for c in extra_keys])
        return out
    if plan.get("offset"):
        _require_offset_shape(plan["order"], plan["limit"])
    if plan["limit"] is not None:
        return out.limit(plan["limit"])
    return out
