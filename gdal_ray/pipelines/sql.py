"""Minimal SQL string front-end — the OGR SQL dialect subset.

Reference semantics: the reference compiles attribute-query / SELECT
strings with the SWQ engine (ogr/ogrfeaturequery.cpp:68 Compile,
grammar ogr/swq_parser.y, operator registry
ogr/swq_op_registrar.cpp:28-62).  This module parses the same surface
(SELECT list with aliases and scalar expressions, FROM one layer,
WHERE with AND/OR/NOT, comparison ops, LIKE, IN, BETWEEN, arithmetic
incl %, CONCAT, SUBSTR, CAST) and compiles it to vectorized
pyarrow.compute kernels applied through ``Dataset.map_batches`` —
ORDER BY / LIMIT lower onto the engine's distributed top-k.

Not covered (documented): joins, GROUP BY aggregates, subqueries —
those are composed with the pipelines.relational operators directly.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<op><=|>=|<>|!=|[=<>(),*%+\-/])|(?P<ident>[A-Za-z_][A-Za-z_0-9]*))"
)

_KEYWORDS = {
    "select", "from", "where", "order", "by", "asc", "desc", "limit", "as",
    "and", "or", "not", "like", "in", "between", "cast", "concat", "substr",
    "is", "null", "true", "false",
}


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
            if nk == "kw" and nv in ("like", "in", "between"):
                self.next()
                neg = True
                k, v = self.peek()
        if k == "kw" and v == "like":
            self.next()
            rhs = self.add_expr()
            e = ("like", e, rhs)
            return ("not", e) if neg else e
        if k == "kw" and v == "in":
            self.next()
            self.expect("op", "(")
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
        if k == "op" and v == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        if k == "ident":
            return ("col", v)
        raise ValueError(f"unexpected token {k} {v}")


_TYPES = {
    "bigint": pa.int64(), "integer": pa.int64(), "int": pa.int64(),
    "double": pa.float64(), "float": pa.float64(),
    "varchar": pa.string(), "text": pa.string(), "character": pa.string(),
}


def _eval(node, t: pa.Table):
    op = node[0]
    if op == "lit":
        return pa.scalar(node[1])
    if op == "col":
        return t.column(node[1])
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
    """Parse a SELECT statement into a plan dict."""
    p = _Parser(_tokenize(sql))
    p.expect("kw", "select")
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
    table = p.expect("ident")
    where = None
    if p.accept("kw", "where"):
        where = p.expr()
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
    if p.peek()[0] != "end":
        raise ValueError(f"trailing tokens at {p.peek()}")
    return {"items": items, "table": table, "where": where, "order": order,
            "limit": limit}


def _out_name(e, alias, idx) -> str:
    if alias:
        return alias
    if e[0] == "col":
        return e[1]
    return f"expr_{idx}"


def sql_query(sql: str, tables: dict):
    """Execute a SELECT string against named Datasets.  Returns a
    Dataset; lazy/streaming except for the distributed ORDER BY/LIMIT
    tail."""
    from . import relational as R

    plan = parse_select(sql)
    if plan["table"] not in tables:
        raise ValueError(f"unknown table {plan['table']}")
    ds = tables[plan["table"]]
    where, items = plan["where"], plan["items"]

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

    out = ds.map_batches(run, batch_format="pyarrow")
    if plan["order"]:
        keys = [
            c if (items is None or c in out_names) else f"__ob_{c}"
            for c, _ in plan["order"]
        ]
        desc = [d for _, d in plan["order"]]
        if plan["limit"] is not None:
            out = R.order_by_limit(out, keys, descending=desc, limit=plan["limit"])
        else:
            out = out.sort(keys, descending=desc)
        if extra_keys:
            out = out.drop_columns([f"__ob_{c}" for c in extra_keys])
        return out
    if plan["limit"] is not None:
        return out.limit(plan["limit"])
    return out
