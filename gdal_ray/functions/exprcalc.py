"""Band-math expression compiler for the `gdal raster calc` step.

Reference analog: apps/gdalalg_raster_calc.cpp (muparser dialect over
band identifiers, rendered into a VRTDerivedRasterBand pixel function)
and osgeo_utils/gdal_calc.py.  The engine compiles the expression ONCE
(per actor, step-state discipline) to an RPN program and evaluates it
with vectorized numpy over float64 band arrays.

Grammar (muparser subset):
    expr    := term (('+'|'-') term)*
    term    := factor (('*'|'/'|'%') factor)*
    factor  := unary ('**' factor)?          (right-assoc power)
    unary   := '-' unary | atom
    atom    := NUMBER | IDENT | IDENT '(' expr (',' expr)* ')'
             | '(' expr ')'
Identifiers are band names (A, B, C, ... bound by position) or one of
the functions: abs sqrt floor ceil exp log min max clip.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(
    r"\s*(?:(\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?)|([A-Za-z_][A-Za-z_0-9]*)"
    r"|(\*\*)|([-+*/%(),]))"
)

_FUNCS = {
    "abs": (1, np.abs),
    "sqrt": (1, np.sqrt),
    "floor": (1, np.floor),
    "ceil": (1, np.ceil),
    "exp": (1, np.exp),
    "log": (1, np.log),
    "min": (2, np.minimum),
    "max": (2, np.maximum),
    "clip": (3, lambda a, lo, hi: np.minimum(np.maximum(a, lo), hi)),
}


class CalcParseError(ValueError):
    pass


def _tokenize(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise CalcParseError(f"bad token at {s[pos:pos+10]!r}")
            break
        num, ident, power, op = m.groups()
        if num is not None:
            out.append(("num", float(num)))
        elif ident is not None:
            out.append(("id", ident))
        elif power is not None:
            out.append(("op", "**"))
        else:
            out.append(("op", op))
        pos = m.end()
    return out


class CalcExpr:
    """Compiled expression: ``CalcExpr("(A + 2*B) / 4")(a, b)``.
    Band identifiers bind to positional args in first-appearance
    order (exposed as .bands)."""

    def __init__(self, text: str):
        self.text = text
        self._toks = _tokenize(text)
        self._i = 0
        self.bands: list[str] = []
        self._prog = self._expr()
        if self._i != len(self._toks):
            raise CalcParseError(f"trailing tokens in {text!r}")

    # recursive-descent building a nested-callable tree
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _eat(self, kind, val=None):
        t = self._peek()
        if t is None or t[0] != kind or (val is not None and t[1] != val):
            raise CalcParseError(f"expected {val or kind} in {self.text!r}")
        self._i += 1
        return t

    def _expr(self):
        node = self._term()
        while self._peek() in (("op", "+"), ("op", "-")):
            op = self._eat("op")[1]
            rhs = self._term()
            node = (np.add if op == "+" else np.subtract, node, rhs)
        return node

    def _term(self):
        node = self._factor()
        while self._peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            op = self._eat("op")[1]
            rhs = self._factor()
            fn = {"*": np.multiply, "/": np.divide, "%": np.fmod}[op]
            node = (fn, node, rhs)
        return node

    def _factor(self):
        return self._unary()

    def _unary(self):
        # python-convention precedence: -A ** 2 == -(A ** 2)
        if self._peek() == ("op", "-"):
            self._eat("op")
            return (np.negative, self._unary())
        return self._power()

    def _power(self):
        node = self._atom()
        if self._peek() == ("op", "**"):
            self._eat("op")
            rhs = self._unary()  # right-assoc, unary allowed in exponent
            node = (np.power, node, rhs)
        return node

    def _atom(self):
        t = self._peek()
        if t is None:
            raise CalcParseError(f"unexpected end of {self.text!r}")
        if t[0] == "num":
            self._eat("num")
            return ("const", t[1])
        if t[0] == "id":
            self._eat("id")
            name = t[1]
            if self._peek() == ("op", "("):
                if name not in _FUNCS:
                    raise CalcParseError(f"unknown function {name!r}")
                nargs, fn = _FUNCS[name]
                self._eat("op", "(")
                args = [self._expr()]
                while self._peek() == ("op", ","):
                    self._eat("op", ",")
                    args.append(self._expr())
                self._eat("op", ")")
                if len(args) != nargs:
                    raise CalcParseError(
                        f"{name} takes {nargs} args, got {len(args)}")
                return tuple([fn] + args)
            if name not in self.bands:
                self.bands.append(name)
            return ("band", self.bands.index(name))
        if t == ("op", "("):
            self._eat("op", "(")
            node = self._expr()
            self._eat("op", ")")
            return node
        raise CalcParseError(f"unexpected {t} in {self.text!r}")

    def _run(self, node, args):
        if node[0] == "const":
            return node[1]
        if node[0] == "band":
            return args[node[1]]
        fn = node[0]
        return fn(*[self._run(a, args) for a in node[1:]])

    def __call__(self, *band_arrays):
        if len(band_arrays) != len(self.bands):
            raise ValueError(
                f"expression uses bands {self.bands}, got "
                f"{len(band_arrays)} arrays")
        args = [np.asarray(a, np.float64) for a in band_arrays]
        return np.asarray(self._run(self._prog, args), np.float64)
