"""Function-query parser — the Solr ValueSource expression surface.

Reference: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
(registry of named sources) and lucene/queries/src/java/org/apache/lucene/
queries/function/valuesource/* for the semantics of each function:

  recip(x,m,a,b) = a/(m*x+b)     ReciprocalFloatFunction.java
  linear(x,m,c)  = m*x+c         LinearFloatFunction.java
  div(a,b), sum(..), product(..) DivFloatFunction / SumFloatFunction /
                                 ProductFloatFunction
  log(x) base 10, sqrt(x), abs(x), pow(a,b)  (math value sources)
  constants and bare field names

Everything compiles to a Catalyst Column (whole-stage codegen — this is
why the engine needs no ValueSource class hierarchy: Spark expressions
ARE the value sources). Used by handler.select's bf (additive boost)
and boost (multiplicative) params, mirroring edismax
(ExtendedDismaxQParser bf/boost handling).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

_TOK = re.compile(r"\s*(?:(?P<num>-?\d+(?:\.\d+)?)|(?P<name>[A-Za-z_][A-Za-z0-9_]*)|(?P<ch>[(),]))")


class FuncParseError(ValueError):
    pass


def _tokens(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOK.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise FuncParseError(f"cannot parse at: {s[pos:]!r}")
            break
        out.append(m)
        pos = m.end()
    return out


def parse_func(expr: str) -> Column:
    """Parse a ValueSource expression string into a Catalyst Column.
    All arithmetic is double-precision (matching FloatFunction-via-
    double gate semantics and the SQL oracle twins)."""
    toks = _tokens(expr)

    def parse(i: int) -> tuple[Column, int]:
        if i >= len(toks):
            raise FuncParseError("unexpected end of expression")
        m = toks[i]
        if m.group("num"):
            return F.lit(float(m.group("num"))), i + 1
        if not m.group("name"):
            raise FuncParseError(f"unexpected token {m.group(0)!r}")
        name = m.group("name")
        # function call?
        if i + 1 < len(toks) and toks[i + 1].group("ch") == "(":
            args: list[Column] = []
            j = i + 2
            if toks[j].group("ch") == ")":
                j += 1
            else:
                while True:
                    a, j = parse(j)
                    args.append(a)
                    ch = toks[j].group("ch")
                    j += 1
                    if ch == ")":
                        break
                    if ch != ",":
                        raise FuncParseError("expected ',' or ')'")
            return _apply(name, args), j
        # bare field reference
        return F.col(name).cast("double"), i + 1

    col, i = parse(0)
    if i != len(toks):
        raise FuncParseError("trailing tokens")
    return col


def _apply(name: str, args: list[Column]) -> Column:
    def need(n: int):
        if len(args) != n:
            raise FuncParseError(f"{name} takes {n} args, got {len(args)}")

    if name == "recip":  # ReciprocalFloatFunction: a/(m*x+b)
        need(4)
        x, m, a, b = args
        return a / (m * x + b)
    if name == "linear":  # LinearFloatFunction: m*x+c
        need(3)
        x, m, c = args
        return m * x + c
    if name == "div":
        need(2)
        return args[0] / args[1]
    if name == "sum":
        col = args[0]
        for a in args[1:]:
            col = col + a
        return col
    if name == "product":
        col = args[0]
        for a in args[1:]:
            col = col * a
        return col
    if name == "log":  # base-10 (LogFloatFunction)
        need(1)
        return F.log10(args[0])
    if name == "sqrt":
        need(1)
        return F.sqrt(args[0])
    if name == "abs":
        need(1)
        return F.abs(args[0])
    if name == "pow":
        need(2)
        return F.pow(args[0], args[1])
    raise FuncParseError(f"unknown function {name!r}")
