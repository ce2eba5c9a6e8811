"""OTTL-style filter conditions — the contrib ``filterprocessor``.

The reference distribution ships the contrib filter processor
(distributions/elastic-components/manifest.yaml:50); its config is a
list of OTTL boolean expressions and a record is DROPPED when ANY
condition evaluates true.  This module compiles the useful OTTL subset
those configs actually use into **Catalyst Column predicates** — which
is the whole point of doing this on Spark: a condition over scan
columns becomes a pushed-down parquet filter for free, instead of a
per-record interpreter loop.

Grammar (recursive descent over a regex token stream):

    expr    := or
    or      := and ( 'or' and )*
    and     := not ( 'and' not )*
    not     := 'not' not | cmp
    cmp     := primary ( ('=='|'!='|'<'|'<='|'>'|'>=') primary )?
    primary := '(' expr ')' | literal | func '(' args ')' | path
    path    := ident ('.' ident)* ('["' key '"]')?
    literal := 'str' | "str" | int | float | true | false | nil

Functions: ``IsMatch(target, "regex")`` (OTTL's regex predicate).
Paths resolve ``attributes["k"]`` / ``resource.attributes["k"]`` to
``element_at`` over the repo's map columns and bare dotted names to
ordinary columns.  OTTL-consistent null handling: a comparison against
a missing attribute is not-true, so the record is KEPT (drop requires
a definite match).

Scale shape: the compiled predicate is a pure Catalyst expression —
conditions on scan columns reach ``PushedFilters`` in the parquet scan
(plan-asserted in tests), map-derived conditions run in whole-stage
codegen; zero UDFs either way.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<op>==|!=|<=|>=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<comma>,)
      | (?P<dot>\.)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "true", "false", "nil"}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "ident" and text in _KEYWORDS:
            kind = text
        out.append((kind, text))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str:
        return self.toks[self.i][0]

    def take(self, kind: str | None = None) -> str:
        k, text = self.toks[self.i]
        if kind is not None and k != kind:
            raise ValueError(f"expected {kind}, got {k} {text!r}")
        self.i += 1
        return text

    # ---- grammar ----
    def expr(self) -> Column:
        return self._or()

    def _or(self) -> Column:
        left = self._and()
        while self.peek() == "or":
            self.take()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self.peek() == "and":
            self.take()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self.peek() == "not":
            self.take()
            return ~self._not()
        return self._cmp()

    def _cmp(self) -> Column:
        left = self._primary()
        if self.peek() == "op":
            op = self.take()
            right = self._primary()
            if op == "==":
                return left == right  # noqa: E712 — Column equality
            if op == "!=":
                return left != right
            if op == "<":
                return left < right
            if op == "<=":
                return left <= right
            if op == ">":
                return left > right
            return left >= right
        return left

    def _primary(self) -> Column:
        k = self.peek()
        if k == "lparen":
            self.take()
            e = self.expr()
            self.take("rparen")
            return e
        if k == "string":
            return F.lit(_unquote(self.take()))
        if k == "number":
            text = self.take()
            return F.lit(float(text) if "." in text else int(text))
        if k == "true":
            self.take()
            return F.lit(True)
        if k == "false":
            self.take()
            return F.lit(False)
        if k == "nil":
            self.take()
            return F.lit(None)
        if k == "ident":
            return self._path_or_func()
        raise ValueError(f"unexpected token {k}")

    def _path_or_func(self) -> Column:
        name = self.take("ident")
        if self.peek() == "lparen":  # function call
            self.take()
            args = [self.expr()]
            while self.peek() == "comma":
                self.take()
                args.append(self.expr())
            self.take("rparen")
            return _call(name, args)
        parts = [name]
        while self.peek() == "dot":
            self.take()
            parts.append(self.take("ident"))
        if self.peek() == "lbrack":
            self.take()
            key = _unquote(self.take("string"))
            self.take("rbrack")
            return _resolve_map(parts, key)
        return F.col(".".join(parts))


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _call(name: str, args: list[Column]) -> Column:
    if name == "IsMatch":
        if len(args) != 2:
            raise ValueError("IsMatch takes (target, pattern)")
        return F.regexp_like(args[0], args[1])
    raise ValueError(f"unknown OTTL function {name!r}")


def _resolve_map(parts: list[str], key: str) -> Column:
    # attributes["k"] -> the record-level map; resource.attributes["k"]
    # -> the resource map column (SURVEY.md §1.3 column model); any
    # other head indexes a map column of that dotted name.
    if parts == ["attributes"]:
        return F.element_at(F.col("attributes"), key)
    if parts == ["resource", "attributes"]:
        return F.element_at(F.col("resource"), key)
    return F.element_at(F.col(".".join(parts)), key)


def compile_condition(expr: str) -> Column:
    """One OTTL condition string -> a boolean Catalyst Column."""
    p = _Parser(_tokenize(expr))
    out = p.expr()
    if p.peek() != "eof":
        raise ValueError(f"trailing input at token {p.i}")
    return out


def filter_records(df: DataFrame, conditions: list[str]) -> DataFrame:
    """filterprocessor semantics: DROP a record when ANY condition is
    definitely true; null-valued conditions (missing attributes) keep
    the record."""
    if not conditions:
        return df
    dropped = None
    for c in conditions:
        col = compile_condition(c)
        dropped = col if dropped is None else (dropped | col)
    return df.where(~F.coalesce(dropped, F.lit(False)))
