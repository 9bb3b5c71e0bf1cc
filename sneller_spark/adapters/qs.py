"""Lucene ``query_string`` syntax → Spark ``Column`` predicate.

The reference proxy translates Kibana search-bar queries (the Lucene
"query string" mini-language) into SQL predicates:

- tokens:   elasticproxy/elastic-proxy/qs_lexer.rl (ragel scanner —
  longest match, declaration order breaks ties)
- grammar:  elasticproxy/elastic-proxy/qs_parser.y (goyacc; precedence
  AND < OR < NOT, i.e. ``a AND b OR c`` groups as ``a AND (b OR c)``)
- field semantics: elasticproxy/elastic-proxy/qs.go:214-438
  (qsFieldExpression.Expression) — per-field type from the index
  mapping decides exact / lowercased / word-boundary-regex matching
- request plumbing: elasticproxy/elastic-proxy/query.go:451-510
  (``fields`` fan-out is ANDed; ``default_operator`` defaults to OR)

This module re-derives the same pipeline natively: a regex scanner with
ragel's longest-match/first-declared tie-break, a recursive-descent
parser for the yacc grammar, and a Column generator that mirrors
qs.go's per-(operator, value-type, field-type) table.  Everything stays
JVM-side: the produced predicate is built from ``col/lit/rlike/like``
only, so it inlines into the scan filter like any other pushed
predicate.

Like the reference's SQL translation, scoring knobs (boost ``^n``,
fuzziness ``~n``) are parsed and discarded, and ``fields`` are combined
with AND (query.go:488-507 ``andExpressions``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class QSParseError(ValueError):
    pass


# ---------------------------------------------------------------------
# lexer (qs_lexer.rl)
# ---------------------------------------------------------------------

# reserved_char = [&|><!(){}"~:/] | '^' | '[' | ']' | '\\' | space | '.'
_RESERVED = '&|><!(){}"~:/^[]\\ \t\v\f\n\r.'
# start_reserved_char additionally has '+' and '-'
_START_RESERVED = _RESERVED + "+-"


def _cc(chars: str) -> str:
    return "[^" + re.escape(chars) + "]"


# (kind, regex) in ragel declaration order; scanning takes the longest
# match and breaks length ties by this order.
_TOKEN_RES: list[tuple[str, re.Pattern[str]]] = [
    ("AND", re.compile(r"AND|&&")),
    ("OR", re.compile(r"OR|\|\|")),
    ("NOT", re.compile(r"NOT|!")),
    ("TO", re.compile(r"TO")),
    ("EXISTS", re.compile(r"_exists_")),
    ("RANGE_START", re.compile(r"[\[{]")),
    ("RANGE_END", re.compile(r"[\]}]")),
    ("LPAREN", re.compile(r"\(")),
    ("RPAREN", re.compile(r"\)")),
    ("PIPE", re.compile(r"\|")),
    ("PLUS", re.compile(r"\+")),
    ("MINUS", re.compile(r"-")),
    ("COLON", re.compile(r":")),
    ("DOT", re.compile(r"\.")),
    ("WS", re.compile(r"[ \t\v\f\n\r]+")),
    ("OP", re.compile(r">=|<=|>|<|=")),
    ("BOOST", re.compile(r"\^(?:\d*\.\d+|\d+)")),
    ("FUZZY", re.compile(r"~\d*")),
    ("FLOAT", re.compile(r"[+\-]?\d*\.\d+")),
    ("INT", re.compile(r"[+\-]?\d+")),
    ("BOOL", re.compile(r"true|TRUE|false|FALSE")),
    (
        "ALPHA",
        re.compile(
            r"(?:\\&&|\\\|\||\\.|" + _cc(_START_RESERVED) + r")"
            r"(?:\\&&|\\\|\||\\.|" + _cc(_RESERVED) + r")*",
            re.DOTALL,
        ),
    ),
    ("QUOTED", re.compile(r'"(?:\\"|[^"])*"')),
    ("REGEX", re.compile(r"/(?:\\/|[^/])*/")),
]


def tokenize(query: str) -> list[tuple[str, Any]]:
    """Scan `query` into (kind, value) tokens, ragel-style."""
    toks: list[tuple[str, Any]] = []
    pos, n = 0, len(query)
    while pos < n:
        best_kind, best_len, best_text = None, -1, ""
        for kind, rx in _TOKEN_RES:
            m = rx.match(query, pos)
            if m and len(m.group(0)) > best_len:
                best_kind, best_len, best_text = kind, len(m.group(0)), m.group(0)
        if best_kind is None or best_len == 0:
            raise QSParseError(
                f"query_string: cannot scan at offset {pos}: {query[pos:pos+10]!r}"
            )
        pos += best_len
        if best_kind == "WS":
            continue
        if best_kind == "ALPHA":
            # the reference strips EVERY backslash from the unquoted
            # token (qs_lexer.rl:141 ReplaceAll) — escaping a literal
            # * or ? is only possible inside quotes
            toks.append(("ALPHA", best_text.replace("\\", "")))
        elif best_kind == "QUOTED":
            # quoted/regex tokens keep their inner text VERBATIM
            # (tokenStripped only drops the delimiters) — backslash
            # escapes survive into wildcard/regex translation
            toks.append(("QUOTED", best_text[1:-1]))
        elif best_kind == "REGEX":
            toks.append(("REGEX", best_text[1:-1]))
        elif best_kind == "INT":
            toks.append(("INT", int(best_text)))
        elif best_kind == "FLOAT":
            toks.append(("FLOAT", float(best_text)))
        elif best_kind == "BOOL":
            toks.append(("BOOL", best_text.lower() == "true"))
        elif best_kind == "BOOST":
            toks.append(("BOOST", float(best_text[1:])))
        elif best_kind == "FUZZY":
            toks.append(("FUZZY", float(best_text[1:]) if best_text[1:] else -1.0))
        elif best_kind == "RANGE_START":
            toks.append(("RANGE_START", best_text == "["))
        elif best_kind == "RANGE_END":
            toks.append(("RANGE_END", best_text == "]"))
        else:
            toks.append((best_kind, best_text))
    return toks


# ---------------------------------------------------------------------
# AST (qs.go types)
# ---------------------------------------------------------------------

TEXT, FLOATV, INTV, REGEXV, BOOLV = "text", "float", "int", "regex", "bool"


@dataclass
class QSValue:
    value: Any

    def set_field(self, fields):  # qsValue ignores field names
        pass


@dataclass
class QSExpr1:
    op: str
    expr: Any

    def set_field(self, fields):
        self.expr.set_field(fields)


@dataclass
class QSExpr2:
    op: str
    e1: Any
    e2: Any

    def set_field(self, fields):
        self.e1.set_field(fields)
        self.e2.set_field(fields)


@dataclass
class QSMust:
    op: str  # "AND" | "OR"
    expr: Any

    def set_field(self, fields):
        self.expr.set_field(fields)


@dataclass
class QSField:
    value: Any
    vtype: str
    op: str  # <, <=, >=, >, =, EXISTS
    fields: list[str] | None = dc_field(default=None)

    def set_field(self, fields):
        if not self.fields:
            self.fields = fields


def combine(default_op: str, exprs: list[Any]) -> Any:
    """qs.go:64-116 — AND all +terms first; then, unless the default is
    OR and a must-term exists, fold the rest in with the default op."""
    if not exprs:
        raise QSParseError("cannot combine zero expressions")
    expr = None
    for e in exprs:
        if isinstance(e, QSMust) and e.op == "AND":
            expr = e.expr if expr is None else QSExpr2("AND", expr, e.expr)
    if default_op != "OR" or expr is None:
        for e in exprs:
            op = default_op
            if isinstance(e, QSMust):
                if e.op == "OR":
                    continue
                op = e.op
                e = e.expr
            expr = e if expr is None else QSExpr2(op, expr, e)
    if expr is None:
        # a group of only |terms combines to nothing (the reference
        # returns nil here and would crash downstream; reject cleanly)
        raise QSParseError(
            "query_string: group contains only |should terms")
    return expr


# ---------------------------------------------------------------------
# parser (qs_parser.y)
# ---------------------------------------------------------------------

_CONST_STARTS = {"FLOAT", "INT", "BOOL", "ALPHA", "QUOTED", "REGEX", "OP"}
_TERM_STARTS = _CONST_STARTS | {
    "PLUS", "MINUS", "PIPE", "RANGE_START", "EXISTS",
}


class _Parser:
    def __init__(self, toks: list[tuple[str, Any]], default_op: str):
        self.toks = toks
        self.i = 0
        self.default_op = default_op

    def peek(self, k: int = 0) -> str:
        j = self.i + k
        return self.toks[j][0] if j < len(self.toks) else "EOF"

    def val(self) -> Any:
        return self.toks[self.i][1]

    def take(self, kind: str) -> Any:
        if self.peek() != kind:
            raise QSParseError(
                f"query_string: expected {kind}, got {self.peek()} "
                f"at token {self.i}"
            )
        v = self.toks[self.i][1]
        self.i += 1
        return v

    # precedence: AND (lowest) < OR < NOT (qs_parser.y %left order)
    def parse(self) -> Any:
        e = self.parse_and()
        if self.peek() != "EOF":
            raise QSParseError(
                f"query_string: trailing {self.peek()} at token {self.i}"
            )
        return e

    def parse_and(self) -> Any:
        e = self.parse_or()
        while self.peek() == "AND":
            self.i += 1
            e = QSExpr2("AND", e, self.parse_or())
        return e

    def parse_or(self) -> Any:
        e = self.parse_unary()
        while self.peek() == "OR":
            self.i += 1
            e = QSExpr2("OR", e, self.parse_unary())
        return e

    def parse_unary(self) -> Any:
        if self.peek() == "NOT":
            self.i += 1
            return QSExpr1("NOT", self.parse_unary())
        return self.parse_atom()

    def parse_atom(self) -> Any:
        if self.peek() == "LPAREN":
            self.i += 1
            e = self.parse_and()
            self.take("RPAREN")
            if self.peek() == "BOOST":
                self.i += 1  # boost is parsed and dropped
            return e
        terms = [self.parse_term()]
        while self.peek() in _TERM_STARTS:
            terms.append(self.parse_term())
        return combine(self.default_op, terms)

    def parse_term(self) -> Any:
        kind = self.peek()
        if kind == "EXISTS":  # _exists_:field
            self.i += 1
            self.take("COLON")
            return QSField(None, TEXT, "EXISTS", fields=self.parse_field_name())
        # fieldName ':' ... lookahead: ALPHA (DOT ALPHA)* COLON
        if kind == "ALPHA":
            j = self.i + 1
            while self.peek(j - self.i) == "DOT" and self.peek(j - self.i + 1) == "ALPHA":
                j += 2
            if self.peek(j - self.i) == "COLON":
                fields = self.parse_field_name()
                self.take("COLON")
                if self.peek() == "LPAREN":
                    self.i += 1
                    vals = [self.parse_field_value()]
                    while self.peek() in _CONST_STARTS | {"PLUS", "MINUS", "PIPE"}:
                        vals.append(self.parse_field_value())
                    self.take("RPAREN")
                    if self.peek() == "BOOST":
                        self.i += 1
                    e = combine(self.default_op, vals)
                elif self.peek() == "RANGE_START":
                    e = self.parse_range()
                else:
                    e = self.parse_field_value()
                e.set_field(fields)
                return e
        if kind == "RANGE_START":
            return self.parse_range()
        return self.parse_field_value()

    def parse_field_name(self) -> list[str]:
        parts = [self.take("ALPHA")]
        while self.peek() == "DOT" and self.peek(1) == "ALPHA":
            self.i += 1
            parts.append(self.take("ALPHA"))
        return parts

    def parse_field_value(self) -> Any:
        kind = self.peek()
        if kind == "PLUS":
            self.i += 1
            return QSMust("AND", self.parse_field_constant())
        if kind == "PIPE":
            self.i += 1
            return QSMust("OR", self.parse_field_constant())
        if kind == "MINUS":
            self.i += 1
            return QSMust("AND", QSExpr1("NOT", self.parse_field_constant()))
        return self.parse_field_constant()

    def parse_field_constant(self) -> Any:
        kind = self.peek()
        if kind == "FLOAT":
            e = QSField(self.take("FLOAT"), FLOATV, "=")
        elif kind == "INT":
            e = QSField(self.take("INT"), INTV, "=")
        elif kind == "BOOL":
            e = QSField(self.take("BOOL"), BOOLV, "=")
        elif kind == "ALPHA":
            e = QSField(self.take("ALPHA"), TEXT, "=")
        elif kind == "QUOTED":
            e = QSField(self.take("QUOTED"), TEXT, "=")
        elif kind == "REGEX":
            e = QSField(self.take("REGEX"), REGEXV, "=")
        elif kind == "OP":
            op = self.take("OP")
            if self.peek() == "FLOAT":
                e = QSField(self.take("FLOAT"), FLOATV, op)
            else:
                e = QSField(self.take("INT"), INTV, op)
        else:
            raise QSParseError(
                f"query_string: expected a value, got {kind} at token {self.i}"
            )
        if self.peek() == "FUZZY":
            self.i += 1  # fuzziness is parsed and dropped
        if self.peek() == "BOOST":
            self.i += 1
        return e

    def parse_range(self) -> Any:
        """[a TO b] / {a TO b} — '*' on either end drops that bound."""
        lo_incl = self.take("RANGE_START")
        lo = self.parse_range_bound()
        self.take("TO")
        hi = self.parse_range_bound()
        hi_incl = self.take("RANGE_END")
        if self.peek() == "BOOST":
            self.i += 1
        lo.op = ">=" if lo_incl else ">"
        hi.op = "<=" if hi_incl else "<"
        lo_star = lo.vtype == TEXT and lo.value == "*"
        hi_star = hi.vtype == TEXT and hi.value == "*"
        if lo_star and hi_star:
            return QSValue(True)
        if lo_star:
            return hi
        if hi_star:
            return lo
        return QSExpr2("AND", lo, hi)

    def parse_range_bound(self) -> QSField:
        kind = self.peek()
        if kind == "FLOAT":
            return QSField(self.take("FLOAT"), FLOATV, "=")
        if kind == "INT":
            return QSField(self.take("INT"), INTV, "=")
        if kind == "ALPHA":
            return QSField(self.take("ALPHA"), TEXT, "=")
        if kind == "QUOTED":
            return QSField(self.take("QUOTED"), TEXT, "=")
        raise QSParseError(
            f"query_string: bad range bound {kind} at token {self.i}"
        )


def parse(query: str, default_operator: str = "OR") -> Any:
    """Parse a query_string into the qs AST (fields not yet bound)."""
    return _Parser(tokenize(query), default_operator.upper()).parse()


# ---------------------------------------------------------------------
# field typing (expr.go ParseExprFieldNameParts + type_format.go mapType)
# ---------------------------------------------------------------------

def _map_type(key: str, mapping: dict[str, dict] | None) -> dict | None:
    """type_format.go:151-171 — exact key first, else the longest
    matching '*' wildcard pattern."""
    if not mapping:
        return None
    if key in mapping:
        return mapping[key]
    best, best_len = None, -1
    for pat, tm in mapping.items():
        if "*" not in pat:
            continue
        rx = "^" + ".*".join(re.escape(p) for p in pat.split("*")) + "$"
        if re.match(rx, key) and len(pat) > best_len:
            best, best_len = tm, len(pat)
    if best is not None and best.get("type"):
        return best
    return None


def _resolve_field(
    parts: list[str], mapping: dict[str, dict] | None
) -> tuple[list[str], str]:
    """Strip '@' prefixes, detect a trailing subfield (.keyword/.raw
    per the mapping, or bare .keyword with no mapping), and return
    (field parts, effective type)  [expr.go:601-662]."""
    parts = [p.lstrip("@") for p in parts]
    fields: list[str] = []
    subfield = ""
    for i, part in enumerate(parts):
        if i == len(parts) - 1 and fields:
            tm = _map_type(".".join(fields), mapping)
            if tm is not None:
                if part in (tm.get("fields") or {}):
                    subfield = part
                    break
            elif part == "keyword":
                subfield = "keyword"
                break
        fields.append(part)
    tm = _map_type(".".join(fields), mapping)
    if tm is None:
        ftype = ""
    elif subfield:
        ftype = (tm.get("fields") or {}).get(subfield, "")
    else:
        ftype = tm.get("type", "")
    return fields, ftype


def _field_col(fields: list[str]) -> Column:
    col = F.col("`%s`" % fields[0].replace("`", ""))
    for p in fields[1:]:
        col = col.getField(p)
    return col


# ---------------------------------------------------------------------
# wildcard translation (qs.go:390-438)
# ---------------------------------------------------------------------

def _translate_wildcard(value: str) -> tuple[str, bool]:
    """Lucene * / ? → SQL LIKE % / _ ; returns (pattern, had_wildcard)."""
    out, wild, esc = [], False, False
    for ch in value:
        if esc:
            out.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
            wild = True
        elif ch == "*":
            out.append("%")
            wild = True
        elif ch == "?":
            out.append("_")
            wild = True
        else:
            out.append(ch)
    return "".join(out), wild


def _translate_wildcard_regex(value: str) -> str:
    """Lucene * / ? → regex .* / . with everything else quoted."""
    out, esc = [], False
    for ch in value:
        if esc:
            out.append(re.escape(ch))
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


# ---------------------------------------------------------------------
# Column generation (qs.go:236-388)
# ---------------------------------------------------------------------

_CMP = {
    "=": lambda c, v: c == v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
}


def _schema_type(fields: list[str], schema) -> str | None:
    """Resolve the Spark type name of a (possibly nested) field from a
    StructType, or None when unknown."""
    if schema is None:
        return None
    cur = schema
    for i, p in enumerate(fields):
        names = {f.name: f for f in getattr(cur, "fields", [])}
        if p not in names:
            return None
        dt = names[p].dataType
        if i == len(fields) - 1:
            return dt.typeName()
        cur = dt
    return None


_NUMERIC_TYPES = {
    "byte", "short", "integer", "long", "float", "double", "decimal",
}


def _field_to_column(
    e: QSField, default_field: list[str],
    mapping: dict[str, dict] | None, schema=None,
) -> Column:
    parts = e.fields if e.fields else default_field
    if not parts:
        raise QSParseError("query_string: no field name set")
    fields, ftype = _resolve_field(parts, mapping)
    col = _field_col(fields)

    if e.op == "EXISTS":
        return col.isNotNull()

    if e.op == "=" and e.vtype == TEXT and str(e.value).lower() in (
        "true", "false",
    ):
        return col == F.lit(str(e.value).lower() == "true")

    if e.vtype == TEXT and e.op == "=":
        if ftype == "keyword":
            pat, wild = _translate_wildcard(e.value)
            return col.like(pat) if wild else col == F.lit(e.value)
        if ftype == "keyword-ignore-case":
            pat, wild = _translate_wildcard(e.value)
            if wild:
                return F.lower(col).like(pat.lower())
            return F.lower(col) == F.lit(e.value.lower())
        if ftype == "contains":
            return col.rlike("(?i)" + _translate_wildcard_regex(e.value))
        if ftype in ("", "text"):
            # case-insensitive whole-word match
            rx = ("(^|[ \t])(?i)" + _translate_wildcard_regex(e.value)
                  + "([ \t]|$)")
            return col.rlike(rx)
        # any other mapped type (e.g. datetime): the reference's
        # '=' switch has no case, so the comparison literal stays nil
        # — `field = NULL`, matching nothing (qs.go:257-340)
        return col == F.lit(None)

    if e.vtype == REGEXV:
        if e.op != "=":
            raise QSParseError("query_string: invalid regex operator")
        if ftype == "keyword":
            return col.rlike("^" + e.value + "$")
        if ftype == "keyword-ignore-case":
            return col.rlike("^(?i)" + e.value + "$")
        if ftype == "contains":
            return col.rlike("(?i)" + e.value)
        return F.lower(col).rlike("(^|[ \t])" + e.value + "([ \t]|$)")

    value = e.value
    if e.vtype == TEXT and ftype == "datetime":
        return _CMP[e.op](col, F.lit(value).try_cast("timestamp"))
    if e.vtype in (FLOATV, INTV):
        # the reference's comparisons never abort — a failed cast is
        # MISSING (row dropped).  When the schema says the column is
        # already numeric, compare natively (an int literal against an
        # int column keeps the predicate parquet-pushable — at scale
        # that is row-group pruning); otherwise try_cast to double,
        # which reproduces MISSING-on-bad-cast under ANSI mode and
        # matches non-ANSI string/number coercion
        if _schema_type(fields, schema) in _NUMERIC_TYPES:
            return _CMP[e.op](col, F.lit(value))
        return _CMP[e.op](col.try_cast("double"), F.lit(float(value)))
    return _CMP[e.op](col, F.lit(value))


def to_column(
    node: Any,
    default_field: list[str] | None = None,
    mapping: dict[str, dict] | None = None,
    schema=None,
) -> Column:
    """Lower a parsed qs AST to a Spark boolean Column."""
    if isinstance(node, QSValue):
        return F.lit(node.value)
    if isinstance(node, QSExpr1):
        return ~to_column(node.expr, default_field, mapping, schema)
    if isinstance(node, QSExpr2):
        a = to_column(node.e1, default_field, mapping, schema)
        b = to_column(node.e2, default_field, mapping, schema)
        return (a & b) if node.op == "AND" else (a | b)
    if isinstance(node, QSMust):  # un-combined must acts as its body
        return to_column(node.expr, default_field, mapping, schema)
    if isinstance(node, QSField):
        return _field_to_column(node, default_field or [], mapping, schema)
    raise QSParseError(f"query_string: unknown node {node!r}")


def qs_to_column(
    body: dict[str, Any] | str,
    mapping: dict[str, dict] | None = None,
    schema=None,
) -> Column:
    """Translate an Elastic ``query_string`` clause body (or a bare
    query text) into a boolean Column.

    `mapping` mirrors the proxy's index TypeMapping:
    ``{"field_or_pat*": {"type": "text", "fields": {"keyword":
    "keyword", "raw": "keyword-ignore-case"}}}``.  With no mapping,
    fields behave as analyzed text and a trailing ``.keyword`` selects
    exact matching — the proxy's defaults.

    Per query.go:488-510, multi-field ``fields`` are combined with AND
    and ``default_operator`` defaults to OR.
    """
    if isinstance(body, str):
        body = {"query": body}
    node = parse(body["query"], body.get("default_operator", "OR"))
    fields = body.get("fields")
    if fields:
        cols = [
            to_column(node, f.split("."), mapping, schema) for f in fields
        ]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out
    default = body.get("default_field", "")
    return to_column(
        node, default.split(".") if default else [], mapping, schema)
