"""Variant-mode replay: reference cases over heterogeneously-typed columns.

The reference engine is schema-on-read with per-VALUE dynamic typing
(ion values; ``vm/bytecode.go`` dispatches per lane on the ion tag), so a
single column may hold ints, strings, bools, lists and structs in
different rows, and every scalar operator degrades to MISSING on a
type it does not accept (``expr/builtin.go``, ``vm/expr.go``).  Spark
columns are statically typed, so the faithful replay substrate is the
Spark 4 VARIANT type: each top-level column loads as
``try_variant_get(parse_json(line), '$.col')`` and the translated query
is rewritten so every operation dispatches on the per-value type —
exactly the reference's lane-level behavior, expressed as Catalyst
expressions (the ``v_*`` helpers are SQL temp functions whose bodies
inline into the plan; no Python boundary).

Type classes mirror ion (``expr/builtin.go:1222`` JSONTypeBits):
null, bool, number (int|float|decimal), timestamp (strings in the
ingestion timestamp shape become ion timestamps), string, list, struct;
MISSING is a SQL NULL variant (an absent key), distinct from an ion
null (``is_variant_null``).  This preserves the reference's
MISSING-vs-NULL discipline with no shadow columns.

Semantics encoded here, each pinned by a reference case:
- equality with a type mismatch is FALSE, not MISSING
  (``0007-bool/bool-compare.test`` header FIXME); null==null is TRUE
  (``0092-value-compare``); either side MISSING stays MISSING.
- ordered comparison across types is MISSING; within a type it is the
  natural order (bool: false<true).
- CAST keeps only convertible classes and yields MISSING otherwise
  (``0006-cast/*``): INTEGER/FLOAT accept bool+number, BOOLEAN accepts
  bool+number (!=0), STRING accepts only strings, STRUCT only structs.
- numeric operators/aggregates see only number-class values; BOOL_AND/
  BOOL_OR only bool-class (``0020-aggregate/aggregate-bool-behavior``);
  COUNT(x) counts every non-MISSING value including nulls.
- ORDER BY uses the cross-type total order null < bool < number <
  timestamp < string < list < struct (``0011-sort/0049-value-sort-*``),
  with NULLS FIRST/LAST moving the null/missing band.
- GROUP BY / DISTINCT / COUNT(DISTINCT) key on a canonical per-value
  encoding (``v_key``) that unifies int/float representations of the
  same number, like ion hashing does.
"""

from __future__ import annotations

import json
import re

_TS_SQL_RE = (
    r"^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}"
    r"(\\.\\d+)?(Z|[+-]\\d{2}:?\\d{2})?$"
)

# per-value ion type class; the building block every helper composes
_TYP = f"""
  CASE WHEN {{v}} IS NULL THEN 'missing'
       WHEN is_variant_null({{v}}) THEN 'null'
       WHEN schema_of_variant({{v}}) = 'BOOLEAN' THEN 'bool'
       WHEN schema_of_variant({{v}}) IN ('BIGINT', 'DOUBLE')
            OR schema_of_variant({{v}}) LIKE 'DECIMAL%' THEN 'num'
       WHEN schema_of_variant({{v}}) = 'STRING' THEN
            CASE WHEN cast({{v}} as string) RLIKE '{_TS_SQL_RE}'
                 THEN 'ts' ELSE 'str' END
       WHEN schema_of_variant({{v}}) LIKE 'ARRAY%' THEN 'list'
       ELSE 'struct' END
"""


def _typ(v: str) -> str:
    return _TYP.replace("{v}", v)


# name -> (signature, return type, body)  — all Catalyst-inlined SQL UDFs
_FUNCS: dict[str, tuple[str, str, str]] = {
    "v_typ": ("v variant", "string", _typ("v")),
    # ion total-order rank; null AND missing -> NULL so ORDER BY
    # NULLS FIRST/LAST controls the whole null band
    "v_rank": (
        "v variant",
        "int",
        f"""CASE {_typ('v')}
             WHEN 'bool' THEN 1 WHEN 'num' THEN 2 WHEN 'ts' THEN 3
             WHEN 'str' THEN 4 WHEN 'list' THEN 5 WHEN 'struct' THEN 6
             END""",
    ),
    "v_num": (
        "v variant",
        "double",
        f"CASE WHEN {_typ('v')} = 'num' THEN cast(v as double) END",
    ),
    "v_str": (
        "v variant",
        "string",
        f"CASE WHEN {_typ('v')} = 'str' THEN cast(v as string) END",
    ),
    "v_bool": (
        "v variant",
        "boolean",
        f"CASE WHEN {_typ('v')} = 'bool' THEN cast(v as boolean) END",
    ),
    "v_ts": (
        "v variant",
        "timestamp",
        f"CASE WHEN {_typ('v')} = 'ts' THEN to_timestamp(cast(v as string)) END",
    ),
    "v_arr": (
        "v variant",
        "array<variant>",
        f"CASE WHEN {_typ('v')} = 'list' THEN cast(v as array<variant>) END",
    ),
    # COALESCE skips NULL and MISSING alike: demote ion null to SQL NULL
    "v_nn": (
        "v variant",
        "variant",
        "CASE WHEN is_variant_null(v) THEN NULL ELSE v END",
    ),
    # SIZE(): list length or struct field count (vm list/struct SIZE)
    "v_size": (
        "v variant",
        "bigint",
        f"""CASE {_typ('v')}
             WHEN 'list' THEN size(cast(v as array<variant>))
             WHEN 'struct' THEN size(map_keys(cast(v as map<string, variant>)))
             END""",
    ),
    # ARRAY_SIZE(): lists only
    "v_asize": (
        "v variant",
        "bigint",
        f"CASE WHEN {_typ('v')} = 'list' "
        "THEN size(cast(v as array<variant>)) END",
    ),
    # TYPE_BIT bit assignments: expr/builtin.go:1222 JSONTypeBits
    "v_typebit": (
        "v variant",
        "bigint",
        f"""CASE {_typ('v')}
             WHEN 'missing' THEN 0 WHEN 'null' THEN 1 WHEN 'bool' THEN 2
             WHEN 'num' THEN 4 WHEN 'ts' THEN 8 WHEN 'str' THEN 16
             WHEN 'list' THEN 32 ELSE 64 END""",
    ),
    # canonical grouping key; numbers unify across int/float spellings
    "v_key": (
        "v variant",
        "string",
        f"""CASE {_typ('v')}
             WHEN 'missing' THEN NULL
             WHEN 'null' THEN 'n'
             WHEN 'bool' THEN 'b' || cast(cast(v as boolean) as string)
             WHEN 'num' THEN 'd' || cast(cast(v as double) as string)
             WHEN 'ts' THEN 't' || cast(v as string)
             WHEN 'str' THEN 's' || cast(v as string)
             ELSE 'j' || cast(v as string) END""",
    ),
    # equality: MISSING propagates, null==null, type mismatch -> FALSE
    "v_eq": (
        "a variant, b variant",
        "boolean",
        f"""CASE WHEN a IS NULL OR b IS NULL THEN NULL
             WHEN {_typ('a')} <> {_typ('b')} THEN FALSE
             WHEN is_variant_null(a) THEN TRUE
             WHEN {_typ('a')} = 'num'
                  THEN cast(a as double) = cast(b as double)
             WHEN {_typ('a')} = 'bool'
                  THEN cast(a as boolean) = cast(b as boolean)
             WHEN {_typ('a')} = 'ts'
                  THEN to_timestamp(cast(a as string)) =
                       to_timestamp(cast(b as string))
             ELSE cast(a as string) = cast(b as string) END""",
    ),
    # ordered comparison: within-type order; cross-type -> MISSING;
    # null-vs-null compares equal (0092-value-compare)
    "v_cmpi": (
        "a variant, b variant",
        "int",
        f"""CASE WHEN a IS NULL OR b IS NULL THEN NULL
             WHEN {_typ('a')} <> {_typ('b')} THEN NULL
             WHEN is_variant_null(a) THEN 0
             WHEN {_typ('a')} = 'num' THEN
               CASE WHEN cast(a as double) < cast(b as double) THEN -1
                    WHEN cast(a as double) > cast(b as double) THEN 1
                    ELSE 0 END
             WHEN {_typ('a')} = 'bool' THEN
               CASE WHEN cast(a as boolean) = cast(b as boolean) THEN 0
                    WHEN cast(b as boolean) THEN -1 ELSE 1 END
             WHEN {_typ('a')} = 'ts' THEN
               CASE WHEN to_timestamp(cast(a as string)) <
                         to_timestamp(cast(b as string)) THEN -1
                    WHEN to_timestamp(cast(a as string)) >
                         to_timestamp(cast(b as string)) THEN 1
                    ELSE 0 END
             WHEN {_typ('a')} = 'str' THEN
               CASE WHEN cast(a as string) < cast(b as string) THEN -1
                    WHEN cast(a as string) > cast(b as string) THEN 1
                    ELSE 0 END
             END""",
    ),
    # CAST family: 0006-cast/* semantics (unconvertible -> MISSING)
    "v_cast_int": (
        "v variant",
        "bigint",
        f"""CASE {_typ('v')}
             WHEN 'bool' THEN if(cast(v as boolean), 1, 0)
             WHEN 'num' THEN cast(cast(v as double) as bigint)
             END""",
    ),
    "v_cast_float": (
        "v variant",
        "double",
        f"""CASE {_typ('v')}
             WHEN 'bool' THEN if(cast(v as boolean), 1.0d, 0.0d)
             WHEN 'num' THEN cast(v as double)
             END""",
    ),
    "v_cast_bool": (
        "v variant",
        "boolean",
        f"""CASE {_typ('v')}
             WHEN 'bool' THEN cast(v as boolean)
             WHEN 'num' THEN cast(v as double) <> 0.0d
             END""",
    ),
    "v_cast_str": (
        "v variant",
        "string",
        f"CASE WHEN {_typ('v')} = 'str' THEN cast(v as string) END",
    ),
    "v_cast_struct": (
        "v variant",
        "variant",
        f"CASE WHEN {_typ('v')} = 'struct' THEN v END",
    ),
}

def _inline(fn: str, arg: str) -> str:
    """Expand a single-param v_* UDF body textually around ``arg`` —
    Spark rejects SQL UDF calls inside Sort (UNSUPPORTED_SQL_UDF_USAGE),
    so ORDER BY keys get the raw expression instead of the call."""
    body = _FUNCS[fn][2]
    return "(" + re.sub(r"(?<![\w_])v(?![\w_])", f"({arg})", body) + ")"


_REGISTERED: set[int] = set()


def ensure_variant_udfs(spark) -> None:
    if id(spark) in _REGISTERED:
        return
    for name, (sig, ret, body) in _FUNCS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
    _REGISTERED.add(id(spark))


# ---------------------------------------------------------------------------
# input loading: every top-level column becomes a VARIANT


def collect_columns(input_lines: list[str]) -> list[str]:
    cols: list[str] = []
    for line in input_lines:
        try:
            row = json.loads(line)
        except Exception:  # noqa: BLE001
            continue
        if isinstance(row, dict):
            for k in row:
                if k not in cols:
                    cols.append(k)
    return cols


def load_variant_input(spark, input_lines: list[str], extra_cols=(),
                       with_seq: bool = False):
    cols = collect_columns(input_lines)
    for c in extra_cols:
        if c not in cols:
            cols.append(c)
    raw = spark.createDataFrame(
        [(i, l) for i, l in enumerate(input_lines or ["{}"])],
        "__seq long, line string",
    )
    raw.createOrReplaceTempView("__v_raw")
    proj = ", ".join(
        f"try_variant_get(__v, '$.{c}') AS `{c}`" for c in cols
    ) or "__v AS `__row`"
    if with_seq:
        # ingest order, for first-seen semantics (DISTINCT ... LIMIT)
        proj += ", __seq"
    return spark.sql(
        f"SELECT {proj} FROM "
        f"(SELECT parse_json(line) AS __v, __seq FROM __v_raw)"
    )


def register_variant_inputs(spark, inputs, extra_cols=(),
                            with_seq: bool = False):
    views = {}
    names = (
        ["input"] if len(inputs) == 1 else [f"input{i}" for i in range(len(inputs))]
    )
    for name, lines in zip(names, inputs):
        df = load_variant_input(spark, lines, extra_cols, with_seq)
        df.createOrReplaceTempView(name)
        views[name] = df
        # raw-document twin for UNPIVOT (see replay._rewrite_unpivot)
        spark.createDataFrame(
            [(l,) for l in (lines or ["{}"])], "__js string"
        ).createOrReplaceTempView(f"{name}__rawjson")
    return views


# ---------------------------------------------------------------------------
# the rewriter: translated Spark SQL -> variant-dispatched Spark SQL

_PH = "\x01{}\x01"
_PH_RE = re.compile("\x01(\\d+)\x01")


class _Rewriter:
    def __init__(self, cols: set[str]):
        self.cols = cols
        self.terms: list[str] = []

    def ph(self, term_sql: str) -> str:
        self.terms.append(term_sql)
        return _PH.format(len(self.terms) - 1)

    def term(self, ph_text: str) -> str:
        return self.terms[int(_PH_RE.fullmatch(ph_text).group(1))]

    # -- step 1: placeholder-ize column refs (with .field / [idx] paths)
    def mark_columns(self, sql: str) -> str:
        if not self.cols:
            return sql
        names = "|".join(re.escape(c) for c in sorted(self.cols, key=len, reverse=True))
        pat = re.compile(
            rf"(?<![\w`.\x01])(`(?:{names})`|\b(?:{names})\b)"
            rf"((?:\.\w+|\[\d+\])*)(?!\s*\()(?![\w`])"
        )

        def repl(m):
            col = m.group(1)
            if not col.startswith("`"):
                col = f"`{col}`"
            path = m.group(2)
            if path:
                jp = "$" + re.sub(r"\.(\w+)", r".\1", path)
                return self.ph(f"try_variant_get({col}, '{jp}')")
            return self.ph(col)

        # don't touch quoted string literals
        out, i = [], 0
        for sm in re.finditer(r"'(?:[^']|'')*'", sql):
            out.append(pat.sub(repl, sql[i:sm.start()]))
            out.append(sm.group(0))
            i = sm.end()
        out.append(pat.sub(repl, sql[i:]))
        return "".join(out)

    # -- operand helpers for comparisons
    def as_variant(self, operand: str) -> str:
        operand = operand.strip()
        m = _PH_RE.fullmatch(operand)
        if m:
            return self.term(operand)
        return f"cast({operand} as variant)"


_P = r"\x01\d+\x01"
_LIT = r"(?:-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|'(?:[^']|'')*'|TRUE|FALSE|NULL)"


def variantize(sql: str, cols: set[str]) -> str:
    """Rewrite translated Spark SQL so ops over the (all-VARIANT) input
    columns dispatch per-value, matching the reference's dynamic typing."""
    rw = _Rewriter(cols)
    # identifiers introduced by AS aliases shadow input columns in
    # ORDER BY / PARTITION BY; don't variant-ize those names unless the
    # alias IS the column itself
    _type_kw = {
        "bigint", "int", "integer", "smallint", "tinyint", "long",
        "double", "float", "real", "decimal", "boolean", "string",
        "varchar", "char", "binary", "date", "timestamp", "struct",
        "array", "map", "variant", "interval",
    }
    aliased = {
        m.group(2).strip("`").lower()
        for m in re.finditer(r"\bAS\s+(`?)([A-Za-z_]\w*)\1", sql, re.IGNORECASE)
    } - _type_kw
    # LATERAL VIEW explode aliases BIND variant array elements — they
    # are variant terms, not shadowing projections (0015-unnest)
    lv_aliases = {
        m.group(1)
        for m in re.finditer(
            r"LATERAL\s+VIEW\s+\w+\s*\((?:[^()]|\([^()]*\))*\)\s*\w+\s+AS\s+"
            r"`?(\w+)`?",
            sql, re.IGNORECASE,
        )
    }
    aliased -= {a.lower() for a in lv_aliases}
    live = {c for c in cols if c.lower() not in aliased} | lv_aliases
    rw.cols = live
    sql = rw.mark_columns(sql)
    # table-qualified refs (alias.col) escape mark_columns' unqualified
    # pattern; mark them too so GROUP BY/aggregates dispatch on variant
    qual_names = "|".join(
        re.escape(c) for c in sorted(cols, key=len, reverse=True)
    )
    if qual_names:
        sql = re.sub(
            rf"(?<![\w`.\x01])(`\w+`|\w+)\s*\.\s*(`(?:{qual_names})`"
            rf"|(?:{qual_names})\b)(?!\s*\()(?![\w`])",
            lambda m: rw.ph(
                f"{m.group(1) if m.group(1).startswith('`') else '`' + m.group(1) + '`'}"
                f".{m.group(2) if m.group(2).startswith('`') else '`' + m.group(2) + '`'}"
            ),
            sql,
        )
    # explode over a variant needs an array<variant> operand
    sql = re.sub(
        r"\b(explode|explode_outer|posexplode|posexplode_outer)\s*\(\s*"
        r"([\w\x01.`]+)\s*\)",
        lambda m: f"{m.group(1)}(v_arr({m.group(2)}))",
        sql, flags=re.IGNORECASE,
    )

    P, LIT = _P, _LIT

    def T(m, g=1):
        return rw.term(m.group(g))

    for _ in range(4):
        before = sql

        # aggregates -------------------------------------------------
        sql = re.sub(
            rf"\bCOUNT\s*\(\s*DISTINCT\s+({P})\s*\)",
            lambda m: f"count(DISTINCT v_key({T(m)}))",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\bCOUNT\s*\(\s*({P})\s*\)",
            lambda m: f"count({T(m)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\b(SUM|AVG|MIN|MAX)\s*\(\s*({P})\s*\)",
            lambda m: f"{m.group(1)}(v_num({T(m, 2)}))",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\b(BOOL_AND|BOOL_OR|EVERY|ANY|SOME)\s*\(\s*({P})\s*\)",
            lambda m: f"{m.group(1)}(v_bool({T(m, 2)}))",
            sql, flags=re.IGNORECASE)

        # scalar functions --------------------------------------------
        sql = re.sub(
            rf"\b(LOWER|UPPER|TRIM|LTRIM|RTRIM|LENGTH|CHAR_LENGTH|REVERSE"
            rf"|SUBSTRING|SUBSTR|LEFT|RIGHT|SPLIT_PART|REPLACE|CONCAT)"
            rf"\s*\(\s*({P})",
            lambda m: f"{m.group(1)}(v_str({T(m, 2)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\b(ABS|FLOOR|CEIL|CEILING|SQRT|LN|LOG|LOG2|LOG10|EXP|ROUND"
            rf"|TRUNC|SIGN|POW|POWER)\s*\(\s*({P})",
            lambda m: f"{m.group(1)}(v_num({T(m, 2)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"(\bPOW(?:ER)?\s*\((?:[^()]|\([^()]*\))*,\s*)({P})(\s*\))",
            lambda m: f"{m.group(1)}v_num({T(m, 2)}){m.group(3)}",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\b(DATE_TRUNC\s*\(\s*'[^']*'\s*,\s*)({P})",
            lambda m: f"{m.group(1)}v_ts({T(m, 2)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\bTYPE_BIT\s*\(\s*({P})\s*\)",
            lambda m: f"v_typebit({T(m)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(r"\bTYPE_BIT\s*\(", "v_typebit(", sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\bSIZE\s*\(\s*({P})\s*\)",
            lambda m: f"v_size({T(m)})",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\bARRAY_SIZE\s*\(\s*({P})\s*\)",
            lambda m: f"v_asize({T(m)})",
            sql, flags=re.IGNORECASE)
        # lambda bodies cannot call SQL UDFs (the lambda variable does
        # not resolve inside the expanded function): inline v_eq
        sql = re.sub(
            rf"\bARRAY_CONTAINS\s*\(\s*({P})\s*,\s*({P})\s*\)",
            lambda m: (
                f"exists(v_arr({T(m)}), "
                f"__e -> {inline_all(f'v_eq(__e, {T(m, 2)})')})"
            ),
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"\bARRAY_POSITION\s*\(\s*({P})\s*,\s*({P})\s*\)",
            lambda m: (
                f"nullif(array_position(transform(v_arr({T(m)}), "
                f"__e -> coalesce({inline_all(f'v_eq(__e, {T(m, 2)})')}, "
                f"false)), true), 0)"
            ),
            sql, flags=re.IGNORECASE)

        # CAST family --------------------------------------------------
        for spark_t, fn in [
            ("BIGINT", "v_cast_int"), ("INT", "v_cast_int"),
            ("DOUBLE", "v_cast_float"), ("FLOAT", "v_cast_float"),
            ("BOOLEAN", "v_cast_bool"), ("STRING", "v_cast_str"),
            ("STRUCT", "v_cast_struct"), ("VARIANT", "v_cast_struct"),
        ]:
            sql = re.sub(
                rf"\bCAST\s*\(\s*({P})\s+AS\s+{spark_t}\s*\)",
                lambda m, fn=fn: f"{fn}({T(m)})",
                sql, flags=re.IGNORECASE)

        # predicates ---------------------------------------------------
        sql = re.sub(
            rf"({P})\s+IS\s+NOT\s+NULL\b",
            lambda m: f"(v_nn({T(m)}) IS NOT NULL)",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"({P})\s+IS\s+NULL\b",
            lambda m: f"(v_nn({T(m)}) IS NULL)",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"({P})\s+IS\s+(NOT\s+)?TRUE\b",
            lambda m: f"(v_bool({T(m)}) IS {m.group(2) or ''}TRUE)",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"({P})\s+IS\s+(NOT\s+)?FALSE\b",
            lambda m: f"(v_bool({T(m)}) IS {m.group(2) or ''}FALSE)",
            sql, flags=re.IGNORECASE)
        sql = re.sub(
            rf"({P})\s+(NOT\s+)?(LIKE|RLIKE|REGEXP)\b",
            lambda m: f"v_str({T(m)}) {m.group(2) or ''}{m.group(3)}",
            sql, flags=re.IGNORECASE)

        # IN (literal list) -> OR-chain of v_eq ------------------------
        def in_repl(m):
            term = T(m)
            neg = bool(m.group(2))
            items = _split_args(m.group(3))
            parts = [f"v_eq({term}, {rw.as_variant(i)})" for i in items]
            expr = "(" + " OR ".join(parts) + ")"
            return f"(NOT {expr})" if neg else expr

        sql = re.sub(
            rf"({P})\s+(NOT\s+)?IN\s*\(([^()]*)\)",
            in_repl, sql, flags=re.IGNORECASE)

        # COALESCE over variant args -----------------------------------
        def coalesce_repl(m):
            items = _split_args(m.group(1))
            if not any(_PH_RE.fullmatch(i.strip()) for i in items):
                return m.group(0)
            parts = []
            for i in items:
                i = i.strip()
                if _PH_RE.fullmatch(i):
                    parts.append(f"v_nn({rw.term(i)})")
                else:
                    parts.append(rw.as_variant(i))
            return rw.ph(f"coalesce({', '.join(parts)})")

        sql = re.sub(
            rf"\bCOALESCE\s*\(([^()]*{P}[^()]*)\)",
            coalesce_repl, sql, flags=re.IGNORECASE)

        # a (non-call) parenthesized lone placeholder is the placeholder
        sql = re.sub(
            rf"(?<![\w`\x01])\(\s*({P})\s*\)", lambda m: m.group(1), sql)

        # arithmetic context -> numeric value ---------------------------
        sql = re.sub(
            rf"({P})\s*([+\-*/%])",
            lambda m: f"v_num({T(m)}) {m.group(2)}",
            sql)
        sql = re.sub(
            rf"([+\-*/%])\s*({P})",
            lambda m: f"{m.group(1)} v_num({T(m, 2)})",
            sql)

        # comparisons ----------------------------------------------------
        OPND = rf"(?:{P}|{LIT}|\((?:[^()]|\([^()]*\))*\))"
        for op, fn in [
            ("<=", "v_cmpi({a}, {b}) <= 0"), (">=", "v_cmpi({a}, {b}) >= 0"),
            ("<>", "(NOT v_eq({a}, {b}))"), ("!=", "(NOT v_eq({a}, {b}))"),
            ("=", "v_eq({a}, {b})"),
            ("<", "v_cmpi({a}, {b}) < 0"), (">", "v_cmpi({a}, {b}) > 0"),
        ]:
            opre = re.escape(op)
            if op in ("<", ">"):
                opre += r"(?![=>])"
            elif op == "=":
                opre = r"(?<![<>!])="

            def cmp_repl(m, fn=fn):
                a, b = m.group(1).strip(), m.group(2).strip()
                if not (_PH_RE.fullmatch(a) or _PH_RE.fullmatch(b)):
                    return m.group(0)
                return fn.format(a=rw.as_variant(a), b=rw.as_variant(b))

            sql = re.sub(
                rf"({OPND})\s*{opre}\s*({OPND})", cmp_repl, sql)

        sql = _rewrite_paren_cmp(sql, rw)

        # CASE whose arms involve variants -> variant-typed CASE --------
        sql = _rewrite_cases(sql, rw)

        # array()/named_struct() constructors with variant members ------
        sql = _rewrite_ctors(sql, rw)

        # GROUP BY / ORDER BY / DISTINCT --------------------------------
        sql = _rewrite_group_order(sql, rw)

        if sql == before:
            break

    sql = _rewrite_window_alias(sql)
    sql = _exists_eq(sql)
    sql = _orderby_select_alias(sql)

    # leftover placeholders project the raw variant value
    grouped = "GROUP BY" in sql.upper()
    sql = _PH_RE.sub(
        lambda m: (
            f"any_value({rw.terms[int(m.group(1))]})"
            if grouped and f"v_key({rw.terms[int(m.group(1))]})" in sql
            else rw.terms[int(m.group(1))]
        ),
        sql,
    )
    return sql


def _rewrite_paren_cmp(sql: str, rw: _Rewriter) -> str:
    """``(bool-expr) <op> <variant-term>``: the left operand is a
    balanced paren group (e.g. a rewritten IN-chain compared against a
    mixed column, 0003-in/in-const-2)."""
    pat = re.compile(rf"\)\s*(<=|>=|<>|!=|=|<|>)\s*({_P})")
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        depth, i = 1, m.start() - 1
        while i >= 0 and depth:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
            i -= 1
        if depth:
            return sql
        start = i + 1
        # a preceding identifier makes the group a call: include it
        j = start - 1
        while j >= 0 and (sql[j].isalnum() or sql[j] in "_`"):
            j -= 1
        start = j + 1
        grp = sql[start : m.start() + 1]
        a = f"cast(({grp}) as variant)"
        b = rw.term(m.group(2))
        op = m.group(1)
        expr = {
            "=": f"v_eq({a}, {b})",
            "<>": f"(NOT v_eq({a}, {b}))",
            "!=": f"(NOT v_eq({a}, {b}))",
            "<": f"v_cmpi({a}, {b}) < 0",
            "<=": f"v_cmpi({a}, {b}) <= 0",
            ">": f"v_cmpi({a}, {b}) > 0",
            ">=": f"v_cmpi({a}, {b}) >= 0",
        }[op]
        sql = sql[:start] + expr + sql[m.end() :]


def _split_args(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [a for a in (x.strip() for x in out) if a]


def _find_case_spans(sql: str):
    """Innermost-first CASE...END spans."""
    spans = []
    uppers = sql.upper()
    starts = [m.start() for m in re.finditer(r"\bCASE\b", uppers)]
    for st in starts:
        depth = 0
        for m in re.finditer(r"\b(CASE|END)\b", uppers[st:]):
            if m.group(1) == "CASE":
                depth += 1
            else:
                depth -= 1
                if depth == 0:
                    spans.append((st, st + m.end()))
                    break
    # innermost first: no other span strictly inside
    inner = [
        s for s in spans
        if not any(o != s and s[0] < o[0] and o[1] < s[1] for o in spans)
    ]
    return inner


def _rewrite_cases(sql: str, rw: _Rewriter) -> str:
    """A CASE whose arms touch variant values returns VARIANT: wrap each
    THEN/ELSE result as variant and re-placeholder the whole CASE so
    downstream context rules (arithmetic, comparisons) see one term."""
    changed = True
    while changed:
        changed = False
        for st, en in _find_case_spans(sql):
            body = sql[st:en]
            if not (_PH_RE.search(body) or re.search(r"\bv_\w+\(", body)):
                continue
            if "\x02" in body:
                continue
            # split arms at depth 0 of parens (no nested CASE by
            # construction: innermost-first)
            toks = list(re.finditer(
                r"\b(WHEN|THEN|ELSE|END)\b|[()]", body[4:], re.IGNORECASE))
            parts, depth = [], 0
            for m in toks:
                g = m.group(0)
                if g == "(":
                    depth += 1
                elif g == ")":
                    depth -= 1
                elif depth == 0:
                    parts.append((g.upper(), m.start() + 4, m.end() + 4))
            if not parts or parts[-1][0] != "END":
                continue
            out, ok = ["CASE"], True
            i = 0
            while i < len(parts) - 1:
                kw, _, kend = parts[i]
                nxt_start = parts[i + 1][1]
                seg = body[kend:nxt_start]
                if kw == "WHEN":
                    out.append(" WHEN" + seg)
                elif kw in ("THEN", "ELSE"):
                    res = seg.strip()
                    if _PH_RE.fullmatch(res):
                        res = rw.term(res)
                    elif _PH_RE.search(res):
                        ok = False
                        break
                    else:
                        res = f"cast({res} as variant)"
                    out.append(f" {kw} {res} ")
                i += 1
            if not ok:
                continue
            out.append("END")
            new = rw.ph("".join(out))
            sql = sql[:st] + new + sql[en:]
            changed = True
            break
    return sql


def _rewrite_ctors(sql: str, rw: _Rewriter) -> str:
    """array(...)/named_struct(...) mixing variant members and literals:
    lift every member to VARIANT so the constructor type-checks."""

    def fix(m):
        fn = m.group(1).lower()
        args = _split_args(m.group(2))
        if not any(_PH_RE.search(a) for a in args):
            return m.group(0)
        out = []
        for idx, a in enumerate(args):
            if fn == "named_struct" and idx % 2 == 0:
                out.append(a)
            elif _PH_RE.fullmatch(a):
                out.append(rw.term(a))
            elif re.match(r"named_struct\s*\(", a, re.IGNORECASE):
                # struct-typed exprs cannot CAST to variant; Spark 4
                # provides to_variant_object for exactly this lift
                out.append(f"to_variant_object({a})")
            elif _PH_RE.search(a):
                out.append(f"cast(({a}) as variant)")
            else:
                out.append(f"cast({a} as variant)")
        body = f"{fn}({', '.join(out)})"
        if fn == "array":
            # constructed lists omit MISSING members (0093-value-make)
            body = f"filter({body}, __m -> __m IS NOT NULL)"
        return body

    prev = None
    while prev != sql:
        prev = sql
        sql = re.sub(
            r"\b(array|named_struct)\s*\(((?:[^()]|\([^()]*\))*)\)",
            fix, sql, flags=re.IGNORECASE)
    return sql


def _select_items_span(sql: str):
    """(start, end) of the top-level SELECT list, or None."""
    m = re.search(r"\bSELECT\b(\s+DISTINCT\b)?", sql, re.IGNORECASE)
    if not m:
        return None
    start = m.end()
    depth = 0
    for t in re.finditer(r"[()]|\bFROM\b", sql[start:], re.IGNORECASE):
        g = t.group(0)
        if g == "(":
            depth += 1
        elif g == ")":
            depth -= 1
        elif depth == 0:
            return (start, start + t.start())
    return None


def _rewrite_group_order(sql: str, rw: _Rewriter) -> str:
    # GROUP BY <ph>[, <ph>...] -> canonical v_key terms
    def gb_repl(m):
        items = _split_args(m.group(1))
        out = []
        for i in items:
            i = i.strip()
            if _PH_RE.fullmatch(i):
                out.append(f"v_key({rw.term(i)})")
            else:
                out.append(i)
        return "GROUP BY " + ", ".join(out)

    sql = re.sub(
        rf"\bGROUP\s+BY\s+((?:{_P}|[\w`.]+)(?:\s*,\s*(?:{_P}|[\w`.]+))*)",
        gb_repl, sql, flags=re.IGNORECASE)

    grouped = re.search(r"\bGROUP\s+BY\b", sql, re.IGNORECASE) is not None

    # the reference drops rows whose group key is MISSING
    # (0022-aggregate-group-by: rows lacking col1/col2 appear in no
    # group); a MISSING key canonicalises to NULL v_key
    gkeys = re.findall(r"GROUP BY ((?:v_key\([^()]*\)(?:, )?)+)", sql)
    if gkeys:
        keys = re.findall(r"v_key\([^()]*\)", gkeys[0])
        guard = " AND ".join(f"{k} IS NOT NULL" for k in keys)
        if f"({guard}) AND" in sql or f"WHERE {guard}" in sql:
            gkeys = []
    if gkeys:
        wm = re.search(r"\bWHERE\b\s", sql, re.IGNORECASE)
        if wm:
            sql = sql[: wm.end()] + f"({guard}) AND " + sql[wm.end():]
        else:
            sql = re.sub(r"\bGROUP\s+BY\b", f"WHERE {guard} GROUP BY", sql,
                         count=1, flags=re.IGNORECASE)

    # grouped: a bare select-item placeholder projects the (constant
    # within the group) value -> any_value(term) AS <name>
    if grouped:
        span = _select_items_span(sql)
        if span:
            st, en = span
            items = _split_args(sql[st:en])
            new_items, changed = [], False
            for it in items:
                s = it.strip()
                m = re.fullmatch(rf"({_P})(?:\s+AS\s+(\S+))?", s,
                                 re.IGNORECASE)
                if m:
                    term = rw.term(m.group(1))
                    # a qualified ref aliases as its LAST component
                    base = term.rsplit(".", 1)[-1] if re.fullmatch(
                        r"(?:`\w+`|\w+)(?:\.(?:`[\w ]+`|\w+))+", term
                    ) else term
                    name = m.group(2) or (
                        base if base.startswith("`") else f"`{base}`"
                    )
                    new_items.append(f"any_value({term}) AS {name}")
                    changed = True
                else:
                    new_items.append(s)
            if changed:
                sql = sql[:st] + "\n  " + ",\n  ".join(new_items) + "\n" + sql[en:]

    def _multikey(term: str, d: str, n: str) -> list[str]:
        keys = [f"{_inline('v_rank', term)} {d} {n}".strip()]
        for k in ("v_bool", "v_num", "v_ts", "v_str"):
            keys.append(f"{_inline(k, term)} {d}".strip())
        keys.append(
            f"CASE WHEN {_inline('v_rank', term)} >= 5 "
            f"THEN cast({term} as string) END {d}".strip()
        )
        return keys

    # ORDER BY <ph>: cross-type total order.  Grouped queries hoist the
    # sort above the aggregate (over the aliased output column) because
    # aggregate-wrapped sort keys confuse attribute resolution.
    om = re.search(
        rf"\bORDER\s+BY\s+({_P})\s*(ASC|DESC)?\s*"
        rf"(NULLS\s+(?:FIRST|LAST))?\s*",
        sql, re.IGNORECASE)
    if om:
        term = rw.term(om.group(1))
        d = (om.group(2) or "").strip()
        n = (om.group(3) or "").strip()
        rest = sql[om.end():].strip()
        head = sql[: om.start()].strip()
        if grouped:
            name = term if term.startswith("`") else f"`{term}`"
            keys = _multikey(name, d, n)
            sql = (
                f"SELECT * FROM ({head}) __gq ORDER BY "
                + ", ".join(keys)
                + (" " + rest if rest else "")
            )
        else:
            keys = _multikey(term, d, n)
            sql = (
                head + " ORDER BY " + ", ".join(keys)
                + (" " + rest if rest else "")
            )

    # SELECT DISTINCT <single ph> FROM: canonical-key dedup; with LIMIT
    # the reference keeps first-seen order -> order on min(__seq)
    m = re.search(
        rf"^\s*SELECT\s+DISTINCT\s+({_P})(\s+AS\s+\S+)?\s+FROM(\s+\S+)\s*"
        rf"(LIMIT\s+\d+)?\s*$",
        sql, re.IGNORECASE | re.DOTALL)
    if m:
        term = rw.term(m.group(1))
        alias = m.group(2) or (" AS " + term if term.startswith("`") else "")
        if m.group(4):
            sql = (
                f"SELECT any_value({term}){alias}, min(__seq) AS __o "
                f"FROM{m.group(3)} GROUP BY v_key({term}) "
                f"ORDER BY __o {m.group(4)}"
            )
            sql = f"SELECT * EXCEPT (__o) FROM ({sql})"
        else:
            sql = (
                f"SELECT any_value({term}){alias} FROM{m.group(3)} "
                f"GROUP BY v_key({term})"
            )
    return sql


def _rewrite_window_alias(sql: str) -> str:
    """``expr AS x, agg() OVER (PARTITION BY x)``: Spark does not resolve
    select-list aliases inside window specs; push the aliased expression
    into a subquery and window over its output column."""
    wm = re.search(
        r"OVER\s*\(\s*PARTITION\s+BY\s+([A-Za-z_]\w*)", sql, re.IGNORECASE)
    if not wm:
        return sql
    name = wm.group(1)
    span = _select_items_span(sql)
    if not span:
        return sql
    st, en = span
    items = _split_args(sql[st:en])
    expr = None
    new_items = []
    for it in items:
        m = re.fullmatch(rf"(.*?)\s+AS\s+`?{re.escape(name)}`?\s*", it.strip(),
                         re.IGNORECASE | re.DOTALL)
        if m and not expr:
            expr = m.group(1).strip()
            new_items.append(name)
        else:
            new_items.append(it.strip())
    if not expr:
        return sql
    fm = re.search(r"\bFROM\s+(\S+)", sql[en:], re.IGNORECASE)
    if not fm:
        return sql
    table = fm.group(1)
    inner = f"(SELECT *, {expr} AS {name} FROM {table}) __wq"
    sql = (
        sql[:st] + " " + ", ".join(new_items) + " "
        + sql[en : en + fm.start(1)] + inner + sql[en + fm.end(1):]
    )
    return sql


def _exists_eq(sql: str) -> str:
    """Inside EXISTS(...), Catalyst only decorrelates equality
    predicates; v_eq's CASE body reads as a non-equality filter over the
    correlated column.  Same-canonical-key equality is equivalent here
    (MISSING keys are NULL and match nothing, so EXISTS stays false)."""
    out = []
    i = 0
    for m in re.finditer(r"\bEXISTS\s*\(", sql, re.IGNORECASE):
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        if m.start() < i:
            continue
        body = sql[m.end() : j - 1]
        body = re.sub(
            r"v_eq\(\s*([^,()]+)\s*,\s*([^,()]+)\s*\)",
            lambda g: f"(v_key({g.group(1)}) = v_key({g.group(2)}))",
            body)
        out.append(sql[i : m.end()])
        out.append(body)
        out.append(")")
        i = j
    out.append(sql[i:])
    return "".join(out)


def _orderby_select_alias(sql: str) -> str:
    """Grouped ORDER BY <expr> where <expr> is a select item: order on
    the item's alias (aggregate sort keys over rewritten variant
    expressions confuse attribute resolution when re-derived in Sort)."""
    if not re.search(r"\bGROUP\s+BY\b", sql, re.IGNORECASE):
        return sql
    span = _select_items_span(sql)
    if not span:
        return sql
    alias_of = {}
    for it in _split_args(sql[span[0] : span[1]]):
        m = re.fullmatch(r"(.*?)\s+AS\s+(\S+)\s*", it.strip(),
                         re.IGNORECASE | re.DOTALL)
        if m:
            alias_of[re.sub(r"\s+", "", m.group(1))] = m.group(2)

    def ob_repl(m):
        key = re.sub(r"\s+", "", m.group(1))
        alias = alias_of.get(key)
        return f"ORDER BY {alias}{m.group(2) or ''}" if alias else m.group(0)

    return re.sub(
        r"\bORDER\s+BY\s+((?:[^(),\s]|\((?:[^()]|\([^()]*\))*\))+)"
        r"(\s+(?:ASC|DESC))?",
        ob_repl, sql, flags=re.IGNORECASE)


def inline_all(sql: str) -> str:
    """Expand every v_* SQL-UDF call textually.  Fallback for contexts
    where Spark refuses SQL UDFs (correlated subqueries, Sort)."""
    names = "|".join(sorted(_FUNCS, key=len, reverse=True))
    pat = re.compile(rf"\b({names})\s*\(")
    guard = 0
    while guard < 500:
        m = pat.search(sql)
        if not m:
            return sql
        guard += 1
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        args = _split_args(sql[m.end() : i - 1])
        sig, _ret, body = _FUNCS[m.group(1)]
        params = [p.strip().split()[0] for p in sig.split(",")]
        out = body
        for k, p in enumerate(params):
            out = re.sub(rf"(?<![\w_`]){p}(?![\w_`])", f"\x03{k}\x03", out)
        for k, a in enumerate(args):
            out = out.replace(f"\x03{k}\x03", f"({a})")
        sql = sql[: m.start()] + "(" + out + ")" + sql[i:]
    return sql
