"""Verbatim replay of the reference's own query-test corpus on Spark.

The reference ships 408 end-to-end query tests
(/root/reference/vm/testdata/queries/**/*.test, format defined at
/root/reference/tests/testcase.go:26-84 and
/root/reference/testquery/testquery.go:889-910: SQL, ``---``-separated
input NDJSON sections, final section expected NDJSON; with more than 3
sections the middle sections are tables ``input0``, ``input1``, ...).
The golden corpus under ``tests/golden`` re-spells those semantics in
Spark SQL with original data; this module goes further and replays the
reference's *own* files, read from the read-only reference checkout at
test time (nothing is copied into this repo).

Pipeline per case:

1. ``parse_case``   — split sections, strip full-line and trailing
   ``#`` comments (outside string literals).
2. ``translate``    — rewrite the Sneller/PartiQL dialect deltas to
   Spark SQL *text* (Spark's parser does all real parsing; this is a
   token-level rewriter over the public PartiQL surface, not a grammar
   port).  Deltas handled:
   - ion timestamp literals ```2022-...Z``` → ``TIMESTAMP '...'``
   - ``MISSING`` / ``IS [NOT] MISSING`` → NULL discipline
   - ``"ident"`` double-quoted identifiers → backticks
   - ``[...]`` array / ``{'k': v}`` struct constructors →
     ``array(...)`` / ``named_struct(...)``
   - lateral unnest ``FROM t AS a, a.path AS x`` → ``LATERAL VIEW
     explode``
   - ``UNPIVOT rel AS v AT k`` → ``LATERAL variant_explode`` over
     ``parse_json(to_json(struct(rel.*)))`` (Spark 4 VARIANT is the
     idiomatic analog of ion's dynamic typing)
   - ``DISTINCT ON (keys)`` → ``ROW_NUMBER`` window + filter
   - ``SELECT DISTINCT ON`` / multi-column scalar subqueries →
     ``named_struct``
   - Sneller 64-bit ``INTEGER``/``FLOAT`` casts → BIGINT/DOUBLE
   - function-surface deltas (``DATE_TRUNC(UNIT, t)`` argument order,
     Go-style month-add normalisation, ``EXTRACT`` DOW/MICROSECOND
     conventions, ``TIME_BUCKET`` epoch seconds, ``TO_UNIX_*``,
     ``SIMILAR TO``/``~`` regex forms, 3-arg ``IS_SUBNET_OF`` range
     form → ``ip_in_range``, ...)
   - Sneller's implicit aliases for unaliased aggregates
     (``SELECT COUNT(*)`` yields column ``count``)
3. ``load_input``   — NDJSON → DataFrame with Sneller-style ingestion
   typing (RFC3339-looking strings become timestamps, as the
   reference's JSON→ion converter does at ingest).
4. execution runs with ``spark.sql.ansi.enabled=false``: Sneller never
   aborts a query — failed casts / division by zero produce MISSING —
   and Spark's non-ANSI NULL-on-error semantics are the exact analog
   (the conf is restored after each case).
5. ``compare``      — order-insensitive multiset (ordered when the top
   level has ORDER BY) under the MISSING-vs-NULL output discipline:
   Sneller omits MISSING fields from output rows, Spark emits NULL
   columns, so null-valued keys drop from both sides; timestamps
   normalise to RFC3339; VARIANT values unbox via ``toPython``.

Cases whose *input* is dynamically typed (one column holding both
numbers and strings) run on the VARIANT substrate instead
(``replay_variant.py``): Spark 4 VARIANT columns with ``v_*`` SQL UDFs
implementing the reference's cross-type comparison/arithmetic lattice.

Status: **all 408 reference cases pass verbatim**
(``tests/replay_manifest.txt``, ratchet-tested).
"""

from __future__ import annotations

import datetime
import decimal
import fnmatch
import glob
import json
import math
import os
import re

REFERENCE_QUERIES = "/root/reference/vm/testdata/queries"

# Input-partition fan-out for the typed loader.  The partition-
# invariance matrix (tests/test_reference_replay.py) raises this to 8
# to prove the translated plans don't depend on single-partition
# evaluation (global aggregation, ordering, first-seen semantics).
INPUT_PARTITIONS = 2

_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)

_CLAUSE_KW = (
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "UNION", "INTERSECT",
    "EXCEPT", "WINDOW", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
    "ON",
)


# ---------------------------------------------------------------------------
# case file parsing


def list_cases(root: str = REFERENCE_QUERIES) -> list[str]:
    return sorted(glob.glob(os.path.join(root, "**", "*.test"), recursive=True))


def _strip_line_comment(line: str) -> str:
    in_str = False
    for i, c in enumerate(line):
        if c == "'":
            in_str = not in_str
        elif c == "#" and not in_str:
            return line[:i].rstrip()
    return line


def _section_lines(block: str, strip_trailing: bool) -> list[str]:
    out = []
    for line in block.strip().splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        if strip_trailing:
            line = _strip_line_comment(line)
        else:
            # NDJSON: comment starts after the closing brace
            # (testquery.go stripInlineComment)
            pos = line.rfind("}")
            if pos != -1 and (not line[pos + 1 :].strip() or
                              line[pos + 1 :].strip().startswith("#")):
                line = line[: pos + 1]
        if line.strip():
            out.append(line)
    return out


_FP_TOKENS = {
    "float64:+inf": math.inf,
    "float64:-inf": -math.inf,
    "float64:NaN": math.nan,
    "float64:-0": -0.0,
}


def _decode_fp_tokens(line: str) -> str:
    """Input NDJSON spells non-finite doubles as ``"float64:+inf"``
    tokens (testquery.go); decode to real doubles so the computation
    sees IEEE values.  json.dumps emits the bare Infinity/NaN tokens
    Spark's JSON reader accepts (allowNonNumericNumbers)."""
    if "float64:" not in line:
        return line
    try:
        row = json.loads(line)
    except ValueError:
        return line

    def dec(v):
        if isinstance(v, str):
            return _FP_TOKENS.get(v, v)
        if isinstance(v, list):
            return [dec(x) for x in v]
        if isinstance(v, dict):
            return {k: dec(x) for k, x in v.items()}
        return v

    return json.dumps(dec(row))


def parse_case(path: str) -> tuple[str, list[list[str]], list[dict]]:
    """Return (query, input sections, expected rows)."""
    text = open(path, errors="replace").read()
    parts = re.split(r"^-{3,}\s*$", text, flags=re.MULTILINE)
    if len(parts) < 3:
        raise ValueError(f"{path}: expected >=3 sections, got {len(parts)}")
    query = "\n".join(_section_lines(parts[0], strip_trailing=True))
    inputs = [
        [_decode_fp_tokens(l) for l in _section_lines(p, strip_trailing=False)]
        for p in parts[1:-1]
    ]
    exp_lines = _section_lines(parts[-1], strip_trailing=False)
    try:
        expected = [json.loads(l) for l in exp_lines]
    except ValueError:
        # some regression cases pretty-print ONE expected document
        # across many lines (9999-regressions/regress-2410.test)
        doc = json.loads("\n".join(exp_lines))
        expected = doc if isinstance(doc, list) else [doc]
    return query, inputs, expected


# ---------------------------------------------------------------------------
# string-aware scanning helpers


def _split_strings(sql: str) -> list[tuple[bool, str]]:
    """(is_string_literal, text) segments; '' escapes respected."""
    segs: list[tuple[bool, str]] = []
    i, start = 0, 0
    while i < len(sql):
        if sql[i] == "'":
            j = i + 1
            while j < len(sql):
                if sql[j] == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if i > start:
                segs.append((False, sql[start:i]))
            segs.append((True, sql[i : j + 1]))
            i = j + 1
            start = i
        else:
            i += 1
    if start < len(sql):
        segs.append((False, sql[start:]))
    return segs


def _rewrite_outside_strings(sql: str, fn) -> str:
    return "".join(t if s else fn(t) for s, t in _split_strings(sql))


def _skip_string(sql: str, i: int) -> int:
    """i points at an opening quote; return index after the literal."""
    j = i + 1
    while j < len(sql):
        if sql[j] == "'":
            if j + 1 < len(sql) and sql[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return j


def _matching(sql: str, i: int, open_c: str, close_c: str) -> int:
    """i points at open_c; return index of its matching close_c."""
    depth = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = _skip_string(sql, i)
            continue
        if c == open_c:
            depth += 1
        elif c == close_c:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _top_level_split(text: str, sep: str = ",") -> list[str]:
    """Split on top-level sep (outside parens/brackets/strings)."""
    parts, depth, start, i = [], 0, 0, 0
    while i < len(text):
        c = text[i]
        if c == "'":
            i = _skip_string(text, i)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return parts


# ---------------------------------------------------------------------------
# dialect translation


def _fold_int_products(seg: str) -> str:
    # Sneller const-folds before GROUP BY matching (TIME_BUCKET(t,60*60)
    # grouped by TIME_BUCKET(t,3600)); fold integer products textually
    def fold(m):
        return str(int(m.group(1)) * int(m.group(2)))

    prev = None
    while prev != seg:
        prev = seg
        seg = re.sub(r"(?<![\w.])(\d+)\s*\*\s*(\d+)(?![\w.*])", fold, seg)
    return seg


def _constructors(sql: str) -> str:
    """PartiQL ``[...]`` / ``{'k': v}`` constructors → array()/named_struct().

    A ``[`` is a subscript iff the previous non-space char ends an
    expression (identifier, ``)``, ``]`` or backtick); otherwise it
    opens an array literal.
    """
    out: list[str] = []
    stack: list[str] = []  # 'struct' | 'array' | 'paren' | 'sub'
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c == "[":
            done = "".join(out).rstrip()
            prev = done[-1:]
            wm = re.search(r"(\w+)$", done)
            prev_kw = bool(wm) and wm.group(1).upper() in (
                "SELECT", "DISTINCT", "WHERE", "AND", "OR", "NOT", "THEN",
                "ELSE", "WHEN", "IN", "ON", "BY", "AS", "RETURN", "CASE",
                "END", "FROM", "HAVING", "ALL", "UNION", "EXCEPT",
                "INTERSECT", "VALUES", "LIMIT", "OFFSET",
            )
            if prev and not prev_kw and (prev.isalnum() or prev in ")]`_"):
                stack.append("sub")
                out.append("[")
            else:
                stack.append("array")
                out.append("array(")
        elif c == "]":
            kind = stack.pop() if stack else "sub"
            out.append("]" if kind == "sub" else ")")
        elif c == "{":
            stack.append("struct")
            out.append("named_struct(")
        elif c == "}":
            if stack:
                stack.pop()
            out.append(")")
        elif c == ":" and stack and stack[-1] == "struct":
            out.append(",")
        elif c == "(":
            stack.append("paren")
            out.append("(")
        elif c == ")":
            if stack:
                stack.pop()
            out.append(")")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _find_kw(sql: str, kw: str, start: int = 0) -> int:
    pat = re.compile(r"\b" + kw + r"\b", re.IGNORECASE)
    i = start
    depth = 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            i = _skip_string(sql, i)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        else:
            m = pat.match(sql, i)
            if m and depth == 0:
                return i
        i += 1
    return -1


def _rewrite_unpivot(sql: str) -> str:
    """``UNPIVOT rel [AS v] [AT k]`` → variant_explode subquery.

    Applied innermost-first so nested UNPIVOTs resolve.
    """
    for _ in range(8):
        m = None
        for cand in re.finditer(r"\bUNPIVOT\b", sql, flags=re.IGNORECASE):
            rest = sql[cand.end() :].lstrip()
            if rest.startswith("("):
                # only rewrite once the subquery has no inner UNPIVOT
                close = _matching(sql, sql.index("(", cand.end()), "(", ")")
                inner = sql[cand.end() : close]
                if re.search(r"\bUNPIVOT\b", inner, flags=re.IGNORECASE):
                    continue
            m = cand
            break
        if m is None:
            return sql
        i = m.end()
        while i < len(sql) and sql[i].isspace():
            i += 1
        if i < len(sql) and sql[i] == "(":
            close = _matching(sql, i, "(", ")")
            rel = sql[i : close + 1]
            i = close + 1
        else:
            m2 = re.match(r"[A-Za-z_][\w.]*", sql[i:])
            rel = m2.group(0)
            i += m2.end()
        # AS and AT may appear in either order (0016-unpivot
        # unpivot-nested-auxbindings: "UNPIVOT (...) AT cols AS vals")
        val = key = None
        while True:
            as_m = re.match(r"\s+AS\s+(\w+)", sql[i:], flags=re.IGNORECASE)
            if as_m and val is None:
                val = as_m.group(1)
                i += as_m.end()
                continue
            at_m = re.match(r"\s+AT\s+(\w+)", sql[i:], flags=re.IGNORECASE)
            if at_m and key is None:
                key = at_m.group(1)
                i += at_m.end()
                continue
            break
        proj = []
        if key:
            proj.append(f"__ve.key AS {key}")
        if val:
            proj.append(f"__ve.value AS {val}")
        if not proj:
            proj = ["__ve.key AS key", "__ve.value AS value"]
        # star is not allowed inside TVF arguments, so the row JSON is
        # computed one subquery down.  A plain table unpivots the RAW
        # ingested document (the __rawjson view): to_json(struct(*))
        # would drop present-but-null fields, which UNPIVOT emits
        # (0016-unpivot/unpivot-count-keys counts "another": null)
        if re.fullmatch(r"input\d*", rel, flags=re.IGNORECASE):
            src = f"(SELECT __js FROM {rel}__rawjson)"
        else:
            # CTE / subquery target: no raw twin exists
            src = f"(SELECT to_json(struct(*)) AS __js FROM {rel})"
        repl = (
            f"(SELECT {', '.join(proj)} FROM "
            f"{src} AS __upv, "
            f"LATERAL variant_explode(parse_json(__upv.__js)) AS __ve)"
        )
        sql = sql[: m.start()] + repl + sql[i:]
    return sql


def _rewrite_lateral_unnest(sql: str) -> str:
    """``FROM t [AS] a, a.path [AS] x, x [AS] y`` → LATERAL VIEW explode.

    Recurses into parenthesised subqueries first.
    """

    def recurse(s: str) -> str:
        out, i = [], 0
        while i < len(s):
            c = s[i]
            if c == "'":
                j = _skip_string(s, i)
                out.append(s[i:j])
                i = j
            elif c == "(":
                j = _matching(s, i, "(", ")")
                if j == -1:
                    out.append(s[i:])
                    break
                out.append("(" + recurse(s[i + 1 : j]) + ")")
                i = j + 1
            else:
                out.append(c)
                i += 1
        return one_level("".join(out))

    def one_level(s: str) -> str:
        m = _find_from(s)
        if m is None:
            return s
        start, end = m
        clause = s[start:end]
        items = _top_level_split(clause)
        if len(items) < 2:
            return s
        first = items[0].strip()
        fm = re.match(
            r"^(`[\w.]+`|[A-Za-z_][\w.]*|\((?s:.*)\))\s*(?:AS\s+)?"
            r"[`\"]?([\w$]+)?[`\"]?\s*$",
            first,
            flags=re.IGNORECASE,
        )
        if not fm:
            return s
        base, alias = fm.group(1), fm.group(2)
        aliases = {alias or base}
        parts = [f"{base} AS `{alias}`" if alias else base]
        ok = True
        for it in items[1:]:
            im = re.match(
                r"^[`\"]?([\w$]+)[`\"]?((?:\.[`\"]?[\w$]+[`\"]?)*)\s*"
                r"(?:AS\s+)?[`\"]?([\w$]+)[`\"]?\s*$",
                it.strip(),
                flags=re.IGNORECASE,
            )
            if not im or im.group(1) not in aliases:
                ok = False
                break
            root, path, a = im.groups()
            path = re.sub(r'[`"]', "", path)
            path = "".join(f".`{p}`" for p in path.split(".") if p)
            expr = f"`{root}`{path}"
            parts.append(f"LATERAL VIEW explode({expr}) __lv{len(parts)} AS `{a}`")
            aliases.add(a)
        if not ok:
            return s
        return s[:start] + " " + " ".join(parts) + " " + s[end:]

    def _find_from(s: str):
        m = re.search(r"\bFROM\b", s, flags=re.IGNORECASE)
        if not m:
            return None
        start = m.end()
        i, depth = start, 0
        while i < len(s):
            c = s[i]
            if c == "'":
                i = _skip_string(s, i)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0:
                w = re.match(r"[A-Za-z_]+", s[i:])
                if w and w.group(0).upper() in _CLAUSE_KW:
                    return start, i
            i += 1
        return start, len(s)

    return recurse(sql)


def _rewrite_distinct_on(sql: str, _n: int = 0) -> str:
    """``SELECT DISTINCT ON (keys) items ...`` → ROW_NUMBER + filter."""
    m = re.search(r"\bSELECT\s+DISTINCT\s+ON\s*\(", sql, flags=re.IGNORECASE)
    if not m:
        return sql
    rn = f"__rn{_n}"
    open_p = sql.index("(", m.start())
    close_p = _matching(sql, open_p, "(", ")")
    keys = sql[open_p + 1 : close_p].strip()
    first_key = _top_level_split(keys)[0].strip()
    rest = sql[close_p + 1 :]
    # this SELECT's scope ends at the first unbalanced ')' (it may be a
    # subquery inside a larger statement)
    depth = 0
    scope_end = len(rest)
    for i, ch in enumerate(rest):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                scope_end = i
                break
    scope, suffix = rest[:scope_end], rest[scope_end:]
    # inject the window column right after the select list
    body = scope.strip()
    fpos = _find_kw(body, "FROM")
    if fpos == -1:
        return sql
    items = body[:fpos].rstrip()
    tail = body[fpos:]
    # a top-level ORDER BY names the pick order: the reference sorts,
    # then DISTINCT ON keeps the first row per key group — so the sort
    # list becomes the window's ORDER BY, materialized as __ord columns
    # so the outer query can reproduce the output order after the
    # window filter (ORDER BY aggregates can't cross the projection).
    obpos = _find_kw(tail, "ORDER")
    win_order, extra_items, outer_order, post = first_key, "", "", ""
    n_ord = 0
    if obpos != -1 and re.match(
        r"ORDER\s+BY\b", tail[obpos:], flags=re.IGNORECASE
    ):
        after = tail[obpos:]
        bypos = after.upper().index("BY") + 2
        lim = _find_kw(after, "LIMIT")
        off = _find_kw(after, "OFFSET")
        cut = min(x for x in (lim, off, len(after)) if x != -1)
        ord_items = [
            o.strip() for o in _top_level_split(after[bypos:cut]) if o.strip()
        ]
        post = " " + after[cut:] if cut < len(after) else ""
        tail = tail[:obpos].rstrip()
        win_order = ", ".join(ord_items)
        exprs_dirs = []
        for k, o in enumerate(ord_items):
            dm = re.search(
                r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$",
                o, flags=re.IGNORECASE,
            )
            expr = o[: dm.start()] if dm else o
            exprs_dirs.append((expr, o[dm.start():] if dm else ""))
        extra_items = "".join(
            f", {e} AS __ord{_n}_{k}" for k, (e, _d) in enumerate(exprs_dirs)
        )
        n_ord = len(exprs_dirs)
        outer_order = " ORDER BY " + ", ".join(
            f"__ord{_n}_{k}{d}" for k, (_e, d) in enumerate(exprs_dirs)
        )
    inner = (
        f"SELECT {items}{extra_items}, ROW_NUMBER() OVER (PARTITION BY {keys} "
        f"ORDER BY {win_order}) AS {rn} {tail}"
    )
    drop = rn + "".join(f", __ord{_n}_{k}" for k in range(n_ord))
    out = sql[: m.start()] + (
        f"SELECT * EXCEPT ({drop}) FROM ({inner}) WHERE {rn} = 1"
        f"{outer_order}{post}"
    ) + suffix
    return _rewrite_distinct_on(out, _n + 1)


def _chain_scalar_subqueries(sql: str) -> str:
    """A scalar subquery in the SELECT list may correlate on the ALIAS
    of an EARLIER select item (0012-correlated/0050: the reference
    binds projections left-to-right).  Spark resolves lateral column
    aliases in plain expressions but not inside correlated subqueries,
    so split the list: earlier items become an inner SELECT, the
    alias-referencing subquery moves to an outer SELECT over it."""
    m = None
    for cand in re.finditer(r"\bSELECT\b", sql, flags=re.IGNORECASE):
        head = sql[: cand.start()]
        if head.count("(") == head.count(")"):
            m = cand
            break
    if not m:
        return sql
    start = m.end()
    fpos = _find_kw(sql, "FROM", start)
    if fpos == -1:
        return sql
    items = [it.strip() for it in _top_level_split(sql[start:fpos])]
    aliases: list[str | None] = []
    for it in items:
        am = re.search(r"\bAS\s+[`\"]?(\w+)[`\"]?\s*$", it, flags=re.IGNORECASE)
        aliases.append(am.group(1) if am else None)
    for k in range(1, len(items)):
        if "(" not in items[k] or not re.search(
            r"\(\s*SELECT\b", items[k], flags=re.IGNORECASE
        ):
            continue
        prior = [a for a in aliases[:k] if a]
        if not any(
            re.search(rf"(?<![\w.`]){re.escape(a)}(?![\w`])", items[k])
            for a in prior
        ):
            continue
        inner = "SELECT " + ", ".join(items[:k]) + " " + sql[fpos:]
        outer = (
            "SELECT *, "
            + ", ".join(items[k:])
            + " FROM ("
            + inner
            + ") AS __lca"
        )
        return _chain_scalar_subqueries(outer)
    return sql


def _groupby_alias(sql: str) -> str:
    """``GROUP BY <expr> AS <name>`` (the reference binds the name for
    the projection, plan/pir rownumber/3065 shape): drop the binding
    from the GROUP BY list and materialize it in the select list by
    replacing the select item that IS the bare ``name`` with
    ``expr AS name``.  Only whole select-list items are replaced (a
    ``name`` nested inside a call must not grow an AS clause), and the
    select list is the nearest depth-0 SELECT before this GROUP BY
    (UNION branches rewrite independently)."""
    gpos = 0
    while True:
        gpos = _find_kw(sql, "GROUP", gpos)
        if gpos == -1:
            return sql
        gm = re.match(r"GROUP\s+BY\b", sql[gpos:], flags=re.IGNORECASE)
        if not gm:
            gpos += 5
            continue
        start = gpos + gm.end()
        end = len(sql)
        for kw in ("HAVING", "ORDER", "LIMIT", "WINDOW", "UNION"):
            p = _find_kw(sql, kw, start)
            if p != -1:
                end = min(end, p)
        # nearest depth-0 SELECT before this GROUP BY owns the list
        sel_m = None
        for cand in re.finditer(r"\bSELECT\b", sql[:gpos], flags=re.IGNORECASE):
            head = sql[: cand.start()]
            if head.count("(") == head.count(")"):
                sel_m = cand
        fpos = _find_kw(sql, "FROM", sel_m.end()) if sel_m else -1
        items = _top_level_split(sql[start:end])
        changed = False
        new_items = []
        for it in items:
            am = re.search(
                r"\s+AS\s+[`\"]?(\w+)[`\"]?\s*$", it, flags=re.IGNORECASE
            )
            if not am or fpos == -1 or fpos >= gpos:
                new_items.append(it)
                continue
            name, expr = am.group(1), it[: am.start()].strip()
            sel_items = _top_level_split(sql[sel_m.end():fpos])
            hit = None
            for j, si in enumerate(sel_items):
                if si.strip().strip('`"') == name:
                    hit = j
                    break
            if hit is None:
                new_items.append(it)
                continue
            sel_items[hit] = f"{expr} AS {name}"
            new_sel = " " + ", ".join(s.strip() for s in sel_items) + " "
            old_len = fpos - sel_m.end()
            sql = sql[: sel_m.end()] + new_sel + sql[fpos:]
            shift = len(new_sel) - old_len
            start += shift
            end += shift
            fpos += shift
            gpos += shift
            new_items.append(expr)
            changed = True
        if changed:
            sql = sql[:start] + " " + ", ".join(
                i.strip() for i in new_items
            ) + " " + sql[end:]
        gpos = start


def _having_window_alias(sql: str) -> str:
    """``HAVING <alias> <cmp> ...`` where the alias names a WINDOW
    select item (pir rownumber4/6): inline the window expression so the
    HAVING-window rewrite below can lift it into a subquery filter."""
    hpos = _find_kw(sql, "HAVING")
    if hpos == -1:
        return sql
    sel_m = re.search(r"\bSELECT\b", sql, flags=re.IGNORECASE)
    fpos = _find_kw(sql, "FROM", sel_m.end()) if sel_m else -1
    if fpos == -1:
        return sql
    for it in _top_level_split(sql[sel_m.end():fpos]):
        am = re.search(r"\s+AS\s+[`\"]?(\w+)[`\"]?\s*$", it,
                       flags=re.IGNORECASE)
        if not am or not re.search(r"\bOVER\b", it, flags=re.IGNORECASE):
            continue
        name, expr = am.group(1), it[: am.start()].strip()
        hend = len(sql)
        for kw in ("ORDER", "LIMIT", "WINDOW", "UNION"):
            p = _find_kw(sql, kw, hpos)
            if p != -1:
                hend = min(hend, p)
        clause = sql[hpos:hend]
        new_clause = re.sub(
            rf"(?<![\w.`]){re.escape(name)}(?![\w`(])",
            lambda _m: expr,  # literal insert: expr may contain \ or \g
            clause,
        )
        if new_clause != clause:
            sql = sql[:hpos] + new_clause + sql[hend:]
    return sql


_AGG_FN_RE = re.compile(
    r"\b(SUM|COUNT|MIN|MAX|AVG|STDDEV(?:_POP|_SAMP)?|VAR(?:IANCE|_POP|_SAMP)?)"
    r"\s*\(",
    re.IGNORECASE,
)


def _orderby_agg_alias_fold(sql: str) -> str:
    """``ORDER BY SUM(x)`` where the select list carries ``SUM(x) AS a``
    AND a window function is present (pir rownumber3): Spark can't add
    a hidden aggregate projection under a window, but sorting by the
    existing alias is the identical plan — fold the expression to it."""
    if not re.search(r"\bOVER\b", sql, flags=re.IGNORECASE):
        return sql
    opos = _find_kw(sql, "ORDER")
    if opos == -1 or not re.match(
        r"ORDER\s+BY\b", sql[opos:], flags=re.IGNORECASE
    ):
        return sql
    sel_m = re.search(r"\bSELECT\b", sql, flags=re.IGNORECASE)
    fpos = _find_kw(sql, "FROM", sel_m.end()) if sel_m else -1
    if fpos == -1:
        return sql
    aliased = {}
    for it in _top_level_split(sql[sel_m.end():fpos]):
        am = re.search(r"\s+AS\s+[`\"]?(\w+)[`\"]?\s*$", it,
                       flags=re.IGNORECASE)
        if am:
            aliased[re.sub(r"\s+", "", it[: am.start()]).upper()] = am.group(1)
    start = opos + re.match(
        r"ORDER\s+BY\b", sql[opos:], flags=re.IGNORECASE
    ).end()
    end = len(sql)
    for kw in ("LIMIT", "OFFSET"):
        p = _find_kw(sql, kw, start)
        if p != -1:
            end = min(end, p)
    out_items = []
    changed = False
    for o in _top_level_split(sql[start:end]):
        dm = re.search(r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$", o,
                       flags=re.IGNORECASE)
        expr = (o[: dm.start()] if dm else o).strip()
        key = re.sub(r"\s+", "", expr).upper()
        if _AGG_FN_RE.search(expr) and key in aliased:
            out_items.append(aliased[key] + (o[dm.start():] if dm else ""))
            changed = True
        else:
            out_items.append(o.strip())
    if not changed:
        return sql
    return sql[:start] + " " + ", ".join(out_items) + " " + sql[end:]


def _rewrite_having_window(sql: str) -> str:
    """``... GROUP BY g HAVING ROW_NUMBER() OVER (w) <= k [ORDER BY o]``
    (the reference's elastic-proxy top-N-per-group shape,
    9999-regressions/regress-2493.test) → window column + outer filter;
    Spark forbids window functions inside HAVING."""
    m = re.search(
        r"\bHAVING\s+(\(\s*)?ROW_NUMBER\s*\(\s*\)\s*OVER\s*\(", sql,
        flags=re.IGNORECASE,
    )
    if not m:
        return sql
    wopen = m.end() - 1  # the paren after OVER
    wclose = _matching(sql, wopen, "(", ")")
    if wclose == -1:
        return sql
    win = sql[wopen : wclose + 1]
    # the comparison may be wrapped: HAVING (ROW_NUMBER() OVER (w) <= k)
    km = re.match(
        r"\s*<=\s*(\d+)" + (r"\s*\)" if m.group(1) else ""),
        sql[wclose + 1 :],
    )
    if not km:
        return sql
    k = km.group(1)
    after_having = wclose + 1 + km.end()
    # owning SELECT: nearest preceding SELECT at paren depth 0 relative
    # to the HAVING
    sel_start = None
    for sm in re.finditer(r"\bSELECT\b", sql[: m.start()], flags=re.IGNORECASE):
        seg = sql[sm.start() : m.start()]
        if seg.count("(") == seg.count(")"):
            sel_start = sm.start()
    if sel_start is None:
        return sql
    fpos = _find_kw(sql, "FROM", sel_start)
    if fpos == -1 or fpos > m.start():
        return sql
    items_txt = sql[sel_start + len("SELECT") : fpos].strip()
    mid = sql[fpos : m.start()].rstrip()  # FROM ... GROUP BY ...
    # scope of this SELECT ends at the first unbalanced ')'
    depth = 0
    scope_end = len(sql)
    for i in range(after_having, len(sql)):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                scope_end = i
                break
    tail = sql[after_having:scope_end].strip()  # e.g. ORDER BY ...
    # outer ORDER BY can't see aggregates: substitute aliased exprs
    for it in _top_level_split(items_txt):
        am = re.search(r"\sAS\s+(`[^`]+`|\w+)\s*$", it.strip(),
                       flags=re.IGNORECASE)
        if am:
            expr = it.strip()[: am.start()].strip()
            tail = tail.replace(expr, am.group(1))
    inner = (
        f"SELECT {items_txt}, ROW_NUMBER() OVER {win} AS __hv {mid}"
    )
    repl = (
        f"SELECT * EXCEPT (__hv) FROM ({inner}) __hw WHERE __hv <= {k}"
        + (f" {tail}" if tail else "")
    )
    out = sql[:sel_start] + repl + sql[scope_end:]
    return _rewrite_having_window(out)


def _structify_scalar_subqueries(sql: str) -> str:
    """Multi-column scalar subquery ``(SELECT a, b FROM ...) AS y`` →
    single named_struct column (Sneller returns a struct)."""
    out = sql
    for m in list(re.finditer(r"\(\s*SELECT\b", out, flags=re.IGNORECASE))[::-1]:
        open_p = m.start()
        close_p = _matching(out, open_p, "(", ")")
        if close_p == -1:
            continue
        after = out[close_p + 1 :]
        if not re.match(r"\s*(AS\s+)?[`\"]?\w+[`\"]?", after, flags=re.IGNORECASE):
            continue
        # a FROM/JOIN subquery with an alias is not a scalar expression
        if re.search(r"\b(FROM|JOIN)\s*$", out[:open_p], flags=re.IGNORECASE):
            continue
        # only when used as an aliased scalar (not FROM-subquery):
        if re.match(r"\s*(AS\s+)?(WHERE|GROUP|ORDER|LIMIT|ON|JOIN|HAVING|UNION"
                    r"|SELECT|FROM|CROSS|INNER|LEFT|RIGHT|FULL|NATURAL|WITH"
                    r"|INTERSECT|EXCEPT)\b",
                    after, flags=re.IGNORECASE):
            continue
        body = out[open_p + 1 : close_p]
        sel = re.match(r"\s*SELECT\s+", body, flags=re.IGNORECASE)
        fpos = _find_kw(body, "FROM")
        if fpos == -1:
            continue
        items = _top_level_split(body[sel.end() : fpos])
        if len(items) == 1 and items[0].strip() == "*":
            # `(SELECT * FROM t ...) AS x` — Sneller yields the rows as
            # an array of structs (9999-regressions/regress-2410.test)
            new_body = (
                f"SELECT collect_list(__s) FROM (SELECT struct(*) AS __s "
                + body[fpos:] + ") __structrows"
            )
            out = out[:open_p] + "(" + new_body + ")" + out[close_p + 1 :]
            continue
        if len(items) < 2:
            continue
        fields = []
        for idx, it in enumerate(items):
            it = it.strip()
            am = re.search(r"\sAS\s+[`\"]?(\w+)[`\"]?\s*$", it, flags=re.IGNORECASE)
            if am:
                name, expr = am.group(1), it[: am.start()].strip()
            else:
                qm = re.search(r"[`\"](\w+)[`\"]\s*$", it)
                fm = re.match(r"^(\w+)\s*\(", it)
                cm = re.match(r"^[\w.]+$", it)
                if qm:
                    name, expr = qm.group(1), it[: qm.start()].strip()
                elif fm and _AGG_ALIAS.get(fm.group(1).upper()):
                    name, expr = _AGG_ALIAS[fm.group(1).upper()], it
                elif cm:
                    name, expr = it.split(".")[-1], it
                else:
                    name, expr = f"_{idx + 1}", it
            fields.append((name, expr, it))
        struct = "named_struct(" + ", ".join(
            f"'{n}', {e}" for n, e, _ in fields) + ")"
        if re.search(r"\bGROUP\s+BY\b", body, flags=re.IGNORECASE) and \
                not re.search(r"\bLIMIT\s+1\b", body, flags=re.IGNORECASE):
            # multi-row subquery: Sneller yields an ARRAY of structs
            # (9999-issues/issue-1250.test). Keep the original aliased
            # items alongside so ORDER BY can still resolve them.
            keep = ", ".join(
                it if re.search(r"\sAS\s", it, flags=re.IGNORECASE)
                else f"{e} AS {n}"
                for n, e, it in fields
            )
            new_body = (
                f"SELECT collect_list(__s) FROM (SELECT {struct} AS __s, "
                f"{keep} " + body[fpos:] + ") __structrows"
            )
        else:
            new_body = body[: sel.end()] + struct + " " + body[fpos:]
        out = out[:open_p] + "(" + new_body + ")" + out[close_p + 1 :]
    return out


_AGG_ALIAS = {
    "COUNT": "count",
    "SUM": "sum",
    "MIN": "min",
    "MAX": "max",
    "AVG": "avg",
    "EARLIEST": "earliest",
    "LATEST": "latest",
    "APPROX_COUNT_DISTINCT": "approx_count_distinct",
    "APPROX_PERCENTILE": "approx_percentile",
    "STDDEV": "stddev",
    "STDDEV_POP": "stddev_pop",
    "VARIANCE": "variance",
    "VARIANCE_POP": "variance_pop",
    "ROW_NUMBER": "row_number",
    "RANK": "rank",
    "DENSE_RANK": "dense_rank",
    "TIME_BUCKET": "time_bucket",
    "DATE_TRUNC": "date_trunc",
    "DATE_ADD": "date_add",
    "DATE_DIFF": "date_diff",
    "EXTRACT": "extract",
}

_DT_UNITS = (
    "YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND|MILLISECOND|MICROSECOND"
)

_INTERVAL_UNIT_US = {
    "microsecond": 1,
    "microseconds": 1,
    "millisecond": 1000,
    "milliseconds": 1000,
    "second": 10**6,
    "seconds": 10**6,
    "minute": 60 * 10**6,
    "minutes": 60 * 10**6,
    "hour": 3600 * 10**6,
    "hours": 3600 * 10**6,
    "day": 86400 * 10**6,
    "days": 86400 * 10**6,
}

_WEEKDAY_OFF = {  # days to subtract so the week starts on that day
    "SUNDAY": 0, "MONDAY": 1, "TUESDAY": 2, "WEDNESDAY": 3,
    "THURSDAY": 4, "FRIDAY": 5, "SATURDAY": 6,
}


def _interval_to_micros(text: str) -> int | None:
    total = 0
    for num, unit in re.findall(r"(\d+)\s*([a-z]+)", text.lower()):
        mult = _INTERVAL_UNIT_US.get(unit)
        if mult is None:
            return None
        total += int(num) * mult
    return total or None


def restore_ansi(spark, prev) -> None:
    """Undo a per-case ``spark.sql.ansi.enabled`` pin: restore the
    previous value, or UNSET when the key was never set (merely
    skipping restoration would leave the session pinned non-ANSI)."""
    if prev is None:
        try:
            spark.conf.unset("spark.sql.ansi.enabled")
        except Exception:  # noqa: BLE001 — conf already unset
            pass
    else:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def _rewrite_array_size(sql: str) -> str:
    """ARRAY_SIZE(x) -> nullif(size(x), -1) with balanced parens (the
    -1 branch only fires for NULL input under legacy sizeOfNull, which
    is exactly the reference's MISSING result; real arrays are >= 0)."""
    while True:
        m = re.search(r"\bARRAY_SIZE\s*\(", sql, flags=re.IGNORECASE)
        if not m:
            return sql
        got = _call_args(sql, m.end() - 1)
        if not got:
            return sql
        close_p, args = got
        inner = ", ".join(a.strip() for a in args)
        sql = (
            sql[: m.start()]
            + f"nullif(size({inner}), -1)"
            + sql[close_p + 1:]
        )


def _call_args(sql: str, name_end: int) -> tuple[int, list[str]] | None:
    """name_end points just past the function name; returns
    (close paren index, top-level args)."""
    m = re.match(r"\s*\(", sql[name_end:])
    if not m:
        return None
    open_p = name_end + m.end() - 1
    close_p = _matching(sql, open_p, "(", ")")
    if close_p == -1:
        return None
    return close_p, _top_level_split(sql[open_p + 1 : close_p])


def _rewrite_calls(sql: str) -> str:
    """Argument-shape rewrites that need call-site parsing."""
    # DATE_TRUNC(UNIT, x) / DATE_TRUNC(WEEK(DAY), x) → date_trunc('UNIT', x)
    def date_trunc(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        unit = args[0].strip()
        rest = ", ".join(a.strip() for a in args[1:])
        wm = re.match(r"WEEK\s*\(\s*(\w+)\s*\)$", unit, flags=re.IGNORECASE)
        if wm:
            off = _WEEKDAY_OFF.get(wm.group(1).upper(), 1)
            # truncate to the most recent week start anchored on that day
            return (
                f"cast(date_sub(cast({rest} as date), "
                f"pmod(dayofweek(cast({rest} as date)) - 1 - {off}, 7)) as timestamp)",
                close_p,
            )
        if unit.upper() == "WEEK":
            # Sneller's WEEK with no day anchors on Sunday
            # (date-trunc-dow-no-day-specified)
            return (
                f"cast(date_sub(cast({rest} as date), "
                f"pmod(dayofweek(cast({rest} as date)) - 1, 7)) as timestamp)",
                close_p,
            )
        if re.match(r"^(" + _DT_UNITS + r")$", unit, flags=re.IGNORECASE):
            return f"date_trunc('{unit.upper()}', {rest})", close_p
        return None

    # DATE_ADD(UNIT, n, ts): calendar units get Go-style normalisation
    def date_add(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 3:
            return None
        unit = args[0].strip().upper()
        n, ts = args[1].strip(), args[2].strip()
        if unit in ("MONTH", "QUARTER", "YEAR"):
            months = {"MONTH": "1", "QUARTER": "3", "YEAR": "12"}[unit]
            # add months to the first-of-month (clamp-free), then re-add
            # the day offset so overflow days normalise forward
            # (Sneller follows Go time.AddDate: Jan 31 + 1mo = Mar 3)
            return (
                f"timestamp_micros(unix_micros(cast(date_add(add_months("
                f"trunc(cast({ts} as date), 'MM'), ({n}) * {months}), "
                f"day(cast({ts} as date)) - 1) as timestamp)) + "
                f"(unix_micros({ts}) - unix_micros(date_trunc('DAY', {ts}))))",
                close_p,
            )
        if re.match(r"^(" + _DT_UNITS + r")$", unit, flags=re.IGNORECASE):
            return f"timestampadd({unit}, {n}, {ts})", close_p
        return None

    def date_diff(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 3:
            return None
        unit = args[0].strip().upper()
        if re.match(r"^(" + _DT_UNITS + r")$", unit):
            return (
                f"timestampdiff({unit}, {args[1].strip()}, {args[2].strip()})",
                close_p,
            )
        return None

    # DATE_BIN('interval', ts, origin) → exact micros arithmetic
    def date_bin(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 3:
            return None
        iv = args[0].strip()
        if not (iv.startswith("'") and iv.endswith("'")):
            return None
        us = _interval_to_micros(iv[1:-1])
        if us is None:
            return None
        ts, origin = args[1].strip(), args[2].strip()
        return (
            f"timestamp_micros(unix_micros({ts}) - "
            f"pmod(unix_micros({ts}) - unix_micros({origin}), {us}))",
            close_p,
        )

    # TIME_BUCKET(ts, secs) → epoch-seconds bucket (reference returns
    # unix seconds, vm/testdata/queries/0070-date/time-bucket.test)
    def time_bucket(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 2:
            return None
        ts, secs = args[0].strip(), args[1].strip()
        # cast before multiplying: a plain INT literal would wrap at
        # 2^31 micros (35 min)
        return (
            f"cast((unix_micros({ts}) - pmod(unix_micros({ts}), "
            f"cast({secs} as bigint) * 1000000)) / 1000000 as bigint)",
            close_p,
        )

    def extract(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        em = re.match(r"^(\w+)\s+FROM\s+(.*)$", args[0].strip(),
                      flags=re.IGNORECASE | re.DOTALL)
        if not em:
            return None
        field, expr = em.group(1).upper(), em.group(2).strip()
        if field == "MICROSECOND":
            # micros within the minute (date-extract-boxed expectations)
            return f"pmod(unix_micros({expr}), 60000000)", close_p
        if field == "MILLISECOND":
            return f"cast(pmod(unix_micros({expr}), 60000000) / 1000 as bigint)", close_p
        if field == "DOW":
            return f"(dayofweek({expr}) - 1)", close_p
        if field == "SECOND":
            # Sneller yields the integer second; Spark a DECIMAL(8,6).
            # date_part, not extract: the emitted text must not
            # re-match this rule
            return f"cast(floor(date_part('SECOND', {expr})) as bigint)", close_p
        return None

    def approx_cd(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) == 2:
            # precision argument has no Spark analog; drop it
            return f"approx_count_distinct({args[0].strip()})", close_p
        return None

    def is_subnet_of(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) == 3:
            # reference range form → veneer ip_in_range
            return f"ip_in_range({', '.join(a.strip() for a in args)})", close_p
        return None

    def split_part(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 3:
            return None
        s, sep, idx = (a.strip() for a in args)
        if re.fullmatch(r"[1-9]\d*", idx):
            return None
        # Sneller yields MISSING for out-of-domain indices; Spark raises
        return (
            f"(CASE WHEN ({idx}) >= 1 THEN split_part({s}, {sep}, {idx}) END)",
            close_p,
        )

    def approx_pct(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 2:
            return None
        # the reference's t-digest keeps singleton centroids at test
        # scale; its quantile is float32 interpolation between sorted
        # values at centers (i+0.5)/n (sql_registry approx_percentile_td)
        return (
            f"approx_percentile_td(array_sort(collect_list("
            f"cast({args[0].strip()} as float))), "
            f"cast({args[1].strip()} as float))",
            close_p,
        )

    def avg_int(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 1:
            return None
        e = args[0].strip()
        # AVG over INTEGER is integer division in the reference
        # (0020-aggregate/aggregate-int-arith.test: exact int64 avg)
        if not re.fullmatch(r"CAST\s*\(.*AS\s+BIGINT\s*\)", e,
                            flags=re.IGNORECASE | re.DOTALL):
            return None
        return f"(SUM({e}) DIV COUNT({e}))", close_p

    def floor_ceil_nooverflow(name):
        # Spark's floor/ceil return BIGINT (clamping beyond ±2^63);
        # the reference keeps floats. Above 2^53 doubles are integral.
        def fn(m):
            got = _call_args(sql_holder[0], m.end())
            if not got:
                return None
            close_p, args = got
            if len(args) != 1:
                return None
            x = args[0].strip()
            return (
                f"(CASE WHEN abs({x}) >= 9007199254740992D THEN {x} "
                f"ELSE cast({name}({x}) as double) END)",
                close_p,
            )

        return fn

    def pmod_positive(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 2:
            return None
        # reference PMOD is the positive modulus even for negative
        # divisors (vm/testdata/queries/0041-number-int/int-pmod.test);
        # Spark's pmod keeps the divisor's sign
        return (
            f"pmod({args[0].strip()}, abs({args[1].strip()}))",
            close_p,
        )

    def array_position(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 2:
            return None
        # not-found is MISSING in the reference, 0 in Spark
        return (
            f"nullif(array_position({args[0].strip()}, {args[1].strip()}), 0)",
            close_p,
        )

    def substring_clamp(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) not in (2, 3):
            return None
        pos = args[1].strip()
        if re.fullmatch(r"[1-9]\d*", pos) or pos.startswith("greatest("):
            return None
        # SUBSTRING(s, <=0, n) means SUBSTRING(s, 1, n) in the
        # reference (string-substr-1.test header comment); Spark counts
        # negative positions from the end
        args[1] = f"greatest({pos}, 1)"
        return (
            f"substring({', '.join(a.strip() for a in args)})",
            close_p,
        )

    def trunc_num(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 1:
            return None
        x = args[0].strip()
        # numeric truncation toward zero (Spark's trunc is date-only)
        return f"({x} - ({x} % 1))", close_p

    def utcnow(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        return "current_timestamp()", close_p

    def contains_fuzzy(m):
        got = _call_args(sql_holder[0], m.end())
        if not got:
            return None
        close_p, args = got
        if len(args) != 3:
            return None
        fn = (
            "sn_contains_fuzzy_uni"
            if "UNICODE" in m.group(0).upper()
            else "sn_contains_fuzzy"
        )
        return f"{fn}({', '.join(a.strip() for a in args)})", close_p

    def trim2(which):
        # Sneller TRIM(s, cutset); Spark's 2-arg trim is (trimStr, str)
        def fn(m):
            got = _call_args(sql_holder[0], m.end())
            if not got:
                return None
            close_p, args = got
            if len(args) != 2:
                return None
            s, cut = (a.strip() for a in args)
            return f"trim({which} {cut} FROM {s})", close_p

        return fn

    # rules whose replacement re-contains the (lowercase) source name
    # are matched case-SENSITIVELY so the rewrite terminates
    rules = [
        (r"\bDATE_TRUNC\b", date_trunc, re.IGNORECASE),
        (r"\bDATE_ADD\b", date_add, re.IGNORECASE),
        (r"\bDATE_DIFF\b", date_diff, re.IGNORECASE),
        (r"\bDATE_BIN\b", date_bin, re.IGNORECASE),
        (r"\bTIME_BUCKET\b", time_bucket, re.IGNORECASE),
        (r"\bEXTRACT\b", extract, re.IGNORECASE),
        (r"\bAPPROX_COUNT_DISTINCT\b", approx_cd, 0),
        (r"\bAPPROX_PERCENTILE\b", approx_pct, 0),
        (r"\bPMOD\b", pmod_positive, 0),
        (r"\bAVG\b", avg_int, 0),
        (r"\bFLOOR\b", floor_ceil_nooverflow("floor"), 0),
        (r"\bCEILING\b", floor_ceil_nooverflow("ceiling"), 0),
        (r"\bCEIL\b", floor_ceil_nooverflow("ceil"), 0),
        (r"\bARRAY_POSITION\b", array_position, 0),
        (r"\bIS_SUBNET_OF\b", is_subnet_of, re.IGNORECASE),
        (r"\bSPLIT_PART\b", split_part, 0),
        (r"\bTRIM\b", trim2("BOTH"), 0),
        (r"\bLTRIM\b", trim2("LEADING"), 0),
        (r"\bRTRIM\b", trim2("TRAILING"), 0),
        (r"\bSUBSTRING\b", substring_clamp, 0),
        (r"\bTRUNC\b", trunc_num, 0),
        (r"\bUTCNOW\b", utcnow, re.IGNORECASE),
        (r"\bCONTAINS_FUZZY(?:_UNICODE)?\b", contains_fuzzy, 0),
    ]
    sql_holder = [sql]
    changed = True
    guard = 0
    while changed and guard < 200:
        changed = False
        guard += 1
        for pat, fn, flags in rules:
            for m in re.finditer(pat, sql_holder[0], flags=flags):
                res = fn(m)
                if res is None:
                    continue
                repl, close_p = res
                s = sql_holder[0]
                sql_holder[0] = s[: m.start()] + repl + s[close_p + 1 :]
                changed = True
                break
            if changed:
                break
    return sql_holder[0]


def _word_rewrites(seg: str) -> str:
    # ion timestamp literal → TIMESTAMP '...'
    seg = re.sub(
        r"`(\d{4}-\d{2}-\d{2}T[0-9:.]+(?:Z|[+-]\d{2}:?\d{2})?)`",
        r"TIMESTAMP '\1'",
        seg,
    )
    seg = re.sub(r"\bIS\s+NOT\s+MISSING\b", "IS NOT NULL", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bIS\s+MISSING\b", "IS NULL", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bMISSING\b", "NULL", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bEARLIEST\s*\(", "MIN(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bLATEST\s*\(", "MAX(", seg, flags=re.IGNORECASE)
    # Sneller INTEGER/FLOAT are 64-bit (ion); Spark INT/FLOAT are 32-bit
    seg = re.sub(r"\bAS\s+INTEGER\b", "AS BIGINT", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bAS\s+INT\b", "AS BIGINT", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bAS\s+FLOAT\b", "AS DOUBLE", seg, flags=re.IGNORECASE)
    # function-name deltas
    seg = re.sub(r"\bVARIANCE_POP\s*\(", "var_pop(", seg, flags=re.IGNORECASE)
    # plain STDDEV/VARIANCE are the population forms in the reference
    # (expr/node.go:177: OpStdDevPop covers STDDEV() and STDDEV_POP())
    seg = re.sub(r"\bSTDDEV\s*\(", "stddev_pop(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bVARIANCE\s*\(", "var_pop(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bEQUALS_FUZZY_UNICODE\s*\(", "sn_equals_fuzzy_uni(", seg,
                 flags=re.IGNORECASE)
    seg = re.sub(r"\bEQUALS_FUZZY\s*\(", "sn_equals_fuzzy(", seg,
                 flags=re.IGNORECASE)
    # Sneller gives & higher precedence than | (int-bitwise-const-prop);
    # Spark parses them left-associatively at one level
    seg = re.sub(
        r"(?<![\w(])([\w.]+\s*&\s*[\w.]+)(?=\s*\|)", r"(\1)", seg
    )
    seg = re.sub(
        r"(?<=\|)(\s*)([\w.]+\s*&\s*[\w.]+)(?![\w(]|\s*&)", r"\1(\2)", seg
    )
    # Sneller shifts are 64-bit (ion ints); Spark's <<//>>//>>> operate
    # at the literal's width (INT for small literals) — force BIGINT
    _shop = r"(-?\d+|[\w.`]+)"
    seg = re.sub(
        _shop + r"\s*>>>\s*" + _shop,
        r"shiftrightunsigned(CAST(\1 AS BIGINT), \2)",
        seg,
    )
    seg = re.sub(
        _shop + r"\s*>>\s*" + _shop,
        r"shiftright(CAST(\1 AS BIGINT), \2)",
        seg,
    )
    seg = re.sub(
        _shop + r"\s*<<\s*" + _shop,
        r"shiftleft(CAST(\1 AS BIGINT), \2)",
        seg,
    )
    seg = re.sub(r"\bTO_UNIX_EPOCH\s*\(", "unix_seconds(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bTO_UNIX_MICRO\s*\(", "unix_micros(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bEXP2\s*\(", "power(2.0, ", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bEXP10\s*\(", "power(10.0, ", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bLN1P\s*\(", "log1p(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bROUND_EVEN\s*\(", "rint(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bCHAR_LENGTH\s*\(", "length(", seg, flags=re.IGNORECASE)
    # reference LOWER/UPPER are per-rune SIMPLE case mappings (Go
    # unicode.ToLower/ToUpper); Spark's lower/upper apply full mappings
    seg = re.sub(r"\bLOWER\s*\(", "sn_lower(", seg, flags=re.IGNORECASE)
    seg = re.sub(r"\bUPPER\s*\(", "sn_upper(", seg, flags=re.IGNORECASE)
    # zoom-32 tiles need the reference's exact fp kernel (replay_geomath)
    seg = re.sub(r"\bGEO_TILE_ES\s*\(", "sn_geo_tile_es(", seg,
                 flags=re.IGNORECASE)
    seg = re.sub(r"\bCOSINE_DISTANCE\s*\(", "sn_cosine_distance(", seg,
                 flags=re.IGNORECASE)
    return seg


def _tilde_regex(sql: str) -> str:
    """``expr ~ 'pattern'`` → RLIKE (the pattern is a string literal,
    so the operator sits at a non-string/string segment boundary)."""
    segs = _split_strings(sql)
    out = []
    for idx, (is_str, text) in enumerate(segs):
        if (
            not is_str
            and idx + 1 < len(segs)
            and segs[idx + 1][0]
            and re.search(r"[\w)'`]\s*~\s*$", text)
        ):
            text = re.sub(r"~(\s*)$", r" RLIKE \1", text)
        out.append(text)
    return "".join(out)


_ILIKE_PAT = re.compile(
    r"([\w.`]+|\((?:[^()]|\([^()]*\))*\))\s+(NOT\s+)?ILIKE\s+"
    r"('(?:[^']|'')*'|[\w.`]+)",
    re.IGNORECASE,
)


def _ilike_fold(sql: str) -> str:
    """Spark's ILIKE lowercases both sides with the FULL case mapping;
    the reference matches case-insensitively under per-rune simple
    folding (ſ≡s, Ω(ohm)≡ω, K(kelvin)≡k — 0061 matchpat tests)."""
    return _ILIKE_PAT.sub(
        lambda m: (
            f"sn_fold({m.group(1)}) {m.group(2) or ''}LIKE "
            f"sn_fold({m.group(3)})"
        ),
        sql,
    )


def _similar_to_pattern(pat: str) -> str:
    """The reference's SIMILAR TO compiler (regexp2/Regexp2.go:58-97):
    ``.``/``^``/``$`` are NOT meta-characters (escaped unless already
    escaped), ``%`` -> ``.*``, ``_`` -> ``.`` — then the whole pattern
    is end-anchored ``(expr)$`` when it doesn't already end in ``$``."""
    out = []
    runes = list(pat)
    for i, r in enumerate(runes):
        escaped = i > 0 and runes[i - 1] == "\\"
        if r in ".^$":
            out.append(r if escaped else "\\" + r)
        elif r == "%":
            out.append(r if escaped else ".*")
        elif r == "_":
            out.append(r if escaped else ".")
        else:
            out.append(r)
    expr = "".join(out)
    if not pat.endswith("$"):
        expr = "(" + expr + ")$"
    return expr


_SIMILAR_LIT = re.compile(
    r"\bSIMILAR\s+TO\s+('(?:[^']|'')*')", re.IGNORECASE
)


def _similar_to(sql: str) -> str:
    def sub(m):
        lit = m.group(1)[1:-1].replace("''", "'")
        # Spark unescapes backslash sequences in the literal before the
        # pattern reaches rlike — mirror that, transform, re-escape
        raw = lit.encode().decode("unicode_escape")
        pat = _similar_to_pattern(raw)
        esc = pat.replace("\\", "\\\\").replace("'", "\\'")
        return f"RLIKE '{esc}'"

    sql = _SIMILAR_LIT.sub(sub, sql)
    # non-literal pattern operand: keep the old partial-match fallback
    return re.sub(r"\bSIMILAR\s+TO\b", "RLIKE", sql, flags=re.IGNORECASE)


def _like_escape(sql: str) -> str:
    """``x LIKE 'pat' ESCAPE 'c'`` → RLIKE: the reference allows the
    escape char before ordinary characters, Spark's LIKE validator
    rejects it."""

    def repl(m):
        pat, esc = m.group(1), m.group(2)
        out, i = [], 0
        while i < len(pat):
            c = pat[i]
            if c == esc and i + 1 < len(pat):
                out.append(re.escape(pat[i + 1]))
                i += 2
                continue
            if c == "%":
                out.append("(?s:.*)")
            elif c == "_":
                out.append("(?s:.)")
            else:
                out.append(re.escape(c))
            i += 1
        return f"RLIKE '^{''.join(out)}$'"

    return re.sub(
        r"\bLIKE\s+'((?:[^']|'')*)'\s+ESCAPE\s+'(.)'",
        repl,
        sql,
        flags=re.IGNORECASE,
    )


def _auto_alias(sql: str) -> str:
    """Sneller's implicit aliases for unaliased top-level call items,
    with matching ORDER BY / GROUP BY text substitution."""
    # the MAIN statement's SELECT: first match at paren depth 0 that is
    # not a CTE body (those sit inside parens)
    m = None
    for cand in re.finditer(r"\bSELECT\b(\s+DISTINCT\b)?", sql,
                            flags=re.IGNORECASE):
        head = sql[: cand.start()]
        if head.count("(") == head.count(")"):
            m = cand
            break
    if not m:
        return sql
    start = m.end()
    fpos = _find_kw(sql, "FROM", start)
    end = fpos if fpos != -1 else len(sql)
    items = _top_level_split(sql[start:end])
    inserts: list[tuple[int, str]] = []
    aliased: list[tuple[str, str]] = []
    offset = start
    for it in items:
        s = offset
        e = offset + len(it)
        offset = e + 1
        item = it.strip()
        if not item or re.search(r"\bAS\s+[`\"]?\w+[`\"]?\s*$", item,
                                 flags=re.IGNORECASE):
            continue
        fm = re.match(r"^(\w+)\s*\(", item)
        if not fm:
            continue
        alias = _AGG_ALIAS.get(fm.group(1).upper())
        if not alias:
            continue
        # whole item must be one call (+ optional FILTER / OVER clause)
        rest = item[len(fm.group(1)) :].lstrip()
        if not rest.startswith("("):
            continue
        close = _matching(rest, 0, "(", ")")
        tail = rest[close + 1 :].strip()
        if tail and not re.match(r"^(FILTER|OVER)\s*\(", tail, flags=re.IGNORECASE):
            continue
        if tail:
            tclose = _matching(tail, tail.index("("), "(", ")")
            if tail[tclose + 1 :].strip():
                continue
        inserts.append((e, f" AS {alias} "))
        aliased.append((item, alias))
    for pos, text in sorted(inserts, reverse=True):
        sql = sql[:pos] + text + sql[pos:]
    # ORDER BY SUM(x) → ORDER BY sum (Spark can't always re-resolve the
    # aggregate expression after windows are involved); only the final
    # top-level clause — never inside an OVER (...)
    for item, alias in aliased:
        for kw in ("ORDER", "GROUP"):
            pos = _find_kw(sql, kw + r"\s+BY")
            if pos == -1:
                continue
            sql = sql[:pos] + sql[pos:].replace(item, alias)
    return sql


_INT_OPERAND = r"(CAST\((?:[^()]|\([^()]*\))*AS BIGINT\)|-?\d+(?![\d.eE]))"


_VENEER_IN_SORT = re.compile(
    r"\b(inner_product|l1_distance|l2_distance|cosine_distance|ip_in_range|"
    r"is_subnet_of|contains_ci|equals_ci|equals_fuzzy|geo_distance|"
    r"geo_tile_\w+|array_sum)\b",
    re.IGNORECASE,
)


def _orderby_udf_wrap(sql: str) -> str:
    """SQL UDFs are not supported inside Sort; materialise such ORDER
    BY expressions one subquery down."""
    pos = _find_kw(sql, r"ORDER\s+BY")
    if pos == -1:
        return sql
    after = sql[pos:]
    lim = _find_kw(after, "LIMIT")
    clause = after[len("ORDER BY") :] if lim == -1 else after[: lim]
    clause = re.sub(r"^\s*ORDER\s+BY", "", clause, flags=re.IGNORECASE)
    if not _VENEER_IN_SORT.search(clause):
        return sql
    tail = "" if lim == -1 else after[lim:]
    exprs = []
    orders = []
    for i, item in enumerate(_top_level_split(clause)):
        item = item.strip()
        dm = re.search(r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?$", item,
                       flags=re.IGNORECASE)
        direction = dm.group(0) if dm else ""
        expr = item[: dm.start()] if dm else item
        exprs.append(f"{expr} AS __ord{i}")
        orders.append(f"__ord{i}{direction}")
    m = re.search(r"\bSELECT\b(\s+DISTINCT\b)?", sql, flags=re.IGNORECASE)
    fpos = _find_kw(sql, "FROM", m.end())
    if fpos == -1 or fpos > pos:
        return sql
    items_txt = sql[m.end() : fpos].strip()
    middle = sql[fpos:pos]
    ords = ", ".join(f"__ord{i}" for i in range(len(exprs)))
    inner = f"SELECT {items_txt}, {', '.join(exprs)} {middle}"
    return (
        f"SELECT * EXCEPT ({ords}) FROM ({inner}) "
        f"ORDER BY {', '.join(orders)} {tail}"
    )


def _int_division(sql: str) -> str:
    """Sneller's ``/`` on two integers is integer division (truncating,
    int-arith expectations); rewrite syntactically-integer operand
    pairs to Spark's DIV."""
    pat = re.compile(_INT_OPERAND + r"\s*/\s*" + _INT_OPERAND)
    prev = None
    while prev != sql:
        prev = sql
        sql = pat.sub(r"(\1 DIV \2)", sql)
    return sql


_DIV_ATOM = (
    r"(?:-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
    r"|[\w.`]+\((?:[^()]|\([^()]*\))*\)"
    r"|[\w.`]+"
    r"|\((?:[^()]|\([^()]*\)|\((?:[^()]|\([^()]*\))*\))*\))"
)
_DIV_PAT = re.compile(
    "(" + _DIV_ATOM + r"(?:\s*\*\s*" + _DIV_ATOM + r")*)\s*/\s*(" + _DIV_ATOM + ")"
)


def _ieee_div_expr(a: str, b: str) -> str:
    """IEEE-754 division: x/0 -> ±Inf, 0/0 and NaN/0 -> NaN (the
    reference evaluates unboxed doubles natively; Spark's ``/`` yields
    NULL on zero denominators).  Inlined as an expression, not a SQL
    UDF, so it survives Sort/correlated-subquery contexts."""
    return (
        f"(CASE WHEN ({b}) IS NULL OR ({a}) IS NULL THEN NULL "
        f"WHEN ({b}) = 0D THEN "
        f"CASE WHEN isnan(CAST(({a}) AS DOUBLE)) OR ({a}) = 0D "
        f"THEN CAST('NaN' AS DOUBLE) "
        f"WHEN (({a}) > 0D) != startswith(CAST(CAST(({b}) AS DOUBLE) "
        f"AS STRING), '-') THEN CAST('Infinity' AS DOUBLE) "
        f"ELSE CAST('-Infinity' AS DOUBLE) END "
        # \x01 placeholder keeps the fixpoint loop from re-rewriting
        # the division this expansion itself emits
        f"ELSE CAST(({a}) AS DOUBLE) \x01 ({b}) END)"
    )


def _ieee_division(sql: str) -> str:
    """Rewrite remaining (non-integer-pair) ``/`` to IEEE semantics."""

    def seg_fn(seg: str) -> str:
        prev = None
        while prev != seg:
            prev = seg
            seg = _DIV_PAT.sub(
                lambda m: _ieee_div_expr(m.group(1), m.group(2)), seg
            )
        return seg.replace("\x01", "/")

    return _rewrite_outside_strings(sql, seg_fn)


_RESERVED_ALIASES = ("outer",)


def _quote_reserved(seg: str) -> str:
    for w in _RESERVED_ALIASES:
        seg = re.sub(rf"(?<![\w`.]){w}(?![\w`])", f"`{w}`", seg, flags=re.IGNORECASE)
    return seg


def translate(
    query: str,
    double_cols: frozenset | set = frozenset(),
    presence_cols: frozenset | set = frozenset(),
    ieee_division: bool = True,
) -> str:
    sql = query
    sql = _rewrite_outside_strings(sql, lambda s: s.replace('"', "`"))
    sql = _rewrite_outside_strings(sql, _fold_int_products)
    sql = _constructors(sql)
    sql = _rewrite_unpivot(sql)
    sql = _rewrite_lateral_unnest(sql)
    sql = _rewrite_distinct_on(sql)
    sql = _groupby_alias(sql)
    sql = _having_window_alias(sql)
    sql = _rewrite_having_window(sql)
    sql = _orderby_agg_alias_fold(sql)
    sql = _chain_scalar_subqueries(sql)
    sql = _structify_scalar_subqueries(sql)
    sql = _similar_to(sql)
    sql = _ilike_fold(sql)
    sql = _like_escape(sql)
    sql = _tilde_regex(sql)
    sql = _rewrite_outside_strings(sql, _word_rewrites)
    if ieee_division:
        # typed-column path only (ieee_division=False marks the variant
        # route, whose rewriter dispatches ARRAY_SIZE itself — lists
        # only, v_asize — distinct from SIZE on lists+structs).
        # nullif(.., -1) keeps the MISSING discipline: under non-ANSI
        # legacy sizeOfNull, Spark's size(NULL) is -1, not NULL.
        sql = _rewrite_array_size(sql)
    sql = _rewrite_calls(sql)
    sql = _int_division(sql)
    if ieee_division:
        # skipped on the VARIANT path: variantize() would re-dispatch
        # the inlined CASE's comparisons through v_eq/v_cmpi and break
        # its syntax; variant operands go through v_num instead
        sql = _ieee_division(sql)
    sql = _orderby_udf_wrap(sql)
    sql = _auto_alias(sql)
    sql = _rewrite_outside_strings(sql, _quote_reserved)
    # schema-aware post-passes (applied after aliasing so the implicit
    # column names still derive from the reference spelling)
    if double_cols and "OVER" not in sql.upper():
        # the reference SUMs floats with Kahan-Babushka-Neumaier
        # compensation (0020-aggregate/sum-float-stress.test header);
        # collect_list keeps ingest order, matching its streaming pass
        for c in double_cols:
            sql = re.sub(
                rf"\bSUM\s*\(\s*{re.escape(c)}\s*\)(?!\s*FILTER)",
                f"kbn_sum(collect_list(cast({c} as double)))",
                sql,
                flags=re.IGNORECASE,
            )
    for c in presence_cols:
        # COUNT(x) counts present-but-NULL values (MISSING only is
        # skipped, 0020-aggregate/aggregate-float-null.test); the
        # loader materialises presence as __present_<x>
        sql = re.sub(
            rf"\bCOUNT\s*\(\s*{re.escape(c)}\s*\)",
            f"COUNT(__present_{c})",
            sql,
            flags=re.IGNORECASE,
        )
    return sql


# ---------------------------------------------------------------------------
# input loading with Sneller-style ingestion typing


def classify_columns(input_lines: list[str]) -> tuple[dict[str, set], list[str]]:
    seen: dict[str, set] = {}
    for line in input_lines:
        try:
            row = json.loads(line)
        except Exception:  # noqa: BLE001
            continue
        if not isinstance(row, dict):
            continue
        for k, v in row.items():
            if v is None:
                continue
            seen.setdefault(k, set()).add(type(v).__name__)
            if isinstance(v, list):
                # heterogeneous ELEMENT types also need the variant
                # substrate (0015-unnest: MAX over a lateral alias must
                # see dynamic types, and spark.read.json would coerce
                # mixed elements to strings)
                for e in v:
                    if e is not None:
                        seen.setdefault(k, set()).add(
                            "elem:" + type(e).__name__
                        )
    def _is_mixed(t: set) -> bool:
        top = {n for n in t if not n.startswith("elem:")}
        elem = {n for n in t if n.startswith("elem:")}
        if len(top) > 1 and not top <= {"int", "float"}:
            return True
        return len(elem) > 1 and not elem <= {"elem:int", "elem:float"}

    mixed = [k for k, t in seen.items() if _is_mixed(t)]
    return seen, sorted(mixed)


def _all_timestamps(input_lines: list[str], col: str) -> bool:
    saw = False
    for line in input_lines:
        row = json.loads(line)
        v = row.get(col) if isinstance(row, dict) else None
        if v is None:
            continue
        if not isinstance(v, str) or not _TS_RE.match(v):
            return False
        saw = True
    return saw


def load_input(spark, input_lines: list[str], presence_for: set | None = None):
    """presence_for: column names whose present-vs-absent distinction the
    query observes (COUNT(col)); for those that carry explicit nulls a
    ``__present_<col>`` shadow (TRUE when the key exists) is added,
    because spark.read.json collapses ``{"x": null}`` and ``{}``."""
    from pyspark.sql import functions as F

    shadows = set()
    if presence_for:
        nullable = set()
        for line in input_lines:
            try:
                row = json.loads(line)
            except Exception:  # noqa: BLE001
                continue
            if isinstance(row, dict):
                for c in presence_for:
                    if c in row and row[c] is None:
                        nullable.add(c)
        if nullable:
            out_lines = []
            for line in input_lines:
                try:
                    row = json.loads(line)
                except Exception:  # noqa: BLE001
                    out_lines.append(line)
                    continue
                if isinstance(row, dict):
                    for c in nullable:
                        if c in row:
                            row[f"__present_{c}"] = True
                    out_lines.append(json.dumps(row))
                else:
                    out_lines.append(line)
            input_lines = out_lines
            shadows = nullable
    rdd = spark.sparkContext.parallelize(
        input_lines or ["{}"], INPUT_PARTITIONS
    )
    df = spark.read.json(rdd)
    types, _ = classify_columns(input_lines)
    for col, tnames in types.items():
        if tnames == {"str"} and col in df.columns and _all_timestamps(input_lines, col):
            df = df.withColumn(col, F.to_timestamp(F.col(col)))
    return df, shadows


def _register_inputs(
    spark, inputs: list[list[str]], presence_for: set | None = None
) -> tuple[dict[str, "object"], set]:
    views: dict[str, object] = {}
    shadows: set = set()

    def reg(name: str, lines: list[str]) -> None:
        nonlocal shadows
        df, sh = load_input(spark, lines, presence_for)
        shadows |= sh
        df.createOrReplaceTempView(name)
        views[name] = df
        # raw-document twin for UNPIVOT (keeps present-but-null fields)
        spark.createDataFrame(
            [(l,) for l in (lines or ["{}"])], "__js string"
        ).createOrReplaceTempView(f"{name}__rawjson")

    if len(inputs) == 1:
        reg("input", inputs[0])
    else:
        for i, lines in enumerate(inputs):
            reg(f"input{i}", lines)
    return views, shadows


def _union_by_name(dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


_GLOB_COUNT = [0]


def _table_refs(spark, sql: str, views: dict) -> str:
    """Resolve ``++`` concatenation and TABLE_GLOB/TABLE_PATTERN against
    the registered input views (the reference resolves them against its
    table namespace, testquery.go:453)."""
    plus = re.compile(r"([A-Za-z_]\w*)(\s*\+\+\s*[A-Za-z_]\w*)+")
    m = plus.search(sql)
    while m:
        names = re.findall(r"[A-Za-z_]\w*", m.group(0))
        dfs = [views[n] for n in names if n in views]
        _GLOB_COUNT[0] += 1
        vname = f"__concat{_GLOB_COUNT[0]}"
        _union_by_name(dfs).createOrReplaceTempView(vname)
        sql = sql[: m.start()] + vname + sql[m.end() :]
        m = plus.search(sql)

    def table_fn(m2):
        kind = m2.group(1).upper()
        pat = m2.group(2)
        if kind == "TABLE_GLOB":
            names = [n for n in views if fnmatch.fnmatchcase(n, pat)]
        else:
            rx = re.compile(pat)
            names = [n for n in views if rx.fullmatch(n)]
        if not names:
            return m2.group(0)
        _GLOB_COUNT[0] += 1
        vname = f"__glob{_GLOB_COUNT[0]}"
        _union_by_name([views[n] for n in sorted(names)]).createOrReplaceTempView(vname)
        return vname

    sql = re.sub(
        r"\b(TABLE_GLOB|TABLE_PATTERN)\s*\(\s*[\"']([^\"']+)[\"']\s*\)",
        table_fn,
        sql,
    )
    return sql


# ---------------------------------------------------------------------------
# comparison under the MISSING-vs-NULL output discipline


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if hasattr(v, "toPython"):  # VariantVal
        return _canon_value(v.toPython())
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, (int, float)):
        # every number — ion int or Spark double — canonicalises to 12
        # significant digits (beyond that is libm last-ulp noise or
        # double round-off on values ion kept as exact ints), then
        # whole values under 2^53 normalise to int
        if isinstance(v, float):
            # non-finite doubles canonicalise to the reference's
            # expected-NDJSON spelling (testquery.go fp tokens)
            if math.isnan(v):
                return "float64:NaN"
            if math.isinf(v):
                return "float64:+inf" if v > 0 else "float64:-inf"
        f = float(f"{float(v):.12g}")
        if f == int(f) and abs(f) < 2**53:
            return int(f)
        return f
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if v.microsecond:
            return v.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0") + "Z"
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%dT00:00:00Z")
    if isinstance(v, str) and _TS_RE.match(v):
        s = v.replace("+00:00", "Z")
        if not s.endswith("Z"):
            s += "Z"
        if "." in s:
            head, tail = s.split(".", 1)
            frac = tail[:-1].rstrip("0")
            return head + ("." + frac if frac else "") + "Z"
        return s
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        # an ion-null struct member and an absent member are both
        # invisible under the MISSING≡NULL output discipline (variant
        # nulls arrive as VariantVal, so test the canonical value)
        return tuple(
            sorted(
                (k, cx)
                for k, cx in ((k, _canon_value(x)) for k, x in v.items())
                if cx is not None
            )
        )
    if hasattr(v, "asDict"):
        return _canon_value(v.asDict(recursive=True))
    return v


def canon_row(d: dict) -> tuple:
    # Sneller omits MISSING fields from output; Spark emits NULL
    # columns — under MISSING≡NULL both drop
    return tuple(
        sorted(
            (k, _canon_value(v))
            for k, v in d.items()
            if v is not None and _canon_value(v) is not None
        )
    )


def is_ordered(query: str) -> bool:
    depth = 0
    for m in re.finditer(r"[()]|ORDER\s+BY", query, flags=re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def compare(got: list[dict], expected: list[dict], ordered: bool) -> str | None:
    # a global aggregate over no rows yields an all-MISSING record that
    # the reference does not emit; under MISSING≡NULL an all-null row
    # and an absent row are the same
    got_c = [c for c in (canon_row(r) for r in got) if c != ()]
    exp_c = [c for c in (canon_row(r) for r in expected) if c != ()]
    if not ordered:
        got_c, exp_c = sorted(got_c, key=repr), sorted(exp_c, key=repr)
    if got_c == exp_c:
        return None
    for i, (g, e) in enumerate(zip(got_c, exp_c)):
        if g != e:
            return f"row {i}: got {g} expected {e}"
    return f"row count {len(got_c)} vs {len(exp_c)}: got {got_c[:3]} expected {exp_c[:3]}"


# ---------------------------------------------------------------------------
# runner

def ensure_replay_udfs(spark) -> None:
    """Register python-backed reference builtins the SQL veneer can't
    express (GEO_HASH base32 interleaving; numpy kernel shared with
    functions/scalar.py, batched per distinct precision).  Guarded by a
    catalog probe, not an id(spark) cache — ids recycle after a stopped
    session is collected.  The probe targets the LAST function this
    body registers so a mid-sequence failure retries the whole set."""
    if spark.catalog.functionExists("sn_contains_fuzzy_uni"):
        return
    import pandas as pd
    from pyspark.sql import functions as F

    from sneller_spark.functions.scalar import _geohash_kernel

    def _geo_hash(lat: pd.Series, lon: pd.Series, prec: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(lat), dtype="object")
        for p in prec.dropna().unique():
            mask = (prec == p).fillna(False)
            out[mask] = _geohash_kernel(
                lat[mask].to_numpy(), lon[mask].to_numpy(), int(p)
            ).to_numpy()
        return out

    _geo_hash.__annotations__ = {
        "lat": pd.Series, "lon": pd.Series, "prec": pd.Series,
        "return": pd.Series,
    }
    spark.udf.register("geo_hash", F.pandas_udf("string")(_geo_hash))

    from sneller_spark.replay_casemap import (
        simple_fold,
        simple_lower,
        simple_upper,
    )

    spark.udf.register("sn_lower", simple_lower, "string")
    spark.udf.register("sn_upper", simple_upper, "string")
    spark.udf.register("sn_fold", simple_fold, "string")

    from sneller_spark.replay_geomath import cosine_distance_ref
    from sneller_spark.replay_geomath import geo_tile_es as _gte

    spark.udf.register("sn_geo_tile_es", _gte, "string")
    spark.udf.register("sn_cosine_distance", cosine_distance_ref, "double")

    from sneller_spark.replay_fuzzy import contains_fuzzy_ref, equals_fuzzy_ref

    spark.udf.register(
        "sn_equals_fuzzy",
        lambda s, n, t: equals_fuzzy_ref(s, n, t, True), "boolean",
    )
    spark.udf.register(
        "sn_equals_fuzzy_uni",
        lambda s, n, t: equals_fuzzy_ref(s, n, t, False), "boolean",
    )
    spark.udf.register(
        "sn_contains_fuzzy",
        lambda s, n, t: contains_fuzzy_ref(s, n, t, True), "boolean",
    )
    spark.udf.register(
        "sn_contains_fuzzy_uni",
        lambda s, n, t: contains_fuzzy_ref(s, n, t, False), "boolean",
    )


_DATASHAPE_DEPTH = 5


def _datashape_sql(spark, lines: list[str]) -> str:
    """``SELECT SNELLER_DATASHAPE(*) FROM t`` replayed through Spark 4
    VARIANT: recursive variant_explode to dotted paths (arrays add
    ``$items``), per-VALUE ion typing (whole doubles are ints, as the
    reference's JSON→ion ingestion normalises), per-path stat maps
    (vm/sysdatashape.go:45-70 field vocabulary)."""
    spark.createDataFrame(
        [(l,) for l in (lines or ["{}"])], "line string"
    ).createOrReplaceTempView("__ds_lines")
    lvls = [
        """SELECT CASE WHEN t.key IS NULL THEN '$items' ELSE t.key END AS path,
                  t.value AS v
           FROM __ds_raw, LATERAL variant_explode(__ds_raw.v) AS t"""
    ]
    for k in range(2, _DATASHAPE_DEPTH + 1):
        lvls.append(
            f"""SELECT p.path || CASE WHEN t.key IS NULL THEN '.$items'
                                      ELSE '.' || t.key END AS path,
                       t.value AS v
                FROM __lvl{k - 1} p, LATERAL variant_explode(p.v) AS t"""
        )
    lvl_ctes = ",\n".join(
        f"__lvl{i + 1} AS ({q})" for i, q in enumerate(lvls)
    )
    union = " UNION ALL ".join(
        f"SELECT * FROM __lvl{i + 1}" for i in range(len(lvls))
    )
    return f"""
    WITH __ds_raw AS (SELECT parse_json(line) AS v FROM __ds_lines),
    {lvl_ctes},
    __allv AS ({union}),
    __typed AS (
      SELECT path,
        CASE WHEN sv LIKE 'OBJECT%' OR sv LIKE 'STRUCT%' THEN 'struct'
             WHEN sv LIKE 'ARRAY%' THEN 'list'
             WHEN sv = 'STRING' THEN 'string'
             WHEN sv = 'BOOLEAN' THEN 'bool'
             WHEN sv = 'VOID' THEN 'null'
             WHEN try_variant_get(v, '$', 'double') IS NULL THEN 'other'
             WHEN try_variant_get(v, '$', 'double') = floor(try_variant_get(v, '$', 'double')) THEN 'int'
             ELSE 'float' END AS t,
        try_variant_get(v, '$', 'double') AS num,
        length(try_variant_get(v, '$', 'string')) AS slen
      FROM (SELECT path, v, schema_of_variant(v) AS sv FROM __allv)
    ),
    __agg AS (
      SELECT path,
        sum(CASE WHEN t = 'null' THEN 1 END) AS n_null,
        sum(CASE WHEN t = 'bool' THEN 1 END) AS n_bool,
        sum(CASE WHEN t = 'int' THEN 1 END) AS n_int,
        min(CASE WHEN t = 'int' THEN num END) AS int_min,
        max(CASE WHEN t = 'int' THEN num END) AS int_max,
        sum(CASE WHEN t = 'float' THEN 1 END) AS n_float,
        min(CASE WHEN t = 'float' THEN num END) AS f_min,
        max(CASE WHEN t = 'float' THEN num END) AS f_max,
        sum(CASE WHEN t = 'string' THEN 1 END) AS n_str,
        min(CASE WHEN t = 'string' THEN slen END) AS s_min,
        max(CASE WHEN t = 'string' THEN slen END) AS s_max,
        sum(CASE WHEN t = 'list' THEN 1 END) AS n_list,
        sum(CASE WHEN t = 'struct' THEN 1 END) AS n_struct
      FROM __typed GROUP BY path
    ),
    __maps AS (
      SELECT path, map_from_entries(filter(array(
        named_struct('k', 'null', 'v', cast(n_null as double)),
        named_struct('k', 'bool', 'v', cast(n_bool as double)),
        named_struct('k', 'int', 'v', cast(n_int as double)),
        named_struct('k', 'int-min-value', 'v', int_min),
        named_struct('k', 'int-max-value', 'v', int_max),
        named_struct('k', 'float', 'v', cast(n_float as double)),
        named_struct('k', 'float-min-value', 'v', f_min),
        named_struct('k', 'float-max-value', 'v', f_max),
        named_struct('k', 'string', 'v', cast(n_str as double)),
        named_struct('k', 'string-min-length', 'v', cast(s_min as double)),
        named_struct('k', 'string-max-length', 'v', cast(s_max as double)),
        named_struct('k', 'list', 'v', cast(n_list as double)),
        named_struct('k', 'struct', 'v', cast(n_struct as double))
      ), e -> e.v IS NOT NULL)) AS m FROM __agg
    )
    SELECT (SELECT COUNT(*) FROM __ds_raw) AS total,
           map_from_entries(collect_list(struct(path, m))) AS fields
    FROM __maps
    """


def _run_variant_case(
    spark, rel: str, query: str, inputs, expected, keep_rows: bool
) -> dict:
    """Replay a mixed-type case on VARIANT columns (see replay_variant)."""
    from . import replay_variant as rv

    rv.ensure_variant_udfs(spark)
    ensure_replay_udfs(spark)
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    extra: set = set()
    sql = query
    try:
        with_seq = bool(
            re.search(r"\bDISTINCT\b[\s\S]*\bLIMIT\b", query, re.IGNORECASE)
        )
        for attempt in range(4):
            views = rv.register_variant_inputs(
                spark, inputs, sorted(extra), with_seq
            )
            cols: set = set()
            for df in views.values():
                cols.update(df.columns)
            sql = _table_refs(spark, query, views)
            # EXISTS(SELECT * ...) must not be structified into a
            # collect_list scalar wrapper (it is a predicate, and the
            # wrapper deepens correlation past what Catalyst supports)
            sql = re.sub(
                r"(\bEXISTS\s*\(\s*SELECT\s+)\*",
                r"\g<1>1",
                sql,
                flags=re.IGNORECASE,
            )
            sql = translate(sql, ieee_division=False)
            # "SELECT *" where an unnest alias clobbers a base column
            # (0015-unnest/unnest-star): the reference's * exposes the
            # BINDING, not the shadowed column — expand explicitly
            lvm = re.search(
                r"LATERAL\s+VIEW\s+\w+\s*\((?:[^()]|\([^()]*\))*\)\s*"
                r"(\w+)\s+AS\s+`?(\w+)`?",
                sql, re.IGNORECASE,
            )
            if lvm and lvm.group(2) in cols:
                sm = re.search(r"\bSELECT\s+\*(?!\w)", sql, re.IGNORECASE)
                if sm:
                    fm = re.search(
                        r"\bFROM\s+`?\w+`?\s+AS\s+(`?\w+`?)",
                        sql, re.IGNORECASE,
                    )
                    qual = fm.group(1) + "." if fm else ""
                    items = [
                        f"{qual}`{c}`"
                        for c in sorted(cols)
                        if c != lvm.group(2)
                    ]
                    items.append(
                        f"{lvm.group(1)}.`{lvm.group(2)}` AS `{lvm.group(2)}`"
                    )
                    sql = (
                        sql[: sm.start()]
                        + "SELECT "
                        + ", ".join(items)
                        + sql[sm.end():]
                    )
            sql = rv.variantize(sql, cols)
            try:
                got = [
                    r.asDict(recursive=True) for r in spark.sql(sql).collect()
                ]
            except Exception as exc:  # noqa: BLE001
                msg = str(exc)
                # referenced-but-absent field: add it as an all-NULL
                # variant column (schemaless MISSING discipline)
                um = re.search(
                    r"(?:UNRESOLVED_COLUMN|FIELD_NOT_FOUND)[^`]*`([\w.`]+)`",
                    msg,
                )
                if um and attempt < 3:
                    c = um.group(1).split("`")[-1].split(".")[-1]
                    if c not in extra and all(
                        c not in d.columns for d in views.values()
                    ):
                        extra.add(c)
                        continue
                # Spark refuses SQL UDF calls in some contexts
                # (correlated subqueries, Sort): retry with the v_*
                # bodies expanded textually
                if "v_" in sql and (
                    "UNSUPPORTED_SQL_UDF_USAGE" in msg
                    or "UNSUPPORTED_SUBQUERY_EXPRESSION" in msg
                    or "Correlated" in msg
                ):
                    try:
                        sql2 = rv.inline_all(sql)
                        got = [
                            r.asDict(recursive=True)
                            for r in spark.sql(sql2).collect()
                        ]
                        sql = sql2
                        break
                    except Exception as exc2:  # noqa: BLE001
                        exc = exc2
                return {
                    "case": rel,
                    "status": "error",
                    "detail": _err_text(exc),
                    "sql": sql,
                }
            break
        diff = compare(got, expected, is_ordered(sql))
    finally:
        restore_ansi(spark, prev_ansi)
    if diff is None:
        return {"case": rel, "status": "pass", "sql": sql}
    rec = {"case": rel, "status": "mismatch", "detail": diff[:400], "sql": sql}
    if keep_rows:
        ordered = is_ordered(sql)
        got_c = [c for c in (canon_row(r) for r in got) if c != ()]
        exp_c = [c for c in (canon_row(r) for r in expected) if c != ()]
        if not ordered:
            got_c, exp_c = sorted(got_c, key=repr), sorted(exp_c, key=repr)
        rec["got_rows"], rec["exp_rows"] = got_c, exp_c
    return rec


def _err_text(exc) -> str:
    s = str(exc) or repr(exc)
    for line in s.strip().splitlines():
        if line.strip():
            return line.strip()[:300]
    return repr(exc)[:300]


def run_case(spark, path: str, keep_rows: bool = False) -> dict:
    rel = os.path.relpath(path, REFERENCE_QUERIES)
    try:
        query, inputs, expected = parse_case(path)
    except Exception as exc:  # noqa: BLE001
        return {"case": rel, "status": "parse-error", "detail": _err_text(exc)}
    if re.search(r"\+\+|TABLE_GLOB|TABLE_PATTERN", query):
        # concatenated tables share one schema: classify the union
        mixed_all = classify_columns([l for lines in inputs for l in lines])[1]
    else:
        mixed_all = sorted(
            {c for lines in inputs for c in classify_columns(lines)[1]}
        )
    if mixed_all and not re.search(
        r"\bSNELLER_DATASHAPE\b", query, flags=re.IGNORECASE
    ):
        # heterogeneously-typed columns: run on the VARIANT substrate
        # (replay_variant.py) instead of typed spark.read.json columns
        # (SNELLER_DATASHAPE has its own raw-document path below)
        return _run_variant_case(spark, rel, query, inputs, expected, keep_rows)

    ensure_replay_udfs(spark)
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    dm = re.match(
        r"\s*SELECT\s+SNELLER_DATASHAPE\s*\(\s*\*\s*\)\s+FROM\s+(\w+)\s*$",
        query,
        flags=re.IGNORECASE,
    )
    if dm:
        tbl = dm.group(1).lower()
        idx = 0 if tbl == "input" else int(tbl.removeprefix("input") or 0)
        try:
            sql = _datashape_sql(spark, inputs[idx])
            got = [r.asDict(recursive=True) for r in spark.sql(sql).collect()]
            diff = compare(got, expected, ordered=False)
        except Exception as exc:  # noqa: BLE001
            return {"case": rel, "status": "error", "detail": _err_text(exc)}
        finally:
            restore_ansi(spark, prev_ansi)
        if diff is None:
            return {"case": rel, "status": "pass", "sql": sql}
        return {"case": rel, "status": "mismatch", "detail": diff[:400],
                "sql": sql}
    try:
        # presence shadows only when the query COUNTs a plain column and
        # has no star projection the shadow column could leak into
        counted = set(
            re.findall(r"\bCOUNT\s*\(\s*([A-Za-z_]\w*)\s*\)", query,
                       flags=re.IGNORECASE)
        )
        # a star *projection* (SELECT * / t.* / , *) could leak the
        # shadow column; multiplication and COUNT(*) are fine
        if re.search(r"(?:\bSELECT|,)\s*(?:[A-Za-z_]\w*\s*\.\s*)?\*",
                     query, flags=re.IGNORECASE):
            counted = set()
        views, shadows = _register_inputs(spark, inputs, counted)
        sql = _table_refs(spark, query, views)
        double_cols = set()
        non_double = set()
        for df in views.values():
            for c, t in df.dtypes:
                (double_cols if t == "double" else non_double).add(c)
        sql = translate(sql, double_cols - non_double, shadows)
        got = None
        for attempt in range(4):
            try:
                got = [
                    r.asDict(recursive=True) for r in spark.sql(sql).collect()
                ]
                break
            except Exception as exc:  # noqa: BLE001
                msg = str(exc)
                # schemaless discipline: a referenced-but-absent field is
                # MISSING in the reference; add it as a NULL column
                um = re.search(
                    r"(?:UNRESOLVED_COLUMN|FIELD_NOT_FOUND)[^`]*`([\w.`]+)`",
                    msg,
                )
                if um and attempt < 3:
                    from pyspark.sql import functions as F

                    col = um.group(1).split("`")[-1].split(".")[-1]
                    patched = False
                    for name, df in list(views.items()):
                        if col not in df.columns:
                            df = df.withColumn(col, F.lit(None).cast("string"))
                            df.createOrReplaceTempView(name)
                            views[name] = df
                            patched = True
                    if patched:
                        continue
                # an all-null JSON column infers as STRING; when an
                # integral/numeric op rejects it the reference would
                # have treated it as typeless MISSING — recast
                tm = re.search(
                    r'requires the "(INTEGRAL|NUMERIC|INTEGER)"[\s\S]*?'
                    r'"([\w.]+)" has the type "STRING"',
                    msg,
                )
                if tm and attempt < 3:
                    from pyspark.sql import functions as F

                    col = tm.group(2).split(".")[-1]
                    patched = False
                    for name, df in list(views.items()):
                        if col in df.columns and dict(df.dtypes).get(col) == "string" \
                                and df.where(F.col(col).isNotNull()).head(1) == []:
                            df = df.withColumn(col, F.col(col).cast("bigint"))
                            df.createOrReplaceTempView(name)
                            views[name] = df
                            patched = True
                    if patched:
                        continue
                if "VARIANT" in msg and "__ve.value" in sql and attempt < 3:
                    sql = sql.replace(
                        "__ve.value AS", "cast(__ve.value as string) AS"
                    )
                    continue
                return {
                    "case": rel,
                    "status": "error",
                    "detail": _err_text(exc),
                    "sql": sql,
                }
        diff = compare(got, expected, is_ordered(sql))
    finally:
        restore_ansi(spark, prev_ansi)
    if diff is None:
        return {"case": rel, "status": "pass", "sql": sql}
    rec = {"case": rel, "status": "mismatch", "detail": diff[:400], "sql": sql}
    if keep_rows:
        ordered = is_ordered(sql)
        got_c = [c for c in (canon_row(r) for r in got) if c != ()]
        exp_c = [c for c in (canon_row(r) for r in expected) if c != ()]
        if not ordered:
            got_c, exp_c = sorted(got_c, key=repr), sorted(exp_c, key=repr)
        rec["got_rows"], rec["exp_rows"] = got_c, exp_c
    return rec
