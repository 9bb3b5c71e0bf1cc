"""Property tests for the query_string lexer/parser (adapters.qs).

The proxy fuzzes its parser (expr/partiql/testdata/fuzz corpus
posture); the analog here: arbitrary input must either parse or raise
QSParseError — never an unhandled exception — and generated
well-formed queries must always parse and lower to a Column.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from sneller_spark.adapters import qs

_ALPHABET = (
    "abz019 \t:+-()[]{}\"/~^*?.\\<>=&|!ANDORT_exists_trueFALSE\u00e9"
)


@given(st.text(alphabet=_ALPHABET, max_size=60))
@settings(max_examples=300, deadline=None)
def test_parse_never_crashes(text):
    try:
        qs.parse(text)
    except qs.QSParseError:
        pass  # rejection is fine; any other exception fails the test


_WORD = st.text(
    alphabet="abcdefgh0123456789", min_size=1, max_size=8
).filter(lambda w: w.upper() not in ("AND", "OR", "NOT", "TO", "TRUE",
                                     "FALSE") and not w.isdigit())


@st.composite
def _terms(draw):
    field = draw(_WORD)
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return f"{field}:{draw(_WORD)}"
    if kind == 1:
        return f'{field}:"{draw(_WORD)} {draw(_WORD)}"'
    if kind == 2:
        lo, hi = sorted([draw(st.integers(0, 99)),
                         draw(st.integers(0, 99))])
        return f"{field}:[{lo} TO {hi}]"
    if kind == 3:
        return f"_exists_:{field}"
    return f"{field}:(+{draw(_WORD)} -{draw(_WORD)})"


@given(st.lists(_terms(), min_size=1, max_size=4),
       st.sampled_from([" ", " AND ", " OR "]))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wellformed_queries_lower_to_columns(spark, parts, joiner):
    node = qs.parse(joiner.join(parts))
    col = qs.to_column(node, ["dflt"])
    assert col is not None


def test_negated_groups_and_nesting(spark):
    for q in [
        "NOT (a:1 OR b:2) AND c:3",
        "a:(x y z) b:[1 TO *] AND NOT _exists_:gone",
        '(((deep:"nested parens")))',
        "w:f*o? AND r:/ab[cd]+/",
    ]:
        assert qs.to_column(qs.parse(q), ["dflt"]) is not None
