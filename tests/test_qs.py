"""Unit tests for adapters.qs — lexer and parser only (no Spark).

Cross-checked against the reference's ragel scanner (qs_lexer.rl:
longest match, declaration-order tie-break) and yacc grammar
(qs_parser.y: precedence AND < OR < NOT; `+term` must-combine drops
plain OR-terms, qs.go:64-116).
"""

from __future__ import annotations

import pytest

from sneller_spark.adapters import qs


def kinds(s):
    return [k for k, _ in qs.tokenize(s)]


def test_longest_match_beats_keyword():
    # 'ANDY' is text, not the AND keyword + text
    assert qs.tokenize("ANDY") == [("ALPHA", "ANDY")]
    assert kinds("a AND b") == ["ALPHA", "AND", "ALPHA"]
    assert kinds("a && b") == ["ALPHA", "AND", "ALPHA"]
    assert kinds("a || b") == ["ALPHA", "OR", "ALPHA"]
    assert kinds("!a") == ["NOT", "ALPHA"]


def test_declaration_order_breaks_ties():
    # 'true' ties BOOL vs ALPHA -> BOOL (listed first); 'truex' is text
    assert qs.tokenize("true") == [("BOOL", True)]
    assert qs.tokenize("FALSE") == [("BOOL", False)]
    assert qs.tokenize("truex") == [("ALPHA", "truex")]
    # '123' ties INT vs ALPHA -> INT; '123a' is text
    assert qs.tokenize("123") == [("INT", 123)]
    assert qs.tokenize("123a") == [("ALPHA", "123a")]
    # leading sign is part of the number (qs_lexer.rl [+\-]? digit+),
    # so '+12' is the int 12, not must(+) 12
    assert qs.tokenize("+12") == [("INT", 12)]
    assert qs.tokenize("-5") == [("INT", -5)]
    # but '-abc' is must-not + text ('-' can't start unquoted text)
    assert qs.tokenize("-abc") == [("MINUS", "-"), ("ALPHA", "abc")]


def test_annotations_and_literals():
    assert qs.tokenize("foo~") == [("ALPHA", "foo"), ("FUZZY", -1.0)]
    assert qs.tokenize("foo~12") == [("ALPHA", "foo"), ("FUZZY", 12.0)]
    assert qs.tokenize("foo^3.5") == [("ALPHA", "foo"), ("BOOST", 3.5)]
    # quoted/regex keep their inner text verbatim (the reference's
    # tokenStripped drops only the delimiters)
    assert qs.tokenize(r"/a\/b/") == [("REGEX", r"a\/b")]
    assert qs.tokenize(r'"a\"b"') == [("QUOTED", r'a\"b')]
    # escaped reserved chars join the unquoted word; the reference
    # strips EVERY backslash from the token (qs_lexer.rl:141)
    assert qs.tokenize(r"f\:x") == [("ALPHA", "f:x")]
    assert qs.tokenize(r"a\&&b") == [("ALPHA", "a&&b")]
    assert qs.tokenize(r"a\||b") == [("ALPHA", "a||b")]
    assert qs.tokenize("a" + "\\" * 4 + "b") == [("ALPHA", "ab")]
    assert qs.tokenize("a.b:c") == [
        ("ALPHA", "a"), ("DOT", "."), ("ALPHA", "b"),
        ("COLON", ":"), ("ALPHA", "c"),
    ]
    # uuid-looking text stays one token (longest match beats INT)
    assert qs.tokenize("9166ddf7-10b5")[0][0] == "ALPHA"


def test_range_tokens():
    assert kinds("[1 TO 5}") == [
        "RANGE_START", "INT", "TO", "INT", "RANGE_END"]
    assert qs.tokenize("[")[0] == ("RANGE_START", True)
    assert qs.tokenize("{")[0] == ("RANGE_START", False)
    assert qs.tokenize("]")[0] == ("RANGE_END", True)
    assert qs.tokenize("}")[0] == ("RANGE_END", False)


def test_parse_must_combine_drops_or_terms():
    # qs.go combine: 'test +foo -abc' -> (foo AND NOT abc); the plain
    # OR-term 'test' is dropped because a MUST term exists
    node = qs.parse("test +foo -abc")
    assert isinstance(node, qs.QSExpr2) and node.op == "AND"
    assert node.e1.value == "foo"
    assert isinstance(node.e2, qs.QSExpr1) and node.e2.op == "NOT"
    assert node.e2.expr.value == "abc"


def test_parse_precedence_or_binds_tighter():
    # qs_parser.y %left order: AND < OR, so a AND b OR c groups right
    node = qs.parse("a AND b OR c")
    assert node.op == "AND"
    assert node.e1.value == "a"
    assert node.e2.op == "OR"


def test_parse_not():
    node = qs.parse("NOT a AND b")
    assert node.op == "AND"
    assert isinstance(node.e1, qs.QSExpr1) and node.e1.op == "NOT"


def test_parse_field_forms():
    node = qs.parse("age:(+>=10 +<20)")
    assert node.op == "AND"
    assert (node.e1.op, node.e1.value) == (">=", 10)
    assert (node.e2.op, node.e2.value) == ("<", 20)
    assert node.e1.fields == ["age"]

    node = qs.parse("u_integer_count:[1 TO 5}")
    assert node.op == "AND"
    assert (node.e1.op, node.e1.value) == (">=", 1)
    assert (node.e2.op, node.e2.value) == ("<", 5)

    node = qs.parse("_exists_:foo.bar")
    assert node.op == "EXISTS" and node.fields == ["foo", "bar"]


def test_parse_range_star_bounds():
    assert isinstance(qs.parse("x:[* TO *]"), qs.QSValue)
    node = qs.parse("x:[* TO 5]")
    assert node.op == "<=" and node.value == 5
    node = qs.parse("x:{3 TO *}")
    assert node.op == ">" and node.value == 3


def test_parse_errors():
    with pytest.raises(qs.QSParseError):
        qs.parse("a AND")  # dangling operator
    with pytest.raises(qs.QSParseError):
        qs.parse("(a")  # unclosed paren
    with pytest.raises(qs.QSParseError):
        qs.tokenize("a & b")  # lone '&' is unscannable (reserved)


def test_resolve_field_subfields():
    # explicit mapping: .keyword/.raw are subfields, not path parts
    m = {"field.*": {"type": "text",
                     "fields": {"keyword": "keyword",
                                "raw": "keyword-ignore-case"}}}
    assert qs._resolve_field(["field", "test", "raw"], m) == (
        ["field", "test"], "keyword-ignore-case")
    assert qs._resolve_field(["field", "test", "keyword"], m) == (
        ["field", "test"], "keyword")
    assert qs._resolve_field(["field", "test"], m) == (
        ["field", "test"], "text")
    # no mapping: bare .keyword still selects exact matching
    assert qs._resolve_field(["name", "keyword"], None) == (
        ["name"], "")
    # '@timestamp' aliases 'timestamp' (expr.go:609)
    assert qs._resolve_field(["@timestamp"], {"timestamp": {
        "type": "datetime"}}) == (["timestamp"], "datetime")


def test_map_type_longest_wildcard_wins():
    m = {"u_*": {"type": "text"}, "u_string_*": {"type": "keyword"}}
    assert qs._map_type("u_string_path", m)["type"] == "keyword"
    assert qs._map_type("u_count", m)["type"] == "text"
    assert qs._map_type("other", m) is None


def test_wildcard_translations():
    assert qs._translate_wildcard("Val?e") == ("Val_e", True)
    assert qs._translate_wildcard("a*b") == ("a%b", True)
    assert qs._translate_wildcard(r"a\*b") == ("a*b", True)
    assert qs._translate_wildcard("plain") == ("plain", False)
    assert qs._translate_wildcard_regex("f*o") == "f.*o"
    assert qs._translate_wildcard_regex("f?o") == "f.o"
    assert qs._translate_wildcard_regex("a.b") == r"a\.b"
