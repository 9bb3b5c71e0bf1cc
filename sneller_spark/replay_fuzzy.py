"""Reference-exact fuzzy string matching for the replay corpus.

The reference's EQUALS_FUZZY / CONTAINS_FUZZY (and *_UNICODE) evaluate
a 3-character-lookahead greedy edit-distance approximation — NOT true
Levenshtein (fuzzy/edit_distance_approx.go:142-178 ``lookahead == 3``
branch, spec table internal/stringext/stringext.go:216).  The ASCII
variants treat every BYTE as one symbol; both variants case-normalise
ASCII letters only (fuzzy/edit_distance_approx.go:262-271).  This is a
semantic port of that decision procedure, not a code copy.
"""

from __future__ import annotations

_SENTINEL = 0x10FFFF  # utf8.MaxRune: positions past either end


def _kernel3(data: list, needle: list, pd: int, pn: int):
    """One greedy step: (edit_distance, advance_data, advance_needle)."""

    def d(i):
        return data[pd + i] if pd + i < len(data) else _SENTINEL

    def n(i):
        return needle[pn + i] if pn + i < len(needle) else _SENTINEL

    d0, d1, d2 = d(0), d(1), d(2)
    n0, n1, n2 = n(0), n(1), n(2)

    if n0 == d0:  # equality
        return 0, 1, 1
    if n0 == d1 and n1 == d0:  # transposition
        return 1, 2, 2
    if n0 != d1 and n1 == d0 and n2 == d1:  # deletion (1 ahead)
        return 1, 0, 1
    if (
        n0 != d1 and n0 != d2
        and n1 != d0 and n1 != d1 and n1 != d2
        and n2 == d0 and n2 != d1 and n2 != d2
    ):  # deletion (2 ahead)
        return 1, 0, 1
    if n0 == d1 and n1 != d0 and n1 == d2:  # insertion (1 ahead)
        return 1, 1, 0
    if (
        n0 != d1 and n0 == d2
        and n1 != d0 and n1 != d1 and n1 != d2
        and n2 != d0 and n2 != d1 and n2 != d2
    ):  # insertion (2 ahead)
        return 1, 1, 0
    if (
        n0 != d1 and n0 == d2
        and n1 == d0 and n1 != d1 and n1 != d2
        and n2 != d0 and n2 != d1 and n2 != d2
    ):  # transposition + insertion
        return 2, 3, 2
    return 1, 1, 1  # substitution


def _edit_distance(data: list, needle: list, match_tail: bool) -> int:
    total, pd, pn = 0, 0, 0
    if match_tail:  # whole-string comparison (EQUALS_FUZZY)
        while pn < len(needle) or pd < len(data):
            ed, ad, an = _kernel3(data, needle, pd, pn)
            total += ed
            pd += ad
            pn += an
    else:  # prefix comparison (CONTAINS_FUZZY inner loop)
        while pn < len(needle) and pd < len(data):
            ed, ad, an = _kernel3(data, needle, pd, pn)
            total += ed
            pd += ad
            pn += an
        total += len(needle) - pn
    return total


def _symbols(s: str, ascii_mode: bool) -> list:
    # ASCII-only case normalisation: bytes/runes < 0x80 uppercase,
    # everything else untouched
    if ascii_mode:
        # every UTF-8 BYTE is one symbol
        return [
            b - 32 if 97 <= b <= 122 else b for b in s.encode("utf-8")
        ]
    return [
        ord(c) - 32 if "a" <= c <= "z" else ord(c) for c in s
    ]


def _coerce(v):
    if isinstance(v, str) or v is None:
        return v
    if hasattr(v, "toPython"):
        v = v.toPython()
    return v if isinstance(v, str) else None


def equals_fuzzy_ref(s, needle, threshold, ascii_mode: bool):
    s, needle = _coerce(s), _coerce(needle)
    if s is None or needle is None or threshold is None:
        return None
    data, ndl = _symbols(s, ascii_mode), _symbols(needle, ascii_mode)
    return _edit_distance(data, ndl, True) <= int(threshold)


def contains_fuzzy_ref(s, needle, threshold, ascii_mode: bool):
    s, needle = _coerce(s), _coerce(needle)
    if s is None or needle is None or threshold is None:
        return None
    data, ndl = _symbols(s, ascii_mode), _symbols(needle, ascii_mode)
    threshold = int(threshold)
    if not data:
        return len(ndl) <= threshold
    return any(
        _edit_distance(data[i:], ndl, False) <= threshold
        for i in range(len(data))
    )
