"""Seeded token vocabulary for the tokenized-sequence tables.

The pipeline's input rows carry ``tokens: array<int32>``; the parse
stage decodes token ids to text through this vocabulary and then runs
the grok-style pattern bank over the decoded string (the Spark analog
of Sneller's schemaless field extraction + regex engine,
/root/reference/regexp2/Regexp2.go:14-60, applied to ion values).

Layout (VOCAB_SIZE = 32768, seed = 42):
  - ids [0, MOTIF_BASE)   : "body" words — random lowercase a-z strings,
                            guaranteed to contain no digits, '=', or '.'
                            so they can never collide with the pattern
                            bank's regexes.
  - ids [MOTIF_BASE, ...) : motif tokens — literal strings such as
                            "LEVEL=INFO", "code=404", "10.0.3.7",
                            "lat_ms=250" that the generator embeds into
                            selected rows; these are the parse stage's
                            ground truth (FIXTURES.md §1.1).

Everything here is pure numpy and fully deterministic.
"""

from __future__ import annotations

import numpy as np

VOCAB_SIZE = 32768
SEED = 42

# ---- motif definitions (FIXTURES.md §1.1 pattern bank) ----------------
LEVELS = ["DEBUG", "INFO", "WARN", "ERROR"]
CODES = [100, 200, 201, 204, 301, 302, 304, 400, 401, 403, 404, 418, 500, 502, 503, 504]
IPS = [f"10.{i}.{(7 * i + 3) % 256}.{(13 * i + 1) % 256}" for i in range(16)]
LATS = [1, 2, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987, 1597, 2584]

MOTIF_STRINGS = (
    [f"LEVEL={lv}" for lv in LEVELS]
    + [f"code={c}" for c in CODES]
    + list(IPS)
    + [f"lat_ms={ms}" for ms in LATS]
)
N_MOTIFS = len(MOTIF_STRINGS)  # 52
MOTIF_BASE = VOCAB_SIZE - 64  # motif ids live at the top of the vocab

# pattern bank: name -> (regex over decoded text, output dtype)
PATTERN_BANK: dict[str, tuple[str, str]] = {
    "level": (r"\bLEVEL=(DEBUG|INFO|WARN|ERROR)\b", "string"),
    "code": (r"\bcode=(\d{3})\b", "int"),
    "ip": (r"\b(\d{1,3}(?:\.\d{1,3}){3})\b", "string"),
    "lat_ms": (r"\blat_ms=(\d+)\b", "int"),
}

_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz"))

_vocab_cache: np.ndarray | None = None


def build_vocab() -> np.ndarray:
    """Return the full vocabulary as a numpy unicode array of length
    VOCAB_SIZE.  Deterministic (seed=42); cached per process."""
    global _vocab_cache
    if _vocab_cache is not None:
        return _vocab_cache
    rng = np.random.Generator(np.random.PCG64(SEED))
    lengths = rng.integers(2, 11, size=VOCAB_SIZE)  # word length 2..10
    letters = rng.integers(0, 26, size=int(lengths.sum()))
    words = np.empty(VOCAB_SIZE, dtype="<U16")
    flat = _ALPHABET[letters]
    offs = np.concatenate([[0], np.cumsum(lengths)])
    # join per word: small fixed cost (32k words, once per process)
    joined = "".join(flat.tolist())
    for i in range(VOCAB_SIZE):
        words[i] = joined[offs[i] : offs[i + 1]]
    # overwrite the top-64 slots with motif strings (rest of the top
    # range keeps body words but is never emitted by the generator)
    for j, s in enumerate(MOTIF_STRINGS):
        words[MOTIF_BASE + j] = s
    _vocab_cache = words
    return words


def motif_token_id(kind: str, index: int) -> int:
    """Token id for the index-th motif of a kind in
    {level, code, ip, lat_ms}."""
    base = {"level": 0, "code": 4, "ip": 20, "lat_ms": 36}[kind]
    return MOTIF_BASE + base + index


def motif_ground_truth() -> dict[int, dict[str, object]]:
    """Map motif token id -> {field: value} the parse stage must extract."""
    out: dict[int, dict[str, object]] = {}
    for i, lv in enumerate(LEVELS):
        out[motif_token_id("level", i)] = {"level": lv}
    for i, c in enumerate(CODES):
        out[motif_token_id("code", i)] = {"code": c}
    for i, ip in enumerate(IPS):
        out[motif_token_id("ip", i)] = {"ip": ip}
    for i, ms in enumerate(LATS):
        out[motif_token_id("lat_ms", i)] = {"lat_ms": ms}
    return out
