"""Generator invariants (FIXTURES.md §1): determinism, partition
independence, n_tok invariant, source skew, motif fractions."""

from __future__ import annotations

import numpy as np

from sneller_spark.datagen import SOURCE_PROBS, SOURCES, generate_chunk
from sneller_spark.vocab import MOTIF_BASE, N_MOTIFS, build_vocab


def test_chunking_invariance():
    a = generate_chunk(0, 200)
    b1, b2 = generate_chunk(0, 77), generate_chunk(77, 200)
    assert list(a["doc_id"]) == list(b1["doc_id"]) + list(b2["doc_id"])
    for i in range(200):
        src = b1 if i < 77 else b2
        j = i if i < 77 else i - 77
        assert np.array_equal(a["tokens"].iloc[i], src["tokens"].iloc[j])


def test_n_tok_invariant_and_bounds():
    pdf = generate_chunk(0, 5000)
    lens = pdf["tokens"].map(len)
    assert (pdf["n_tok"] == lens).all()
    assert lens.min() >= 16 and lens.max() <= 512


def test_doc_id_format():
    pdf = generate_chunk(123, 125)
    assert list(pdf["doc_id"]) == ["doc-0000000123", "doc-0000000124"]


def test_source_skew():
    pdf = generate_chunk(0, 50_000)
    freq = pdf["source"].value_counts(normalize=True)
    assert set(freq.index) <= set(SOURCES)
    for s, p in zip(SOURCES, SOURCE_PROBS):
        assert abs(freq.get(s, 0.0) - p) < 0.02, (s, freq.get(s, 0.0), p)
    assert freq.idxmax() == "syslog-a"


def test_motif_fractions():
    pdf = generate_chunk(0, 20_000)
    counts = pdf["tokens"].map(lambda t: int((np.asarray(t) >= MOTIF_BASE).sum()))
    frac0 = (counts == 0).mean()
    frac1 = (counts == 1).mean()
    frac2 = (counts == 2).mean()
    assert abs(frac1 - 0.70) < 0.02
    assert abs(frac2 - 0.10) < 0.02
    assert abs(frac0 - 0.20) < 0.02


def test_vocab_body_words_cannot_match_patterns():
    vocab = build_vocab()
    body = vocab[:MOTIF_BASE]
    joined = " ".join(body[:5000].tolist())
    assert not any(ch.isdigit() for ch in joined)
    assert "=" not in joined and "." not in joined


def test_motif_strings_in_vocab():
    vocab = build_vocab()
    assert vocab[MOTIF_BASE] == "LEVEL=DEBUG"
    assert N_MOTIFS == 52
    assert all(vocab[MOTIF_BASE + j] for j in range(N_MOTIFS))
