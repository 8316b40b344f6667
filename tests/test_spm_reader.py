"""Vendored SentencePiece reader/encoder (tokenizers/spm_model.py).

The reference wraps the sentencepiece C++ package
(pasero/tokenizers/__init__.py:33-167); this image does not ship it, so the
wrapper runs on a pure-python ModelProto parser + unigram/BPE encoder.
These tests run UN-GATED: fixtures are serialized by write_model (itself
under test via the parse round-trip) plus a committed binary fixture.
"""

import math
import os

import pytest

from pasero_tpu.tokenizers.spm_model import (
    BPE, BYTE, CONTROL, NORMAL, UNIGRAM, UNKNOWN,
    MiniSentencePieceProcessor, parse_model, write_model)

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "mini_unigram.model")


def unigram_pieces():
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
              ("</s>", 0.0, CONTROL)]
    vocab = {
        "▁the": -2.0, "▁cat": -3.0, "▁dog": -3.0, "▁jump": -4.0, "s": -5.0,
        "▁jumps": -6.5, "▁run": -4.0, "ning": -5.0, "▁": -6.0,
        "th": -8.0, "e": -7.0, "▁th": -8.0, "c": -9.0, "a": -9.0, "t": -9.0,
        "d": -9.0, "o": -9.0, "g": -9.0, "j": -9.0, "u": -9.0, "m": -9.0,
        "p": -9.0, "n": -9.0, "i": -9.0, "r": -9.0, "h": -9.0,
    }
    pieces += [(p, s, NORMAL) for p, s in vocab.items()]
    return pieces


@pytest.fixture(scope="module")
def unigram_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spm") / "uni.model")
    write_model(unigram_pieces(), path, model_type=UNIGRAM)
    return path


def test_proto_roundtrip(tmp_path):
    pieces = [("<unk>", 0.0, UNKNOWN), ("▁héllo", -1.25, NORMAL),
              ("<0x0A>", 0.0, BYTE)]
    data = write_model(pieces, model_type=BPE)
    parsed, model_type = parse_model(data)
    assert parsed == [("<unk>", 0.0, UNKNOWN), ("▁héllo", -1.25, NORMAL),
                      ("<0x0A>", 0.0, BYTE)]
    assert model_type == BPE


def test_committed_fixture_parses():
    sp = MiniSentencePieceProcessor(FIXTURE)
    assert sp.vocab_size() > 3
    assert sp.EncodeAsPieces("the cat") == ["▁the", "▁cat"]


def test_unigram_viterbi_prefers_best_split(unigram_model):
    sp = MiniSentencePieceProcessor(unigram_model)
    # '▁jump' + 's' scores -4-5=-9 < '▁jumps' -6.5: whole piece wins
    assert sp.EncodeAsPieces("jumps") == ["▁jumps"]
    assert sp.EncodeAsPieces("the cat jumps") == ["▁the", "▁cat", "▁jumps"]
    # 'running' has no whole piece: best split is ▁run + ning
    assert sp.EncodeAsPieces("running") == ["▁run", "ning"]


def test_unigram_unknown_chars_surface_raw(unigram_model):
    sp = MiniSentencePieceProcessor(unigram_model)
    pieces = sp.EncodeAsPieces("the x")
    assert pieces[0] == "▁the"
    assert "x" in pieces  # unknown char surfaces as itself
    assert sp.IsUnknown(sp.PieceToId("x"))
    assert not sp.IsUnknown(sp.PieceToId("▁the"))


def test_set_vocabulary_restricts(unigram_model):
    sp = MiniSentencePieceProcessor(unigram_model)
    sp.SetVocabulary([p for p, _, _ in unigram_pieces()
                      if p not in ("▁jumps",)])
    # '▁jumps' excluded -> falls back to ▁jump + s
    assert sp.EncodeAsPieces("jumps") == ["▁jump", "s"]
    sp.ResetVocabulary()
    assert sp.EncodeAsPieces("jumps") == ["▁jumps"]


def test_decode_roundtrip(unigram_model):
    sp = MiniSentencePieceProcessor(unigram_model)
    text = "the dog jumps"
    assert sp.DecodePieces(sp.EncodeAsPieces(text)) == text
    assert sp.EncodeAsIds(text) == [sp.PieceToId(p)
                                    for p in sp.EncodeAsPieces(text)]


def test_bpe_encoding(tmp_path):
    path = str(tmp_path / "bpe.model")
    # scores are merge priorities: higher merges first
    pieces = ([("<unk>", 0.0, UNKNOWN)]
              + [(c, -10.0, NORMAL) for c in "▁abcd"]
              + [("ab", -1.0, NORMAL), ("▁ab", -2.0, NORMAL),
                 ("cd", -3.0, NORMAL), ("abcd", -0.5, NORMAL)])
    write_model(pieces, path, model_type=BPE)
    sp = MiniSentencePieceProcessor(path)
    # merges: a+b -> ab (best), c+d -> cd, ▁+ab -> ▁ab; 'abcd' exists but
    # can only form from ab+cd which IS usable -> ab,cd -> abcd
    assert sp.EncodeAsPieces("abcd") == ["▁ab", "cd"] or \
        sp.EncodeAsPieces("abcd") == ["▁", "abcd"]


def test_sentencepiece_tokenizer_ungated(unigram_model):
    """SentencePieceTokenizer (the reference wrapper surface) runs without
    the sentencepiece package: tokenize, unknown spell-out, inline casing,
    hex-byte decode."""
    from pasero_tpu.tokenizers import SentencePieceTokenizer
    tok = SentencePieceTokenizer(unigram_model)
    assert tok.tokenize("the cat jumps") == ["▁the", "▁cat", "▁jumps"]
    assert len(tok) == len(unigram_pieces())

    cased = SentencePieceTokenizer(unigram_model, inline_case=True)
    pieces = cased.tokenize("The cat")
    assert pieces[0] == "▁the" and "<T>" in pieces
    assert "▁cat" in pieces

    assert tok.decode_hex_bytes("a<0x0A>b") == "a\nb"

    restricted = SentencePieceTokenizer(
        unigram_model,
        vocab=[p for p, _, _ in unigram_pieces() if p != "▁jumps"])
    assert restricted.tokenize("jumps") == ["▁jump", "s"]


def test_spbleu_with_mini_reader(unigram_model):
    from pasero_tpu.metrics_text import corpus_spbleu
    hyps = ["the cat jumps", "the dog runs"]
    assert corpus_spbleu(hyps, [hyps], unigram_model) == pytest.approx(100.0)
    worse = corpus_spbleu(["the cat jumps", "the cat jumps"], [hyps],
                          unigram_model)
    assert 0.0 <= worse < 100.0


def test_parity_with_real_sentencepiece(unigram_model):
    spm = pytest.importorskip("sentencepiece")
    sp_real = spm.SentencePieceProcessor(model_file=unigram_model)
    sp_mini = MiniSentencePieceProcessor(unigram_model)
    for text in ["the cat jumps", "running", "the dog", "jumps jumps"]:
        assert sp_mini.EncodeAsPieces(text) == sp_real.EncodeAsPieces(text)
