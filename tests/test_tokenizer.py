"""Tokenizer tests, including behavioral parity with the reference implementation."""

import importlib.util
import os
import sys

import pytest

from pasero_tpu.tokenizers import (CharacterTokenizer, PaseroTokenizer,
                                   build_tokenizer, detokenize,
                                   inline_case_to_cased, load_vocab)
from pasero_tpu.tokenizers.noise import noisify

CORPUS = [
    "Welcome to the Jungle",
    "the jungle is DARK but full of diamonds",
    "We all live in a yellow submarine",
    "the quick brown fox jumps over the lazy dog",
    "The Quick Brown Fox! Jumps, over... the lazy DOG?",
    "New York is a big city in the United States",
    "machine translation of natural language texts",
    "hello world, hello jungle, hello fox",
] * 10


def _load_reference_tokenizer():
    """Import the reference tokenizer module standalone (no torch needed)."""
    ref_dir = "/root/reference/pasero/tokenizers"
    if not os.path.isdir(ref_dir):
        return None
    spec_noise = importlib.util.spec_from_file_location(
        "ref_noise", os.path.join(ref_dir, "noise.py"))
    noise_mod = importlib.util.module_from_spec(spec_noise)
    spec_noise.loader.exec_module(noise_mod)
    pkg = sys.modules.setdefault("ref_pkg", type(sys)("ref_pkg"))
    pkg.__path__ = [ref_dir]  # make it package-like so pickle can re-import
    sys.modules["ref_pkg.noise"] = noise_mod
    spec = importlib.util.spec_from_file_location(
        "ref_pkg.pasero_tokenizer", os.path.join(ref_dir, "pasero_tokenizer.py"))
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "ref_pkg"
    sys.modules["ref_pkg.pasero_tokenizer"] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("tok") / "corpus.txt"
    path.write_text("\n".join(CORPUS) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def trained(corpus_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tok") / "bpecodes")
    model, vocabs = PaseroTokenizer.train(
        [corpus_file], output=out, num_symbols=120, inline_case=True)
    return model, vocabs, out


def test_roundtrip(trained):
    model, _, _ = trained
    for line in ["Welcome to the Jungle", "the DOG jumps", "completely unseen wordforms"]:
        tokens = model.tokenize(line)
        assert detokenize(tokens) == line


def test_inline_case_tags(trained):
    model, _, _ = trained
    tokens = model.tokenize("Welcome DARK jungle")
    # case tags follow the affected (lowercased) subwords
    assert "<T>" in tokens and "<U>" in tokens
    assert all(t == t.lower() or t in ("<T>", "<U>") for t in tokens)
    cased = inline_case_to_cased(tokens)
    assert "".join(cased).replace("▁", " ").strip() == "Welcome DARK jungle"


def test_model_file_reload(trained):
    model, _, path = trained
    reloaded = PaseroTokenizer(path)
    assert reloaded.inline_case == model.inline_case
    line = "The Quick Brown Fox"
    assert reloaded.tokenize(line) == model.tokenize(line)


def test_vocab_restriction(trained):
    model, vocabs, path = trained
    full = model.tokenize("jungle")
    restricted = PaseroTokenizer(path, vocab=["j", "u", "n", "g", "l", "e", "▁j"])
    out = restricted.tokenize("jungle")
    assert all(len(t.replace("▁", "")) <= 1 for t in out)
    assert detokenize(out) == detokenize(full) == "jungle"


def test_mask_and_placeholder_protected(trained):
    model, _, _ = trained
    tokens = model.tokenize("hello <mask> world <PHL> end")
    assert "<mask>" in tokens and "<PHL>" in tokens


def test_protect_regex():
    model = PaseroTokenizer([("h", "e"), ("he", "l")], inline_case=False,
                            protect_regex=r"<[a-z]+>")
    tokens = model.tokenize("hello <tag> world")
    assert "<tag>" in tokens


def test_empty_and_whitespace(trained):
    model, _, _ = trained
    assert model.tokenize("") == []
    assert model.tokenize("   ") == []
    assert detokenize(model.tokenize("  spaced   out  ")) == "spaced out"


def test_char_tokenizer():
    tok = CharacterTokenizer()
    assert tok.tokenize("ab cd") == ["▁a", "b", "▁c", "d"]
    assert detokenize(tok.tokenize("ab cd")) == "ab cd"


def test_noise_deterministic_with_seed():
    import numpy as np
    line = "the quick brown fox jumps over the lazy dog"
    a = noisify(line, rng=np.random.default_rng(0), char_noise=0.3)
    b = noisify(line, rng=np.random.default_rng(0), char_noise=0.3)
    assert a == b
    assert noisify(line) == line  # no ops enabled -> unchanged
    masked = noisify(line, rng=np.random.default_rng(0), masking=0.9)
    assert "<mask>" in masked


def test_reference_parity(corpus_file, tmp_path):
    """Same corpus -> same merges and same tokenization as naver/pasero."""
    ref = _load_reference_tokenizer()
    if ref is None:
        pytest.skip("reference tokenizer unavailable")
    ref_out = str(tmp_path / "ref_bpecodes")
    ref_model, _ = ref.PaseroTokenizer.train(
        [corpus_file], output=ref_out, num_symbols=120, inline_case=True, threads=2)
    ours = PaseroTokenizer(ref_out)  # our encoder over the reference model file
    own_model, _, own_out = None, None, None
    own, _ = PaseroTokenizer.train([corpus_file], output=str(tmp_path / "own"),
                                   num_symbols=120, inline_case=True)[:2]
    ref_merges = [p for p, _ in sorted(ref_model.merges.items(), key=lambda kv: kv[1])]
    own_merges = [p for p, _ in sorted(own.merges.items(), key=lambda kv: kv[1])]
    assert own_merges == ref_merges, "BPE trainer diverges from reference"
    for line in CORPUS[:8] + ["Unseen MIXED CaseWords here", "numbers 12345 and, punct!"]:
        assert ours.tokenize(line) == ref_model.tokenize(line)
        assert own.tokenize(line) == ref_model.tokenize(line)


def test_native_bpe_matches_python(trained):
    """The C++ merge core and the python loop produce identical pieces."""
    model, _, path = trained
    if model._native is None:
        pytest.skip("native BPE core unavailable")
    import copy
    py_model = PaseroTokenizer(path)
    py_model._native = None  # force the python path
    words = ["jungle", "welcome", "diamonds", "unseenwordform", "a",
             "x" * 50, "日本語テスト", "émotions"]
    for w in words:
        assert model._encode("▁" + w) == py_model._encode("▁" + w), w
    # full-sentence parity incl. inline casing
    for line in CORPUS[:4] + ["Unseen MIXED CaseWords with 123 and Ünïcödé"]:
        py_model._cache.clear(); model._cache.clear()
        assert model.tokenize(line) == py_model.tokenize(line)
