"""Tokenizer-wrapper and evaluation-metric validation
(VERDICT round-1 weak #6/#9: HF wrapper untested, WER never cross-checked).
"""

import pytest

from pasero_tpu.evaluation import safe_score, word_error_rate
from pasero_tpu.tokenizers import build_tokenizer

# ---------------------------------------------------------------------------
# WER: hand-verified vectors (corpus-level = total edits / total ref words,
# the same definition jiwer uses for lists of sentences)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hyp,ref,expected", [
    ("the cat sat", "the cat sat", 0.0),
    ("the dog sat", "the cat sat", 1 / 3),          # 1 substitution
    ("the sat", "the cat sat", 1 / 3),              # 1 deletion
    ("the big cat sat", "the cat sat", 1 / 3),      # 1 insertion
    ("", "a b c", 1.0),                             # all deleted
    ("x y z", "a b", 1.5),                          # WER can exceed 1
    ("A", "a", 1.0),                                # case-sensitive
])
def test_wer_single(hyp, ref, expected):
    assert word_error_rate([hyp], [ref]) == pytest.approx(expected)


def test_wer_corpus_level_not_sentence_mean():
    """Corpus WER weights sentences by reference length (total/total), like
    jiwer on sentence lists — NOT the mean of per-sentence WERs."""
    hyps = ["a", "x y z w"]
    refs = ["a", "a b c d"]
    # 0 errors / 1 word + 4 errors / 4 words -> 4/5, not (0+1)/2
    assert word_error_rate(hyps, refs) == pytest.approx(0.8)


def test_wer_transposition_costs_two():
    # classic Levenshtein (no transposition op): swap = sub+sub
    assert word_error_rate(["b a"], ["a b"]) == pytest.approx(1.0)


def test_safe_score_never_raises():
    assert safe_score("wer", ["a"], ["a"]) == 0.0
    assert safe_score("bogus-metric", ["a"], ["a"]) is None
    assert safe_score("wer", [], []) is None


# ---------------------------------------------------------------------------
# HuggingFace tokenizer wrapper (transformers IS in the image)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ["[UNK]", "[BOS]", "[EOS]", "[PAD]", "the", "cat", "sat", "dog"]
    backend = Tokenizer(WordLevel({w: i for i, w in enumerate(words)},
                                  unk_token="[UNK]"))
    backend.pre_tokenizer = Whitespace()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=backend, unk_token="[UNK]", bos_token="[BOS]",
        eos_token="[EOS]", pad_token="[PAD]")
    d = tmp_path_factory.mktemp("hf_tok")
    tok.save_pretrained(str(d))
    return str(d)


def test_hf_wrapper_tokenize_detokenize(hf_dir):
    tok = build_tokenizer("hf", hf_dir)
    pieces = tok.tokenize("the cat sat")
    assert pieces == ["the", "cat", "sat"]
    assert tok.detokenize(pieces) == "the cat sat"
    assert len(tok) >= 8


def test_hf_wrapper_special_token_remap(hf_dir):
    """HF special-token names map onto the pasero <s>/<pad>/</s>/<unk> names
    (reference tokenizers/__init__.py:170-214)."""
    from pasero_tpu.tokenizers import eos, pad, unk
    tok = build_tokenizer("hf", hf_dir)
    vocab = tok.vocab
    assert eos in vocab and pad in vocab and unk in vocab
    assert "[EOS]" not in vocab  # renamed, not duplicated


def test_hf_wrapper_unknown_words(hf_dir):
    tok = build_tokenizer("hf", hf_dir)
    pieces = tok.tokenize("the zebra")
    assert pieces[0] == "the"


# ---------------------------------------------------------------------------
# SentencePiece wrapper (vendored reader; the spm package is absent from the
# TPU image — tokenizers/spm_model.py replaces it, see test_spm_reader.py)
# ---------------------------------------------------------------------------


def test_spm_wrapper_missing_model_errors():
    with pytest.raises(FileNotFoundError):
        build_tokenizer("sentencepiece", "missing.model")


def test_spbleu_degrades_to_intl_bleu(caplog, monkeypatch):
    """Without a flores200 SPM model (FLORES200_SPM_PATH unset and sacrebleu
    unable to download one), spBLEU degrades to BLEU-intl with a loud
    warning instead of silently disappearing (the NLLB baselines are
    written in spBLEU)."""
    monkeypatch.delenv("FLORES200_SPM_PATH", raising=False)
    import logging
    with caplog.at_level(logging.WARNING, logger="evaluation"):
        score = safe_score("spbleu", ["the cat sat on the mat"],
                           ["the cat sat on the mat"])
    assert score is not None and score > 99.0
    import pasero_tpu.evaluation as ev
    assert ev._SPBLEU_WARNED
