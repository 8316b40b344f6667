"""Native BLEU/chrF/chrF++ exact-parity tests.

Two layers of verification:
- frozen vectors produced with sacrebleu 2.6.0 (so the test still pins
  exact behavior on images without sacrebleu);
- live fuzz parity against sacrebleu when it is importable, over random
  word soups, unicode punctuation, numbers, and degenerate segments.
"""

import random

import pytest

from pasero_tpu.metrics_text import (corpus_bleu, corpus_chrf, tokenize)

HYPS = [
    "The dog bit the man.",
    "It wasn't surprising.",
    "The man had just bitten him.",
]
REFS = [
    ["The dog bit the man.", "It was not unexpected.",
     "The man bit him first."],
    ["The dog had bit the man.", "No one was surprised.",
     "The man had bitten the dog."],
]

# sacrebleu 2.6.0 outputs for the corpus above (frozen vectors)
FROZEN = {
    ("bleu", "13a"): 48.530827009929865,
    ("bleu", "intl"): 43.91623493336995,
    ("chrf", 0): 59.72751782684763,
    ("chrf", 2): 59.15310444399262,
}

EDGE_SEGMENTS = [
    "",
    " ",
    "hello",
    "1,234.56 euros (about $1,400) — 10% more!",
    "a.. b,, 5.5, 5., .5, 1-2 a-b 3- -4",
    "«Je suis», dit-il: ¿qué? ¡sí! 你好，世界。",
    "x &quot;quoted&amp;escaped&lt;tag&gt; <skipped> y",
    "num2000. trailing",
    "emoji 😀 and symbols € £ © ± µ",
    "tabs\tand  multiple   spaces",
]


def test_frozen_bleu_13a():
    assert corpus_bleu(HYPS, REFS) == pytest.approx(
        FROZEN[("bleu", "13a")], abs=1e-6)


def test_frozen_bleu_intl():
    assert corpus_bleu(HYPS, REFS, tokenizer="intl") == pytest.approx(
        FROZEN[("bleu", "intl")], abs=1e-6)


def test_frozen_chrf():
    assert corpus_chrf(HYPS, REFS) == pytest.approx(
        FROZEN[("chrf", 0)], abs=1e-6)


def test_frozen_chrf_pp():
    assert corpus_chrf(HYPS, REFS, word_order=2) == pytest.approx(
        FROZEN[("chrf", 2)], abs=1e-6)


def _random_corpora(rng, n=40):
    vocab = ("the dog cat man bites runs fast 12 3.5 1,000 end. why? "
             "don't «quote»—dash 你好 café naïve $5 100% a-b 7-8").split()
    hyps, refs1, refs2 = [], [], []
    for _ in range(n):
        hyps.append(" ".join(rng.choices(vocab, k=rng.randint(0, 12))))
        refs1.append(" ".join(rng.choices(vocab, k=rng.randint(1, 12))))
        refs2.append(" ".join(rng.choices(vocab, k=rng.randint(1, 12))))
    return hyps, [refs1, refs2]


sacrebleu = pytest.importorskip("sacrebleu")


@pytest.mark.parametrize("tok", ["13a", "intl", "none", "char"])
def test_tokenizer_parity_fuzz(tok):
    from sacrebleu.tokenizers.tokenizer_13a import Tokenizer13a
    from sacrebleu.tokenizers.tokenizer_intl import TokenizerV14International
    from sacrebleu.tokenizers.tokenizer_char import TokenizerChar
    from sacrebleu.tokenizers.tokenizer_none import NoneTokenizer
    sb = {"13a": Tokenizer13a(), "intl": TokenizerV14International(),
          "char": TokenizerChar(), "none": NoneTokenizer()}[tok]
    rng = random.Random(0)
    lines = list(EDGE_SEGMENTS)
    charset = "ab1 5.,-—%$€(){}«»?!你好¿¡\t'\"&<>;:"
    for _ in range(300):
        lines.append("".join(rng.choices(charset,
                                         k=rng.randint(0, 40))))
    for line in lines:
        assert tokenize(line, tok) == sb(line).split(), repr(line)


@pytest.mark.parametrize("tok", ["13a", "intl"])
def test_bleu_parity_fuzz(tok):
    rng = random.Random(1)
    for trial in range(10):
        hyps, refs = _random_corpora(rng)
        want = sacrebleu.corpus_bleu(hyps, refs, tokenize=tok).score
        got = corpus_bleu(hyps, refs, tokenizer=tok)
        assert got == pytest.approx(want, abs=1e-6), f"trial {trial}"


@pytest.mark.parametrize("lc", [False, True])
def test_bleu_lowercase_and_single_ref(lc):
    rng = random.Random(2)
    hyps, refs = _random_corpora(rng, n=25)
    refs = [refs[0]]
    want = sacrebleu.corpus_bleu(hyps, refs, lowercase=lc).score
    assert corpus_bleu(hyps, refs, lowercase=lc) == \
        pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("word_order", [0, 2])
def test_chrf_parity_fuzz(word_order):
    rng = random.Random(3)
    for trial in range(10):
        hyps, refs = _random_corpora(rng)
        want = sacrebleu.corpus_chrf(hyps, refs,
                                     word_order=word_order).score
        got = corpus_chrf(hyps, refs, word_order=word_order)
        assert got == pytest.approx(want, abs=1e-6), f"trial {trial}"


def test_edge_segments_score():
    # degenerate hypotheses must not crash and must match sacrebleu
    hyps = EDGE_SEGMENTS
    refs = [list(reversed(EDGE_SEGMENTS))]
    assert corpus_bleu(hyps, refs) == pytest.approx(
        sacrebleu.corpus_bleu(hyps, refs).score, abs=1e-6)
    assert corpus_chrf(hyps, refs, word_order=2) == pytest.approx(
        sacrebleu.corpus_chrf(hyps, refs, word_order=2).score, abs=1e-6)


def test_evaluation_score_native_fallback(monkeypatch):
    """evaluation.score produces identical numbers through the sacrebleu
    and the forced-native paths."""
    from pasero_tpu import evaluation
    refs = REFS[0]
    via_sb = {m: evaluation.score(m, HYPS, refs)
              for m in ("bleu", "chrf", "chrf++")}
    monkeypatch.setenv("PASERO_NATIVE_METRICS", "1")
    for metric, want in via_sb.items():
        assert evaluation.score(metric, HYPS, refs) == \
            pytest.approx(want, abs=1e-6)
    # still scored (not None) through safe_score without sacrebleu
    assert evaluation.safe_score("bleu", HYPS, refs) is not None
