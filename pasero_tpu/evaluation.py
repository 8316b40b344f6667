"""Evaluation metrics and corpus filtering (pasero/evaluation.py).

BLEU/spBLEU/chrF/chrF++/len_ratio via sacrebleu; WER implemented here (the
reference uses jiwer, absent from the TPU image); langid gated on fasttext.
"""

from __future__ import annotations

import logging
import os
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger("evaluation")

METRICS = ("bleu", "spbleu", "chrf", "chrf++", "len_ratio", "wer", "langid")
BLEU_TOKENIZERS = ("13a", "intl", "zh", "ja-mecab", "char", "none", "flores200")

# metrics where lower is better (for early stopping direction)
LOWER_IS_BETTER = {"wer", "len_ratio", "nll_loss", "loss", "ppl"}


def default_bleu_tokenizer(lang: Optional[str]) -> str:
    if lang == "zh":
        return "zh"
    if lang == "ja":
        return "ja-mecab"
    return "13a"


def score(metric: str, hypotheses: list, references: list,
          sources: Optional[list] = None, lang: Optional[str] = None,
          bleu_tok: Optional[str] = None, lowercase: bool = False) -> float:
    import sacrebleu

    if lowercase:
        hypotheses = [h.lower() for h in hypotheses]
        references = [r.lower() for r in references]

    if metric == "bleu":
        tok = bleu_tok or default_bleu_tokenizer(lang)
        return sacrebleu.corpus_bleu(hypotheses, [references],
                                     tokenize=tok).score
    if metric == "spbleu":
        # flores200 tokenization needs the sentencepiece package + the
        # downloaded flores200 SPM model; when either is missing (as on the
        # TPU image), degrade to BLEU-intl with a loud warning instead of
        # silently dropping the metric (the NLLB baseline tables are written
        # in spBLEU, examples/NLLB-200/README.md)
        try:
            return sacrebleu.corpus_bleu(hypotheses, [references],
                                         tokenize="flores200").score
        except Exception as e:
            _warn_spbleu_fallback(e)
            return sacrebleu.corpus_bleu(hypotheses, [references],
                                         tokenize="intl").score
    if metric == "chrf":
        return sacrebleu.corpus_chrf(hypotheses, [references]).score
    if metric == "chrf++":
        return sacrebleu.corpus_chrf(hypotheses, [references],
                                     word_order=2).score
    if metric == "len_ratio":
        hyp_len = sum(len(h.split()) for h in hypotheses)
        ref_len = sum(len(r.split()) for r in references)
        return 100.0 * hyp_len / max(1, ref_len)
    if metric == "wer":
        return 100.0 * word_error_rate(hypotheses, references)
    if metric == "langid":
        return langid_accuracy(hypotheses, lang)
    raise ValueError(f"unknown metric {metric!r}")


def safe_score(metric: str, hypotheses: list, references: list,
               **kwargs) -> Optional[float]:
    try:
        if not hypotheses or (metric != "langid" and not references):
            return None
        return round(score(metric, hypotheses, references, **kwargs), 2)
    except Exception as e:  # scoring must never kill a decoding run
        logger.warning(f"failed to compute {metric}: {e}")
        return None


_SPBLEU_WARNED = False


def _warn_spbleu_fallback(error: Exception) -> None:
    global _SPBLEU_WARNED
    if not _SPBLEU_WARNED:
        _SPBLEU_WARNED = True
        logger.warning(
            "spBLEU (flores200 SPM tokenization) is unavailable "
            f"({type(error).__name__}); falling back to BLEU with the 'intl' "
            "tokenizer — these scores are NOT comparable to published spBLEU "
            "numbers. Install sentencepiece to restore true spBLEU.")


def word_error_rate(hypotheses: Iterable[str], references: Iterable[str]) -> float:
    """Corpus-level WER: total edit distance / total reference words."""
    total_errors = total_words = 0
    for hyp, ref in zip(hypotheses, references):
        h, r = hyp.split(), ref.split()
        d = np.zeros((len(r) + 1, len(h) + 1), dtype=np.int32)
        d[:, 0] = np.arange(len(r) + 1)
        d[0, :] = np.arange(len(h) + 1)
        for i in range(1, len(r) + 1):
            for j in range(1, len(h) + 1):
                sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
                d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
        total_errors += int(d[len(r), len(h)])
        total_words += len(r)
    return total_errors / max(1, total_words)


_LANGID_MODEL = None


def langid_accuracy(hypotheses: list, lang: Optional[str]) -> Optional[float]:
    """Share of hypotheses identified as ``lang`` by fasttext LID (gated)."""
    global _LANGID_MODEL
    if lang is None:
        return None
    try:
        import fasttext
    except ImportError:
        logger.warning("fasttext is not installed; langid metric unavailable")
        return None
    if _LANGID_MODEL is None:
        path = os.environ.get("LANGID_MODEL_PATH", "lid.176.bin")
        if not os.path.exists(path):
            return None
        _LANGID_MODEL = fasttext.load_model(path)
    correct = 0
    for h in hypotheses:
        pred = _LANGID_MODEL.predict(h.replace("\n", " "))[0][0]
        correct += pred.removeprefix("__label__").split("_")[0] == lang
    return 100.0 * correct / max(1, len(hypotheses))


def is_better(metric: str, new: float, old: float) -> bool:
    if metric in LOWER_IS_BETTER:
        return new < old
    return new > old


# -- corpus filtering (pasero/evaluation.py:92-239) ---------------------------

class FilterByLang:
    """Keep line pairs whose sides are identified as the expected languages."""

    def __init__(self, source_lang: str, target_lang: str):
        self.source_lang, self.target_lang = source_lang, target_lang
        try:
            import fasttext
            path = os.environ.get("LANGID_MODEL_PATH", "lid.176.bin")
            self.model = fasttext.load_model(path) if os.path.exists(path) else None
        except ImportError:
            self.model = None

    def __call__(self, pairs):
        if self.model is None:
            yield from pairs
            return
        for src, tgt in pairs:
            src_pred = self.model.predict(src.replace("\n", " "))[0][0]
            tgt_pred = self.model.predict(tgt.replace("\n", " "))[0][0]
            if (src_pred.endswith(self.source_lang)
                    and tgt_pred.endswith(self.target_lang)):
                yield src, tgt


class Dedup:
    def __init__(self):
        self.seen: set = set()

    def __call__(self, pairs):
        for pair in pairs:
            key = hash(pair)
            if key not in self.seen:
                self.seen.add(key)
                yield pair


class FilterByLen:
    def __init__(self, min_len: int = 1, max_len: int = 1000,
                 max_ratio: float = 9.0):
        self.min_len, self.max_len, self.max_ratio = min_len, max_len, max_ratio

    def __call__(self, pairs):
        for src, tgt in pairs:
            ls, lt = len(src.split()), len(tgt.split())
            if (self.min_len <= ls <= self.max_len
                    and self.min_len <= lt <= self.max_len
                    and max(ls, lt) / max(1, min(ls, lt)) <= self.max_ratio):
                yield src, tgt


class Shuffle:
    def __init__(self, seed: int = 0):
        self.seed = seed

    def __call__(self, pairs):
        pairs = list(pairs)
        np.random.default_rng(self.seed).shuffle(pairs)
        yield from pairs
