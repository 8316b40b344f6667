"""Document-level machine translation (pasero/tasks/doc_level_translation.py).

Consecutive sentences of ordered corpora are merged into documents with a
``<sep>`` separator (reader-side max_doc_size sampling, datasets.py:488-497);
only the LAST sentence of a document is scored at evaluation
(doc_level_translation.py:40-94).
"""

from __future__ import annotations

import logging
import numpy as np

from ..config import register_task
from ..config.tasks import DocumentLevelTranslationTaskConfig
from .translation import ParallelCorpus, TranslationTask

logger = logging.getLogger("task")


class DocumentCorpus(ParallelCorpus):
    def __init__(self, *args, max_doc_size: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_doc_size = max_doc_size


@register_task("doc_level_translation")
class DocumentLevelTranslationTask(TranslationTask):
    cfg: DocumentLevelTranslationTaskConfig

    def __init__(self, data_dir: str, cfg):
        super().__init__(data_dir, cfg)
        self.sent_sep = cfg.sent_sep
        if self.sent_sep:
            assert self.sent_sep in self.tgt_preprocessor.dictionary, \
                f"separator {self.sent_sep!r} is OOV"

    @classmethod
    def _get_corpus(cls, *args, **kwargs) -> DocumentCorpus:
        return DocumentCorpus(*args, **kwargs)

    @classmethod
    def get_train_corpora(cls, cfg, data_dir, corpus_definitions):
        corpora = super().get_train_corpora(cfg, data_dir, corpus_definitions)
        for definition, corpus in zip(corpus_definitions, corpora):
            if definition.get("ordered", True):
                corpus.max_doc_size = cfg.max_doc_size
        return corpora

    def _merge_doc(self, sides) -> str:
        sep = f" {self.sent_sep} " if self.sent_sep else " "
        return sep.join(sides)

    def preprocess(self, sample: dict, truncate: bool = False,
                   tokenize: bool = True, append_eos: bool = False) -> dict:
        source = sample.get("source")
        target = sample.get("target")
        # documents arrive as tuples of consecutive sentences
        # (data/samplers.py LineReader._merge)
        if isinstance(source, tuple):
            rng = np.random.default_rng()
            # optionally merge sentence pairs with the previous one
            src_parts, tgt_parts = list(source), list(target)
            if self.cfg.sent_merge_prob and self.training:
                merged_src, merged_tgt = [src_parts[0]], [tgt_parts[0]]
                for s, t in zip(src_parts[1:], tgt_parts[1:]):
                    if rng.random() < self.cfg.sent_merge_prob:
                        merged_src[-1] = self._merge_doc([merged_src[-1], s])
                        merged_tgt[-1] = self._merge_doc([merged_tgt[-1], t])
                    else:
                        merged_src.append(s)
                        merged_tgt.append(t)
                # a document sample contains everything merged into one line
                src_parts, tgt_parts = merged_src, merged_tgt
            sample = dict(sample)
            sample["source"] = self._merge_doc(src_parts)
            sample["target"] = (self._merge_doc(tgt_parts)
                                if target is not None else None)
        return super().preprocess(sample, truncate=truncate,
                                  tokenize=tokenize, append_eos=append_eos)

    def postprocess(self, ids, sample=None, strip_prompt=None) -> str:
        """Only the last sentence of the document is the hypothesis
        (doc_level_translation.py:40-94)."""
        text = super().postprocess(ids, sample=sample,
                                   strip_prompt=strip_prompt)
        if self.sent_sep and self.sent_sep in text:
            text = text.rsplit(self.sent_sep, 1)[-1].strip()
        return text

    def get_reference(self, sample: dict):
        target = sample.get("target")
        if isinstance(target, tuple):
            return target[-1]
        if isinstance(target, str) and self.sent_sep and self.sent_sep in target:
            return target.rsplit(self.sent_sep, 1)[-1].strip()
        return target
