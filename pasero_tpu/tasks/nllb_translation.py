"""NLLB-MoE translation with per-language-pair expert pruning
(pasero/tasks/nllb_translation.py:15-252).

The full NLLB-200 MoE has 128 experts per MoE layer (ids 0-1535 across
layers); serving it dense is wasteful, so a JSON index maps each language pair
to the subset of experts it actually routes to, and the task loads only those,
hot-swapping them when the language pair changes at inference
(nllb_translation.py:113-139) and slicing the gate weights to the selected
columns (:237-250).

TPU specifics: the model is built once with E = the per-pair expert budget;
swapping a language pair only overwrites the stacked expert arrays and the
gate columns in the parameter tree — same shapes, so NO recompilation of the
decode programs (SURVEY.md §7 'hot-swap without recompilation').

Expert checkpoint format: one npz per expert named ``expert_{id:04}.npz`` with
flat keys ``<site>/experts_in``, ``<site>/experts_out`` (+ ``_bias``) where
<site> is e.g. ``decoder/layers_3/ffn`` — produced by
scripts/split-expert-ckpt.py from a full MoE checkpoint.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import numpy as np

from ..config import register_task
from ..config.tasks import NLLBTranslationTaskConfig
from .translation import TranslationTask

logger = logging.getLogger("task")


@register_task("nllb_translation")
class NLLBTranslationTask(TranslationTask):
    cfg: NLLBTranslationTaskConfig

    def __init__(self, data_dir: str, cfg):
        super().__init__(data_dir, cfg)
        self.expert_index: Optional[dict] = None
        self.current_pair: Optional[str] = None
        if cfg.expert_json:
            path = cfg.expert_json if os.path.isabs(cfg.expert_json) \
                else os.path.join(data_dir, cfg.expert_json)
            with open(path) as f:
                self.expert_index = json.load(f)
        self.expert_dir = cfg.expert_dir or data_dir
        self.expert_ckpt = cfg.expert_ckpt

    def experts_for_pair(self, source_lang: str, target_lang: str) -> list:
        """Expert ids (or names) to use for this pair."""
        if self.expert_index is not None:
            pair = f"{source_lang}-{target_lang}"
            experts = self.expert_index.get(pair)
            if experts is None:
                # per-language index fallback (nllb_translation.py:52-59):
                # encoder expert ids (<768) come from the source language,
                # decoder expert ids (>=768) from the target language
                src = self.expert_index.get(source_lang)
                tgt = self.expert_index.get(target_lang)
                assert src is not None and tgt is not None, \
                    f"no experts listed for language pair {pair} (nor for " \
                    f"{source_lang}/{target_lang} individually)"
                experts = [i for i in src if int(i) < 768] + \
                          [i for i in tgt if int(i) >= 768]
            return list(experts)
        if self.expert_ckpt:
            return list(self.expert_ckpt)
        return []

    @staticmethod
    def _expert_path(expert_dir: str, expert) -> str:
        if isinstance(expert, str) and os.path.exists(
                os.path.join(expert_dir, expert)):
            return os.path.join(expert_dir, expert)
        return os.path.join(expert_dir, f"expert_{int(expert):04}.npz")

    def load_experts(self, params, source_lang: str, target_lang: str):
        """Swap this pair's experts into the stacked MoE parameters.

        ``params`` is the (host or device) parameter pytree of an MoE model
        built with E = len(experts_for_pair). Returns the updated pytree.
        """
        import jax

        pair = f"{source_lang}-{target_lang}"
        if pair == self.current_pair:
            return params
        experts = self.experts_for_pair(source_lang, target_lang)
        if not experts:
            return params

        expert_arrays: dict = {}
        gate_cols: dict = {}          # site -> selected router columns, in order
        global_ids: list = []
        for expert in experts:
            path = self._expert_path(self.expert_dir, expert)
            with np.load(path) as data:
                for key in data.files:
                    if key.endswith("/gate_col"):
                        gate_cols.setdefault(key[:-len("/gate_col")], []) \
                                 .append(int(data[key]))
                    else:
                        expert_arrays.setdefault(key, []).append(data[key])
            global_ids.append(int(expert) if not isinstance(expert, str)
                              or expert.isdigit() else len(global_ids))

        flat = {}

        def visit(path, leaf):
            name = jax.tree_util.keystr(path)
            flat[name] = leaf
            return leaf

        jax.tree_util.tree_map_with_path(visit, params)

        # router pruning: slice the full gates to the selected experts'
        # columns (reference slices rows of the torch (E, D) gate,
        # nllb_translation.py:237-250; ours is (D, E) so columns)
        gate_updates = {}
        gates_path = os.path.join(self.expert_dir, "gates.npz")
        if gate_cols and os.path.exists(gates_path):
            with np.load(gates_path) as gates:
                for site, cols in gate_cols.items():
                    key = f"{site}/gate"
                    if key in gates.files:
                        gate_updates[key] = self.slice_gate(gates[key], cols)

        updates = {}
        for key, arr in gate_updates.items():
            target_key = next(
                (k for k in flat
                 if k.replace("'", "").replace("][", "/").strip("[]")
                 .endswith(key)), None)
            if target_key is None:
                logger.warning(f"no gate parameter found for site {key}")
                continue
            current = flat[target_key]
            assert current.shape == arr.shape, \
                f"gate shape mismatch at {key}: {current.shape} vs {arr.shape}"
            updates[target_key] = arr.astype(np.asarray(current).dtype)
        for key, slices in expert_arrays.items():
            stacked = np.stack(slices, axis=0)
            # match the flat param whose path ends with this site key
            target_key = next(
                (k for k in flat
                 if k.replace("'", "").replace("][", "/").strip("[]")
                 .endswith(key)), None)
            if target_key is None:
                logger.warning(f"no parameter found for expert site {key}")
                continue
            current = flat[target_key]
            assert current.shape == stacked.shape, \
                f"expert shape mismatch at {key}: {current.shape} vs {stacked.shape}"
            updates[target_key] = stacked.astype(np.asarray(current).dtype)

        def replace(path, leaf):
            name = jax.tree_util.keystr(path)
            if name in updates:
                return jax.numpy.asarray(updates[name])
            return leaf

        params = jax.tree_util.tree_map_with_path(replace, params)
        logger.info(f"loaded {len(experts)} experts for {pair} "
                    f"({len(updates)} parameter sites)")
        self.current_pair = pair
        return params

    @staticmethod
    def slice_gate(gate_weight: np.ndarray, global_ids: list) -> np.ndarray:
        """Select the gate columns of the chosen experts
        (nllb_translation.py:237-250)."""
        return gate_weight[:, np.asarray(global_ids, dtype=np.int64)]
