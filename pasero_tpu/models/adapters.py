"""Adapter layers: named bottleneck adapters with per-batch activation.

TPU re-design of pasero/models/adapters.py:37-301. The reference creates a
ModuleDict of adapters per layer and switches python-side per batch; here all
named adapters of a layer live in STACKED parameters (N, ...) and the active
adapter is selected with ``jnp.take`` on a traced index — no recompilation
when the language/domain changes between homogeneous batches
(adapters.py:185-229's per-batch activation).

Adapter names are sorted for deterministic parameter layout (the reference
sorts too, adapters.py:78-79,101-107). Stacked adapters (several names active
at once, adapters.py encoder_adapters list) are applied in sequence.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm

Dtype = Any


def adapter_names(cfg, task, is_decoder: bool) -> list:
    """Resolve the adapter name list for encoder/decoder from the config and
    the task's languages/domains (adapters.py:62-121)."""
    prefix = "decoder" if is_decoder else "encoder"
    explicit = getattr(cfg, f"{prefix}_adapters", None)
    by = getattr(cfg, f"{prefix}_adapters_by", None) or []
    names: list = []
    if explicit is not None:
        names = list(explicit)
    elif by and task is not None:
        for key in by:
            names += [f"{key}:{value}"
                      for value in sorted(task.get_langs_or_domains(key))]
    elif getattr(cfg, f"{prefix}_adapter_dim", None):
        names = ["default"]
    return sorted(dict.fromkeys(names))


def adapter_ids_from_meta(names: list, by: Sequence[str], meta: dict) -> list:
    """Active adapter indices for a batch's metadata (adapters.py:185-229)."""
    if not names:
        return []
    if not by:
        return list(range(len(names)))  # explicit stack: all active, in order
    ids = []
    for key in by:
        value = meta.get(key)
        if key == "lang" and value is None:
            value = meta.get("target_lang") or meta.get("source_lang")
        name = f"{key}:{value}"
        if name in names:
            ids.append(names.index(name))
    return ids


class AdapterStack(nn.Module):
    """All named adapters of one site, stacked; apply the selected ones.

    ``adapter_ids``: (K,) int32 — indices into the stacked params, applied
    sequentially; K is static per compiled program (typically 1).
    """

    num_adapters: int
    bottleneck_dim: int
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, adapter_ids: Optional[jnp.ndarray] = None):
        if self.num_adapters == 0 or adapter_ids is None:
            return x
        D = x.shape[-1]
        N = self.num_adapters
        init = nn.initializers.zeros if self.zero_init \
            else nn.initializers.normal(stddev=1e-3)
        down = self.param(
            "down", nn.with_logical_partitioning(init, (None, "embed", None)),
            (N, D, self.bottleneck_dim), jnp.float32)
        up = self.param(
            "up", nn.with_logical_partitioning(init, (None, None, "embed")),
            (N, self.bottleneck_dim, D), jnp.float32)
        norm_scale = self.param(
            "norm_scale",
            nn.with_logical_partitioning(nn.initializers.ones, (None, "embed")),
            (N, D), jnp.float32)
        norm_bias = self.param(
            "norm_bias",
            nn.with_logical_partitioning(nn.initializers.zeros, (None, "embed")),
            (N, D), jnp.float32)

        for k in range(adapter_ids.shape[0]):
            idx = adapter_ids[k]
            w_down = jnp.take(down, idx, axis=0).astype(self.dtype)
            w_up = jnp.take(up, idx, axis=0).astype(self.dtype)
            scale = jnp.take(norm_scale, idx, axis=0)
            bias = jnp.take(norm_bias, idx, axis=0)
            residual = x
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            h = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
                 ).astype(self.dtype)
            h = jax.nn.relu(jnp.dot(h, w_down, preferred_element_type=self.dtype))
            x = residual + jnp.dot(h, w_up, preferred_element_type=self.dtype)
        return x


def is_adapter_param(name: str) -> bool:
    return "adapters" in name or "adapter" in name
