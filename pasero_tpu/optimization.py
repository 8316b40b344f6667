"""Optimizers and LR schedules (pasero/optimization.py).

AdamW with float32 moments regardless of compute dtype (the reference's
``optimizer_states_as_fp32``, optimization.py:56-164, per Gopher §C2 —
automatic here since parameters are kept float32 and bf16 casting happens at
use); inverse-sqrt LR with linear warmup or linear decay (optimization.py:
21-52); global-norm clipping (optimization.py:391-427). Gradients are
normalized by the GLOBAL token count before clipping, like the reference's
Trainer (training.py:455-470) — expressed here by scaling the summed loss
inside the train step, not by a separate collective.

fp16 loss-scaling machinery (GradScaler, optimization.py:324-427) is
GPU-specific and intentionally absent: TPU trains in bf16, which needs no
loss scale. The ``--dtype float16`` flag maps to bfloat16.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def inverse_sqrt_schedule(lr: float, warmup: int, init_lr: float = 0.0,
                          min_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup from init_lr to lr over ``warmup`` steps, then decay
    proportional to 1/sqrt(step)."""

    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = init_lr + (lr - init_lr) * step / max(warmup, 1)
        decay = lr * (max(warmup, 1) ** 0.5) * jax.lax.rsqrt(step.astype(jnp.float32))
        value = jnp.where(step < warmup, warm, decay)
        return jnp.maximum(value, min_lr)

    return schedule


def linear_decay_schedule(lr: float, max_steps: int, init_lr: float = 0.0,
                          min_lr: float = 0.0) -> optax.Schedule:
    def schedule(step):
        frac = jnp.clip(step / max(max_steps, 1), 0.0, 1.0)
        return jnp.maximum(lr + (min_lr - lr) * frac, min_lr)

    return schedule


def lr_schedule_from_config(cfg) -> optax.Schedule:
    if cfg.warmup and cfg.warmup > 0:
        return inverse_sqrt_schedule(cfg.lr, cfg.warmup, cfg.init_lr, cfg.min_lr)
    return linear_decay_schedule(cfg.lr, cfg.max_steps or 1, cfg.init_lr, cfg.min_lr)


def trainable_mask(params, freeze_regex: Optional[str] = None,
                   train_regex: Optional[str] = None,
                   default_trainable=None):
    """Boolean pytree: which parameters receive updates.

    Reproduces --freeze-params-regex / --train-params-regex semantics
    (cli/train.py:229-243). ``default_trainable`` is an optional per-path
    predicate used by architectures (adapters: train adapters only; LoRA:
    train lora_* only).

    Regexes match dotted parameter names (``encoder.layers_0.self_attn.
    q_proj.kernel``) — the reference's dotted convention, not jax's raw
    ``['encoder']['layers_0']...`` keystr (against which a user regex like
    ``^encoder`` would silently never match).
    """
    flat = jax.tree_util.tree_leaves_with_path(params)

    def dotted(path) -> str:
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    def decide(path) -> bool:
        name = dotted(path)
        if train_regex:
            return bool(re.search(train_regex, name))
        if freeze_regex:
            return not re.search(freeze_regex, name)
        if default_trainable is not None:
            return default_trainable(name)
        return True

    leaves = {jax.tree_util.keystr(p): decide(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: leaves[jax.tree_util.keystr(p)], params)


def make_optimizer(cfg, mask=None) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW(fp32 states) -> lr schedule [-> mask]."""
    schedule = lr_schedule_from_config(cfg)
    components = []
    if cfg.clip_norm and cfg.clip_norm > 0:
        components.append(optax.clip_by_global_norm(cfg.clip_norm))
    components.append(optax.scale_by_adam(
        b1=cfg.adam_betas[0], b2=cfg.adam_betas[1], eps=1e-8,
        mu_dtype=jnp.float32))
    if cfg.weight_decay:
        components.append(optax.add_decayed_weights(cfg.weight_decay))
    components.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*components)
    if mask is not None:
        tx = optax.masked(tx, mask)
    return tx


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
