"""Positional encodings: sinusoidal, learned, RoPE, ALiBi, T5 relative buckets.

TPU-friendly re-implementations of pasero/models/modules.py:394-1190. The
additive encodings (sinusoidal/learned) are applied to the embeddings; RoPE
rotates queries/keys; ALiBi and T5 produce an additive attention bias that is
passed into the attention kernel. All tables are computed with static shapes
(max_len) so decode steps only gather — no dynamic extension inside jit.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_table(max_len: int, dim: int, shift: int = 2) -> np.ndarray:
    """fairseq-style sinusoidal embeddings (half sin, half cos), with positions
    shifted by ``shift`` (pasero positional_encoding_shift, default 2)."""
    half = dim // 2
    freq = np.exp(np.arange(half) * -(math.log(10000.0) / max(half - 1, 1)))
    positions = np.arange(shift, max_len + shift)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(positions), np.cos(positions)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((max_len, 1))], axis=1)
    return table.astype(np.float32)


class PositionalEmbedding(nn.Module):
    """sinusoidal (fixed) or learned positions added to embeddings
    (pasero/models/modules.py:394-484)."""

    kind: str               # 'sinusoidal' | 'learned'
    max_len: int
    dim: int
    shift: int = 2
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions):
        """x: (B, S, D); positions: (B, S) int32 absolute positions."""
        if self.kind == "sinusoidal":
            table = jnp.asarray(sinusoidal_table(self.max_len + self.shift,
                                                 self.dim, self.shift))
            # table row i corresponds to position i (already shifted)
            pe = jnp.take(table, jnp.clip(positions, 0, self.max_len - 1), axis=0)
        elif self.kind == "learned":
            table = self.param(
                "embedding",
                nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=self.dim ** -0.5),
                    (None, "embed")),
                (self.max_len + self.shift, self.dim), jnp.float32)
            pe = jnp.take(table, jnp.clip(positions + self.shift, 0,
                                          self.max_len + self.shift - 1), axis=0)
        else:
            raise ValueError(self.kind)
        return x + pe.astype(x.dtype)


# -- RoPE ---------------------------------------------------------------------

def rope_frequencies(head_dim: int, base: float = 10000.0) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               base: float = 10000.0) -> jnp.ndarray:
    """Rotate-half rotary embedding, matching the reference convention
    (pasero modules.py:976-1025: cos/sin are cat(freqs, freqs) and
    rotate(x) = [-x2, x1]; official-Llama checkpoints are permuted to this
    layout by the converter, like the reference's convert-hf-ckpt.py).

    x: (B, H, S, D); positions: (B, S) absolute positions (per-sample offsets
    support left-padded prompts).
    """
    head_dim = x.shape[-1]
    freqs = jnp.asarray(rope_frequencies(head_dim, base), dtype=jnp.float32)
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # (B,1,S,D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)               # (B,1,S,D)
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    x32 = x.astype(jnp.float32)
    x1, x2 = jnp.split(x32, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x32 * cos + rotated * sin).astype(x.dtype)


# -- ALiBi --------------------------------------------------------------------

def alibi_slopes(num_heads: int, max_bias: int = 8) -> np.ndarray:
    """Geometric head slopes (pasero modules.py:1028-1096). max_bias controls
    the steepest slope: slope_h = 2^(-max_bias * (h+1) / num_heads)."""
    return np.asarray([2 ** (-max_bias * (h + 1) / num_heads)
                       for h in range(num_heads)], dtype=np.float32)


def alibi_bias(num_heads: int, q_positions: jnp.ndarray, k_positions: jnp.ndarray,
               max_bias: int = 8, causal: bool = True) -> jnp.ndarray:
    """Additive attention bias (B, H, Sq, Sk): bias = -slope * |k_pos - q_pos|
    (symmetric, like the reference — the causal mask handles the future side).

    Non-causal (encoder) self-attention breaks the symmetry with the half-head
    trick (modules.py:1089-1096): the first half of heads sees only the left
    context (k <= q), the second half only the strict right context (k > q).
    """
    slopes = jnp.asarray(alibi_slopes(num_heads, max_bias))
    rel = (k_positions[:, None, None, :] - q_positions[:, None, :, None]
           ).astype(jnp.float32)                       # (B, 1, Sq, Sk)
    bias = -jnp.abs(rel) * slopes[None, :, None, None]  # (B, H, Sq, Sk)
    if not causal:
        half = num_heads // 2
        head_ids = jnp.arange(num_heads)[None, :, None, None]
        future = rel > 0
        masked = jnp.where(head_ids < half, future, ~future)
        bias = jnp.where(masked, jnp.float32(-1e9), bias)
    return bias


# -- T5 relative position buckets --------------------------------------------

def t5_bucket(relative_position: jnp.ndarray, bidirectional: bool,
              num_buckets: int = 32, max_distance: int = 128) -> jnp.ndarray:
    """Map relative positions to T5 bucket ids (modules.py:1099-1190)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) / \
        math.log(max_distance / max_exact)
    val_large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5RelativeBias(nn.Module):
    """Learned per-head relative-position bias, shared across layers
    (reference ties it across layers, transformer.py:682-684)."""

    num_heads: int
    bidirectional: bool
    num_buckets: int = 32
    max_distance: int = 128

    def setup(self):
        self.table = self.param(
            "rel_embedding",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "heads")),
            (self.num_buckets, self.num_heads), jnp.float32)

    def __call__(self, q_positions, k_positions):
        return t5_bias_from_table(self.table, q_positions, k_positions,
                                  self.bidirectional, self.num_buckets,
                                  self.max_distance)

    def rel_table(self):
        """The raw (num_buckets, H) table — for the in-kernel flash path
        (ops/flash_attention.py T5Bias), which computes the bias blockwise
        instead of materializing (B, H, Sq, Sk)."""
        return self.table


def t5_bias_from_table(table, q_positions, k_positions, bidirectional,
                       num_buckets=32, max_distance=128):
    rel = q_positions[:, :, None] - k_positions[:, None, :]  # (B, Sq, Sk)
    buckets = t5_bucket(rel, bidirectional, num_buckets, max_distance)
    bias = jnp.take(table, buckets, axis=0)      # (B, Sq, Sk, H)
    return jnp.transpose(bias, (0, 3, 1, 2))      # (B, H, Sq, Sk)
