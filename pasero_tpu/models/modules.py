"""Core NN modules: linear+LoRA, embeddings, norms, FFN, adapters, conv frontend.

TPU-native equivalents of pasero/models/modules.py. Parameters are created in
float32 with named logical axes (``nn.with_logical_partitioning``) so a single
set of sharding rules (pasero_tpu/parallel/sharding.py) maps them onto the
(data, model, expert) mesh — replacing the reference's col/row-parallel regex
machinery (pasero/models/transformer.py:120-123, modules.py:487-573). Compute
runs in ``dtype`` (bfloat16 by default); normalization statistics are always
float32 (modules.py:192-202 does the same fp32 trick).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()


def embed_init_fn(scale: Optional[float] = None):
    def init(key, shape, dtype=jnp.float32):
        s = scale if scale is not None else shape[-1] ** -0.5
        return jax.random.normal(key, shape, dtype) * s
    return init


class Linear(nn.Module):
    """Dense layer with optional zero-initialized LoRA branch
    (pasero/models/modules.py:67-101).

    LoRA params live under their own names so checkpoints can store them
    separately (``--save-trainable-only``) and inference can merge them into the
    dense kernel (transformer.py:484-497).
    """

    features: int
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: int = 8
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = default_kernel_init
    kernel_axes: tuple = (None, None)

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(self.kernel_init, self.kernel_axes),
            (in_features, self.features), jnp.float32)
        from ..ops.quantize import QTensor, int8_matmul
        if isinstance(kernel, QTensor):
            # weight-only int8 inference (--quantize int8): the Pallas
            # kernel streams int8 blocks from HBM and converts in VMEM
            y = int8_matmul(x.astype(self.dtype), kernel, out_dtype=self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(nn.initializers.zeros,
                                             (self.kernel_axes[1],)),
                (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            down = self.param(
                "lora_down",
                nn.with_logical_partitioning(default_kernel_init,
                                             (self.kernel_axes[0], None)),
                (in_features, self.lora_rank), jnp.float32)
            up = self.param(
                "lora_up",
                nn.with_logical_partitioning(nn.initializers.zeros,
                                             (None, self.kernel_axes[1])),
                (self.lora_rank, self.features), jnp.float32)
            scale = self.lora_alpha / self.lora_rank
            y = y + jnp.dot(jnp.dot(x.astype(self.dtype), down.astype(self.dtype)),
                            up.astype(self.dtype)) * scale
        return y


class Embedding(nn.Module):
    """Token embedding with optional partially-frozen rows
    (pasero/models/modules.py:890-947). Freezing is enforced by the optimizer
    mask (training/freeze.py), not by autograd surgery."""

    num_embeddings: int
    features: int
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.embedding = self.param(
            "embedding",
            nn.with_logical_partitioning(embed_init_fn(), ("vocab", "embed")),
            (self.num_embeddings, self.features), jnp.float32)

    def __call__(self, ids):
        from ..ops.quantize import QTensor, embedding_lookup
        if isinstance(self.embedding, QTensor):
            return embedding_lookup(self.embedding, ids, self.dtype)
        return jnp.take(self.embedding, ids, axis=0).astype(self.dtype)

    def attend(self, x):
        """Output projection with tied weights (transposed embedding)."""
        from ..ops.quantize import QTensor, int8_matmul_t
        if isinstance(self.embedding, QTensor):
            # row-quantized table: the int8 rows are read in their stored
            # orientation (no transposed copy); per-row scales multiply the
            # logit columns
            return int8_matmul_t(x.astype(self.dtype), self.embedding,
                                 out_dtype=jnp.float32)
        return jnp.dot(x.astype(self.dtype),
                       self.embedding.T.astype(self.dtype),
                       preferred_element_type=jnp.float32)


class RMSNorm(nn.Module):
    """RMS normalization computed in float32 (pasero/models/modules.py:192-202)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        scale = self.param(
            "scale", nn.with_logical_partitioning(nn.initializers.ones, ("embed",)),
            (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with optional bias, fp32 statistics
    (modules.py LayerNormWithoutBias)."""

    epsilon: float = 1e-5
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param(
            "scale", nn.with_logical_partitioning(nn.initializers.ones, ("embed",)),
            (x.shape[-1],), jnp.float32)
        y = y * scale
        if self.use_bias:
            bias = self.param(
                "bias", nn.with_logical_partitioning(nn.initializers.zeros, ("embed",)),
                (x.shape[-1],), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


def make_norm(cfg, dtype, name=None) -> nn.Module:
    if cfg.rms_norm:
        return RMSNorm(epsilon=cfg.norm_eps, dtype=dtype, name=name)
    return LayerNorm(epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, dtype=dtype,
                     name=name)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    # exact (erf) gelu like torch's default; 'gelu_tanh' is the approximation
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


class FeedForward(nn.Module):
    """FFN block; swiglu/geglu use a gated first projection
    (pasero/models/modules.py Expert/FFN + transformer.py activation handling)."""

    ffn_dim: int
    activation: str = "relu"
    use_bias: bool = True
    dropout: float = 0.0
    lora_rank: int = 0
    lora_alpha: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        embed_dim = x.shape[-1]
        gated = self.activation in ("swiglu", "geglu")
        fc1 = Linear(self.ffn_dim, use_bias=self.use_bias, dtype=self.dtype,
                     lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                     kernel_axes=("embed", "mlp"), name="fc1")(x)
        if gated:
            gate = Linear(self.ffn_dim, use_bias=self.use_bias, dtype=self.dtype,
                          lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                          kernel_axes=("embed", "mlp"), name="gate")(x)
            act = jax.nn.silu if self.activation == "swiglu" else jax.nn.gelu
            h = act(gate) * fc1
        else:
            h = ACTIVATIONS[self.activation](fc1)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return Linear(embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                      lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                      kernel_axes=("mlp", "embed"), name="fc2")(h)


class AdapterLayer(nn.Module):
    """Bapna-style bottleneck adapter: LN -> down -> ReLU -> up -> +residual
    (pasero/models/modules.py:248-370). ``zero_init`` makes it an exact
    identity at initialization (used at inference when over-specifying)."""

    bottleneck_dim: int
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = LayerNorm(dtype=self.dtype, name="norm")(x)
        init = nn.initializers.zeros if self.zero_init else \
            nn.initializers.normal(stddev=1e-3)
        y = Linear(self.bottleneck_dim, dtype=self.dtype, kernel_init=init,
                   kernel_axes=("embed", None), name="down")(y)
        y = jax.nn.relu(y)
        y = Linear(residual.shape[-1], dtype=self.dtype, kernel_init=init,
                   kernel_axes=(None, "embed"), name="up")(y)
        return residual + y


class ConvolutionSubsampler(nn.Module):
    """1-D conv stack subsampling speech features before the encoder
    (pasero/models/modules.py:774-834). Returns (features, new_lengths)."""

    channels: int
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    activation: str = "glu"   # glu halves the channel dim
    out_dim: Optional[int] = None
    in_proj_dim: Optional[int] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths):
        # x: (B, T, F) float features
        x = x.astype(self.dtype)
        if self.in_proj_dim is not None and self.in_proj_dim != x.shape[-1]:
            x = Linear(self.in_proj_dim, dtype=self.dtype,
                       kernel_axes=(None, "embed"), name="in_proj")(x)
            x = jax.nn.relu(x)
        strides = list(self.strides) or [2] * len(self.kernel_sizes)
        for i, (k, s) in enumerate(zip(self.kernel_sizes, strides)):
            features = self.channels * (2 if self.activation == "glu" else 1)
            x = nn.Conv(features=features, kernel_size=(k,), strides=(s,),
                        padding=[(k // 2, k // 2)], dtype=self.dtype,
                        name=f"conv{i}")(x)
            if self.activation == "glu":
                a, b = jnp.split(x, 2, axis=-1)
                x = a * jax.nn.sigmoid(b)
            else:
                x = jax.nn.gelu(x, approximate=False)
            lengths = (lengths + 2 * (k // 2) - k) // s + 1
        if self.out_dim is not None and x.shape[-1] != self.out_dim:
            x = Linear(self.out_dim, dtype=self.dtype,
                       kernel_axes=(None, "embed"), name="out_proj")(x)
        return x, lengths


def word_dropout(rng, ids, rate: float, unk_idx: int, deterministic: bool):
    """Randomly replace token ids by <unk> (pasero/models/modules.py:373-383)."""
    if deterministic or rate <= 0:
        return ids
    keep = jax.random.bernoulli(rng, 1.0 - rate, ids.shape)
    return jnp.where(keep, ids, unk_idx)
