"""Hybrid model: Transformer encoder + LSTM decoder (pasero/models/hybrid.py).

The decoder stacks LSTM layers with single-head additive (Bahdanau) attention
computed from the FIRST layer's outputs and concatenated into the inputs of
the upper layers (hybrid.py:120-180: attention does not feed back into the
first LSTM, so training runs the recurrence per layer and everything else in
parallel over time). ~10x faster NLLB decoding than the Transformer decoder
(examples/NLLB-200/README.md:99-105).

TPU mapping: the recurrence is a ``lax.scan`` over time with carry gating on
the padding mask (so left-padded decode prompts don't corrupt the state);
decode keeps (h, c) per layer in the 'cache' collection.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import register_model
from ..config.models import HybridTransformerConfig
from .modules import Embedding, LayerNorm, Linear
from .transformer import (Transformer, TransformerEncoder, cross_entropy_loss,
                          positions_from_mask)

Dtype = Any


class BahdanauAttention(nn.Module):
    """Single-head additive attention (hybrid.py:23-58).

    At decode time the projected key, the raw encoder values and the encoder
    mask are cached on the first call (the reference stores 'attn_key' in its
    state dict, hybrid.py:46-48), so later steps can be fed a dummy encoder.
    """

    hidden_dim: int
    cache_len: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key_value, key_mask, decode=False,
                 return_weights=False):
        """query (B,T,Dh); key_value (B,S,De); key_mask (B,S) True=real."""
        B = query.shape[0]
        key = Linear(self.hidden_dim, dtype=self.dtype,
                     kernel_axes=("embed", None), name="key_proj")(key_value)
        if decode and self.cache_len > 0:
            L = self.cache_len
            De = key_value.shape[-1]
            cached_key = self.variable("cache", "attn_key", jnp.zeros,
                                       (B, L, self.hidden_dim), self.dtype)
            cached_value = self.variable("cache", "attn_value", jnp.zeros,
                                         (B, L, De), self.dtype)
            cached_mask = self.variable("cache", "attn_mask", jnp.zeros,
                                        (B, L), jnp.bool_)
            filled = self.variable("cache", "attn_filled",
                                   lambda: jnp.zeros((), jnp.bool_))
            write = lambda buf, val: jnp.where(  # noqa: E731
                filled.value, buf,
                jax.lax.dynamic_update_slice(
                    buf, val.astype(buf.dtype), (0,) * buf.ndim))
            cached_key.value = write(cached_key.value, key)
            cached_value.value = write(cached_value.value, key_value)
            assert key_mask is not None, "decode requires the encoder mask"
            cached_mask.value = write(cached_mask.value, key_mask)
            filled.value = jnp.ones((), jnp.bool_)
            key, key_value, key_mask = (cached_key.value, cached_value.value,
                                        cached_mask.value)
        q = Linear(self.hidden_dim, dtype=self.dtype,
                   kernel_axes=(None, None), name="query_proj")(query)
        scores = Linear(1, dtype=self.dtype, kernel_axes=(None, None),
                        name="inner_proj")(
            jnp.tanh(key[:, None, :, :] + q[:, :, None, :]))[..., 0]  # (B,T,S)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, :],
                               scores.astype(jnp.float32), -1e9)
        else:
            scores = scores.astype(jnp.float32)
        weights = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bts,bsd->btd", weights.astype(key_value.dtype),
                          key_value)
        if return_weights:
            return attn, weights
        return attn


class MaskedLSTMCell(nn.Module):
    """LSTM cell step with pad gating: padded steps pass the carry through."""

    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        x_t, m_t = inputs
        cell = nn.OptimizedLSTMCell(features=self.features,
                                    param_dtype=jnp.float32, name="cell")
        new_carry, y = cell(carry, x_t.astype(jnp.float32))
        keep = m_t[:, None]
        gated = jax.tree_util.tree_map(
            lambda new, old: jnp.where(keep, new, old), new_carry, carry)
        y = jnp.where(keep, y, jnp.zeros_like(y))
        return gated, y


class LSTMLayer(nn.Module):
    """One LSTM over time with pad-gated carries; supports an initial carry
    from the decode cache."""

    hidden_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, step_mask, initial_carry=None):
        """x (B,T,Din); step_mask (B,T) True at real steps.
        Returns (outputs (B,T,Dh), final_carry (c,h))."""
        B = x.shape[0]
        ScanCell = nn.scan(MaskedLSTMCell, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=1, out_axes=1)
        if initial_carry is None:
            carry = (jnp.zeros((B, self.hidden_dim), jnp.float32),
                     jnp.zeros((B, self.hidden_dim), jnp.float32))
        else:
            carry = initial_carry
        cell = ScanCell(features=self.hidden_dim, name="scan_cell")
        carry, outputs = cell(carry, (x, step_mask.astype(jnp.float32) > 0))
        return outputs.astype(self.dtype), carry


class LSTMDecoder(nn.Module):
    """LSTM decoder stack (hybrid.py:80-230)."""

    cfg: HybridTransformerConfig
    vocab_size: int
    cross_cache_len: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, encoder_out=None, encoder_mask=None,
                 tgt_mask=None, positions=None, decode=False,
                 self_kv_mask=None, deterministic=True, return_layers=False,
                 return_weights=False, adapter_ids=None):
        cfg = self.cfg
        hidden = cfg.decoder_hidden_size
        embed = Embedding(self.vocab_size, cfg.embed_dim, dtype=self.dtype,
                          name="embed_tokens")
        x = embed(tokens)
        if cfg.scale_embed:
            x = x * (cfg.embed_dim ** 0.5)
        if cfg.decoder_embed_proj:
            x = Linear(cfg.embed_dim, dtype=self.dtype,
                       kernel_axes=("embed", "embed"), name="embed_proj")(x)
        dropout_rate = cfg.decoder_dropout if cfg.decoder_dropout is not None \
            else cfg.dropout
        dropout = nn.Dropout(rate=dropout_rate, deterministic=deterministic)
        x = dropout(x)

        if tgt_mask is None:
            tgt_mask = tokens != cfg.padding_idx
        # at decode time the prompt may be left-padded: gate the recurrence on
        # the true validity of each slot (self_kv_mask[:, :T])
        if decode and self_kv_mask is not None:
            step_mask = self_kv_mask[:, :tokens.shape[1]]
        else:
            step_mask = tgt_mask

        def get_carry(i, B):
            if not decode:
                return None
            h = self.variable("cache", f"lstm_h_{i}",
                              jnp.zeros, (B, hidden), jnp.float32)
            c = self.variable("cache", f"lstm_c_{i}",
                              jnp.zeros, (B, hidden), jnp.float32)
            return h, c

        B = tokens.shape[0]
        attn = None
        attn_weights = None
        for i in range(cfg.decoder_layers):
            residual = x
            inputs = x if attn is None else jnp.concatenate([x, attn], axis=-1)
            inputs = LayerNorm(epsilon=cfg.norm_eps, dtype=self.dtype,
                               name=f"norm_{i}")(inputs)
            carry_vars = get_carry(i, B)
            initial = None
            if carry_vars is not None:
                initial = (carry_vars[1].value, carry_vars[0].value)  # (c, h)
            layer = LSTMLayer(hidden_dim=hidden, dtype=self.dtype,
                              name=f"lstm_{i}")
            x, final_carry = layer(inputs, step_mask, initial_carry=initial)
            if carry_vars is not None:
                carry_vars[1].value, carry_vars[0].value = final_carry
            if i == 0:
                x = dropout(x)
                attention = BahdanauAttention(hidden_dim=hidden,
                                              cache_len=self.cross_cache_len,
                                              dtype=self.dtype,
                                              name="attention")
                result = attention(x, encoder_out, encoder_mask, decode=decode,
                                   return_weights=return_weights)
                attn, attn_weights = result if return_weights else (result, None)
            else:
                x = dropout(x)
                x = residual + x

        if hidden != cfg.embed_dim:
            x = Linear(cfg.embed_dim, dtype=self.dtype,
                       kernel_axes=(None, "embed"), name="out_proj")(x)
        x = x + attn

        if cfg.tied_output_projection:
            logits = embed.attend(x)
        else:
            logits = Linear(self.vocab_size, use_bias=False, dtype=self.dtype,
                            kernel_axes=("embed", "vocab"),
                            name="output_projection")(x)
        logits = logits.astype(jnp.float32)
        if return_weights:
            return logits, {"cross_attn": [attn_weights]}
        return logits


from ..config.models import AdapterHybridTransformerConfig


@register_model("hybrid_transformer", HybridTransformerConfig)
class HybridTransformer(Transformer):
    """Transformer encoder + LSTM decoder, same outer API as Transformer."""

    supports_beam_lineage = False  # the LSTM decoder has no KV-cache lineage
    supports_fused_ce = False      # LSTM decoder has no chunked-CE head hook
    supports_fused_head = False    # ...nor the fused greedy argmax head

    def setup(self):
        cfg = self.cfg
        tgt_vocab = self.tgt_vocab_size or self.src_vocab_size
        self.is_encoder_decoder = True
        self.encoder = TransformerEncoder(
            cfg, vocab_size=self.src_vocab_size,
            num_adapters=self.num_encoder_adapters,
            kernel=self.kernel or getattr(cfg, "attention_kernel", None) or "xla",
            dtype=self.dtype)
        self.decoder = LSTMDecoder(cfg, vocab_size=tgt_vocab,
                                   cross_cache_len=self.cross_cache_len,
                                   dtype=self.dtype)


# the adapter variant shares the hybrid decoder; encoder adapters come from
# the Transformer encoder path (pasero/models/hybrid.py:74-77)
register_model("adapter_hybrid_transformer",
               AdapterHybridTransformerConfig)(HybridTransformer)
