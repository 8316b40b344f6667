"""Transformer encoder-decoder / decoder-only model family.

TPU-native re-design of pasero/models/transformer.py:106-1417. The model is a
flax module tree; parameters carry logical sharding axes (see modules.py) and
the forward is fully static-shape: padding masks come in as boolean arrays,
the decoder KV cache is preallocated (attention.py), and losses are computed
with a padding/prompt weight mask instead of dynamic filtering.

Decoder-only models reuse TransformerDecoder without cross-attention
(reference's DummyEncoder path, transformer.py:78-93).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import TransformerConfig, register_model
from .attention import MultiheadAttention, NEG_INF
from .modules import (AdapterLayer, ConvolutionSubsampler, Embedding,
                      FeedForward, Linear, make_norm)
from .adapters import AdapterStack
from .moe import MoEFeedForward, moe_expert_count
from .positional import PositionalEmbedding, T5RelativeBias, alibi_bias


def make_ffn(cfg, is_decoder: bool, layer_id: int, dtype, name="ffn"):
    """Dense FFN or MoE layer depending on the config and layer id
    (pasero/models/mixture_of_experts.py:481-506 layer placement)."""
    num_experts = moe_expert_count(cfg, layer_id, is_decoder)
    ffn_dim = cfg.decoder_ffn_dim if is_decoder else cfg.encoder_ffn_dim
    if num_experts:
        expert_dim = getattr(cfg, f"{'decoder' if is_decoder else 'encoder'}_expert_dim",
                             None) or ffn_dim
        return MoEFeedForward(
            num_experts=num_experts, ffn_dim=expert_dim,
            activation=cfg.activation_fn, use_bias=cfg.has_bias,
            impl=getattr(cfg, "moe_impl", "fused"),
            dispatch=getattr(cfg, "moe_dispatch", "auto"),
            capacity_factor=getattr(cfg, "capacity_factor", 0.0),
            load_balancing=getattr(cfg, "load_balancing", 0.0),
            dtype=dtype, name=name)
    return FeedForward(ffn_dim, activation=cfg.activation_fn,
                       use_bias=cfg.has_bias, dropout=cfg.activation_dropout,
                       lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                       dtype=dtype, name=name)


def apply_ffn(ffn, x, pad_mask, deterministic):
    if isinstance(ffn, MoEFeedForward):
        return ffn(x, pad_mask=pad_mask, deterministic=deterministic)
    return ffn(x, deterministic=deterministic)


def remat_policy(cfg):
    """--checkpoint-policy -> jax.checkpoint policy (None = save nothing).

    'dots' keeps the outputs of weight matmuls (q/k/v/out projections, FFN
    matmuls — the MXU-heavy 2/3 of the layer) and recomputes only the
    elementwise ops and the attention products in backward; at 1B scale this
    recovers most of the full-remat forward-recompute cost for a bounded
    activation-memory increase (PERFORMANCE.md remat-policy A/B)."""
    name = getattr(cfg, "checkpoint_policy", "full") or "full"
    if name == "full":
        return None
    import jax.ad_checkpoint as adc
    return (adc.checkpoint_policies.dots_saveable if name == "dots_all"
            else adc.checkpoint_policies.dots_with_no_batch_dims_saveable)

Dtype = Any


def positions_from_mask(pad_mask: jnp.ndarray, shift: int = 0) -> jnp.ndarray:
    """Position ids that skip padding: cumsum over non-pad tokens - 1.

    Works for both left- and right-padded batches; padded slots get position
    of the previous real token (they are masked out of attention anyway).
    """
    pos = jnp.cumsum(pad_mask.astype(jnp.int32), axis=1) - 1
    return jnp.maximum(pos, 0) + shift


class TransformerEncoderLayer(nn.Module):
    cfg: TransformerConfig
    layer_id: int = 0
    kernel: str = "xla"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, bias=None, positions=None,
                 deterministic=True, return_weights=False):
        cfg = self.cfg
        attn = MultiheadAttention(
            num_heads=cfg.encoder_attention_heads,
            use_bias=cfg.has_bias, key_bias=cfg.attention_key_bias,
            scale_attn=cfg.scale_attn, max_qkv=cfg.max_qkv,
            rope_base=(cfg.rope_base
                       if cfg.encoder_positional_encoding == "rotary" else None),
            dropout=cfg.attention_dropout, causal=False,
            kernel=self.kernel, dtype=self.dtype, name="self_attn")
        norm1 = make_norm(cfg, self.dtype, name="self_attn_norm")
        norm2 = norm1 if cfg.shared_norm else make_norm(cfg, self.dtype,
                                                        name="ffn_norm")
        ffn = make_ffn(cfg, False, self.layer_id, self.dtype)
        pad_mask = mask[:, 0, 0, :] if mask is not None else None
        dropout = nn.Dropout(rate=cfg.dropout, deterministic=deterministic)

        residual = x
        h = norm1(x) if cfg.encoder_prenorm else x
        result = attn(h, mask=mask, bias=bias, positions=positions,
                      deterministic=deterministic, return_weights=return_weights)
        attn_out, weights = result if return_weights else (result, None)

        if cfg.parallel_attention:  # Falcon: FFN from the same normalized input
            ffn_out = apply_ffn(ffn, norm2(x) if cfg.encoder_prenorm else x,
                                pad_mask, deterministic)
            x = residual + dropout(attn_out) + dropout(ffn_out)
            if not cfg.encoder_prenorm:
                x = norm1(x)
        else:
            x = residual + dropout(attn_out)
            if not cfg.encoder_prenorm:
                x = norm1(x)
            residual = x
            h = norm2(x) if cfg.encoder_prenorm else x
            x = residual + dropout(apply_ffn(ffn, h, pad_mask, deterministic))
            if not cfg.encoder_prenorm:
                x = norm2(x)

        if cfg.check_inf:  # T5 half-precision guard (modules.py:179-189)
            x = jnp.nan_to_num(x, nan=0.0, posinf=6e4, neginf=-6e4)
        return (x, weights) if return_weights else x


class TransformerDecoderLayer(nn.Module):
    cfg: TransformerConfig
    layer_id: int = 0
    has_cross_attention: bool = True
    self_cache_len: int = 0
    cross_cache_len: int = 0
    kernel: str = "xla"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, encoder_out=None, self_mask=None, cross_mask=None,
                 self_bias=None, positions=None, encoder_positions=None,
                 decode=False, deterministic=True, return_weights=False,
                 beam_lineage=None):
        cfg = self.cfg
        dropout_rate = cfg.decoder_dropout if cfg.decoder_dropout is not None else cfg.dropout
        dropout = nn.Dropout(rate=dropout_rate, deterministic=deterministic)
        self_attn = MultiheadAttention(
            num_heads=cfg.decoder_attention_heads,
            kv_heads=cfg.attention_heads_kv,
            use_bias=cfg.has_bias, key_bias=cfg.attention_key_bias,
            scale_attn=cfg.scale_attn, max_qkv=cfg.max_qkv,
            sliding_window=cfg.sliding_window,
            rope_base=(cfg.rope_base
                       if cfg.decoder_positional_encoding == "rotary" else None),
            dropout=cfg.attention_dropout, causal=True,
            cache_len=self.self_cache_len, kernel=self.kernel,
            dtype=self.dtype, name="self_attn")
        norm1 = make_norm(cfg, self.dtype, name="self_attn_norm")
        norm2 = norm1 if cfg.shared_norm else make_norm(cfg, self.dtype,
                                                        name="ffn_norm")
        cross_weights = None

        residual = x
        h = norm1(x) if cfg.decoder_prenorm else x
        result = self_attn(h, mask=self_mask, bias=self_bias, positions=positions,
                           decode=decode, deterministic=deterministic,
                           return_weights=return_weights,
                           beam_lineage=beam_lineage)
        attn_out, self_weights = result if return_weights else (result, None)

        tgt_pad_mask = None
        if self_mask is not None and not decode:
            tgt_pad_mask = self_mask[:, 0, 0, :]
        if cfg.parallel_attention:
            ffn = make_ffn(cfg, True, self.layer_id, self.dtype)
            ffn_out = apply_ffn(ffn, norm2(x) if cfg.decoder_prenorm else x,
                                tgt_pad_mask, deterministic)
            x = residual + dropout(attn_out) + dropout(ffn_out)
            if not cfg.decoder_prenorm:
                x = norm1(x)
            if cfg.check_inf:
                x = jnp.nan_to_num(x, nan=0.0, posinf=6e4, neginf=-6e4)
            out = x
            if return_weights:
                return out, self_weights, cross_weights
            return out

        x = residual + dropout(attn_out)
        if not cfg.decoder_prenorm:
            x = norm1(x)

        if self.has_cross_attention:
            cross_norm = make_norm(cfg, self.dtype, name="cross_attn_norm")
            cross_attn = MultiheadAttention(
                num_heads=cfg.decoder_attention_heads,
                use_bias=cfg.has_bias, key_bias=cfg.attention_key_bias,
                scale_attn=cfg.scale_attn, max_qkv=cfg.max_qkv,
                dropout=cfg.attention_dropout, causal=False,
                cross_attention=True, cache_len=self.cross_cache_len,
                kernel=self.kernel, dtype=self.dtype, name="cross_attn")
            residual = x
            h = cross_norm(x) if cfg.decoder_prenorm else x
            result = cross_attn(h, x_kv=encoder_out, mask=cross_mask,
                                positions=positions,
                                kv_positions=encoder_positions, decode=decode,
                                deterministic=deterministic,
                                return_weights=return_weights)
            cross_out, cross_weights = result if return_weights else (result, None)
            x = residual + dropout(cross_out)
            if not cfg.decoder_prenorm:
                x = cross_norm(x)

        ffn = make_ffn(cfg, True, self.layer_id, self.dtype)
        residual = x
        h = norm2(x) if cfg.decoder_prenorm else x
        x = residual + dropout(apply_ffn(ffn, h, tgt_pad_mask, deterministic))
        if not cfg.decoder_prenorm:
            x = norm2(x)
        if cfg.check_inf:
            x = jnp.nan_to_num(x, nan=0.0, posinf=6e4, neginf=-6e4)
        if return_weights:
            return x, self_weights, cross_weights
        return x


class TransformerEncoder(nn.Module):
    cfg: TransformerConfig
    vocab_size: int
    num_adapters: int = 0
    shared_embed: Optional[Embedding] = None
    kernel: str = "xla"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, src_tokens, src_mask=None, deterministic=True,
                 return_layers=False, adapter_ids=None):
        """src_tokens: (B, S) int ids OR (B, T, F) float features (speech).
        src_mask: bool (B, S) True at real tokens."""
        cfg = self.cfg
        speech_input = src_tokens.ndim == 3

        if speech_input:
            lengths = (src_mask.sum(axis=1) if src_mask is not None
                       else jnp.full((src_tokens.shape[0],), src_tokens.shape[1]))
            x, lengths = ConvolutionSubsampler(
                channels=cfg.conv_channels or cfg.conv_input_dim or cfg.input_dim,
                kernel_sizes=cfg.conv_kernel_sizes or [],
                strides=cfg.conv_strides or [2] * len(cfg.conv_kernel_sizes or []),
                activation=cfg.conv_activation or "glu",
                out_dim=cfg.embed_dim,
                in_proj_dim=cfg.conv_input_dim,
                dtype=self.dtype, name="subsampler")(src_tokens, lengths)
            S = x.shape[1]
            src_mask = jnp.arange(S)[None, :] < lengths[:, None]
        else:
            embed = self.shared_embed or Embedding(
                self.vocab_size, cfg.embed_dim, dtype=self.dtype,
                name="embed_tokens")
            x = embed(src_tokens)
            if src_mask is None:
                src_mask = src_tokens != cfg.padding_idx

        if cfg.scale_embed:
            x = x * (cfg.embed_dim ** 0.5)

        positions = positions_from_mask(src_mask)
        pe = cfg.encoder_positional_encoding
        if pe in ("sinusoidal", "learned"):
            x = PositionalEmbedding(
                kind=pe, max_len=cfg.encoder_max_len, dim=cfg.embed_dim,
                shift=cfg.positional_encoding_shift, name="embed_positions",
            )(x, positions)

        if cfg.encoder_embed_norm:
            x = make_norm(cfg, self.dtype, name="embed_norm")(x)
        embed_dropout = cfg.embed_dropout if cfg.embed_dropout is not None else cfg.dropout
        x = nn.Dropout(rate=embed_dropout, deterministic=deterministic)(x)

        attn_mask = src_mask[:, None, None, :]  # keys validity
        bias = None
        if pe == "alibi":
            bias = alibi_bias(cfg.encoder_attention_heads, positions, positions,
                              max_bias=cfg.alibi_max_bias, causal=False)
        elif pe == "t5":
            # pass the (num_buckets, H) table: the flash kernel computes the
            # bias blockwise in-kernel; other attention paths materialize it
            # from the positions (models/attention.py)
            from ..ops.flash_attention import T5Bias
            mod = T5RelativeBias(cfg.encoder_attention_heads,
                                 bidirectional=True, name="t5_bias")
            bias = T5Bias(mod.rel_table(), True, mod.num_buckets,
                          mod.max_distance)

        ckpt_every = max(1, getattr(cfg, "checkpoint_interval", 1) or 1)
        layer_outputs = []
        for i in range(cfg.encoder_layers):
            if (cfg.checkpoint_activations and not return_layers
                    and i % ckpt_every == 0):
                # remat: recompute the layer in backward instead of saving
                # activations (the reference's --checkpoint-activations);
                # statics (deterministic, return_weights) passed positionally
                # — nn.remat's static_argnums count `self` at index 0
                layer = nn.remat(TransformerEncoderLayer, static_argnums=(5, 6),
                                 policy=remat_policy(cfg))(
                    cfg, layer_id=i, kernel=self.kernel, dtype=self.dtype,
                    name=f"layers_{i}")
                x = layer(x, attn_mask, bias, positions, deterministic, False)
            else:
                layer = TransformerEncoderLayer(cfg, layer_id=i,
                                                kernel=self.kernel,
                                                dtype=self.dtype,
                                                name=f"layers_{i}")
                x = layer(x, mask=attn_mask, bias=bias, positions=positions,
                          deterministic=deterministic)
            if self.num_adapters and adapter_ids is not None:
                layer_ids = getattr(cfg, "encoder_adapter_layer_ids", None)
                if layer_ids is None or i in layer_ids:
                    x = AdapterStack(
                        num_adapters=self.num_adapters,
                        bottleneck_dim=getattr(cfg, "encoder_adapter_dim", 64),
                        zero_init=getattr(cfg, "adapter_zero_init", False),
                        dtype=self.dtype, name=f"adapters_{i}")(x, adapter_ids)
            if return_layers:
                layer_outputs.append(x)

        if cfg.encoder_prenorm:
            x = make_norm(cfg, self.dtype, name="final_norm")(x)
        if return_layers:
            return x, src_mask, layer_outputs
        return x, src_mask


class TransformerDecoder(nn.Module):
    cfg: TransformerConfig
    vocab_size: int
    has_encoder: bool = True
    num_adapters: int = 0
    shared_embed: Optional[Embedding] = None
    self_cache_len: int = 0
    cross_cache_len: int = 0
    kernel: str = "xla"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, encoder_out=None, encoder_mask=None,
                 tgt_mask=None, positions=None, decode=False,
                 self_kv_mask=None, deterministic=True, return_layers=False,
                 return_weights=False, adapter_ids=None, beam_lineage=None,
                 ce_targets=None, ce_weights=None, head="logits"):
        """tokens: (B, T) decoder input ids. Returns logits (B, T, V) float32.

        self_kv_mask: (B, cache_len) bool — validity of KV-cache slots at
        decode time (False at left-pad prompt slots).

        ce_targets/ce_weights: fused-CE training path — instead of logits,
        return (loss_sum, nll_sum, weight_sum) computed by
        `chunked_cross_entropy` without materializing the (B, T, V) fp32
        logits tensor.

        head='argmax': greedy-decode fast path — return (tokens (B, T)
        int32, logprobs (B, T) f32) from the fused Pallas vocab head
        (ops/fused_ce.fused_head_argmax) without materializing the fp32
        (B, T, V) logits."""
        cfg = self.cfg
        embed = self.shared_embed or Embedding(
            self.vocab_size, cfg.embed_dim, dtype=self.dtype,
            name="embed_tokens")
        x = embed(tokens)
        if cfg.scale_embed:
            x = x * (cfg.embed_dim ** 0.5)

        if tgt_mask is None:
            tgt_mask = tokens != cfg.padding_idx
        if positions is None:
            positions = positions_from_mask(tgt_mask)

        pe = cfg.decoder_positional_encoding
        if pe in ("sinusoidal", "learned"):
            # table sized from the config only, so decode-time instances (with
            # a cache) share the training param tree
            x = PositionalEmbedding(
                kind=pe, max_len=cfg.decoder_max_len, dim=cfg.embed_dim,
                shift=cfg.positional_encoding_shift, name="embed_positions",
            )(x, positions)

        if cfg.decoder_embed_norm:
            x = make_norm(cfg, self.dtype, name="embed_norm")(x)
        embed_dropout = cfg.embed_dropout if cfg.embed_dropout is not None else cfg.dropout
        x = nn.Dropout(rate=embed_dropout, deterministic=deterministic)(x)

        B, T = tokens.shape
        if decode:
            # causal structure comes from positions in the cache update; the
            # caller only masks out invalid (left-pad) cache slots
            self_mask = (self_kv_mask[:, None, None, :]
                         if self_kv_mask is not None else None)
        else:
            self_mask = tgt_mask[:, None, None, :]

        self_bias = None
        if pe in ("alibi", "t5"):
            kv_pos = positions  # full forward: keys are the query positions
            if decode:
                # distances to cache slots: slot j holds absolute position
                # pos_last - (index + T - 1) + j; relative biases only depend
                # on the distance, so compute it from the running cache index
                L = self.self_cache_len
                step_var = self.variable("cache", "bias_step",
                                         lambda: jnp.zeros((), jnp.int32))
                i = step_var.value
                slots = jnp.arange(L)[None, :]                       # (1, L)
                kv_pos = positions[:, -1:] - (i + T - 1) + slots      # (B, L)
                step_var.value = i + T
            if pe == "alibi":
                self_bias = alibi_bias(cfg.decoder_attention_heads, positions,
                                       kv_pos, max_bias=cfg.alibi_max_bias,
                                       causal=True)
            else:
                mod = T5RelativeBias(cfg.decoder_attention_heads,
                                     bidirectional=False, name="t5_bias")
                if decode:
                    self_bias = mod(positions, kv_pos)
                else:
                    # table only; attention materializes off the flash path
                    from ..ops.flash_attention import T5Bias
                    self_bias = T5Bias(mod.rel_table(), False,
                                       mod.num_buckets, mod.max_distance)

        cross_mask = None
        encoder_positions = None
        if self.has_encoder and encoder_out is not None:
            if encoder_mask is not None:
                cross_mask = encoder_mask[:, None, None, :]
            encoder_positions = positions_from_mask(encoder_mask) \
                if encoder_mask is not None else None

        ckpt_every = max(1, getattr(cfg, "checkpoint_interval", 1) or 1)
        layer_outputs, self_attn_maps, cross_attn_maps = [], [], []
        for i in range(cfg.decoder_layers):
            layer_kwargs = dict(layer_id=i,
                                has_cross_attention=self.has_encoder,
                                self_cache_len=self.self_cache_len,
                                cross_cache_len=self.cross_cache_len,
                                kernel=self.kernel, dtype=self.dtype,
                                name=f"layers_{i}")
            if (cfg.checkpoint_activations and not decode
                    and not return_weights and i % ckpt_every == 0):
                # remat: statics (decode, deterministic, return_weights) must
                # be positional for jax.checkpoint's static_argnums
                # statics = decode/deterministic/return_weights, counting
                # `self` at index 0 (nn.remat convention); beam_lineage is
                # always None here (decode is excluded from remat above)
                layer = nn.remat(TransformerDecoderLayer,
                                 static_argnums=(8, 9, 10),
                                 policy=remat_policy(cfg))(cfg,
                                                           **layer_kwargs)
                result = layer(x, encoder_out, self_mask, cross_mask,
                               self_bias, positions, encoder_positions,
                               decode, deterministic, return_weights,
                               beam_lineage)
            else:
                layer = TransformerDecoderLayer(cfg, **layer_kwargs)
                result = layer(x, encoder_out=encoder_out, self_mask=self_mask,
                               cross_mask=cross_mask, self_bias=self_bias,
                               positions=positions,
                               encoder_positions=encoder_positions,
                               decode=decode, deterministic=deterministic,
                               return_weights=return_weights,
                               beam_lineage=beam_lineage)
            if return_weights:
                x, sw, cw = result
                self_attn_maps.append(sw)
                cross_attn_maps.append(cw)
            else:
                x = result
            if self.num_adapters and adapter_ids is not None:
                layer_ids = getattr(cfg, "decoder_adapter_layer_ids", None)
                if layer_ids is None or i in layer_ids:
                    x = AdapterStack(
                        num_adapters=self.num_adapters,
                        bottleneck_dim=getattr(cfg, "decoder_adapter_dim", 64),
                        zero_init=getattr(cfg, "adapter_zero_init", False),
                        dtype=self.dtype, name=f"adapters_{i}")(x, adapter_ids)
            if return_layers:
                layer_outputs.append(x)

        if cfg.decoder_prenorm:
            x = make_norm(cfg, self.dtype, name="final_norm")(x)

        if ce_targets is not None:
            if cfg.tied_output_projection:
                kernel = embed.embedding.T
            else:
                lin = Linear(self.vocab_size, use_bias=False,
                             dtype=self.dtype, kernel_axes=("embed", "vocab"),
                             name="output_projection")
                lin(x[:, :1])  # instantiate; the unused dot is DCE'd
                boxed = lin.variables["params"]["kernel"]
                kernel = getattr(boxed, "value", boxed)
            impl = getattr(cfg, "ce_impl", "auto")
            if impl == "auto":
                impl = ("flash" if jax.default_backend() == "tpu"
                        else "chunked")
            if impl == "flash":
                from ..ops.fused_ce import fused_cross_entropy
                Bx, Tx, Ex = x.shape
                return fused_cross_entropy(
                    x.reshape(Bx * Tx, Ex), kernel,
                    ce_targets.reshape(-1), ce_weights.reshape(-1),
                    cfg.label_smoothing or 0.0)
            return chunked_cross_entropy(
                x, kernel, ce_targets, ce_weights,
                label_smoothing=cfg.label_smoothing or 0.0,
                num_chunks=getattr(cfg, "ce_chunks", 8) or 8)

        if head == "argmax":
            from ..ops.fused_ce import fused_head_argmax
            from ..ops.quantize import QTensor
            if cfg.tied_output_projection:
                kernel = embed.embedding
                if not isinstance(kernel, QTensor):
                    kernel = kernel.T.astype(self.dtype)
                # QTensor: row-quantized (V, E) table goes in as-is — the
                # int8 argmax kernel reads it in its stored orientation
            else:
                lin = Linear(self.vocab_size, use_bias=False,
                             dtype=self.dtype, kernel_axes=("embed", "vocab"),
                             name="output_projection")
                lin(x[:, :1])  # instantiate; the unused dot is DCE'd
                boxed = lin.variables["params"]["kernel"]
                kernel = getattr(boxed, "value", boxed)
                if not isinstance(kernel, QTensor):
                    kernel = kernel.astype(self.dtype)
            Bx, Tx, Ex = x.shape
            tok, lp = fused_head_argmax(x.reshape(Bx * Tx, Ex), kernel)
            return tok.reshape(Bx, Tx), lp.reshape(Bx, Tx)

        if cfg.tied_output_projection:
            logits = embed.attend(x)
        else:
            logits = Linear(self.vocab_size, use_bias=False, dtype=self.dtype,
                            kernel_axes=("embed", "vocab"),
                            name="output_projection")(x)
        logits = logits.astype(jnp.float32)

        extras = {}
        if return_layers:
            extras["layers"] = layer_outputs
        if return_weights:
            extras["self_attn"] = self_attn_maps
            extras["cross_attn"] = cross_attn_maps
        if extras:
            return logits, extras
        return logits


def chunked_cross_entropy(x, kernel, targets, weights, label_smoothing=0.0,
                          num_chunks=8):
    """CE over vocab logits computed in sequence chunks — the fp32 (B, T, V)
    logits tensor never exists in HBM.

    The vocab head is the single largest HBM consumer of a training step
    (measured: ~14 of 58 device-ms on transformer-base at bf16, vs an
    ~8.4 ms MXU floor): the full path writes the fp32 logits, reads them
    for the loss, saves them for backward and reads them again.  Here a
    `lax.scan` over T-chunks computes each chunk's logits, reduces them to
    loss partial sums, and *discards* them; `jax.checkpoint` on the chunk
    body makes the backward recompute the chunk logits and fuse
    (softmax - onehot) into the dx/dkernel matmuls.  Cost: one extra
    logits matmul (recompute); saving: 3 full-size fp32 HBM passes.

    x: (B, T, E) activations (pre-head, post-norm); kernel: (E, V);
    targets (B, T) int32; weights (B, T) f32.
    Returns (loss_sum, nll_sum, weight_sum) — same contract (and same
    per-token math) as `cross_entropy_loss` on the full logits.
    """
    B, T, E = x.shape
    num_chunks = max(1, min(num_chunks, T))
    Tc = -(-T // num_chunks)
    pad = Tc * num_chunks - T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        weights = jnp.pad(weights, ((0, 0), (0, pad)))
    # (chunks, B, Tc, ...): chunking the time axis keeps the batch axis (and
    # its 'data' mesh sharding) intact through the scan
    xs = x.reshape(B, num_chunks, Tc, E).transpose(1, 0, 2, 3)
    ts = targets.reshape(B, num_chunks, Tc).transpose(1, 0, 2)
    ws = weights.astype(jnp.float32).reshape(B, num_chunks, Tc).transpose(1, 0, 2)
    kernel = kernel.astype(x.dtype)

    @jax.checkpoint
    def chunk_stats(xc, tc, wc):
        logits = jnp.dot(xc, kernel, preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, tc[..., None], axis=-1)[..., 0]
        nll = lse - tgt
        if label_smoothing > 0:
            smooth = lse - jnp.mean(logits, axis=-1)
            loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        else:
            loss = nll
        return jnp.sum(loss * wc), jnp.sum(nll * wc)

    def body(carry, inp):
        loss_acc, nll_acc = carry
        loss_c, nll_c = chunk_stats(*inp)
        return (loss_acc + loss_c, nll_acc + nll_c), None

    (loss_sum, nll_sum), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        (xs, ts, ws))
    return loss_sum, nll_sum, jnp.sum(weights)


def cross_entropy_loss(logits, targets, weights, label_smoothing=0.0):
    """Summed CE with label smoothing; normalization by token count happens in
    the trainer against the GLOBAL batch size (reference training.py:455-470).

    logits: (B, T, V) f32; targets: (B, T) int; weights: (B, T) f32 mask/scale.
    Returns (loss_sum, nll_sum, weight_sum).
    """
    # logsumexp form instead of materializing log_softmax: only (B, T)
    # reductions and one gather touch HBM beyond the logits themselves
    # (the (B, T, V) fp32 logp tensor would dominate step bandwidth)
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = lse - tgt
    if label_smoothing > 0:
        smooth = lse - jnp.mean(logits, axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    loss_sum = jnp.sum(loss * weights)
    nll_sum = jnp.sum(nll * weights)
    return loss_sum, nll_sum, jnp.sum(weights)


@register_model("transformer", TransformerConfig)
class Transformer(nn.Module):
    """Full model: encode → decode → loss (pasero/models/transformer.py:106-380).

    Batch convention (matches the reference collater):
      src_tokens (B, S) or features (B, T, F); decoder_input (B, T) starting
      with BOS; targets = decoder_input shifted left with EOS appended;
      prompt_mask (B, T) True at prompt positions (loss scaled by prompt_loss).
    """

    # decode_step accepts beam_lineage (no-reorder beam attention); subclasses
    # with non-transformer decoders (LSTM hybrid) override this to False
    supports_beam_lineage = True
    # fused chunked-CE loss path (chunked_cross_entropy); requires a
    # TransformerDecoder head — non-transformer decoders override to False
    supports_fused_ce = True
    # decode_step(head='argmax') greedy fast path (fused_head_argmax)
    supports_fused_head = True

    cfg: TransformerConfig
    src_vocab_size: int
    tgt_vocab_size: Optional[int] = None
    num_encoder_adapters: int = 0
    num_decoder_adapters: int = 0
    self_cache_len: int = 0
    cross_cache_len: int = 0
    kernel: Optional[str] = None  # default: cfg.attention_kernel
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        kernel = self.kernel or getattr(cfg, "attention_kernel", None) or "xla"
        tgt_vocab = self.tgt_vocab_size or self.src_vocab_size
        self.is_encoder_decoder = cfg.model_type != "decoder"
        speech = bool(cfg.input_dim)
        shared = None
        if (self.is_encoder_decoder and cfg.shared_embeddings and not speech
                and self.src_vocab_size == tgt_vocab):
            shared = Embedding(tgt_vocab, cfg.embed_dim, dtype=self.dtype,
                               name="shared_embed")
        if self.is_encoder_decoder:
            self.encoder = TransformerEncoder(
                cfg, vocab_size=self.src_vocab_size,
                num_adapters=self.num_encoder_adapters, shared_embed=shared,
                kernel=kernel, dtype=self.dtype)
        self.decoder = TransformerDecoder(
            cfg, vocab_size=tgt_vocab, has_encoder=self.is_encoder_decoder,
            num_adapters=self.num_decoder_adapters, shared_embed=shared,
            self_cache_len=self.self_cache_len,
            cross_cache_len=self.cross_cache_len, kernel=kernel,
            dtype=self.dtype)

    def encode(self, src_tokens, src_mask=None, deterministic=True,
               adapter_ids=None):
        return self.encoder(src_tokens, src_mask=src_mask,
                            deterministic=deterministic,
                            adapter_ids=adapter_ids)

    def decode_step(self, tokens, encoder_out=None, encoder_mask=None,
                    positions=None, tgt_mask=None, self_kv_mask=None,
                    adapter_ids=None, beam_lineage=None, head="logits"):
        """Single incremental decoding call (updates the 'cache' collection).

        beam_lineage (B0, K, cache_len): enables no-reorder beam attention —
        see attention.lineage_attention.

        head='argmax': return (tokens, logprobs) from the fused greedy vocab
        head instead of (B, T, V) logits (ops/fused_ce.fused_head_argmax)."""
        extra = {"beam_lineage": beam_lineage} if beam_lineage is not None \
            else {}  # decoders without the hook (LSTM) reject the kwarg
        if head != "logits":
            extra["head"] = head
        return self.decoder(tokens, encoder_out=encoder_out,
                            encoder_mask=encoder_mask, positions=positions,
                            tgt_mask=tgt_mask, decode=True,
                            self_kv_mask=self_kv_mask, deterministic=True,
                            adapter_ids=adapter_ids, **extra)

    def __call__(self, src_tokens=None, src_mask=None, decoder_input=None,
                 targets=None, prompt_mask=None, loss_weights=None,
                 deterministic=True,
                 return_layers=False, return_weights=False,
                 return_logits=False,
                 encoder_adapter_ids=None, decoder_adapter_ids=None):
        cfg = self.cfg
        encoder_out = encoder_mask = None
        if self.is_encoder_decoder:
            encoder_out, encoder_mask = self.encode(
                src_tokens, src_mask, deterministic=deterministic,
                adapter_ids=encoder_adapter_ids)

        weights = pad_mask = None
        if targets is not None:
            pad_mask = (targets != cfg.padding_idx).astype(jnp.float32)
            weights = loss_weights if loss_weights is not None else pad_mask
            if prompt_mask is not None and cfg.prompt_loss != 1.0:
                weights = weights * jnp.where(prompt_mask, cfg.prompt_loss, 1.0)

        # fused-CE path: the decoder reduces chunk logits to loss sums
        # directly (no (B, T, V) fp32 tensor; chunked_cross_entropy)
        # return_logits forces the materialized head: teacher-forced
        # *scoring* (TextGenerator.score / --teacher-forcing / --moe-stats)
        # needs per-token log-probs, which the fused-CE reduction discards
        fused = (targets is not None and self.supports_fused_ce
                 and getattr(cfg, "fused_ce", True)
                 and not return_layers and not return_weights
                 and not return_logits)
        if fused:
            loss_sum, nll_sum, _ = self.decoder(
                decoder_input, encoder_out=encoder_out,
                encoder_mask=encoder_mask, deterministic=deterministic,
                adapter_ids=decoder_adapter_ids,
                ce_targets=targets, ce_weights=weights)
            return {"loss_sum": loss_sum, "nll_sum": nll_sum,
                    "num_tokens": jnp.sum(pad_mask)}

        result = self.decoder(
            decoder_input, encoder_out=encoder_out, encoder_mask=encoder_mask,
            deterministic=deterministic, return_layers=return_layers,
            return_weights=return_weights, adapter_ids=decoder_adapter_ids)
        logits, extras = result if isinstance(result, tuple) else (result, {})

        out = {"logits": logits, **extras}
        if targets is not None:
            loss_sum, nll_sum, denom = cross_entropy_loss(
                logits, targets, weights,
                label_smoothing=cfg.label_smoothing or 0.0)
            out.update(loss_sum=loss_sum, nll_sum=nll_sum,
                       num_tokens=jnp.sum(pad_mask))
        return out
