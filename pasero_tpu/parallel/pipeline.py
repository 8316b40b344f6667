"""Pipeline parallelism: a `stage` mesh axis running GPipe over the decoder
layer stack.

The reference's PP is inference-only layer placement with device-to-device
activation hops (pasero/models/transformer.py:594-607); big-model *inference*
here is covered by mesh-sharded decode (TP/FSDP).  This module goes beyond the
reference: pipeline-parallel TRAINING, the TPU way —

- the per-layer parameter subtrees (``decoder/layers_i``) are stacked into one
  pytree whose leaves have a leading ``(num_layers, ...)`` dim, sharded over
  the ``stage`` mesh axis (each stage holds ``num_layers / pp_size`` layers —
  that is the memory saving PP exists for);
- the forward is a `shard_map` over ``stage``: every step each stage applies
  its local layers to its current microbatch and `ppermute`s the activation to
  the next stage (a GPipe schedule with ``M + S - 1`` ticks for M microbatches
  and S stages);
- the backward is NOT hand-written: `jax.grad` differentiates through
  `shard_map`/`ppermute`/`scan`, producing the reverse pipeline automatically.

Checkpoints stay topology-independent: the trainer packs/unpacks between this
stacked layout and the named ``layers_i`` layout at load/save, so the on-disk
format is identical with and without ``--pp-size`` (and any ``pp_size`` can
resume any other: the stacked tree does not depend on S, only its sharding
does).

Scope (asserted in `check_pp_supported`): decoder-only transformers, no
adapters/LoRA/MoE in the pipelined stack, ``tp/ep/cp == 1``.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("parallel")

STACK_KEY = "pp_stack"
ENC_STACK_KEY = "pp_stack_enc"
REST_KEY = "pp_rest"


# ---------------------------------------------------------------------------
# packed <-> named parameter layout
# ---------------------------------------------------------------------------

def is_packed(params) -> bool:
    return isinstance(params, dict) and STACK_KEY in params


def _stack_module(rest: dict, module: str, num_layers: int):
    sub = dict(rest[module])
    layers = [sub.pop(f"layers_{i}") for i in range(num_layers)]
    rest[module] = sub
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _unstack_module(rest: dict, module: str, stack):
    sub = dict(rest[module])
    num_layers = jax.tree_util.tree_leaves(stack)[0].shape[0]
    for i in range(num_layers):
        sub[f"layers_{i}"] = jax.tree_util.tree_map(lambda x: x[i], stack)
    rest[module] = sub


def pack_pp_params(params: dict, num_layers: int,
                   num_enc_layers: int = 0) -> dict:
    """Named layout -> ``{pp_stack[_enc]: (L, ...) leaves, pp_rest: rest}``."""
    rest = dict(params)
    out = {REST_KEY: rest}
    out[STACK_KEY] = _stack_module(rest, "decoder", num_layers)
    if num_enc_layers and "encoder" in params:
        out[ENC_STACK_KEY] = _stack_module(rest, "encoder", num_enc_layers)
    return out


def unpack_pp_params(packed: dict) -> dict:
    """Stacked layout back to the named ``layers_i`` layout."""
    if not is_packed(packed):
        return packed
    rest = dict(packed[REST_KEY])
    rest["decoder"] = dict(rest["decoder"])
    _unstack_module(rest, "decoder", packed[STACK_KEY])
    if ENC_STACK_KEY in packed:
        _unstack_module(rest, "encoder", packed[ENC_STACK_KEY])
    return rest


def pp_param_shardings(packed: dict, mesh: Mesh) -> dict:
    """Stack leaves sharded over 'stage' on dim 0; the rest replicated."""
    def shard(tree, spec):
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, spec), tree)

    out = {k: shard(v, P("stage")) for k, v in packed.items() if k != REST_KEY}
    out[REST_KEY] = shard(packed[REST_KEY], P())
    return out


def check_pp_supported(model, dist_cfg):
    cfg = model.cfg
    problems = []
    if cfg.model_type != "decoder" and getattr(cfg, "input_dim", None):
        problems.append("--pp-size does not support speech encoders "
                        "(conv subsampler changes the sequence length)")
    if getattr(dist_cfg, "tp_size", 1) > 1 or \
            getattr(dist_cfg, "ep_size", 1) > 1 or \
            getattr(dist_cfg, "cp_size", 1) > 1:
        problems.append("--pp-size composes with dp only (tp/ep/cp must be 1)")
    if model.num_decoder_adapters or model.num_encoder_adapters \
            or getattr(cfg, "lora_rank", 0):
        problems.append("--pp-size does not support adapters/LoRA")
    if getattr(cfg, "moe_num_experts", None):
        problems.append("--pp-size does not support MoE layers")
    pp = getattr(dist_cfg, "pp_size", 1)
    if cfg.decoder_layers % pp:
        problems.append(f"decoder_layers={cfg.decoder_layers} not divisible "
                        f"by pp_size={pp}")
    if cfg.model_type != "decoder" and cfg.encoder_layers % pp:
        problems.append(f"encoder_layers={cfg.encoder_layers} not divisible "
                        f"by pp_size={pp}")
    if problems:
        raise ValueError("; ".join(problems))


# ---------------------------------------------------------------------------
# the GPipe schedule
# ---------------------------------------------------------------------------

def gpipe(layer_fn, stacked_params, x, shared, *, mesh: Mesh,
          num_stages: int, microbatches: int, axis: str = "stage",
          fold_offset: int = 0):
    """Run ``x`` through the stacked layers, pipelined over ``axis``.

    layer_fn(one_layer_params, x, shared_mb, fold) -> x; ``fold`` is an int32
    scalar unique per (tick, stage, within-stage layer) for RNG folding —
    without the layer index every layer of a stage would draw identical
    dropout masks.  ``fold_offset`` disjoins the ranges of separate gpipe
    calls (encoder vs decoder stacks).
    x: (B, T, E); shared: pytree of per-sample tensors with leading B (masks,
    biases, positions), indexed per microbatch.  Returns (B, T, E).

    Every stage computes on every tick (the bubble computes garbage that is
    never read — the SPMD idiom: masking the compute would not make it
    cheaper).  The activation travels the ring once per tick via ppermute;
    grads flow back through the reversed ring automatically.
    """
    B = x.shape[0]
    M = microbatches
    S = num_stages
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    mb = B // M

    def split(a):
        return a.reshape((M, mb) + a.shape[1:])

    x_mb = split(x)
    shared_mb = jax.tree_util.tree_map(split, shared)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage_body(local_stack, x_mb, shared_mb):
        stage = lax.axis_index(axis)
        layers_per_stage = jax.tree_util.tree_leaves(local_stack)[0].shape[0]
        state = jnp.zeros_like(x_mb[0])
        out = jnp.zeros_like(x_mb)

        def tick(carry, t):
            state, out = carry
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            y = jnp.where(stage == 0, x_mb[mb_idx], state)
            sh = jax.tree_util.tree_map(lambda a: a[mb_idx], shared_mb)
            for i in range(layers_per_stage):
                lp = jax.tree_util.tree_map(lambda a: a[i], local_stack)
                y = layer_fn(lp, y, sh,
                             fold_offset
                             + (t * S + stage) * layers_per_stage + i)
            # the last stage banks microbatch t-(S-1) once it is real
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = (stage == S - 1) & (t >= S - 1)
            prev = lax.dynamic_index_in_dim(out, out_idx, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, prev), out_idx, 0)
            state = lax.ppermute(y, axis, perm)
            return (state, out), None

        (_, out), _ = lax.scan(tick, (state, out), jnp.arange(M + S - 1))
        # replicate the final activations from the last stage to all stages
        out = jnp.where(stage == S - 1, out, jnp.zeros_like(out))
        return lax.psum(out, axis)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
        jax.tree_util.tree_map(lambda _: P(None, "data"), x_mb),
        jax.tree_util.tree_map(lambda _: P(None, "data"), shared_mb),
    )
    out = shard_map(stage_body, mesh=mesh, in_specs=in_specs,
                    out_specs=P(None, "data"), check_vma=False)(
        stacked_params, x_mb, shared_mb)
    return out.reshape((B,) + out.shape[2:])


# ---------------------------------------------------------------------------
# the pipelined decoder forward (prelude + gpipe + head)
# ---------------------------------------------------------------------------

def make_pp_forward(model, mesh: Mesh, num_stages: int, microbatches: int):
    """Full-forward logits for a decoder-only Transformer with the layer
    stack pipelined over the 'stage' mesh axis.

    Reimplements the thin prelude/head around the layer loop of
    `models/transformer.py:TransformerDecoder.__call__` (embedding, positional
    encoding, masks, relative bias, final norm, output projection) by applying
    the model's own submodules to the `pp_rest` subtree — parity with the
    unpipelined forward is asserted in tests/test_pipeline_parallel.py.
    """
    from ..models.transformer import (TransformerDecoderLayer,
                                      TransformerEncoderLayer,
                                      positions_from_mask)
    from ..models.modules import Embedding, Linear, make_norm
    from ..models.positional import PositionalEmbedding, alibi_bias, \
        T5RelativeBias

    cfg = model.cfg
    is_enc_dec = cfg.model_type != "decoder"
    tgt_vocab = model.tgt_vocab_size or model.src_vocab_size
    dtype = model.dtype
    kernel = model.kernel or getattr(cfg, "attention_kernel", None) or "xla"
    dec_layer_mod = TransformerDecoderLayer(
        cfg, layer_id=0, has_cross_attention=is_enc_dec, kernel=kernel,
        dtype=dtype)
    enc_layer_mod = TransformerEncoderLayer(cfg, layer_id=0, kernel=kernel,
                                            dtype=dtype)
    tgt_embed_mod = Embedding(tgt_vocab, cfg.embed_dim, dtype=dtype)
    src_embed_mod = Embedding(model.src_vocab_size, cfg.embed_dim, dtype=dtype)

    def embed_params(rest, side):
        if "shared_embed" in rest:
            return rest["shared_embed"]
        return rest[side]["embed_tokens"]

    def remat(fn):
        if getattr(cfg, "checkpoint_activations", False):
            return jax.checkpoint(fn)
        return fn

    def prelude(rest, side, embed_mod, tokens, mask, deterministic,
                dropout_rng, fold_base):
        """Everything before the layer stack: embedding, positional encoding,
        embed norm/dropout, self mask, relative bias."""
        sub = rest[side]
        pe = getattr(cfg, f"{side}_positional_encoding")
        heads = getattr(cfg, f"{side}_attention_heads")
        causal = side == "decoder"
        positions = positions_from_mask(mask)

        x = embed_mod.apply({"params": embed_params(rest, side)}, tokens)
        if cfg.scale_embed:
            x = x * (cfg.embed_dim ** 0.5)
        if pe in ("sinusoidal", "learned"):
            x = PositionalEmbedding(
                kind=pe, max_len=getattr(cfg, f"{side}_max_len"),
                dim=cfg.embed_dim, shift=cfg.positional_encoding_shift).apply(
                {"params": sub.get("embed_positions", {})}, x, positions)
        if getattr(cfg, f"{side}_embed_norm"):
            x = make_norm(cfg, dtype).apply({"params": sub["embed_norm"]}, x)
        embed_dropout = (cfg.embed_dropout if cfg.embed_dropout is not None
                         else cfg.dropout)
        if not deterministic and embed_dropout:
            # fold_base is outside the layer fold range (t * S + stage >= 0)
            # and positive (rbg keys are uint32 — negative folds overflow)
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, fold_base),
                1.0 - embed_dropout, x.shape)
            x = x * keep / (1.0 - embed_dropout)

        bias = None
        if pe == "alibi":
            bias = alibi_bias(heads, positions, positions,
                              max_bias=cfg.alibi_max_bias, causal=causal)
        elif pe == "t5":
            bias = T5RelativeBias(heads, bidirectional=not causal).apply(
                {"params": sub["t5_bias"]}, positions, positions)
        if bias is not None and bias.shape[0] == 1:
            bias = jnp.broadcast_to(bias,
                                    (tokens.shape[0],) + bias.shape[1:])
        return x, mask[:, None, None, :], bias, positions

    def forward(packed_params, tokens, tgt_mask=None, src_tokens=None,
                src_mask=None, deterministic=True, dropout_rng=None):
        rest = packed_params[REST_KEY]
        dec = rest["decoder"]
        if tgt_mask is None:
            tgt_mask = tokens != cfg.padding_idx
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)

        def rng_rows(n):
            # rngs ride `shared` so each microbatch/stage folds its own key
            return jnp.broadcast_to(dropout_rng[None],
                                    (n,) + dropout_rng.shape)

        encoder_out = encoder_mask = encoder_positions = None
        if is_enc_dec:
            if src_mask is None:
                src_mask = src_tokens != cfg.padding_idx
            x, enc_mask4, enc_bias, enc_pos = prelude(
                rest, "encoder", src_embed_mod, src_tokens, src_mask,
                deterministic, dropout_rng, 2 ** 31 - 2)

            @remat
            def enc_layer_fn(lp, y, sh, fold):
                it = iter(sh)
                m = next(it)
                b = next(it) if enc_bias is not None else None
                pos = next(it)
                rng = next(it)[0]
                rngs = None if deterministic else \
                    {"dropout": jax.random.fold_in(rng, fold)}
                return enc_layer_mod.apply(
                    {"params": lp}, y, mask=m, bias=b, positions=pos,
                    deterministic=deterministic, rngs=rngs)

            enc_shared = tuple(
                s for s in (enc_mask4, enc_bias, enc_pos,
                            rng_rows(src_tokens.shape[0])) if s is not None)
            # fold_offset=2**30 keeps encoder folds disjoint from the
            # decoder gpipe's (offset 0) and below the prelude bases
            encoder_out = gpipe(enc_layer_fn, packed_params[ENC_STACK_KEY],
                                x, enc_shared, mesh=mesh,
                                num_stages=num_stages,
                                microbatches=microbatches,
                                fold_offset=2 ** 30)
            if cfg.encoder_prenorm:
                encoder_out = make_norm(cfg, dtype).apply(
                    {"params": rest["encoder"]["final_norm"]}, encoder_out)
            encoder_mask = src_mask
            encoder_positions = positions_from_mask(src_mask)

        x, self_mask, self_bias, positions = prelude(
            rest, "decoder", tgt_embed_mod, tokens, tgt_mask,
            deterministic, dropout_rng, 2 ** 31 - 1)

        @remat
        def dec_layer_fn(lp, y, sh, fold):
            it = iter(sh)
            sm = next(it)
            sb = next(it) if self_bias is not None else None
            pos = next(it)
            rng = next(it)[0]
            enc = next(it) if is_enc_dec else None
            cm = next(it)[:, None, None, :] if is_enc_dec else None
            ep = next(it) if is_enc_dec else None
            rngs = None if deterministic else \
                {"dropout": jax.random.fold_in(rng, fold)}
            return dec_layer_mod.apply(
                {"params": lp}, y, encoder_out=enc, self_mask=sm,
                cross_mask=cm, self_bias=sb, positions=pos,
                encoder_positions=ep, deterministic=deterministic, rngs=rngs)

        shared = [self_mask, self_bias, positions,
                  rng_rows(tokens.shape[0])]
        if is_enc_dec:
            shared += [encoder_out, encoder_mask, encoder_positions]
        shared_dyn = tuple(s for s in shared if s is not None)

        x = gpipe(dec_layer_fn, packed_params[STACK_KEY], x, shared_dyn,
                  mesh=mesh, num_stages=num_stages, microbatches=microbatches)

        if cfg.decoder_prenorm:
            x = make_norm(cfg, dtype).apply({"params": dec["final_norm"]}, x)
        if cfg.tied_output_projection:
            logits = tgt_embed_mod.apply(
                {"params": embed_params(rest, "decoder")}, x,
                method=Embedding.attend)
        else:
            logits = Linear(tgt_vocab, use_bias=False, dtype=dtype).apply(
                {"params": dec["output_projection"]}, x)
        return logits.astype(jnp.float32)

    return forward
