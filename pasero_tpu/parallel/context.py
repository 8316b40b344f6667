"""Context parallelism: sequence-sharded self-attention inside the model.

The reference has no context parallelism (its "sequence parallelism" is
Megatron-SP activation sharding, pasero/models/modules.py:103-176); this is a
new capability: with ``--cp-size N`` the mesh gains a ``seq`` axis and every
self-attention layer runs the exact ring-attention collective
(ops/ring_attention.py) over it, so a sequence N× longer than one chip's
attention memory fits. The rest of the model is elementwise/matmul in the
sequence dimension and is sharded by GSPMD as usual.

The mesh is registered by the trainer (set_context_mesh) the way the
reference installs its TP process group globally (modules.py:set_tp_group) —
flax modules cannot take the mesh as a call argument without threading it
through every layer signature.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ring_attention import ring_attention

logger = logging.getLogger("parallel")

_CONTEXT_MESH: Optional[Mesh] = None


def set_context_mesh(mesh: Optional[Mesh]):
    """Install the mesh whose 'seq' axis ring attention should ride."""
    global _CONTEXT_MESH
    _CONTEXT_MESH = mesh


def get_context_mesh() -> Optional[Mesh]:
    return _CONTEXT_MESH


def _plain_attention(q, k, v, kv_mask, bias, scale, causal, window,
                     dropout_rate=0.0, dropout_rng=None):
    from ..models.attention import dot_product_attention
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    full = (kv_mask[:, None, None, :] if kv_mask is not None
            else jnp.ones((B, 1, Sq, Sk), bool))
    rel = jnp.arange(Sq)[:, None] - jnp.arange(Sk)[None, :]
    if causal:
        full = full & (rel >= 0)[None, None]
    if window is not None:
        full = full & (rel < window)[None, None]
    return dot_product_attention(q, k, v, mask=full, bias=bias, scale=scale,
                                 dropout_rate=dropout_rate,
                                 dropout_rng=dropout_rng)


def ring_self_attention(q, k, v, kv_mask=None, bias=None, scale: float = 1.0,
                        causal: bool = False, window: Optional[int] = None,
                        dropout_rate: float = 0.0, dropout_rng=None):
    """Self-attention with K/V rotated over the mesh's 'seq' axis.

    q (B, H, S, D), k/v (B, Hkv, S, D) — GQA-sized K/V ride the ring
    unexpanded, so ICI traffic is H/Hkv times smaller than the activations.
    Falls back to plain attention when no multi-device 'seq' axis exists, so
    models built with attention_kernel='ring' run unchanged on one chip.

    Attention dropout is applied inside the ring blocks with
    per-(q-block, k-block) folded keys (ops/ring_attention.py), matching
    single-device dropout(softmax) semantics in distribution.
    """
    mesh = _CONTEXT_MESH
    if (mesh is None or "seq" not in mesh.axis_names
            or mesh.shape["seq"] == 1):
        return _plain_attention(q, k, v, kv_mask, bias, scale, causal,
                                window, dropout_rate, dropout_rng)

    n = mesh.shape["seq"]
    S = q.shape[2]
    shard = P(None, None, "seq", None)
    rng_spec = P() if dropout_rng is not None else None
    if causal and bias is None and S % (2 * n) == 0:
        # zigzag layout balances causal work across the ring and skips the
        # provably-masked half-block products (~2x less attention compute)
        from ..ops.ring_attention import zigzag_indices, zigzag_ring_attention
        import numpy as _np
        zig = zigzag_indices(S, n)
        inv = _np.argsort(zig)
        fn = functools.partial(zigzag_ring_attention, scale=scale,
                               window=window, axis_name="seq",
                               dropout_rate=dropout_rate)
        wrapped = jax.shard_map(
            lambda q, k, v, m, r: fn(q, k, v, kv_mask=m, dropout_rng=r),
            mesh=mesh,
            in_specs=(shard, shard, shard,
                      P(None, "seq") if kv_mask is not None else None,
                      rng_spec),
            out_specs=shard)
        out = wrapped(q[:, :, zig], k[:, :, zig], v[:, :, zig],
                      kv_mask[:, zig] if kv_mask is not None else None,
                      dropout_rng)
        return out[:, :, inv]

    fn = functools.partial(ring_attention, scale=scale, causal=causal,
                           window=window, axis_name="seq",
                           dropout_rate=dropout_rate)
    in_specs = [shard, shard, shard,
                P(None, "seq") if kv_mask is not None else None,
                # bias: shard the query rows, keep keys full width
                shard if bias is not None else None,
                rng_spec]
    wrapped = jax.shard_map(
        lambda q, k, v, m, b, r: fn(q, k, v, kv_mask=m, bias=b,
                                    dropout_rng=r),
        mesh=mesh, in_specs=tuple(in_specs), out_specs=shard)
    return wrapped(q, k, v, kv_mask, bias, dropout_rng)
