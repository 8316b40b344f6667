"""Ring attention: exact attention over sequence shards on a mesh axis.

The reference has no context parallelism (SURVEY.md §2.9: max contexts rely on
vanilla/flash attention with KV truncation, pasero/models/modules.py:629-633);
this is the TPU-native long-context upgrade prescribed by the survey (§7 item
10): shard the sequence over a mesh axis, keep each device's Q block resident,
and rotate K/V shards around the ring with `lax.ppermute` (XLA overlaps the
ICI transfer with the local block computation). Per-step partial results are
merged with the flash-attention streaming-softmax recurrence, so the result is
exact (not approximate) attention over the full sequence while each device
only ever holds 1/N of the keys.

Use inside `shard_map` over the sequence axis, e.g.::

    out = shard_map(
        functools.partial(ring_attention, axis_name="seq", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None),
    )(q, k, v)

Shapes (per shard): q (B, H, S_q_local, D), k/v (B, Hkv, S_kv_local, D).
GQA is supported (H % Hkv == 0). `kv_mask` is an optional boolean (B,
S_kv_local) validity mask for the local keys; it rotates with K/V.

The per-step block computation is wrapped in `jax.checkpoint`, so
differentiating through the ring replays the rotation instead of saving every
received K/V block — backward memory stays O(local shard).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.checkpoint, static_argnums=(7, 8, 9))
def _block(q, k, v, kv_mask, bias_blk, q_pos, k_pos, scale, causal, window):
    """Unnormalized attention of the local Q block against one K/V block.

    Returns (acc, m, l): acc = sum_j p_ij v_j with p = exp(s - m), row max m,
    row sum l — the flash-attention partial triple for later merging.
    """
    H, Hkv = q.shape[1], k.shape[1]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias_blk is not None:
        s = s + bias_blk.astype(jnp.float32)
    ok = jnp.ones(s.shape, bool)
    if kv_mask is not None:
        ok &= kv_mask[:, None, None, :]
    rel = q_pos[:, None] - k_pos[None, :]                 # (Sq, Sk)
    if causal:
        ok &= (rel >= 0)[None, None]
    if window is not None:
        ok &= (rel < window)[None, None]
    s = jnp.where(ok, s, NEG_INF)
    m = jnp.max(s, axis=-1)                               # (B, H, Sq)
    p = jnp.exp(s - m[..., None])
    # rows with no valid key: make p exactly 0 so they contribute nothing
    p = jnp.where(ok, p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_attention(q, k, v, kv_mask=None, bias=None, scale: float = 1.0,
                   causal: bool = False, window: Optional[int] = None,
                   axis_name: str = "seq"):
    """Exact attention with K/V rotated around the `axis_name` ring.

    Must be called inside shard_map/pmap with `axis_name` bound. `bias`, if
    given, is the FULL-width additive bias for the local queries, shape
    broadcastable to (B, H, S_q_local, S_kv_global) — it is sliced per ring
    step (biases are cheap to materialize per q shard; K/V are not).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, Sq, D = q.shape
    Sk = k.shape[2]

    q_pos = idx * Sq + jnp.arange(Sq)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), bool)

    m0 = jnp.full((B, H, Sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Sq), jnp.float32)
    acc0 = jnp.zeros((B, H, Sq, D), jnp.float32)
    # constants are 'replicated' under shard_map's varying-axis typing, but
    # the scan carry becomes device-varying after one step — mark them so
    # (inputs that are already sharded along the axis are varying and must
    # not be pvary'd again)
    def _vary(x):
        vma = getattr(jax.typeof(x), "vma", frozenset())
        return x if axis_name in vma else jax.lax.pvary(x, axis_name)
    kv_mask, m0, l0, acc0 = (_vary(x) for x in (kv_mask, m0, l0, acc0))
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, i):
        k_blk, v_blk, mask_blk, m, l, acc = carry
        src = (idx - i) % n                    # shard the block came from
        k_pos = src * Sk + jnp.arange(Sk)
        bias_blk = None
        if bias is not None:
            bias_blk = jax.lax.dynamic_slice_in_dim(
                jnp.broadcast_to(bias, bias.shape[:-1] + (n * Sk,)),
                src * Sk, Sk, axis=-1)
        acc_i, m_i, l_i = _block(q, k_blk, v_blk, mask_blk, bias_blk,
                                 q_pos, k_pos, scale, causal, window)
        m_new = jnp.maximum(m, m_i)
        a = jnp.exp(m - m_new)
        b = jnp.exp(m_i - m_new)
        acc = acc * a[..., None] + acc_i * b[..., None]
        l = l * a + l_i * b
        # rotate: send to the next device so everyone sees every block once
        k_blk, v_blk, mask_blk = jax.lax.ppermute(
            (k_blk, v_blk, mask_blk), axis_name, perm)
        return (k_blk, v_blk, mask_blk, m_new, l, acc), None

    (_, _, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_mask, m0, l0, acc0), jnp.arange(n))
    l_safe = jnp.where(l == 0, 1.0, l)
    return (acc / l_safe[..., None]).astype(q.dtype)
