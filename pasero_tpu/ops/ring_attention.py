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
import numpy as np
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.checkpoint, static_argnums=(7, 8, 9, 10))
def _block(q, k, v, kv_mask, bias_blk, q_pos, k_pos, scale, causal, window,
           dropout_rate=0.0, dropout_rng=None):
    """Unnormalized attention of the local Q block against one K/V block.

    Returns (acc, m, l): acc = sum_j p_ij v_j with p = exp(s - m), row max m,
    row sum l — the flash-attention partial triple for later merging.

    Attention dropout (``dropout_rate`` with a per-(q-block, k-block) keyed
    ``dropout_rng``) is applied to the p @ V accumulation only, NOT to the
    row sum l: single-device attention dropout acts on the *normalized*
    softmax weights (dropout(softmax(s)) @ V), so the denominator must stay
    undropped for the merged ring result to match it exactly in
    distribution.
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
    if dropout_rate and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = p * keep / (1.0 - dropout_rate)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_attention(q, k, v, kv_mask=None, bias=None, scale: float = 1.0,
                   causal: bool = False, window: Optional[int] = None,
                   axis_name: str = "seq", dropout_rate: float = 0.0,
                   dropout_rng=None):
    """Exact attention with K/V rotated around the `axis_name` ring.

    Must be called inside shard_map/pmap with `axis_name` bound. `bias`, if
    given, is the FULL-width additive bias for the local queries, shape
    broadcastable to (B, H, S_q_local, S_kv_global) — it is sliced per ring
    step (biases are cheap to materialize per q shard; K/V are not).

    ``dropout_rate``/``dropout_rng`` apply attention-weight dropout: the
    key is folded on the (query-shard, key-shard) pair, so every block of
    the virtual (S, S) weight matrix draws an independent mask exactly
    once regardless of ring size — equivalent in distribution to
    single-device dropout(softmax(s)) @ V (the reference's training
    regularization, modules.py attention_dropout).
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
    if dropout_rng is not None:
        dropout_rng = _vary(dropout_rng)  # folded with the varying shard id
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
        blk_rng = None
        if dropout_rate and dropout_rng is not None:
            blk_rng = jax.random.fold_in(dropout_rng, idx * n + src)
        acc_i, m_i, l_i = _block(q, k_blk, v_blk, mask_blk, bias_blk,
                                 q_pos, k_pos, scale, causal, window,
                                 dropout_rate, blk_rng)
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


# ---------------------------------------------------------------------------
# zigzag layout: balanced causal work
# ---------------------------------------------------------------------------

def zigzag_indices(S: int, n: int) -> np.ndarray:
    """Permutation placing chunk pair (i, 2n-1-i) on device i.

    With contiguous shards, causal attention gives device i work ∝ i+1 and
    the ring waits for the last device; pairing a head chunk with its mirror
    tail chunk makes every device's useful work equal (~(2n+1) half-blocks),
    so causal CP attention computes ~half the block products of the
    contiguous layout."""
    C = S // (2 * n)
    order = []
    for i in range(n):
        order.append(np.arange(i * C, (i + 1) * C))
        order.append(np.arange((2 * n - 1 - i) * C, (2 * n - i) * C))
    return np.concatenate(order)


def _zig_positions(idx, n, C):
    """Global positions of the local (head, tail) chunk pair on device idx."""
    head = idx * C + jnp.arange(C)
    tail = (2 * n - 1 - idx) * C + jnp.arange(C)
    return head, tail


def _zero_stats(B, H, Sq, D):
    return (jnp.zeros((B, H, Sq, D), jnp.float32),
            jnp.full((B, H, Sq), NEG_INF, jnp.float32),
            jnp.zeros((B, H, Sq), jnp.float32))


def _merge(acc, m, l, acc_i, m_i, l_i):
    m_new = jnp.maximum(m, m_i)
    a = jnp.exp(m - m_new)
    b = jnp.exp(m_i - m_new)
    return acc * a[..., None] + acc_i * b[..., None], m_new, l * a + l_i * b


def zigzag_ring_attention(q, k, v, kv_mask=None, scale: float = 1.0,
                          window=None, axis_name: str = "seq",
                          dropout_rate: float = 0.0, dropout_rng=None):
    """Causal ring attention over zigzag-laid-out sequence shards.

    Inputs are the PERMUTED shards (zigzag_indices applied to the sequence
    axis before shard_map): q/k/v (B, H|Hkv, 2C, D) where the first C rows
    are head chunk `idx` and the last C rows the mirror tail chunk.
    Per ring step only the half-block products that causality allows are
    computed (head x head gated on src<=idx, tail x head always, tail x tail
    gated on src>=idx; head x tail is never needed), so the causal work is
    both halved and balanced across devices."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, S2, D = q.shape
    C = S2 // 2
    if kv_mask is None:
        kv_mask = jnp.ones((B, S2), bool)

    q_h, q_t = q[:, :, :C], q[:, :, C:]
    qh_pos, qt_pos = _zig_positions(idx, n, C)

    def stats(qc, kc, vc, mask_c, q_pos, k_pos, q_chunk, k_chunk):
        # dropout key per (global q chunk, global k chunk) pair: each block
        # of the virtual (S, S) weight matrix draws its mask exactly once
        blk_rng = None
        if dropout_rate and dropout_rng is not None:
            blk_rng = jax.random.fold_in(dropout_rng,
                                         q_chunk * 2 * n + k_chunk)
        return _block(qc, kc, vc, mask_c, None, q_pos, k_pos, scale, True,
                      window, dropout_rate, blk_rng)

    init = (_zero_stats(B, H, C, D), _zero_stats(B, H, C, D))
    carry0 = (k, v, kv_mask) + init

    def _vary(x):
        vma = getattr(jax.typeof(x), "vma", frozenset())
        return x if axis_name in vma else jax.lax.pvary(x, axis_name)
    carry0 = jax.tree_util.tree_map(_vary, carry0)
    if dropout_rng is not None:
        dropout_rng = _vary(dropout_rng)  # folded with the varying shard id
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, i):
        k_blk, v_blk, mask_blk, head_stats, tail_stats = carry
        src = (idx - i) % n
        kh, kt = k_blk[:, :, :C], k_blk[:, :, C:]
        vh, vt = v_blk[:, :, :C], v_blk[:, :, C:]
        mh, mt = mask_blk[:, :C], mask_blk[:, C:]
        kh_pos, kt_pos = _zig_positions(src, n, C)

        # global chunk ids for dropout keying: head of device d is chunk d,
        # tail of device d is chunk 2n-1-d
        q_head_id, q_tail_id = idx, 2 * n - 1 - idx
        k_head_id, k_tail_id = src, 2 * n - 1 - src
        # head x head: only key chunks src <= idx are in the past
        head_stats = jax.lax.cond(
            src <= idx,
            lambda hs: _merge(*hs, *stats(q_h, kh, vh, mh, qh_pos, kh_pos,
                                          q_head_id, k_head_id)),
            lambda hs: hs, head_stats)
        # tail x head: every head chunk precedes every tail chunk
        tail_stats = _merge(*tail_stats,
                            *stats(q_t, kh, vh, mh, qt_pos, kh_pos,
                                   q_tail_id, k_head_id))
        # tail x tail: tail chunk of src is in the past iff src >= idx
        tail_stats = jax.lax.cond(
            src >= idx,
            lambda ts: _merge(*ts, *stats(q_t, kt, vt, mt, qt_pos, kt_pos,
                                          q_tail_id, k_tail_id)),
            lambda ts: ts, tail_stats)
        k_blk, v_blk, mask_blk = jax.lax.ppermute(
            (k_blk, v_blk, mask_blk), axis_name, perm)
        return (k_blk, v_blk, mask_blk, head_stats, tail_stats), None

    (_, _, _, (acc_h, m_h, l_h), (acc_t, m_t, l_t)), _ = jax.lax.scan(
        step, carry0, jnp.arange(n))
    out_h = acc_h / jnp.where(l_h == 0, 1.0, l_h)[..., None]
    out_t = acc_t / jnp.where(l_t == 0, 1.0, l_t)[..., None]
    return jnp.concatenate([out_h, out_t], axis=2).astype(q.dtype)
