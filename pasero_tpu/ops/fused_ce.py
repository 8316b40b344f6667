"""Flash cross-entropy: the vocab-head loss without materialized logits.

The vocab head is the single largest HBM consumer of a transformer-base
training step (reference computes it as a full ``lm_head`` matmul +
``F.cross_entropy`` over fp32 ``(B, T, V)`` logits — models/transformer.py
decoder head + training loss in naver/pasero).  Measured on v5e: the four
logits fusions cost ~14 of 58 device-ms against an ~8.1 ms MXU floor
(three 537-GFLOP matmuls), i.e. ~6 ms of pure HBM traffic on the 2.1 GB
fp32 logits tensor.  An XLA-level chunked rewrite (`chunked_cross_entropy`)
cannot recover it: each chunk's logits still materialize in HBM on the
forward AND the rematerialized backward, measured 4-6% *slower* end-to-end.

This Pallas kernel keeps every logits tile in VMEM only:

- forward: grid ``(row-block, vocab-block)``, online logsumexp state in
  VMEM scratch across the vocab axis (the flash-attention recurrence with
  vocab in place of keys); emits per-row ``lse``, target logit and
  logits-sum (for label smoothing) — O(N) bytes instead of O(N·V).
- backward: one fused kernel per ``(row-block, vocab-block)`` tile does
  recompute-matmul -> softmax -> both gradient matmuls back to back with
  the ``(BN, BV)`` probability tile never leaving VMEM:
  ``dx += dlogits @ W^T`` accumulates in VMEM scratch over the vocab axis,
  ``dW`` partials (one per row block) are written once and reduced outside.
  Cost: one extra logits matmul (the recompute); saved: every HBM round
  trip of logits/dlogits.

Row/vocab tails are handled by padding rows (weight 0) and masking padded
vocab columns to -inf in-kernel, so any (B*T, E, V) works.  Falls back to
interpreter mode off-TPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blocks(N: int, E: int, V: int):
    """(BN, BV) sized so the fp32 logits tile + fp32 dx scratch + operand
    blocks stay well under VMEM: BN*BV*4 + BN*E*(4+2) + E*BV*6 <~ 12 MB.
    Large BN amortizes the full-W sweep (N/BN * 2EV bytes of HBM)."""
    BN = 2048
    while BN > 8 and BN // 2 >= N:
        BN //= 2
    BV = 512
    while BV > 128 and BV // 2 >= V:
        BV //= 2
    # keep the worst tile (logits + dx scratch + x + W blocks) under ~12MB
    while BN > 256 and BN * BV * 4 + BN * E * 6 + E * BV * 6 > 12 * 2**20:
        BN //= 2
    return BN, BV


def _fwd_kernel(t_ref, x_ref, w_ref, lse_ref, tgt_ref, sum_ref,
                m_scr, l_scr, t_scr, s_scr, *, BV, V, nvb):
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        t_scr[...] = jnp.zeros_like(t_scr)
        s_scr[...] = jnp.zeros_like(s_scr)

    s = jax.lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = col < V
    sv = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(sv, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * alpha + jnp.sum(
        jnp.exp(sv - m_new), axis=-1, keepdims=True)
    hit = col == t_ref[0][:, None]
    t_scr[...] += jnp.sum(jnp.where(hit, s, 0.0), axis=-1, keepdims=True)
    s_scr[...] += jnp.sum(jnp.where(valid, s, 0.0), axis=-1, keepdims=True)

    @pl.when(vb == nvb - 1)
    def _finalize():
        lse_ref[0] = (m_scr[...] + jnp.log(l_scr[...]))[:, 0]
        tgt_ref[0] = t_scr[...][:, 0]
        sum_ref[0] = s_scr[...][:, 0]


def _bwd_kernel(t_ref, x_ref, w_ref, lse_ref, c1_ref, c2_ref, c3_ref,
                dx_ref, dwp_ref, dx_scr, *, BV, V, nvb):
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _init():
        dx_scr[...] = jnp.zeros_like(dx_scr)

    x = x_ref[...]
    s = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = col < V
    p = jnp.exp(s - lse_ref[0][:, None])          # exp(-inf-ish) pads -> ~0
    hit = col == t_ref[0][:, None]
    dl = c1_ref[0][:, None] * p
    dl = jnp.where(hit, dl - c2_ref[0][:, None], dl)
    dl = jnp.where(valid, dl - c3_ref[0][:, None], 0.0)
    dl = dl.astype(x.dtype)
    # both gradient matmuls off the VMEM-resident dl tile
    dx_scr[...] += jax.lax.dot_general(
        dl, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwp_ref[0] = jax.lax.dot_general(
        x, dl, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwp_ref.dtype)

    @pl.when(vb == nvb - 1)
    def _finalize():
        dx_ref[...] = dx_scr[...].astype(dx_ref.dtype)


def _bwd_dx_kernel(t_ref, x_ref, w_ref, lse_ref, c1_ref, c2_ref, c3_ref,
                   dx_ref, dx_scr, *, BV, V, nvb):
    """dx only, grid (row-block, vocab-block): dx accumulates in VMEM
    scratch across the inner vocab sweep (no dW partials emitted)."""
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _init():
        dx_scr[...] = jnp.zeros_like(dx_scr)

    x = x_ref[...]
    s = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = col < V
    p = jnp.exp(s - lse_ref[0][:, None])
    hit = col == t_ref[0][:, None]
    dl = c1_ref[0][:, None] * p
    dl = jnp.where(hit, dl - c2_ref[0][:, None], dl)
    dl = jnp.where(valid, dl - c3_ref[0][:, None], 0.0)
    dx_scr[...] += jax.lax.dot_general(
        dl.astype(x.dtype), w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(vb == nvb - 1)
    def _finalize():
        dx_ref[...] = dx_scr[...].astype(dx_ref.dtype)


def _bwd_dw_kernel(t_ref, x_ref, w_ref, lse_ref, c1_ref, c2_ref, c3_ref,
                   dw_ref, dw_scr, *, BV, V, nnb):
    """dW only, grid (vocab-block, row-block): the (E, BV) dW block stays
    resident in VMEM scratch across the inner row sweep and is written
    exactly once — no (N/BN, E, V) partials in HBM (at large E those cost
    gigabytes; the fused kernel keeps them only for small E)."""
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _init():
        dw_scr[...] = jnp.zeros_like(dw_scr)

    vb = pl.program_id(0)
    x = x_ref[...]
    s = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = col < V
    p = jnp.exp(s - lse_ref[0][:, None])
    hit = col == t_ref[0][:, None]
    dl = c1_ref[0][:, None] * p
    dl = jnp.where(hit, dl - c2_ref[0][:, None], dl)
    dl = jnp.where(valid, dl - c3_ref[0][:, None], 0.0)
    dw_scr[...] += jax.lax.dot_general(
        x, dl.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(nb == nnb - 1)
    def _finalize():
        dw_ref[...] = dw_scr[...].astype(dw_ref.dtype)


def _pad_rows(a, Np):
    return jnp.pad(a, [(0, Np - a.shape[0])] + [(0, 0)] * (a.ndim - 1))


def _fwd(x, w, targets):
    N, E = x.shape
    V = w.shape[1]
    BN, BV = _pick_blocks(N, E, V)
    Np, Vp = _ceil_to(N, BN), _ceil_to(V, BV)
    nvb = Vp // BV
    xp = _pad_rows(x, Np)
    wp = jnp.pad(w, ((0, 0), (0, Vp - V))).astype(x.dtype)
    tp = _pad_rows(targets.astype(jnp.int32), Np)[None]

    kernel = functools.partial(_fwd_kernel, BV=BV, V=V, nvb=nvb)
    lse, tgt, suml = pl.pallas_call(
        kernel,
        grid=(Np // BN, nvb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            pl.BlockSpec((E, BV), lambda nb, vb: (0, vb)),
        ],
        out_specs=(
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BN, 1), jnp.float32)] * 4,
    )(tp, xp, wp)
    return lse[0, :N], tgt[0, :N], suml[0, :N]


def _bwd_matmuls(x, w, targets, lse, c1, c2, c3):
    N, E = x.shape
    V = w.shape[1]
    BN, BV = _pick_blocks(N, E, V)
    Np, Vp = _ceil_to(N, BN), _ceil_to(V, BV)
    nnb, nvb = Np // BN, Vp // BV
    xp = _pad_rows(x, Np)
    wp = jnp.pad(w, ((0, 0), (0, Vp - V))).astype(x.dtype)
    tp = _pad_rows(targets.astype(jnp.int32), Np)[None]
    vecs = [_pad_rows(v.astype(jnp.float32), Np)[None]
            for v in (lse, c1, c2, c3)]

    # at large E the fused kernel's (nnb, E, V) dW partials cost gigabytes
    # of HBM (and its dx scratch forces tiny BN, multiplying nnb): split
    # into a dx-only and a block-resident dW kernel instead — one extra
    # logits recompute, no partials (llama_1b at 16k tokens VMEM-OOMed
    # the fused form)
    if (nnb * E * Vp * 2 > 2**30) or (E * 6 * 1024 >= 12 * 2**20):
        return _bwd_split(xp, wp, tp, vecs, N, E, V, BN, BV, nnb, nvb)

    kernel = functools.partial(_bwd_kernel, BV=BV, V=V, nvb=nvb)
    dx, dwp = pl.pallas_call(
        kernel,
        grid=(nnb, nvb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            pl.BlockSpec((E, BV), lambda nb, vb: (0, vb)),
        ] + [pl.BlockSpec((1, BN), lambda nb, vb: (0, nb))] * 4,
        out_specs=(
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            pl.BlockSpec((1, E, BV), lambda nb, vb: (nb, 0, vb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, E), x.dtype),
            # per-row-block dW partials, summed (fp32) by the caller; bf16
            # partials halve their HBM cost and add noise well under the
            # bf16 dl-matmul rounding already present
            jax.ShapeDtypeStruct((nnb, E, Vp), x.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((BN, E), jnp.float32)],
    )(tp, xp, wp, *vecs)
    dw = jnp.sum(dwp.astype(jnp.float32), axis=0)[:, :V]
    return dx[:N], dw


def _bwd_split(xp, wp, tp, vecs, N, E, V, BN, BV, nnb, nvb):
    Np, Vp = nnb * BN, nvb * BV
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, BV=BV, V=V, nvb=nvb),
        grid=(nnb, nvb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            pl.BlockSpec((E, BV), lambda nb, vb: (0, vb)),
        ] + [pl.BlockSpec((1, BN), lambda nb, vb: (0, nb))] * 4,
        out_specs=pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, E), xp.dtype),
        scratch_shapes=[pltpu.VMEM((BN, E), jnp.float32)],
    )(tp, xp, wp, *vecs)
    # the dW kernel holds scratch + staged out + w blocks of E*BV each in
    # VMEM — size its own vocab block to keep E*BV*16 bytes under ~8 MB
    BVw = max(128, min(BV, (8 * 2**20 // (E * 16)) // 128 * 128))
    Vpw = _ceil_to(V, BVw)
    nvbw = Vpw // BVw
    wpw = wp[:, :Vpw] if Vpw <= wp.shape[1] else jnp.pad(
        wp, ((0, 0), (0, Vpw - wp.shape[1])))
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, BV=BVw, V=V, nnb=nnb),
        grid=(nvbw, nnb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, BN), lambda vb, nb: (0, nb)),
            pl.BlockSpec((BN, E), lambda vb, nb: (nb, 0)),
            pl.BlockSpec((E, BVw), lambda vb, nb: (0, vb)),
        ] + [pl.BlockSpec((1, BN), lambda vb, nb: (0, nb))] * 4,
        out_specs=pl.BlockSpec((E, BVw), lambda vb, nb: (0, vb)),
        out_shape=jax.ShapeDtypeStruct((E, Vpw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((E, BVw), jnp.float32)],
    )(tp, xp, wpw, *vecs)
    return dx[:N], dw[:, :V]


def _argmax_kernel(x_ref, w_ref, tok_ref, lp_ref, m_scr, l_scr, i_scr,
                   *, BV, V, nvb):
    """Greedy vocab head: online max/argmax/sumexp across the vocab sweep —
    the (BN, BV) logits tile never leaves VMEM (decode-side analog of
    _fwd_kernel; emits the argmax token + its log-probability)."""
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        i_scr[...] = jnp.zeros_like(i_scr)

    s = jax.lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    _online_argmax(s, col, V, m_scr, l_scr, i_scr)

    @pl.when(vb == nvb - 1)
    def _finalize():
        tok_ref[0] = i_scr[...][:, 0]
        # logprob(argmax) = max - lse = -log(sumexp shifted by the max)
        lp_ref[0] = -jnp.log(l_scr[...])[:, 0]


def _online_argmax(s, col, V, m_scr, l_scr, i_scr):
    """One vocab-block step of the online max/argmax/sumexp recurrence
    (shared by the float and int8 argmax kernels)."""
    sv = jnp.where(col < V, s, NEG_INF)
    m_prev = m_scr[...]
    bm = jnp.max(sv, axis=-1, keepdims=True)
    bcol = jnp.min(jnp.where(sv == bm, col, jnp.iinfo(jnp.int32).max),
                   axis=-1, keepdims=True)
    i_scr[...] = jnp.where(bm > m_prev, bcol, i_scr[...])
    m_new = jnp.maximum(m_prev, bm)
    l_scr[...] = (l_scr[...] * jnp.exp(m_prev - m_new)
                  + jnp.sum(jnp.exp(sv - m_new), axis=-1, keepdims=True))
    m_scr[...] = m_new


def _argmax_kernel_q8(x_ref, w_ref, s_ref, tok_ref, lp_ref, m_scr, l_scr,
                      i_scr, *, BV, V, nvb, row_quant):
    """int8 greedy vocab head (--quantize int8): the weight block is read
    from HBM as int8 and dequantized in VMEM; ``row_quant`` selects the
    (V, E) row-major table orientation (tied embeddings) vs (E, V)
    column-quantized projection kernels."""
    vb = pl.program_id(1)

    @pl.when(vb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        i_scr[...] = jnp.zeros_like(i_scr)

    w = w_ref[...].astype(x_ref.dtype)
    dims = ((1,), (1,)) if row_quant else ((1,), (0,))
    s = jax.lax.dot_general(x_ref[...], w, (dims, ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * s_ref[...]                                   # per-logit scale
    col = vb * BV + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    _online_argmax(s, col, V, m_scr, l_scr, i_scr)

    @pl.when(vb == nvb - 1)
    def _finalize():
        tok_ref[0] = i_scr[...][:, 0]
        lp_ref[0] = -jnp.log(l_scr[...])[:, 0]


def _fused_head_argmax_q8(x, t):
    from .quantize import QTensor  # noqa: F401 (type documented)
    row_quant = t.scale.shape[1] == 1          # (V, 1) table vs (1, V) kernel
    if row_quant:
        V, E = t.q.shape
    else:
        E, V = t.q.shape
    N = x.shape[0]
    BN, BV = _pick_blocks(N, E, V)
    Np, Vp = _ceil_to(N, BN), _ceil_to(V, BV)
    nvb = Vp // BV
    xp = _pad_rows(x, Np)
    pad_v = Vp - V
    qp = jnp.pad(t.q, ((0, pad_v), (0, 0)) if row_quant
                 else ((0, 0), (0, pad_v)))
    sp = jnp.pad(t.scale.reshape(1, -1), ((0, 0), (0, pad_v)))

    w_spec = (pl.BlockSpec((BV, E), lambda nb, vb: (vb, 0)) if row_quant
              else pl.BlockSpec((E, BV), lambda nb, vb: (0, vb)))
    tok, lp = pl.pallas_call(
        functools.partial(_argmax_kernel_q8, BV=BV, V=V, nvb=nvb,
                          row_quant=row_quant),
        grid=(Np // BN, nvb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            w_spec,
            pl.BlockSpec((1, BV), lambda nb, vb: (0, vb)),
        ],
        out_specs=(
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BN, 1), jnp.float32),
                        pltpu.VMEM((BN, 1), jnp.float32),
                        pltpu.VMEM((BN, 1), jnp.int32)],
    )(xp, qp, sp)
    return tok[0, :N], lp[0, :N]


def fused_head_argmax(x, kernel):
    """Greedy decode head: ``argmax(x @ kernel)`` + its log-probability,
    with the (N, V) logits never materialized in HBM.

    The per-step vocab head is the last fp32 (B, V) round-trip of
    weight-bound generation (reference computes full logits + softmax every
    step, pasero/decoding.py:1005-1222).  x: (N, E); kernel: (E, V), or a
    QTensor (int8 weight-only decode, ops/quantize.py) in either
    orientation.  Returns (tokens (N,) int32, logprobs (N,) f32) —
    bit-identical to ``argmax`` / ``log_softmax`` on the (dequantized)
    materialized logits (first occurrence wins ties).
    """
    from .quantize import QTensor
    if isinstance(kernel, QTensor):
        return _fused_head_argmax_q8(x, kernel)
    N, E = x.shape
    V = kernel.shape[1]
    BN, BV = _pick_blocks(N, E, V)
    Np, Vp = _ceil_to(N, BN), _ceil_to(V, BV)
    nvb = Vp // BV
    xp = _pad_rows(x, Np)
    wp = jnp.pad(kernel, ((0, 0), (0, Vp - V))).astype(x.dtype)

    tok, lp = pl.pallas_call(
        functools.partial(_argmax_kernel, BV=BV, V=V, nvb=nvb),
        grid=(Np // BN, nvb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((BN, E), lambda nb, vb: (nb, 0)),
            pl.BlockSpec((E, BV), lambda nb, vb: (0, vb)),
        ],
        out_specs=(
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
            pl.BlockSpec((1, BN), lambda nb, vb: (0, nb)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BN, 1), jnp.float32),
                        pltpu.VMEM((BN, 1), jnp.float32),
                        pltpu.VMEM((BN, 1), jnp.int32)],
    )(xp, wp)
    return tok[0, :N], lp[0, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_cross_entropy(x, kernel, targets, weights, label_smoothing=0.0):
    """Summed CE + label smoothing over ``x @ kernel`` logits, flash-style.

    x: (N, E) activations (bf16/f32); kernel: (E, V); targets: (N,) int;
    weights: (N,) f32 (0 masks a row).  Returns ``(loss_sum, nll_sum,
    weight_sum)`` — the `cross_entropy_loss` contract, with the (N, V)
    logits never materialized in HBM in either direction.
    """
    out, _ = _fce_fwd(x, kernel, targets, weights, label_smoothing)
    return out


def _fce_fwd(x, kernel, targets, weights, label_smoothing):
    lse, tgt, suml = _fwd(x, kernel.astype(x.dtype), targets)
    V = kernel.shape[1]
    w = weights.astype(jnp.float32)
    nll = lse - tgt
    if label_smoothing > 0:
        loss = ((1.0 - label_smoothing) * nll
                + label_smoothing * (lse - suml / V))
    else:
        loss = nll
    out = (jnp.sum(loss * w), jnp.sum(nll * w), jnp.sum(w))
    return out, (x, kernel, targets, w, lse)


def _fce_bwd(label_smoothing, residuals, g):
    x, kernel, targets, w, lse = residuals
    gl, gn, _ = g      # cotangents for (loss_sum, nll_sum, weight_sum)
    V = kernel.shape[1]
    ls = label_smoothing
    # loss_row = w*[(1-ls)(lse-tgt) + ls(lse - suml/V)]; nll_row = w*(lse-tgt)
    # dlogits = w*[(a+b)*softmax - a*onehot - b/V], a = gl*(1-ls)+gn, b = gl*ls
    a = gl * (1.0 - ls) + gn
    b = gl * ls
    c1 = w * (a + b)
    c2 = w * a
    c3 = w * (b / V)
    dx, dw = _bwd_matmuls(x, kernel.astype(x.dtype), targets, lse,
                          c1, c2, c3)
    return dx.astype(x.dtype), dw.astype(kernel.dtype), None, None


fused_cross_entropy.defvjp(_fce_fwd, _fce_bwd)
