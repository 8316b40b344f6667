"""Flash attention Pallas kernel for TPU (forward + backward).

The reference relies on the external CUDA flash-attn package
(pasero/models/modules.py:20-24, 696-705); this is the TPU-native equivalent:
a blockwise streaming-softmax kernel that never materializes the (Sq, Sk)
score matrix in HBM, with

- causal masking and sliding windows (Mistral, modules.py:698) computed from
  absolute block indices,
- additive bias support (ALiBi / T5 relative buckets, modules.py:1028-1190),
- GQA/MQA by indexing the KV head as h // group in the block index maps,
- a custom VJP whose backward recomputes probabilities blockwise from the
  saved logsumexp (flash-attention-2 style dq / dk / dv kernels).

Shapes: q (B, H, Sq, D), k/v (B, Hkv, Sk, D). The public wrapper pads D to a
multiple of 128 (lane width) and sequence lengths to the block size; padded
key slots are masked via kv_mask, padded query rows are sliced off.

Two kernel families, selected by the K/V VMEM footprint:
- resident: K/V staged whole in VMEM per (batch*head) program with an
  in-kernel fori_loop over key blocks (fastest up to ~16k tokens);
- streaming: K/V (and the bias) blocked through a third grid axis with the
  online-softmax state in VMEM scratch — unbounded sequence length,
  double-buffered HBM streaming (validated fwd+bwd at 32k on a v5e chip).

Learned relative-position (T5) bias has a dedicated in-kernel path
(``t5_bias=T5Bias(table, ...)``): the bucket id is computed from the block
position iotas and gathered from the (num_buckets, H) table via a one-hot
matmul inside every kernel, and the backward accumulates the table
gradient directly — no O(Sq*Sk) bias tensor exists in either direction,
at any sequence length.  (A *materialized* bias still works through
``bias=`` for arbitrary patterns; its dbias kernel stages (block_q, Sk)
strips and its gradient is O(Sq*Sk), so prefer t5_bias for T5 training.)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BLOCK_Q = 128
BLOCK_K = 128


def _env_int(name: str):
    import os
    v = os.environ.get(name)
    return int(v) if v else None


def _pick_blocks(Sq: int, Sk: int, D: int):
    """256x256 blocks won the on-chip sweep (scripts/bench_flash.py, v5e:
    at S=2048 fwd+bwd they beat both the old grow-bk-to-2048 heuristic by
    1.8x and XLA's fused softmax; at S=1024 they tie XLA) — large-enough
    MXU tiles without starving the double-buffer pipeline of VMEM.
    PASERO_FLASH_BQ/BK override for sweeps."""
    bq = _env_int("PASERO_FLASH_BQ") or 256
    bk = _env_int("PASERO_FLASH_BK") or 256
    return min(bq, max(Sq, 8)), min(bk, max(Sk, 8))


def _pick_bwd_blocks(Sq: int, Sk: int, D: int):
    """Backward block sizes (PASERO_FLASH_BWD_BQ/BK override)."""
    bq = _env_int("PASERO_FLASH_BWD_BQ") or 256
    bk = _env_int("PASERO_FLASH_BWD_BK") or 256
    return min(bq, max(Sq, 8)), min(bk, max(Sk, 8))

# set True to force the Pallas interpreter; on non-TPU backends (CPU tests,
# debug runs) the interpreter is used automatically
INTERPRET = False


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class T5Bias(struct.PyTreeNode):
    """In-kernel T5 relative-position bias: the (num_buckets, H) learned
    table plus the bucketing constants.  At long sequence lengths the
    materialized (H, Sq, Sk) bias (and its same-shaped gradient) is the
    flash kernels' only O(S^2) HBM tensor; computing the bucket from the
    block position iotas inside the kernel removes it entirely — forward
    AND backward (the gradient shrinks to (num_buckets, H)).  Assumes
    right-padded sequences (slot index == position), the training layout.

    A pytree whose bucketing constants are static metadata, so it can ride
    any traced call path (layer arguments, remat) like a plain bias array.
    """
    table: jax.Array           # (num_buckets, H) float32
    bidirectional: bool = struct.field(pytree_node=False, default=False)
    num_buckets: int = struct.field(pytree_node=False, default=32)
    max_distance: int = struct.field(pytree_node=False, default=128)


def _table_head_col(table_ref, h):
    """Column ``h`` of the in-VMEM (nb, H) table as an (nb, 1) vector.

    The whole table rides into every program ((nb, 1) column blocks are
    not lowerable: a block's trailing dims must be lane/sublane-aligned
    or equal to the array's — only enforced on real TPU, which is how
    the column-block form passed interpreter tests); the head select is
    a one-hot matmul since Mosaic has no dynamic lane indexing."""
    nb, H = table_ref.shape
    oh = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0) == h
          ).astype(jnp.float32)
    return jax.lax.dot_general(table_ref[...].astype(jnp.float32), oh,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _t5_tile(table_col, q_pos, k_pos, bidirectional: bool, nb: int,
             maxd: int):
    """Bias tile (BQ, BK) for one head from its (nb, 1) table column.

    Bucket math mirrors models/positional.py:t5_bucket exactly; the gather
    is a static unroll of per-bucket selects — everything stays a 2D
    (BQ, BK) vector (the one-hot-matmul formulation needs
    (BQ*BK, nb) <-> (BQ, BK) shape casts Mosaic cannot lower; TPU has no
    vector gather either way)."""
    bucket = _t5_bucket(q_pos, k_pos, bidirectional, nb, maxd)
    tile = jnp.zeros(bucket.shape, jnp.float32)
    for b in range(nb):                                       # static
        tile = tile + jnp.where(bucket == b, table_col[b, 0], 0.0)
    return tile


def _t5_bucket(q_pos, k_pos, bidirectional: bool, nb: int, maxd: int):
    """(BQ, BK) int32 bucket ids (models/positional.py:t5_bucket)."""
    rel = q_pos - k_pos
    n = -rel
    nb_eff = nb
    ret = jnp.zeros_like(n)
    if bidirectional:
        nb_eff = nb // 2
        ret = (n < 0).astype(jnp.int32) * nb_eff
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = nb_eff // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) / \
        math.log(maxd / max_exact)
    val_large = jnp.minimum(
        max_exact + (log_ratio * (nb_eff - max_exact)).astype(jnp.int32),
        nb_eff - 1)
    return ret + jnp.where(is_small, n, val_large)            # (BQ, BK)


def _bias_rows(bias, B: int, H: int):
    """(b0, h0, Sq, Sk) bias -> rows (b0*h0, Sq, Sk) + a bh -> row map.

    b0/h0 may be 1 (shared over batch / heads).  Indexing the unbroadcast
    rows from the kernel's BlockSpec instead of materializing a
    (B*H, Sq, Sk) broadcast keeps the HBM cost of a shared (ALiBi/T5) bias
    at O(H * Sq * Sk) regardless of batch size."""
    b0, h0 = bias.shape[0], bias.shape[1]
    rows = bias.reshape(b0 * h0, bias.shape[2], bias.shape[3])
    if b0 == 1 and h0 == 1:
        row = lambda bh: bh * 0
    elif b0 == 1:
        row = lambda bh: bh % H
    elif h0 == 1:
        row = lambda bh: bh // H
    else:
        row = lambda bh: bh
    return rows, row


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref, lse_ref, *,
                scale: float, causal: bool, window: Optional[int],
                num_k_blocks: int, block_k: int):
    """One (batch*head, q-block) program: stream over key blocks."""
    qb = pl.program_id(1)
    # MXU dots take the native (bf16) operands with fp32 accumulation —
    # fp32 matmul inputs run the MXU ~8x slower (measured: 71% of the 1B
    # training step was these kernels before the change); the softmax and
    # all state stay fp32, scale is applied to the fp32 scores
    q = q_ref[0]                                        # (BQ, D) native dtype
    block_q = q.shape[0]

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

    q_pos = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] > 0      # (BK,)
        ok = jnp.broadcast_to(valid[None, :], s.shape)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if causal:
        # key blocks strictly after this q block contribute nothing
        upper = jnp.minimum(num_k_blocks,
                            ((qb + 1) * block_q + block_k - 1) // block_k)
    else:
        upper = num_k_blocks
    m, l, acc = jax.lax.fori_loop(0, upper, body, (m, l, acc))

    l_safe = jnp.where(l == 0, 1.0, l)
    out_ref[0] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, 0]


def _pick_packed_blocks(Sq: int, Sk: int, group: int, bwd: bool = False):
    """Blocks for the group-packed kernels: the MXU M dimension is
    group*block_q rows, so aim for ~2048 packed rows per matmul (the
    on-chip sweep: per-iteration overhead dominates below ~1k rows).
    PASERO_FLASH_[BWD_]BQ/BK override."""
    pre = "PASERO_FLASH_BWD_" if bwd else "PASERO_FLASH_"
    bq = _env_int(pre + "BQ") or max(128, min(512, 2048 // group))
    bk = _env_int(pre + "BK") or 512
    bq, bk = min(bq, Sq), min(bk, Sk)
    while Sq % bq:
        bq //= 2
    while Sk % bk:
        bk //= 2
    return max(bq, 8), max(bk, 8)


def _fwd_packed_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref, *,
                       scale: float, causal: bool, window: Optional[int],
                       num_k_blocks: int, block_k: int):
    """Group-packed forward: one (batch*kv_head, q-block) program computes
    ALL ``group`` query heads that share this KV head in one matmul — the
    q block is (group, BQ, D) flattened to (group*BQ, D) rows, so the MXU
    sees M = group*BQ (2048 for llama-style GQA) instead of BQ, the K/V
    VMEM staging is amortized group-fold, and there are group-fold fewer
    programs.  All rows of the packed block share the same q positions
    (they are the same BQ-slice of every head), so causal/window masking
    is a plain per-row position compare, identical for each head."""
    qb = pl.program_id(1)
    group, block_q, D = q_ref.shape[1:]
    rows = group * block_q
    # bf16 MXU operands with fp32 accumulation; softmax state fp32
    q = q_ref[0].reshape(rows, D)

    m = jnp.full((group, block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((group, block_q, 1), jnp.float32)
    acc = jnp.zeros((rows, D), jnp.float32)

    def make_body(masked: bool):
        # interior causal blocks (every k strictly past the diagonal strip)
        # skip the position iotas/compares entirely; key padding rides as a
        # precomputed additive 0/-1e30 row, one broadcast add either way
        def body(kb, carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k), :]
            v = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).reshape(group, block_q, block_k) * scale
            s = s + mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, None, :]
            if masked:
                q_pos = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 2)
                ok = k_pos <= q_pos if causal else (k_pos == k_pos)
                if window is not None:
                    ok &= (q_pos - k_pos) < window
                s = jnp.where(ok, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = (acc * alpha.reshape(rows, 1) + jax.lax.dot_general(
                p.reshape(rows, block_k).astype(v.dtype), v,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
            return m_new, l_new, acc_new
        return body

    if causal:
        upper = jnp.minimum(num_k_blocks,
                            ((qb + 1) * block_q + block_k - 1) // block_k)
    else:
        upper = num_k_blocks
    if causal and window is None:
        # blocks fully below the diagonal need no causal mask
        plain = (qb * block_q + 1) // block_k
        carry = jax.lax.fori_loop(0, plain, make_body(False), (m, l, acc))
        m, l, acc = jax.lax.fori_loop(plain, upper, make_body(True), carry)
    else:
        m, l, acc = jax.lax.fori_loop(0, upper, make_body(causal or
                                                          window is not None),
                                      (m, l, acc))

    l_safe = jnp.where(l == 0, 1.0, l)
    out_ref[0] = (acc / l_safe.reshape(rows, 1)
                  ).reshape(group, block_q, D).astype(out_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe))[..., 0]


def _pad_penalty(kv_mask):
    """(B, 1, Sk) additive 0/-1e30 row the packed kernels add to scores —
    one broadcast add replaces the load/compare/broadcast/where chain of a
    boolean key mask on every inner block."""
    return jnp.where(kv_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]


def _fwd_packed(q, k, v, kv_mask, scale, causal, window):
    """Resident forward with the GQA group packed into the matmul M dim."""
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    block_q, block_k = _pick_packed_blocks(Sq, Sk, group)
    grid = (B * Hkv, Sq // block_q)
    common = dict(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fwd_packed_kernel, scale=scale, causal=causal, window=window,
        num_k_blocks=Sk // block_k, block_k=block_k)
    out, lse = pl.pallas_call(
        kernel, grid=grid, interpret=_interpret(),
        compiler_params=None if _interpret() else _PACKED_PARAMS,
        in_specs=[
            pl.BlockSpec((1, group, block_q, D),
                         lambda bh, qb: (bh, 0, qb, 0), **common),
            pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh, 0, 0), **common),
            pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh, 0, 0), **common),
            pl.BlockSpec((1, 1, Sk), lambda bh, qb: (bh // Hkv, 0, 0),
                         **common),
        ],
        out_specs=(
            pl.BlockSpec((1, group, block_q, D),
                         lambda bh, qb: (bh, 0, qb, 0), **common),
            pl.BlockSpec((1, group, block_q), lambda bh, qb: (bh, 0, qb),
                         **common),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Hkv, group, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B * Hkv, group, Sq), jnp.float32),
        ),
    )(q.reshape(B * Hkv, group, Sq, D),
      k.reshape(B * Hkv, Sk, D),
      v.reshape(B * Hkv, Sk, D),
      _pad_penalty(kv_mask))
    return out.reshape(B, H, Sq, D), lse.reshape(B, H, Sq)


def _fwd(q, k, v, kv_mask, bias, scale, causal, window):
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    if _use_streaming(Sk, D, k.dtype):
        return _fwd_stream(q, k, v, kv_mask, bias, scale, causal, window)
    if bias is None:
        return _fwd_packed(q, k, v, kv_mask, scale, causal, window)
    group = H // Hkv
    block_q, block_k = _pick_blocks(Sq, Sk, D)
    num_k_blocks = Sk // block_k
    grid = (B * H, Sq // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, qb: (bh, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sk), lambda bh, qb: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        q.reshape(B * H, Sq, D),
        k.reshape(B * Hkv, Sk, D),
        v.reshape(B * Hkv, Sk, D),
        jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                         ).reshape(B * H, 1, Sk).astype(jnp.int32),
    ]
    if bias is not None:
        bias_r, brow = _bias_rows(bias, B, H)
        in_specs.append(pl.BlockSpec((1, block_q, Sk),
                                     lambda bh, qb: (brow(bh), qb, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_r)
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, window=window,
            num_k_blocks=num_k_blocks, block_k=block_k)
    else:
        def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref):
            return _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, None, out_ref,
                               lse_ref, scale=scale, causal=causal,
                               window=window, num_k_blocks=num_k_blocks,
                               block_k=block_k)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Sq), jnp.float32),
        ),
    )(*args)
    return out.reshape(B, H, Sq, D), lse.reshape(B, H, Sq)


# ---------------------------------------------------------------------------
# streaming variants: K/V blocked through the grid (double-buffered from HBM)
# instead of staged whole in VMEM — lifts the resident kernels' ~16-32k
# sequence cap and blocks the bias to (block_q, block_k) tiles instead of a
# full-width strip.  Selected when the K/V VMEM footprint exceeds
# _STREAM_LIMIT bytes (PASERO_FLASH_STREAM_LIMIT overrides; 0 forces
# streaming, for tests).
# ---------------------------------------------------------------------------

_STREAM_LIMIT = 8 * 1024 * 1024


# the group-packed kernels stage (group*BQ, BK) fp32 score tiles plus whole
# K/V strips in VMEM; Mosaic's default 16 MB scoped-vmem cap is too small
# for the large-tile regime that amortizes per-iteration overhead, so raise
# it (v5e has 128 MB of VMEM per core)
_PACKED_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _use_streaming(Sk: int, D: int, dtype) -> bool:
    limit = _env_int("PASERO_FLASH_STREAM_LIMIT")
    if limit is None:
        limit = _STREAM_LIMIT
    return 2 * Sk * D * jnp.dtype(dtype).itemsize > limit


def _fwd_stream_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref,
                       lse_ref, m_scr, l_scr, acc_scr, *,
                       scale, causal, window, num_k_blocks, block_q, block_k,
                       t5=None):
    """One (batch*head, q-block, k-block) program; the online-softmax state
    lives in VMEM scratch across the innermost (k-block) grid axis.
    ``t5``: (bidirectional, num_buckets, max_distance) — bias_ref is then
    the head's (nb, 1) table column and the bias tile is computed in-kernel.
    """
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    # head-column select hoisted OUT of the pl.when body: program_id
    # inside a cond sub-jaxpr cannot be resolved by the CPU interpreter
    t5_col = (_table_head_col(bias_ref, pl.program_id(0)
                              % bias_ref.shape[1])
              if t5 is not None else None)

    @pl.when(kb == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # causal: key blocks strictly after this q block contribute nothing
    live = True
    if causal:
        live = kb * block_k <= (qb + 1) * block_q - 1
    if window is not None:
        live = live & ((kb + 1) * block_k - 1 > qb * block_q - window)

    @pl.when(live if not isinstance(live, bool) else True)
    def _update():
        # bf16 MXU operands, fp32 accumulation/softmax (see _fwd_kernel)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if t5 is not None:
            s = s + _t5_tile(t5_col, q_pos, k_pos, *t5)
        elif bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        ok = jnp.broadcast_to((mask_ref[0, 0] > 0)[None, :], s.shape)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        l_safe = jnp.where(l_scr[...] == 0, 1.0, l_scr[...])
        out_ref[0] = (acc_scr[...] / l_safe).astype(out_ref.dtype)
        lse_ref[0, 0] = (m_scr[...] + jnp.log(l_safe))[:, 0]


def _fwd_stream(q, k, v, kv_mask, bias, scale, causal, window, t5=None):
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    block_q, block_k = _pick_blocks(Sq, Sk, D)
    num_k_blocks = Sk // block_k
    grid = (B * H, Sq // block_q, num_k_blocks)
    common = dict(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, qb, kb: (bh, qb, 0), **common),
        pl.BlockSpec((1, block_k, D), lambda bh, qb, kb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, block_k, D), lambda bh, qb, kb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, 1, block_k), lambda bh, qb, kb: (bh, 0, kb), **common),
    ]
    args = [
        q.reshape(B * H, Sq, D),
        k.reshape(B * Hkv, Sk, D),
        v.reshape(B * Hkv, Sk, D),
        jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                         ).reshape(B * H, 1, Sk).astype(jnp.int32),
    ]
    kw = dict(scale=scale, causal=causal, window=window,
              num_k_blocks=num_k_blocks, block_q=block_q, block_k=block_k)
    if t5 is not None:
        # bias is the (nb, H) table; the whole (tiny) table rides into
        # every program and the head column is selected in-kernel
        # (_table_head_col — column blocks are not lane-lowerable)
        nb = bias.shape[0]
        in_specs.append(pl.BlockSpec((nb, H),
                                     lambda bh, qb, kb: (0, 0),
                                     **common))
        args.append(bias.astype(jnp.float32))
        kernel = functools.partial(_fwd_stream_kernel, **kw, t5=t5)
    elif bias is not None:
        bias_r, brow = _bias_rows(bias, B, H)
        in_specs.append(pl.BlockSpec((1, block_q, block_k),
                                     lambda bh, qb, kb: (brow(bh), qb, kb),
                                     **common))
        args.append(bias_r)
        kernel = functools.partial(_fwd_stream_kernel, **kw)
    else:
        def kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref,
                   m_scr, l_scr, acc_scr):
            return _fwd_stream_kernel(q_ref, k_ref, v_ref, mask_ref, None,
                                      out_ref, lse_ref, m_scr, l_scr, acc_scr,
                                      **kw)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, D), lambda bh, qb, kb: (bh, qb, 0),
                         **common),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb, kb: (bh, 0, qb),
                         **common),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Sq), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )(*args)
    return out.reshape(B, H, Sq, D), lse.reshape(B, H, Sq)


def _bwd_dq_stream_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, do_ref,
                          lse_ref, delta_ref, dq_ref, dq_scr, *,
                          scale, causal, window, num_k_blocks,
                          block_q, block_k, t5=None):
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    # head-column select hoisted OUT of the pl.when body: program_id
    # inside a cond sub-jaxpr cannot be resolved by the CPU interpreter
    t5_col = (_table_head_col(bias_ref, pl.program_id(0)
                              % bias_ref.shape[1])
              if t5 is not None else None)

    @pl.when(kb == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    live = True
    if causal:
        live = kb * block_k <= (qb + 1) * block_q - 1

    @pl.when(live if not isinstance(live, bool) else True)
    def _update():
        # bf16 MXU operands, fp32 accumulation (see _fwd_kernel)
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if t5 is not None:
            s = s + _t5_tile(t5_col, q_pos, k_pos, *t5)
        elif bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        ok = jnp.broadcast_to((mask_ref[0, 0] > 0)[None, :], s.shape)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_scr[...] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(kb == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_stream_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, do_ref,
                           lse_ref, delta_ref, dk_ref, dv_ref,
                           dk_scr, dv_scr, *, scale, causal, window,
                           num_q_blocks, block_q, block_k, t5=None):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    # head-column select hoisted OUT of the pl.when body: program_id
    # inside a cond sub-jaxpr cannot be resolved by the CPU interpreter
    t5_col = (_table_head_col(bias_ref, pl.program_id(0)
                              % bias_ref.shape[1])
              if t5 is not None else None)

    @pl.when(qb == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    live = True
    if causal:
        live = (qb + 1) * block_q - 1 >= kb * block_k

    @pl.when(live if not isinstance(live, bool) else True)
    def _update():
        # bf16 MXU operands, fp32 accumulation (see _fwd_kernel)
        k = k_ref[0]
        v = v_ref[0]
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if t5 is not None:
            s = s + _t5_tile(t5_col, q_pos, k_pos, *t5)
        elif bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        ok = jnp.broadcast_to((mask_ref[0, 0] > 0)[None, :], s.shape)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        pc = p.astype(do.dtype)
        dv_scr[...] += jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_scr[...] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(qb == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_stream(scale, causal, window, q, k, v, kv_mask, bias, do, lse, delta,
                t5=None):
    """dq/dk/dv with K/V/Q blocked through the grid (long sequences)."""
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    BQ, BK = _pick_bwd_blocks(Sq, Sk, D)
    while Sq % BQ:
        BQ //= 2
    while Sk % BK:
        BK //= 2
    common = dict(memory_space=pltpu.VMEM)

    mask_bh = jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                               ).reshape(B * H, 1, Sk).astype(jnp.int32)
    q_r = q.reshape(B * H, Sq, D)
    k_r = k.reshape(B * Hkv, Sk, D)
    v_r = v.reshape(B * Hkv, Sk, D)
    do_r = do.reshape(B * H, Sq, D)
    lse_r = lse.reshape(B * H, 1, Sq)
    delta_r = delta.reshape(B * H, 1, Sq)
    if t5 is not None:
        bias_r = bias.astype(jnp.float32)       # the (nb, H) table
        nb = bias.shape[0]
        table_spec = lambda order: pl.BlockSpec(
            (nb, H), (lambda bh, x, y: (0, 0)), **common)
    else:
        bias_r, brow = _bias_rows(bias, B, H) if bias is not None \
            else (None, None)

    # -- dq: grid (bh, q-block, k-block) -------------------------------------
    kw = dict(scale=scale, causal=causal, window=window,
              num_k_blocks=Sk // BK, block_q=BQ, block_k=BK)
    dq_specs = [
        pl.BlockSpec((1, BQ, D), lambda bh, qb, kb: (bh, qb, 0), **common),
        pl.BlockSpec((1, BK, D), lambda bh, qb, kb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, BK, D), lambda bh, qb, kb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, 1, BK), lambda bh, qb, kb: (bh, 0, kb), **common),
    ]
    dq_args = [q_r, k_r, v_r, mask_bh]
    if t5 is not None:
        dq_specs.append(table_spec("qk"))
        dq_args.append(bias_r)
        dq_kernel = functools.partial(_bwd_dq_stream_kernel, **kw, t5=t5)
    elif bias_r is not None:
        dq_specs.append(pl.BlockSpec((1, BQ, BK),
                                     lambda bh, qb, kb: (brow(bh), qb, kb),
                                     **common))
        dq_args.append(bias_r)
        dq_kernel = functools.partial(_bwd_dq_stream_kernel, **kw)
    else:
        def dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dq_scr):
            return _bwd_dq_stream_kernel(q_ref, k_ref, v_ref, mask_ref, None,
                                         do_ref, lse_ref, delta_ref, dq_ref,
                                         dq_scr, **kw)
    dq_specs += [
        pl.BlockSpec((1, BQ, D), lambda bh, qb, kb: (bh, qb, 0), **common),
        pl.BlockSpec((1, 1, BQ), lambda bh, qb, kb: (bh, 0, qb), **common),
        pl.BlockSpec((1, 1, BQ), lambda bh, qb, kb: (bh, 0, qb), **common),
    ]
    dq_args += [do_r, lse_r, delta_r]
    dq = pl.pallas_call(
        dq_kernel, grid=(B * H, Sq // BQ, Sk // BK), in_specs=dq_specs,
        interpret=_interpret(),
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qb, kb: (bh, qb, 0),
                               **common),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
    )(*dq_args)

    # -- dk/dv: grid (bh, k-block, q-block) ----------------------------------
    kw2 = dict(scale=scale, causal=causal, window=window,
               num_q_blocks=Sq // BQ, block_q=BQ, block_k=BK)
    dkv_specs = [
        pl.BlockSpec((1, BQ, D), lambda bh, kb, qb: (bh, qb, 0), **common),
        pl.BlockSpec((1, BK, D), lambda bh, kb, qb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, BK, D), lambda bh, kb, qb: (bh // group, kb, 0),
                     **common),
        pl.BlockSpec((1, 1, BK), lambda bh, kb, qb: (bh, 0, kb), **common),
    ]
    dkv_args = [q_r, k_r, v_r, mask_bh]
    if t5 is not None:
        dkv_specs.append(table_spec("kq"))
        dkv_args.append(bias_r)
        dkv_kernel = functools.partial(_bwd_dkv_stream_kernel, **kw2, t5=t5)
    elif bias_r is not None:
        dkv_specs.append(pl.BlockSpec((1, BQ, BK),
                                      lambda bh, kb, qb: (brow(bh), qb, kb),
                                      **common))
        dkv_args.append(bias_r)
        dkv_kernel = functools.partial(_bwd_dkv_stream_kernel, **kw2)
    else:
        def dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dk_scr, dv_scr):
            return _bwd_dkv_stream_kernel(q_ref, k_ref, v_ref, mask_ref, None,
                                          do_ref, lse_ref, delta_ref, dk_ref,
                                          dv_ref, dk_scr, dv_scr, **kw2)
    dkv_specs += [
        pl.BlockSpec((1, BQ, D), lambda bh, kb, qb: (bh, qb, 0), **common),
        pl.BlockSpec((1, 1, BQ), lambda bh, kb, qb: (bh, 0, qb), **common),
        pl.BlockSpec((1, 1, BQ), lambda bh, kb, qb: (bh, 0, qb), **common),
    ]
    dkv_args += [do_r, lse_r, delta_r]
    dk, dv = pl.pallas_call(
        dkv_kernel, grid=(B * H, Sk // BK, Sq // BQ), in_specs=dkv_specs,
        interpret=_interpret(),
        out_specs=(
            pl.BlockSpec((1, BK, D), lambda bh, kb, qb: (bh, kb, 0), **common),
            pl.BlockSpec((1, BK, D), lambda bh, kb, qb: (bh, kb, 0), **common),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Sk, D), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32),
                        pltpu.VMEM((BK, D), jnp.float32)],
    )(*dkv_args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, do_ref, lse_ref,
                   delta_ref, dq_ref, *, scale, causal, window,
                   num_k_blocks, block_k):
    qb = pl.program_id(1)
    # bf16 MXU operands, fp32 accumulation/softmax (see _fwd_kernel)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    block_q = q.shape[0]
    q_pos = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    dq = jnp.zeros(q.shape, jnp.float32)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] > 0
        ok = jnp.broadcast_to(valid[None, :], s.shape)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    if causal:
        upper = jnp.minimum(num_k_blocks, (qb + 1) * block_q // block_k + 1)
    else:
        upper = num_k_blocks
    dq = jax.lax.fori_loop(0, upper, body, dq)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, do_ref, lse_ref,
                    delta_ref, dk_ref, dv_ref, *, scale, causal, window,
                    num_q_blocks, block_q):
    kb = pl.program_id(1)
    # bf16 MXU operands, fp32 accumulation/softmax (see _fwd_kernel)
    k = k_ref[0]
    v = v_ref[0]
    block_k = k.shape[0]
    valid = mask_ref[0, 0] > 0                            # (BK,)
    k_pos = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        ok = jnp.broadcast_to(valid[None, :], s.shape)
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        pc = p.astype(do.dtype)
        dv_new = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        return dk_new, dv_new

    if causal:
        lower = kb * block_k // block_q
    else:
        lower = 0
    dk, dv = jax.lax.fori_loop(lower, num_q_blocks, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_packed_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                          delta_ref, dq_ref, *, scale, causal, window,
                          num_k_blocks, block_k):
    """Group-packed dq: same geometry as _fwd_packed_kernel (one program
    per (batch*kv_head, q-block) covering all query heads of the group)."""
    qb = pl.program_id(1)
    group, block_q, D = q_ref.shape[1:]
    rows = group * block_q
    q = q_ref[0].reshape(rows, D)
    do = do_ref[0].reshape(rows, D)
    lse = lse_ref[0][..., None]                  # (group, BQ, 1)
    delta = delta_ref[0][..., None]
    dq = jnp.zeros((rows, D), jnp.float32)

    def make_body(masked: bool):
        def body(kb, dq):
            k = k_ref[0, pl.ds(kb * block_k, block_k), :]
            v = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).reshape(group, block_q, block_k) * scale
            s = s + mask_ref[0, 0, pl.ds(kb * block_k, block_k)][None, None, :]
            if masked:
                q_pos = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 2)
                ok = k_pos <= q_pos if causal else (k_pos == k_pos)
                if window is not None:
                    ok &= (q_pos - k_pos) < window
                s = jnp.where(ok, s, NEG_INF)
            p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ).reshape(group, block_q, block_k)
            ds = ((p * (dp - delta)).reshape(rows, block_k)).astype(k.dtype)
            return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
        return body

    if causal:
        upper = jnp.minimum(num_k_blocks,
                            ((qb + 1) * block_q + block_k - 1) // block_k)
    else:
        upper = num_k_blocks
    if causal and window is None:
        plain = (qb * block_q + 1) // block_k
        dq = jax.lax.fori_loop(0, plain, make_body(False), dq)
        dq = jax.lax.fori_loop(plain, upper, make_body(True), dq)
    else:
        dq = jax.lax.fori_loop(0, upper, make_body(causal or
                                                   window is not None), dq)
    dq_ref[0] = (dq * scale).reshape(group, block_q, D).astype(dq_ref.dtype)


def _bwd_dkv_packed_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                           delta_ref, dk_ref, dv_ref, *, scale, causal,
                           window, num_q_blocks, block_q):
    """Group-packed dk/dv: one program per (batch*kv_head, k-block).  The
    GQA sum over the group's query heads happens INSIDE the dv/dk matmul
    contractions (M = group*BQ packed rows), so dk/dv come out at KV-head
    width directly — no (B, H, Sk, D) intermediate and no post-sum."""
    kb = pl.program_id(1)
    group = q_ref.shape[1]
    k = k_ref[0]                                  # (BK, D)
    v = v_ref[0]
    block_k, D = k.shape
    rows = group * block_q
    pad = mask_ref[0, 0][None, None, :]           # (1, 1, BK) additive
    dk = jnp.zeros((block_k, D), jnp.float32)
    dv = jnp.zeros((block_k, D), jnp.float32)

    def make_body(masked: bool):
        def body(qb, carry):
            dk, dv = carry
            q = q_ref[0, :, pl.ds(qb * block_q, block_q), :].reshape(rows, D)
            do = do_ref[0, :, pl.ds(qb * block_q, block_q), :].reshape(rows, D)
            lse = lse_ref[0, :, pl.ds(qb * block_q, block_q)][..., None]
            delta = delta_ref[0, :, pl.ds(qb * block_q, block_q)][..., None]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).reshape(group, block_q, block_k) * scale
            s = s + pad
            if masked:
                q_pos = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                k_pos = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 2)
                ok = k_pos <= q_pos if causal else (k_pos == k_pos)
                if window is not None:
                    ok &= (q_pos - k_pos) < window
                s = jnp.where(ok, s, NEG_INF)
            p = jnp.exp(s - lse)
            pc = p.reshape(rows, block_k).astype(do.dtype)
            dv_new = dv + jax.lax.dot_general(
                pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ).reshape(group, block_q, block_k)
            ds = ((p * (dp - delta)).reshape(rows, block_k)).astype(q.dtype)
            dk_new = dk + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_new, dv_new
        return body

    lower = kb * block_k // block_q if causal else 0
    if causal and window is None:
        # q blocks fully past this k block's diagonal strip are unmasked
        plain = jnp.minimum(num_q_blocks,
                            ((kb + 1) * block_k - 1 + block_q - 1) // block_q)
        dk, dv = jax.lax.fori_loop(lower, plain, make_body(True), (dk, dv))
        dk, dv = jax.lax.fori_loop(plain, num_q_blocks, make_body(False),
                                   (dk, dv))
    else:
        dk, dv = jax.lax.fori_loop(lower, num_q_blocks,
                                   make_body(causal or window is not None),
                                   (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_packed(scale, causal, window, q, k, v, kv_mask, do, lse, delta):
    """Resident backward with the GQA group packed into the matmul M dim."""
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    BQ, BK = _pick_packed_blocks(Sq, Sk, group, bwd=True)
    common = dict(memory_space=pltpu.VMEM)
    q_r = q.reshape(B * Hkv, group, Sq, D)
    do_r = do.reshape(B * Hkv, group, Sq, D)
    k_r = k.reshape(B * Hkv, Sk, D)
    v_r = v.reshape(B * Hkv, Sk, D)
    lse_r = lse.reshape(B * Hkv, group, Sq)
    delta_r = delta.reshape(B * Hkv, group, Sq)
    mask_r = _pad_penalty(kv_mask)

    dq_kernel = functools.partial(
        _bwd_dq_packed_kernel, scale=scale, causal=causal, window=window,
        num_k_blocks=Sk // BK, block_k=BK)
    dq = pl.pallas_call(
        dq_kernel, grid=(B * Hkv, Sq // BQ), interpret=_interpret(),
        compiler_params=None if _interpret() else _PACKED_PARAMS,
        in_specs=[
            pl.BlockSpec((1, group, BQ, D), lambda bh, qb: (bh, 0, qb, 0),
                         **common),
            pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh, 0, 0), **common),
            pl.BlockSpec((1, Sk, D), lambda bh, qb: (bh, 0, 0), **common),
            pl.BlockSpec((1, 1, Sk), lambda bh, qb: (bh // Hkv, 0, 0),
                         **common),
            pl.BlockSpec((1, group, BQ, D), lambda bh, qb: (bh, 0, qb, 0),
                         **common),
            pl.BlockSpec((1, group, BQ), lambda bh, qb: (bh, 0, qb),
                         **common),
            pl.BlockSpec((1, group, BQ), lambda bh, qb: (bh, 0, qb),
                         **common),
        ],
        out_specs=pl.BlockSpec((1, group, BQ, D),
                               lambda bh, qb: (bh, 0, qb, 0), **common),
        out_shape=jax.ShapeDtypeStruct((B * Hkv, group, Sq, D), q.dtype),
    )(q_r, k_r, v_r, mask_r, do_r, lse_r, delta_r)

    dkv_kernel = functools.partial(
        _bwd_dkv_packed_kernel, scale=scale, causal=causal, window=window,
        num_q_blocks=Sq // BQ, block_q=BQ)
    dk, dv = pl.pallas_call(
        dkv_kernel, grid=(B * Hkv, Sk // BK), interpret=_interpret(),
        compiler_params=None if _interpret() else _PACKED_PARAMS,
        in_specs=[
            pl.BlockSpec((1, group, Sq, D), lambda bh, kb: (bh, 0, 0, 0),
                         **common),
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0), **common),
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0), **common),
            pl.BlockSpec((1, 1, BK), lambda bh, kb: (bh // Hkv, 0, kb),
                         **common),
            pl.BlockSpec((1, group, Sq, D), lambda bh, kb: (bh, 0, 0, 0),
                         **common),
            pl.BlockSpec((1, group, Sq), lambda bh, kb: (bh, 0, 0),
                         **common),
            pl.BlockSpec((1, group, Sq), lambda bh, kb: (bh, 0, 0),
                         **common),
        ],
        out_specs=(
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0), **common),
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0), **common),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Hkv, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B * Hkv, Sk, D), v.dtype),
        ),
    )(q_r, k_r, v_r, mask_r, do_r, lse_r, delta_r)

    return (dq.reshape(B, H, Sq, D), dk.reshape(B, Hkv, Sk, D),
            dv.reshape(B, Hkv, Sk, D))


def _dbias_kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, do_ref, lse_ref,
                  delta_ref, dbias_ref, *, scale, causal, window,
                  num_k_blocks, block_k):
    """dbias = dS = P * (dP - delta), accumulated over the innermost grid
    axis (batch) into a per-(head, q-block) output block. Grid revisits of
    the same output block are contiguous, so read-modify-write is exact."""
    qb = pl.program_id(1)
    b = pl.program_id(2)
    # bf16 MXU operands, fp32 accumulation/softmax (see _fwd_kernel)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    block_q = q.shape[0]
    q_pos = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    @pl.when(b == 0)
    def _init():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    def body(kb, _):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] > 0
        ok = jnp.broadcast_to(valid[None, :], s.shape)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # fully-masked (padded) query rows have do == 0 => ds == 0, but p is
        # degenerate there; zero explicitly so padded rows never contribute
        ds = jnp.where(ok, p * (dp - delta), 0.0)
        cur = dbias_ref[0, :, pl.ds(kb * block_k, block_k)]
        dbias_ref[0, :, pl.ds(kb * block_k, block_k)] = cur + ds
        return 0

    if causal:
        upper = jnp.minimum(num_k_blocks, (qb + 1) * block_q // block_k + 1)
    else:
        upper = num_k_blocks
    jax.lax.fori_loop(0, upper, body, 0)


def _compute_dbias(bias, q_r, k_r, v_r, mask_bh, do_r, lse_r, delta_r,
                   B, H, group, Sq, Sk, D, scale, causal, window):
    """Gradient w.r.t. the (b0, h0, Sq, Sk) bias passed to _flash."""
    b0, h0 = bias.shape[0], bias.shape[1]
    bias_r, brow = _bias_rows(bias, B, H)
    kernel = functools.partial(
        _dbias_kernel, scale=scale, causal=causal, window=window,
        num_k_blocks=Sk // BLOCK_K, block_k=BLOCK_K)
    common = dict(memory_space=pltpu.VMEM)
    if b0 == 1:
        # shared bias: sum over batch inside the kernel (innermost grid axis)
        grid = (H, Sq // BLOCK_Q, B)
        bh = lambda h, qb, b: b * H + h
        out_rows, out_map = H, (lambda h, qb, b: (h, qb, 0))
    else:
        # per-sample bias: one output row per (batch, head)
        grid = (B * H, Sq // BLOCK_Q, 1)
        bh = lambda i, qb, b: i
        out_rows, out_map = B * H, (lambda i, qb, b: (i, qb, 0))
    in_specs = [
        pl.BlockSpec((1, BLOCK_Q, D), lambda *g: (bh(*g), g[1], 0), **common),
        pl.BlockSpec((1, Sk, D), lambda *g: (bh(*g) // group, 0, 0), **common),
        pl.BlockSpec((1, Sk, D), lambda *g: (bh(*g) // group, 0, 0), **common),
        pl.BlockSpec((1, 1, Sk), lambda *g: (bh(*g), 0, 0), **common),
        pl.BlockSpec((1, BLOCK_Q, Sk), lambda *g: (brow(bh(*g)), g[1], 0),
                     **common),
        pl.BlockSpec((1, BLOCK_Q, D), lambda *g: (bh(*g), g[1], 0), **common),
        pl.BlockSpec((1, 1, BLOCK_Q), lambda *g: (bh(*g), 0, g[1]), **common),
        pl.BlockSpec((1, 1, BLOCK_Q), lambda *g: (bh(*g), 0, g[1]), **common),
    ]
    dbias_full = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, interpret=_interpret(),
        out_specs=pl.BlockSpec((1, BLOCK_Q, Sk), out_map, **common),
        out_shape=jax.ShapeDtypeStruct((out_rows, Sq, Sk), jnp.float32),
    )(q_r, k_r, v_r, mask_bh, bias_r, do_r, lse_r, delta_r)
    dbias = (dbias_full[None] if b0 == 1
             else dbias_full.reshape(B, H, Sq, Sk))
    if h0 == 1:
        dbias = dbias.sum(axis=1, keepdims=True)
    return dbias.astype(bias.dtype)


def _demb_kernel(q_ref, k_ref, v_ref, mask_ref, table_ref, do_ref, lse_ref,
                 delta_ref, demb_ref, *, scale, causal, window,
                 block_q, block_k, t5):
    """Gradient of the loss w.r.t. one head's (nb, 1) T5 table column.

    Grid (H, B, q-blocks, k-blocks), h outermost: all revisits of the
    (1, nb) output row are contiguous, so the read-modify-write
    accumulation is exact. demb[h, b'] = sum over (q, k) pairs in bucket b'
    of dS(q, k)."""
    h = pl.program_id(0)
    b = pl.program_id(1)
    qb = pl.program_id(2)
    kb = pl.program_id(3)

    @pl.when((b == 0) & (qb == 0) & (kb == 0))
    def _init():
        demb_ref[...] = jnp.zeros(demb_ref.shape, demb_ref.dtype)

    live = True
    if causal:
        live = kb * block_k <= (qb + 1) * block_q - 1

    @pl.when(live if not isinstance(live, bool) else True)
    def _update():
        # bf16 MXU operands, fp32 accumulation/softmax (see _fwd_kernel)
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0][:, None]
        delta = delta_ref[0, 0][:, None]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = s + _t5_tile(_table_head_col(table_ref, h), q_pos, k_pos, *t5)
        ok = jnp.broadcast_to((mask_ref[0, 0] > 0)[None, :], s.shape)
        if causal:
            ok &= k_pos <= q_pos
        if window is not None:
            ok &= (q_pos - k_pos) < window
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = jnp.where(ok, p * (dp - delta), 0.0)
        # per-bucket masked sums, statically unrolled: everything stays a
        # 2D tile or a scalar (the one-hot-matmul formulation needs
        # (BQ, BK) -> (1, BQ*BK) shape casts Mosaic cannot lower).  The
        # (1, 8, nb) output block holds the same row in all 8 sublanes (a
        # (1, nb) block is not sublane-lowerable); the caller reads
        # sublane 0.
        bucket = _t5_bucket(q_pos, k_pos, *t5)
        lane = jax.lax.broadcasted_iota(jnp.int32, demb_ref.shape, 2)
        acc = jnp.zeros(demb_ref.shape, jnp.float32)
        for b in range(t5[1]):                                # static
            s_b = jnp.sum(jnp.where(bucket == b, ds, 0.0))
            acc = acc + jnp.where(lane == b, s_b, 0.0)
        demb_ref[...] += acc


def _compute_demb(q, k, v, kv_mask, table, do, lse, delta,
                  scale, causal, window, t5):
    """(H, nb) bucket-table gradient, streamed at any sequence length."""
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    nb = table.shape[0]
    BQ, BK = _pick_bwd_blocks(Sq, Sk, D)
    while Sq % BQ:
        BQ //= 2
    while Sk % BK:
        BK //= 2
    common = dict(memory_space=pltpu.VMEM)
    bh = lambda h, b, qb, kb: b * H + h
    in_specs = [
        pl.BlockSpec((1, BQ, D), lambda *g: (bh(*g), g[2], 0), **common),
        pl.BlockSpec((1, BK, D), lambda *g: (bh(*g) // group, g[3], 0),
                     **common),
        pl.BlockSpec((1, BK, D), lambda *g: (bh(*g) // group, g[3], 0),
                     **common),
        pl.BlockSpec((1, 1, BK), lambda *g: (bh(*g), 0, g[3]), **common),
        pl.BlockSpec((nb, H), lambda *g: (0, 0), **common),
        pl.BlockSpec((1, BQ, D), lambda *g: (bh(*g), g[2], 0), **common),
        pl.BlockSpec((1, 1, BQ), lambda *g: (bh(*g), 0, g[2]), **common),
        pl.BlockSpec((1, 1, BQ), lambda *g: (bh(*g), 0, g[2]), **common),
    ]
    kernel = functools.partial(
        _demb_kernel, scale=scale, causal=causal, window=window,
        block_q=BQ, block_k=BK, t5=t5)
    mask_bh = jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                               ).reshape(B * H, 1, Sk).astype(jnp.int32)
    demb = pl.pallas_call(
        kernel, grid=(H, B, Sq // BQ, Sk // BK), in_specs=in_specs,
        interpret=_interpret(),
        out_specs=pl.BlockSpec((1, 8, nb), lambda *g: (g[0], 0, 0),
                               **common),
        out_shape=jax.ShapeDtypeStruct((H, 8, nb), jnp.float32),
    )(q.reshape(B * H, Sq, D), k.reshape(B * Hkv, Sk, D),
      v.reshape(B * Hkv, Sk, D), mask_bh, table.astype(jnp.float32),
      do.reshape(B * H, Sq, D), lse.reshape(B * H, 1, Sq),
      delta.reshape(B * H, 1, Sq))
    return demb[:, 0, :].T.astype(table.dtype)               # (nb, H)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_t5(q, k, v, kv_mask, table, scale, causal, window, t5):
    out, _ = _fwd_stream(q, k, v, kv_mask, table, scale, causal, window,
                         t5=t5)
    return out


def _flash_t5_fwd(q, k, v, kv_mask, table, scale, causal, window, t5):
    out, lse = _fwd_stream(q, k, v, kv_mask, table, scale, causal, window,
                           t5=t5)
    return out, (q, k, v, kv_mask, table, out, lse)


def _flash_t5_bwd(scale, causal, window, t5, residuals, g):
    q, k, v, kv_mask, table, out, lse = residuals
    do = g
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dq, dk, dv = _bwd_stream(scale, causal, window, q, k, v, kv_mask,
                             table, do, lse.reshape(B, H, Sq), delta, t5=t5)
    dk = dk.reshape(B, H, Sk, D)
    dv = dv.reshape(B, H, Sk, D)
    if group > 1:
        dk = dk.reshape(B, Hkv, group, Sk, D).sum(axis=2)
        dv = dv.reshape(B, Hkv, group, Sk, D).sum(axis=2)
    dtable = _compute_demb(q, k, v, kv_mask, table, do,
                           lse.reshape(B, H, Sq), delta,
                           scale, causal, window, t5)
    return dq.reshape(B, H, Sq, D), dk, dv, None, dtable


_flash_t5.defvjp(_flash_t5_fwd, _flash_t5_bwd)


def _bwd(scale, causal, window, residuals, g):
    q, k, v, kv_mask, bias, out, lse = residuals
    do = g
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    group = H // Hkv
    BQ, BK = _pick_bwd_blocks(Sq, Sk, D)
    while Sq % BQ:
        BQ //= 2
    while Sk % BK:
        BK //= 2
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    if _use_streaming(Sk, D, k.dtype):
        dq_s, dk_s, dv_s = _bwd_stream(scale, causal, window, q, k, v,
                                       kv_mask, bias, do,
                                       lse.reshape(B, H, Sq), delta)
        dk_s = dk_s.reshape(B, H, Sk, D)
        dv_s = dv_s.reshape(B, H, Sk, D)
        if group > 1:
            dk_s = dk_s.reshape(B, Hkv, group, Sk, D).sum(axis=2)
            dv_s = dv_s.reshape(B, Hkv, group, Sk, D).sum(axis=2)
        dbias_s = None
        if bias is not None:
            mask_bh_s = jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                                         ).reshape(B * H, 1, Sk).astype(jnp.int32)
            dbias_s = _compute_dbias(
                bias, q.reshape(B * H, Sq, D), k.reshape(B * Hkv, Sk, D),
                v.reshape(B * Hkv, Sk, D), mask_bh_s,
                do.reshape(B * H, Sq, D), lse.reshape(B * H, 1, Sq),
                delta.reshape(B * H, 1, Sq), B, H, group, Sq, Sk, D,
                scale, causal, window)
        return dq_s.reshape(B, H, Sq, D), dk_s, dv_s, None, dbias_s

    if bias is None:
        dq_p, dk_p, dv_p = _bwd_packed(scale, causal, window, q, k, v,
                                       kv_mask, do, lse, delta)
        return dq_p, dk_p, dv_p, None, None

    mask_bh = jnp.broadcast_to(kv_mask[:, None, :], (B, H, Sk)
                               ).reshape(B * H, 1, Sk).astype(jnp.int32)
    q_r = q.reshape(B * H, Sq, D)
    k_r = k.reshape(B * Hkv, Sk, D)
    v_r = v.reshape(B * Hkv, Sk, D)
    do_r = do.reshape(B * H, Sq, D)
    lse_r = lse.reshape(B * H, 1, Sq)
    delta_r = delta.reshape(B * H, 1, Sq)
    bias_r, brow = _bias_rows(bias, B, H) if bias is not None else (None, None)

    common_specs = dict(memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Sk, D), lambda bh, blk: (bh // group, 0, 0),
                           **common_specs)
    # -- dq ------------------------------------------------------------------
    dq_specs = [
        pl.BlockSpec((1, BQ, D), lambda bh, qb: (bh, qb, 0), **common_specs),
        kv_spec, kv_spec,
        pl.BlockSpec((1, 1, Sk), lambda bh, qb: (bh, 0, 0), **common_specs),
    ]
    dq_args = [q_r, k_r, v_r, mask_bh]
    if bias_r is not None:
        dq_specs.append(pl.BlockSpec((1, BQ, Sk),
                                     lambda bh, qb: (brow(bh), qb, 0),
                                     **common_specs))
        dq_args.append(bias_r)
        dq_kernel = functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, window=window,
            num_k_blocks=Sk // BK, block_k=BK)
    else:
        def dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                      delta_ref, dq_ref):
            return _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, None, do_ref,
                                  lse_ref, delta_ref, dq_ref, scale=scale,
                                  causal=causal, window=window,
                                  num_k_blocks=Sk // BK, block_k=BK)
    dq_specs += [
        pl.BlockSpec((1, BQ, D), lambda bh, qb: (bh, qb, 0), **common_specs),
        pl.BlockSpec((1, 1, BQ), lambda bh, qb: (bh, 0, qb), **common_specs),
        pl.BlockSpec((1, 1, BQ), lambda bh, qb: (bh, 0, qb), **common_specs),
    ]
    dq_args += [do_r, lse_r, delta_r]
    dq = pl.pallas_call(
        dq_kernel, grid=(B * H, Sq // BQ), in_specs=dq_specs,
        interpret=_interpret(),
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qb: (bh, qb, 0),
                               **common_specs),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
    )(*dq_args)

    # -- dk / dv (one program per (b*h, k-block), summed over groups after) --
    dkv_specs = [
        pl.BlockSpec((1, Sq, D), lambda bh, kb: (bh, 0, 0), **common_specs),
        pl.BlockSpec((1, BK, D), lambda bh, kb: (bh // group, kb, 0),
                     **common_specs),
        pl.BlockSpec((1, BK, D), lambda bh, kb: (bh // group, kb, 0),
                     **common_specs),
        pl.BlockSpec((1, 1, BK), lambda bh, kb: (bh, 0, kb), **common_specs),
    ]
    dkv_args = [q_r, k_r, v_r, mask_bh]
    if bias_r is not None:
        dkv_specs.append(pl.BlockSpec((1, Sq, BK),
                                      lambda bh, kb: (brow(bh), 0, kb),
                                      **common_specs))
        dkv_args.append(bias_r)
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, window=window,
            num_q_blocks=Sq // BQ, block_q=BQ)
    else:
        def dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref):
            return _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, None, do_ref,
                                   lse_ref, delta_ref, dk_ref, dv_ref,
                                   scale=scale, causal=causal, window=window,
                                   num_q_blocks=Sq // BQ, block_q=BQ)
    dkv_specs += [
        pl.BlockSpec((1, Sq, D), lambda bh, kb: (bh, 0, 0), **common_specs),
        pl.BlockSpec((1, 1, Sq), lambda bh, kb: (bh, 0, 0), **common_specs),
        pl.BlockSpec((1, 1, Sq), lambda bh, kb: (bh, 0, 0), **common_specs),
    ]
    dkv_args += [do_r, lse_r, delta_r]
    dk, dv = pl.pallas_call(
        dkv_kernel, grid=(B * H, Sk // BK), in_specs=dkv_specs,
        interpret=_interpret(),
        out_specs=(
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0),
                         **common_specs),
            pl.BlockSpec((1, BK, D), lambda bh, kb: (bh, kb, 0),
                         **common_specs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Sk, D), v.dtype),
        ),
    )(*dkv_args)

    dk = dk.reshape(B, H, Sk, D)
    dv = dv.reshape(B, H, Sk, D)
    if group > 1:  # sum query-head gradients into their shared KV head
        dk = dk.reshape(B, Hkv, group, Sk, D).sum(axis=2)
        dv = dv.reshape(B, Hkv, group, Sk, D).sum(axis=2)
    dq = dq.reshape(B, H, Sq, D)
    # kv_mask is boolean (non-differentiable); bias gradients (learned T5
    # relative-position biases) come from a dedicated dS kernel
    dbias = None
    if bias is not None:
        dbias = _compute_dbias(bias, q_r, k_r, v_r, mask_bh, do_r,
                               lse_r, delta_r, B, H, group, Sq, Sk, D,
                               scale, causal, window)
    return dq, dk, dv, None, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, kv_mask, bias, scale, causal, window):
    out, _ = _fwd(q, k, v, kv_mask, bias, scale, causal, window)
    return out


def _flash_fwd(q, k, v, kv_mask, bias, scale, causal, window):
    out, lse = _fwd(q, k, v, kv_mask, bias, scale, causal, window)
    return out, (q, k, v, kv_mask, bias, out, lse)


def _flash_bwd(scale, causal, window, residuals, g):
    return _bwd(scale, causal, window, residuals, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, mask=None, bias=None, scale: float = 1.0,
                    causal: bool = False, window: Optional[int] = None,
                    t5_bias: Optional[T5Bias] = None):
    """Public wrapper: pads shapes to kernel tiles and restores them.

    q: (B, H, Sq, D); k/v: (B, Hkv, Sk, D) (GQA allowed, H % Hkv == 0).
    mask: bool, broadcastable to (B, 1|H, Sq, Sk). The kernel itself only
    supports key-validity masking (B, Sk) — full masks fall back to the last
    two axes' any()-reduction over queries, which is exact for the padding and
    causal masks produced by this codebase.

    t5_bias: learned relative-position bias computed INSIDE the kernels
    from the (num_buckets, H) table — no O(Sq*Sk) bias tensor in either
    direction, so T5-style models train at any sequence length (the
    round-2 ~64k learned-bias gradient cap is gone). Mutually exclusive
    with ``bias``; assumes right-padded sequences.
    """
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    assert bias is None or t5_bias is None

    kv_mask = None
    extra_causal = causal
    if mask is not None:
        m = jnp.broadcast_to(mask, (B, mask.shape[1], Sq, Sk))
        # key is usable if any query may attend it; per-(q,k) causal/window
        # structure is reapplied inside the kernel
        kv_mask = jnp.any(m[:, 0], axis=-2)
    if kv_mask is None:
        kv_mask = jnp.ones((B, Sk), bool)

    # pad to tiles (the head dim is used as a full-array block, so any D that
    # is a multiple of the 128-lane packing unit... smaller D is kept as-is
    # since full-dim blocks are always legal; only sublane-align to 8)
    D_pad = D if D % 8 == 0 else _ceil_to(D, 8)
    block_q, block_k = _pick_blocks(max(Sq, BLOCK_Q), max(Sk, BLOCK_K), D)
    Sq_pad = _ceil_to(Sq, block_q)
    Sk_pad = _ceil_to(Sk, block_k)

    def pad(x, s_axis, s_to, d_to):
        cfg = [(0, 0)] * x.ndim
        cfg[s_axis] = (0, s_to - x.shape[s_axis])
        cfg[-1] = (0, d_to - x.shape[-1])
        return jnp.pad(x, cfg)

    q_p = pad(q, 2, Sq_pad, D_pad)
    k_p = pad(k, 2, Sk_pad, D_pad)
    v_p = pad(v, 2, Sk_pad, D_pad)
    kv_mask_p = jnp.pad(kv_mask, ((0, 0), (0, Sk_pad - Sk)))
    bias_p = None
    if bias is not None:
        bias_p = jnp.pad(bias.astype(jnp.float32),
                         ((0, 0), (0, 0), (0, Sq_pad - Sq), (0, Sk_pad - Sk)))

    if t5_bias is not None:
        t5_meta = (t5_bias.bidirectional, t5_bias.num_buckets,
                   t5_bias.max_distance)
        out = _flash_t5(q_p, k_p, v_p, kv_mask_p, t5_bias.table, scale,
                        extra_causal, window, t5_meta)
        return out[:, :, :Sq, :D]
    out = _flash(q_p, k_p, v_p, kv_mask_p, bias_p, scale, extra_causal, window)
    return out[:, :, :Sq, :D]
