"""Weight-only int8 quantization for inference.

Decode at billion-parameter scale is weight-bound: every decoder call
reads the full parameter set from HBM (PERFORMANCE.md 1B section — the
2.7 ms floor of one bf16 weight read dominates the 4.0 ms greedy step).
Storing the big matmul weights as int8 with per-output-channel scales
halves that floor; the matmul streams int8 blocks from HBM and converts
them to the compute dtype inside VMEM, so the bf16 copy of a weight
never exists in HBM.

The reference (naver/pasero) has no quantization story — models decode
in fp16/bf16 — so this is a beyond-reference capability, enabled with
``--quantize int8`` at inference (TextGenerator / pasero-decode /
pasero-serve).

Design:

- ``QTensor(q, scale)`` is a registered pytree node holding the int8
  weight ``(in, out)`` and its fp32 per-column scale ``(1, out)``.  It
  rides *inside* the normal flax params tree in place of the fp32
  kernel, so every decode program (beam, sampling, speculative, scoring)
  sees it through the ordinary ``{"params": params}`` plumbing —
  tree_map / device_put descend into its leaves transparently.
- ``Linear`` (models/modules.py) detects a QTensor kernel and calls
  ``int8_matmul``: a Pallas kernel with grid (rows, out-block, in-block)
  whose weight HBM traffic is the int8 bytes; scales are applied to the
  fp32 accumulator on the last reduction step.  Off-TPU (tests) the
  kernel runs in interpreter mode; shapes without a good block divisor
  fall back to an XLA dequantize-then-dot.
- Quantization error: symmetric round-to-nearest over 127 levels per
  output channel.  Per-channel scaling keeps the relative error of each
  column at ~0.4% RMS — measured BLEU-neutral on the deen-mini recipe
  (tests/test_quantize.py pins logit agreement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class QTensor:
    """int8 weight + fp32 per-output-channel scale, as one pytree node.

    ``shape``/``ndim`` report the logical (dequantized) weight shape so
    shape-driven code paths keep working; ``dtype`` reports int8 so
    callers can detect quantization. ``astype`` is a no-op returning
    self: blanket compute-dtype casts over a params tree must not
    silently dequantize.
    """

    __slots__ = ("q", "scale")

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        return self.q.dtype

    def astype(self, _dtype):
        return self

    def __repr__(self):
        return f"QTensor(q={self.q.shape} int8, scale={self.scale.shape})"


jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.scale), None),
    lambda _, children: QTensor(*children),
)


def quantize(w, axis: int = 0) -> QTensor:
    """Symmetric per-channel int8 quantization of a 2D weight.

    ``axis`` is the reduction axis of the absmax: 0 (default) gives one
    scale per *column* — right for (in, out) matmul kernels, where the
    scale multiplies the output; 1 gives one scale per *row* — right for
    (vocab, embed) embedding tables, where rows are looked up (take) and
    the head contraction is along embed (scale multiplies the logit
    column of that vocab row).
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale.astype(jnp.float32))


def dequantize(t: QTensor, dtype=jnp.float32):
    return (t.q.astype(jnp.float32) * t.scale).astype(dtype)


def quantize_params(params, min_size: int = None,
                    names: tuple = ("kernel",)):
    """Replace every 2D float leaf named in ``names`` (and at least
    ``min_size`` elements, default 64k or $PASERO_QUANTIZE_MIN_SIZE) by a
    QTensor. Returns (new_params, n_quantized).

    Applied as the LAST load step at inference (after LoRA merging and any
    dtype casts); training never sees QTensors.
    """
    if min_size is None:
        import os
        min_size = int(os.environ.get("PASERO_QUANTIZE_MIN_SIZE", 1 << 16))
    count = [0]

    def _name(entry):
        for attr in ("key", "name"):
            if hasattr(entry, attr):
                return str(getattr(entry, attr))
        return str(entry)

    def visit(path, leaf):
        # flax metadata boxes (LogicallyPartitioned) flatten through a
        # trailing '.value' path entry; skip such wrappers to find the
        # parameter's real name
        name = next((n for n in map(_name, reversed(path))
                     if n not in ("value",)), "")
        if (getattr(leaf, "ndim", 0) != 2 or leaf.size < min_size
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        if name in names:
            count[0] += 1
            return quantize(leaf, axis=0)        # (in, out): per-column
        if name == "embedding":
            count[0] += 1
            return quantize(leaf, axis=1)        # (vocab, embed): per-row
        return leaf

    new = jax.tree_util.tree_map_with_path(visit, params)
    return new, count[0]


def quantized_bytes(params) -> tuple:
    """(bytes_quantized_int8, bytes_float) over a (possibly) quantized tree."""
    qb = fb = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            qb += leaf.q.size + leaf.scale.size * 4
        else:
            fb += leaf.size * leaf.dtype.itemsize
    return qb, fb


# ---------------------------------------------------------------------------
# Pallas weight-streaming int8 matmul
# ---------------------------------------------------------------------------

def _pick_block(dim: int, candidates, env: str = "") -> int:
    if env:
        import os
        forced = int(os.environ.get(env, 0) or 0)
        if forced and dim % forced == 0:
            return forced
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def _kernel(x_ref, q_ref, s_ref, o_ref, acc, *, nkb):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    w = q_ref[...].astype(x_ref.dtype)          # int8 -> compute dtype in VMEM
    acc[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _done():
        o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _int8_matmul_2d(x, q, scale, out_dtype):
    M, K = x.shape
    N = q.shape[1]
    # defaults from the on-chip llama_1b sweep (PERFORMANCE.md): bigger
    # K blocks win (fewer grid steps per output tile; BK=2048 + BN=1024
    # measured 2975 vs 2576 tok/s greedy at the 512x512 starting point)
    BK = _pick_block(K, (2048, 1024, 512, 256, 128), env="PASERO_INT8_BK")
    BN = _pick_block(N, (1024, 512, 256, 128), env="PASERO_INT8_BN")
    if not BK or not BN:
        return jnp.dot(x, (q.astype(jnp.float32) * scale).astype(x.dtype),
                       preferred_element_type=out_dtype).astype(out_dtype)
    Mp = _ceil_to(max(M, 16), 16)
    BM = min(Mp, 256)
    Mp = _ceil_to(Mp, BM)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    nkb = K // BK
    out = pl.pallas_call(
        functools.partial(_kernel, nkb=nkb),
        grid=(Mp // BM, N // BN, nkb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda mb, nb, kb: (mb, kb)),
            pl.BlockSpec((BK, BN), lambda mb, nb, kb: (kb, nb)),
            pl.BlockSpec((1, BN), lambda mb, nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda mb, nb, kb: (mb, nb)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )(xp, q, scale)
    return out[:M]


def int8_matmul(x, t: QTensor, out_dtype=None):
    """``x @ dequantize(t)`` with the weight read from HBM as int8.

    x: (..., K) float; t.q: (K, N) int8; returns (..., N) in ``out_dtype``
    (default: x.dtype). Inference-only (no gradient rule).
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    out = _int8_matmul_2d(x2, t.q, t.scale, jnp.dtype(out_dtype))
    return out.reshape(lead + (t.q.shape[1],))


def _kernel_t(x_ref, q_ref, s_ref, o_ref, acc, *, nkb):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    w = q_ref[...].astype(x_ref.dtype)          # (BN, BK) row-major block
    acc[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (1,)), ((), ())),   # x @ w.T, in-VMEM
        preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _done():
        o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _int8_matmul_t_2d(x, q, scale_row, out_dtype):
    """x (M, K) @ q.T where q is (N, K) int8 — the weight is read in its
    stored row-major orientation (no transposed int8 copy in HBM)."""
    M, K = x.shape
    N = q.shape[0]
    # defaults from the on-chip llama_1b sweep (PERFORMANCE.md): bigger
    # K blocks win (fewer grid steps per output tile; BK=2048 + BN=1024
    # measured 2975 vs 2576 tok/s greedy at the 512x512 starting point)
    BK = _pick_block(K, (2048, 1024, 512, 256, 128), env="PASERO_INT8_BK")
    BN = _pick_block(N, (1024, 512, 256, 128), env="PASERO_INT8_BN")
    if not BK or not BN:
        w = (q.astype(jnp.float32) * scale_row.reshape(-1, 1)).astype(x.dtype)
        return jnp.dot(x, w.T, preferred_element_type=out_dtype).astype(
            out_dtype)
    Mp = _ceil_to(max(M, 16), 16)
    BM = min(Mp, 256)
    Mp = _ceil_to(Mp, BM)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    nkb = K // BK
    out = pl.pallas_call(
        functools.partial(_kernel_t, nkb=nkb),
        grid=(Mp // BM, N // BN, nkb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda mb, nb, kb: (mb, kb)),
            pl.BlockSpec((BN, BK), lambda mb, nb, kb: (nb, kb)),
            pl.BlockSpec((1, BN), lambda mb, nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda mb, nb, kb: (mb, nb)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )(xp, q, scale_row.reshape(1, -1))
    return out[:M]


def int8_matmul_t(x, t: QTensor, out_dtype=None):
    """``x @ dequantize(t).T`` for a row-quantized table (vocab head).

    x: (..., E); t.q: (V, E) int8 with per-row scale (V, 1); returns
    (..., V). The per-row scale multiplies the output logit columns.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    out = _int8_matmul_t_2d(x2, t.q, t.scale.reshape(-1),
                            jnp.dtype(out_dtype))
    return out.reshape(lead + (t.q.shape[0],))


def embedding_lookup(t: QTensor, ids, dtype):
    """Row lookup from a row-quantized (V, E) table: dequantize only the
    gathered rows."""
    rows = jnp.take(t.q, ids, axis=0).astype(dtype)
    return rows * jnp.take(t.scale.reshape(-1), ids, axis=0)[..., None].astype(
        dtype)
