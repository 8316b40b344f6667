"""Weight-only int8 quantization for inference.

Decode at billion-parameter scale is weight-bound: every decoder call
reads the full parameter set from HBM (PERFORMANCE.md 1B section — one
bf16 weight read ≈ 2.7 ms dominates the ~4 ms greedy step).  Storing the
big matmul weights as int8 with per-channel scales halves that floor;
the matmuls stream int8 blocks from HBM and convert them to the compute
dtype inside VMEM, so a bf16 copy of a weight never exists in HBM.
Measured (2026-08-21, llama_1b): greedy 2017 → 2982 tok/s (1.48×);
even at compute-bound transformer-base scale it is a 1.07× win.

The reference (naver/pasero) has no quantization story — models decode
in fp16/bf16 — so this is a beyond-reference capability, enabled with
``--quantize int8`` at inference (TextGenerator / pasero-decode /
pasero-serve).

Design:

- ``QTensor(q, scale, logical)`` is a registered pytree node holding the
  int8 weight, its fp32 per-channel scale, and the LOGICAL (unpadded)
  shape: both dims are zero-padded up to multiples of 128 at quantize
  time so the Pallas kernels always have an even block decomposition —
  vocab sizes like NLLB's 256206 or GPT-2's 50257 would otherwise
  silently fall back to a full per-call dequantization, the opposite of
  the flag's purpose.  It rides *inside* the normal flax params tree in
  place of the fp32 kernel, so every decode program (beam, sampling,
  speculative, scoring) sees it through the ordinary ``{"params": ...}``
  plumbing — tree_map / device_put descend into its leaves.
- ``Linear`` (models/modules.py) and ``Embedding`` detect a QTensor and
  call ``int8_matmul`` / ``int8_matmul_t`` / ``embedding_lookup``: one
  Pallas kernel (both weight orientations, static ``transpose`` flag)
  with grid (rows, out-block, in-block) whose weight HBM traffic is the
  int8 bytes; scales are applied to the fp32 accumulator on the last
  reduction step.  Off-TPU (tests) the kernel runs in interpreter mode.
  Block defaults are from an on-chip sweep (PERFORMANCE.md): prefer
  BK=2048 / BN=1024 where the dims divide (``PASERO_INT8_BK/BN``
  override).
- ``quantize_params`` targets ONLY parameters consumed by the
  QTensor-aware modules (attention/FFN/adapters Linear kernels, the
  ``embed_tokens`` token table): quantizing by bare param name would
  also hit flax LSTM-cell kernels (hybrid decoder) and learned
  positional tables, whose consumers cannot read a QTensor.
- Quantization error: symmetric round-to-nearest over 127 levels per
  output channel, ~0.4% RMS per column — measured BLEU-identical on the
  deen-mini recipe (tests/test_quantize.py pins token-identical decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class QTensor:
    """int8 weight + fp32 per-channel scale + logical shape, one pytree node.

    ``shape``/``ndim`` report the LOGICAL (unpadded, dequantized) weight
    shape so shape-driven code paths keep working; ``dtype`` reports int8
    so callers can detect quantization. ``astype`` is a no-op returning
    self: blanket compute-dtype casts over a params tree must not
    silently dequantize.
    """

    __slots__ = ("q", "scale", "logical")

    def __init__(self, q, scale, logical=None):
        self.q = q
        self.scale = scale
        self.logical = tuple(logical) if logical is not None \
            else tuple(getattr(q, "shape", ()))

    @property
    def shape(self):
        return self.logical

    @property
    def ndim(self):
        return len(self.logical)

    @property
    def size(self):
        return int(np.prod(self.logical))

    @property
    def dtype(self):
        return self.q.dtype

    def astype(self, _dtype):
        return self

    def __repr__(self):
        return (f"QTensor(q={tuple(self.q.shape)} int8, "
                f"scale={tuple(self.scale.shape)}, logical={self.logical})")


jax.tree_util.register_pytree_node(
    QTensor,
    lambda t: ((t.q, t.scale), t.logical),
    lambda aux, children: QTensor(*children, logical=aux),
)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def quantize(w, axis: int = 0) -> QTensor:
    """Symmetric per-channel int8 quantization of a 2D weight.

    ``axis`` is the reduction axis of the absmax: 0 (default) gives one
    scale per *column* — right for (in, out) matmul kernels, where the
    scale multiplies the output; 1 gives one scale per *row* — right for
    (vocab, embed) embedding tables, where rows are looked up (take) and
    the head contraction is along embed (scale multiplies the logit
    column of that vocab row).

    Storage stays at the logical shape (flax validates param leaf shapes
    at apply time); the matmul wrappers zero-pad indivisible dims to
    block multiples INSIDE the jit, where the pad of a loop-invariant
    weight is hoisted out of the decode loop — so odd vocab sizes
    (NLLB's 256206, GPT-2's 50257) still stream int8 blocks instead of
    silently falling back to a full per-call dequantization.
    """
    w = jnp.asarray(w, jnp.float32)
    rows, cols = w.shape
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale.astype(jnp.float32), logical=(rows, cols))


def dequantize(t: QTensor, dtype=jnp.float32):
    return (t.q.astype(jnp.float32) * t.scale).astype(dtype)


# parameters whose consumers understand QTensor: the Linear instances of
# attention/FFN/adapters/conv-frontend (models/modules.py, attention.py)
# and the token embedding table. Quantizing by bare param name would also
# hit flax LSTM-cell kernels and learned positional tables, which crash
# at trace time on a QTensor.
LINEAR_MODULES = frozenset({
    "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "gate",
    "output_projection", "down", "up", "in_proj",
})
EMBED_MODULES = frozenset({"embed_tokens"})


def quantize_params(params, min_size: int = None):
    """Replace the QTensor-aware 2D weights (Linear kernels of attention/
    FFN/adapters + the embed_tokens table) of at least ``min_size``
    elements (default 64k or $PASERO_QUANTIZE_MIN_SIZE) by QTensors.
    Returns (new_params, n_quantized).

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
        # parameter and module names
        names = [n for n in map(_name, reversed(path)) if n != "value"]
        leaf_name = names[0] if names else ""
        parent = names[1] if len(names) > 1 else ""
        if (getattr(leaf, "ndim", 0) != 2 or leaf.size < min_size
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        if leaf_name == "kernel" and parent in LINEAR_MODULES:
            count[0] += 1
            return quantize(leaf, axis=0)        # (in, out): per-column
        if leaf_name == "embedding" and parent in EMBED_MODULES:
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
# Pallas weight-streaming int8 matmul (both weight orientations)
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


def _kernel(x_ref, q_ref, s_ref, o_ref, acc, *, nkb, transpose):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    w = q_ref[...].astype(x_ref.dtype)          # int8 -> compute dtype in VMEM
    dims = ((1,), (1,)) if transpose else ((1,), (0,))
    acc[...] += jax.lax.dot_general(
        x_ref[...], w, (dims, ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _done():
        o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "transpose"))
def _int8_matmul_2d(x, q, scale_row, out_dtype, transpose):
    """x (M, K) @ W where the int8 weight is read in its stored
    orientation: q (K, N) when ``transpose`` is False, q (N, K) when True
    (row-quantized tables — no transposed int8 copy in HBM).
    ``scale_row`` is the flat (N,) per-output scale.

    Indivisible dims are zero-padded to block multiples here, inside the
    jit: for decode the pad of a loop-invariant weight is hoisted out of
    the ``lax.while_loop`` (one int8 copy per call, amortized over all
    steps), so NLLB/GPT-2-style vocab sizes stream int8 blocks instead of
    dequantizing the whole table every call."""
    M, K = x.shape
    N = q.shape[0] if transpose else q.shape[1]
    Kp, Np = _ceil_to(K, 128), _ceil_to(N, 128)
    # defaults from the on-chip llama_1b sweep (PERFORMANCE.md): bigger
    # K blocks win (fewer grid steps per output tile; BK=2048 + BN=1024
    # measured 2975 vs 2576 tok/s greedy at the 512x512 starting point)
    BK = _pick_block(Kp, (2048, 1024, 512, 256, 128), env="PASERO_INT8_BK")
    BN = _pick_block(Np, (1024, 512, 256, 128), env="PASERO_INT8_BN")
    if (Kp, Np) != (K, N):
        pads = ((0, Np - N), (0, Kp - K)) if transpose \
            else ((0, Kp - K), (0, Np - N))
        q = jnp.pad(q, pads)
        scale_row = jnp.pad(scale_row, (0, Np - N))
    Mp = _ceil_to(max(M, 16), 16)
    BM = min(Mp, 256)
    Mp = _ceil_to(Mp, BM)
    xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
    nkb = Kp // BK
    w_spec = (pl.BlockSpec((BN, BK), lambda mb, nb, kb: (nb, kb)) if transpose
              else pl.BlockSpec((BK, BN), lambda mb, nb, kb: (kb, nb)))
    out = pl.pallas_call(
        functools.partial(_kernel, nkb=nkb, transpose=transpose),
        grid=(Mp // BM, Np // BN, nkb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda mb, nb, kb: (mb, kb)),
            w_spec,
            pl.BlockSpec((1, BN), lambda mb, nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda mb, nb, kb: (mb, nb)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )(xp, q, scale_row.reshape(1, -1))
    return out[:M, :N]


def int8_matmul(x, t: QTensor, out_dtype=None):
    """``x @ dequantize(t)`` with the weight read from HBM as int8.

    x: (..., K); t.q: (K, N) int8; returns (..., N) in ``out_dtype``
    (default: x.dtype). Inference-only (no gradient rule)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    out = _int8_matmul_2d(x2, t.q, t.scale.reshape(-1),
                          jnp.dtype(out_dtype), False)
    return out.reshape(lead + (t.q.shape[1],))


def int8_matmul_t(x, t: QTensor, out_dtype=None):
    """``x @ dequantize(t).T`` for a row-quantized table (vocab head).

    x: (..., E); t.q: (V, E) int8 with per-row scale (V, 1); returns
    (..., V). The per-row scale multiplies the output logit columns; the
    int8 rows are read in their stored orientation."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    out = _int8_matmul_2d(x2, t.q, t.scale.reshape(-1),
                          jnp.dtype(out_dtype), True)
    return out.reshape(lead + (t.q.shape[0],))


def embedding_lookup(t: QTensor, ids, dtype):
    """Row lookup from a row-quantized (V, E) table: dequantize only the
    gathered rows."""
    rows = jnp.take(t.q, ids, axis=0).astype(dtype)
    return rows * jnp.take(t.scale.reshape(-1), ids, axis=0)[..., None].astype(
        dtype)
