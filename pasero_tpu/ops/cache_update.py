"""In-place KV-cache slot write (Pallas, input/output aliased).

The decode loop's KV caches are `lax.while_loop` carries. A functional
update — ``where(slot == i, new, cache)`` or ``dynamic_update_slice`` —
produces a *new* buffer each step, and XLA's copy-insertion keeps a
second copy of several cache tensors alive across the loop boundary
(profiled: ~0.56 ms of a 3.9 ms beam step on v5e, PERFORMANCE.md).  This
kernel writes the incoming (B, H, 1, D) block into the cache slot with
``input_output_aliases``: the cache buffer is updated literally in place,
the grid touches only the 8-slot-aligned window containing the target
(O(B·H·8·D) bytes — TPU sublane tiling forbids a 1-slot block — instead
of a full-cache streaming pass), and the aliasing gives XLA a clean chain
to elide the carry copy.

Falls back to interpreter mode off-TPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(idx_ref, cache_ref, new_ref, out_ref, *, window):
    # the index map selected the window-aligned slot block containing the
    # target; select the one slot inside it (TPU tiling requires the
    # second-to-last block dim to be a multiple of 8, so a 1-slot block
    # is not expressible — an 8-slot read-modify-write is)
    j = idx_ref[0] % window
    cur = cache_ref[...]                              # (B, H, window, D)
    slot = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2)
    out_ref[...] = jnp.where(slot == j, new_ref[...], cur)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def cache_slot_write(cache, new, index, force_pallas: bool = False):
    """Write ``new`` (B, H, 1, D) into ``cache`` (B, H, L, D) at slot
    ``index`` (scalar int32), reusing the cache buffer (donated/aliased).

    Returns the updated cache. Semantically identical to
    ``lax.dynamic_update_slice(cache, new, (0, 0, index, 0))`` — which is
    what runs off-TPU (the interpreter would execute the kernel per decode
    step in Python; ``force_pallas`` keeps it for the parity unit test).
    """
    if _interpret() and not force_pallas:
        return jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype),
            (0, 0, jnp.asarray(index, jnp.int32), 0))
    B, H, L, D = cache.shape
    window = min(8, L)       # slot block: multiple-of-8 TPU sublane tiling
    # FEW programs covering the whole batch: the slot window of every
    # (b, h) row is fetched as a single strided DMA (B*H chunks of
    # window*D bytes).  A grid over B — one program per batch row — was
    # dispatch-latency-bound: 320 programs x 12 cache writes/step cost
    # ~0.5 ms of a 3.6 ms beam-decode step (profiled on v5e).  But one
    # program staging the FULL (B, H, window, D) slab (input block +
    # output block both VMEM-resident) overflows VMEM for big decode
    # configs (B*K=512, H=16, D=128 bf16 is ~17 MB/block on a ~16 MB
    # v5e); tile the grid over batch chunks sized to cap block bytes.
    itemsize = jnp.dtype(cache.dtype).itemsize
    per_row = (2 * window + 1) * H * D * itemsize   # in + out + new blocks
    vmem_cap = 4 * 1024 * 1024                       # comfortable margin
    bblk = 1
    for cand in range(B, 0, -1):
        if B % cand == 0 and cand * per_row <= vmem_cap:
            bblk = cand
            break
    slot_block = lambda i, idx_ref: (i, 0, idx_ref[0] // window, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bblk,),
        in_specs=[
            pl.BlockSpec((bblk, H, window, D), slot_block),
            pl.BlockSpec((bblk, H, 1, D), lambda i, idx_ref: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bblk, H, window, D), slot_block),
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={1: 0},   # cache (after the scalar arg) -> out
        interpret=_interpret(),
    )(jnp.asarray(index, jnp.int32).reshape(1), cache,
      new.astype(cache.dtype))
