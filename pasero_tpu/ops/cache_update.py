"""In-place KV-cache slot write (Pallas, input/output aliased).

The decode loop's KV caches are `lax.while_loop` carries. A functional
update — ``where(slot == i, new, cache)`` or ``dynamic_update_slice`` —
produces a *new* buffer each step, and XLA's copy-insertion keeps a
second copy of several cache tensors alive across the loop boundary
(profiled: ~0.56 ms of a 3.9 ms beam step on v5e, PERFORMANCE.md).  This
kernel writes the incoming (B, H, 1, D) block into the cache slot with
``input_output_aliases``: the cache buffer is updated literally in place,
the grid touches only the target slot (O(B·H·D) bytes instead of a
full-cache streaming pass), and the aliasing gives XLA a clean chain to
elide the carry copy.

Falls back to interpreter mode off-TPU (tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(idx_ref, cache_ref, new_ref, out_ref):
    # the block index map already selected the target slot: plain copy
    out_ref[...] = new_ref[...]


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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, 1, D),
                         lambda b, idx_ref: (b, 0, idx_ref[0], 0)),
            pl.BlockSpec((1, H, 1, D), lambda b, idx_ref: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, 1, D),
                               lambda b, idx_ref: (b, 0, idx_ref[0], 0)),
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={1: 0},   # cache (after the scalar arg) -> out
        interpret=_interpret(),
    )(jnp.asarray(index, jnp.int32).reshape(1), cache,
      new.astype(cache.dtype))
