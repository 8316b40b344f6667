"""Aliased in-place KV-cache slot write == dynamic_update_slice."""

import jax
import jax.numpy as jnp
import numpy as np

from pasero_tpu.ops.cache_update import cache_slot_write


def test_cache_slot_write_parity():
    B, H, L, D = 3, 4, 16, 64
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    for idx in (0, 5, L - 1):
        want = jax.lax.dynamic_update_slice(cache, new, (0, 0, idx, 0))
        got = cache_slot_write(cache, new, idx, force_pallas=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the off-TPU fast path agrees too
        got2 = cache_slot_write(cache, new, idx)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_cache_slot_write_batch_tiled():
    # big enough that the VMEM cap forces bblk < B (grid over batch chunks)
    B, H, L, D = 64, 8, 16, 128
    rng = np.random.default_rng(1)
    cache = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    new = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    idx = 9
    want = jax.lax.dynamic_update_slice(cache, new, (0, 0, idx, 0))
    got = cache_slot_write(cache, new, idx, force_pallas=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cache_slot_write_traced_index():
    B, H, L, D = 2, 2, 8, 32
    cache = jnp.zeros((B, H, L, D), jnp.bfloat16)
    new = jnp.ones((B, H, 1, D), jnp.bfloat16)

    @jax.jit
    def step(cache, i):
        return cache_slot_write(cache, new, i, force_pallas=True)

    out = step(cache, jnp.asarray(3))
    assert float(np.asarray(out, np.float32)[:, :, 3].sum()) == B * H * D
    assert float(np.asarray(out, np.float32).sum()) == B * H * D
