"""In-kernel T5 relative-position bias == the materialized-bias flash path
(outputs and gradients, including the (num_buckets, H) table gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.ops.flash_attention import T5Bias, flash_attention
from pasero_tpu.models.positional import t5_bucket

B, H, S, D, NB, MAXD = 2, 2, 128, 32, 32, 64


def _setup(bidirectional, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(NB, H)) * 0.5, jnp.float32)
    return q, k, v, table


def _materialized_bias(table, bidirectional, Sq, Sk):
    pos = jnp.arange(max(Sq, Sk))
    rel = pos[:Sq, None] - pos[None, :Sk]
    buckets = t5_bucket(rel, bidirectional, NB, MAXD)
    bias = jnp.take(table, buckets, axis=0)          # (Sq, Sk, H)
    return jnp.transpose(bias, (2, 0, 1))[None]       # (1, H, Sq, Sk)


@pytest.mark.parametrize("bidirectional,causal",
                         [(False, True), (True, False)])
def test_t5_forward_matches_materialized(bidirectional, causal):
    q, k, v, table = _setup(bidirectional)
    bias = _materialized_bias(table, bidirectional, S, S)
    want = flash_attention(q, k, v, bias=bias, scale=0.2, causal=causal)
    got = flash_attention(
        q, k, v, scale=0.2, causal=causal,
        t5_bias=T5Bias(table, bidirectional, NB, MAXD))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bidirectional,causal",
                         [(False, True), (True, False)])
def test_t5_gradients_match_materialized(bidirectional, causal):
    q, k, v, table = _setup(bidirectional, seed=1)
    g = jnp.asarray(np.random.default_rng(2).normal(size=(B, H, S, D)),
                    jnp.float32)

    def loss_mat(q, k, v, table):
        bias = _materialized_bias(table, bidirectional, S, S)
        out = flash_attention(q, k, v, bias=bias, scale=0.2, causal=causal)
        return jnp.sum(out * g)

    def loss_t5(q, k, v, table):
        out = flash_attention(
            q, k, v, scale=0.2, causal=causal,
            t5_bias=T5Bias(table, bidirectional, NB, MAXD))
        return jnp.sum(out * g)

    grads_m = jax.grad(loss_mat, argnums=(0, 1, 2, 3))(q, k, v, table)
    grads_t = jax.grad(loss_t5, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b in zip("qkv table".split(), grads_t, grads_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3), name


def test_t5_padding_and_mask():
    """Ragged lengths: padded key slots must not contribute."""
    q, k, v, table = _setup(True, seed=3)
    Sq = 100   # not a block multiple -> wrapper pads
    q, k, v = q[:, :, :Sq], k[:, :, :Sq], v[:, :, :Sq]
    lengths = jnp.asarray([80, 100])
    mask = (jnp.arange(Sq)[None, :] < lengths[:, None])
    mask4 = jnp.broadcast_to(mask[:, None, None, :], (B, 1, Sq, Sq))
    bias = _materialized_bias(table, True, Sq, Sq)
    want = flash_attention(q, k, v, mask=mask4, bias=bias, scale=0.2)
    got = flash_attention(q, k, v, mask=mask4, scale=0.2,
                          t5_bias=T5Bias(table, True, NB, MAXD))
    valid = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(got) * valid,
                               np.asarray(want) * valid,
                               rtol=2e-4, atol=2e-4)


def test_t5_gqa():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, 4, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, 2, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, 2, S, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(NB, 4)) * 0.5, jnp.float32)
    bias = _materialized_bias(table, False, S, S)
    want = flash_attention(jnp.asarray(q), jnp.repeat(k, 2, 1),
                           jnp.repeat(v, 2, 1), bias=bias, scale=0.2,
                           causal=True)
    got = flash_attention(q, k, v, scale=0.2, causal=True,
                          t5_bias=T5Bias(table, False, NB, MAXD))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
