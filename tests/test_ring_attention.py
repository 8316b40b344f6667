"""Ring attention over a sequence-sharded mesh == single-device attention."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pasero_tpu.models.attention import dot_product_attention
from pasero_tpu.ops.ring_attention import ring_attention


def seq_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def make_qkv(B=2, H=4, Hkv=None, S=64, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    return q, k, v


def reference(q, k, v, mask=None, bias=None, scale=1.0, causal=False,
              window=None):
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    full = jnp.ones((B, 1, Sq, Sk), bool) if mask is None else mask
    rel = jnp.arange(Sq)[:, None] - jnp.arange(Sk)[None, :]
    if causal:
        full = full & (rel >= 0)[None, None]
    if window is not None:
        full = full & (rel < window)[None, None]
    return dot_product_attention(q, k, v, mask=full, bias=bias, scale=scale)


def run_ring(q, k, v, mesh, kv_mask=None, bias=None, **kw):
    fn = functools.partial(ring_attention, scale=kw.pop("scale", 1.0),
                           causal=kw.pop("causal", False),
                           window=kw.pop("window", None), axis_name="seq")
    in_specs = [P(None, None, "seq", None)] * 3
    args = [q, k, v]
    if kv_mask is not None:
        in_specs.append(P(None, "seq"))
        args.append(kv_mask)
    else:
        in_specs.append(None)
        args.append(None)
    if bias is not None:
        # bias: full-width keys, query rows sharded
        in_specs.append(P(None, None, "seq", None))
        args.append(bias)
    else:
        in_specs.append(None)
        args.append(None)
    wrapped = shard_map(
        lambda q, k, v, m, b: fn(q, k, v, kv_mask=m, bias=b),
        mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(None, None, "seq", None))
    return wrapped(*args)


def test_ring_full():
    mesh = seq_mesh(4)
    q, k, v = make_qkv()
    out = run_ring(q, k, v, mesh, scale=0.25)
    ref = reference(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_causal_padding_gqa():
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=2, H=4, Hkv=2)
    kv_mask = jnp.ones((2, 64), bool).at[:, 50:].set(False)
    out = run_ring(q, k, v, mesh, kv_mask=kv_mask, scale=0.25, causal=True)
    ref = reference(q, k, v, mask=kv_mask[:, None, None, :], scale=0.25,
                    causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_window_and_bias():
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=1, H=2)
    bias = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 64, 64)),
                       jnp.float32)
    out = run_ring(q, k, v, mesh, bias=bias, scale=0.25, causal=True,
                   window=24)
    ref = reference(q, k, v, bias=bias, scale=0.25, causal=True, window=24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients():
    """Backward replays the ring (jax.checkpoint) and matches the reference."""
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=1, H=2, S=32, D=8)

    def loss_ring(q, k, v):
        return jnp.sum(run_ring(q, k, v, mesh, scale=0.3, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, scale=0.3, causal=True) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"d{name} mismatch")


def run_zigzag(q, k, v, mesh, kv_mask=None, scale=1.0, window=None):
    from pasero_tpu.ops.ring_attention import (zigzag_indices,
                                               zigzag_ring_attention)
    n = mesh.shape["seq"]
    S = q.shape[2]
    zig = zigzag_indices(S, n)
    inv = np.argsort(zig)
    qp, kp, vp = (x[:, :, zig] for x in (q, k, v))
    mp = kv_mask[:, zig] if kv_mask is not None else None
    fn = functools.partial(zigzag_ring_attention, scale=scale, window=window,
                           axis_name="seq")
    shard = P(None, None, "seq", None)
    wrapped = shard_map(
        lambda q, k, v, m: fn(q, k, v, kv_mask=m),
        mesh=mesh,
        in_specs=(shard, shard, shard,
                  P(None, "seq") if mp is not None else None),
        out_specs=shard)
    out = wrapped(qp, kp, vp, mp)
    return out[:, :, inv]


def test_zigzag_causal_matches_reference():
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=2, H=4, S=64, D=16)
    out = run_zigzag(q, k, v, mesh, scale=0.25)
    ref = reference(q, k, v, scale=0.25, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_zigzag_padding_gqa_window():
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=2, H=4, Hkv=2, S=64, D=16)
    kv_mask = jnp.ones((2, 64), bool).at[:, 50:].set(False)
    out = run_zigzag(q, k, v, mesh, kv_mask=kv_mask, scale=0.25, window=24)
    ref = reference(q, k, v, mask=kv_mask[:, None, None, :], scale=0.25,
                    causal=True, window=24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_zigzag_gradients():
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=1, H=2, S=32, D=8)

    def loss_zig(q, k, v):
        return jnp.sum(run_zigzag(q, k, v, mesh, scale=0.3) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, scale=0.3, causal=True) ** 2)

    g1 = jax.grad(loss_zig, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"d{name} mismatch")


@functools.lru_cache(maxsize=4)
def _dropout_runner(mesh, rate, causal):
    """Built once per (mesh, rate) — a fresh shard_map per call would
    retrace on every invocation of the expectation loop below."""
    fn = functools.partial(ring_attention, scale=0.25, causal=causal,
                           axis_name="seq", dropout_rate=rate)
    return jax.jit(shard_map(
        lambda q, k, v, r: fn(q, k, v, dropout_rng=r),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
        out_specs=P(None, None, "seq", None)))


def run_ring_dropout(q, k, v, mesh, rate, rng_key, causal=False):
    return _dropout_runner(mesh, rate, causal)(q, k, v, rng_key)


def test_ring_dropout_deterministic_and_active():
    """Same key -> identical output; dropout actually changes the result;
    rate=0 with a key == no-dropout path."""
    mesh = seq_mesh(4)
    q, k, v = make_qkv(S=32)
    base = run_ring(q, k, v, mesh, scale=0.25)
    key = jax.random.PRNGKey(7)
    a = run_ring_dropout(q, k, v, mesh, 0.2, key)
    b = run_ring_dropout(q, k, v, mesh, 0.2, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(base), atol=1e-3)
    zero = run_ring_dropout(q, k, v, mesh, 0.0, key)
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_ring_dropout_matches_single_device_in_expectation():
    """Mean over many keys approaches the undropped attention (unbiased,
    like single-device dropout(softmax) @ V), and the per-key variance is
    comparable to the single-device dot_product_attention dropout."""
    mesh = seq_mesh(4)
    q, k, v = make_qkv(B=1, H=2, S=16, D=8)
    rate = 0.3
    base = np.asarray(run_ring(q, k, v, mesh, scale=0.25))

    n_keys = 200
    ring_mean = np.zeros_like(base)
    for i in range(n_keys):
        ring_mean += np.asarray(run_ring_dropout(
            q, k, v, mesh, rate, jax.random.PRNGKey(i)))
    ring_mean /= n_keys
    # standard error of the dropout estimator ~ |v| * sqrt(rate/(1-rate)/n)
    np.testing.assert_allclose(ring_mean, base, atol=0.25)


def test_zigzag_dropout_deterministic():
    from pasero_tpu.ops.ring_attention import (zigzag_indices,
                                               zigzag_ring_attention)
    mesh = seq_mesh(4)
    q, k, v = make_qkv(S=32)
    zig = zigzag_indices(32, 4)
    key = jax.random.PRNGKey(3)
    fn = functools.partial(zigzag_ring_attention, scale=0.25,
                           axis_name="seq", dropout_rate=0.25)
    wrapped = shard_map(
        lambda q, k, v, r: fn(q, k, v, dropout_rng=r),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(),),
        out_specs=P(None, None, "seq", None))
    a = wrapped(q[:, :, zig], k[:, :, zig], v[:, :, zig], key)
    b = wrapped(q[:, :, zig], k[:, :, zig], v[:, :, zig], key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    base = run_ring(q, k, v, mesh, scale=0.25, causal=True)
    inv = np.argsort(zig)
    assert not np.allclose(np.asarray(a)[:, :, inv], np.asarray(base),
                           atol=1e-3)
