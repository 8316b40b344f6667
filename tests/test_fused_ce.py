"""Flash cross-entropy (ops/fused_ce.py) parity vs the full-logits path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.models.transformer import cross_entropy_loss
from pasero_tpu.ops.fused_ce import fused_cross_entropy


def reference(x, w, targets, weights, ls):
    logits = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return cross_entropy_loss(logits[None], targets[None], weights[None], ls)


@pytest.mark.parametrize("ls", [0.0, 0.1])
@pytest.mark.parametrize("shape", [(64, 32, 100), (130, 48, 515)])
def test_fused_ce_loss_and_grads(ls, shape):
    N, E, V = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, E)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, V)) * 0.05, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    weights = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))

    def f_ref(x, w):
        loss, nll, den = reference(x, w, targets, weights, ls)
        return loss / den, (nll, den)

    def f_fused(x, w):
        loss, nll, den = fused_cross_entropy(x, w, targets, weights, ls)
        return loss / den, (nll, den)

    (l0, (n0, d0)), g0 = jax.value_and_grad(f_ref, argnums=(0, 1),
                                            has_aux=True)(x, w)
    (l1, (n1, d1)), g1 = jax.value_and_grad(f_fused, argnums=(0, 1),
                                            has_aux=True)(x, w)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(n0), float(n1), rtol=1e-5)
    assert float(d0) == float(d1)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               rtol=2e-2, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=2e-2, atol=2e-5)


@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_fused_ce_split_backward_parity(ls, monkeypatch):
    """E >= 2048 selects the split dx/dW backward (no dW partials; the
    fused form VMEM-OOMed llama_1b at 16k tokens on chip). Asserts the
    split path actually ran (round-3 advice: at E=2048 a strict `>`
    heuristic silently kept the fused path, leaving the split untested)."""
    import pasero_tpu.ops.fused_ce as fused_ce_mod
    calls = []
    real_split = fused_ce_mod._bwd_split
    monkeypatch.setattr(fused_ce_mod, "_bwd_split",
                        lambda *a, **k: (calls.append(1), real_split(*a, **k))[1])
    N, E, V = 48, 2048, 330
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(N, E)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(E, V)) * 0.02, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    weights = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))

    def f_ref(x, w):
        loss, _, den = reference(x, w, targets, weights, ls)
        return loss / den

    def f_fused(x, w):
        loss, _, den = fused_cross_entropy(x, w, targets, weights, ls)
        return loss / den

    l0, g0 = jax.value_and_grad(f_ref, argnums=(0, 1))(x, w)
    l1, g1 = jax.value_and_grad(f_fused, argnums=(0, 1))(x, w)
    assert calls, "split backward was not selected at E=2048"
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                               rtol=2e-2, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=2e-2, atol=2e-5)


def test_fused_ce_bf16_matches_fp32_direction():
    N, E, V = 256, 64, 1000
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, E)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(E, V)) * 0.05, jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    weights = jnp.ones((N,), jnp.float32)

    loss, nll, den = fused_cross_entropy(x, w, targets, weights, 0.1)
    l_ref, n_ref, _ = reference(x.astype(jnp.float32), w, targets, weights,
                                0.1)
    np.testing.assert_allclose(float(loss), float(l_ref), rtol=5e-3)
    assert loss.dtype == jnp.float32 and float(den) == N


def test_fused_head_argmax_matches_explicit():
    """The greedy decode head (argmax + logprob, logits never in HBM) is
    bit-identical to argmax/log_softmax on materialized logits, including
    first-occurrence tie-breaking and non-multiple-of-block shapes."""
    from pasero_tpu.ops.fused_ce import fused_head_argmax
    rng = np.random.default_rng(7)
    for N, E, V in [(8, 64, 1000), (48, 128, 333), (130, 32, 4097)]:
        x = jnp.asarray(rng.normal(size=(N, E)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(E, V)) * 0.05, jnp.float32)
        tok, lp = fused_head_argmax(x, w)
        logits = x @ w
        np.testing.assert_array_equal(np.asarray(tok),
                                      np.argmax(np.asarray(logits), axis=-1))
        ref_lp = np.take_along_axis(
            np.asarray(jax.nn.log_softmax(logits, -1)),
            np.asarray(tok)[:, None], axis=1)[:, 0]
        np.testing.assert_allclose(np.asarray(lp), ref_lp, atol=1e-5)

    # exact ties: duplicate columns -> the smaller vocab index must win
    x = jnp.ones((4, 16), jnp.float32)
    w = jnp.zeros((16, 300), jnp.float32)
    w = w.at[:, 7].set(1.0).at[:, 250].set(1.0)   # same score, two columns
    tok, _ = fused_head_argmax(x, w)
    assert np.all(np.asarray(tok) == 7)
