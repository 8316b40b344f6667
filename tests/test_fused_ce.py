"""Chunked fused vocab-head CE == the full-logits loss (values and grads).

chunked_cross_entropy computes the training loss without materializing the
fp32 (B, T, V) logits tensor; these tests pin exact agreement (up to fp32
summation order) with the cross_entropy_loss reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.models import Transformer
from pasero_tpu.models.transformer import (chunked_cross_entropy,
                                           cross_entropy_loss)

V, E, B, T = 97, 32, 4, 21   # T deliberately not divisible by the chunking


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, E)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(E, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    weights = jnp.asarray(rng.random((B, T)) > 0.2, jnp.float32)
    return x, kernel, targets, weights


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("chunks", [1, 4, 8])
def test_chunked_matches_full(smoothing, chunks):
    x, kernel, targets, weights = _data()
    full = cross_entropy_loss(jnp.dot(x, kernel), targets, weights, smoothing)
    chunked = chunked_cross_entropy(x, kernel, targets, weights, smoothing,
                                    num_chunks=chunks)
    for a, b in zip(chunked, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_chunked_gradients_match():
    x, kernel, targets, weights = _data(1)

    def full_loss(x, kernel):
        return cross_entropy_loss(jnp.dot(x, kernel), targets, weights,
                                  0.1)[0]

    def chunked_loss(x, kernel):
        return chunked_cross_entropy(x, kernel, targets, weights, 0.1,
                                     num_chunks=4)[0]

    gx_f, gk_f = jax.grad(full_loss, argnums=(0, 1))(x, kernel)
    gx_c, gk_c = jax.grad(chunked_loss, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gk_f),
                               rtol=1e-4, atol=1e-4)


def _tiny_model(tied, model_type="encoder_decoder"):
    cfg = get_model_config_cls("transformer")()
    cfg.set_defaults("translation" if model_type == "encoder_decoder"
                     else "language_modeling")
    cfg.encoder_layers = cfg.decoder_layers = 1
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = cfg.decoder_attention_heads = 2
    cfg.dropout = 0.0
    cfg.tied_output_projection = tied
    cfg.model_type = model_type
    cfg.ce_chunks = 4
    # fp32 compute: the parity check must not be swamped by bf16 noise in
    # the shared backbone (the paths differ only at the vocab head)
    return Transformer(cfg, src_vocab_size=64, tgt_vocab_size=64,
                       dtype=jnp.float32)


@pytest.mark.parametrize("tied", [True, False])
@pytest.mark.parametrize("model_type", ["encoder_decoder", "decoder"])
def test_model_fused_path_matches(tied, model_type):
    """Transformer.__call__ with fused_ce on/off: identical loss sums and
    identical parameter gradients, on tied and untied heads."""
    model = _tiny_model(tied, model_type)
    rng = np.random.default_rng(3)
    dec = jnp.asarray(rng.integers(4, 64, (2, 10)), jnp.int32)
    targets = jnp.asarray(rng.integers(4, 64, (2, 10)), jnp.int32)
    kwargs = {}
    if model_type == "encoder_decoder":
        kwargs["src_tokens"] = jnp.asarray(rng.integers(4, 64, (2, 8)),
                                           jnp.int32)
    params = model.init(jax.random.PRNGKey(0), decoder_input=dec,
                        **kwargs)["params"]

    def loss(params, fused):
        model.cfg.fused_ce = fused
        out = model.apply({"params": params}, decoder_input=dec,
                          targets=targets, **kwargs)
        return out["loss_sum"]

    l_fused, g_fused = jax.value_and_grad(loss)(params, True)
    l_full, g_full = jax.value_and_grad(loss)(params, False)
    # untied heads: Linear accumulates its logits matmul in bf16 while the
    # fused path accumulates fp32 (strictly more precise) -> ~1e-4 relative
    np.testing.assert_allclose(float(l_fused), float(l_full),
                               rtol=5e-4, atol=1e-2)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    flat_o = jax.tree_util.tree_leaves(g_full)
    assert len(flat_f) == len(flat_o)
    for a, b in zip(flat_f, flat_o):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_fused_param_tree_identical():
    """The fused path must not change the parameter tree (checkpoints and
    shardings depend on it) — the dummy head instantiation keeps
    output_projection/kernel in place for untied heads."""
    model = _tiny_model(tied=False, model_type="decoder")
    dec = jnp.ones((2, 8), jnp.int32)
    model.cfg.fused_ce = True
    with_targets = model.init(jax.random.PRNGKey(0), decoder_input=dec,
                              targets=dec)["params"]
    model.cfg.fused_ce = False
    without = model.init(jax.random.PRNGKey(0), decoder_input=dec)["params"]
    paths_a = {"/".join(str(k) for k in p)
               for p, _ in jax.tree_util.tree_leaves_with_path(with_targets)}
    paths_b = {"/".join(str(k) for k in p)
               for p, _ in jax.tree_util.tree_leaves_with_path(without)}
    assert paths_a == paths_b
