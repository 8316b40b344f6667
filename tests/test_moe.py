"""MoE tests: gating math, fused vs basic parity, expert-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.models import Transformer
from pasero_tpu.models.moe import MoEFeedForward, moe_expert_count
from pasero_tpu.ops.moe import combine_tokens, dispatch_tokens, top2_gating

RNG = jax.random.PRNGKey(0)


def test_top2_gating_properties():
    logits = jax.random.normal(RNG, (32, 4))
    out = top2_gating(logits)
    dispatch, combine = out["dispatch"], out["combine"]
    assert dispatch.shape == (32, 4, out["capacity"])
    # each token goes to at most 2 expert slots
    per_token = dispatch.sum(axis=(1, 2))
    assert (per_token <= 2).all()
    # combine weights sum to ~1 for dispatched tokens
    weights = np.asarray(combine.sum(axis=(1, 2)))
    assert ((weights > 0.99) | (weights == 0)).all()
    # no slot used twice within an expert
    slot_usage = np.asarray(dispatch.sum(axis=0))
    assert (slot_usage <= 1).all()
    assert np.isfinite(float(out["aux_loss"]))


def test_top2_gating_respects_padding():
    logits = jax.random.normal(RNG, (8, 4))
    pad = jnp.array([True] * 4 + [False] * 4)
    out = top2_gating(logits, pad_mask=pad)
    assert float(out["combine"][4:].sum()) == 0.0


def test_capacity_drops_overflow():
    # all tokens prefer expert 0; capacity forces drops
    logits = jnp.tile(jnp.array([[10.0, 0.0, 0.0, 0.0]]), (64, 1))
    out = top2_gating(logits, capacity=4)
    used = np.asarray(out["dispatch"][:, 0].sum(axis=0))
    assert used.sum() <= 4


def test_dispatch_combine_roundtrip():
    T, E, D = 16, 4, 8
    logits = jax.random.normal(RNG, (T, E)) * 5
    out = top2_gating(logits, capacity=T)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, D))
    expert_in = dispatch_tokens(x, out["dispatch"])
    back = combine_tokens(expert_in, out["combine"])
    # identity experts: combine(dispatch(x)) == x (weights sum to 1, no drops)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_gather_dispatch_matches_einsum():
    """The scatter/gather dispatch (single-chip fast path) is numerically
    identical to the one-hot einsum dispatch — outputs AND gradients —
    including capacity drops."""
    from pasero_tpu.ops.moe import (combine_tokens_gather,
                                    dispatch_tokens_gather)
    T, E, D, C = 32, 4, 8, 6       # C < 2T/E: forces drops
    logits = jax.random.normal(RNG, (T, E)) * 3
    pad = jnp.asarray([True] * (T - 3) + [False] * 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, D))

    def via_einsum(x):
        g = top2_gating(logits, pad_mask=pad, capacity=C)
        ein = dispatch_tokens(x, g["dispatch"])
        return combine_tokens(ein * 2.0, g["combine"])  # fake expert = *2

    def via_gather(x):
        g = top2_gating(logits, pad_mask=pad, capacity=C, compact=True)
        gat = dispatch_tokens_gather(x, g["routing"], E, C)
        return combine_tokens_gather(gat * 2.0, g["routing"])

    y_e, y_g = via_einsum(x), via_gather(x)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_e), atol=1e-5)
    g_e = jax.grad(lambda x: jnp.sum(via_einsum(x) ** 2))(x)
    g_g = jax.grad(lambda x: jnp.sum(via_gather(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_e), atol=1e-5)

    # the expert inputs themselves agree slot-for-slot
    g = top2_gating(logits, pad_mask=pad, capacity=C)
    gc = top2_gating(logits, pad_mask=pad, capacity=C, compact=True)
    np.testing.assert_allclose(
        np.asarray(dispatch_tokens_gather(x, gc["routing"], E, C)),
        np.asarray(dispatch_tokens(x, g["dispatch"])), atol=1e-5)


@pytest.mark.parametrize("dispatch", ["gather", "einsum"])
def test_moe_layer_dispatch_modes_agree(dispatch):
    layer = MoEFeedForward(num_experts=4, ffn_dim=32, impl="fused",
                           dispatch=dispatch, capacity_factor=2.0)
    x = jax.random.normal(RNG, (2, 8, 16), jnp.float32)
    mask = jnp.ones((2, 8), bool)
    variables = layer.init(RNG, x, pad_mask=mask)
    out = layer.apply(variables, x, pad_mask=mask)
    ref_layer = MoEFeedForward(num_experts=4, ffn_dim=32, impl="fused",
                               dispatch="einsum", capacity_factor=2.0)
    ref = ref_layer.apply(variables, x, pad_mask=mask)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_moe_expert_count_placement():
    cfg = get_model_config_cls("moe_transformer")()
    cfg.decoder_expert_count = 4
    cfg.decoder_expert_interval = 2
    assert moe_expert_count(cfg, 0, True) == 0
    assert moe_expert_count(cfg, 1, True) == 4
    cfg.decoder_expert_layer_ids = [0]
    assert moe_expert_count(cfg, 0, True) == 4
    assert moe_expert_count(cfg, 1, True) == 0
    dense = get_model_config_cls("transformer")()
    assert moe_expert_count(dense, 0, True) == 0


@pytest.mark.parametrize("impl", ["fused", "sharded"])
def test_moe_layer_runs(impl):
    layer = MoEFeedForward(num_experts=4, ffn_dim=32, impl=impl,
                           load_balancing=0.01, capacity_factor=2.0)
    x = jax.random.normal(RNG, (2, 8, 16), jnp.float32)
    mask = jnp.ones((2, 8), bool)
    variables = layer.init(RNG, x, pad_mask=mask)
    out, mutated = layer.apply(variables, x, pad_mask=mask,
                               mutable=["losses", "gate_stats"])
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert "losses" in mutated and "gate_stats" in mutated


def test_moe_transformer_trains():
    cfg = get_model_config_cls("moe_transformer_small")()
    cfg.set_defaults("translation")
    cfg.encoder_layers = cfg.decoder_layers = 2
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = cfg.decoder_attention_heads = 4
    cfg.encoder_expert_count = cfg.decoder_expert_count = 4
    cfg.load_balancing = 0.01
    cfg.dropout = 0.0
    model = Transformer(cfg, src_vocab_size=50)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 50, (2, 6)))
    dec = jnp.asarray(rng.integers(4, 50, (2, 7)))
    variables = model.init(RNG, src_tokens=src, decoder_input=dec, targets=dec)
    # MoE params present with expert axis
    flat = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert any("experts_in" in k and v[0] == 4 for k, v in flat.items())

    def loss_fn(params):
        out, mutated = model.apply({"params": params}, src_tokens=src,
                                   decoder_input=dec, targets=dec,
                                   mutable=["losses"])
        aux = sum(jax.tree_util.tree_leaves(mutated.get("losses", {})))
        return out["loss_sum"] + aux

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0  # experts receive gradient


def test_moe_expert_parallel_sharding():
    """'sharded' impl over an 8-device mesh with a real expert axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pasero_tpu.parallel import make_mesh
    from flax import linen as nn

    mesh = make_mesh(dp_size=2, tp_size=1, ep_size=4)
    layer = MoEFeedForward(num_experts=8, ffn_dim=64, impl="sharded",
                           capacity_factor=2.0)
    x = jax.random.normal(RNG, (4, 8, 32), jnp.float32)

    variables = layer.init(RNG, x)
    specs = nn.get_partition_spec(variables)["params"]
    from pasero_tpu.parallel.sharding import LOGICAL_RULES
    resolved = jax.tree_util.tree_map(
        lambda s: nn.logical_to_mesh_axes(s, rules=list(LOGICAL_RULES)),
        specs, is_leaf=lambda s: isinstance(s, P))
    # expert weights are sharded over the expert axis
    assert resolved["experts_in"][0] == "expert"

    params = nn.meta.unbox(variables)["params"]
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, P(*s)), resolved,
        is_leaf=lambda s: isinstance(s, P))
    params = jax.device_put(params, shardings)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def forward(params, x):
        return layer.apply({"params": params}, x)

    with mesh:
        out = forward(params, x_sharded)
    assert np.isfinite(np.asarray(out, np.float32)).all()
