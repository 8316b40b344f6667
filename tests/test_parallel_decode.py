"""Mesh-sharded inference: TP/DP decode must be token-identical to 1-device.

The reference supports exactly-one-of DP / TP / PP at inference
(pasero/decoding.py:103-108, cli/decode.py:47-164); here one GSPMD mesh
composes dp x tp, sharding parameters + KV cache over 'model' and batch rows
over 'data'. These tests run on the 8-device virtual CPU mesh (conftest).
"""

import json
import os

import jax
import numpy as np
import pytest
import yaml

from pasero_tpu import checkpoints
from pasero_tpu.config import DecodingAPIConfig
from pasero_tpu.decoding.generator import TextGenerator

TINY = {
    "encoder_layers": 2, "decoder_layers": 2, "embed_dim": 32,
    "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
    "encoder_attention_heads": 4, "decoder_attention_heads": 4,
    "dropout": 0.0,
}

INPUTS = ["w1 w2 w3", "w4 w5", "w6 w7 w8 w9", "w2 w2 w1", "w9 w3"]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh_decode_model")
    with open(d / "dict.txt", "w") as f:
        for i in range(28):
            print(f"w{i} 0", file=f)
    with open(d / "config.json", "w") as f:
        json.dump({"arch": "transformer_small", **TINY}, f)
    with open(d / "inference.yaml", "w") as f:
        yaml.safe_dump({"task": "translation", "tokenizer": "none",
                        "source_lang": "de", "target_lang": "en"}, f)
    # init parameters through the generator's own model factory so shapes
    # (vocab size from dict.txt) match exactly, then save as a checkpoint;
    # a placeholder model_last satisfies config checkpoint resolution and is
    # re-pointed at the real weights by save_checkpoint below
    np.savez(d / "model_last.npz", placeholder=np.zeros(1))
    cfg = DecodingAPIConfig(model=str(d), strict=True, dtype="float32")
    gen = TextGenerator(cfg, start=False)
    model = gen._make_model()
    import jax.numpy as jnp
    example = {"decoder_input": jnp.zeros((1, 4), jnp.int32),
               "src_tokens": jnp.zeros((1, 4), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **example)["params"]
    from flax import linen as nn
    params = nn.meta.unbox(params)
    # train the tiny model on a synthetic copy task: a *trained* model has
    # sharply peaked distributions, so beam/greedy rankings are decided by
    # real probability gaps, not the reduction-order noise TP legitimately
    # introduces (a random-init model is all near-ties)
    params = _train_copy(model, params, gen.task.eos_idx)
    checkpoints.save_checkpoint(str(d), 10, params)
    return str(d)


def _train_copy(model, params, eos, steps=250):
    import jax.numpy as jnp
    import optax
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    B, S = 16, 6

    @jax.jit
    def step(params, opt, rng):
        x = jax.random.randint(rng, (B, S), 4, 32)
        dec_in = jnp.concatenate([jnp.full((B, 1), eos, jnp.int32), x], axis=1)
        tgt = jnp.concatenate([x, jnp.full((B, 1), eos, jnp.int32)], axis=1)

        def loss_fn(p):
            logits = model.apply({"params": p}, src_tokens=x,
                                 decoder_input=dec_in)["logits"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    rng = jax.random.PRNGKey(1)
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        params, opt, loss = step(params, opt, k)
    assert float(loss) < 0.5, f"copy task did not converge (loss {float(loss)})"
    return params


def decode_all(model_dir, **kw):
    gen = TextGenerator.build(model_dir, dtype="float32", seed=5, **kw)
    hyps = gen.decode(INPUTS, return_scores=True, max_output_len=12)
    return [(h[0]["tokens"], h[0]["detok"]) for h in hyps]


@pytest.fixture(scope="module")
def baseline(model_dir):
    return {1: decode_all(model_dir, beam_size=1),
            3: decode_all(model_dir, beam_size=3)}


@pytest.mark.parametrize("mesh_kw", [
    {"tp_size": 2},
    {"dp_size": 2},
    {"dp_size": 2, "tp_size": 2},
])
@pytest.mark.parametrize("beam", [1, 3])
def test_sharded_decode_token_identical(model_dir, baseline, mesh_kw, beam):
    got = decode_all(model_dir, beam_size=beam, **mesh_kw)
    for row, (exp, act) in enumerate(zip(baseline[beam], got)):
        assert act[0] == exp[0], \
            f"{mesh_kw} beam={beam} row {row}: tokens differ ({act} vs {exp})"
        assert act[1] == exp[1]


def test_sharded_generator_reports_mesh(model_dir):
    gen = TextGenerator.build(model_dir, dtype="float32",
                              dp_size=2, tp_size=2)
    assert gen.mesh is not None
    assert gen.mesh.shape["data"] == 2 and gen.mesh.shape["model"] == 2
    # parameters actually live sharded: a TP-sharded kernel must not be
    # fully replicated on a single device
    flat = jax.tree_util.tree_leaves_with_path(gen.params)
    sharded = [leaf for path, leaf in flat
               if "fc1" in jax.tree_util.keystr(path)
               and hasattr(leaf, "sharding")
               and not leaf.sharding.is_fully_replicated]
    assert sharded, "expected at least the FFN kernels to be TP-sharded"


def test_devices_flag_maps_to_tp(model_dir, baseline):
    """--devices N (the reference's inference pipeline-parallel flag,
    transformer.py:594-607) maps onto a TP mesh of that size."""
    got = decode_all(model_dir, beam_size=1, devices=["2"])
    for (exp, _), (act, _) in zip(baseline[1], got):
        assert act == exp


def test_mesh_too_big_raises(model_dir):
    with pytest.raises(AssertionError, match="needs more devices"):
        TextGenerator.build(model_dir, tp_size=16)
