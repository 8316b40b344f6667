"""Weight-only int8 inference (--quantize int8, ops/quantize.py).

The reference has no quantization story; this is a beyond-reference
capability for the weight-bound decode regime (PERFORMANCE.md 1B
section). Tests pin: kernel-vs-dequantize exactness, tree surgery,
Linear integration, and end-to-end decode equivalence on a trained tiny
model (peaked distributions -> int8 rounding must not flip tokens).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from pasero_tpu.ops.quantize import (QTensor, dequantize, int8_matmul,
                                     quantize, quantize_params,
                                     quantized_bytes)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    # per-column scales: make column magnitudes wildly different to prove
    # the per-channel part matters
    w = rng.normal(size=(256, 128)).astype(np.float32)
    w *= np.logspace(-3, 3, 128)[None, :].astype(np.float32)
    t = quantize(jnp.asarray(w))
    assert t.q.dtype == jnp.int8 and t.scale.shape == (1, 128)
    deq = np.asarray(dequantize(t))
    col_err = np.abs(deq - w).max(axis=0) / np.abs(w).max(axis=0)
    assert col_err.max() < 0.005, "per-channel error must stay ~1/254"


@pytest.mark.parametrize("M,K,N", [
    (8, 512, 1024),     # decode-like: tiny M, kernel path
    (300, 512, 512),    # row tail (300 % 16 != 0)
    (4, 512, 5632),     # llama-style ffn dim (512-indivisible, 256 works)
    (3, 100, 52),       # no block divisor -> XLA fallback
])
def test_int8_matmul_matches_dequantized_dot(M, K, N):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    t = quantize(jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)))
    ref = x @ dequantize(t)
    out = int8_matmul(x, t)
    assert out.shape == (M, N)
    # K-blocked f32 accumulation reassociates vs the single XLA dot
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_matmul_leading_dims_and_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 256)), jnp.bfloat16)
    t = quantize(jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32)))
    out = int8_matmul(x, t)
    assert out.shape == (2, 5, 512) and out.dtype == jnp.bfloat16
    ref = (x.astype(jnp.float32).reshape(10, 256) @ dequantize(t)).reshape(
        2, 5, 512)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_quantize_params_tree_surgery():
    params = {
        "fc1": {"kernel": jnp.ones((512, 256)), "bias": jnp.zeros((256,))},
        "embed_tokens": {"embedding": jnp.ones((300, 256))},
        "tiny": {"q_proj": {"kernel": jnp.ones((4, 4))}},   # below min_size
        "norm": {"scale": jnp.ones((512,))},                # wrong name
        "moe": {"fc1": {"kernel": jnp.ones((2, 512, 256))}},  # 3D: skipped
        # QTensor-UNAWARE consumers must be left alone even when the leaf
        # is named 'kernel'/'embedding': flax LSTM cells (hybrid decoder)
        # and learned positional tables crash at trace time on a QTensor
        "lstm": {"hi": {"kernel": jnp.ones((512, 256))}},
        "embed_positions": {"embedding": jnp.ones((300, 256))},
    }
    qp, n = quantize_params(params, min_size=1024)
    assert n == 2
    assert isinstance(qp["fc1"]["kernel"], QTensor)
    assert isinstance(qp["embed_tokens"]["embedding"], QTensor)
    assert isinstance(qp["tiny"]["q_proj"]["kernel"], jax.Array)
    assert isinstance(qp["moe"]["fc1"]["kernel"], jax.Array)
    assert isinstance(qp["lstm"]["hi"]["kernel"], jax.Array)
    assert isinstance(qp["embed_positions"]["embedding"], jax.Array)
    # QTensor is pytree-transparent: device_put / tree_map must descend
    moved = jax.device_put(qp)
    assert isinstance(moved["fc1"]["kernel"], QTensor)
    qb, fb = quantized_bytes(qp)
    assert qb == (512 * 256 + 256 * 4) + (300 * 256 + 300 * 4)
    # a blanket astype map over leaves must not break (astype -> self)
    jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        qp, is_leaf=lambda x: isinstance(x, QTensor))


def test_quantize_pads_odd_dims_and_stays_exact():
    """NLLB-style vocab (not a multiple of 128): the matmul wrappers pad
    indivisible dims to block multiples inside the jit so the kernels keep
    an even block decomposition — the old code silently fell back to a
    full per-call dequantization."""
    from pasero_tpu.ops.quantize import embedding_lookup, int8_matmul_t
    rng = np.random.default_rng(7)
    V, E = 250, 100                             # both indivisible by 128
    table = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    t = quantize(table, axis=1)
    assert t.q.shape == (V, E) and t.shape == (V, E)
    x = jnp.asarray(rng.normal(size=(5, E)).astype(np.float32))
    ref = x @ dequantize(t).T
    out = int8_matmul_t(x, t)
    assert out.shape == (5, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    ids = jnp.asarray([[0, V - 1, 7]], jnp.int32)
    np.testing.assert_allclose(
        np.asarray(embedding_lookup(t, ids, jnp.float32)),
        np.asarray(jnp.take(dequantize(t), ids, axis=0)), rtol=1e-6,
        atol=1e-6)
    # column-quantized odd kernel through the forward orientation
    w = jnp.asarray(rng.normal(size=(100, 52)).astype(np.float32))
    t2 = quantize(w, axis=0)
    x2 = jnp.asarray(rng.normal(size=(3, 100)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(int8_matmul(x2, t2)),
                               np.asarray(x2 @ dequantize(t2)),
                               rtol=1e-4, atol=1e-4)


def test_linear_uses_qtensor():
    from flax import linen as nn
    from pasero_tpu.models.modules import Linear
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    m = Linear(features=512, dtype=jnp.float32, kernel_axes=("embed", "mlp"))
    p = nn.meta.unbox(m.init(jax.random.PRNGKey(0), x))
    base = m.apply(p, x)
    p["params"]["kernel"] = quantize(p["params"]["kernel"])
    qout = m.apply(p, x)
    ref = x @ dequantize(p["params"]["kernel"]) + p["params"]["bias"]
    np.testing.assert_allclose(np.asarray(qout), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    rel = np.abs(np.asarray(qout - base)).max() / np.abs(base).max()
    assert rel < 0.02


def test_int8_matmul_t_matches_dequantized():
    from pasero_tpu.ops.quantize import int8_matmul_t
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    t = quantize(table, axis=1)                     # per-row (vocab) scales
    assert t.scale.shape == (512, 1)
    ref = x @ dequantize(t).T
    out = int8_matmul_t(x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_embedding_lookup_dequantizes_rows():
    from pasero_tpu.ops.quantize import embedding_lookup
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    t = quantize(table, axis=1)
    ids = jnp.asarray([[0, 5, 63], [7, 7, 1]], jnp.int32)
    out = embedding_lookup(t, ids, jnp.float32)
    ref = jnp.take(dequantize(t), ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("orientation", ["row", "col"])
def test_fused_head_argmax_q8(orientation):
    from pasero_tpu.ops.fused_ce import fused_head_argmax
    rng = np.random.default_rng(6)
    E, V, N = 128, 1000, 24
    x = jnp.asarray(rng.normal(size=(N, E)).astype(np.float32))
    if orientation == "row":
        t = quantize(jnp.asarray(
            rng.normal(size=(V, E)).astype(np.float32)), axis=1)
        logits = np.asarray(x @ dequantize(t).T)
    else:
        t = quantize(jnp.asarray(
            rng.normal(size=(E, V)).astype(np.float32)), axis=0)
        logits = np.asarray(x @ dequantize(t))
    tok, lp = fused_head_argmax(x, t)
    np.testing.assert_array_equal(np.asarray(tok), logits.argmax(-1))
    ref_lp = (logits - np.log(np.exp(
        logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True))
        - logits.max(-1, keepdims=True))[np.arange(N), logits.argmax(-1)]
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=2e-4, atol=2e-4)


# -- end-to-end: decode with --quantize int8 --------------------------------

TINY = {
    "encoder_layers": 2, "decoder_layers": 2, "embed_dim": 32,
    "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
    "encoder_attention_heads": 4, "decoder_attention_heads": 4,
    "dropout": 0.0,
}
INPUTS = ["w1 w2 w3", "w4 w5", "w6 w7 w8 w9", "w2 w2 w1"]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from pasero_tpu import checkpoints
    from pasero_tpu.config import DecodingAPIConfig
    from pasero_tpu.decoding.generator import TextGenerator
    import optax
    from flax import linen as nn

    d = tmp_path_factory.mktemp("quantize_model")
    with open(d / "dict.txt", "w") as f:
        for i in range(28):
            print(f"w{i} 0", file=f)
    with open(d / "config.json", "w") as f:
        json.dump({"arch": "transformer_small", **TINY}, f)
    with open(d / "inference.yaml", "w") as f:
        yaml.safe_dump({"task": "translation", "tokenizer": "none",
                        "source_lang": "de", "target_lang": "en"}, f)
    np.savez(d / "model_last.npz", placeholder=np.zeros(1))
    cfg = DecodingAPIConfig(model=str(d), strict=True, dtype="float32")
    gen = TextGenerator(cfg, start=False)
    model = gen._make_model()
    example = {"decoder_input": jnp.zeros((1, 4), jnp.int32),
               "src_tokens": jnp.zeros((1, 4), jnp.int32)}
    params = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), **example))["params"]
    eos = gen.task.eos_idx
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    B, S = 16, 6

    @jax.jit
    def step(params, opt, rng):
        x = jax.random.randint(rng, (B, S), 4, 32)
        dec_in = jnp.concatenate([jnp.full((B, 1), eos, jnp.int32), x], 1)
        tgt = jnp.concatenate([x, jnp.full((B, 1), eos, jnp.int32)], 1)

        def loss_fn(p):
            logits = model.apply({"params": p}, src_tokens=x,
                                 decoder_input=dec_in)["logits"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    rng = jax.random.PRNGKey(1)
    for _ in range(250):
        rng, k = jax.random.split(rng)
        params, opt, loss = step(params, opt, k)
    assert float(loss) < 0.5
    checkpoints.save_checkpoint(str(d), 10, params)
    return str(d)


def _decode(model_dir, **kw):
    from pasero_tpu.decoding.generator import TextGenerator
    gen = TextGenerator.build(model_dir, dtype="float32", seed=5, **kw)
    hyps = gen.decode(INPUTS, return_scores=True, max_output_len=12)
    return gen, [(h[0]["tokens"], h[0]["score"]) for h in hyps]


@pytest.mark.parametrize("beam", [1, 3])
def test_quantized_decode_matches_fp32(model_dir, beam, monkeypatch):
    monkeypatch.setenv("PASERO_QUANTIZE_MIN_SIZE", "0")
    _, base = _decode(model_dir, beam_size=beam)
    gen, got = _decode(model_dir, beam_size=beam, quantize="int8")
    # the flag actually quantized something
    leaves = jax.tree_util.tree_leaves(
        gen.params, is_leaf=lambda x: isinstance(x, QTensor))
    n_q = sum(isinstance(x, QTensor) for x in leaves)
    assert n_q >= 8, f"expected the projection kernels quantized, got {n_q}"
    for row, (exp, act) in enumerate(zip(base, got)):
        assert act[0] == exp[0], \
            f"beam={beam} row {row}: int8 flipped tokens ({act} vs {exp})"
        assert abs(act[1] - exp[1]) < 0.05


def test_quantized_greedy_fused_head(model_dir, monkeypatch):
    """PASERO_FUSED_HEAD=1 forces the Pallas argmax head (interpret mode on
    CPU); with --quantize int8 and a tied embedding this exercises the int8
    row-quantized head through the real decode pipeline."""
    monkeypatch.setenv("PASERO_QUANTIZE_MIN_SIZE", "0")
    _, base = _decode(model_dir, beam_size=1)
    monkeypatch.setenv("PASERO_FUSED_HEAD", "1")
    _, got = _decode(model_dir, beam_size=1, quantize="int8")
    for row, (exp, act) in enumerate(zip(base, got)):
        assert act[0] == exp[0], \
            f"row {row}: fused int8 head flipped tokens ({act} vs {exp})"


def test_quantized_scoring_close(model_dir, monkeypatch):
    monkeypatch.setenv("PASERO_QUANTIZE_MIN_SIZE", "0")
    from pasero_tpu.decoding.generator import TextGenerator
    base = TextGenerator.build(model_dir, dtype="float32")
    quant = TextGenerator.build(model_dir, dtype="float32", quantize="int8")
    out_b = base.score(INPUTS[:2], ["w1 w2", "w4 w5"])
    out_q = quant.score(INPUTS[:2], ["w1 w2", "w4 w5"])
    for hb, hq in zip(out_b, out_q):
        assert abs(hb["score"] - hq["score"]) < 0.05


def test_quantize_rejects_mesh(model_dir, monkeypatch):
    monkeypatch.setenv("PASERO_QUANTIZE_MIN_SIZE", "0")
    from pasero_tpu.decoding.generator import TextGenerator
    with pytest.raises(ValueError, match="single-device"):
        TextGenerator.build(model_dir, dtype="float32", quantize="int8",
                            tp_size=2)
