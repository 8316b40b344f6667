"""Model tests: forward shapes/losses, KV-cache decode parity, positional variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.models.positional import (alibi_bias, alibi_slopes, apply_rope,
                                          sinusoidal_table, t5_bucket)
from pasero_tpu.models.transformer import Transformer, positions_from_mask

RNG = jax.random.PRNGKey(0)


def small_cfg(arch="transformer_small", task="translation", **overrides):
    cfg = get_model_config_cls(arch)()
    cfg.set_defaults(task)
    cfg.encoder_layers = cfg.decoder_layers = 2
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = cfg.decoder_attention_heads = 4
    cfg.dropout = 0.0
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def make_batch(B=2, S=7, T=9, vocab=50, pad=1):
    rng = np.random.default_rng(0)
    src = rng.integers(4, vocab, (B, S))
    dec = rng.integers(4, vocab, (B, T))
    src[0, -2:] = pad  # right padding on the source
    return jnp.array(src), jnp.array(dec)


def test_positions_from_mask():
    mask = jnp.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 0]], dtype=bool)
    pos = positions_from_mask(mask)
    assert pos[0].tolist() == [0, 0, 0, 1, 2]
    assert pos[1].tolist() == [0, 1, 2, 3, 3]


def test_sinusoidal_matches_shape():
    table = sinusoidal_table(16, 8, shift=2)
    assert table.shape == (16, 8)
    assert np.allclose(table[0, 0], np.sin(2.0), atol=1e-6)  # shifted by 2


def test_rope_relative_property():
    """RoPE: scores depend only on relative distance."""
    q = jax.random.normal(RNG, (1, 2, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 8))
    pos = jnp.arange(4)[None]
    q1, k1 = apply_rope(q, pos), apply_rope(k, pos)
    q2, k2 = apply_rope(q, pos + 7), apply_rope(k, pos + 7)
    # score the rotated vectors in numpy (JAX's default matmul precision on
    # some backends demotes f32 einsums to bf16)
    s1 = np.einsum("bhqd,bhkd->bhqk", np.asarray(q1), np.asarray(k1))
    s2 = np.einsum("bhqd,bhkd->bhqk", np.asarray(q2), np.asarray(k2))
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_alibi_slopes_and_bias():
    slopes = alibi_slopes(8, max_bias=8)
    assert np.allclose(slopes[0], 0.5) and np.allclose(slopes[-1], 2 ** -8)
    pos = jnp.arange(5)[None]
    bias = alibi_bias(8, pos, pos, causal=True)
    assert bias.shape == (1, 8, 5, 5)
    assert np.allclose(bias[0, 0, 3, 3], 0.0)
    assert np.allclose(bias[0, 0, 3, 1], -0.5 * 2)
    enc = alibi_bias(8, pos, pos, causal=False)
    # first half heads can't see the future, second half can't see the past
    assert enc[0, 0, 1, 3] <= -1e8 and enc[0, 7, 3, 1] <= -1e8


def test_t5_buckets():
    rel = jnp.array([[0, -1, -5, -40, 5, 100]])
    causal = t5_bucket(rel, bidirectional=False)
    assert causal[0, 0] == 0 and causal[0, 1] == 1
    assert causal[0, 4] == 0  # future positions clamp to 0 in causal mode
    bidir = t5_bucket(rel, bidirectional=True)
    assert bidir[0, 1] != bidir[0, 4]  # direction is distinguished


@pytest.mark.parametrize("arch,task", [
    ("transformer_small", "translation"),
    ("t5_base", "translation"),
    ("bloom_560m", "language_modeling"),
    ("llama_7b", "language_modeling"),
    ("mpt_7b", "language_modeling"),
    ("falcon_7b", "language_modeling"),
])
def test_forward_finite(arch, task):
    overrides = {}
    if arch == "falcon_7b":
        overrides = dict(decoder_attention_heads=4, attention_heads_kv=1)
    if arch == "llama_7b":
        overrides = dict(attention_heads_kv=2)
    cfg = small_cfg(arch, task, **overrides)
    src, dec = make_batch(pad=max(cfg.padding_idx, 0))
    model = Transformer(cfg, src_vocab_size=50)
    kwargs = dict(decoder_input=dec, targets=dec)
    if cfg.model_type != "decoder":
        kwargs["src_tokens"] = src
    variables = model.init(RNG, **kwargs)
    out = model.apply(variables, **kwargs)
    assert np.isfinite(float(out["loss_sum"]))
    # with targets the fused-CE path skips logits; the logits-only forward
    # still produces them
    logit_out = model.apply(variables,
                            **{k: v for k, v in kwargs.items()
                               if k != "targets"})
    assert logit_out["logits"].shape == (2, 9, 50)


def _greedy_from_full(model, variables, dec, src=None):
    kwargs = dict(decoder_input=dec)
    if src is not None:
        kwargs["src_tokens"] = src
    return model.apply(variables, **kwargs)["logits"]


@pytest.mark.parametrize("arch,task,overrides", [
    ("transformer_small", "translation", {}),
    ("llama_7b", "language_modeling", {"attention_heads_kv": 2}),
    ("bloom_560m", "language_modeling", {}),
    ("t5_base", "translation", {}),  # learned relative bias over cache slots
])
def test_incremental_decode_matches_full(arch, task, overrides):
    """Token-by-token decoding with the KV cache reproduces the full forward."""
    cfg = small_cfg(arch, task, **overrides)
    B, S, T, V = 2, 7, 9, 50
    src, dec = make_batch(B, S, T, V, pad=max(cfg.padding_idx, 0))
    cache_len = 16
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=cache_len,
                        cross_cache_len=S)
    is_encdec = cfg.model_type != "decoder"

    kwargs = dict(decoder_input=dec)
    if is_encdec:
        kwargs["src_tokens"] = src
    variables = model.init(RNG, **kwargs)
    params = variables["params"]
    full_logits = _greedy_from_full(model, {"params": params}, dec,
                                    src if is_encdec else None)

    encoder_out = encoder_mask = None
    if is_encdec:
        encoder_out, encoder_mask = model.apply(
            {"params": params}, src, method=Transformer.encode)

    # incremental: feed one token at a time
    cache = {}
    step_logits = []
    for t in range(T):
        tokens = dec[:, t:t + 1]
        positions = jnp.full((B, 1), t, dtype=jnp.int32)
        outs, mutated = model.apply(
            {"params": params, **cache}, tokens,
            encoder_out=encoder_out, encoder_mask=encoder_mask,
            positions=positions, tgt_mask=jnp.ones((B, 1), bool),
            method=Transformer.decode_step, mutable=["cache"])
        cache = {"cache": mutated["cache"]}
        step_logits.append(outs)
    inc_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full_logits), np.asarray(inc_logits),
                               atol=2e-2, rtol=2e-2)


def test_speech_encoder_forward():
    cfg = small_cfg("whisper_base", "speech_translation")
    cfg.input_dim = cfg.conv_input_dim = 16
    cfg.conv_channels = 32
    cfg.conv_kernel_sizes = [3, 3]
    cfg.conv_strides = [1, 2]
    feats = jnp.array(np.random.default_rng(0).normal(size=(2, 20, 16)),
                      dtype=jnp.float32)
    dec = jnp.array(np.random.default_rng(1).integers(4, 50, (2, 6)))
    model = Transformer(cfg, src_vocab_size=50)
    variables = model.init(RNG, src_tokens=feats, decoder_input=dec, targets=dec)
    out = model.apply(variables, src_tokens=feats, decoder_input=dec, targets=dec)
    assert np.isfinite(float(out["loss_sum"]))


def test_prompt_loss_weighting():
    cfg = small_cfg("llama_7b", "language_modeling", prompt_loss=0.0)
    _, dec = make_batch(pad=0)
    prompt_mask = jnp.zeros_like(dec, dtype=bool).at[:, :4].set(True)
    model = Transformer(cfg, src_vocab_size=50)
    variables = model.init(RNG, decoder_input=dec, targets=dec)
    with_mask = model.apply(variables, decoder_input=dec, targets=dec,
                            prompt_mask=prompt_mask)
    without = model.apply(variables, decoder_input=dec, targets=dec)
    assert float(with_mask["loss_sum"]) < float(without["loss_sum"])


def test_lora_params_created():
    cfg = small_cfg("transformer_small", "translation", lora_rank=4)
    src, dec = make_batch()
    model = Transformer(cfg, src_vocab_size=50)
    variables = model.init(RNG, src_tokens=src, decoder_input=dec, targets=dec)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = [jax.tree_util.keystr(path) for path, _ in flat]
    assert any("lora_down" in n for n in names)
    assert any("lora_up" in n for n in names)


@pytest.mark.parametrize("arch,task", [
    ("transformer_small", "translation"),      # encoder remat + decoder remat
    ("llama_7b", "language_modeling"),          # decoder-only remat
])
def test_checkpoint_activations_parity(arch, task):
    """--checkpoint-activations (remat) must not change loss or grads."""
    overrides = {"attention_heads_kv": 2} if arch == "llama_7b" else {}
    cfg = small_cfg(arch, task, **overrides)
    src, dec = make_batch(pad=max(cfg.padding_idx, 0))
    kwargs = dict(decoder_input=dec, targets=dec)
    if cfg.model_type != "decoder":
        kwargs["src_tokens"] = src

    import copy
    cfg_remat = copy.deepcopy(cfg)
    cfg_remat.checkpoint_activations = True
    # fp32 compute: remat must be *exactly* the same math (bf16 only adds
    # fusion-order rounding noise that would mask a mis-wired argument)
    m_plain = Transformer(cfg, src_vocab_size=50, dtype=jnp.float32)
    m_remat = Transformer(cfg_remat, src_vocab_size=50, dtype=jnp.float32)
    variables = m_plain.init(RNG, **kwargs)

    def loss(m):
        def f(params):
            return m.apply({"params": params}, **kwargs)["loss_sum"]
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = loss(m_plain)
    l1, g1 = loss(m_remat)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-5)

    # the bf16 default still runs and matches on loss
    mb0 = Transformer(cfg, src_vocab_size=50)
    mb1 = Transformer(cfg_remat, src_vocab_size=50)
    vb = mb0.init(RNG, **kwargs)
    lb0 = mb0.apply(vb, **kwargs)["loss_sum"]
    lb1 = mb1.apply(vb, **kwargs)["loss_sum"]
    np.testing.assert_allclose(float(lb0), float(lb1), rtol=1e-5)

    # --checkpoint-interval 2 (remat every other layer only): same math
    cfg_half = copy.deepcopy(cfg_remat)
    cfg_half.checkpoint_interval = 2
    m_half = Transformer(cfg_half, src_vocab_size=50, dtype=jnp.float32)
    l2, g2 = loss(m_half)
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-5)
