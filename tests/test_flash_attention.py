"""Flash-attention kernel vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pasero_tpu.ops.flash_attention as fa
from pasero_tpu.models.attention import dot_product_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def make_qkv(B=2, H=4, Hkv=None, Sq=128, Sk=128, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv or H, Sk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv or H, Sk, D)), jnp.float32)
    return q, k, v


def reference(q, k, v, mask=None, bias=None, scale=1.0, causal=False,
              window=None):
    B, H, Sq, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    full_mask = mask
    if causal:
        c = jnp.tril(jnp.ones((Sq, Sk), bool))[None, None]
        full_mask = c if full_mask is None else (full_mask & c)
    if window is not None:
        pos_q = jnp.arange(Sq)[:, None]
        pos_k = jnp.arange(Sk)[None, :]
        w = ((pos_q - pos_k) < window)[None, None]
        full_mask = w if full_mask is None else (full_mask & w)
    return dot_product_attention(q, k, v, mask=full_mask, bias=bias,
                                 scale=scale)


def test_forward_full():
    q, k, v = make_qkv()
    out = fa.flash_attention(q, k, v, scale=0.125)
    ref = reference(q, k, v, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_forward_causal_and_padding():
    q, k, v = make_qkv(Sq=128, Sk=128)
    mask = jnp.ones((2, 1, 128, 128), bool).at[:, :, :, 100:].set(False)
    out = fa.flash_attention(q, k, v, mask=mask, scale=0.125, causal=True)
    ref = reference(q, k, v, mask=mask, scale=0.125, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_forward_unaligned_shapes():
    q, k, v = make_qkv(Sq=70, Sk=90, D=48)
    mask = jnp.ones((2, 1, 70, 90), bool).at[:, :, :, 80:].set(False)
    out = fa.flash_attention(q, k, v, mask=mask, scale=0.2)
    ref = reference(q, k, v, mask=mask, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_forward_gqa():
    q, k, v = make_qkv(H=8, Hkv=2)
    out = fa.flash_attention(q, k, v, scale=0.125, causal=True)
    ref = reference(q, k, v, scale=0.125, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_forward_bias_and_window():
    q, k, v = make_qkv(Sq=128, Sk=128)
    bias = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 128, 128)),
                       jnp.float32)
    out = fa.flash_attention(q, k, v, bias=bias, scale=0.125, causal=True,
                             window=32)
    ref = reference(q, k, v, bias=bias, scale=0.125, causal=True, window=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_backward_matches_xla():
    q, k, v = make_qkv(B=1, H=2, Sq=128, Sk=128, D=64)
    mask = jnp.ones((1, 1, 128, 128), bool).at[:, :, :, 110:].set(False)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, mask=mask, scale=0.125, causal=True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        out = reference(q, k, v, mask=mask, scale=0.125, causal=True)
        return jnp.sum(out * out)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"d{name} mismatch")


def test_backward_gqa():
    q, k, v = make_qkv(B=1, H=4, Hkv=2, Sq=128, Sk=128)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return inner

    flash_fn = lambda q, k, v: fa.flash_attention(q, k, v, scale=0.125)
    ref_fn = lambda q, k, v: reference(q, k, v, scale=0.125)
    g1 = jax.grad(loss(flash_fn), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)

def test_backward_bias_shared():
    # T5-style learned relative bias: shape (1, H, Sq, Sk), shared over batch
    q, k, v = make_qkv(B=2, H=2, Sq=128, Sk=128, D=64)
    bias = jnp.asarray(np.random.default_rng(5).normal(size=(1, 2, 128, 128)),
                       jnp.float32)
    mask = jnp.ones((2, 1, 128, 128), bool).at[:, :, :, 100:].set(False)

    def loss(fn):
        def inner(q, k, v, bias):
            return jnp.sum(fn(q, k, v, bias) ** 2)
        return inner

    flash_fn = lambda q, k, v, b: fa.flash_attention(
        q, k, v, mask=mask, bias=b, scale=0.125, causal=True)
    ref_fn = lambda q, k, v, b: reference(
        q, k, v, mask=mask, bias=b, scale=0.125, causal=True)
    g1 = jax.grad(loss(flash_fn), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss(ref_fn), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g1, g2, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"d{name} mismatch")


def test_backward_bias_per_sample_gqa():
    # per-sample bias (B, H, Sq, Sk) with GQA + sliding window
    q, k, v = make_qkv(B=2, H=4, Hkv=2, Sq=128, Sk=128, D=64)
    bias = jnp.asarray(np.random.default_rng(6).normal(size=(2, 4, 128, 128)),
                       jnp.float32)

    def loss(fn):
        def inner(q, k, v, bias):
            return jnp.sum(fn(q, k, v, bias) ** 2)
        return inner

    flash_fn = lambda q, k, v, b: fa.flash_attention(
        q, k, v, bias=b, scale=0.125, window=48)
    ref_fn = lambda q, k, v, b: reference(q, k, v, bias=b, scale=0.125,
                                          window=48)
    g1 = jax.grad(loss(flash_fn), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss(ref_fn), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g1, g2, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"d{name} mismatch")


def test_model_flash_path_is_causal():
    """Regression: the model's flash dispatch must pass causal/window to the
    kernel — the wrapper's any()-reduction of a merged (Sq, Sk) mask would
    otherwise silently drop causality (future-token leakage in training)."""
    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.models import Transformer

    cfg = get_model_config_cls("llama_7b")()
    cfg.set_defaults("language_modeling")
    cfg.decoder_layers = 1
    cfg.embed_dim = 32
    cfg.decoder_ffn_dim = 64
    cfg.decoder_attention_heads = 4
    cfg.attention_heads_kv = 2
    cfg.dropout = 0.0
    cfg.attention_kernel = "flash"

    rng = np.random.default_rng(0)
    dec = jnp.asarray(rng.integers(4, 40, (1, 9)), jnp.int32)
    model = Transformer(cfg, src_vocab_size=40)
    params = model.init(jax.random.PRNGKey(0), decoder_input=dec)["params"]
    logits1 = model.apply({"params": params}, decoder_input=dec)["logits"]
    dec2 = dec.at[0, -1].set(int(dec[0, -1]) % 35 + 4)
    logits2 = model.apply({"params": params}, decoder_input=dec2)["logits"]
    np.testing.assert_allclose(np.asarray(logits1[:, :-1]),
                               np.asarray(logits2[:, :-1]), atol=1e-5,
                               err_msg="future token changed past logits")


def test_streaming_matches_resident(monkeypatch):
    """The grid-streamed kernels (K/V blocked through the grid, unbounded
    sequence length) match the VMEM-resident kernels bit-for-bit in both
    forward and gradients, with and without bias."""
    import pasero_tpu.ops.flash_attention as fa
    B, H, S, D = 2, 2, 512, 64
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, H, S, D), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(6), (1, H, S, S), jnp.float32)

    def run(q, k, v, bias):
        def loss(q, k, v, bias):
            out = fa.flash_attention(q, k, v, bias=bias, scale=D ** -0.5,
                                     causal=True)
            return (out.astype(jnp.float32) ** 2).mean(), out
        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                             has_aux=True)(q, k, v, bias)
        return out, grads

    monkeypatch.setenv("PASERO_FLASH_STREAM_LIMIT", str(1 << 40))
    assert not fa._use_streaming(S, D, q.dtype)
    out_res, grads_res = run(q, k, v, bias)
    monkeypatch.setenv("PASERO_FLASH_STREAM_LIMIT", "0")
    assert fa._use_streaming(S, D, q.dtype)
    out_str, grads_str = run(q, k, v, bias)

    np.testing.assert_allclose(np.asarray(out_str), np.asarray(out_res),
                               rtol=1e-5, atol=1e-5)
    for g_s, g_r, name in zip(grads_str, grads_res, "qkvb"):
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)
