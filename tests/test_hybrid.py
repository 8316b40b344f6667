"""Hybrid (LSTM-decoder) model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pasero_tpu.config import get_model_cls, get_model_config_cls
from pasero_tpu.decoding.search import sample_decode
from pasero_tpu.models.hybrid import HybridTransformer

RNG = jax.random.PRNGKey(0)
V = 40


def small_cfg():
    cfg = get_model_config_cls("hybrid_transformer_small")()
    cfg.set_defaults("translation")
    cfg.encoder_layers = 2
    cfg.decoder_layers = 2
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = 4
    cfg.decoder_hidden_size = 32
    cfg.dropout = 0.0
    return cfg


def test_arch_resolution():
    model_cls, cfg_cls = get_model_cls("hybrid_transformer_small")
    assert model_cls is HybridTransformer


def test_forward_and_loss():
    cfg = small_cfg()
    model = HybridTransformer(cfg, src_vocab_size=V)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, V, (2, 6)))
    dec = jnp.asarray(rng.integers(4, V, (2, 7)))
    variables = model.init(RNG, src_tokens=src, decoder_input=dec, targets=dec)
    out = model.apply(variables, src_tokens=src, decoder_input=dec, targets=dec)
    assert out["logits"].shape == (2, 7, V)
    assert np.isfinite(float(out["loss_sum"]))
    # padding rows in the recurrence don't blow up
    dec_padded = dec.at[:, 4:].set(cfg.padding_idx)
    out2 = model.apply(variables, src_tokens=src, decoder_input=dec_padded,
                       targets=dec_padded)
    assert np.isfinite(float(out2["loss_sum"]))


def test_incremental_decode_matches_full():
    """LSTM decode with cached carries == full forward argmax rollout."""
    cfg = small_cfg()
    B, S = 2, 6
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(4, V, (B, S)))
    model = HybridTransformer(cfg, src_vocab_size=V, self_cache_len=10,
                              cross_cache_len=S)
    bos = cfg.bos_idx
    prompt = jnp.full((B, 1), bos, jnp.int32)
    params = model.init(RNG, src_tokens=src, decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=HybridTransformer.encode)
    out = sample_decode(model, params, prompt, jnp.ones((B, 1), bool),
                        max_new=6, eos_idx=cfg.eos_idx, pad_idx=cfg.padding_idx,
                        greedy=True, encoder_out=encoder_out,
                        encoder_mask=encoder_mask)
    # naive: grow the sequence, full forward each step
    for b in range(B):
        ids = [bos]
        expected = []
        for _ in range(6):
            logits = model.apply({"params": params}, src_tokens=src[b:b+1],
                                 decoder_input=jnp.asarray([ids]))["logits"]
            t = int(jnp.argmax(logits[0, -1]))
            expected.append(t)
            if t == cfg.eos_idx:
                break
            ids.append(t)
        got = [int(t) for t in np.asarray(out["tokens"][b])][:len(expected)]
        assert got == expected, f"row {b}: {got} != {expected}"
