"""HF conversion parity: converted tiny models reproduce HF logits."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pasero_tpu.checkpoints import load_params, unflatten_params
from pasero_tpu.config import get_model_config_cls
from pasero_tpu.models import Transformer


def tiny_llama_hf(vocab=64, layers=2, dim=32, heads=4, kv_heads=2, ffn=64):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=ffn,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg)


def our_llama_cfg(vocab=64, layers=2, dim=32, heads=4, kv_heads=2, ffn=64):
    cfg = get_model_config_cls("llama_7b")()
    cfg.set_defaults("language_modeling")
    cfg.decoder_layers = layers
    cfg.embed_dim = dim
    cfg.decoder_ffn_dim = ffn
    cfg.decoder_attention_heads = heads
    cfg.attention_heads_kv = kv_heads
    cfg.decoder_max_len = 64
    cfg.dropout = 0.0
    return cfg


def test_llama_logits_match_hf(tmp_path):
    hf = tiny_llama_hf()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    from scripts.convert_hf_ckpt import convert_llama
    cfg = our_llama_cfg()
    flat = convert_llama(sd, cfg)
    np.savez(tmp_path / "model_last.npz", **flat)

    model = Transformer(cfg, src_vocab_size=64, dtype=jnp.float32)
    tokens = np.array([[1, 5, 9, 13, 20, 33, 2, 7]], dtype=np.int32)
    init = model.init(jax.random.PRNGKey(0),
                      decoder_input=jnp.asarray(tokens))["params"]
    params, missing, unexpected = load_params(str(tmp_path / "model_last.npz"),
                                              init)
    assert not missing and not unexpected

    ours = model.apply({"params": params},
                       decoder_input=jnp.asarray(tokens))["logits"]
    with torch.no_grad():
        theirs = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=2e-3)


def test_whisper_logits_match_hf(tmp_path):
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    hf_cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=16, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=30, max_target_positions=20,
        pad_token_id=99, bos_token_id=98, eos_token_id=97,
        decoder_start_token_id=98)
    torch.manual_seed(1)
    hf = WhisperForConditionalGeneration(hf_cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = get_model_config_cls("whisper_base")()
    cfg.set_defaults("translation")
    cfg.encoder_layers = cfg.decoder_layers = 2
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = cfg.decoder_attention_heads = 4
    cfg.input_dim = cfg.conv_input_dim = 16
    cfg.conv_channels = 32
    cfg.encoder_max_len = 60  # conv stride halves to 30 positions
    cfg.decoder_max_len = 20
    cfg.dropout = 0.0
    cfg.padding_idx, cfg.bos_idx, cfg.eos_idx = 99, 98, 97

    from scripts.convert_hf_ckpt import convert_whisper
    flat = convert_whisper(sd, cfg)
    np.savez(tmp_path / "model_last.npz", **flat)

    model = Transformer(cfg, src_vocab_size=100, dtype=jnp.float32)
    feats = np.random.default_rng(0).normal(size=(1, 60, 16)).astype(np.float32)
    dec = np.array([[98, 5, 9, 13]], dtype=np.int32)
    init = model.init(jax.random.PRNGKey(0), src_tokens=jnp.asarray(feats),
                      decoder_input=jnp.asarray(dec))["params"]
    params, missing, unexpected = load_params(str(tmp_path / "model_last.npz"),
                                              init, flexible=True)
    # positions are learned in both; sinusoidal-free; conv frontend converted
    ours = model.apply({"params": params}, src_tokens=jnp.asarray(feats),
                       decoder_input=jnp.asarray(dec))["logits"]
    with torch.no_grad():
        theirs = hf(input_features=torch.tensor(feats.transpose(0, 2, 1)),
                    decoder_input_ids=torch.tensor(dec.astype(np.int64))
                    ).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-3, rtol=5e-3)
