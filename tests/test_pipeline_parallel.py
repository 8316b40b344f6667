"""Pipeline parallelism (--pp-size) on the 8-device virtual CPU mesh:
GPipe schedule parity (forward + grad), trainer loss parity, and the
topology-independent checkpoint roundtrip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.config import TrainingConfig, get_model_config_cls
from pasero_tpu.models import Transformer
from pasero_tpu.parallel import make_mesh
from pasero_tpu.parallel.pipeline import (pack_pp_params, unpack_pp_params,
                                          make_pp_forward)
from pasero_tpu.training import Trainer

VOCAB = 64


def decoder_cfg(layers=4, pe="sinusoidal"):
    cfg = get_model_config_cls("transformer")()
    cfg.set_defaults("language_modeling")
    cfg.model_type = "decoder"
    cfg.decoder_layers = layers
    cfg.embed_dim = 64
    cfg.decoder_ffn_dim = 128
    cfg.decoder_attention_heads = 2
    cfg.decoder_positional_encoding = pe
    cfg.dropout = 0.0
    return cfg


def tokens_batch(B=8, T=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(4, VOCAB, (B, T)), jnp.int32)


@pytest.mark.parametrize("pe", ["sinusoidal", "learned", "alibi", "t5"])
def test_pp_forward_and_grad_parity(pe):
    """fp32 pipelined forward is bit-identical to the sequential model, and
    grads through the full GPipe schedule match to float tolerance."""
    cfg = decoder_cfg(pe=pe)
    model = Transformer(cfg, src_vocab_size=VOCAB, dtype=jnp.float32)
    tokens = tokens_batch()
    params = model.init(jax.random.PRNGKey(0),
                        decoder_input=tokens)["params"]
    out = model.apply({"params": params}, decoder_input=tokens,
                      deterministic=True)
    ref_logits = out["logits"] if isinstance(out, dict) else out

    mesh = make_mesh(dp_size=2, pp_size=4)
    packed = pack_pp_params(params, cfg.decoder_layers)
    roundtrip = unpack_pp_params(packed)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params, roundtrip))

    fwd = make_pp_forward(model, mesh, num_stages=4, microbatches=4)
    with mesh:
        logits = jax.jit(lambda p, t: fwd(p, t))(packed, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5)

    def loss_pp(p, t):
        return jnp.sum(jax.nn.log_softmax(fwd(p, t), -1)[..., 0]) / t.size

    def loss_ref(p, t):
        o = model.apply({"params": p}, decoder_input=t, deterministic=True)
        lg = o["logits"] if isinstance(o, dict) else o
        return jnp.sum(jax.nn.log_softmax(lg, -1)[..., 0]) / t.size

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(packed, tokens)
    g_ref = jax.grad(loss_ref)(params, tokens)
    g_named = unpack_pp_params(jax.device_get(g_pp))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        g_named, g_ref)


def make_train_cfg(tmp, **kwargs):
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    args = ["--data-dir", os.path.join(tmp, "data"), "-o",
            os.path.join(tmp, "model"), "--task", "language_modeling",
            "-l", "en", "--max-steps", "2", "--valid-interval", "2",
            "--log-interval", "2", "--seed", "0", "--dropout", "0"]
    for k, v in kwargs.items():
        args += ([f"--{k.replace('_', '-')}"] if v is True
                 else [f"--{k.replace('_', '-')}", str(v)])
    cfg = TrainingConfig(*args)
    for k, v in dict(decoder_layers=4, embed_dim=64, decoder_ffn_dim=128,
                     decoder_attention_heads=2, dropout=0.0).items():
        setattr(cfg.model_cfg, k, v)
    cfg.model_cfg.model_type = "decoder"
    return cfg


def lm_batch(B=8, T=16):
    rng = np.random.default_rng(0)
    return {"decoder_input": rng.integers(4, VOCAB, (B, T)).astype(np.int32),
            "target_mask": np.ones((B, T), bool),
            "prompt_mask": np.zeros((B, T), bool),
            "num_real_rows": B}


def run_trainer(tmp, **mesh_kwargs):
    cfg = make_train_cfg(tmp, **mesh_kwargs)
    n = ((cfg.dp_size or 1) * cfg.tp_size * cfg.ep_size * cfg.cp_size
         * cfg.pp_size)
    mesh = make_mesh(cfg.dp_size, cfg.tp_size, cfg.ep_size, cfg.cp_size,
                     cfg.pp_size, devices=jax.devices()[:n])
    model = Transformer(cfg.model_cfg, src_vocab_size=VOCAB)
    return cfg, Trainer(cfg, task=None, model=model, mesh=mesh)


def test_pp_trainer_matches_single_device():
    """dp2 x pp4 training loss == single-device loss on the same batch (the
    GPipe schedule, microbatch split and row padding are loss-neutral)."""
    losses = {}
    for name, kwargs in [("single", dict(dp_size=1)),
                         ("dp2_pp4", dict(dp_size=2, pp_size=4)),
                         ("pp2", dict(dp_size=1, pp_size=2,
                                      pp_microbatches=8))]:
        with tempfile.TemporaryDirectory() as tmp:
            _, trainer = run_trainer(tmp, **kwargs)
            logs = trainer.train_step(iter([lm_batch()]))
        losses[name] = logs["loss"]
        assert np.isfinite(logs["loss"])
    assert abs(losses["single"] - losses["dp2_pp4"]) < 2e-2, losses
    assert abs(losses["single"] - losses["pp2"]) < 2e-2, losses


def test_pp_grad_accumulation():
    """--virtual-dp-size (host micro-batch loop) composes with the GPipe
    step: two half batches accumulate to the full-batch loss."""
    with tempfile.TemporaryDirectory() as tmp:
        _, full = run_trainer(tmp, dp_size=1, pp_size=2, pp_microbatches=4)
        logs_full = full.train_step(iter([lm_batch(B=8)]))
    with tempfile.TemporaryDirectory() as tmp:
        cfg = make_train_cfg(tmp, dp_size=1, pp_size=2, pp_microbatches=4,
                             virtual_dp_size=4)  # world=2 -> update_freq=2
        mesh = make_mesh(1, pp_size=2, devices=jax.devices()[:2])
        model = Transformer(cfg.model_cfg, src_vocab_size=VOCAB)
        accum = Trainer(cfg, task=None, model=model, mesh=mesh)
        whole = lm_batch(B=8)
        first = {k: (v[:4] if hasattr(v, "ndim") else 4)
                 for k, v in whole.items()}
        second = {k: (v[4:] if hasattr(v, "ndim") else 4)
                  for k, v in whole.items()}
        logs_accum = accum.train_step(iter([first, second]))
    assert abs(logs_full["loss"] - logs_accum["loss"]) < 2e-2, \
        (logs_full["loss"], logs_accum["loss"])


def test_pp_checkpoint_roundtrip():
    """Checkpoints stay in the named layers_i layout: a --pp-size run saves a
    checkpoint a plain run can load (and vice versa), bit-identical params."""
    with tempfile.TemporaryDirectory() as tmp:
        cfg, pp_trainer = run_trainer(tmp, dp_size=2, pp_size=4)
        pp_trainer.train_step(iter([lm_batch()]))
        path = pp_trainer.save(blocking=True)
        assert os.path.exists(path)
        pp_named = pp_trainer.named_params

        # a plain trainer in a fresh dir loads the pp-written checkpoint
        with tempfile.TemporaryDirectory() as tmp2:
            cfg2 = make_train_cfg(tmp2, dp_size=1)
            cfg2.ckpt = path
            mesh = make_mesh(1, devices=jax.devices()[:1])
            model = Transformer(cfg2.model_cfg, src_vocab_size=VOCAB)
            plain = Trainer(cfg2, task=None, model=model, mesh=mesh)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                jax.device_get(plain.state.params), jax.device_get(pp_named))

            # and a pp trainer loads the plain layout back
            plain_path = plain.save(blocking=True)
            with tempfile.TemporaryDirectory() as tmp3:
                cfg3 = make_train_cfg(tmp3, dp_size=2, pp_size=4)
                cfg3.ckpt = plain_path
                n = 8
                mesh3 = make_mesh(2, pp_size=4, devices=jax.devices()[:n])
                model3 = Transformer(cfg3.model_cfg, src_vocab_size=VOCAB)
                pp2 = Trainer(cfg3, task=None, model=model3, mesh=mesh3)
                jax.tree_util.tree_map(
                    lambda a, b: np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b)),
                    pp2.named_params, jax.device_get(pp_named))


def test_pp_rejects_unsupported():
    with tempfile.TemporaryDirectory() as tmp:
        # indivisible layer count
        cfg = make_train_cfg(tmp, dp_size=2, pp_size=4)
        cfg.model_cfg.decoder_layers = 3
        mesh = make_mesh(2, pp_size=4)
        model = Transformer(cfg.model_cfg, src_vocab_size=VOCAB)
        with pytest.raises(ValueError, match="not divisible"):
            Trainer(cfg, task=None, model=model, mesh=mesh)
        # speech encoder (conv subsampler)
        cfg2 = make_train_cfg(tmp, dp_size=2, pp_size=4)
        cfg2.model_cfg.model_type = "encoder_decoder"
        cfg2.model_cfg.encoder_layers = 4
        cfg2.model_cfg.input_dim = 40
        model2 = Transformer(cfg2.model_cfg, src_vocab_size=VOCAB)
        with pytest.raises(ValueError, match="speech"):
            Trainer(cfg2, task=None, model=model2, mesh=mesh)


def enc_dec_cfg(pe="sinusoidal"):
    cfg = decoder_cfg(pe=pe)
    cfg.model_type = "encoder_decoder"
    cfg.encoder_layers = 4
    cfg.encoder_ffn_dim = 128
    cfg.encoder_attention_heads = 2
    cfg.encoder_positional_encoding = pe
    return cfg


def test_pp_encoder_decoder_parity():
    """Both layer stacks pipelined: fp32 enc-dec forward matches the
    sequential model bit-for-bit, grads to float tolerance."""
    cfg = enc_dec_cfg()
    model = Transformer(cfg, src_vocab_size=VOCAB, dtype=jnp.float32)
    src = tokens_batch(seed=1)
    tgt = tokens_batch(seed=2)
    params = model.init(jax.random.PRNGKey(0), src_tokens=src,
                        decoder_input=tgt)["params"]
    out = model.apply({"params": params}, src_tokens=src, decoder_input=tgt,
                      deterministic=True)
    ref_logits = out["logits"] if isinstance(out, dict) else out

    mesh = make_mesh(dp_size=2, pp_size=4)
    packed = pack_pp_params(params, cfg.decoder_layers, cfg.encoder_layers)
    roundtrip = unpack_pp_params(packed)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params, roundtrip))

    fwd = make_pp_forward(model, mesh, num_stages=4, microbatches=4)
    with mesh:
        logits = jax.jit(
            lambda p, s, t: fwd(p, t, src_tokens=s))(packed, src, tgt)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5)

    def loss_pp(p, s, t):
        lg = fwd(p, t, src_tokens=s)
        return jnp.sum(jax.nn.log_softmax(lg, -1)[..., 0]) / t.size

    def loss_ref(p, s, t):
        o = model.apply({"params": p}, src_tokens=s, decoder_input=t,
                        deterministic=True)
        lg = o["logits"] if isinstance(o, dict) else o
        return jnp.sum(jax.nn.log_softmax(lg, -1)[..., 0]) / t.size

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(packed, src, tgt)
    g_ref = jax.grad(loss_ref)(params, src, tgt)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        unpack_pp_params(jax.device_get(g_pp)), g_ref)


def test_pp_enc_dec_trainer_matches_single_device():
    """Translation-style batch through the pp trainer == single device."""
    losses = {}
    for name, kwargs in [("single", dict(dp_size=1)),
                         ("dp2_pp2", dict(dp_size=2, pp_size=2))]:
        with tempfile.TemporaryDirectory() as tmp:
            cfg = make_train_cfg(tmp, **kwargs)
            cfg.model_cfg.model_type = "encoder_decoder"
            cfg.model_cfg.encoder_layers = 4
            cfg.model_cfg.encoder_ffn_dim = 128
            cfg.model_cfg.encoder_attention_heads = 2
            n = (cfg.dp_size or 1) * cfg.pp_size
            mesh = make_mesh(cfg.dp_size, pp_size=cfg.pp_size,
                             devices=jax.devices()[:n])
            model = Transformer(cfg.model_cfg, src_vocab_size=VOCAB)
            trainer = Trainer(cfg, task=None, model=model, mesh=mesh)
            batch = lm_batch()
            rng = np.random.default_rng(3)
            batch["src_tokens"] = rng.integers(
                4, VOCAB, (8, 12)).astype(np.int32)
            batch["src_mask"] = np.ones((8, 12), bool)
            logs = trainer.train_step(iter([batch]))
        losses[name] = logs["loss"]
        assert np.isfinite(logs["loss"])
    assert abs(losses["single"] - losses["dp2_pp2"]) < 2e-2, losses
