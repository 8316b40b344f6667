"""Parallelism tests on the 8-device virtual CPU mesh: dp x tp composition,
single-vs-multi-chip loss parity, FSDP sharding rules."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pasero_tpu.config import TrainingConfig
from pasero_tpu.models import Transformer
from pasero_tpu.parallel import make_mesh
from pasero_tpu.parallel.sharding import LOGICAL_RULES, fsdp_rules
from pasero_tpu.training import Trainer


def make_cfg(tmp, **kwargs):
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    args = ["--data-dir", os.path.join(tmp, "data"), "-o",
            os.path.join(tmp, "model"), "-s", "de", "-t", "en",
            "--max-steps", "2", "--valid-interval", "2", "--log-interval", "2",
            "--seed", "0", "--dropout", "0"]
    for k, v in kwargs.items():
        if v is True:
            args += [f"--{k.replace('_', '-')}"]
        else:
            args += [f"--{k.replace('_', '-')}", str(v)]
    cfg = TrainingConfig(*args)
    for k, v in dict(encoder_layers=2, decoder_layers=2, embed_dim=64,
                     encoder_ffn_dim=128, decoder_ffn_dim=128,
                     encoder_attention_heads=4, decoder_attention_heads=4,
                     dropout=0.0).items():
        setattr(cfg.model_cfg, k, v)
    return cfg


def make_batch(B=8, S=16, T=16, vocab=64):
    rng = np.random.default_rng(0)
    return {"src_tokens": rng.integers(4, vocab, (B, S)).astype(np.int32),
            "src_mask": np.ones((B, S), bool),
            "decoder_input": rng.integers(4, vocab, (B, T)).astype(np.int32),
            "target_mask": np.ones((B, T), bool),
            "prompt_mask": np.zeros((B, T), bool),
            "num_real_rows": B}


def run_one_step(mesh_kwargs, tmp):
    cfg = make_cfg(tmp, **mesh_kwargs)
    n = (cfg.dp_size or 1) * cfg.tp_size * cfg.ep_size * cfg.cp_size
    if cfg.cp_size > 1:  # what cli/train.py does for --cp-size
        cfg.model_cfg.attention_kernel = "ring"
    mesh = make_mesh(cfg.dp_size, cfg.tp_size, cfg.ep_size, cfg.cp_size,
                     devices=jax.devices()[:n])
    model = Transformer(cfg.model_cfg, src_vocab_size=64)
    trainer = Trainer(cfg, task=None, model=model, mesh=mesh)
    logs = trainer.train_step(iter([make_batch()]))
    return logs


def test_mesh_factorizations():
    assert make_mesh(8, 1, 1).shape == {"data": 8, "expert": 1, "model": 1,
                                        "seq": 1, "stage": 1}
    assert make_mesh(2, 2, 2).shape == {"data": 2, "expert": 2, "model": 2,
                                        "seq": 1, "stage": 1}
    assert make_mesh(None, 4, 1).shape["data"] == 2
    assert make_mesh(None, 2, 1, 2).shape == {"data": 2, "expert": 1,
                                              "model": 2, "seq": 2,
                                              "stage": 1}
    assert make_mesh(None, 1, 1, 1, 4).shape == {"data": 2, "expert": 1,
                                                 "model": 1, "seq": 1,
                                                 "stage": 4}
    with pytest.raises(AssertionError):
        make_mesh(3, 3, 1)


def test_dp_tp_composition_matches_single_device():
    """The same batch gives the same loss on (1,1), (4,2) and (2,1,4) meshes —
    the composition the reference cannot do (TP x DP unsupported there,
    pasero/training.py:180-183)."""
    losses = {}
    for name, kwargs in [("single", dict(dp_size=1, tp_size=1)),
                         ("dp4_tp2", dict(dp_size=4, tp_size=2)),
                         ("dp2_tp4", dict(dp_size=2, tp_size=4)),
                         ("dp2_cp4", dict(dp_size=2, cp_size=4))]:
        with tempfile.TemporaryDirectory() as tmp:
            logs = run_one_step(kwargs, tmp)
        losses[name] = logs["loss"]
        assert np.isfinite(logs["loss"])
    assert abs(losses["single"] - losses["dp4_tp2"]) < 2e-2, losses
    assert abs(losses["single"] - losses["dp2_tp4"]) < 2e-2, losses
    # context parallelism: sequence sharded over 4 devices, ring attention
    assert abs(losses["single"] - losses["dp2_cp4"]) < 2e-2, losses


def test_fsdp_shards_parameters():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = make_cfg(tmp, dp_size=8, fsdp=True)
        mesh = make_mesh(8, 1, 1)
        model = Transformer(cfg.model_cfg, src_vocab_size=64)
        trainer = Trainer(cfg, task=None, model=model, mesh=mesh)
        # embedding rows are sharded over 'data' under FSDP rules
        flat = jax.tree_util.tree_leaves_with_path(trainer.param_shardings)
        shard_specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
        embed = next(v for k, v in shard_specs.items() if "embedding" in k)
        assert "data" in str(embed)
        logs = trainer.train_step(iter([make_batch()]))
        assert np.isfinite(logs["loss"])


def test_rules_tables():
    base = dict(LOGICAL_RULES)
    assert base["mlp"] == "model" and base["expert"] == "expert"
    fsdp = dict(fsdp_rules())
    assert fsdp["embed"] == "data" and fsdp["mlp"] == "model"


def test_grad_accumulation_equivalence():
    """2 micro-batches with virtual_dp accumulate to the same update as one
    combined batch (token-count normalization, training.py:455-470)."""
    batch = make_batch(B=8)
    half1 = {k: (v[:4] if isinstance(v, np.ndarray) else 4)
             for k, v in batch.items()}
    half2 = {k: (v[4:] if isinstance(v, np.ndarray) else 4)
             for k, v in batch.items()}
    with tempfile.TemporaryDirectory() as tmp:
        cfg = make_cfg(tmp, dp_size=1, tp_size=1)
        mesh = make_mesh(1, 1, 1, devices=jax.devices()[:1])
        model = Transformer(cfg.model_cfg, src_vocab_size=64)
        trainer = Trainer(cfg, task=None, model=model, mesh=mesh)
        params_before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
        trainer.train_step(iter([batch]))
        params_full = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = make_cfg(tmp, dp_size=1, tp_size=1, virtual_dp_size=2)
        mesh = make_mesh(1, 1, 1, devices=jax.devices()[:1])
        model = Transformer(cfg.model_cfg, src_vocab_size=64)
        trainer = Trainer(cfg, task=None, model=model, mesh=mesh)
        trainer.train_step(iter([half1, half2]))
        params_accum = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), params_full, params_accum)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    assert max_diff < 5e-2, f"accumulated update diverges: {max_diff}"
