"""MoE checkpoint ingestion (VERDICT round-1 missing #2).

The reference converts experts between basic/fused/tutel formats
(pasero/models/mixture_of_experts.py:313-402), merges Tutel shards
(scripts/merge-tutel-ckpt.py), and feeds on the FAIR NLLB-200 per-expert
checkpoint layout (pasero/tasks/nllb_translation.py:29-41).  These tests check
that all of those load into pasero_tpu's stacked-expert layout with logit
parity across formats.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scripts.convert_pasero_ckpt import (convert_state_dict,
                                         find_checkpoint_shards)

E, D, F, V = 2, 8, 16, 16


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _dense_torch_state(rng):
    """Dense (non-MoE) params of a 1+1-layer encoder-decoder, torch names."""
    sd = {}
    embed = _rand(rng, V, D)
    sd["encoder.embed_tokens.weight"] = embed
    sd["decoder.embed_tokens.weight"] = embed.copy()
    for side, attns in (("encoder", ["self_attn"]),
                        ("decoder", ["self_attn", "encoder_attn"])):
        for attn in attns:
            for proj in ("q", "k", "v", "out"):
                sd[f"{side}.layers.0.{attn}.{proj}_proj.weight"] = _rand(rng, D, D)
                sd[f"{side}.layers.0.{attn}.{proj}_proj.bias"] = _rand(rng, D)
        norms = ["self_attn_layer_norm", "final_layer_norm"]
        if side == "decoder":
            norms.insert(1, "encoder_attn_layer_norm")
        for norm in norms:
            sd[f"{side}.layers.0.{norm}.weight"] = _rand(rng, D)
            sd[f"{side}.layers.0.{norm}.bias"] = _rand(rng, D)
    return sd


def _moe_arrays(rng):
    """Random per-layer expert weights in torch per-expert shapes."""
    return {
        "fc1_w": _rand(rng, E, F, D),   # stack of torch fc1 (F, D)
        "fc1_b": _rand(rng, E, F),
        "fc2_w": _rand(rng, E, D, F),   # stack of torch fc2 (D, F)
        "fc2_b": _rand(rng, E, D),
        "gate": _rand(rng, E, D),       # torch Linear (E, D)
    }


def _basic_format(site, m):
    sd = {}
    for e in range(E):
        sd[f"{site}.experts.{e}.fc1.weight"] = m["fc1_w"][e]
        sd[f"{site}.experts.{e}.fc1.bias"] = m["fc1_b"][e]
        sd[f"{site}.experts.{e}.fc2.weight"] = m["fc2_w"][e]
        sd[f"{site}.experts.{e}.fc2.bias"] = m["fc2_b"][e]
    sd[f"{site}.gate.weight"] = m["gate"]
    return sd


def _fused_concat_format(site, m):
    return {
        f"{site}.fc1.weight": m["fc1_w"].reshape(E * F, D),
        f"{site}.fc1.bias": m["fc1_b"].reshape(E * F),
        f"{site}.fc2.weight": m["fc2_w"].reshape(E * D, F),
        f"{site}.fc2.bias": m["fc2_b"].reshape(E * D),
        f"{site}.gate.weight": m["gate"],
    }


def _tutel_format(site, m):
    t = f"{site}.tutel_moe_layer"
    return {
        f"{t}.experts.batched_fc1_w": m["fc1_w"],                   # (E, F, D)
        f"{t}.experts.batched_fc1_bias": m["fc1_b"],
        f"{t}.experts.batched_fc2_w": m["fc2_w"].transpose(0, 2, 1),  # (E, F, D)
        f"{t}.experts.batched_fc2_bias": m["fc2_b"],
        f"{t}.gates.0.wg.weight": m["gate"],
        f"{t}._num_global_experts": np.int64(E),
    }


def test_format_parity():
    """basic, concatenated-fused and tutel formats of identical weights
    convert to identical flat arrays."""
    rng = np.random.default_rng(0)
    dense = _dense_torch_state(rng)
    moe = {site: _moe_arrays(rng)
           for site in ("encoder.layers.0.moe_layer",
                        "decoder.layers.0.moe_layer")}
    converted = []
    for fmt in (_basic_format, _fused_concat_format, _tutel_format):
        sd = dict(dense)
        for site, m in moe.items():
            sd.update(fmt(site, m))
        flat, unmapped = convert_state_dict(sd)
        assert not unmapped, unmapped
        converted.append(flat)
    assert converted[0].keys() == converted[1].keys() == converted[2].keys()
    for key in converted[0]:
        np.testing.assert_allclose(converted[1][key], converted[0][key],
                                   err_msg=key)
        np.testing.assert_allclose(converted[2][key], converted[0][key],
                                   err_msg=key)
    # shapes match the model layout (moe.py: experts_in (E,D,F))
    assert converted[0]["encoder/layers_0/ffn/experts_in"].shape == (E, D, F)
    assert converted[0]["encoder/layers_0/ffn/experts_out"].shape == (E, F, D)
    assert converted[0]["encoder/layers_0/ffn/gate"].shape == (D, E)


def test_tutel_shard_merge_logit_parity(tmp_path):
    """A 2-shard Tutel checkpoint converts via the CLI and loads into the MoE
    model with the exact same logits as the single-file basic conversion."""
    import jax
    import jax.numpy as jnp
    from scripts.convert_pasero_ckpt import main as convert_main
    from pasero_tpu.checkpoints import load_params
    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.models import Transformer

    rng = np.random.default_rng(1)
    dense = _dense_torch_state(rng)
    moe = {site: _moe_arrays(rng)
           for site in ("encoder.layers.0.moe_layer",
                        "decoder.layers.0.moe_layer")}
    ckpt_args = dict(arch="moe_transformer", encoder_layers=1,
                     decoder_layers=1, embed_dim=D, encoder_ffn_dim=F,
                     decoder_ffn_dim=F, encoder_expert_count=E,
                     decoder_expert_count=E, encoder_attention_heads=2,
                     decoder_attention_heads=2, dropout=0.0)

    # one tutel shard per expert: all dense params + 1/2 of the experts
    for shard in range(2):
        sd = {k: torch.from_numpy(np.array(v)) for k, v in dense.items()}
        for site, m in moe.items():
            one = {k: v[shard:shard + 1] for k, v in m.items()
                   if k != "gate"}
            one["gate"] = m["gate"]  # gates are replicated across shards
            sd.update({k: torch.from_numpy(np.array(v))
                       for k, v in _tutel_format(site, one).items()})
        torch.save({"model": sd, "args": ckpt_args},
                   tmp_path / f"model_10_{shard + 1:03}_of_002.bin")

    # reference naming is 1-based (pasero/utils.py:1613-1624): 001..002
    assert len(find_checkpoint_shards(
        str(tmp_path / "model_10_001_of_002.bin"))) == 2
    with pytest.raises(AssertionError):
        find_checkpoint_shards(str(tmp_path / "model_10_002_of_002.bin"))
    out_dir = tmp_path / "converted"
    convert_main([str(tmp_path / "model_10_001_of_002.bin"),
                  "-o", str(out_dir)])

    cfg = get_model_config_cls("moe_transformer")(
        **{k: v for k, v in ckpt_args.items() if k != "arch"})
    cfg.set_defaults("translation")
    model = Transformer(cfg, src_vocab_size=V, tgt_vocab_size=V)
    src = jnp.array([[4, 5, 6]], jnp.int32)
    mask = jnp.ones_like(src, bool)
    init = model.init(jax.random.PRNGKey(0), src_tokens=src, src_mask=mask,
                      decoder_input=src)["params"]
    params, missing, unexpected = load_params(
        str(out_dir / "model_last.npz"), init)
    assert not missing and not unexpected

    # reference logits: convert the basic format directly
    sd_basic = dict(dense)
    for site, m in moe.items():
        sd_basic.update(_basic_format(site, m))
    flat_basic, _ = convert_state_dict(sd_basic)
    npz = tmp_path / "basic.npz"
    with open(npz, "wb") as f:
        np.savez(f, **flat_basic)
    params_b, _, _ = load_params(str(npz), init)

    out = model.apply({"params": params}, src_tokens=src, src_mask=mask,
                      decoder_input=src)
    out_b = model.apply({"params": params_b}, src_tokens=src, src_mask=mask,
                        decoder_input=src)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                               np.asarray(out_b["logits"], np.float32),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(out["logits"], np.float32)).all()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from pasero_tpu.tokenizers import PaseroTokenizer
    d = tmp_path_factory.mktemp("data")
    text = ["the dog jumps", "a yellow submarine"] * 10
    (d / "corpus.txt").write_text("\n".join(text) + "\n")
    _, vocabs = PaseroTokenizer.train([str(d / "corpus.txt")],
                                      output=str(d / "bpecodes"),
                                      num_symbols=40, inline_case=True)
    items = PaseroTokenizer.build_dict(vocabs, padding_factor=1,
                                       extra_tokens=["<T>", "<U>"])
    with open(d / "dict.txt", "w") as f:
        for token, count in items:
            print(token, count, file=f)
    return str(d)


def test_fair_nllb_expert_conversion(tmp_path, data_dir):
    """FAIR per-expert .bin files convert to expert_{gid:04}.npz + gates.npz,
    and the NLLB task hot-swaps them with router column slicing."""
    import json

    import jax.numpy as jnp
    from scripts.convert_nllb_experts import main as convert_experts

    rng = np.random.default_rng(2)
    fair_dir = tmp_path / "fair"
    fair_dir.mkdir()
    # layer layout: 1 encoder + 1 decoder layer, both MoE, 2 experts each;
    # global ids: encoder layer 0 -> 0,1; decoder layer 0 -> 2,3
    originals = {}
    for module in ("encoder", "decoder"):
        for local in range(E):
            sd = {
                f"{module}.layers.0.moe_layer.experts.0.fc1.weight":
                    torch.from_numpy(_rand(rng, F, D)),
                f"{module}.layers.0.moe_layer.experts.0.fc1.bias":
                    torch.from_numpy(_rand(rng, F)),
                f"{module}.layers.0.moe_layer.experts.0.fc2.weight":
                    torch.from_numpy(_rand(rng, D, F)),
                f"{module}.layers.0.moe_layer.experts.0.fc2.bias":
                    torch.from_numpy(_rand(rng, D)),
            }
            originals[(module, local)] = sd
            torch.save(sd, fair_dir / f"{module}-0-expert-{local}.bin")
    gates = {f"{m}.layers.0.moe_layer.gate.wg.weight":
             torch.from_numpy(_rand(rng, E, D)) for m in ("encoder", "decoder")}
    torch.save({"model": gates}, fair_dir / "dense.bin")

    out_dir = tmp_path / "experts"
    convert_experts([str(fair_dir), "-o", str(out_dir),
                     "--dense-ckpt", str(fair_dir / "dense.bin"),
                     "--experts-per-layer", str(E),
                     "--expert-interval", "1", "--encoder-layers", "1"])
    for gid in range(4):
        assert (out_dir / f"expert_{gid:04}.npz").exists()
    assert (out_dir / "gates.npz").exists()
    with np.load(out_dir / "expert_0002.npz") as data:  # decoder expert 0
        assert data["decoder/layers_0/ffn/experts_in"].shape == (D, F)
        assert data["decoder/layers_0/ffn/experts_out"].shape == (F, D)
        assert int(data["decoder/layers_0/ffn/gate_col"]) == 0

    # hot-swap through the task, selecting the experts in swapped order
    from pasero_tpu.config.tasks import NLLBTranslationTaskConfig
    from pasero_tpu.tasks import NLLBTranslationTask
    from tests.test_tasks_extra import make_model_cfg  # reuse tiny config

    (out_dir / "experts.json").write_text(
        json.dumps({"de-en": [1, 0, 3, 2]}))
    cfg = NLLBTranslationTaskConfig(
        lang_pairs=["de-en"], expert_json=str(out_dir / "experts.json"),
        expert_dir=str(out_dir))
    cfg.set_defaults("nllb_translation")
    model_cfg = make_model_cfg("translation")
    cfg.set_max_length(model_cfg)
    cfg.finalize()
    task = NLLBTranslationTask(data_dir, cfg)

    params = {side: {"layers_0": {"ffn": {
        "experts_in": jnp.zeros((E, D, F)),
        "experts_in_bias": jnp.zeros((E, F)),
        "experts_out": jnp.zeros((E, F, D)),
        "experts_out_bias": jnp.zeros((E, D)),
        "gate": jnp.zeros((D, E))}}} for side in ("encoder", "decoder")}
    swapped = task.load_experts(params, "de", "en")

    # expert 1 first (selection order [1, 0])
    got = np.asarray(swapped["encoder"]["layers_0"]["ffn"]["experts_in"])
    want_first = np.asarray(
        originals[("encoder", 1)]
        ["encoder.layers.0.moe_layer.experts.0.fc1.weight"]).T
    np.testing.assert_allclose(got[0], want_first, rtol=1e-6)
    # router columns sliced and reordered to [1, 0]
    got_gate = np.asarray(swapped["decoder"]["layers_0"]["ffn"]["gate"])
    want_gate = np.asarray(
        gates["decoder.layers.0.moe_layer.gate.wg.weight"]).T[:, [1, 0]]
    np.testing.assert_allclose(got_gate, want_gate, rtol=1e-6)
