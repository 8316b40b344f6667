"""Pasero/fairseq torch checkpoint import tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scripts.convert_pasero_ckpt import convert_state_dict, map_name


def test_name_mapping():
    assert map_name("encoder.layers.3.self_attn.q_proj.weight") == \
        ("encoder/layers_3/self_attn/q_proj/kernel", True)
    assert map_name("decoder.layers.0.encoder_attn.out_proj.bias") == \
        ("decoder/layers_0/cross_attn/out_proj/bias", False)
    assert map_name("decoder.layers.1.final_layer_norm.weight") == \
        ("decoder/layers_1/ffn_norm/scale", False)
    assert map_name("encoder.layer_norm.bias") == \
        ("encoder/final_norm/bias", False)
    assert map_name("decoder.output_projection.weight") == \
        ("decoder/output_projection/kernel", True)
    assert map_name("bogus.tensor") == (None, False)


def test_convert_synthetic_state_dict():
    D, V = 8, 16
    sd = {
        "encoder.embed_tokens.weight": torch.randn(V, D),
        "decoder.embed_tokens.weight": None,  # shared, set below
        "encoder.layers.0.self_attn.q_proj.weight": torch.randn(D, D),
        "encoder.layers.0.self_attn.q_proj.bias": torch.randn(D),
        "encoder.layers.0.fc1.weight": torch.randn(2 * D, D),
        "encoder.layers.0.fc2.weight": torch.randn(D, 2 * D),
        "encoder.layers.0.self_attn_layer_norm.weight": torch.randn(D),
        "decoder.layers.0.encoder_attn.in_proj_weight": torch.randn(3 * D, D),
    }
    sd["decoder.embed_tokens.weight"] = sd["encoder.embed_tokens.weight"]
    flat, unmapped = convert_state_dict(sd, shared_embeddings=True)
    assert not unmapped
    # weights transposed to (in, out)
    assert flat["encoder/layers_0/self_attn/q_proj/kernel"].shape == (D, D)
    assert flat["encoder/layers_0/ffn/fc1/kernel"].shape == (D, 2 * D)
    # fused in_proj split into q/k/v
    assert flat["decoder/layers_0/cross_attn/q_proj/kernel"].shape == (D, D)
    assert flat["decoder/layers_0/cross_attn/v_proj/kernel"].shape == (D, D)
    # shared embeddings collapse into one entry
    assert "shared_embed/embedding" in flat
    assert "encoder/embed_tokens/embedding" not in flat
