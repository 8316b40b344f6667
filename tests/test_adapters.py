"""Adapter tests: stacked named adapters, per-batch selection, freezing."""

import jax
import jax.numpy as jnp
import numpy as np

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.models import Transformer
from pasero_tpu.models.adapters import (AdapterStack, adapter_ids_from_meta,
                                        adapter_names)

RNG = jax.random.PRNGKey(0)


class FakeTask:
    def get_langs_or_domains(self, key):
        return {"target_lang": {"en", "fr", "de"}}[key]


def test_adapter_names_resolution():
    cfg = get_model_config_cls("adapter_transformer")()
    cfg.decoder_adapters_by = ["target_lang"]
    names = adapter_names(cfg, FakeTask(), is_decoder=True)
    assert names == ["target_lang:de", "target_lang:en", "target_lang:fr"]
    cfg2 = get_model_config_cls("adapter_transformer")()
    cfg2.encoder_adapters = ["domain_a", "domain_b"]
    assert adapter_names(cfg2, None, False) == ["domain_a", "domain_b"]
    # plain transformer has no adapters
    dense = get_model_config_cls("transformer")()
    assert adapter_names(dense, None, False) == []


def test_adapter_ids_from_meta():
    names = ["target_lang:de", "target_lang:en"]
    assert adapter_ids_from_meta(names, ["target_lang"],
                                 {"target_lang": "en"}) == [1]
    # 'lang' falls back to target_lang in the metadata
    assert adapter_ids_from_meta(["lang:de", "lang:en"], ["lang"],
                                 {"target_lang": "de"}) == [0]
    # explicit stack: all active in order
    assert adapter_ids_from_meta(["a", "b"], [], {}) == [0, 1]


def test_adapter_stack_selection():
    stack = AdapterStack(num_adapters=3, bottleneck_dim=8)
    x = jax.random.normal(RNG, (2, 4, 16))
    variables = stack.init(RNG, x, adapter_ids=jnp.array([0]))
    out0 = stack.apply(variables, x, adapter_ids=jnp.array([0]))
    out1 = stack.apply(variables, x, adapter_ids=jnp.array([1]))
    assert out0.shape == x.shape
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # zero-init adapters are the identity
    zstack = AdapterStack(num_adapters=2, bottleneck_dim=8, zero_init=True)
    zvars = zstack.init(RNG, x, adapter_ids=jnp.array([0]))
    zout = zstack.apply(zvars, x, adapter_ids=jnp.array([0]))
    np.testing.assert_allclose(np.asarray(zout), np.asarray(x), atol=1e-6)


def test_adapter_transformer_forward_and_grads():
    cfg = get_model_config_cls("adapter_transformer_small")()
    cfg.set_defaults("translation")
    cfg.encoder_layers = cfg.decoder_layers = 2
    cfg.embed_dim = 32
    cfg.encoder_ffn_dim = cfg.decoder_ffn_dim = 64
    cfg.encoder_attention_heads = cfg.decoder_attention_heads = 4
    cfg.dropout = 0.0
    cfg.decoder_adapters_by = ["target_lang"]
    names = adapter_names(cfg, FakeTask(), True)
    model = Transformer(cfg, src_vocab_size=50,
                        num_decoder_adapters=len(names))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, 50, (2, 6)))
    dec = jnp.asarray(rng.integers(4, 50, (2, 7)))
    ids = jnp.array([1], jnp.int32)
    variables = model.init(RNG, src_tokens=src, decoder_input=dec,
                           targets=dec, decoder_adapter_ids=ids)
    flat = {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert any("adapters_0" in k and v[0] == 3 for k, v in flat.items())

    def loss(params, ids):
        out = model.apply({"params": params}, src_tokens=src,
                          decoder_input=dec, targets=dec,
                          decoder_adapter_ids=ids)
        return out["loss_sum"]

    grads = jax.grad(loss)(variables["params"], ids)
    gflat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_leaves_with_path(grads)}
    down = next(v for k, v in gflat.items()
                if "adapters_0" in k and "down" in k)
    # only the selected adapter (index 1) receives gradient
    assert np.abs(down[1]).sum() >= 0  # selected row exists
    assert np.abs(down[0]).sum() == 0 and np.abs(down[2]).sum() == 0
