"""Decoding tests: greedy/sampling/beam parity against naive full-forward rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasero_tpu.config import get_model_config_cls
from pasero_tpu.decoding.search import beam_search, left_align, sample_decode
from pasero_tpu.models.transformer import Transformer

RNG = jax.random.PRNGKey(0)
V = 40
MAX_NEW = 8


def small_cfg(arch, task, **overrides):
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


def naive_greedy(model, params, prompt_rows, max_new, eos, src=None):
    """Reference rollout: full forward at every step, per row, no cache."""
    outs = []
    for i, row in enumerate(prompt_rows):
        ids = list(row)
        generated = []
        for _ in range(max_new):
            dec = jnp.asarray([ids], jnp.int32)
            kwargs = dict(decoder_input=dec)
            if src is not None:
                kwargs["src_tokens"] = src[i:i + 1]
            logits = model.apply({"params": params}, **kwargs)["logits"]
            token = int(jnp.argmax(logits[0, -1]))
            generated.append(token)
            if token == eos:
                break
            ids.append(token)
        outs.append(generated)
    return outs


@pytest.mark.parametrize("arch,task", [
    ("llama_7b", "language_modeling"),
    ("bloom_560m", "language_modeling"),
])
def test_greedy_matches_naive_decoder_only(arch, task):
    overrides = {"attention_heads_kv": 2} if arch == "llama_7b" else {}
    cfg = small_cfg(arch, task, **overrides)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    prompts = [[5, 6, 7, 8, 9], [10, 11, 12]]
    P = max(len(p) for p in prompts)
    right = np.full((2, P), pad, np.int32)
    mask = np.zeros((2, P), bool)
    for i, p in enumerate(prompts):
        right[i, :len(p)] = p
        mask[i, :len(p)] = True

    model = Transformer(cfg, src_vocab_size=V,
                        self_cache_len=P + MAX_NEW)
    variables = model.init(RNG, decoder_input=jnp.asarray(right))
    params = variables["params"]

    left_tokens, left_mask = left_align(right, mask, pad)
    out = sample_decode(model, params, jnp.asarray(left_tokens),
                        jnp.asarray(left_mask), max_new=MAX_NEW,
                        eos_idx=eos, pad_idx=pad, greedy=True)
    expected = naive_greedy(model, params, prompts, MAX_NEW, eos)
    for i, exp in enumerate(expected):
        got = [int(t) for t in np.asarray(out["tokens"][i])][:len(exp)]
        assert got == exp, f"row {i}: {got} != {exp}"


def test_greedy_with_oversized_cache():
    """The cache may be longer than P + max_new (e.g. one model instance
    shared between greedy and speculative decode sizes its cache for the
    speculative chunk); the decode mask is padded to the cache length
    inside attention (regression: bench_1b --decode crashed on this)."""
    cfg = small_cfg("llama_7b", "language_modeling", attention_heads_kv=2)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    prompts = [[5, 6, 7, 8, 9], [10, 11, 12]]
    P = max(len(p) for p in prompts)
    right = np.full((2, P), pad, np.int32)
    mask = np.zeros((2, P), bool)
    for i, p in enumerate(prompts):
        right[i, :len(p)] = p
        mask[i, :len(p)] = True
    model = Transformer(cfg, src_vocab_size=V,
                        self_cache_len=P + MAX_NEW + 9)   # oversized
    params = model.init(RNG, decoder_input=jnp.asarray(right))["params"]
    left_tokens, left_mask = left_align(right, mask, pad)
    out = sample_decode(model, params, jnp.asarray(left_tokens),
                        jnp.asarray(left_mask), max_new=MAX_NEW,
                        eos_idx=eos, pad_idx=pad, greedy=True)
    expected = naive_greedy(model, params, prompts, MAX_NEW, eos)
    for i, exp in enumerate(expected):
        got = [int(t) for t in np.asarray(out["tokens"][i])][:len(exp)]
        assert got == exp, f"row {i}: {got} != {exp}"


def test_greedy_matches_naive_encoder_decoder():
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S = 2, 6
    rng = np.random.default_rng(0)
    src = rng.integers(4, V, (B, S)).astype(np.int32)
    src[1, -2:] = pad
    src = jnp.asarray(src)

    model = Transformer(cfg, src_vocab_size=V, self_cache_len=1 + MAX_NEW,
                        cross_cache_len=S)
    prompt = np.full((B, 1), bos, np.int32)
    variables = model.init(RNG, src_tokens=src,
                           decoder_input=jnp.asarray(prompt))
    params = variables["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)

    out = sample_decode(model, params, jnp.asarray(prompt),
                        jnp.ones((B, 1), bool), max_new=MAX_NEW,
                        eos_idx=eos, pad_idx=pad, greedy=True,
                        encoder_out=encoder_out, encoder_mask=encoder_mask)
    expected = naive_greedy(model, params, [[bos]] * B, MAX_NEW, eos, src=src)
    for i, exp in enumerate(expected):
        got = [int(t) for t in np.asarray(out["tokens"][i])][:len(exp)]
        assert got == exp, f"row {i}: {got} != {exp}"


def test_beam_search_basics():
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S, K = 2, 6, 3
    src = jnp.asarray(np.random.default_rng(1).integers(4, V, (B, S)), jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=1 + MAX_NEW,
                        cross_cache_len=S)
    prompt = jnp.full((B, 1), bos, jnp.int32)
    variables = model.init(RNG, src_tokens=src, decoder_input=prompt)
    params = variables["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)

    out = beam_search(model, params, prompt, jnp.ones((B, 1), bool),
                      beam_size=K, max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                      encoder_out=encoder_out, encoder_mask=encoder_mask)
    scores = np.asarray(out["scores"])
    assert out["tokens"].shape == (B, K, MAX_NEW)
    # sorted best-first
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # positional scores sum (unnormalized) matches normalized score * (len+1)^p
    lengths = np.asarray(out["lengths"])
    pos_sum = np.asarray(out["positional_scores"]).sum(axis=-1)
    expected = pos_sum / (lengths + 1.0)
    np.testing.assert_allclose(scores, expected, atol=1e-4)


def test_beam1_matches_greedy():
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S = 2, 5
    src = jnp.asarray(np.random.default_rng(2).integers(4, V, (B, S)), jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=1 + MAX_NEW,
                        cross_cache_len=S)
    prompt = jnp.full((B, 1), bos, jnp.int32)
    params = model.init(RNG, src_tokens=src, decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)
    greedy = sample_decode(model, params, prompt, jnp.ones((B, 1), bool),
                           max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                           greedy=True, encoder_out=encoder_out,
                           encoder_mask=encoder_mask)
    beam = beam_search(model, params, prompt, jnp.ones((B, 1), bool),
                       beam_size=1, max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                       encoder_out=encoder_out, encoder_mask=encoder_mask)
    for i in range(B):
        g = [int(t) for t in np.asarray(greedy["tokens"][i])]
        b = [int(t) for t in np.asarray(beam["tokens"][i, 0])]
        n = int(greedy["lengths"][i])
        assert g[:n] == b[:n]


def test_sampling_respects_blacklist_and_topk():
    cfg = small_cfg("llama_7b", "language_modeling", attention_heads_kv=2)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=3 + MAX_NEW)
    params = model.init(RNG, decoder_input=prompt)["params"]
    banned = (9, 10, 11)
    out = sample_decode(model, params, prompt, jnp.ones((1, 3), bool),
                        max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                        greedy=False, temperature=2.0, top_k=5,
                        blacklist=banned, rng=jax.random.PRNGKey(7))
    tokens = [int(t) for t in np.asarray(out["tokens"][0])]
    assert not set(tokens) & set(banned)


def test_stop_sequences():
    cfg = small_cfg("llama_7b", "language_modeling", attention_heads_kv=2)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=3 + MAX_NEW)
    params = model.init(RNG, decoder_input=prompt)["params"]
    # find what greedy generates first, then use it as a stop sequence
    free = sample_decode(model, params, prompt, jnp.ones((1, 3), bool),
                         max_new=MAX_NEW, eos_idx=eos, pad_idx=pad, greedy=True)
    first = int(free["tokens"][0, 0])
    stopped = sample_decode(model, params, prompt, jnp.ones((1, 3), bool),
                            max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                            greedy=True, stop_sequences=((first,),))
    later = np.asarray(stopped["tokens"][0, 1:])
    assert (later == pad).all()  # generation stopped after the stop token


def test_ensemble_decoding():
    """Two-member ensembles average log-probs; an ensemble of two copies of
    the same model must equal the single model (decoding.py:1704-1777)."""
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S = 2, 5
    src = jnp.asarray(np.random.default_rng(3).integers(4, V, (B, S)), jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=1 + MAX_NEW,
                        cross_cache_len=S)
    prompt = jnp.full((B, 1), bos, jnp.int32)
    params = model.init(RNG, src_tokens=src, decoder_input=prompt)["params"]
    params2 = model.init(jax.random.PRNGKey(9), src_tokens=src,
                         decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)

    single = sample_decode(model, params, prompt, jnp.ones((B, 1), bool),
                           max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                           greedy=True, encoder_out=encoder_out,
                           encoder_mask=encoder_mask)
    same_twice = sample_decode(model, [params, params], prompt,
                               jnp.ones((B, 1), bool), max_new=MAX_NEW,
                               eos_idx=eos, pad_idx=pad, greedy=True,
                               encoder_out=encoder_out,
                               encoder_mask=encoder_mask)
    assert np.array_equal(np.asarray(single["tokens"]),
                          np.asarray(same_twice["tokens"]))
    # a real 2-member ensemble runs and differs from member 1 in general
    mixed = sample_decode(model, [params, params2], prompt,
                          jnp.ones((B, 1), bool), max_new=MAX_NEW,
                          eos_idx=eos, pad_idx=pad, greedy=True,
                          encoder_out=encoder_out, encoder_mask=encoder_mask)
    assert np.isfinite(np.asarray(mixed["scores"])).all()
    # beam search with an ensemble
    beam = beam_search(model, [params, params2], prompt,
                       jnp.ones((B, 1), bool), beam_size=2, max_new=MAX_NEW,
                       eos_idx=eos, pad_idx=pad, encoder_out=encoder_out,
                       encoder_mask=encoder_mask)
    assert np.isfinite(np.asarray(beam["scores"])).all()


def test_speculative_greedy_matches_plain_encdec():
    """Speculative (prompt-lookup) greedy == plain greedy, token for token."""
    from pasero_tpu.decoding.search import speculative_greedy_decode
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S, max_new, K = 3, 6, 10, 4
    rng = np.random.default_rng(1)
    src = rng.integers(4, V, (B, S)).astype(np.int32)
    src[2, -2:] = pad
    src = jnp.asarray(src)
    src_mask = src != pad

    model_plain = Transformer(cfg, src_vocab_size=V,
                              self_cache_len=1 + max_new, cross_cache_len=S)
    prompt = jnp.asarray(np.full((B, 1), bos, np.int32))
    params = model_plain.init(RNG, src_tokens=src,
                              decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model_plain.apply(
        {"params": params}, src, src_mask=src_mask, method=Transformer.encode)
    plain = sample_decode(model_plain, params, prompt, jnp.ones((B, 1), bool),
                          max_new=max_new, eos_idx=eos, pad_idx=pad,
                          greedy=True, encoder_out=encoder_out,
                          encoder_mask=encoder_mask)

    model_spec = Transformer(cfg, src_vocab_size=V,
                             self_cache_len=1 + max_new + K + 1,
                             cross_cache_len=S)
    spec = speculative_greedy_decode(
        model_spec, params, prompt, jnp.ones((B, 1), bool),
        max_new=max_new, eos_idx=eos, pad_idx=pad,
        encoder_out=encoder_out, encoder_mask=encoder_mask,
        lookup=src, lookup_mask=src_mask, draft_len=K)

    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(spec["tokens"]))
    np.testing.assert_array_equal(np.asarray(plain["lengths"]),
                                  np.asarray(spec["lengths"]))
    np.testing.assert_allclose(np.asarray(plain["scores"]),
                               np.asarray(spec["scores"]), atol=2e-3)


def test_speculative_accelerates_copy_task():
    """When the continuation is in the lookup, fewer model calls are made."""
    from pasero_tpu.decoding.search import speculative_greedy_decode
    cfg = small_cfg("llama_7b", "language_modeling", attention_heads_kv=2)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    max_new, K = 12, 4
    prompt_ids = [5, 6, 7, 8, 9, 5, 6, 7]  # repeating pattern: drafts hit
    P = len(prompt_ids)
    prompt = jnp.asarray([prompt_ids], jnp.int32)
    pm = jnp.ones((1, P), bool)

    model_plain = Transformer(cfg, src_vocab_size=V,
                              self_cache_len=P + max_new)
    params = model_plain.init(RNG, decoder_input=prompt)["params"]
    plain = sample_decode(model_plain, params, prompt, pm, max_new=max_new,
                          eos_idx=eos, pad_idx=pad, greedy=True)

    model_spec = Transformer(cfg, src_vocab_size=V,
                             self_cache_len=P + max_new + K + 1)
    spec = speculative_greedy_decode(model_spec, params, prompt, pm,
                                     max_new=max_new, eos_idx=eos,
                                     pad_idx=pad, draft_len=K)
    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(spec["tokens"]))
    # plain greedy uses one decoder call per token (+ prompt); speculation
    # must do strictly fewer for any draft hit at all
    assert int(spec["model_calls"]) <= max_new


def test_beam_lineage_matches_permute():
    """No-reorder lineage attention (attention.lineage_attention) produces
    token- and score-identical beams to the cache-permute path."""
    cfg = small_cfg("transformer_small", "translation")
    pad, eos, bos = cfg.padding_idx, cfg.eos_idx, cfg.bos_idx
    B, S, K = 3, 7, 4
    src = jnp.asarray(np.random.default_rng(5).integers(4, V, (B, S)), jnp.int32)
    model = Transformer(cfg, src_vocab_size=V, self_cache_len=2 + MAX_NEW,
                        cross_cache_len=S)
    # multi-token forced prompt exercises prompt slots in the lineage
    prompt = jnp.asarray([[pad, bos], [bos, 9], [bos, 12]], jnp.int32)
    prompt_mask = jnp.asarray([[False, True], [True, True], [True, True]])
    params = model.init(RNG, src_tokens=src, decoder_input=prompt)["params"]
    encoder_out, encoder_mask = model.apply(
        {"params": params}, src, method=Transformer.encode)
    common = dict(beam_size=K, max_new=MAX_NEW, eos_idx=eos, pad_idx=pad,
                  encoder_out=encoder_out, encoder_mask=encoder_mask)
    out_lineage = beam_search(model, params, prompt, prompt_mask,
                              lineage=True, **common)
    out_permute = beam_search(model, params, prompt, prompt_mask,
                              lineage=False, **common)
    np.testing.assert_array_equal(np.asarray(out_lineage["tokens"]),
                                  np.asarray(out_permute["tokens"]))
    np.testing.assert_allclose(np.asarray(out_lineage["scores"]),
                               np.asarray(out_permute["scores"]),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out_lineage["lengths"]),
                                  np.asarray(out_permute["lengths"]))


def test_fused_head_greedy_and_speculative_parity(monkeypatch):
    """PASERO_FUSED_HEAD=1 (the TPU greedy fast path: Pallas argmax head,
    no fp32 (B, V) logits) produces identical tokens AND scores to the
    materialized-logits path, for sample_decode and the speculative
    verifier alike."""
    from pasero_tpu.decoding.search import speculative_greedy_decode
    cfg = small_cfg("llama_7b", "language_modeling", attention_heads_kv=2)
    pad, eos = max(cfg.padding_idx, 0), cfg.eos_idx
    B, P = 2, 6
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(4, V, (B, P)), jnp.int32)
    pm = jnp.ones((B, P), bool)
    model = Transformer(cfg, src_vocab_size=V,
                        self_cache_len=P + MAX_NEW + 5)
    params = model.init(RNG, decoder_input=prompt)["params"]
    common = dict(max_new=MAX_NEW, eos_idx=eos, pad_idx=pad)

    runs = {}
    for env in ["0", "1"]:
        monkeypatch.setenv("PASERO_FUSED_HEAD", env)
        runs[env] = (
            sample_decode(model, params, prompt, pm, greedy=True, **common),
            speculative_greedy_decode(model, params, prompt, pm,
                                      draft_len=4, **common),
        )
    for i in range(2):
        a, b = runs["0"][i], runs["1"][i]
        np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                      np.asarray(b["tokens"]))
        # scores agree to bf16 logit precision: the materialized path
        # rounds logits to bf16 in HBM before the fp32 log_softmax; the
        # fused head keeps the whole tile in fp32 (strictly more accurate)
        np.testing.assert_allclose(np.asarray(a["scores"]),
                                   np.asarray(b["scores"]), atol=2e-2)
