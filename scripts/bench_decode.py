#!/usr/bin/env python3
"""Decode-throughput benchmark (the PERFORMANCE.md decode table).

Measures output tokens/s on transformer-base MT with random params:
greedy, beam-5 with cache permutation, and beam-5 with lineage attention
(no cache reorder — attention.lineage_attention).

Usage: python scripts/bench_decode.py [--batch 64] [--max-new 64]
       [--beam 5] [--src-len 32] [--vocab 32768] [--arch transformer]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--max-new", type=int, default=64)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--src-len", type=int, default=32)
    parser.add_argument("--prompt-len", type=int, default=1,
                        help="forced-prompt length (scales the KV cache)")
    parser.add_argument("--vocab", type=int, default=32768)
    parser.add_argument("--arch", default="transformer")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--quantize", action="store_true",
                        help="weight-only int8 (ops/quantize.py): measured "
                             "1.07x greedy even at this mostly "
                             "compute-bound 100M scale (69.0k -> 73.9k, "
                             "2026-08-21); the big win is the weight-bound "
                             ">=1B regime (bench_1b.py --decode "
                             "--quantize: 1.48x)")
    parser.add_argument("--only", choices=["greedy", "permute", "lineage"],
                        help="run a single variant (clean per-variant "
                             "profiles under scripts/profile_decode.py)")
    args = parser.parse_args(argv)

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pasero_tpu.config import get_model_config_cls
    from pasero_tpu.decoding.search import beam_search, sample_decode
    from pasero_tpu.config import get_model_cls
    from pasero_tpu.models.transformer import Transformer

    model_cls, cfg_cls = get_model_cls(args.arch)
    cfg = cfg_cls()
    cfg.set_defaults("translation")
    cfg.dropout = 0.0
    B, S, K, N = args.batch, args.src_len, args.beam, args.max_new
    V = args.vocab
    pad, bos, eos = cfg.padding_idx, cfg.bos_idx, cfg.eos_idx

    P = args.prompt_len
    model = model_cls(cfg, src_vocab_size=V, self_cache_len=P + N,
                      cross_cache_len=S)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(4, V, (B, S)), jnp.int32)
    prompt = jnp.full((B, P), max(bos, eos), jnp.int32)
    prompt_mask = jnp.ones((B, P), bool)
    params = model.init(jax.random.PRNGKey(0), src_tokens=src,
                        decoder_input=prompt)["params"]
    if args.quantize:
        from pasero_tpu.ops.quantize import quantize_params
        params, n_q = quantize_params(params, min_size=0)
        print(f"quantized {n_q} weights to int8")
    encoder_out, encoder_mask = model.apply({"params": params}, src,
                                            method=model_cls.encode)

    def timed(label, fn):
        out = fn(params)                # compile + warm
        tokens = int(np.asarray(out["tokens"]).size and
                     np.asarray(out["lengths"]).reshape(B, -1)[:, 0].sum())
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(params)
            # axon's block_until_ready can return early; a device->host
            # transfer forces completion
            np.asarray(out["tokens"])
            best = min(best, time.perf_counter() - t0)
        rate = tokens / best
        print(f"{label:45s} {rate/1000:8.1f}k tok/s   "
              f"({best*1000/N:.2f} ms/decoder call, {tokens} tokens)")
        return rate

    common = dict(max_new=N, eos_idx=eos, pad_idx=pad,
                  encoder_out=encoder_out, encoder_mask=encoder_mask)
    # params as a jit argument (closing over them inlines the weights as
    # graph constants — slow compile, unrepresentative executable)
    greedy = jax.jit(lambda p: sample_decode(model, p, prompt, prompt_mask,
                                             greedy=True, **common))
    beam_permute = jax.jit(lambda p: beam_search(model, p, prompt,
                                                 prompt_mask, beam_size=K,
                                                 lineage=False, **common))
    beam_lineage = jax.jit(lambda p: beam_search(model, p, prompt,
                                                 prompt_mask, beam_size=K,
                                                 lineage=True, **common))
    if args.only in (None, "greedy"):
        timed("greedy", greedy)
    if args.only in (None, "permute"):
        permute_rate = timed(f"beam-{K} cache permute", beam_permute)
    if args.only in (None, "lineage"):
        lineage_rate = timed(f"beam-{K} lineage (no reorder)", beam_lineage)
    if args.only is None:
        print(f"lineage speedup over permute: "
              f"{lineage_rate/permute_rate:.2f}x")


if __name__ == "__main__":
    main()
