#!/usr/bin/env python3
"""Flash-attention kernel sweep: Pallas vs XLA across sequence lengths and
block sizes (the PERFORMANCE.md crossover table).

Timing loops on-device (lax.fori_loop with a data dependence) so the axon
tunnel's per-call overhead doesn't pollute the numbers.

Usage: python scripts/bench_flash.py [--batch 4] [--heads 8] [--dim 64]
       [--seqs 512 1024 2048 4096] [--sweep-blocks] [--backward]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--seqs", type=int, nargs="+",
                        default=[512, 1024, 2048, 4096])
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--sweep-blocks", action="store_true")
    parser.add_argument("--forward-only", action="store_true")
    args = parser.parse_args(argv)

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    B, H, D, ITERS = args.batch, args.heads, args.dim, args.iters

    def bench(S, impl) -> float:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
        scale = D ** -0.5

        if impl == "xla":
            def attn(q, k, v):
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                               preferred_element_type=jnp.float32) * scale
                causal = jnp.tril(jnp.ones((S, S), bool))
                s = jnp.where(causal, s, -1e9)
                w = jax.nn.softmax(s, -1)
                return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
        else:
            from pasero_tpu.ops.flash_attention import flash_attention

            def attn(q, k, v):
                return flash_attention(q, k, v, scale=scale, causal=True)

        if args.forward_only:
            def step(q):
                return attn(q, k, v)
        else:
            def step(q):
                def loss(q):
                    return attn(q, k, v).astype(jnp.float32).mean()
                return q + jax.grad(loss)(q).astype(q.dtype)

        @jax.jit
        def loop(q):
            return lax.fori_loop(
                0, ITERS, lambda i, q: step(q) * (1 + 0 * i), q)

        try:
            out = loop(q)
            np.asarray(out).ravel()[0]
        except Exception as e:
            return float("nan")
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(loop(q)).ravel()[0]
            best = min(best, time.perf_counter() - t0)
        return best * 1000 / ITERS

    mode = "fwd" if args.forward_only else "fwd+bwd"
    print(f"B={B} H={H} D={D} causal bf16 ({mode}, ms/iter)")
    for S in args.seqs:
        xla = bench(S, "xla")
        flash = bench(S, "flash")
        print(f"S={S:6d}  xla {xla:8.2f}  flash {flash:8.2f}  "
              f"({xla/flash:.2f}x)")
        if args.sweep_blocks:
            for bq in (128, 256, 512):
                for bk in (128, 256, 512, 1024):
                    if bq > S or bk > S:
                        continue
                    os.environ["PASERO_FLASH_BQ"] = str(bq)
                    os.environ["PASERO_FLASH_BK"] = str(bk)
                    os.environ["PASERO_FLASH_BWD_BQ"] = str(bq)
                    os.environ["PASERO_FLASH_BWD_BK"] = str(bk)
                    t = bench(S, "flash")
                    print(f"    bq={bq:4d} bk={bk:4d}  {t:8.2f}")
            for name in ("PASERO_FLASH_BQ", "PASERO_FLASH_BK",
                         "PASERO_FLASH_BWD_BQ", "PASERO_FLASH_BWD_BK"):
                os.environ.pop(name, None)


if __name__ == "__main__":
    main()
