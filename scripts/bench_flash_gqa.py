#!/usr/bin/env python3
"""Isolated flash-attention timing at the llama_1b training shape
(B=4, H=32, Hkv=4, S=2048, D=64, causal, bf16), split into forward-only
and forward+backward, so kernel changes can be iterated in ~1 min instead
of the 8-min full 1B bench.

Block sizes come from the usual PASERO_FLASH_BQ/BK and
PASERO_FLASH_BWD_BQ/BK env vars, so this doubles as the sweep driver:

    for bq in 256 512; do for bk in 256 512; do
      PASERO_FLASH_BWD_BQ=$bq PASERO_FLASH_BWD_BK=$bk \
        python scripts/bench_flash_gqa.py --backward-only; done; done

Roofline context (one call, 22 of which make a 1B training step):
attention matmul FLOPs = 2*B*H*S^2*D*(2 fwd + 5 bwd)*0.5 causal; at D=64
the MXU runs at <=50% occupancy, so the practical floor is ~0.7 ms fwd /
~1.8 ms bwd per call on a 197 TF/s v5e chip.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--heads", type=int, default=32)
    parser.add_argument("--kv-heads", type=int, default=4)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--seq", type=int, default=2048)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--forward-only", action="store_true")
    parser.add_argument("--backward-only", action="store_true")
    parser.add_argument("--xla", action="store_true",
                        help="time XLA attention instead of the kernel")
    args = parser.parse_args()

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, H, Hkv, S, D = (args.batch, args.heads, args.kv_heads, args.seq,
                       args.dim)
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, Hkv, S, D), jnp.bfloat16)
    do = jax.random.normal(kd, (B, H, S, D), jnp.bfloat16)
    scale = D ** -0.5

    if args.xla:
        group = H // Hkv

        def attn(q, k, v):
            kx = jnp.repeat(k, group, axis=1)
            vx = jnp.repeat(v, group, axis=1)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kx,
                           preferred_element_type=jnp.float32) * scale
            causal = jnp.tril(jnp.ones((S, S), bool))
            s = jnp.where(causal, s, -1e9)
            w = jax.nn.softmax(s, -1)
            return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), vx)
    else:
        from pasero_tpu.ops.flash_attention import flash_attention

        def attn(q, k, v):
            return flash_attention(q, k, v, scale=scale, causal=True)

    from jax import lax

    def timed(step, q0):
        """Differential on-device timing: the axon tunnel costs >1 s of
        fixed latency per dispatch, so time a 2n-iteration fori_loop minus
        an n-iteration one — the fixed cost cancels exactly."""
        @functools.partial(jax.jit, static_argnums=1)
        def loop(q, n):
            return lax.fori_loop(
                0, n, lambda i, q: step(q) * (1 + 0 * i), q)

        def run(n):
            np.asarray(loop(q0, n)).ravel()[:1]          # compile + warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(loop(q0, n)).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best

        n = args.iters
        return (run(2 * n) - run(n)) / n * 1e3

    results = {}
    if not args.backward_only:
        results["fwd_ms"] = timed(lambda q: attn(q, k, v).astype(q.dtype), q)
    if not args.forward_only:
        def loss(q, k, v):
            return (attn(q, k, v).astype(jnp.float32) *
                    do.astype(jnp.float32)).sum()

        def step(q):
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            # keep dk/dv live (a q-only grad lets XLA DCE the dkv kernel)
            return (q + dq + (dk.sum() + dv.sum()) * 1e-30).astype(q.dtype)
        results["fwdbwd_ms"] = timed(step, q)

    blocks = {k_: os.environ.get(k_) for k_ in
              ("PASERO_FLASH_BQ", "PASERO_FLASH_BK",
               "PASERO_FLASH_BWD_BQ", "PASERO_FLASH_BWD_BK")
              if os.environ.get(k_)}
    tag = "xla" if args.xla else "flash"
    print({"impl": tag, "shape": [B, H, Hkv, S, D], **blocks,
           **{k_: round(v_, 3) for k_, v_ in results.items()}})


if __name__ == "__main__":
    main()
