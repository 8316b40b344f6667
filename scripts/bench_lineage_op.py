#!/usr/bin/env python3
"""Microbench: lineage_attention vs plain decode attention at beam-decode
shapes, isolated from the search loop (6 chained layer calls per iter)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from pasero_tpu.models.attention import (lineage_attention,
                                             dot_product_attention)

    B, K, H, D = 64, 5, 8, 64
    LAYERS, ITERS = 6, 50

    for L in (65, 320):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B * K, H, 1, D), jnp.bfloat16)
        kc = jax.random.normal(key, (B * K, H, L, D), jnp.bfloat16)
        vc = jax.random.normal(key, (B * K, H, L, D), jnp.bfloat16)
        lineage = jnp.zeros((B, K, L), jnp.int32)
        mask = jnp.ones((B * K, 1, 1, L), bool)
        scale = D ** -0.5

        def run(fn):
            def step(q):
                o = q
                for _ in range(LAYERS):
                    o = fn(o, kc, vc)
                return o

            @jax.jit
            def loop(q):
                return lax.fori_loop(0, ITERS,
                                     lambda i, x: step(x) * (1 + 0 * i), q)

            np.asarray(loop(q)).ravel()[0]
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(q)).ravel()[0]
                best = min(best, time.perf_counter() - t0)
            return best * 1000 / ITERS

        t_lin = run(lambda x, kk, vv: lineage_attention(
            x, kk, vv, lineage, mask=mask, scale=scale))
        t_dot = run(lambda x, kk, vv: dot_product_attention(
            x, kk, vv, mask=mask, scale=scale))
        print(f"L={L:4d}  dot {t_dot:6.3f} ms  lineage {t_lin:6.3f} ms  "
              f"({t_lin / t_dot:.2f}x)")


if __name__ == "__main__":
    main()
