#!/usr/bin/env python3
"""Per-op profile of the 1B training step (the round-3 review's MFU
attribution demand): trace N steps with jax.profiler, parse the xplane
with jax.profiler.ProfileData, and print device time grouped by op class.

Usage: python scripts/profile_1b.py [--policy none --attention flash ...]
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root
sys.path.insert(0, _HERE)                    # sibling bench_1b import


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--policy", default="none")
    parser.add_argument("--attention", default="flash")
    parser.add_argument("--batch-tokens", type=int, default=8192)
    parser.add_argument("--ckpt-interval", type=int, default=1)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--trace-dir", default="/tmp/prof_1b")
    args = parser.parse_args()

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax

    import bench_1b
    import xprof_util

    # reuse bench_1b's exact training-step setup by running its bench_train
    # with a tiny step count under the trace
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        bench_1b.bench_train(args.steps, args.batch_tokens,
                             policy=args.policy, attention=args.attention,
                             ckpt_interval=args.ckpt_interval)
    xprof_util.report(args.trace_dir, top=args.top)


if __name__ == "__main__":
    main()
