#!/usr/bin/env python3
"""Per-op profile of the 1B training step (the round-3 review's MFU
attribution demand): trace N steps with jax.profiler, parse the xplane
with jax.profiler.ProfileData, and print device time grouped by op class.

Usage: python scripts/profile_1b.py [--policy none --attention flash ...]
"""

import argparse
import collections
import glob
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root
sys.path.insert(0, _HERE)                    # sibling bench_1b import


def classify(name: str) -> str:
    """Map an XLA/Mosaic op name to a coarse class for attribution."""
    n = name.lower()
    if "flash" in n or "attention" in n:
        return "attention-kernel"
    if "fused_ce" in n or "cross_entropy" in n or re.search(r"\bce\b", n):
        return "fused-ce"
    if n.startswith(("dot", "convolution")) or ".dot" in n:
        return "matmul"
    if n.startswith("fusion"):
        return "fusion(elementwise/other)"
    if n.startswith(("copy", "transpose", "bitcast", "reshape")):
        return "copy/layout"
    if n.startswith(("all-reduce", "all-gather", "reduce-scatter",
                     "collective")):
        return "collective"
    if "custom-call" in n or "custom_call" in n:
        return "custom-call(pallas)"
    return "other"


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

    # reuse bench_1b's exact training-step setup by monkey-stepping through
    # its bench_train with a tiny step count under the trace
    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        bench_1b.bench_train(args.steps, args.batch_tokens,
                             policy=args.policy, attention=args.attention,
                             ckpt_interval=args.ckpt_interval)

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane trace written under {args.trace_dir}"
    from jax.profiler import ProfileData
    data = ProfileData.from_file(paths[-1])

    by_class = collections.Counter()
    by_op = collections.Counter()
    total = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            # the 'XLA Ops' line carries per-op device durations
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns
                by_op[ev.name] += dur
                by_class[classify(ev.name)] += dur
                total += dur

    print(f"\n=== device op time over {args.steps} steps "
          f"({total/1e6:.1f} ms total) ===")
    print(f"{'class':32s} {'ms':>10s} {'share':>7s}")
    for cls, ns in by_class.most_common():
        print(f"{cls:32s} {ns/1e6:10.2f} {ns/total*100:6.1f}%")
    print(f"\n--- top {args.top} ops ---")
    for op, ns in by_op.most_common(args.top):
        print(f"{ns/1e6:10.2f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
