"""Shared xplane-trace parsing for the profile_* scripts: device op time
grouped by op class, via jax.profiler.ProfileData (no tensorboard needed)."""

import collections
import glob
import os
import re


def classify(name: str) -> str:
    """Map an XLA/Mosaic op name to a coarse class for attribution."""
    n = name.lower()
    if "flash" in n or "attention" in n:
        return "attention-kernel"
    if "fused_ce" in n or "cross_entropy" in n or re.search(r"\bce\b", n):
        return "fused-ce"
    if "argmax" in n or "top_k" in n or "topk" in n or "sort" in n:
        return "topk/sort/argmax"
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
    if n.startswith(("dynamic-update-slice", "dynamic-slice", "scatter",
                     "gather", "select-and-scatter")):
        return "slice/scatter/gather"
    return "other"


def report(trace_dir: str, top: int = 25):
    """Parse the newest xplane under trace_dir; print per-class + top ops."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane trace written under {trace_dir}"
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

    print(f"\n=== device op time ({total/1e6:.1f} ms total) ===")
    print(f"{'class':32s} {'ms':>10s} {'share':>7s}")
    for cls, ns in by_class.most_common():
        print(f"{cls:32s} {ns/1e6:10.2f} {ns/total*100:6.1f}%")
    print(f"\n--- top {top} ops ---")
    for op, ns in by_op.most_common(top):
        print(f"{ns/1e6:10.2f} ms  {op[:110]}")
    return by_class, by_op, total
