#!/usr/bin/env python3
"""Split a Mixture-of-Experts checkpoint into per-expert files for
NLLB-style expert pruning (inverse of the reference's merge-tutel-ckpt.py:
with GSPMD there are no per-rank shards to merge, but serving wants
per-expert files to hot-swap, tasks/nllb_translation.py).

Usage: python scripts/split_expert_ckpt.py model.npz -o experts_dir
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("-o", "--output-dir", required=True)
    args = parser.parse_args(argv)

    from pasero_tpu.checkpoints import load_flat
    flat = load_flat(args.checkpoint)
    expert_keys = {k: v for k, v in flat.items()
                   if re.search(r"/experts_(in|out|gate)(_bias)?$", k)}
    if not expert_keys:
        print("no expert parameters found")
        return 1
    num_experts = next(iter(expert_keys.values())).shape[0]
    os.makedirs(args.output_dir, exist_ok=True)
    sites = {k.rsplit("/", 1)[0] for k in expert_keys}
    for e in range(num_experts):
        slice_ = {k: v[e] for k, v in expert_keys.items()}
        # the expert's column in the (unpruned) router, used by the NLLB
        # task's gate slicing (tasks/nllb_translation.py:237-250 equivalent)
        for site in sites:
            slice_[f"{site}/gate_col"] = np.int32(e)
        path = os.path.join(args.output_dir, f"expert_{e:04}.npz")
        with open(path, "wb") as f:
            np.savez(f, **slice_)
    # full routers, to be column-sliced per selected expert subset
    gates = {k: v for k, v in flat.items() if re.search(r"/ffn/gate$", k)}
    if gates:
        with open(os.path.join(args.output_dir, "gates.npz"), "wb") as f:
            np.savez(f, **gates)
    print(f"wrote {num_experts} expert files ({len(expert_keys)} sites each"
          f"{', gates.npz' if gates else ''}) -> {args.output_dir}")


if __name__ == "__main__":
    sys.exit(main() or 0)
