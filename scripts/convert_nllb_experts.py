#!/usr/bin/env python3
"""Convert FAIR-released NLLB-200 MoE expert checkpoints to pasero_tpu format.

The 54B NLLB-200 MoE release ships one PyTorch file per expert, named
``{encoder|decoder}-{layer}-expert-{id}.bin`` with params keyed
``decoder.layers.3.moe_layer.experts.0.fc1.weight`` (the inner expert id is
always 0) — layout documented by the reference at
pasero/tasks/nllb_translation.py:29-41 and loaded at :143-252.  Global expert
ids 0-1535 map to files via ``layer = id // 128 * 4 + 3`` (encoder if < 24).

This script emits the layout expected by pasero_tpu's NLLB expert-pruning task
(pasero_tpu/tasks/nllb_translation.py):
- ``expert_{gid:04}.npz`` per expert: ``{site}/experts_in`` (D,F),
  ``{site}/experts_out`` (F,D), optional biases, and ``{site}/gate_col`` (the
  expert's column in the full gate);
- ``gates.npz``: the full per-layer router weights ``{site}/gate`` (D,E_full),
  extracted from the dense checkpoint (``--dense-ckpt``) whose
  ``moe_layer.gate.wg.weight`` params the reference slices per language pair
  (nllb_translation.py:237-250).

Usage:
  python scripts/convert_nllb_experts.py EXPERT_DIR -o OUT_DIR \
      [--dense-ckpt model_dict.pt] [--experts-per-layer 128] \
      [--expert-interval 4] [--encoder-layers 24]
"""

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILE_RE = re.compile(r"(?P<module>encoder|decoder)-(?P<layer>\d+)"
                     r"-expert-(?P<local>\d+)\.(bin|pt)")


def global_expert_id(module: str, layer: int, local: int,
                     experts_per_layer: int, interval: int,
                     encoder_layers: int) -> int:
    """Inverse of the reference's expert_id_to_ckpt
    (tasks/nllb_translation.py:29-41)."""
    global_layer = layer if module == "encoder" else layer + encoder_layers
    block = (global_layer - (interval - 1)) // interval
    return block * experts_per_layer + local


def convert_expert_state(sd: dict) -> dict:
    """One FAIR expert file -> flat pasero_tpu per-expert arrays."""
    out = {}
    pattern = re.compile(
        r"(?P<side>encoder|decoder)\.layers\.(?P<n>\d+)\.moe_layer"
        r"\.experts\.\d+\.(?P<which>fc1|fc2)\.(?P<kind>weight|bias)$")
    for name, tensor in sd.items():
        m = pattern.fullmatch(name)
        if not m:
            continue
        arr = np.asarray(tensor.float().numpy() if hasattr(tensor, "float")
                         else tensor, dtype=np.float32)
        site = f"{m.group('side')}/layers_{m.group('n')}/ffn"
        if m.group("kind") == "weight":
            # torch fc1 (F,D) -> experts_in (D,F); fc2 (D,F) -> experts_out (F,D)
            suffix = "experts_in" if m.group("which") == "fc1" else "experts_out"
            out[f"{site}/{suffix}"] = arr.T
        else:
            suffix = ("experts_in_bias" if m.group("which") == "fc1"
                      else "experts_out_bias")
            out[f"{site}/{suffix}"] = arr
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("expert_dir",
                        help="directory with {module}-{layer}-expert-{id}.bin files")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("--dense-ckpt",
                        help="dense checkpoint holding the moe_layer.gate.wg.weight "
                             "router params (for gates.npz)")
    parser.add_argument("--experts-per-layer", type=int, default=128)
    parser.add_argument("--expert-interval", type=int, default=4)
    parser.add_argument("--encoder-layers", type=int, default=24)
    args = parser.parse_args(argv)

    import torch
    paths = sorted(glob.glob(os.path.join(args.expert_dir, "*-expert-*.bin"))
                   + glob.glob(os.path.join(args.expert_dir, "*-expert-*.pt")))
    matches = [(p, FILE_RE.fullmatch(os.path.basename(p))) for p in paths]
    matches = [(p, m) for p, m in matches if m]
    if not matches:
        print(f"no expert files found in {args.expert_dir}")
        return 1

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for path, m in matches:
        module, layer, local = (m.group("module"), int(m.group("layer")),
                                int(m.group("local")))
        gid = global_expert_id(module, layer, local, args.experts_per_layer,
                               args.expert_interval, args.encoder_layers)
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd)
        flat = convert_expert_state(sd)
        if not flat:
            print(f"warning: no expert params in {path}")
            continue
        sites = {k.rsplit("/", 1)[0] for k in flat}
        for site in sites:
            flat[f"{site}/gate_col"] = np.int32(local)
        out_path = os.path.join(args.output_dir, f"expert_{gid:04}.npz")
        with open(out_path, "wb") as f:
            np.savez(f, **flat)
        count += 1

    if args.dense_ckpt:
        sd = torch.load(args.dense_ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd)
        gates = {}
        gate_re = re.compile(
            r"(?P<side>encoder|decoder)\.layers\.(?P<n>\d+)\.moe_layer"
            r"\.gate(\.wg)?\.weight$")
        for name, tensor in sd.items():
            gm = gate_re.fullmatch(name)
            if gm:
                arr = np.asarray(tensor.float().numpy()
                                 if hasattr(tensor, "float") else tensor,
                                 dtype=np.float32)
                gates[f"{gm.group('side')}/layers_{gm.group('n')}/ffn/gate"] = arr.T
        if gates:
            with open(os.path.join(args.output_dir, "gates.npz"), "wb") as f:
                np.savez(f, **gates)
            print(f"wrote gates.npz ({len(gates)} routers)")

    with open(os.path.join(args.output_dir, "experts_meta.json"), "w") as f:
        json.dump({"experts_per_layer": args.experts_per_layer,
                   "expert_interval": args.expert_interval,
                   "encoder_layers": args.encoder_layers}, f)
    print(f"converted {count} experts -> {args.output_dir}")


if __name__ == "__main__":
    sys.exit(main() or 0)
