#!/usr/bin/env python3
"""Import Pasero/fairseq PyTorch checkpoints (.bin) into the pasero_tpu format.

Equivalent of the reference's checkpoint compatibility layer
(pasero/utils.py:846-913 fairseq renames + tasks/task.py:735-798): lets users
of the PyTorch reference bring their trained models over. Multi-shard TP or
Tutel checkpoints should first be merged with the reference's own
merge-tp-ckpt.py / merge-tutel-ckpt.py (our format has no shards to merge).

Usage:
  python scripts/convert_pasero_ckpt.py model_best.bin -o model_dir \
      [--arch transformer] [--copy-tokenizer DIR]
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torch module path -> our flat path ('{}' = layer id), weights transposed
RENAMES = [
    (r"^(encoder|decoder)\.embed_tokens\.weight$",
     r"\1/embed_tokens/embedding", False),
    (r"^(encoder|decoder)\.embed_positions\.weight$",
     r"\1/embed_positions/embedding", False),
    (r"^(encoder|decoder)\.layers\.(\d+)\.self_attn\.(q|k|v|out)_proj\.weight$",
     r"\1/layers_\2/self_attn/\3_proj/kernel", True),
    (r"^(encoder|decoder)\.layers\.(\d+)\.self_attn\.(q|k|v|out)_proj\.bias$",
     r"\1/layers_\2/self_attn/\3_proj/bias", False),
    (r"^decoder\.layers\.(\d+)\.encoder_attn\.(q|k|v|out)_proj\.weight$",
     r"decoder/layers_\1/cross_attn/\2_proj/kernel", True),
    (r"^decoder\.layers\.(\d+)\.encoder_attn\.(q|k|v|out)_proj\.bias$",
     r"decoder/layers_\1/cross_attn/\2_proj/bias", False),
    (r"^(encoder|decoder)\.layers\.(\d+)\.fc1\.weight$",
     r"\1/layers_\2/ffn/fc1/kernel", True),
    (r"^(encoder|decoder)\.layers\.(\d+)\.fc1\.bias$",
     r"\1/layers_\2/ffn/fc1/bias", False),
    (r"^(encoder|decoder)\.layers\.(\d+)\.fc2\.weight$",
     r"\1/layers_\2/ffn/fc2/kernel", True),
    (r"^(encoder|decoder)\.layers\.(\d+)\.fc2\.bias$",
     r"\1/layers_\2/ffn/fc2/bias", False),
    (r"^(encoder|decoder)\.layers\.(\d+)\.gate\.weight$",
     r"\1/layers_\2/ffn/gate/kernel", True),
    (r"^(encoder|decoder)\.layers\.(\d+)\.self_attn_layer_norm\.(weight|bias)$",
     r"\1/layers_\2/self_attn_norm/{wb}", False),
    (r"^decoder\.layers\.(\d+)\.encoder_attn_layer_norm\.(weight|bias)$",
     r"decoder/layers_\1/cross_attn_norm/{wb}", False),
    (r"^(encoder|decoder)\.layers\.(\d+)\.final_layer_norm\.(weight|bias)$",
     r"\1/layers_\2/ffn_norm/{wb}", False),
    (r"^(encoder|decoder)\.layer_norm\.(weight|bias)$",
     r"\1/final_norm/{wb}", False),
    (r"^(encoder|decoder)\.layernorm_embedding\.(weight|bias)$",
     r"\1/embed_norm/{wb}", False),
    (r"^decoder\.output_projection\.weight$",
     r"decoder/output_projection/kernel", True),
]


def map_name(name: str):
    for pattern, target, transpose in RENAMES:
        m = re.match(pattern, name)
        if m:
            out = m.expand(target)
            wb = "scale" if name.endswith("weight") else "bias"
            return out.replace("{wb}", wb), transpose
    return None, False


def convert_state_dict(sd: dict, shared_embeddings: bool = True) -> dict:
    flat = {}
    unmapped = []
    for name, tensor in sd.items():
        arr = np.asarray(tensor.float().numpy() if hasattr(tensor, "float")
                         else tensor, dtype=np.float32)
        target, transpose = map_name(name)
        if target is None:
            unmapped.append(name)
            continue
        flat[target] = arr.T if transpose else arr
    # in_proj (fused qkv) splitting like the reference (transformer.py:430-450)
    for name in list(unmapped):
        m = re.match(r"^(encoder|decoder)\.layers\.(\d+)\."
                     r"(self_attn|encoder_attn)\.in_proj_(weight|bias)$", name)
        if not m:
            continue
        side, layer, attn, kind = m.groups()
        attn_name = "cross_attn" if attn == "encoder_attn" else "self_attn"
        arr = np.asarray(sd[name], dtype=np.float32)
        q, k, v = np.split(arr, 3, axis=0)
        for proj, val in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
            key = f"{side}/layers_{layer}/{attn_name}/{proj}/" + \
                  ("kernel" if kind == "weight" else "bias")
            flat[key] = val.T if kind == "weight" else val
        unmapped.remove(name)
    if shared_embeddings and "encoder/embed_tokens/embedding" in flat and \
            "decoder/embed_tokens/embedding" in flat:
        enc = flat["encoder/embed_tokens/embedding"]
        dec = flat["decoder/embed_tokens/embedding"]
        if enc.shape == dec.shape and np.shares_memory(enc, dec) or \
                (enc.shape == dec.shape and np.array_equal(enc, dec)):
            flat["shared_embed/embedding"] = enc
            del flat["encoder/embed_tokens/embedding"]
            del flat["decoder/embed_tokens/embedding"]
    return flat, unmapped


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="Pasero/fairseq .bin checkpoint")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("--arch", default=None)
    parser.add_argument("--copy-tokenizer",
                        help="directory with bpecodes/dict.txt to copy over")
    args = parser.parse_args(argv)

    import torch
    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("model", ckpt)
    ckpt_args = ckpt.get("args") or {}
    if hasattr(ckpt_args, "__dict__"):
        ckpt_args = vars(ckpt_args)

    arch = args.arch or ckpt_args.get("arch") or "transformer"
    from pasero_tpu.config import get_model_config_cls
    cfg = get_model_config_cls(arch)(strict=False, **{
        k: v for k, v in ckpt_args.items()
        if k in get_model_config_cls(arch)._fields})
    cfg.set_defaults(ckpt_args.get("task", "translation"))

    flat, unmapped = convert_state_dict(sd, cfg.shared_embeddings)
    if unmapped:
        print(f"warning: {len(unmapped)} unmapped tensors, e.g. {unmapped[:5]}")

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "model_last.npz"), "wb") as f:
        np.savez(f, **flat)
    model_dict = cfg.as_dict()
    model_dict["arch"] = arch
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(model_dict, f, indent=2, default=str)
    if args.copy_tokenizer:
        import shutil
        for name in ("bpecodes", "dict.txt", "dict.json", "inference.yaml"):
            src = os.path.join(args.copy_tokenizer, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(args.output_dir, name))
    print(f"converted {len(flat)} tensors -> {args.output_dir}")


if __name__ == "__main__":
    main()
