#!/usr/bin/env python3
"""Import Pasero/fairseq PyTorch checkpoints (.bin) into the pasero_tpu format.

Equivalent of the reference's checkpoint compatibility layer
(pasero/utils.py:846-913 fairseq renames + tasks/task.py:735-798): lets users
of the PyTorch reference bring their trained models over.

Mixture-of-Experts checkpoints are ingested in all three reference expert
formats (pasero/models/mixture_of_experts.py:313-402 conversions):
- 'basic'  : one fc1/fc2 per expert (``...moe_layer.experts.{e}.fc1.weight``);
- 'fused'  : stacked or concatenated expert weights (``...moe_layer.fc1.weight``);
- 'tutel'  : ``...tutel_moe_layer.experts.batched_fc{1,2}_w`` names, possibly
  split across ``model_X_{i:03}_of_{n:03}.bin`` shards each holding 1/n of the
  experts (the merge done by the reference's scripts/merge-tutel-ckpt.py:1-37
  happens here automatically — pass any one shard).
All become the stacked ``experts_in/experts_out`` layout of
pasero_tpu/models/moe.py, so ``scripts/split_expert_ckpt.py`` and the NLLB
expert-pruning task work on converted checkpoints too.

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


_TUTEL_RENAMES = [
    (".moe_layer.tutel_moe_layer.experts.batched_fc1_w", ".moe_layer.fc1.weight"),
    (".moe_layer.tutel_moe_layer.experts.batched_fc2_w", ".moe_layer.fc2.weight"),
    (".moe_layer.tutel_moe_layer.experts.batched_fc1_bias", ".moe_layer.fc1.bias"),
    (".moe_layer.tutel_moe_layer.experts.batched_fc2_bias", ".moe_layer.fc2.bias"),
    (".moe_layer.tutel_moe_layer.gates.0.wg.weight", ".moe_layer.gate.weight"),
]


def normalize_moe_format(sd: dict) -> None:
    """Rewrite `sd` (numpy arrays, torch names) in place so every MoE layer is
    in the stacked-fused format, whatever reference format it came in
    (mixture_of_experts.py:294-402 equivalents)."""
    # tutel -> fused names; tutel fc2 is (E, F, D), fused is (E, D, F)
    for name in list(sd):
        if name.endswith("._num_global_experts"):
            del sd[name]
            continue
        new = name
        for old_part, new_part in _TUTEL_RENAMES:
            new = new.replace(old_part, new_part)
        if new != name:
            v = sd.pop(name)
            if name.endswith("batched_fc2_w"):
                v = v.transpose(0, 2, 1)
            sd[new] = v
    # basic -> stacked: group experts.{e}.fcN.* by site, sort by id, stack
    basic = re.compile(r"(?P<prefix>.*\.moe_layer)\.experts\.(?P<e>\d+)"
                       r"\.(?P<suffix>(fc1|fc2)\.(weight|bias))$")
    groups = {}
    for name in list(sd):
        m = basic.fullmatch(name)
        if m:
            groups.setdefault((m.group("prefix"), m.group("suffix")), []) \
                  .append((int(m.group("e")), name))
    for (prefix, suffix), items in groups.items():
        items.sort()
        sd[f"{prefix}.{suffix}"] = np.stack([sd.pop(n) for _, n in items], 0)
    # concatenated-fused -> stacked, expert count taken from the gate
    fused = re.compile(r"(?P<prefix>.*\.moe_layer)\.(fc1|fc2)\.(weight|bias)$")
    for name in list(sd):
        m = fused.fullmatch(name)
        if not m:
            continue
        gate = sd.get(f"{m.group('prefix')}.gate.weight")
        if gate is None:
            gate = sd.get(f"{m.group('prefix')}.gate.wg.weight")
        v = sd[name]
        if name.endswith("weight") and v.ndim == 2:
            sd[name] = v.reshape(gate.shape[0], -1, v.shape[-1])
        elif name.endswith("bias") and v.ndim == 1:
            sd[name] = v.reshape(gate.shape[0], -1)


def map_moe_params(sd: dict, flat: dict) -> None:
    """Move stacked-fused MoE params from torch names in `sd` into our flat
    layout in `flat` (shapes per pasero_tpu/models/moe.py: experts_in (E,D,F),
    experts_out (E,F,D), gate (D,E))."""
    site = re.compile(r"(?P<side>encoder|decoder)\.layers\.(?P<n>\d+)"
                      r"\.moe_layer\.(?P<rest>.+)$")
    for name in list(sd):
        m = site.fullmatch(name)
        if not m:
            continue
        base = f"{m.group('side')}/layers_{m.group('n')}/ffn"
        rest = m.group("rest")
        v = sd.pop(name)
        if rest in ("gate.weight", "gate.wg.weight"):
            flat[f"{base}/gate"] = v.T
        elif rest == "fc1.weight":
            flat[f"{base}/experts_in"] = v.transpose(0, 2, 1)
        elif rest == "fc2.weight":
            flat[f"{base}/experts_out"] = v.transpose(0, 2, 1)
        elif rest == "fc1.bias":
            flat[f"{base}/experts_in_bias"] = v
        elif rest == "fc2.bias":
            flat[f"{base}/experts_out_bias"] = v
        else:
            sd[name] = v  # not an MoE param we know; leave for dense renames


def find_checkpoint_shards(path: str) -> list:
    """All sibling shards of a `*_{i:03}_of_{n:03}.bin` checkpoint.

    The reference names shards 1-based: ``model_1000_001_of_004.bin`` ..
    ``_004_of_004`` (pasero/utils.py:1613-1624 writes ``shard_id + 1`` and
    asserts the given path is shard 001); mirror both behaviors."""
    m = re.fullmatch(r"(.*)_(\d{3})_of_(\d{3})(\.\w+)",
                     os.path.basename(path))
    if not m:
        return [path]
    stem, first, total, ext = m.groups()
    assert int(first) == 1, (
        f"pass the first shard (_001_of_{total}), got _{first}_of_{total}")
    dirname = os.path.dirname(path)
    return [os.path.join(dirname, f"{stem}_{i:03}_of_{total}{ext}")
            for i in range(1, int(total) + 1)]


def merge_expert_shards(states: list) -> dict:
    """Merge Tutel-sharded states (each: all dense params + 1/n of the experts,
    full gates) by concatenating expert arrays along the expert axis.
    States must already be in stacked-fused format."""
    merged = dict(states[0])
    expert_re = re.compile(r".*\.moe_layer\.(fc1|fc2)\.(weight|bias)$")
    for name in states[0]:
        if expert_re.fullmatch(name):
            merged[name] = np.concatenate([s[name] for s in states], 0)
    return merged


def to_numpy_state_dict(sd: dict) -> dict:
    return {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v,
                          dtype=np.float32)
            for k, v in sd.items()}


def map_name(name: str):
    for pattern, target, transpose in RENAMES:
        m = re.match(pattern, name)
        if m:
            out = m.expand(target)
            wb = "scale" if name.endswith("weight") else "bias"
            return out.replace("{wb}", wb), transpose
    return None, False


def convert_state_dict(sd: dict, shared_embeddings: bool = True) -> dict:
    sd = to_numpy_state_dict(sd)
    normalize_moe_format(sd)
    flat = {}
    map_moe_params(sd, flat)
    unmapped = []
    for name, arr in sd.items():
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
    shard_paths = find_checkpoint_shards(args.checkpoint)
    shards = [torch.load(p, map_location="cpu", weights_only=False)
              for p in shard_paths]
    ckpt = shards[0]
    if len(shards) == 1:
        sd = ckpt.get("model", ckpt)
    else:
        print(f"merging {len(shards)} expert shards")
        states = [to_numpy_state_dict(s.get("model", s)) for s in shards]
        for state in states:
            normalize_moe_format(state)
        sd = merge_expert_shards(states)
    ckpt_args = ckpt.get("args") or {}
    if hasattr(ckpt_args, "__dict__"):
        ckpt_args = vars(ckpt_args)

    arch = args.arch or ckpt_args.get("arch") or "transformer"
    if any(".moe_layer." in name for name in sd) and "moe" not in arch:
        # same fallback as the reference's NLLB task
        # (tasks/nllb_translation.py:77-78): expert params need an MoE arch
        arch = "moe_transformer"
    from pasero_tpu.config import get_model_config_cls
    cfg = get_model_config_cls(arch)(strict=False, **{
        k: v for k, v in ckpt_args.items()
        if k in get_model_config_cls(arch)._fields})
    cfg.set_defaults(ckpt_args.get("task", "translation"))

    flat, unmapped = convert_state_dict(sd, cfg.shared_embeddings)
    if unmapped:
        print(f"warning: {len(unmapped)} unmapped tensors, e.g. {unmapped[:5]}")

    # derive per-layer expert counts for the config (the reference stores
    # moe_impl/expert counts in ckpt args; ours come from the arrays)
    expert_counts = {"encoder": {}, "decoder": {}}
    for key, arr in flat.items():
        m = re.fullmatch(r"(encoder|decoder)/layers_(\d+)/ffn/experts_in", key)
        if m:
            expert_counts[m.group(1)][int(m.group(2))] = int(arr.shape[0])
    for side, counts in expert_counts.items():
        if not counts:
            continue
        field = f"{side}_expert_count"
        if hasattr(cfg, field):
            uniq = set(counts.values())
            setattr(cfg, field,
                    counts if len(uniq) > 1 else next(iter(uniq)))
        layers_field = f"{side}_expert_layer_ids"
        if hasattr(cfg, layers_field):
            setattr(cfg, layers_field, sorted(counts))

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
