#!/usr/bin/env python3
"""Convert HuggingFace checkpoints into the pasero_tpu format
(equivalent of pasero/scripts/convert-hf-ckpt.py:11-385).

Supported families: Llama 1/2/3 (+TinyLlama/OpenLlama), Mistral, Mixtral,
BLOOM, Falcon, MPT, T5/FLAN-T5, Whisper, NLLB/M2M100 — each with an explicit
weight map onto the pasero_tpu parameter tree.

Outputs into MODEL_DIR: model_last.npz (flat '/'-keyed float32 arrays),
config.json (arch + hyper-parameters), inference.yaml, and — when the source
repo ships a tokenizer — dict.json built from the HF vocab.

Usage:
  python scripts/convert_hf_ckpt.py --model <hf-name-or-path> --arch llama_7b \
      -o models/llama7b [--dtype float32]
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(x):
    return np.asarray(x, dtype=np.float32).T


def a(x):
    return np.asarray(x, dtype=np.float32)


def convert_llama(sd: dict, cfg) -> dict:
    """Llama/Mistral family (HF uses the same rotate-half RoPE as our
    models/positional.py, so no weight permutation is needed — the reference
    only permutes OFFICIAL Meta checkpoints, convert-hf-ckpt.py:96-120)."""
    out = {}
    out["decoder/embed_tokens/embedding"] = a(sd["model.embed_tokens.weight"])
    for i in range(cfg.decoder_layers):
        p = f"model.layers.{i}"
        o = f"decoder/layers_{i}"
        out[f"{o}/self_attn/q_proj/kernel"] = t(sd[f"{p}.self_attn.q_proj.weight"])
        out[f"{o}/self_attn/k_proj/kernel"] = t(sd[f"{p}.self_attn.k_proj.weight"])
        out[f"{o}/self_attn/v_proj/kernel"] = t(sd[f"{p}.self_attn.v_proj.weight"])
        out[f"{o}/self_attn/out_proj/kernel"] = t(sd[f"{p}.self_attn.o_proj.weight"])
        out[f"{o}/ffn/gate/kernel"] = t(sd[f"{p}.mlp.gate_proj.weight"])
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.mlp.up_proj.weight"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.mlp.down_proj.weight"])
        out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.input_layernorm.weight"])
        out[f"{o}/ffn_norm/scale"] = a(sd[f"{p}.post_attention_layernorm.weight"])
    out["decoder/final_norm/scale"] = a(sd["model.norm.weight"])
    if "lm_head.weight" in sd:
        out["decoder/output_projection/kernel"] = t(sd["lm_head.weight"])
    return out


def convert_mixtral(sd: dict, cfg) -> dict:
    out = convert_llama_attention_only(sd, cfg)
    for i in range(cfg.decoder_layers):
        p = f"model.layers.{i}"
        o = f"decoder/layers_{i}"
        E = cfg.decoder_expert_count
        out[f"{o}/ffn/gate"] = t(sd[f"{p}.block_sparse_moe.gate.weight"])
        out[f"{o}/ffn/experts_gate"] = np.stack(
            [t(sd[f"{p}.block_sparse_moe.experts.{e}.w1.weight"])
             for e in range(E)])
        out[f"{o}/ffn/experts_out"] = np.stack(
            [t(sd[f"{p}.block_sparse_moe.experts.{e}.w2.weight"])
             for e in range(E)])
        out[f"{o}/ffn/experts_in"] = np.stack(
            [t(sd[f"{p}.block_sparse_moe.experts.{e}.w3.weight"])
             for e in range(E)])
        out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.input_layernorm.weight"])
        out[f"{o}/ffn_norm/scale"] = a(sd[f"{p}.post_attention_layernorm.weight"])
    return out


def convert_llama_attention_only(sd, cfg):
    out = {}
    out["decoder/embed_tokens/embedding"] = a(sd["model.embed_tokens.weight"])
    for i in range(cfg.decoder_layers):
        p = f"model.layers.{i}"
        o = f"decoder/layers_{i}"
        out[f"{o}/self_attn/q_proj/kernel"] = t(sd[f"{p}.self_attn.q_proj.weight"])
        out[f"{o}/self_attn/k_proj/kernel"] = t(sd[f"{p}.self_attn.k_proj.weight"])
        out[f"{o}/self_attn/v_proj/kernel"] = t(sd[f"{p}.self_attn.v_proj.weight"])
        out[f"{o}/self_attn/out_proj/kernel"] = t(sd[f"{p}.self_attn.o_proj.weight"])
    out["decoder/final_norm/scale"] = a(sd["model.norm.weight"])
    if "lm_head.weight" in sd:
        out["decoder/output_projection/kernel"] = t(sd["lm_head.weight"])
    return out


def convert_bloom(sd: dict, cfg) -> dict:
    H = cfg.decoder_attention_heads
    D = cfg.embed_dim
    hd = D // H
    out = {}
    pre = "transformer." if "transformer.word_embeddings.weight" in sd else ""
    out["decoder/embed_tokens/embedding"] = a(sd[f"{pre}word_embeddings.weight"])
    out["decoder/embed_norm/scale"] = a(sd[f"{pre}word_embeddings_layernorm.weight"])
    out["decoder/embed_norm/bias"] = a(sd[f"{pre}word_embeddings_layernorm.bias"])
    for i in range(cfg.decoder_layers):
        p = f"{pre}h.{i}"
        o = f"decoder/layers_{i}"
        qkv_w = a(sd[f"{p}.self_attention.query_key_value.weight"])
        qkv_b = a(sd[f"{p}.self_attention.query_key_value.bias"])
        # BLOOM packs qkv as (H, 3, hd, D): split per head
        qkv_w = qkv_w.reshape(H, 3, hd, D)
        qkv_b = qkv_b.reshape(H, 3, hd)
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            w = qkv_w[:, j].reshape(H * hd, D).T        # (D, H*hd)
            b = qkv_b[:, j].reshape(H * hd)
            out[f"{o}/self_attn/{name}/kernel"] = w
            out[f"{o}/self_attn/{name}/bias"] = b
        out[f"{o}/self_attn/out_proj/kernel"] = t(sd[f"{p}.self_attention.dense.weight"])
        out[f"{o}/self_attn/out_proj/bias"] = a(sd[f"{p}.self_attention.dense.bias"])
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.mlp.dense_h_to_4h.weight"])
        out[f"{o}/ffn/fc1/bias"] = a(sd[f"{p}.mlp.dense_h_to_4h.bias"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.mlp.dense_4h_to_h.weight"])
        out[f"{o}/ffn/fc2/bias"] = a(sd[f"{p}.mlp.dense_4h_to_h.bias"])
        out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.input_layernorm.weight"])
        out[f"{o}/self_attn_norm/bias"] = a(sd[f"{p}.input_layernorm.bias"])
        out[f"{o}/ffn_norm/scale"] = a(sd[f"{p}.post_attention_layernorm.weight"])
        out[f"{o}/ffn_norm/bias"] = a(sd[f"{p}.post_attention_layernorm.bias"])
    out["decoder/final_norm/scale"] = a(sd[f"{pre}ln_f.weight"])
    out["decoder/final_norm/bias"] = a(sd[f"{pre}ln_f.bias"])
    return out


def convert_falcon(sd: dict, cfg) -> dict:
    H = cfg.decoder_attention_heads
    Hkv = cfg.attention_heads_kv or H
    D = cfg.embed_dim
    hd = D // H
    out = {}
    pre = "transformer."
    out["decoder/embed_tokens/embedding"] = a(sd[f"{pre}word_embeddings.weight"])
    for i in range(cfg.decoder_layers):
        p = f"{pre}h.{i}"
        o = f"decoder/layers_{i}"
        qkv = a(sd[f"{p}.self_attention.query_key_value.weight"])
        # Falcon packs as (Hkv groups of [q*group, k, v]) x hd rows
        group = H // Hkv
        qkv = qkv.reshape(Hkv, group + 2, hd, D)
        q = qkv[:, :group].reshape(Hkv * group * hd, D)
        k = qkv[:, group].reshape(Hkv * hd, D)
        v = qkv[:, group + 1].reshape(Hkv * hd, D)
        out[f"{o}/self_attn/q_proj/kernel"] = q.T
        out[f"{o}/self_attn/k_proj/kernel"] = k.T
        out[f"{o}/self_attn/v_proj/kernel"] = v.T
        out[f"{o}/self_attn/out_proj/kernel"] = t(sd[f"{p}.self_attention.dense.weight"])
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.mlp.dense_h_to_4h.weight"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.mlp.dense_4h_to_h.weight"])
        if f"{p}.input_layernorm.weight" in sd:  # falcon-7b: shared norm
            out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.input_layernorm.weight"])
            out[f"{o}/self_attn_norm/bias"] = a(sd[f"{p}.input_layernorm.bias"])
        else:  # falcon-40b: separate attention/mlp norms
            out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.ln_attn.weight"])
            out[f"{o}/self_attn_norm/bias"] = a(sd[f"{p}.ln_attn.bias"])
            out[f"{o}/ffn_norm/scale"] = a(sd[f"{p}.ln_mlp.weight"])
            out[f"{o}/ffn_norm/bias"] = a(sd[f"{p}.ln_mlp.bias"])
    out["decoder/final_norm/scale"] = a(sd[f"{pre}ln_f.weight"])
    out["decoder/final_norm/bias"] = a(sd[f"{pre}ln_f.bias"])
    if "lm_head.weight" in sd:
        out["decoder/output_projection/kernel"] = t(sd["lm_head.weight"])
    return out


def convert_mpt(sd: dict, cfg) -> dict:
    D = cfg.embed_dim
    out = {}
    pre = "transformer."
    out["decoder/embed_tokens/embedding"] = a(sd[f"{pre}wte.weight"])
    for i in range(cfg.decoder_layers):
        p = f"{pre}blocks.{i}"
        o = f"decoder/layers_{i}"
        wqkv = a(sd[f"{p}.attn.Wqkv.weight"])
        q, k, v = np.split(wqkv, 3, axis=0)
        out[f"{o}/self_attn/q_proj/kernel"] = q.T
        out[f"{o}/self_attn/k_proj/kernel"] = k.T
        out[f"{o}/self_attn/v_proj/kernel"] = v.T
        out[f"{o}/self_attn/out_proj/kernel"] = t(sd[f"{p}.attn.out_proj.weight"])
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.ffn.up_proj.weight"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.ffn.down_proj.weight"])
        out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.norm_1.weight"])
        out[f"{o}/ffn_norm/scale"] = a(sd[f"{p}.norm_2.weight"])
    out["decoder/final_norm/scale"] = a(sd[f"{pre}norm_f.weight"])
    return out


def convert_whisper(sd: dict, cfg) -> dict:
    out = {}
    out["encoder/subsampler/conv0/kernel"] = np.transpose(
        a(sd["model.encoder.conv1.weight"]), (2, 1, 0))
    out["encoder/subsampler/conv0/bias"] = a(sd["model.encoder.conv1.bias"])
    out["encoder/subsampler/conv1/kernel"] = np.transpose(
        a(sd["model.encoder.conv2.weight"]), (2, 1, 0))
    out["encoder/subsampler/conv1/bias"] = a(sd["model.encoder.conv2.bias"])
    def pad_table(table, rows):
        """Our position tables are sized from encoder/decoder_max_len (mel
        frames for the encoder); HF stores post-conv position counts — pad
        with zeros (the extra rows are never indexed)."""
        table = a(table)
        if table.shape[0] < rows:
            table = np.concatenate(
                [table, np.zeros((rows - table.shape[0], table.shape[1]),
                                 table.dtype)])
        return table

    shift = cfg.positional_encoding_shift
    out["encoder/embed_positions/embedding"] = pad_table(
        sd["model.encoder.embed_positions.weight"], cfg.encoder_max_len + shift)
    out["decoder/embed_tokens/embedding"] = a(
        sd["model.decoder.embed_tokens.weight"])
    out["decoder/embed_positions/embedding"] = pad_table(
        sd["model.decoder.embed_positions.weight"], cfg.decoder_max_len + shift)

    def attn(dst, src, cross=False):
        out[f"{dst}/q_proj/kernel"] = t(sd[f"{src}.q_proj.weight"])
        out[f"{dst}/q_proj/bias"] = a(sd[f"{src}.q_proj.bias"])
        out[f"{dst}/k_proj/kernel"] = t(sd[f"{src}.k_proj.weight"])
        out[f"{dst}/v_proj/kernel"] = t(sd[f"{src}.v_proj.weight"])
        out[f"{dst}/v_proj/bias"] = a(sd[f"{src}.v_proj.bias"])
        out[f"{dst}/out_proj/kernel"] = t(sd[f"{src}.out_proj.weight"])
        out[f"{dst}/out_proj/bias"] = a(sd[f"{src}.out_proj.bias"])

    def norm(dst, src):
        out[f"{dst}/scale"] = a(sd[f"{src}.weight"])
        out[f"{dst}/bias"] = a(sd[f"{src}.bias"])

    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        o = f"encoder/layers_{i}"
        attn(f"{o}/self_attn", f"{p}.self_attn")
        norm(f"{o}/self_attn_norm", f"{p}.self_attn_layer_norm")
        norm(f"{o}/ffn_norm", f"{p}.final_layer_norm")
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.fc1.weight"])
        out[f"{o}/ffn/fc1/bias"] = a(sd[f"{p}.fc1.bias"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.fc2.weight"])
        out[f"{o}/ffn/fc2/bias"] = a(sd[f"{p}.fc2.bias"])
    norm("encoder/final_norm", "model.encoder.layer_norm")
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        o = f"decoder/layers_{i}"
        attn(f"{o}/self_attn", f"{p}.self_attn")
        attn(f"{o}/cross_attn", f"{p}.encoder_attn")
        norm(f"{o}/self_attn_norm", f"{p}.self_attn_layer_norm")
        norm(f"{o}/cross_attn_norm", f"{p}.encoder_attn_layer_norm")
        norm(f"{o}/ffn_norm", f"{p}.final_layer_norm")
        out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.fc1.weight"])
        out[f"{o}/ffn/fc1/bias"] = a(sd[f"{p}.fc1.bias"])
        out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.fc2.weight"])
        out[f"{o}/ffn/fc2/bias"] = a(sd[f"{p}.fc2.bias"])
    norm("decoder/final_norm", "model.decoder.layer_norm")
    return out


def convert_nllb(sd: dict, cfg) -> dict:
    """NLLB / M2M100 encoder-decoder (sinusoidal positions are not stored)."""
    out = {}
    out["shared_embed/embedding"] = a(sd["model.shared.weight"])

    def attn(dst, src):
        for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("out_proj", "out_proj")):
            out[f"{dst}/{ours}/kernel"] = t(sd[f"{src}.{theirs}.weight"])
            bias_key = f"{src}.{theirs}.bias"
            if bias_key in sd:
                out[f"{dst}/{ours}/bias"] = a(sd[bias_key])

    def norm(dst, src):
        out[f"{dst}/scale"] = a(sd[f"{src}.weight"])
        out[f"{dst}/bias"] = a(sd[f"{src}.bias"])

    for side, n_layers in (("encoder", cfg.encoder_layers),
                           ("decoder", cfg.decoder_layers)):
        for i in range(n_layers):
            p = f"model.{side}.layers.{i}"
            o = f"{side}/layers_{i}"
            attn(f"{o}/self_attn", f"{p}.self_attn")
            norm(f"{o}/self_attn_norm", f"{p}.self_attn_layer_norm")
            if side == "decoder":
                attn(f"{o}/cross_attn", f"{p}.encoder_attn")
                norm(f"{o}/cross_attn_norm", f"{p}.encoder_attn_layer_norm")
            norm(f"{o}/ffn_norm", f"{p}.final_layer_norm")
            out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{p}.fc1.weight"])
            out[f"{o}/ffn/fc1/bias"] = a(sd[f"{p}.fc1.bias"])
            out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{p}.fc2.weight"])
            out[f"{o}/ffn/fc2/bias"] = a(sd[f"{p}.fc2.bias"])
        norm(f"{side}/final_norm", f"model.{side}.layer_norm")
    return out


def convert_t5(sd: dict, cfg) -> dict:
    out = {}
    out["shared_embed/embedding"] = a(sd["shared.weight"])
    if "lm_head.weight" in sd:
        out["decoder/output_projection/kernel"] = t(sd["lm_head.weight"])

    def attn(dst, src):
        out[f"{dst}/q_proj/kernel"] = t(sd[f"{src}.q.weight"])
        out[f"{dst}/k_proj/kernel"] = t(sd[f"{src}.k.weight"])
        out[f"{dst}/v_proj/kernel"] = t(sd[f"{src}.v.weight"])
        out[f"{dst}/out_proj/kernel"] = t(sd[f"{src}.o.weight"])

    for side, n_layers, blocks in (("encoder", cfg.encoder_layers, "encoder"),
                                   ("decoder", cfg.decoder_layers, "decoder")):
        for i in range(n_layers):
            p = f"{blocks}.block.{i}.layer"
            o = f"{side}/layers_{i}"
            attn(f"{o}/self_attn", f"{p}.0.SelfAttention")
            out[f"{o}/self_attn_norm/scale"] = a(sd[f"{p}.0.layer_norm.weight"])
            if side == "decoder":
                attn(f"{o}/cross_attn", f"{p}.1.EncDecAttention")
                out[f"{o}/cross_attn_norm/scale"] = a(sd[f"{p}.1.layer_norm.weight"])
                ffn_idx = 2
            else:
                ffn_idx = 1
            ffn = f"{p}.{ffn_idx}"
            if f"{ffn}.DenseReluDense.wi_0.weight" in sd:  # gated (flan-t5)
                out[f"{o}/ffn/gate/kernel"] = t(sd[f"{ffn}.DenseReluDense.wi_0.weight"])
                out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{ffn}.DenseReluDense.wi_1.weight"])
            else:
                out[f"{o}/ffn/fc1/kernel"] = t(sd[f"{ffn}.DenseReluDense.wi.weight"])
            out[f"{o}/ffn/fc2/kernel"] = t(sd[f"{ffn}.DenseReluDense.wo.weight"])
            out[f"{o}/ffn_norm/scale"] = a(sd[f"{ffn}.layer_norm.weight"])
        out[f"{side}/final_norm/scale"] = a(sd[f"{blocks}.final_layer_norm.weight"])
        # tied relative position bias lives in layer 0
        rel = f"{blocks}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        out[f"{side}/t5_bias/rel_embedding"] = a(sd[rel])
    return out


CONVERTERS = {
    "llama": convert_llama, "mistral": convert_llama,
    "qwen": convert_llama, "yi": convert_llama,
    "mixtral": convert_mixtral,
    "bloom": convert_bloom, "falcon": convert_falcon, "mpt": convert_mpt,
    "whisper": convert_whisper, "t5": convert_t5,
    "nllb": convert_nllb, "m2m": convert_nllb, "mbart": convert_nllb,
}


def detect_family(arch: str) -> str:
    for family in CONVERTERS:
        if arch.startswith(family):
            return family
    raise ValueError(f"cannot infer model family from arch {arch!r}")


def load_hf_state_dict(path_or_name: str) -> dict:
    import torch
    from transformers import AutoModel, AutoModelForCausalLM, AutoModelForSeq2SeqLM

    last_err = None
    for cls in (AutoModelForCausalLM, AutoModelForSeq2SeqLM, AutoModel):
        try:
            model = cls.from_pretrained(path_or_name, torch_dtype=torch.float32,
                                        trust_remote_code=False)
            return {k: v.numpy() for k, v in model.state_dict().items()}
        except Exception as e:
            last_err = e
    raise last_err


def save_vocab(path_or_name: str, model_dir: str):
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(path_or_name)
        vocab = tok.get_vocab()
        with open(os.path.join(model_dir, "dict.json"), "w") as f:
            json.dump(vocab, f, ensure_ascii=False)
        return True
    except Exception as e:
        print(f"warning: could not export the tokenizer vocab: {e}")
        return False


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="HF model name or path")
    parser.add_argument("--arch", required=True,
                        help="pasero_tpu architecture name (e.g. llama_7b)")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("--task", default=None)
    parser.add_argument("--dtype", default=None,
                        choices=["float16", "bfloat16", "float32"],
                        help="cast converted weights to this dtype "
                             "(default: keep the source dtype)")
    parser.add_argument("--heads", type=int,
                        help="attention head count override (needed for raw "
                             "official Llama checkpoints without a config)")
    parser.add_argument("--kv-heads", type=int,
                        help="KV head count if different from --heads")
    args = parser.parse_args(argv)

    from pasero_tpu.config import get_model_config_cls
    cfg = get_model_config_cls(args.arch)()
    cfg.set_defaults(args.task or ("language_modeling"
                                   if cfg.model_type == "decoder"
                                   or cfg.__class__.__name__.startswith(
                                       ("Llama", "Bloom")) else "translation"))

    if args.heads:
        cfg.decoder_attention_heads = args.heads
        cfg.encoder_attention_heads = args.heads
    if args.kv_heads:
        cfg.attention_heads_kv = args.kv_heads

    sd = load_hf_state_dict(args.model)
    family = detect_family(args.arch)
    flat = CONVERTERS[family](sd, cfg)
    if args.dtype:
        import ml_dtypes
        target = {"float16": np.float16, "float32": np.float32,
                  "bfloat16": ml_dtypes.bfloat16}[args.dtype]
        flat = {k: (v.astype(target) if np.issubdtype(v.dtype, np.floating)
                    else v) for k, v in flat.items()}

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "model_last.npz"), "wb") as f:
        np.savez(f, **flat)
    model_dict = cfg.as_dict()
    model_dict["arch"] = args.arch
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(model_dict, f, indent=2, default=str)
    inference = {"task": args.task or "language_modeling",
                 "arch": args.arch, "tokenizer": "hf",
                 "tokenizer_path": args.model}
    import yaml
    with open(os.path.join(args.output_dir, "inference.yaml"), "w") as f:
        yaml.safe_dump(inference, f)
    save_vocab(args.model, args.output_dir)
    total = sum(v.size for v in flat.values())
    print(f"converted {len(flat)} tensors ({total:,} parameters) "
          f"-> {args.output_dir}")


if __name__ == "__main__":
    main()
