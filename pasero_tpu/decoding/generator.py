"""TextGenerator: the inference API (pasero/decoding.py:29-903).

``TextGenerator.build(model_dir, **opts)`` loads a trained model (config.json +
npz checkpoint + inference.yaml defaults) and exposes:

- ``decode(*inputs, **opts)`` — batched n-best decoding with scores;
- ``stream(input, **opts)`` — token-by-token generation with on-the-fly
  detokenization (host loop over a jitted single step);
- ``decode_corpus(corpus, ...)`` — buffered corpus decoding with ``--continue``
  resume, verbose S/H/D/P output and metric computation.

TPU specifics: prompts are bucketed and left-aligned; decode programs are
compiled per (batch rows, prompt bucket, max_new) triple and cached; ensembles
average log-probs by stacking parameter trees (vmap) when shapes allow.
"""

from __future__ import annotations

import itertools
import json
import logging
import os
import sys
import time
from typing import Any, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import checkpoints
from ..config import (DecodingAPIConfig, get_model_cls, get_task_cls,
                      get_model_config_cls)
from ..data.batching import length_buckets, pad_to_bucket
from ..models.transformer import Transformer
from ..parallel import bootstrap
from ..utils.metrics import Metrics
from .search import beam_search, left_align, sample_decode

logger = logging.getLogger("decoding")


def load_model_config(model_dir: str, arch: Optional[str] = None):
    path = os.path.join(model_dir, "config.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        arch = arch or data.pop("arch", "transformer")
        cfg = get_model_config_cls(arch)(strict=False, **data)
        return arch, cfg
    assert arch, f"no config.json in {model_dir}; pass --arch"
    return arch, get_model_config_cls(arch)()


class TextGenerator:
    """Build once, decode many times (pasero/decoding.py:29-128)."""

    def __init__(self, cfg: DecodingAPIConfig, start: bool = True):
        self.cfg = cfg
        self.metrics = Metrics(window=None)
        arch, model_cfg = load_model_config(cfg.model_dir, cfg.arch)
        self.arch = arch
        self.model_cfg = model_cfg
        model_cfg.setup_for_inference(cfg)

        task_cls = get_task_cls(cfg.task)
        self.task = task_cls(cfg.model_dir, cfg.task_cfg)
        self.task.setup_for_model(model_cfg)
        self.task.eval()

        self.model_cls, _ = get_model_cls(arch)
        self.params = None
        self._decode_models: dict = {}
        self._encode_fn = None
        self.rng = jax.random.PRNGKey(cfg.seed or 42)

        # mesh-sharded inference (reference: exactly one of DP/TP/PP,
        # decoding.py:103-108; here one GSPMD mesh composes dp x tp x ep —
        # TP shards params + KV cache so models bigger than one chip decode,
        # DP shards batch rows so corpus decoding scales over chips).
        # --devices N (the reference's inference PP flag) maps onto TP.
        tp = cfg.tp_size or 1
        ep = getattr(cfg, "ep_size", 1) or 1
        dp = cfg.dp_size or 1
        if tp == 1 and cfg.devices and str(cfg.devices[0]).isdigit():
            tp = max(tp, len(cfg.devices))
        self.mesh = None
        self.multiprocess = bootstrap.is_multiprocess()
        if self.multiprocess:
            # multi-host decode (reference: one process per GPU under DP or
            # TP, cli/decode.py:47-164): every process must join one global
            # mesh over ALL devices of the slice — dp defaults to whatever
            # the explicit tp/ep axes leave over
            n_avail = len(jax.devices())
            assert n_avail % (tp * ep) == 0, (
                f"tp={tp} x ep={ep} does not divide the {n_avail} global "
                "devices")
            dp = max(dp, n_avail // (tp * ep))
            assert dp * tp * ep == n_avail, (
                f"multi-host decode needs the full slice: dp={dp} x tp={tp} "
                f"x ep={ep} != {n_avail} devices")
        if dp * tp * ep > 1:
            from ..parallel import make_mesh
            n_avail = len(jax.devices())
            assert dp * tp * ep <= n_avail, (
                f"decode mesh dp={dp} x tp={tp} x ep={ep} needs more devices "
                f"than available ({n_avail})")
            self.mesh = make_mesh(dp, tp, ep, 1,
                                  devices=jax.devices()[:dp * tp * ep])
        self._compiled: dict = {}
        self.param_shardings = None
        if getattr(cfg, "benchmark", False):
            from ..utils.benchmark import benchmark
            benchmark.enable()
        if start:
            self.start_model()

    @classmethod
    def build(cls, model: str, **kwargs) -> "TextGenerator":
        cfg = DecodingAPIConfig(model=model, strict=True, **kwargs)
        return cls(cfg)

    # -- model loading -------------------------------------------------------
    @property
    def src_vocab_size(self) -> int:
        return (self.task.encoder_num_embeddings
                or self.task.decoder_num_embeddings)

    def _make_model(self, self_cache_len: int = 0,
                    cross_cache_len: int = 0) -> Transformer:
        return self.model_cls(
            self.model_cfg, src_vocab_size=self.src_vocab_size,
            tgt_vocab_size=self.task.decoder_num_embeddings,
            self_cache_len=self_cache_len, cross_cache_len=cross_cache_len)

    def start_model(self):
        if self.params is not None:
            return
        t0 = time.time()
        model = self._make_model()
        example = {"decoder_input": jnp.zeros((1, 4), jnp.int32)}
        if self.model_cfg.model_type != "decoder":
            if self.model_cfg.input_dim:
                example["src_tokens"] = jnp.zeros((1, 4, self.model_cfg.input_dim))
            else:
                example["src_tokens"] = jnp.zeros((1, 4), jnp.int32)
        abstract = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), **example))
        from flax import linen as nn
        init_params = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), nn.meta.unbox(abstract))["params"]
        self.params, missing, unexpected = checkpoints.load_params(
            self.cfg.ckpt, init_params, flexible=self.cfg.flexible,
            other_paths=tuple(self.cfg.other_ckpt or ()))
        if self.mesh is not None:
            # place parameters with their GSPMD shardings (heads/mlp over
            # 'model', experts over 'expert'): the same logical rules the
            # trainer uses, so a 13B/70B checkpoint spreads over the mesh
            # instead of OOMing one chip; activations and the KV cache follow
            # by propagation
            from ..parallel.sharding import param_shardings
            self.param_shardings = param_shardings(
                abstract["params"], self.mesh)
            # multi-process safe: every host holds the full checkpoint and
            # hands each local device its slice
            self.params = bootstrap.global_params_from_host(
                self.params, self.param_shardings)
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        if self.cfg.ensemble_ckpt:
            logger.info(f"ensemble of {1 + len(self.cfg.ensemble_ckpt)} models: "
                        "log-probabilities are averaged at every decode step")
            place = ((lambda t: bootstrap.global_params_from_host(
                          t, self.param_shardings))
                     if self.mesh is not None
                     else (lambda t: jax.tree_util.tree_map(jnp.asarray, t)))
            self.ensemble_params = [
                place(checkpoints.load_params(p, init_params,
                                              flexible=self.cfg.flexible)[0])
                for p in self.cfg.ensemble_ckpt]
        else:
            self.ensemble_params = []
        if getattr(self.cfg, "quantize", None) == "int8":
            # weight-only int8 (ops/quantize.py): the LAST load step, after
            # LoRA merging / placement, so every decode program receives
            # QTensor kernels through the ordinary params plumbing
            if self.mesh is not None:
                raise ValueError(
                    "--quantize int8 supports single-device decode (the "
                    "Pallas int8 matmul is not partitioned over a mesh); "
                    "drop --tp-size/--dp-size or the quantize flag")
            from ..ops.quantize import quantize_params, quantized_bytes
            self.params, n_q = quantize_params(self.params)
            self.ensemble_params = [quantize_params(p)[0]
                                    for p in self.ensemble_params]
            qb, fb = quantized_bytes(self.params)
            logger.info(
                f"quantized {n_q} weights to int8: {qb / 2**20:.0f} MiB int8 "
                f"+ {fb / 2**20:.0f} MiB float in HBM")
        logger.info(f"loaded model in {time.time() - t0:.1f}s "
                    f"({len(missing)} missing, {len(unexpected)} unexpected)")

    # -- preprocessing -------------------------------------------------------
    @property
    def _rows_multiple(self) -> int:
        """Row counts must divide the 'data' mesh axis for DP decode; padded
        dummy rows (all-False mask) keep every shard in lockstep — the SPMD
        equivalent of the reference's per-rank dummy batches
        (tasks/task.py:612-645)."""
        dp = self.mesh.shape["data"] if self.mesh is not None else 1
        return int(np.lcm(4, dp))

    def _prepare_batch(self, samples: list, max_new: int):
        """Collate preprocessed samples into a left-aligned prompt batch."""
        pad = self.task.padding_idx
        rows_multiple = self._rows_multiple
        dec = [s["decoder_input"] for s in samples]
        max_len = max(len(d) for d in dec)
        buckets = length_buckets(
            max(max_len, 8), min_len=8)
        prompt, prompt_mask = pad_to_bucket(dec, buckets, pad,
                                            rows_multiple=rows_multiple)
        prompt, prompt_mask = left_align(prompt, prompt_mask, pad)
        batch = {"prompt": prompt, "prompt_mask": prompt_mask}
        if self.model_cfg.model_type != "decoder":
            enc = [s["encoder_input"] for s in samples]
            is_features = enc[0].ndim > 1
            src_buckets = length_buckets(max(max(len(e) for e in enc), 8),
                                         min_len=8)
            src, src_mask = pad_to_bucket(enc, src_buckets,
                                          0.0 if is_features else pad,
                                          rows_multiple=rows_multiple)
            batch["src_tokens"] = src
            batch["src_mask"] = src_mask
        return batch

    def _place(self, array, batch_axis: bool = True):
        """Device placement: rows over the 'data' mesh axis when a decode
        mesh is active, plain transfer otherwise.  Multi-process: every host
        builds the same global batch (replicated input mode) and each device
        pulls exactly its rows."""
        if array is None:
            return None
        if self.mesh is None:
            return jnp.asarray(array)
        from jax.sharding import PartitionSpec as P
        spec = P("data") if batch_axis else P()
        return bootstrap.global_array_from_full(np.asarray(array), self.mesh,
                                                spec)

    def _fetch(self, out: dict) -> dict:
        """Decode outputs -> host numpy.  Multi-process: the outputs are
        globally sharded over 'data'; all-gather them so every process holds
        every row (the reference's gather_list, decoding.py:599-601)."""
        if self.multiprocess and self.mesh is not None:
            out = bootstrap.replicate_to_host(out, self.mesh)
        return {k: np.asarray(v) for k, v in out.items()}

    def _jit(self, key, build):
        """Per-(shape, options) compiled decode programs, cached for the
        generator's lifetime: all compute sits inside one jit so it works on
        multi-process meshes and never re-traces per buffer."""
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._compiled[key] = jax.jit(build())
        return fn

    # -- decoding ------------------------------------------------------------
    def _decode_batch(self, batch: dict, opts: dict) -> dict:
        beam_size = opts["beam_size"]
        max_new = opts["max_new"]
        B, P = batch["prompt"].shape
        cross_len = batch["src_tokens"].shape[1] if "src_tokens" in batch else 0
        use_spec = (self.cfg.speculative and beam_size == 1
                    and not opts.get("sampling", self.cfg.sampling)
                    and not self.ensemble_params
                    and not self.task.preprocessor.blacklist
                    and not any(len(s) for s in
                                self.task.preprocessor.bin_stop_sequences))
        spec_k = self.cfg.speculative_draft_len if use_spec else 0
        model = self._make_model(
            self_cache_len=P + max_new + (spec_k + 1 if use_spec else 0),
            cross_cache_len=cross_len)
        model_cls = type(model)
        shape_key = (B, P, cross_len, max_new, spec_k)
        encoder_out = encoder_mask = None
        if "src_tokens" in batch:
            # --encoder-decoder-swapping: only the needed half of the model is
            # resident on device during each phase (decoding.py:231-237,
            # 583-595; on TPU this means feeding apply() the sub-tree only)
            if self.cfg.encoder_decoder_swapping and not self.multiprocess:
                enc_params = {k: v for k, v in self.params.items()
                              if k in ("encoder", "shared_embed")}
                enc_params = jax.device_put(enc_params)
                encoder_out, encoder_mask = model.apply(
                    {"params": enc_params}, self._place(batch["src_tokens"]),
                    src_mask=self._place(batch["src_mask"]),
                    method=model_cls.encode)
                del enc_params
            else:
                encode = self._jit(
                    ("encode", shape_key),
                    lambda: lambda p, src, mask: model.apply(
                        {"params": p}, src, src_mask=mask,
                        method=model_cls.encode))
                encoder_out, encoder_mask = encode(
                    self.params, self._place(batch["src_tokens"]),
                    self._place(batch["src_mask"]))
        if self.cfg.encoder_decoder_swapping and not self.multiprocess:
            decode_half = {k: v for k, v in self.params.items()
                           if k != "encoder"}
            decode_params = jax.device_put(decode_half)
        elif self.ensemble_params:
            decode_params = [self.params] + self.ensemble_params
        else:
            decode_params = self.params
        common = dict(max_new=max_new, eos_idx=self.task.eos_idx,
                      pad_idx=self.task.padding_idx,
                      blacklist=tuple(self.task.preprocessor.blacklist))
        prompt = self._place(batch["prompt"])
        prompt_mask = self._place(batch["prompt_mask"])
        cfg = self.cfg
        use_sampling = opts.get("sampling", cfg.sampling)
        beam = beam_size
        if use_spec:
            from .search import speculative_greedy_decode
            lookup = lookup_mask = None
            if "src_tokens" in batch and batch["src_tokens"].ndim == 2:
                lookup = self._place(batch["src_tokens"])
                lookup_mask = self._place(batch["src_mask"])
            run = self._jit(
                ("spec", shape_key, lookup is not None,
                 encoder_out is not None),
                lambda: lambda dp, pr, pm, lk, lkm, eo, em:
                    speculative_greedy_decode(
                        model, dp, pr, pm, lookup=lk, lookup_mask=lkm,
                        draft_len=spec_k, encoder_out=eo, encoder_mask=em,
                        **common))
            out = self._fetch(run(decode_params, prompt, prompt_mask,
                                  lookup, lookup_mask, encoder_out,
                                  encoder_mask))
            tokens = out["tokens"][:, None]
            pos_scores = out["scores"][:, None]
            lengths = out["lengths"][:, None]
            scores = pos_scores.sum(-1) / (lengths + 1.0) ** cfg.len_penalty
        elif use_sampling or beam == 1:
            self.rng, rng = jax.random.split(self.rng)
            stop_seqs = tuple(tuple(int(i) for i in s)
                              for s in self.task.preprocessor.bin_stop_sequences
                              if len(s))
            samp = (not use_sampling,
                    opts.get("sampling_temperature", cfg.sampling_temperature),
                    opts.get("sampling_topk", cfg.sampling_topk),
                    opts.get("sampling_topp", cfg.sampling_topp),
                    opts.get("repeat_penalty", cfg.repeat_penalty), stop_seqs)
            run = self._jit(
                ("sample", shape_key, samp, common["blacklist"],
                 len(self.ensemble_params), encoder_out is not None),
                lambda: lambda dp, pr, pm, eo, em, rng: sample_decode(
                    model, dp, pr, pm, greedy=samp[0], temperature=samp[1],
                    top_k=samp[2], top_p=samp[3], repeat_penalty=samp[4],
                    stop_sequences=samp[5], rng=rng, encoder_out=eo,
                    encoder_mask=em, **common))
            out = self._fetch(run(decode_params, prompt, prompt_mask,
                                  encoder_out, encoder_mask,
                                  self._place(np.asarray(rng),
                                              batch_axis=False)))
            tokens = out["tokens"][:, None]                    # (B, 1, T)
            pos_scores = out["scores"][:, None]
            lengths = out["lengths"][:, None]
            scores = pos_scores.sum(-1) / (lengths + 1.0) ** cfg.len_penalty
        else:
            len_penalty = opts.get("len_penalty", cfg.len_penalty)
            run = self._jit(
                ("beam", shape_key, beam, len_penalty, common["blacklist"],
                 len(self.ensemble_params), encoder_out is not None),
                lambda: lambda dp, pr, pm, eo, em: beam_search(
                    model, dp, pr, pm, beam_size=beam,
                    len_penalty=len_penalty, encoder_out=eo,
                    encoder_mask=em, **common))
            out = self._fetch(run(decode_params, prompt, prompt_mask,
                                  encoder_out, encoder_mask))
            tokens = out["tokens"]
            pos_scores = out["positional_scores"]
            lengths = out["lengths"]
            scores = out["scores"]
        return {"tokens": tokens, "positional_scores": pos_scores,
                "lengths": lengths, "scores": scores}

    def _prepare_for_meta(self, meta: dict) -> None:
        """Task hook before decoding a batch with this metadata — NLLB expert
        pruning hot-swaps the selected experts into the (already compiled)
        parameter tree on language-pair change (reference
        prepare_model_for_inference, tasks/nllb_translation.py:113-139).
        Same shapes, so no recompilation of the decode programs."""
        if not hasattr(self.task, "load_experts") or self.params is None:
            return
        if not (getattr(self.task, "expert_index", None)
                or getattr(self.task, "expert_ckpt", None)):
            return
        src = meta.get("source_lang")
        tgt = meta.get("target_lang")
        if src is None or tgt is None:
            return
        new_params = self.task.load_experts(self.params, src, tgt)
        if new_params is not self.params:
            if getattr(self, "param_shardings", None) is not None:
                import jax
                new_params = jax.device_put(new_params, self.param_shardings)
            self.params = new_params

    def _capture_layers(self, sample: dict, hyp: dict,
                        return_layers: bool, return_weights: bool) -> None:
        """Attach layer outputs / attention maps for a GENERATED hypothesis
        (the reference gathers them inside the beam loop with beam reordering,
        decoding.py:1569-1594).  Here the selected hypothesis is re-run
        teacher-forced in one full forward: the model is deterministic, so
        this reproduces exactly the activations the decode loop computed for
        the winning beam (same equivalence the decode==full-forward parity
        tests assert), at the cost of one extra forward."""
        model = self._make_model()
        prompt = [int(t) for t in sample["decoder_input"]]
        gen = hyp["tokens"]
        dec_in = np.asarray(prompt + gen[:-1], np.int32)[None]
        repl = lambda x: self._place(np.asarray(x), batch_axis=False)
        kwargs = {"decoder_input": repl(dec_in)}
        if "encoder_input" in sample:
            kwargs["src_tokens"] = repl(np.asarray(sample["encoder_input"])[None])
        shapes = tuple(sorted((k, v.shape) for k, v in kwargs.items()))
        run = self._jit(
            ("capture", shapes, return_layers, return_weights),
            lambda: lambda p, **kw: model.apply(
                {"params": p}, return_layers=return_layers,
                return_weights=return_weights, **kw))
        out = run(self.params, **kwargs)
        if self.multiprocess:
            out = bootstrap.replicate_to_host(out, self.mesh)
        P = len(prompt)

        def trim(key, x):
            """Keep the rows that produced the generated tokens (P-1..):
            attention maps are (1, H, T, S) — queries on dim 2; layer
            outputs are (1, T, D) — time on dim 1."""
            if x is None:
                return None
            x = np.asarray(x)
            if key in ("self_attn", "cross_attn") and x.ndim == 4:
                return x[:, :, P - 1:]
            if key == "layers" and x.ndim == 3:
                return x[:, P - 1:]
            return x

        for key in ("layers", "self_attn", "cross_attn"):
            if key in out and out[key]:
                hyp[key] = [trim(key, x) for x in out[key]]

    def decode(self, *inputs, return_scores: bool = False, nbest: int = 1,
               meta: Optional[dict] = None, return_layers: bool = False,
               return_weights: bool = False, **opts) -> Any:
        """Decode raw text inputs; returns str (single input) or list[str],
        or hypothesis dicts with return_scores (decoding.py:468-620).
        return_layers/return_weights attach per-layer outputs and attention
        maps for the generated hypotheses (the README heatmap workflow)."""
        self.start_model()
        single = len(inputs) == 1 and isinstance(inputs[0], str)
        flat_inputs = list(inputs[0]) if (len(inputs) == 1 and
                                         isinstance(inputs[0], (list, tuple))) \
            else list(inputs)
        meta = self.task.make_meta(**(meta or {}))
        self.task.check_meta(meta)
        self._prepare_for_meta(meta)
        samples = [self.task.preprocess(
            self.task.input_to_sample(text, meta)) for text in flat_inputs]
        for i, s in enumerate(samples):
            s["index"] = i
            s["prompt_length"] = int(s["prompt_mask"].sum())

        merged = {
            "max_new": opts.get("max_output_len", self.cfg.max_output_len),
            "beam_size": opts.get("beam_size") or self.cfg.beam_size or 1,
            "sampling": opts.get("sampling", self.cfg.sampling),
            "sampling_temperature": opts.get("sampling_temperature",
                                             self.cfg.sampling_temperature),
            "sampling_topk": opts.get("sampling_topk", self.cfg.sampling_topk),
            "sampling_topp": opts.get("sampling_topp", self.cfg.sampling_topp),
            "repeat_penalty": opts.get("repeat_penalty", self.cfg.repeat_penalty),
            "len_penalty": opts.get("len_penalty", self.cfg.len_penalty),
        }
        max_new = merged["max_new"]
        # sort by prompt length for tighter buckets, then restore order
        order = np.argsort([len(s["decoder_input"]) for s in samples])
        hypotheses: list = [None] * len(samples)
        wall = time.time()
        from ..utils.benchmark import benchmark
        for start in range(0, len(order), 16):
            chunk = [samples[i] for i in order[start:start + 16]]
            with benchmark("prepare_batch"):
                batch = self._prepare_batch(chunk, max_new)
            with benchmark("decode"):
                result = self._decode_batch(batch, merged)
            for row, sample in enumerate(chunk):
                hyps = []
                for k in range(min(nbest, result["tokens"].shape[1])):
                    ids = result["tokens"][row, k]
                    n = int(result["lengths"][row, min(
                        k, result["lengths"].shape[1] - 1)])
                    ids = [int(t) for t in ids[:n]]
                    detok = self.task.postprocess(
                        [t for t in ids if t != self.task.eos_idx])
                    hyps.append({
                        "detok": detok,
                        "tokens": ids,
                        "tokens_str": " ".join(self.task.debinarize(ids)),
                        "score": float(result["scores"][row, k]),
                        "positional_scores":
                            result["positional_scores"][row, k][:n].tolist(),
                    })
                if return_layers or return_weights:
                    for hyp in hyps:
                        self._capture_layers(sample, hyp, return_layers,
                                             return_weights)
                hypotheses[sample["index"]] = hyps
        elapsed = time.time() - wall
        total_tokens = sum(len(h[0]["tokens"]) for h in hypotheses if h)
        self.metrics.update("wps", total_tokens / max(elapsed, 1e-6))

        if return_scores or nbest > 1 or return_layers or return_weights:
            out = hypotheses
        else:
            out = [h[0]["detok"] for h in hypotheses]
        if single:
            return out[0]
        return out

    def score(self, inputs, targets, return_layers: bool = False,
              return_weights: bool = False, collect_gate_stats: bool = False,
              meta: Optional[dict] = None):
        """Teacher-forced scoring of (input, target) pairs
        (--teacher-forcing, pasero/config.py:601-606): returns hypothesis
        dicts with per-token scores, and optionally every layer output /
        attention map (return_layers/return_weights, decoding.py:468-620) and
        MoE gate statistics (--moe-stats, mixture_of_experts.py:674-738)."""
        self.start_model()
        meta = self.task.make_meta(**(meta or {}))
        samples = []
        for text, target in zip(inputs, targets):
            sample = self.task.input_to_sample(text, meta)
            sample["target"] = target
            samples.append(self.task.preprocess(sample, append_eos=True,
                                                truncate=True))
        model = self._make_model()
        results = []
        gate_stats = []
        repl = lambda x: self._place(np.asarray(x), batch_axis=False)
        for sample in samples:
            kwargs = {"decoder_input": repl(sample["decoder_input"][None])}
            if "encoder_input" in sample:
                kwargs["src_tokens"] = repl(sample["encoder_input"][None])
            targets_arr = repl(
                np.concatenate([sample["decoder_input"][1:],
                                [self.task.eos_idx]])[None])
            shapes = tuple(sorted((k, v.shape) for k, v in kwargs.items()))
            run = self._jit(
                ("score", shapes, return_layers, return_weights,
                 collect_gate_stats),
                lambda: lambda p, targets, **kw: model.apply(
                    {"params": p}, targets=targets, return_logits=True,
                    return_layers=return_layers, return_weights=return_weights,
                    mutable=["gate_stats"] if collect_gate_stats else [],
                    **kw))
            out, mutated = run(self.params, targets_arr, **kwargs)
            if self.multiprocess:
                out, mutated = bootstrap.replicate_to_host(
                    (out, mutated), self.mesh)
            logits = np.asarray(out["logits"][0], np.float32)
            logprobs = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
            ids = np.asarray(targets_arr[0])
            pos_scores = logprobs[np.arange(len(ids)), ids]
            result = {
                "detok": self.task.postprocess([int(t) for t in ids[:-1]]),
                "tokens": [int(t) for t in ids],
                "score": float(pos_scores.sum() / max(len(ids), 1)),
                "positional_scores": pos_scores.tolist(),
                "nll": float(-pos_scores.mean()),
            }
            for key in ("layers", "self_attn", "cross_attn"):
                if key in out:
                    result[key] = [np.asarray(x) if x is not None else None
                                   for x in out[key]]
            results.append(result)
            if collect_gate_stats and "gate_stats" in mutated:
                gate_stats.append(jax.tree_util.tree_map(
                    np.asarray, mutated["gate_stats"]))
        if collect_gate_stats:
            return results, gate_stats
        return results

    def dump_gate_stats(self, corpus_lines: list, output_path: str,
                        meta: Optional[dict] = None, max_lines: int = 100):
        """--moe-stats: per-expert load / mean gate / top-1 share over a
        corpus sample, written as JSON (mixture_of_experts.py:674-738).

        The reference collects statistics inside its decoding forwards; here
        the corpus is decoded first and the hypotheses are re-scored teacher-
        forced with gate-stat collection — routing is deterministic given the
        tokens (decode == full-forward parity), so the statistics describe
        exactly the routing the decoder used to generate its output."""
        lines = corpus_lines[:max_lines]
        hyps = self.decode(lines, meta=meta)
        if isinstance(hyps, str):
            hyps = [hyps]
        _, stats = self.score(lines, hyps,
                              collect_gate_stats=True, meta=meta)
        if not stats:
            return None
        # aggregate over samples: sum loads, average gates
        agg: dict = {}
        for sample_stats in stats:
            flat = jax.tree_util.tree_flatten_with_path(sample_stats)[0]
            for path, value in flat:
                key = jax.tree_util.keystr(path)
                agg.setdefault(key, []).append(np.asarray(value, np.float64))
        summary = {k: np.mean(v, axis=0).tolist() for k, v in agg.items()}
        import json as _json
        if bootstrap.is_master():
            with open(output_path, "w") as f:
                _json.dump(summary, f, indent=2)
            logger.info(f"wrote MoE gate statistics to {output_path}")
        return summary

    # -- streaming -----------------------------------------------------------
    def stream(self, input: str, meta: Optional[dict] = None,
               **opts) -> Iterator[str]:
        """Yield detokenized words as they are generated
        (decoding.py:333-466). Runs the same jitted per-step program in a host
        loop so tokens surface immediately."""
        assert not self.multiprocess, (
            "stream() is single-process only; multi-host serving routes "
            "requests through decode() via the process-0 broadcast loop")
        self.start_model()
        meta = self.task.make_meta(**(meta or {}))
        sample = self.task.preprocess(self.task.input_to_sample(input, meta))
        max_new = opts.get("max_output_len", self.cfg.max_output_len)
        cfg = self.cfg

        use_sampling_ = opts.get("sampling", cfg.sampling)
        spec_k = (cfg.speculative_draft_len
                  if getattr(cfg, "speculative", False) and not use_sampling_
                  else 0)
        extra = spec_k + 1 if spec_k else 0

        ids = sample["decoder_input"][None, :]
        prompt = jnp.asarray(ids, jnp.int32)
        prompt_mask = jnp.ones_like(prompt, bool)
        P = prompt.shape[1]
        cross_len = 0
        encoder_out = encoder_mask = None
        model = self._make_model(self_cache_len=P + max_new + extra,
                                 cross_cache_len=cross_len)
        if self.model_cfg.model_type != "decoder":
            enc = jnp.asarray(sample["encoder_input"][None, :])
            model = self._make_model(self_cache_len=P + max_new + extra,
                                     cross_cache_len=enc.shape[1])
            encoder_out, encoder_mask = model.apply(
                {"params": self.params}, enc, method=type(model).encode)

        positions = jnp.arange(P)[None, :]
        pad_valid = jnp.concatenate(
            [prompt_mask, jnp.ones((1, max_new + extra), bool)], axis=1)
        logits, mutated = model.apply(
            {"params": self.params}, prompt, encoder_out=encoder_out,
            encoder_mask=encoder_mask, positions=positions,
            tgt_mask=jnp.ones((1, P), bool), self_kv_mask=pad_valid,
            method=type(model).decode_step, mutable=["cache"])
        cache = mutated["cache"]

        dummy_encoder = (jnp.zeros((1, 1, encoder_out.shape[-1]),
                                   encoder_out.dtype)
                         if encoder_out is not None else None)

        @jax.jit
        def step(cache, token, pos):
            logits, mutated = model.apply(
                {"params": self.params, "cache": cache}, token,
                encoder_out=dummy_encoder, encoder_mask=encoder_mask,
                positions=pos, tgt_mask=jnp.ones((1, 1), bool),
                self_kv_mask=pad_valid,
                method=type(model).decode_step, mutable=["cache"])
            return mutated["cache"], logits[:, -1].astype(jnp.float32)

        use_sampling = opts.get("sampling", cfg.sampling)
        temperature = opts.get("sampling_temperature", cfg.sampling_temperature)
        top_k = opts.get("sampling_topk", cfg.sampling_topk)
        top_p = opts.get("sampling_topp", cfg.sampling_topp)

        def pick(logits_row):
            if not use_sampling:
                return int(np.argmax(logits_row))
            from .search import _apply_sampling_filters
            self.rng, rng = jax.random.split(self.rng)
            token, _ = _apply_sampling_filters(
                logits_row[None, :], jnp.zeros((1, 1), jnp.int32),
                (temperature, top_k, top_p, 1.0, False), rng)
            return int(token[0])

        logits_row = np.asarray(logits[0, -1], np.float32)
        generated: list[int] = []
        stop_seqs = [list(map(int, s))
                     for s in self.task.preprocessor.bin_stop_sequences if len(s)]
        eos = self.task.eos_idx

        def hit_stop():
            return any(generated[-len(seq):] == seq for seq in stop_seqs)

        def token_stream():
            nonlocal cache, logits_row
            for step_i in range(max_new):
                token = pick(logits_row)
                if token == eos:
                    return
                generated.append(token)
                if hit_stop():
                    return
                yield self.task.debinarize([token])[0]
                pos = jnp.asarray([[P + step_i]], jnp.int32)
                cache, new_logits = step(cache, jnp.asarray([[token]], jnp.int32),
                                         pos)
                logits_row = np.asarray(new_logits[0])

        if spec_k:
            K = spec_k

            @jax.jit
            def chunk_step(cache, tokens, pos):
                logits, mutated = model.apply(
                    {"params": self.params, "cache": cache}, tokens,
                    encoder_out=dummy_encoder, encoder_mask=encoder_mask,
                    positions=pos, tgt_mask=jnp.ones((1, K + 1), bool),
                    self_kv_mask=pad_valid,
                    method=type(model).decode_step, mutable=["cache"])
                return mutated["cache"], logits[0].astype(jnp.float32)

            src = sample.get("encoder_input")
            src = np.asarray(ids[0] if src is None else src)
            # speech features (2-D) cannot seed token drafts
            lookup = [int(t) for t in src] if src.ndim == 1 else []

            def host_draft(last, prev):
                seq = lookup + generated
                arr = np.asarray(seq, np.int64)
                pos = np.flatnonzero(arr[:-1] == last)
                if len(pos) and prev is not None:
                    big = pos[(pos > 0) & (arr[np.maximum(pos - 1, 0)] == prev)]
                    if len(big):
                        pos = big
                if not len(pos):
                    return [last] * K
                j = int(pos[-1])
                draft = [int(t) for t in arr[j + 1:j + 1 + K]]
                return draft + [last] * (K - len(draft))

            def token_stream_spec():
                """Exact greedy stream advancing several tokens per model
                call via prompt-lookup speculation (KV-cache rewind on
                rejection, see search.speculative_greedy_decode)."""
                nonlocal cache
                from .search import _rewind_cache
                token = int(np.argmax(logits_row))
                while True:
                    if token == eos or len(generated) >= max_new:
                        return
                    generated.append(token)
                    if hit_stop():
                        return
                    yield self.task.debinarize([token])[0]
                    if len(generated) >= max_new:
                        return
                    prev = (generated[-2] if len(generated) >= 2
                            else (lookup[-1] if lookup else None))
                    draft = host_draft(token, prev)
                    chunk = jnp.asarray([[token] + draft], jnp.int32)
                    pos = jnp.asarray(
                        [P + len(generated) - 1 + np.arange(K + 1)], jnp.int32)
                    cache, chunk_logits = chunk_step(cache, chunk, pos)
                    greedy = np.asarray(jnp.argmax(chunk_logits, -1))
                    a = 0
                    while a < K and draft[a] == int(greedy[a]):
                        accepted = draft[a]
                        a += 1
                        if accepted == eos or len(generated) >= max_new:
                            break
                        generated.append(accepted)
                        if hit_stop():
                            cache = _rewind_cache(cache, P + len(generated))
                            return
                        yield self.task.debinarize([accepted])[0]
                        if len(generated) >= max_new:
                            cache = _rewind_cache(cache, P + len(generated))
                            return
                    if a > 0 and draft[a - 1] == eos:
                        return  # accepted greedy continuation was EOS
                    cache = _rewind_cache(cache, P + len(generated))
                    token = int(greedy[a])

            yield from self.task.preprocessor.detokenize_on_the_fly(
                token_stream_spec())
            return

        yield from self.task.preprocessor.detokenize_on_the_fly(token_stream())

    # -- corpus decoding -----------------------------------------------------
    def decode_corpus(self, corpus, buffer_size: int = 100,
                      max_lines: Optional[int] = None, verbose: bool = False,
                      quiet: bool = False, continue_: bool = False,
                      metrics: Optional[list] = None, **opts) -> dict:
        """Buffered decode of an inference corpus with optional resume and
        metric computation (decoding.py:622-903)."""
        self.start_model()
        meta = self.task.make_meta(
            **{k: v for k, v in corpus.meta.items()
               if k in ("source_lang", "target_lang", "domain", "lang",
                        "corpus_id")})
        # multi-host: every process decodes the same (replicated) batches;
        # only process 0 writes output (the reference's master-side writes,
        # decoding.py:822-873); the --continue line count comes from the
        # master's file so every process skips identically
        master = bootstrap.is_master()
        out_file = sys.stdout if master else open(os.devnull, "w")
        skip = 0
        if corpus.output_path:
            if continue_:
                if master and os.path.exists(corpus.output_path):
                    with open(corpus.output_path) as f:
                        skip = sum(1 for _ in f)
                skip = bootstrap.broadcast_obj(skip)
            if master:
                if continue_ and skip:
                    out_file = open(corpus.output_path, "a")
                else:
                    os.makedirs(os.path.dirname(corpus.output_path) or ".",
                                exist_ok=True)
                    out_file = open(corpus.output_path, "w")

        inputs = corpus.input_file
        refs_file = open(corpus.ref_path) if getattr(corpus, "ref_path", None) \
            and os.path.exists(corpus.ref_path or "") else None

        hypotheses, references = [], []
        start_time = time.time()
        total_tokens = 0
        line_iter = iter(inputs)
        n_read = 0
        runtime_opts: dict = {}
        while True:
            buffer = list(itertools.islice(line_iter, buffer_size))
            if self.multiprocess:
                # rank-0 input broadcast (stdin exists only on the master;
                # reference: utils.py:58-82 broadcast_object_list)
                buffer = bootstrap.broadcast_obj(buffer)
            if not buffer:
                break
            # interactive '!opt=value' commands update decoding options
            commands = [l for l in buffer
                        if isinstance(l, str) and l.startswith("!")]
            for command in commands:
                try:
                    key, value = command[1:].strip().split("=", 1)
                    from ..serving.server import DECODE_PARAMS
                    caster = DECODE_PARAMS.get(key, str)
                    runtime_opts[key] = (value.lower() in ("1", "true")
                                         if caster is bool else caster(value))
                    logger.info(f"set {key} = {runtime_opts[key]}")
                except ValueError:
                    logger.warning(f"could not parse command {command!r}")
            buffer = [l for l in buffer if not (isinstance(l, str)
                                                and l.startswith("!"))]
            if not buffer:
                continue
            opts = {**opts, **runtime_opts}
            ref_buffer = (list(itertools.islice(refs_file, len(buffer)))
                          if refs_file else [None] * len(buffer))
            if self.multiprocess:
                ref_buffer = bootstrap.broadcast_obj(ref_buffer)
            if skip > 0:
                take = min(skip, len(buffer))
                buffer, ref_buffer = buffer[take:], ref_buffer[take:]
                skip -= take
                if not buffer:
                    continue
            # skip pairs where either side is empty (multi-aligned corpora)
            keep = [(line, ref) for line, ref in zip(buffer, ref_buffer)
                    if (not isinstance(line, str) or line.strip())
                    and (ref is None or ref.strip())]
            if not keep:
                continue
            lines = [line.strip() if isinstance(line, str) else line
                     for line, _ in keep]
            refs = [ref.strip() if ref else None for _, ref in keep]
            outs = self.decode(lines, return_scores=True, meta=dict(
                source_lang=meta.get("source_lang"),
                target_lang=meta.get("target_lang"),
                domain=meta.get("domain")), **opts)
            for j, (line, hyp_list) in enumerate(zip(lines, outs)):
                hyp = hyp_list[0]
                total_tokens += len(hyp["tokens"])
                if verbose:
                    sample = {"index": n_read + j, "source": line}
                    if refs[j]:
                        sample["target"] = refs[j]
                    print(self.task.hypothesis_to_str(sample, hyp, verbose=True),
                          file=out_file)
                elif not quiet or out_file is not sys.stdout:
                    print(hyp["detok"], file=out_file)
                hypotheses.append(hyp["detok"])
                if refs[j] is not None:
                    references.append(refs[j])
            out_file.flush()
            n_read += len(lines)
            if max_lines and n_read >= max_lines:
                break

        elapsed = time.time() - start_time
        results = {"wps": total_tokens / max(elapsed, 1e-6),
                   "lines": len(hypotheses), "time": elapsed}
        for metric in metrics or []:
            if references and len(references) == len(hypotheses):
                value = self.task.compute_score(
                    metric, hypotheses, references,
                    lang=meta.get("target_lang"))
                if value is not None:
                    results[metric] = value
        if out_file is not sys.stdout:
            out_file.close()
        return results
