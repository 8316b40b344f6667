"""Serve unconverted HuggingFace models (pasero/cli/serve_hf.py:1-522).

The reference runs a second Flask server for raw ``AutoModelForCausalLM``
models so any HF model can be tried with one command.  Here the same
capability is an adapter: :class:`HFGenerator` wraps an HF causal LM behind
the exact interface :class:`~pasero_tpu.serving.server.ServeHandler` drives
(``decode``/``stream``/``task.task_info``), so HF models share the routes,
playground and SSE framing of native models — ``pasero-serve hf:gpt2`` or
``pasero-serve-hf gpt2``.

Torch runs the model (CPU or GPU; these are host-side serving paths, not the
TPU compute path).  Streaming yields word groups by re-decode diffing, like
the reference's TokenStreamer (serve_hf.py:68-130); generation stops as soon
as the client disconnects because the HTTP handler stops pulling the
generator.
"""

from __future__ import annotations

import logging
import threading
from typing import Iterator, Optional

logger = logging.getLogger("serve_hf")


class _TaskShim:
    """Just enough Task surface for ServeHandler/model_info."""

    def __init__(self, info: dict):
        self.task_info = info


class _CfgShim:
    def __init__(self, task: str):
        self.task = task


class HFGenerator:
    """TextGenerator-compatible wrapper around a HF ``AutoModelForCausalLM``."""

    def __init__(self, model, tokenizer, name: str, device: str = "cpu",
                 max_output_len: int = 256):
        self.model = model.eval()
        self.tokenizer = tokenizer
        self.device = device
        self.max_output_len = max_output_len
        self.lock = threading.Lock()
        chat = getattr(tokenizer, "chat_template", None) is not None
        self.task = _TaskShim({
            "model_type": "decoder",
            "task": "dialogue" if chat else "language_modeling",
            "chat_template": bool(chat),
            "hf_model": name,
        })
        self.cfg = _CfgShim("dialogue" if chat else "language_modeling")

    # -- construction --------------------------------------------------------
    @classmethod
    def build(cls, name_or_path: str, device: str = "cpu",
              dtype: Optional[str] = None, **kwargs) -> "HFGenerator":
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer
        torch_dtype = getattr(torch, dtype) if dtype else None
        tokenizer = AutoTokenizer.from_pretrained(name_or_path)
        model = AutoModelForCausalLM.from_pretrained(
            name_or_path, torch_dtype=torch_dtype)
        model.to(device)
        logger.info(f"loaded HF model {name_or_path} on {device}")
        return cls(model, tokenizer, name=name_or_path, device=device,
                   **kwargs)

    # -- shared helpers --------------------------------------------------------
    def _encode(self, input) -> "object":
        import torch
        if isinstance(input, (list, tuple)):  # chat turns, alternating roles
            if getattr(self.tokenizer, "chat_template", None):
                messages = [{"role": "user" if i % 2 == 0 else "assistant",
                             "content": turn}
                            for i, turn in enumerate(input)]
                ids = self.tokenizer.apply_chat_template(
                    messages, add_generation_prompt=True, return_tensors="pt")
                return ids.to(self.device)
            input = "\n".join(input)
        ids = self.tokenizer(input, return_tensors="pt").input_ids
        return ids.to(self.device)

    def _gen_kwargs(self, opts: dict) -> dict:
        kwargs = {
            "max_new_tokens": opts.get("max_output_len", self.max_output_len),
            "pad_token_id": (self.tokenizer.pad_token_id
                             if self.tokenizer.pad_token_id is not None
                             else self.tokenizer.eos_token_id),
        }
        if opts.get("sampling"):
            kwargs["do_sample"] = True
            if opts.get("sampling_temperature"):
                kwargs["temperature"] = opts["sampling_temperature"]
            if opts.get("sampling_topk"):
                kwargs["top_k"] = opts["sampling_topk"]
            if opts.get("sampling_topp"):
                kwargs["top_p"] = opts["sampling_topp"]
        elif opts.get("beam_size", 1) > 1:
            kwargs["num_beams"] = opts["beam_size"]
        if opts.get("repeat_penalty"):
            kwargs["repetition_penalty"] = opts["repeat_penalty"]
        return kwargs

    # -- TextGenerator surface -------------------------------------------------
    def decode(self, inputs, return_scores: bool = False, nbest: int = 1,
               meta: Optional[dict] = None, **opts):
        import torch
        hyps = []
        kwargs = self._gen_kwargs(opts)
        with self.lock, torch.no_grad():
            for input in inputs:
                ids = self._encode(input)
                out = self.model.generate(
                    ids, num_return_sequences=nbest,
                    output_scores=True, return_dict_in_generate=True,
                    **{**kwargs,
                       **({"num_beams": max(kwargs.get("num_beams", 1), nbest)}
                          if not kwargs.get("do_sample") else {})})
                seq_scores = getattr(out, "sequences_scores", None)
                sample_hyps = []
                for j in range(out.sequences.shape[0]):
                    new_tokens = out.sequences[j, ids.shape[1]:]
                    detok = self.tokenizer.decode(new_tokens,
                                                  skip_special_tokens=True)
                    score = (float(seq_scores[j]) if seq_scores is not None
                             else 0.0)
                    sample_hyps.append({"detok": detok, "score": score})
                hyps.append(sample_hyps)
        if return_scores:
            return hyps
        return [h[0]["detok"] for h in hyps]

    def stream(self, input, meta: Optional[dict] = None,
               **opts) -> Iterator[tuple]:
        """Yield (word_group, token_ids) as they are generated; stops when the
        caller stops iterating (client disconnect, serve_hf.py:98-130)."""
        import torch
        kwargs = self._gen_kwargs(opts)
        max_new = kwargs["max_new_tokens"]
        eos = self.tokenizer.eos_token_id
        with self.lock, torch.no_grad():
            ids = self._encode(input)
            past = None
            generated: list = []
            emitted = ""
            cur = ids
            for _ in range(max_new):
                out = self.model(cur, past_key_values=past, use_cache=True)
                past = out.past_key_values
                logits = out.logits[:, -1, :]
                if kwargs.get("repetition_penalty") and generated:
                    idx = torch.tensor(generated)
                    row = logits[0, idx]
                    logits[0, idx] = torch.where(
                        row > 0, row / kwargs["repetition_penalty"],
                        row * kwargs["repetition_penalty"])
                if kwargs.get("do_sample"):
                    if kwargs.get("temperature"):
                        logits = logits / kwargs["temperature"]
                    if kwargs.get("top_k"):
                        kth = torch.topk(logits, kwargs["top_k"]).values[..., -1:]
                        logits = logits.masked_fill(logits < kth,
                                                    float("-inf"))
                    probs = torch.softmax(logits, dim=-1)
                    if kwargs.get("top_p"):
                        sorted_p, sort_idx = probs.sort(descending=True)
                        cum = sorted_p.cumsum(-1)
                        keep = cum - sorted_p < kwargs["top_p"]
                        sorted_p = sorted_p * keep
                        probs = torch.zeros_like(probs).scatter(
                            -1, sort_idx, sorted_p)
                        probs = probs / probs.sum(-1, keepdim=True)
                    token = int(torch.multinomial(probs, 1))
                else:
                    token = int(logits.argmax(-1))
                if eos is not None and token == eos:
                    break
                generated.append(token)
                # streaming detok by re-decode diffing (the reference's HF
                # wrapper trick, tokenizers/__init__.py:170-214): only emit
                # text once it can no longer change
                text = self.tokenizer.decode(generated,
                                             skip_special_tokens=True)
                stable = text[:text.rfind(" ") + 1] if " " in text else ""
                if len(stable) > len(emitted):
                    yield stable[len(emitted):], generated[:]
                    emitted = stable
                cur = torch.tensor([[token]], device=self.device)
            text = self.tokenizer.decode(generated, skip_special_tokens=True)
            if len(text) > len(emitted):
                yield text[len(emitted):], generated[:]


def main(argv=None):
    """pasero-serve-hf: serve raw HF models with the pasero HTTP surface."""
    import argparse

    from .server import serve

    parser = argparse.ArgumentParser()
    parser.add_argument("models", nargs="+",
                        help="HF model ids or paths, optionally 'PATH:name'")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--device", default="cpu")
    parser.add_argument("--dtype")
    parser.add_argument("--max-output-len", type=int, default=256)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s | %(name)s | %(message)s")
    models = {}
    for spec in args.models:
        path, _, name = spec.rpartition(":") if ":" in spec else ("", "", spec)
        path = path or spec
        name = name if ":" in spec else path.rstrip("/").split("/")[-1]
        models[name] = HFGenerator.build(path, device=args.device,
                                         dtype=args.dtype,
                                         max_output_len=args.max_output_len)
    serve(models, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
