"""pasero-decode: corpus evaluation / batch decoding CLI
(re-design of pasero/cli/decode.py).

Resolves inference corpora from --input/--reference/--eval-corpus with
language inference from file extensions, decodes each corpus with the
TextGenerator, logs per-corpus and averaged metrics (wps/bleu/chrf/...), and
supports interactive stdin decoding.
"""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("decode")


def main():
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    # multi-host topology (TPU pod / SLURM / PASERO_* env): all processes
    # join one global mesh and decode cooperatively — the reference spawns
    # one process per GPU under DP or TP (cli/decode.py:47-164)
    from pasero_tpu.parallel import bootstrap
    bootstrap.initialize()
    from pasero_tpu.config import DecodingCLIConfig, get_task_cls
    from pasero_tpu.decoding.generator import TextGenerator

    cfg = DecodingCLIConfig(strict=True)
    logging.basicConfig(level=(logging.INFO if bootstrap.is_master()
                               else logging.WARNING),
                        format="%(asctime)s | %(name)s | %(message)s")

    task_cls = get_task_cls(cfg.task)
    corpora = task_cls.get_inference_corpora(
        cfg.task_cfg, input_paths=cfg.input, output_paths=cfg.output,
        ref_paths=cfg.reference, corpus_prefix=cfg.eval_corpus)

    generator = TextGenerator(cfg)
    metrics = cfg.metrics or []
    totals: dict = {}
    for corpus in corpora:
        if cfg.teacher_forcing:
            # score the references instead of free decoding (EvalConfig)
            inputs = [l.strip() for l in corpus.input_file]
            refs = [l.strip() for l in open(corpus.ref_path)]                 if corpus.ref_path else [None] * len(inputs)
            if cfg.max_lines:
                inputs, refs = inputs[:cfg.max_lines], refs[:cfg.max_lines]
            scored = generator.score(inputs, refs)
            import numpy as np
            results = {"nll": round(float(np.mean([h["nll"] for h in scored])), 3),
                       "lines": len(scored)}
        else:
            results = generator.decode_corpus(
                corpus, buffer_size=cfg.buffer_size, max_lines=cfg.max_lines,
                verbose=cfg.verbose, quiet=cfg.quiet, continue_=cfg.continue_,
                metrics=metrics, beam_size=cfg.beam_size,
                max_output_len=cfg.max_output_len, sampling=cfg.sampling)
        if cfg.moe_stats:
            lines = [l.strip() for l in corpus.input_file][:100]
            stats_path = (corpus.output_path or corpus.corpus_id) + ".moe_stats.json"
            generator.dump_gate_stats(lines, stats_path)
        line = " | ".join(f"{k} {round(v, 2) if isinstance(v, float) else v}"
                          for k, v in results.items())
        logger.info(f"{corpus.corpus_id} | {line}")
        for k, v in results.items():
            if isinstance(v, (int, float)):
                totals.setdefault(k, []).append(v)
    if len(corpora) > 1:
        avg = {k: round(sum(v) / len(v), 2) for k, v in totals.items()}
        logger.info("average | " + " | ".join(f"{k} {v}" for k, v in avg.items()))


if __name__ == "__main__":
    main()
