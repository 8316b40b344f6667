"""pasero-train: the training driver (re-design of pasero/cli/train.py).

Differences from the reference by design:
- no per-GPU process spawning / NCCL init: one SPMD program over a
  (data, expert, model) mesh (cli/train.py:679-746 -> parallel/mesh.py);
- signal-driven lifecycle kept: SIGINT/SIGTERM save model_latest and exit 143
  for SLURM requeue; SIGUSR1 saves, reloads the (possibly edited)
  training.yaml and restarts in-process (cli/train.py:36-58, 748-765);
- expected_scores regression checking (cli/train.py:604-660) and early
  stopping with patience (cli/train.py:406-447) preserved.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import signal
import sys
import time

import numpy as np
import yaml

logger = logging.getLogger("train")


class Restart(BaseException):
    """SIGUSR1 warm restart. BaseException so broad `except Exception`
    blocks in the data/step path cannot swallow it."""


class Interrupt(BaseException):
    """SIGINT/SIGTERM graceful shutdown (save model_latest, exit 143)."""


def setup_logging(model_dir: str, log_file: str):
    """Per-process log files on multi-host runs (the reference's
    train.log.{rank}, utils.py:175-216); only process 0 logs to stdout."""
    from pasero_tpu.parallel import bootstrap
    os.makedirs(model_dir, exist_ok=True)
    handlers = []
    console = logging.StreamHandler()
    if not bootstrap.is_master():
        console.setLevel(logging.WARNING)
        if log_file:
            log_file = f"{log_file}.{bootstrap.process_index()}"
    handlers.append(console)
    if log_file:
        handlers.append(logging.FileHandler(os.path.join(model_dir, log_file)))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(name)s | %(message)s",
        handlers=handlers, force=True)


def save_config_files(cfg, task):
    """training.yaml dump + inference.yaml + config.json + tokenizer files
    (cli/train.py:176-203, 670-675).  Multi-host: process 0 writes."""
    from pasero_tpu.parallel import bootstrap
    if not bootstrap.is_master():
        return
    os.makedirs(cfg.model_dir, exist_ok=True)
    with open(os.path.join(cfg.model_dir, "training.yaml"), "w") as f:
        yaml.safe_dump(cfg.as_dict(), f, default_flow_style=False,
                       sort_keys=True)
    # copy tokenizer + dict files into the model dir
    for pp in task.preprocessors.values():
        for path in pp.files:
            target = os.path.join(cfg.model_dir, os.path.basename(path))
            if os.path.realpath(path) != os.path.realpath(target):
                shutil.copy(path, target)
    # inference defaults
    inference = dict(cfg.inference_options)
    inference["task"] = cfg.task
    inference["arch"] = cfg.arch
    if hasattr(task, "inference_options"):
        inference.update(task.inference_options)
    with open(os.path.join(cfg.model_dir, "inference.yaml"), "w") as f:
        yaml.safe_dump(inference, f, default_flow_style=False, sort_keys=True)
    # full model config for checkpoint-free model reconstruction
    model_dict = cfg.model_cfg.as_dict()
    model_dict["arch"] = cfg.arch
    with open(os.path.join(cfg.model_dir, "config.json"), "w") as f:
        json.dump(model_dict, f, indent=2, default=str)


def check_scores(cfg, scores_at_step: dict, step: int):
    """expected_scores regression test: raise on regression
    (cli/train.py:604-660)."""
    from pasero_tpu.evaluation import LOWER_IS_BETTER
    for spec in cfg.expected_scores or []:
        if spec.get("steps") != step:
            continue
        corpus = spec.get("corpus")
        for metric, expected in (spec.get("metrics") or {}).items():
            actual = scores_at_step.get(corpus, {}).get(metric)
            if actual is None:
                continue
            eps = 0.01
            worse = (actual > expected + eps if metric in LOWER_IS_BETTER
                     else actual < expected - eps)
            if worse:
                raise RuntimeError(
                    f"score regression at step {step}: {corpus}/{metric} "
                    f"= {actual} (expected {expected})")
            logger.info(f"expected_scores OK: {corpus}/{metric} = {actual} "
                        f"(expected {expected})")


def evaluate(cfg, task, trainer, valid_sets, generator_factory):
    """Teacher-forced loss + beam decode + metrics per validation corpus
    (cli/train.py:458-541)."""
    from pasero_tpu.evaluation import safe_score
    all_scores = {}
    for name, valid_set in valid_sets.items():
        loss_sum = nll_sum = tokens = 0.0
        for batch in valid_set.batches():
            out = trainer.valid_step(batch)
            loss_sum += out["loss_sum"]
            nll_sum += out["nll_sum"]
            tokens += out["num_tokens"]
        scores = {
            "valid_loss": round(loss_sum / max(1, tokens), 3),
            "nll_loss": round(nll_sum / max(1, tokens), 3),
            "ppl": round(float(2 ** (nll_sum / max(1, tokens) / np.log(2))), 2),
        }
        if cfg.metrics:
            generator = generator_factory()
            sources = [s["raw"].get("source") or s["raw"].get("target")
                       for s in valid_set.samples]
            references = valid_set.references
            t0 = time.time()
            hypotheses = generator(sources, valid_set)
            elapsed = time.time() - t0
            for metric in cfg.metrics:
                value = safe_score(metric, hypotheses, references,
                                   lang=valid_set.corpus.meta.get("target_lang"),
                                   bleu_tok=cfg.bleu_tok, lowercase=cfg.eval_lc)
                if value is not None:
                    scores[metric] = value
            scores["eval_time"] = round(elapsed, 1)
        all_scores[name] = scores
        logger.info(f"valid | {name} | " +
                    " | ".join(f"{k} {v}" for k, v in scores.items()))
    return all_scores


def run_training(cfg):
    import jax
    from pasero_tpu.config import get_model_cls, get_task_cls
    from pasero_tpu.config.registry import DATASET_REGISTRY
    from pasero_tpu.datasets import ValidationDataset
    from pasero_tpu.evaluation import is_better
    from pasero_tpu.parallel import make_mesh
    from pasero_tpu.training import Trainer

    setup_logging(cfg.model_dir, cfg.log_file)
    logger.info(f"config: {json.dumps({k: str(v) for k, v in cfg.non_default().items()})}")

    task_cls = get_task_cls(cfg.task)
    train_corpora = task_cls.get_train_corpora(
        cfg.task_cfg, cfg.data_dir, cfg.train_corpora)
    valid_corpora = task_cls.get_valid_corpora(
        cfg.task_cfg, cfg.data_dir, cfg.valid_corpora)
    task = task_cls(cfg.data_dir, cfg.task_cfg)

    model_cls, model_cfg_cls = get_model_cls(cfg.arch)
    task.setup_for_model(cfg.model_cfg)
    task.register_corpora(*train_corpora)
    save_config_files(cfg, task)

    from pasero_tpu.models.adapters import adapter_names
    enc_names = adapter_names(cfg.model_cfg, task, False)
    dec_names = adapter_names(cfg.model_cfg, task, True)
    adapter_info = {
        "encoder_names": enc_names,
        "encoder_by": getattr(cfg.model_cfg, "encoder_adapters_by", []) or [],
        "decoder_names": dec_names,
        "decoder_by": getattr(cfg.model_cfg, "decoder_adapters_by", []) or [],
    }
    # adapters-by implies homogeneous batching on the same keys
    # (pasero/models/adapters.py:62-121 sets batch_by automatically)
    by_keys = list(dict.fromkeys(
        list(adapter_info["encoder_by"]) + list(adapter_info["decoder_by"])))
    if by_keys:
        cfg.dataset_cfg.batch_by = list(dict.fromkeys(
            (cfg.dataset_cfg.batch_by or []) + by_keys))

    if cfg.cp_size > 1:
        # context parallelism: self-attention must run the ring collective,
        # and padded sequence lengths must divide the 'seq' axis
        if cfg.model_cfg.attention_kernel != "ring":
            logger.info(f"cp_size={cfg.cp_size}: switching attention_kernel "
                        "to 'ring'")
            cfg.model_cfg.attention_kernel = "ring"
        task.length_multiple = 2 * cfg.cp_size  # zigzag needs 2 chunks per shard

    model = model_cls(cfg.model_cfg,
                      src_vocab_size=(task.encoder_num_embeddings
                                      or task.decoder_num_embeddings),
                      tgt_vocab_size=task.decoder_num_embeddings,
                      num_encoder_adapters=len(enc_names),
                      num_decoder_adapters=len(dec_names))
    mesh = make_mesh(cfg.dp_size, cfg.tp_size, cfg.ep_size, cfg.cp_size,
                     getattr(cfg, "pp_size", 1))
    trainer = Trainer(cfg, task, model, mesh, adapter_info=adapter_info)

    dataset_cls = DATASET_REGISTRY[cfg.dataset_type]
    task.train()
    train_set = dataset_cls(cfg.dataset_cfg, cfg, task, train_corpora,
                            rng=np.random.default_rng(cfg.seed))
    task.eval()
    valid_sets = {c.corpus_id: ValidationDataset(cfg, task, c)
                  for c in valid_corpora}

    def generator_factory():
        """Beam-decode validation sources with the current parameters.

        Runs on the TRAINING mesh: prompts are sharded over the 'data' axis
        and the whole encode+beam program sits inside one jit, so the decode
        works with globally-sharded (multi-host / FSDP / TP) parameters —
        the reference decodes validation on every rank and scores on the
        master (cli/train.py:458-541).  PP and CP train-state layouts have
        no decode program; they gather the named parameters to host and
        decode locally (identically on every process)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pasero_tpu.config import get_model_config_cls
        from pasero_tpu.data.batching import length_buckets, pad_to_bucket
        from pasero_tpu.decoding.search import beam_search, left_align
        from pasero_tpu.parallel import bootstrap

        mesh = trainer.mesh
        use_mesh = (getattr(trainer, "pp_size", 1) or 1) == 1 \
            and (cfg.cp_size or 1) == 1
        decode_model_cfg = cfg.model_cfg
        if not use_mesh:
            params = trainer.named_params  # collective: all processes join
            if cfg.model_cfg.attention_kernel == "ring":
                # ring attention needs the 'seq' mesh axis; the host-local
                # decode uses the plain kernel (same math)
                decode_model_cfg = get_model_config_cls(cfg.arch)(
                    strict=False, **cfg.model_cfg.as_dict())
                decode_model_cfg.attention_kernel = "auto"
        else:
            params = trainer.state.params
        rows_multiple = int(np.lcm(4, mesh.shape["data"])) if use_mesh else 4
        compiled: dict = {}

        def place(x, spec):
            if not use_mesh:
                return jnp.asarray(x)
            return bootstrap.global_array_from_full(
                np.asarray(x), mesh, spec)

        def generate(sources, valid_set):
            hypotheses = []
            samples = [task.preprocess(
                task.input_to_sample(src, valid_set.corpus.meta
                                     if hasattr(valid_set.corpus, "meta") else {}))
                for src in sources]
            for start in range(0, len(samples), 16):
                chunk = samples[start:start + 16]
                pad = task.padding_idx
                dec = [s["decoder_input"] for s in chunk]
                buckets = length_buckets(max(max(len(d) for d in dec), 8), 8)
                prompt, pmask = pad_to_bucket(dec, buckets, pad,
                                              rows_multiple=rows_multiple)
                prompt, pmask = left_align(prompt, pmask, pad)
                max_new = cfg.max_output_len
                src_arr = smask = None
                cross_len = 0
                if cfg.model_cfg.model_type != "decoder":
                    enc = [s["encoder_input"] for s in chunk]
                    sbuckets = length_buckets(max(max(len(e) for e in enc), 8), 8)
                    is_feat = enc[0].ndim > 1
                    src_arr, smask = pad_to_bucket(enc, sbuckets,
                                                   0.0 if is_feat else pad,
                                                   rows_multiple=rows_multiple)
                    cross_len = src_arr.shape[1]
                decode_model = model_cls(
                    decode_model_cfg,
                    src_vocab_size=(task.encoder_num_embeddings
                                    or task.decoder_num_embeddings),
                    tgt_vocab_size=task.decoder_num_embeddings,
                    self_cache_len=prompt.shape[1] + max_new,
                    cross_cache_len=cross_len)

                key = (prompt.shape, None if src_arr is None
                       else src_arr.shape, max_new)
                run = compiled.get(key)
                if run is None:
                    def decode_fn(p, pr, pm, s, sm,
                                  _model=decode_model):
                        eo = em = None
                        if s is not None:
                            eo, em = _model.apply(
                                {"params": p}, s, src_mask=sm,
                                method=type(_model).encode)
                        out = beam_search(
                            _model, p, pr, pm, beam_size=cfg.beam_size or 1,
                            max_new=max_new, eos_idx=task.eos_idx,
                            pad_idx=task.padding_idx, encoder_out=eo,
                            encoder_mask=em, len_penalty=cfg.len_penalty)
                        return {"tokens": out["tokens"][:, 0],
                                "lengths": out["lengths"][:, 0]}
                    run = compiled[key] = jax.jit(decode_fn)
                out = run(params, place(prompt, P("data")),
                          place(pmask, P("data")),
                          None if src_arr is None else place(src_arr,
                                                             P("data")),
                          None if smask is None else place(smask, P("data")))
                if use_mesh and trainer.multiprocess:
                    out = bootstrap.replicate_to_host(out, mesh)
                tokens = np.asarray(out["tokens"])
                lengths = np.asarray(out["lengths"])
                for row in range(len(chunk)):
                    ids = [int(t) for t in tokens[row][:lengths[row]]
                           if int(t) != task.eos_idx]
                    hypotheses.append(task.postprocess(ids))
            return hypotheses

        return generate

    # -- signals -------------------------------------------------------------
    # raise immediately AND set a flag: if the raise lands inside native code
    # or a try/except that discards it, the per-step flag check still fires
    pending = {"signal": None}

    def on_interrupt(signum, frame):
        pending["signal"] = Interrupt
        raise Interrupt()

    def on_usr1(signum, frame):
        pending["signal"] = Restart
        raise Restart()

    signal.signal(signal.SIGINT, on_interrupt)
    signal.signal(signal.SIGTERM, on_interrupt)
    try:
        signal.signal(signal.SIGUSR1, on_usr1)
    except (ValueError, AttributeError):
        pass

    best_score = None
    best_step = trainer.loaded_step or 0
    patience_left = cfg.patience
    batch_iterator = train_set.endless_iterator() if cfg.max_steps else None

    start_wall = time.time()
    try:
        # inside the try/finally: endless_iterator() above already started
        # the pipeline (and its tokenizer pool), so a validate-at-start
        # failure (bad corpus, firing expected_scores gate) must still
        # close the dataset or the pool deadlocks the atexit finalizer
        if cfg.validate_at_start or cfg.only_validate:
            scores = evaluate(cfg, task, trainer, valid_sets,
                              generator_factory)
            check_scores(cfg, scores, trainer.step)

        while trainer.step < cfg.max_steps:
            if pending["signal"] is not None:
                raise pending["signal"]()
            logs = trainer.train_step(batch_iterator)
            step = trainer.step

            if step % cfg.log_interval == 0:
                m = trainer.metrics
                wall = trainer.metrics.timer("train_wall").elapsed
                ups = m.sum("updates") / max(wall, 1e-6)
                wps = m.sum("wps") / max(wall, 1e-6)
                trainer.metrics.timer("train_wall").elapsed = 0
                nll = m.avg("nll_loss")
                logger.info(
                    f"step {step} | loss {m.avg('loss'):.3f} | "
                    f"nll_loss {nll:.3f} | ppl {2 ** (nll / np.log(2)):.2f} | "
                    f"wps {wps:.0f} | ups {ups:.2f} | wpb {m.avg('wps'):.0f} | "
                    f"bsz {m.avg('bsz'):.1f} | gnorm {m.avg('gnorm'):.3f} | "
                    f"lr {logs['lr']:.3e}")

            if cfg.save_interval and step % cfg.save_interval == 0:
                trainer.save()
                trainer.cleanup(best_step=best_step)

            if cfg.valid_interval and step % cfg.valid_interval == 0:
                scores = evaluate(cfg, task, trainer, valid_sets,
                                  generator_factory)
                check_scores(cfg, scores, step)
                metric = cfg.early_stopping_metric or "nll_loss"
                values = [s.get(metric) for name, s in scores.items()
                          if s.get(metric) is not None
                          and getattr(valid_sets[name].corpus, "early_stopping",
                                      True)]
                if values:
                    value = float(np.mean(values))
                    if best_score is None or is_better(metric, value, best_score):
                        best_score, best_step = value, step
                        from pasero_tpu.checkpoints import mark_best
                        from pasero_tpu.parallel import bootstrap
                        if bootstrap.is_master() and os.path.exists(
                                os.path.join(cfg.model_dir,
                                             f"model_{step}.npz")):
                            mark_best(cfg.model_dir, step)
                        patience_left = cfg.patience
                    elif (cfg.patience is not None
                          and step >= cfg.patience_min_steps):
                        patience_left = (patience_left or 0) - 1
                        if patience_left < 0:
                            logger.info("early stopping: out of patience")
                            break
    except Interrupt:
        pending["signal"] = None
        logger.info("interrupted: saving model_latest and exiting 143")
        trainer.save(name="model_latest", update_last=False, blocking=True)
        sys.exit(143)
    except Restart:
        pending["signal"] = None
        trainer.save(blocking=True)
        raise
    finally:
        # stop the data pipeline: an abandoned tokenizer pool whose feed
        # generator is still blocked deadlocks multiprocessing's atexit
        # pool join (the process would hang after 'done')
        if hasattr(train_set, "close"):
            train_set.close()

    if cfg.max_steps and trainer.step > trainer.loaded_step:
        trainer.save(blocking=True)
        trainer.cleanup(best_step=best_step)
    trainer.finalize()  # join any in-flight async save before exiting
    logger.info(f"done at step {trainer.step} "
                f"({time.time() - start_wall:.0f}s)")


def main():
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    # multi-host topology (TPU pod / SLURM / PASERO_* env) — must run before
    # any other jax use so jax.devices() spans the whole slice
    from pasero_tpu.parallel import bootstrap
    bootstrap.initialize()
    from pasero_tpu.config import TrainingConfig
    args = sys.argv[1:]
    while True:
        cfg = TrainingConfig(*args)
        try:
            run_training(cfg)
            return
        except Restart:
            logging.getLogger("train").info(
                "SIGUSR1: reloading training.yaml and restarting")
            training_yaml = os.path.join(cfg.model_dir, "training.yaml")
            if os.path.exists(training_yaml):
                args = ["--config", training_yaml]
            continue


if __name__ == "__main__":
    main()
