"""Trainer: jitted train/valid steps over the device mesh + checkpointing.

TPU-native re-design of pasero/training.py:94-939:

- one SPMD program instead of DDP/FSDP wrappers: parameters are placed with
  GSPMD shardings (parallel/sharding.py) and batches are sharded over the
  'data' mesh axis; XLA inserts the gradient all-reduce that DDP does by hand;
- gradient accumulation (--virtual-dp-size) is a host-side loop over
  micro-batches with on-device gradient accumulation; each length bucket gets
  its own compiled step (training.py:391-408 no_sync equivalent);
- gradients are normalized by the global token count before clipping
  (training.py:455-470), expressed by dividing the accumulated gradient sum by
  the accumulated token count;
- bf16 everywhere on the compute path, fp32 master params and Adam moments —
  the fp16 GradScaler/overflow machinery (training.py:480-496) has no TPU
  equivalent and is dropped (flag surface retained as no-ops).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import checkpoints
from ..optimization import (global_norm, lr_schedule_from_config,
                            make_optimizer, trainable_mask)
from ..parallel import bootstrap
from ..parallel.sharding import LOGICAL_RULES, fsdp_rules
from ..utils.metrics import Metrics

logger = logging.getLogger("train")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def shift_targets(decoder_input, pad_idx: int):
    """logits[t] predicts decoder_input[t+1]; last column becomes padding."""
    return jnp.concatenate(
        [decoder_input[:, 1:],
         jnp.full_like(decoder_input[:, :1], pad_idx)], axis=1)


class Trainer:
    def __init__(self, cfg, task, model, mesh: Mesh,
                 metrics: Optional[Metrics] = None,
                 adapter_info: Optional[dict] = None):
        self.cfg = cfg
        self.task = task
        self.model = model
        self.mesh = mesh
        from ..parallel.context import set_context_mesh
        set_context_mesh(mesh)  # ring attention rides this mesh's 'seq' axis
        self.adapter_info = adapter_info or {}
        self.metrics = metrics or Metrics(window=cfg.log_interval)
        self.rules = list(fsdp_rules() if cfg.fsdp else LOGICAL_RULES)
        self.pad_idx = model.cfg.padding_idx
        self.pp_size = getattr(cfg, "pp_size", 1) or 1
        if self.pp_size > 1:
            from ..parallel import pipeline as pp
            pp.check_pp_supported(model, cfg)
            if cfg.fsdp:
                raise ValueError("--pp-size does not compose with --fsdp "
                                 "(the stage axis already shards the layers)")
            if cfg.freeze_params_regex or cfg.train_params_regex:
                raise ValueError(
                    "--pp-size does not support freezing regexes")
            self.pp_microbatches = (getattr(cfg, "pp_microbatches", None)
                                    or 2 * self.pp_size)
        impl = getattr(cfg, "prng_impl", None)
        if impl:
            jax.config.update("jax_default_prng_impl", impl)
        # every process seeds identically: the dropout key entering the
        # global SPMD step must be the same on all hosts
        self.multiprocess = bootstrap.is_multiprocess()
        self.rng = jax.random.PRNGKey(cfg.seed or 0)
        self._checkpointer = checkpoints.AsyncCheckpointer()
        if getattr(cfg, "benchmark", False):
            from ..utils.benchmark import benchmark
            benchmark.enable()

        self._init_params()
        self._build_optimizer()
        self._load_checkpoint()
        self._jit_steps()
        self._accum_grads = None
        self._accum_stats = None

    # -- setup ---------------------------------------------------------------
    def _pp_enc_layers(self) -> int:
        return (self.model.cfg.encoder_layers
                if self.model.cfg.model_type != "decoder" else 0)

    def _example_batch(self):
        B, S, T = 8, 16, 16
        batch = {"decoder_input": np.full((B, T), self.pad_idx, np.int32),
                 "target_mask": np.zeros((B, T), bool),
                 "prompt_mask": np.zeros((B, T), bool)}
        if self.model.num_encoder_adapters:
            batch["encoder_adapter_ids"] = np.zeros((1,), np.int32)
        if self.model.num_decoder_adapters:
            batch["decoder_adapter_ids"] = np.zeros((1,), np.int32)
        if self.model.cfg.model_type != "decoder":
            if self.model.cfg.input_dim:  # speech features
                batch["src_tokens"] = np.zeros(
                    (B, S, self.model.cfg.input_dim), np.float32)
            else:
                batch["src_tokens"] = np.full((B, S), self.pad_idx, np.int32)
            batch["src_mask"] = np.zeros((B, S), bool)
        return batch

    def _model_kwargs(self, batch, deterministic=True):
        kwargs = dict(decoder_input=batch["decoder_input"],
                      deterministic=deterministic)
        if "src_tokens" in batch:
            kwargs["src_tokens"] = batch["src_tokens"]
            kwargs["src_mask"] = batch["src_mask"]
        if "encoder_adapter_ids" in batch:
            kwargs["encoder_adapter_ids"] = batch["encoder_adapter_ids"]
        if "decoder_adapter_ids" in batch:
            kwargs["decoder_adapter_ids"] = batch["decoder_adapter_ids"]
        return kwargs

    def _init_params(self):
        self.rng, init_rng = jax.random.split(self.rng)
        batch = self._example_batch()

        def init_fn(rng):
            return self.model.init({"params": rng, "dropout": rng},
                                   **self._model_kwargs(batch))

        abstract = jax.eval_shape(init_fn, init_rng)
        self.logical_specs = nn.get_partition_spec(abstract)["params"]

        def to_sharding(spec):
            if not isinstance(spec, P):
                return NamedSharding(self.mesh, P())
            resolved = nn.logical_to_mesh_axes(spec, rules=self.rules)
            return NamedSharding(self.mesh, P(*resolved))

        self.param_shardings = jax.tree_util.tree_map(
            to_sharding, self.logical_specs,
            is_leaf=lambda x: isinstance(x, P) or x is None)

        init_jit = jax.jit(
            lambda rng: nn.meta.unbox(init_fn(rng))["params"],
            out_shardings=self.param_shardings)
        with self.mesh:
            self.params = init_jit(init_rng)
        if self.pp_size > 1:
            # stack en/decoder layers over the 'stage' mesh axis (GPipe
            # layout); checkpoints stay in the named layers_i layout
            # (save/load convert)
            from ..parallel import pipeline as pp
            with self.mesh:
                packed = pp.pack_pp_params(
                    self.params, self.model.cfg.decoder_layers,
                    self._pp_enc_layers())
                self.param_shardings = pp.pp_param_shardings(packed, self.mesh)
                self.params = jax.device_put(packed, self.param_shardings)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        logger.info(f"initialized {n_params:,} parameters")

    def _default_trainable(self, name: str) -> bool:
        from ..config.models import AdapterTransformerConfig
        if self.model.cfg.lora_rank > 0:
            return "lora_" in name
        if (isinstance(self.model.cfg, AdapterTransformerConfig)
                and not self.model.cfg.train_all_params
                and (self.model.num_encoder_adapters
                     or self.model.num_decoder_adapters)):
            return "adapters_" in name
        return True

    def _build_optimizer(self):
        self.mask = trainable_mask(
            self.params, self.cfg.freeze_params_regex,
            self.cfg.train_params_regex,
            default_trainable=self._default_trainable)
        trainable = sum(
            x.size for x, m in zip(jax.tree_util.tree_leaves(self.params),
                                   jax.tree_util.tree_leaves(self.mask)) if m)
        logger.info(f"{trainable:,} trainable parameters")
        self.tx = make_optimizer(self.cfg, mask=self.mask)
        self.schedule = lr_schedule_from_config(self.cfg)
        with self.mesh:
            opt_state = jax.jit(self.tx.init)(self.params)
        step0 = (bootstrap.replicated_scalar(0, self.mesh, jnp.int32)
                 if self.multiprocess else jnp.zeros((), jnp.int32))
        self.state = TrainState(step=step0,
                                params=self.params, opt_state=opt_state)
        del self.params

    def _load_checkpoint(self):
        cfg = self.cfg
        self.loaded_step = 0
        path = checkpoints.find_checkpoint_to_load(
            cfg.model_dir, cfg.ckpt, reset=cfg.reset)
        if path is None:
            return
        logger.info(f"loading checkpoint {path}")
        if self.pp_size > 1:
            # checkpoints are stored in the named layers_i layout; convert
            # through it so any pp_size (or none) can resume any checkpoint
            from ..parallel import pipeline as pp
            target = pp.unpack_pp_params(jax.device_get(self.state.params))
            params, *_ = checkpoints.load_params(
                path, target, flexible=cfg.flexible,
                reset_params_regex=cfg.reset_params_regex)
            with self.mesh:
                params = jax.device_put(
                    pp.pack_pp_params(params, self.model.cfg.decoder_layers,
                                      self._pp_enc_layers()),
                    self.param_shardings)
        else:
            params, *_ = checkpoints.load_params(
                path, self.state.params, flexible=cfg.flexible,
                reset_params_regex=cfg.reset_params_regex)
        self.state = self.state.replace(params=params)
        is_latest = (os.path.basename(path) == "model_latest.npz")
        tag = "latest" if is_latest else None
        step = checkpoints.checkpoint_step(cfg.model_dir, path)
        in_model_dir = os.path.realpath(path).startswith(
            os.path.realpath(cfg.model_dir))
        resume = in_model_dir and not cfg.reset_optimizer and step
        if resume or (cfg.continue_ and step and not cfg.reset_optimizer):
            opt_flat = checkpoints.load_optimizer_flat(
                cfg.model_dir, tag or step)
            if opt_flat is not None:
                restored = checkpoints.restore_tree(self.state.opt_state, opt_flat)
                if restored is not None:
                    self.state = self.state.replace(opt_state=restored)
                else:
                    logger.warning("optimizer state mismatch; resetting optimizer")
            state_meta = checkpoints.load_state(cfg.model_dir, tag or step)
            if state_meta.get("metrics"):
                self.metrics.load_state_dict(state_meta["metrics"])
            step_arr = (bootstrap.replicated_scalar(step, self.mesh, jnp.int32)
                        if self.multiprocess else jnp.asarray(step, jnp.int32))
            self.state = self.state.replace(step=step_arr)
            self.loaded_step = step
            logger.info(f"resumed at step {step}")
        elif getattr(cfg, "only_validate", False) and step:
            # --only-validate resets the optimizer, but validation must
            # still report (and expected_scores must gate) at the
            # checkpoint's own step, not step 0
            step_arr = (bootstrap.replicated_scalar(step, self.mesh, jnp.int32)
                        if self.multiprocess else jnp.asarray(step, jnp.int32))
            self.state = self.state.replace(step=step_arr)
            self.loaded_step = step
        if is_latest:
            # a stale interrupt checkpoint must not shadow future model_last
            # saves; the reference deletes it after resuming (cli/train.py:438)
            checkpoints.discard_latest(cfg.model_dir)

    # -- jitted steps --------------------------------------------------------
    def _jit_steps(self):
        model = self.model
        pad_idx = self.pad_idx
        prompt_loss = self.model.cfg.prompt_loss
        label_smoothing = self.model.cfg.label_smoothing or 0.0
        batch_spec = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())
        pp_forward = None
        if self.pp_size > 1:
            from ..parallel import pipeline as pp_mod
            pp_forward = pp_mod.make_pp_forward(
                model, self.mesh, self.pp_size, self.pp_microbatches)

        fused_ce = (getattr(model, "supports_fused_ce", False)
                    and getattr(model.cfg, "fused_ce", True)
                    and self.pp_size == 1)
        if fused_ce and getattr(model.cfg, "ce_impl", "auto") == "auto" and \
                self.mesh is not None and self.mesh.size > 1:
            # the flash-CE pallas kernel is not GSPMD-partitioned; on a
            # sharded mesh resolve 'auto' to the scan-chunked implementation
            model.cfg.ce_impl = "chunked"

        def loss_fn(params, batch, dropout_rng):
            targets = shift_targets(batch["decoder_input"], pad_idx)
            target_mask = shift_targets(
                batch["target_mask"].astype(jnp.int32), 0).astype(bool)
            prompt_mask = shift_targets(
                batch["prompt_mask"].astype(jnp.int32), 0).astype(bool)
            weights = target_mask.astype(jnp.float32)
            if prompt_loss != 1.0:
                weights = weights * jnp.where(prompt_mask, prompt_loss, 1.0)
            num_tokens = jnp.sum(target_mask)
            from ..models.transformer import cross_entropy_loss
            if pp_forward is not None:
                logits = pp_forward(params, batch["decoder_input"],
                                    src_tokens=batch.get("src_tokens"),
                                    src_mask=batch.get("src_mask"),
                                    deterministic=False,
                                    dropout_rng=dropout_rng)
                mutated = {}
                loss_sum, nll_sum, _ = cross_entropy_loss(
                    logits, targets, weights, label_smoothing)
            elif fused_ce:
                # chunked vocab-head CE inside the model: the fp32 (B, T, V)
                # logits never hit HBM (chunked_cross_entropy)
                kwargs = self._model_kwargs(batch, deterministic=False)
                out, mutated = model.apply(
                    {"params": params}, targets=targets,
                    loss_weights=weights,
                    rngs={"dropout": dropout_rng}, mutable=["losses"],
                    **kwargs)
                loss_sum, nll_sum = out["loss_sum"], out["nll_sum"]
            else:
                kwargs = self._model_kwargs(batch, deterministic=False)
                out, mutated = model.apply(
                    {"params": params}, targets=None,
                    rngs={"dropout": dropout_rng}, mutable=["losses"],
                    **kwargs)
                loss_sum, nll_sum, _ = cross_entropy_loss(
                    out["logits"], targets, weights, label_smoothing)
            # auxiliary losses (MoE load balancing) are per-batch scalars; the
            # CE sum is normalized by token count later, so scale them up
            # (mixture_of_experts.py:560-589 does CE + lb * ntokens)
            aux = sum(jax.tree_util.tree_leaves(mutated.get("losses", {})))
            loss_sum = loss_sum + aux * num_tokens
            return loss_sum, (nll_sum, num_tokens)

        def grad_step(params, batch, dropout_rng):
            (loss_sum, (nll_sum, num_tokens)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, dropout_rng)
            return grads, {"loss_sum": loss_sum, "nll_sum": nll_sum,
                           "num_tokens": num_tokens.astype(jnp.float32)}

        def accumulate(acc_grads, acc_stats, grads, stats):
            new_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
            new_stats = jax.tree_util.tree_map(jnp.add, acc_stats, stats)
            return new_grads, new_stats

        def apply_step(state, grads, stats):
            denom = jnp.maximum(stats["num_tokens"], 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
            gnorm = global_norm(grads)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                               state.params)
            params = jax.tree_util.tree_map(
                lambda p, u: (p + u).astype(p.dtype), state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state)
            return new_state, gnorm

        def valid_step(params, batch):
            targets = shift_targets(batch["decoder_input"], pad_idx)
            target_mask = shift_targets(
                batch["target_mask"].astype(jnp.int32), 0).astype(bool)
            weights = target_mask.astype(jnp.float32)
            from ..models.transformer import cross_entropy_loss
            if pp_forward is not None:
                logits = pp_forward(params, batch["decoder_input"],
                                    src_tokens=batch.get("src_tokens"),
                                    src_mask=batch.get("src_mask"),
                                    deterministic=True)
                loss_sum, nll_sum, _ = cross_entropy_loss(
                    logits, targets, weights, label_smoothing)
            elif fused_ce:
                kwargs = self._model_kwargs(batch, deterministic=True)
                out = model.apply({"params": params}, targets=targets,
                                  loss_weights=weights, **kwargs)
                loss_sum, nll_sum = out["loss_sum"], out["nll_sum"]
            else:
                kwargs = self._model_kwargs(batch, deterministic=True)
                out = model.apply({"params": params}, targets=None, **kwargs)
                loss_sum, nll_sum, _ = cross_entropy_loss(
                    out["logits"], targets, weights, label_smoothing)
            return {"loss_sum": loss_sum, "nll_sum": nll_sum,
                    "num_tokens": jnp.sum(weights)}

        self._grad_step = jax.jit(
            grad_step, in_shardings=(self.param_shardings, batch_spec, repl),
            out_shardings=(self.param_shardings, repl))
        self._accumulate = jax.jit(accumulate, donate_argnums=(0, 1))
        # donate only the TrainState: its params/opt_state buffers alias the
        # new state's 1:1.  Donating grads too is dead weight — every
        # param-shaped output is already claimed by a state buffer, so XLA
        # warns "donated buffers were not usable" for each grad leaf.
        self._apply_step = jax.jit(apply_step, donate_argnums=(0,))
        self._valid_step = jax.jit(
            valid_step, in_shardings=(self.param_shardings, batch_spec),
            out_shardings=repl)

    # -- public API ----------------------------------------------------------
    @property
    def step(self) -> int:
        return int(self.state.step)

    @property
    def named_params(self):
        """Current parameters in the named (checkpoint) layout — with
        --pp-size the train state holds the stage-stacked layout instead.
        Multi-process: gathers to host numpy (a collective; every process
        must read this property together, e.g. during validation)."""
        params = self.state.params
        if self.multiprocess:
            params = bootstrap.replicate_to_host(params, self.mesh)
        if self.pp_size > 1:
            from ..parallel import pipeline as pp
            return pp.unpack_pp_params(jax.device_get(params))
        return params

    def _device_batch(self, batch: dict) -> dict:
        """Host batch -> mesh-sharded device arrays.

        Multi-process: batches either carry this process's rows only
        (``_local_rows``, the sharded per-host pipeline) and are stitched
        with make_array_from_process_local_data, or are identical global
        batches on every host (validation, replicated mode) from which
        each device pulls its slice.
        """
        if self.multiprocess:
            to_data = (bootstrap.global_array_from_local_rows
                       if batch.get("_local_rows")
                       else bootstrap.global_array_from_full)
            put_data = lambda v: to_data(v, self.mesh, P("data"))
            put_repl = lambda v: bootstrap.global_array_from_full(
                v, self.mesh, P())
        else:
            put_data = lambda v: jax.device_put(
                v, NamedSharding(self.mesh, P("data")))
            put_repl = lambda v: jax.device_put(
                v, NamedSharding(self.mesh, P()))
        if self.pp_size > 1:
            # rows must split into pp_microbatches x data shards; the extra
            # all-pad rows carry zero loss weight (target_mask False)
            mult = self.pp_microbatches * self.mesh.shape["data"]
            B = batch["decoder_input"].shape[0]
            if B % mult:
                extra = mult - B % mult
                batch = dict(batch)
                for k in ("decoder_input", "target_mask", "prompt_mask",
                          "src_tokens", "src_mask"):
                    if k not in batch:
                        continue
                    v = batch[k]
                    pad_block = np.full(
                        (extra,) + v.shape[1:],
                        self.pad_idx if k in ("decoder_input", "src_tokens")
                        else 0, np.asarray(v).dtype)
                    batch[k] = np.concatenate([np.asarray(v), pad_block], 0)
        out = {}
        for k in ("decoder_input", "target_mask", "prompt_mask",
                  "src_tokens", "src_mask"):
            if k in batch:
                out[k] = put_data(batch[k])
        # per-batch adapter activation from homogeneous-batch metadata
        # (pasero/models/adapters.py:185-229)
        meta = batch.get("meta", {})
        info = self.adapter_info
        from ..models.adapters import adapter_ids_from_meta
        if self.model.num_encoder_adapters:
            ids = adapter_ids_from_meta(info.get("encoder_names", []),
                                        info.get("encoder_by", []), meta)
            out["encoder_adapter_ids"] = put_repl(
                np.asarray(ids or [0], np.int32))
        if self.model.num_decoder_adapters:
            ids = adapter_ids_from_meta(info.get("decoder_names", []),
                                        info.get("decoder_by", []), meta)
            out["decoder_adapter_ids"] = put_repl(
                np.asarray(ids or [0], np.int32))
        return out

    def train_step(self, batch_iterator) -> dict:
        """One update: accumulate grads over update_freq micro-batches."""
        cfg = self.cfg
        world = self.mesh.devices.size
        update_freq = max(1, cfg.virtual_dp_size // max(1, world))
        timers = self.metrics

        grads = stats = None
        bsz = wpb = 0
        with timers.timer("train_wall"):
            for _ in range(update_freq):
                with timers.timer("data"):
                    batch = next(batch_iterator)
                    device_batch = self._device_batch(batch)
                self.rng, dropout_rng = jax.random.split(self.rng)
                with timers.timer("forward_backward"):
                    g, s = self._grad_step(self.state.params, device_batch,
                                           dropout_rng)
                if grads is None:
                    grads, stats = g, s
                else:
                    grads, stats = self._accumulate(grads, stats, g, s)
                bsz += batch.get("num_real_rows", len(batch["decoder_input"]))
                wpb += int(batch["target_mask"].sum())
            with timers.timer("optimizer"):
                self.state, gnorm = self._apply_step(self.state, grads, stats)

        stats = jax.device_get(stats)
        num_tokens = float(stats["num_tokens"])
        logs = {
            "loss": float(stats["loss_sum"]) / max(1.0, num_tokens),
            "nll_loss": float(stats["nll_sum"]) / max(1.0, num_tokens),
            "gnorm": float(gnorm),
            "lr": float(self.schedule(self.step)),
            "wpb": wpb, "bsz": bsz, "num_tokens": num_tokens,
        }
        m = self.metrics
        m.update("loss", logs["loss"] * num_tokens, n=int(num_tokens))
        m.update("nll_loss", logs["nll_loss"] * num_tokens, n=int(num_tokens))
        m.update("gnorm", logs["gnorm"])
        m.update("wps", wpb)
        m.update("bsz", bsz)
        m.update("updates", 1)
        return logs

    def valid_step(self, batch: dict) -> dict:
        device_batch = self._device_batch(batch)
        out = jax.device_get(self._valid_step(self.state.params, device_batch))
        return {k: float(v) for k, v in out.items()}

    # -- checkpointing -------------------------------------------------------
    def save(self, name: Optional[str] = None, update_last: bool = True,
             blocking: Optional[bool] = None):
        """Checkpoint; with --async-save only the npz disk write runs in a
        background thread (one save in flight; next save joins the last).

        The device->host snapshot happens synchronously on the caller thread:
        _apply_step donates the TrainState buffers, so a background thread
        reading ``self.state`` after the next train step would touch deleted
        device arrays. jax.device_get here completes before the loop resumes,
        and the slow part — the multi-GB compressed npz write — still
        overlaps with training.
        """
        cfg = self.cfg
        mask_flat = None
        if cfg.save_trainable_only:
            mask_flat = {k: bool(v) for k, v in checkpoints.flatten_params(
                self.mask).items()}
        if blocking is None:
            blocking = not getattr(cfg, "async_save", False)
        step, extra = self.step, {"metrics": self.metrics.state_dict()}
        # model_latest carries the optimizer too (optimizer_latest.npz), so a
        # requeued run resumes with full train state (utils.py:1505-1535)
        if self.multiprocess:
            # the all-gather to host is a collective every process joins;
            # only process 0 then writes (reference: rank-0 save + barrier)
            opt_host = bootstrap.replicate_to_host(self.state.opt_state,
                                                   self.mesh)
            params_host = bootstrap.replicate_to_host(self.state.params,
                                                      self.mesh)
        else:
            opt_host = jax.device_get(self.state.opt_state)
            params_host = jax.device_get(self.state.params)
        opt_flat = checkpoints.flatten_tree(opt_host)
        if self.pp_size > 1:  # on-disk format is the named layers_i layout
            from ..parallel import pipeline as pp
            params_host = pp.unpack_pp_params(params_host)

        path = os.path.join(cfg.model_dir, f"{name or f'model_{step}'}.npz")
        if self.multiprocess and not bootstrap.is_master():
            bootstrap.barrier("checkpoint")
            return path

        def write():
            return checkpoints.save_checkpoint(
                cfg.model_dir, step, params_host, opt_state_flat=opt_flat,
                extra=extra, name=name, trainable_mask=mask_flat,
                update_last=update_last)

        if blocking:
            self._checkpointer.wait()
            result = write()
            if self.multiprocess:
                bootstrap.barrier("checkpoint")
            return result
        self._checkpointer.submit(write)
        if self.multiprocess:
            bootstrap.barrier("checkpoint")
        return path

    def cleanup(self, best_step: Optional[int] = None):
        # don't join an in-flight async write (that would make --async-save
        # fully blocking); GC only matches model_{step}.npz files that already
        # exist, never the one being written. Surface any stored write error.
        self._checkpointer.check()
        if self.multiprocess and not bootstrap.is_master():
            return
        checkpoints.cleanup_checkpoints(
            self.cfg.model_dir, keep_last=self.cfg.keep_last,
            keep_interval=self.cfg.keep_interval, best_step=best_step)

    def finalize(self):
        """Join any in-flight async save (call once at end of training)."""
        self._checkpointer.wait()
