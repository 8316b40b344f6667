"""Checkpoint IO: topology-independent single logical checkpoints.

Replaces the reference's per-rank shard files + reshard machinery
(pasero/utils.py:1472-1692, scripts/merge-tp-ckpt.py): with GSPMD the parameter
tree is a single logical object regardless of dp/tp/ep topology, so we save
one ``model_{step}.npz`` (flat '/'-joined keys -> float32 numpy arrays) plus
``optimizer_{step}.npz`` and ``state_{step}.json`` (step + metrics). Symlinks
``model_last``/``model_best``/``model_latest`` keep the reference's resume
semantics (utils.py:1495-1548): model_latest (interrupt save) > model_last >
--ckpt; ``--continue`` also restores optimizer/metrics; ``--reset-optimizer``
loads weights only.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Optional

import jax
import numpy as np
from flax import traverse_util

logger = logging.getLogger("checkpoints")


def flatten_params(params) -> dict:
    from flax import linen as nn
    params = nn.meta.unbox(params)  # strip Partitioned metadata if present
    flat = traverse_util.flatten_dict(params, sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def unflatten_params(flat: dict):
    return traverse_util.unflatten_dict(dict(flat), sep="/")


def flatten_tree(tree) -> dict:
    """Flatten an arbitrary pytree (e.g. an optax state) to {path: ndarray}."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def restore_tree(template, flat: dict):
    """Rebuild a pytree shaped like ``template`` from flatten_tree output.
    Returns None if the flat dict doesn't cover the template's leaves."""
    paths = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]]
    if set(paths) != set(flat):
        return None
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: np.asarray(flat[jax.tree_util.keystr(p)],
                                   dtype=np.asarray(leaf).dtype), template)


def _atomic_savez(path: str, flat: dict):
    """Write-then-rename so a crash mid-save never corrupts an existing
    checkpoint (the reference can leave a truncated model_latest behind,
    pasero/training.py:627-636 works around it at load time)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """One-in-flight background checkpoint writer.

    The device->host transfer and the (potentially multi-GB) npz write run in
    a worker thread so the training loop only blocks if a previous save is
    still in progress — the same contract as orbax's async checkpointing,
    kept in this repo's single-file format.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def check(self):
        """Surface a stored write error without joining an in-flight save."""
        if self._thread is not None and not self._thread.is_alive():
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def submit(self, fn, *args, **kwargs):
        import threading
        self.wait()

        def run():
            try:
                fn(*args, **kwargs)
            except BaseException as e:   # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()


def _symlink(target: str, link: str):
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    os.symlink(os.path.basename(target), link)


def save_checkpoint(model_dir: str, step: int, params, opt_state_flat=None,
                    extra: Optional[dict] = None, name: Optional[str] = None,
                    trainable_mask=None, update_last: bool = True) -> str:
    """Write model(+optimizer+state) files; returns the model path.

    ``trainable_mask``: optional flat {key: bool} limiting saved params
    (--save-trainable-only, pasero/training.py:169-174).

    ``model_latest`` (the interrupt/requeue checkpoint) carries the full train
    state like the reference's (pasero/utils.py:1505-1535): its optimizer and
    step/metrics go to ``optimizer_latest.npz`` / ``state_latest.json`` so a
    SLURM-requeued run resumes at the interrupted step with a live optimizer.
    """
    os.makedirs(model_dir, exist_ok=True)
    name = name or f"model_{step}"
    tag = "latest" if name == "model_latest" else str(step)
    flat = flatten_params(params)
    if trainable_mask:
        flat = {k: v for k, v in flat.items() if trainable_mask.get(k, True)}
    model_path = os.path.join(model_dir, f"{name}.npz")
    _atomic_savez(model_path, flat)
    if opt_state_flat is not None:
        _atomic_savez(os.path.join(model_dir, f"optimizer_{tag}.npz"),
                      opt_state_flat)
    state = {"step": step, **(extra or {})}
    tmp = os.path.join(model_dir, f"state_{tag}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(model_dir, f"state_{tag}.json"))
    if update_last and name.startswith("model_") and name != "model_latest":
        _symlink(model_path, os.path.join(model_dir, "model_last.npz"))
    logger.info(f"saved checkpoint {model_path}")
    return model_path


def mark_best(model_dir: str, step: int):
    path = os.path.join(model_dir, f"model_{step}.npz")
    if os.path.exists(path):
        _symlink(path, os.path.join(model_dir, "model_best.npz"))


def load_flat(path: str) -> dict:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def checkpoint_step(model_dir: str, model_path: str) -> Optional[int]:
    real = os.path.realpath(model_path)
    base = os.path.basename(real)
    m = re.match(r"model_(\d+)\.npz", base)
    if m:
        return int(m.group(1))
    if base == "model_latest.npz":
        state = load_state(model_dir, "latest")
        if state.get("step"):
            return int(state["step"])
    return None


def discard_latest(model_dir: str):
    """Delete the interrupt checkpoint after a successful resume, like the
    reference (pasero/cli/train.py:438) — a stale model_latest must never
    shadow a newer model_last in find_checkpoint_to_load."""
    for fname in ("model_latest.npz", "optimizer_latest.npz",
                  "state_latest.json"):
        path = os.path.join(model_dir, fname)
        if os.path.exists(path) or os.path.islink(path):
            os.remove(path)
            logger.info(f"removed interrupt checkpoint file {fname}")


def find_checkpoint_to_load(model_dir: str, ckpt: Optional[str] = None,
                            reset: bool = False) -> Optional[str]:
    """Resume priority: model_latest > model_last > explicit --ckpt."""
    if not reset:
        for name in ("model_latest.npz", "model_last.npz"):
            path = os.path.join(model_dir, name)
            if os.path.exists(path):
                return path
    if ckpt:
        if os.path.isfile(ckpt):
            return ckpt
        path = os.path.join(model_dir, ckpt)
        if os.path.isfile(path):
            return path
        raise FileNotFoundError(f"checkpoint {ckpt!r} not found")
    return None


def load_params(path: str, init_params, flexible: bool = False,
                reset_params_regex: Optional[str] = None,
                other_paths: tuple = ()) -> tuple:
    """Load a flat npz into the shape of ``init_params``.

    Returns (params, missing, unexpected). ``other_paths`` are merged on top
    (e.g. adapter-only checkpoints over a base model, utils.py:1570-1574).
    Missing keys keep their initialization; with flexible=False any mismatch
    raises.
    """
    flat_init = flatten_params(init_params)
    loaded = load_flat(path)
    for other in other_paths:
        loaded.update(load_flat(other))
    if reset_params_regex:
        loaded = {k: v for k, v in loaded.items()
                  if not re.search(reset_params_regex, k)}
    missing = [k for k in flat_init if k not in loaded]
    unexpected = [k for k in loaded if k not in flat_init]
    mismatched = [k for k in loaded
                  if k in flat_init and flat_init[k].shape != loaded[k].shape]
    problems = missing + unexpected + mismatched
    if problems and not flexible and not reset_params_regex:
        raise ValueError(
            f"checkpoint mismatch: missing={missing[:5]}... "
            f"unexpected={unexpected[:5]}... shape-mismatch={mismatched[:5]}... "
            f"(use --flexible to load anyway)")
    out = {}
    for k, init_val in flat_init.items():
        if k in loaded and loaded[k].shape == init_val.shape:
            out[k] = loaded[k].astype(init_val.dtype)
        else:
            out[k] = init_val
    if missing:
        logger.warning(f"{len(missing)} parameters missing from checkpoint")
    if unexpected:
        logger.warning(f"{len(unexpected)} unexpected checkpoint parameters")
    return unflatten_params(out), missing, unexpected


def load_state(model_dir: str, step) -> dict:
    """``step`` may be an int or the literal tag 'latest'."""
    path = os.path.join(model_dir, f"state_{step}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def load_optimizer_flat(model_dir: str, step) -> Optional[dict]:
    """``step`` may be an int or the literal tag 'latest'."""
    path = os.path.join(model_dir, f"optimizer_{step}.npz")
    return load_flat(path) if os.path.exists(path) else None


def average_checkpoints(paths: list) -> dict:
    """Uniform weight averaging (scripts/average-ckpt.py)."""
    acc: dict = {}
    for path in paths:
        flat = load_flat(path)
        for k, v in flat.items():
            acc[k] = acc.get(k, 0) + v.astype(np.float64) / len(paths)
    return {k: v.astype(np.float32) for k, v in acc.items()}


def cleanup_checkpoints(model_dir: str, keep_last: int = 1,
                        keep_interval: Optional[int] = None,
                        best_step: Optional[int] = None):
    """Delete old checkpoints, keeping the last N, multiples of
    keep_interval, and the best (cli/train.py:435-441)."""
    steps = sorted(
        int(m.group(1)) for f in os.listdir(model_dir)
        if (m := re.fullmatch(r"model_(\d+)\.npz", f)))
    keep = set(steps[-keep_last:] if keep_last else [])
    if keep_interval:
        keep |= {s for s in steps if s % keep_interval == 0}
    if best_step is not None:
        keep.add(best_step)
    # never delete targets of symlinks
    for link in ("model_last.npz", "model_best.npz", "model_latest.npz"):
        path = os.path.join(model_dir, link)
        if os.path.islink(path):
            m = re.match(r"model_(\d+)\.npz", os.readlink(path))
            if m:
                keep.add(int(m.group(1)))
    for s in steps:
        if s not in keep:
            for pattern in (f"model_{s}.npz", f"optimizer_{s}.npz",
                            f"state_{s}.json"):
                path = os.path.join(model_dir, pattern)
                if os.path.exists(path):
                    os.remove(path)
