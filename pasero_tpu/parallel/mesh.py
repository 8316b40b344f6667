"""Device mesh construction.

One mesh with (data, expert, model) axes replaces the reference's NCCL process
groups (pasero/cli/train.py:81-87, utils.py:1361-1432). Unlike the reference —
which only supports TP=node or pure DP (training.py:180-183) — any
dp x ep x tp factorization of the device count works; XLA inserts the
collectives (SURVEY.md §2.9).

Axis order puts 'model' innermost so TP collectives ride the fastest ICI
links, then 'expert', then 'data' (the all-reduce of gradients tolerates the
slowest links; on multi-slice setups it is the axis that spans DCN).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger("parallel")

AXES = ("data", "expert", "model", "seq", "stage")


@dataclasses.dataclass
class MeshConfig:
    dp_size: Optional[int] = None
    tp_size: int = 1
    ep_size: int = 1
    cp_size: int = 1
    pp_size: int = 1


def make_mesh(dp_size: Optional[int] = None, tp_size: int = 1, ep_size: int = 1,
              cp_size: int = 1, pp_size: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp_size = tp_size or 1
    ep_size = ep_size or 1
    cp_size = cp_size or 1
    pp_size = pp_size or 1
    model_sz = tp_size * ep_size * cp_size * pp_size
    if dp_size is None:
        assert n % model_sz == 0, (
            f"{n} devices not divisible by tp={tp_size} x ep={ep_size} "
            f"x cp={cp_size} x pp={pp_size}")
        dp_size = n // model_sz
    assert dp_size * model_sz == n, (
        f"dp({dp_size}) x ep({ep_size}) x tp({tp_size}) x cp({cp_size}) "
        f"x pp({pp_size}) != devices({n})")
    grid = np.array(devices).reshape(dp_size, ep_size, tp_size, cp_size,
                                     pp_size)
    logger.info(f"mesh: data={dp_size} expert={ep_size} model={tp_size} "
                f"seq={cp_size} stage={pp_size}")
    return Mesh(grid, AXES)


def mesh_from_config(cfg, devices=None) -> Mesh:
    return make_mesh(getattr(cfg, "dp_size", None), getattr(cfg, "tp_size", 1),
                     getattr(cfg, "ep_size", 1), getattr(cfg, "cp_size", 1),
                     getattr(cfg, "pp_size", 1), devices=devices)
