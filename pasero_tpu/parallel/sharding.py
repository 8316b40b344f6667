"""GSPMD sharding rules: logical parameter axes -> mesh axes.

A single rules table replaces the reference's Megatron column/row regexes and
manual Enter/Exit collectives (pasero/models/modules.py:103-176,
transformer.py:120-123): parameters are annotated with logical axis names at
creation (models/modules.py here) and mapped to the (data, expert, model) mesh.
XLA then derives TP, sequence-parallel activation sharding, and the gradient
all-reduce automatically. FSDP (--fsdp) is expressed as extra rules sharding
the parameters' 'embed'/'vocab' axes over 'data' (ZeRO-3 style, replacing
torch FSDP, pasero/training.py:186-234).
"""

from __future__ import annotations

import logging
import re
from typing import Optional

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("parallel")

# logical axis -> mesh axis (None = replicated)
LOGICAL_RULES = (
    ("batch", "data"),
    ("length", None),
    ("embed", None),       # residual dim replicated under pure TP
    ("mlp", "model"),      # FFN inner dim: column-parallel fc1, row-parallel fc2
    ("heads", "model"),    # attention heads across TP
    ("kv", None),
    ("vocab", None),       # output embedding; sharded under FSDP
    ("expert", "expert"),  # MoE expert axis
)


def fsdp_rules(rules=LOGICAL_RULES):
    """ZeRO-style parameter sharding: replicate nothing that can ride 'data'."""
    out = []
    for logical, mesh_axis in rules:
        if logical in ("embed", "vocab") and mesh_axis is None:
            out.append((logical, "data"))
        else:
            out.append((logical, mesh_axis))
    return tuple(out)


def logical_axis_sharding(logical_axes: tuple, mesh: Mesh,
                          rules=LOGICAL_RULES) -> NamedSharding:
    table = dict(rules)
    spec = []
    for ax in logical_axes:
        spec.append(table.get(ax) if ax is not None else None)
    return NamedSharding(mesh, P(*spec))


def param_shardings(variables, mesh: Mesh, rules=LOGICAL_RULES):
    """Sharding pytree for a flax variable tree annotated with
    nn.with_logical_partitioning (nn.Partitioned leaves)."""
    logical_specs = nn.get_partition_spec(variables)

    def to_sharding(spec):
        if not isinstance(spec, P):
            return NamedSharding(mesh, P())
        resolved = nn.logical_to_mesh_axes(spec, rules=list(rules))
        return NamedSharding(mesh, P(*resolved))

    return jax.tree_util.tree_map(
        to_sharding, logical_specs,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batches are sharded along rows over the 'data' axis; with tp>1 and
    sequence parallelism this also yields Megatron-SP activation sharding for
    free (SURVEY.md §2.9)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch_arrays(batch: dict, mesh: Mesh):
    """Place a host batch dict onto the mesh (rows over 'data')."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] % mesh.shape["data"] == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim))
        elif isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, replicate(mesh))
        else:
            out[k] = v
    return out
