"""Parallelism: device mesh, GSPMD sharding rules, host data sharding,
multi-process bootstrap."""

from . import bootstrap
from .mesh import MeshConfig, make_mesh
from .sharding import (LOGICAL_RULES, batch_sharding, fsdp_rules,
                       logical_axis_sharding, param_shardings, replicate,
                       shard_batch_arrays)
