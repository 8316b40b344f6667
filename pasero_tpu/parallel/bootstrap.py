"""Multi-process (multi-host) runtime bootstrap.

TPU-native replacement for the reference's NCCL process-group setup
(pasero/cli/train.py:81-87 ``dist.init_process_group('nccl', rank,
world_size, init_method)``) and its SLURM topology inference
(pasero/utils.py:1361-1432, ``start_rank``/``distributed_init_method`` at
config.py:513-517).  Where the reference spawns one process per GPU and
wires NCCL by hand, a JAX pod runs one process per *host*; this module
turns environment topology into one `jax.distributed.initialize` call so
that `jax.devices()` spans every chip of the slice and a single GSPMD mesh
covers them all.

Topology sources, in precedence order:

1. explicit ``PASERO_COORDINATOR`` / ``PASERO_NUM_PROCESSES`` /
   ``PASERO_PROCESS_ID`` env vars (the equivalent of the reference's
   ``--distributed-init-method tcp://host:port`` + ``--start-rank``);
2. SLURM (``SLURM_NTASKS``/``SLURM_PROCID``/``SLURM_STEP_NODELIST``) and
   TPU-pod metadata — both handled by `jax.distributed.initialize`'s own
   cluster auto-detection when called with no arguments;
3. nothing: single-process, no distributed runtime is started.

After `initialize()`, the rest of the stack needs only three facts, all
re-exported here: `process_count()`, `process_index()`, `is_master()`.
Input pipelines feed their host-local rows through
`host_local_batch_to_global` (``jax.make_array_from_process_local_data``)
and checkpoint writes go through `replicate_to_host` + an `is_master()`
gate with a `barrier()` (the reference's rank-0 save + dist.barrier).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("parallel")

_initialized = False


def _env_topology():
    """Explicit PASERO_* topology, or None."""
    coord = os.environ.get("PASERO_COORDINATOR")
    n = os.environ.get("PASERO_NUM_PROCESSES")
    i = os.environ.get("PASERO_PROCESS_ID")
    if coord and n is not None and i is not None:
        return dict(coordinator_address=coord, num_processes=int(n),
                    process_id=int(i))
    return None


def _slurm_multiprocess() -> bool:
    try:
        return int(os.environ.get("SLURM_NTASKS", "1")) > 1
    except ValueError:
        return False


def _tpu_pod() -> bool:
    """Multi-host TPU slices expose worker topology via these env vars /
    metadata; single-host slices (and this image's single-chip tunnel)
    do not need the distributed runtime for correctness but tolerate it."""
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hostnames


def initialize(timeout_s: int = 300) -> dict:
    """Start the JAX distributed runtime if the environment describes a
    multi-process topology.  Idempotent; safe to call in single-process
    runs (no-op).  Returns {'num_processes', 'process_id'}."""
    global _initialized
    import jax

    if not _initialized:
        explicit = _env_topology()
        if explicit is not None:
            logger.info(
                f"jax.distributed.initialize({explicit['coordinator_address']}"
                f", num_processes={explicit['num_processes']}, "
                f"process_id={explicit['process_id']})")
            jax.distributed.initialize(
                initialization_timeout=timeout_s, **explicit)
            _initialized = True
        elif _slurm_multiprocess() or _tpu_pod():
            # jax's cluster auto-detection covers SLURM and TPU pods
            logger.info("jax.distributed.initialize() [auto-detected topology]")
            jax.distributed.initialize(initialization_timeout=timeout_s)
            _initialized = True
    return dict(num_processes=jax.process_count(),
                process_id=jax.process_index())


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def is_master() -> bool:
    return process_index() == 0


def is_multiprocess() -> bool:
    return process_count() > 1


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (dist.barrier)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def global_array_from_full(x, mesh, spec):
    """Host array (identical on every process) -> global jax.Array sharded
    by ``spec``.  Each device pulls exactly its slice via a callback, so
    this is correct for any spec (data-sharded batches, replicated adapter
    ids) regardless of how the mesh axes map to processes.

    This is the 'replicated' input mode: every host builds the same global
    batch (same seed, same files) and keeps only its devices' rows —
    bucketed batch shapes then agree across hosts by construction, at the
    cost of duplicated host-side preprocessing.  Single-process: a plain
    device_put.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def global_array_from_local_rows(x, mesh, spec):
    """Per-process batch rows -> global jax.Array sharded over the data
    axis (``jax.make_array_from_process_local_data``).

    This is the 'sharded' input mode: each host's pipeline produces
    global_rows / num_processes rows of its own (disjoint sampling
    streams), and only array metadata crosses hosts — the reference
    instead broadcasts whole batches between ranks (utils.py:146-172).
    Row order across processes is arbitrary, which is fine for training
    (SGD is row-permutation invariant); batch shapes must be fixed so
    every host emits the same shape each step.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    global_shape = (x.shape[0] * process_count(),) + tuple(x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)


def replicated_scalar(value, mesh, dtype=None):
    """A fully-replicated global scalar (e.g. the step counter).

    In multi-process runs every array entering a global jitted computation
    must live on the global device set; a plain ``jnp.asarray`` scalar is
    single-device local and would make XLA reject the mixed computation.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    make = jax.jit(lambda: jnp.asarray(value, dtype),
                   out_shardings=NamedSharding(mesh, P()))
    return make()


def global_params_from_host(tree, shardings):
    """Host numpy parameter pytree -> globally-sharded jax.Arrays.

    Single-process this is `jax.device_put(tree, shardings)`.  Multi-process,
    device_put of a host array onto a sharding that spans non-addressable
    devices fails; `make_array_from_callback` instead hands each *local*
    device exactly its slice of the host copy (every process holds the same
    full checkpoint, as with the reference's per-rank torch.load).
    """
    import jax
    import numpy as np

    if not is_multiprocess():
        return jax.device_put(tree, shardings)

    def place(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(place, tree, shardings)


def broadcast_obj(obj, root: int = 0):
    """Broadcast a picklable object from ``root`` to every process.

    The reference broadcasts stdin lines / serving requests between ranks
    with torch.distributed broadcast_object_list (utils.py:69-104); the JAX
    equivalent ships the pickle bytes through two fixed-shape device
    broadcasts (length, then payload).  Single-process: returns obj.
    """
    if not is_multiprocess():
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = (np.frombuffer(pickle.dumps(obj), np.uint8)
               if process_index() == root else np.zeros((0,), np.uint8))
    n = multihost_utils.broadcast_one_to_all(
        np.asarray([payload.size], np.int64), is_source=process_index() == root)
    buf = payload if process_index() == root else np.zeros((int(n[0]),),
                                                           np.uint8)
    data = multihost_utils.broadcast_one_to_all(
        buf, is_source=process_index() == root)
    return pickle.loads(np.asarray(data).tobytes())


def replicate_to_host(tree, mesh):
    """Device pytree -> host numpy pytree, valid on every process.

    Parameters may be sharded over mesh axes that span processes (FSDP,
    TP over multiple hosts): a plain `jax.device_get` would fail on
    non-addressable shards.  Jit an identity with fully-replicated output
    (an all-gather over ICI/DCN), then read the local replica.  This is a
    collective: every process must call it, even those that skip the
    subsequent disk write.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not is_multiprocess():
        return jax.device_get(tree)
    repl = NamedSharding(mesh, P())
    gathered = jax.jit(lambda t: t,
                       out_shardings=jax.tree_util.tree_map(
                           lambda _: repl, tree))(tree)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), gathered)
