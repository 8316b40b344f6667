"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process CPU cluster (4 virtual devices each -> 8 global devices).

Usage: python _multihost_worker.py <mode> <port> <process_id> <out_file>

Everything runs under the ``__main__`` guard: the dynamic data pipeline
spawns tokenizer worker processes with the *spawn* context, and spawn
re-imports this script in each child (as ``__mp_main__``) — unguarded
module-level argv parsing crashed every pool worker at import, which
mp.Pool silently turned into an infinite respawn loop producing zero
batches (the round-5 dynpipe deadlock).
"""
import json
import os
import sys


def _watchdog(deadline_s=2400.0):
    """Orphan watchdog: if the pytest parent is killed externally (round
    driver timeout, ctrl-C during the wait), the two workers can hang
    forever on the jax.distributed barrier and leak (observed: 4 such
    workers surviving hours on the CI host). A daemon thread exits hard
    when the parent dies (re-parented to init) or after an absolute
    deadline."""
    import time
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        if os.getppid() == 1:
            os._exit(70)
        time.sleep(5.0)
    os._exit(71)


def main():
    mode, port, pid, out_file = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])

    import threading
    threading.Thread(target=_watchdog, daemon=True).start()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=4").strip()
    # the env var must agree with the forced-cpu config below: downstream
    # apply_platform_env()/enable_compilation_cache() trust it, and a stale
    # 'axon' here once enabled the persistent compile cache for these CPU
    # runs (AOT machine-feature-mismatch warning spam on every reload)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PASERO_COORDINATOR"] = f"localhost:{port}"
    os.environ["PASERO_NUM_PROCESSES"] = "2"
    os.environ["PASERO_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from pasero_tpu.parallel import bootstrap

    info = bootstrap.initialize()
    assert info["num_processes"] == 2 and info["process_id"] == pid

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pasero_tpu.parallel import make_mesh

    results = {}

    if mode == "helpers":
        mesh = make_mesh(dp_size=8)

        # full-batch mode: every process passes the same global batch
        full = np.arange(16.0).reshape(8, 2)
        garr = bootstrap.global_array_from_full(full, mesh, P("data"))
        total = jax.jit(lambda x: jnp.sum(x),
                        out_shardings=jax.NamedSharding(mesh, P()))(garr)
        results["full_sum"] = float(total)          # 120.0

        # local-rows mode: each process contributes its own 4 rows
        local = np.arange(8.0).reshape(4, 2) + 100.0 * pid
        garr2 = bootstrap.global_array_from_local_rows(local, mesh, P("data"))
        assert garr2.shape == (8, 2)
        total2 = jax.jit(lambda x: jnp.sum(x),
                         out_shardings=jax.NamedSharding(mesh, P()))(garr2)
        results["local_sum"] = float(total2)        # 2*28 + 4*2*100 = 856.0

        # replicated scalar + replicate_to_host round trip
        step = bootstrap.replicated_scalar(7, mesh, jnp.int32)
        results["step"] = int(step)
        tree = {"a": garr, "b": step}
        host = bootstrap.replicate_to_host(tree, mesh)
        results["host_a_sum"] = float(np.sum(host["a"]))
        results["host_b"] = int(host["b"])
        bootstrap.barrier("done")

    elif mode == "train":
        # run the real training CLI entry inside this initialized process
        sys.argv = ["pasero-train"] + sys.argv[5:]
        from cli.train import main as train_main
        train_main()
        results["done"] = True

    elif mode == "decode":
        # run the real decode CLI entry inside this initialized process
        sys.argv = ["pasero-decode"] + sys.argv[5:]
        from cli.decode import main as decode_main
        decode_main()
        results["done"] = True

    with open(out_file, "w") as f:
        json.dump(results, f)


# sys.path must be importable for spawn children too (harmless re-insert)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    main()
