"""One process of a multi-process dry run (python -m ...parallel._mp_dryrun).

Forms a JAX CPU cluster with its siblings (jax.distributed via the
PASERO_* env contract in bootstrap.py), builds a global data-parallel mesh
spanning all processes, runs one full training step (grad + Adam) of a
tiny transformer through the production Trainer, and prints the loss —
which must agree bit-for-bit across processes (one SPMD program).

Usage: python -m pasero_tpu.parallel._mp_dryrun <port> <process_id> \
           <num_processes> <local_devices>
"""

import os
import sys


def main() -> None:
    port, pid, nproc, local = (int(sys.argv[1]), int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]))
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = \
        f"{flags} --xla_force_host_platform_device_count={local}".strip()
    os.environ["PASERO_COORDINATOR"] = f"localhost:{port}"
    os.environ["PASERO_NUM_PROCESSES"] = str(nproc)
    os.environ["PASERO_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from . import bootstrap
    info = bootstrap.initialize()
    assert info["num_processes"] == nproc
    n_devices = jax.device_count()
    assert n_devices == nproc * local, (n_devices, nproc, local)

    import tempfile

    import numpy as np

    from ..config import TrainingConfig
    from ..models import Transformer
    from ..parallel import make_mesh
    from ..training import Trainer

    mesh = make_mesh(dp_size=n_devices)
    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        cfg = TrainingConfig(
            "--data-dir", os.path.join(tmp, "data"), "-o",
            os.path.join(tmp, f"model{pid}"), "-s", "de", "-t", "en",
            "--max-steps", "1", "--valid-interval", "1",
            "--log-interval", "1", "--dp-size", str(n_devices),
            "--seed", "0")
        for k, v in dict(encoder_layers=2, decoder_layers=2, embed_dim=64,
                         encoder_ffn_dim=128, decoder_ffn_dim=128,
                         encoder_attention_heads=4,
                         decoder_attention_heads=4, dropout=0.0).items():
            setattr(cfg.model_cfg, k, v)
        vocab = 64
        model = Transformer(cfg.model_cfg, src_vocab_size=vocab)
        trainer = Trainer(cfg, task=None, model=model, mesh=mesh)

        rng = np.random.default_rng(0)   # same batch on every process
        B, S = n_devices * 2, 16
        batch = {
            "src_tokens": rng.integers(4, vocab, (B, S)).astype(np.int32),
            "src_mask": np.ones((B, S), bool),
            "decoder_input": rng.integers(4, vocab, (B, S)).astype(np.int32),
            "target_mask": np.ones((B, S), bool),
            "prompt_mask": np.zeros((B, S), bool),
            "num_real_rows": B,
        }
        logs = trainer.train_step(iter([batch]))
        assert np.isfinite(logs["loss"])
        bootstrap.barrier("mp-dryrun")
        print(f"MP_DRYRUN process {pid}/{nproc} "
              f"devices={n_devices} loss={logs['loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
