"""Multi-host (multi-process) runtime tests.

The reference runs multi-node via NCCL process groups
(pasero/cli/train.py:81-87, utils.py:1361-1432); the TPU-native equivalent
is `jax.distributed.initialize` + one global GSPMD mesh
(pasero_tpu/parallel/bootstrap.py).  JAX supports multi-process *CPU*
clusters, so a 2-process x 4-virtual-device topology verifies the whole
path — bootstrap, global mesh, per-host input, process-0 checkpointing —
without pod hardware (SURVEY.md §4 multi-host simulation).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def clean_env():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PASERO_")}
    env["PYTHONPATH"] = REPO
    # the workers set their own XLA device-count flag
    env.pop("XLA_FLAGS", None)
    return env


def launch_pair(mode, workdir, extra_args=(), timeout=900, env_extra=None):
    """Run both processes of the 2-process cluster; return their results."""
    port = free_port()
    outs = [os.path.join(workdir, f"out{i}.json") for i in range(2)]
    env = clean_env()
    env.update(env_extra or {})
    procs = []
    log_files = []
    # capture console output in FILES, not PIPEs: with pipes, draining the
    # ranks sequentially deadlocks the whole cluster once any undrained
    # rank (or a tokenizer worker child inheriting its stdout) fills the
    # 64KB pipe buffer while the drained rank waits for it at a collective
    for i in range(2):
        log_files.append(open(
            os.path.join(workdir, f"console{i}_{mode}_{port}.log"), "w+"))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, mode, str(port), str(i), outs[i],
             *extra_args],
            cwd=workdir, env=env,
            stdout=log_files[i], stderr=subprocess.STDOUT, text=True))
    logs = []
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        # whatever interrupted us (timeout, KeyboardInterrupt, a worker
        # assert) — never leave cluster processes behind
        for q in procs:
            if q.poll() is None:
                q.kill()
        for f in log_files:
            f.flush()
            f.seek(0)
            logs.append(f.read())
            f.close()
    for i, p in enumerate(procs):
        assert p.returncode == 0, \
            f"worker {i} failed (rc={p.returncode}):\n{logs[i][-3000:]}"
    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
    return results, logs


@pytest.mark.slow
def test_bootstrap_helpers_two_processes(tmp_path):
    """Global arrays from full/local host data, replicated scalars and the
    host gather all agree across a real 2-process cluster."""
    results, _ = launch_pair("helpers", str(tmp_path), timeout=600)
    for r in results:
        assert r["full_sum"] == 120.0
        assert r["local_sum"] == 856.0   # both processes' rows made it in
        assert r["step"] == 7
        assert r["host_a_sum"] == 120.0
        assert r["host_b"] == 7


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("multihost")
    words = {"der": "the", "hund": "dog", "springt": "jumps",
             "katze": "cat", "läuft": "runs"}
    import random
    rng = random.Random(0)
    pairs = []
    for _ in range(300):
        src = [rng.choice(list(words)) for _ in range(rng.randint(2, 5))]
        pairs.append((" ".join(src), " ".join(words[w] for w in src)))
    for name, rows in [("train", pairs[:280]), ("valid", pairs[280:])]:
        (d / f"{name}.de").write_text("\n".join(s for s, _ in rows) + "\n")
        (d / f"{name}.en").write_text("\n".join(t for _, t in rows) + "\n")
    env = clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, "-m", "cli.tokenizer_cli", "build-tokenizer",
         "train.de", "train.en", "-o", "bpecodes", "--size", "60",
         "--dict-path", "dict.txt", "--dict-min-count", "1",
         "--dict-padding-factor", "1"],
        cwd=str(d), env=env, check=True, capture_output=True, timeout=300)
    return str(d)


TRAIN_ARGS = ["--data-dir", ".", "-s", "de", "-t", "en",
              "--arch", "transformer_small", "--encoder-layers", "1",
              "--decoder-layers", "1", "--embed-dim", "32",
              "--encoder-ffn-dim", "64", "--decoder-ffn-dim", "64",
              "--encoder-attention-heads", "2",
              "--decoder-attention-heads", "2", "--max-steps", "3",
              "--valid-interval", "3", "--buffer-size", "2000",
              "--log-interval", "1", "--batch-size", "512", "--lr", "0.003",
              "--warmup", "10", "--seed", "1", "--dataset-type", "debug",
              "--dropout", "0", "--label-smoothing", "0"]


def parse_losses(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        if "| loss " in line and "step" in line:
            try:
                step = int(line.split("step", 1)[1].split("|")[0])
                loss = float(line.split("| loss", 1)[1].split("|")[0])
                out[step] = loss
            except (ValueError, IndexError):
                pass
    return out


@pytest.mark.slow
def test_two_process_training_matches_single(corpus_dir):
    """One dp8 training step computed by 2 processes x 4 devices matches the
    single-process 8-device run: same global mesh, same batches (replicated
    per-host input), same losses; process 0 writes the only checkpoint."""
    env = clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    single = subprocess.run(
        [sys.executable, "-m", "cli.train", "-o", "model_single",
         *TRAIN_ARGS],
        cwd=corpus_dir, env=env, capture_output=True, text=True, timeout=900)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-3000:]
    ref_losses = parse_losses(single.stdout + single.stderr)
    assert ref_losses, "no loss lines in single-process run"

    _, logs = launch_pair(
        "train", corpus_dir,
        extra_args=["-o", "model_multi", *TRAIN_ARGS], timeout=900)
    multi_losses = parse_losses(logs[0])
    assert multi_losses, f"no loss lines in process-0 log:\n{logs[0][-3000:]}"

    for step, ref in ref_losses.items():
        assert step in multi_losses
        assert abs(multi_losses[step] - ref) < 2e-3, \
            f"step {step}: multi {multi_losses[step]} vs single {ref}"

    # process 0 wrote the checkpoint + config files; process 1 wrote nothing
    mdir = os.path.join(corpus_dir, "model_multi")
    assert os.path.exists(os.path.join(mdir, "model_3.npz"))
    assert os.path.exists(os.path.join(mdir, "training.yaml"))
    # non-master logged to its own per-rank file
    assert os.path.exists(os.path.join(mdir, "train.log.1"))


@pytest.mark.slow
def test_two_process_validation_metrics_match_single(corpus_dir):
    """--metrics bleu under 2 processes: the validation beam decode runs on
    the global mesh (sharded prompts, globally-sharded params) and produces
    the same BLEU as the single-process run (reference: per-rank validation
    decode + master-side scoring, cli/train.py:458-541)."""
    args = TRAIN_ARGS + ["--metrics", "bleu", "--beam-size", "2",
                         "--max-output-len", "20"]
    env = clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    single = subprocess.run(
        [sys.executable, "-m", "cli.train", "-o", "model_vm_single", *args],
        cwd=corpus_dir, env=env, capture_output=True, text=True, timeout=900)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-3000:]

    def parse_bleu(text):
        out = {}
        for line in text.splitlines():
            if "valid |" in line and "| bleu " in line:
                out[len(out)] = float(
                    line.split("| bleu", 1)[1].split("|")[0])
        return out

    ref_bleu = parse_bleu(single.stdout + single.stderr)
    assert ref_bleu, "no bleu lines in single-process run:\n" + \
        (single.stdout + single.stderr)[-3000:]

    _, logs = launch_pair(
        "train", corpus_dir,
        extra_args=["-o", "model_vm_multi", *args], timeout=900)
    multi_bleu = parse_bleu(logs[0])
    assert multi_bleu, f"no bleu lines in process-0 log:\n{logs[0][-3000:]}"
    assert multi_bleu == ref_bleu, (multi_bleu, ref_bleu)


@pytest.mark.slow
def test_two_process_decode_matches_single(corpus_dir):
    """Multi-host corpus decoding: 2 processes x 4 devices decode the same
    corpus over one dp8 mesh and the master's output file is line-identical
    to the single-process run (reference: cli/decode.py:47-164 decodes with
    one process per GPU; here it is one SPMD program)."""
    env = clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    train = subprocess.run(
        [sys.executable, "-m", "cli.train", "-o", "model_dec",
         *[a if a != "3" else "40" for a in TRAIN_ARGS]],
        cwd=corpus_dir, env=env, capture_output=True, text=True, timeout=900)
    assert train.returncode == 0, train.stdout[-3000:] + train.stderr[-3000:]

    decode_args = ["model_dec", "-i", "valid.de", "-r", "valid.en",
                   "--metrics", "bleu", "--beam-size", "2",
                   "--max-output-len", "20"]
    single = subprocess.run(
        [sys.executable, "-m", "cli.decode", *decode_args,
         "-o", "out_single.en"],
        cwd=corpus_dir, env=env, capture_output=True, text=True, timeout=900)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-3000:]

    _, logs = launch_pair(
        "decode", corpus_dir,
        extra_args=[*decode_args, "-o", "out_multi.en"], timeout=900)
    with open(os.path.join(corpus_dir, "out_single.en")) as f:
        ref_lines = f.readlines()
    with open(os.path.join(corpus_dir, "out_multi.en")) as f:
        multi_lines = f.readlines()
    assert ref_lines, "single-process decode produced no output"
    assert multi_lines == ref_lines, (
        f"multi-host decode diverged:\n{multi_lines[:5]}\nvs\n{ref_lines[:5]}")
    # both processes logged the same BLEU
    assert "bleu" in logs[0]


@pytest.mark.slow
def test_two_process_dynamic_pipeline(corpus_dir):
    """The PRODUCTION data pipeline (line reader -> tokenizer worker pool ->
    bucketed fixed-shape batcher, --dataset-type dynamic) under a 2-process
    cluster with sharded per-host input: each host runs its own worker pool
    on a disjoint sample stream (distinct per-host RNG) and training
    completes with finite losses and a master-only checkpoint.  The round-3
    review noted sharded input had only ever run with the debug dataset."""
    args = [a if a != "debug" else "dynamic" for a in TRAIN_ARGS]
    _, logs = launch_pair(
        "train", corpus_dir,
        extra_args=["-o", "model_dynpipe", *args, "--num-workers", "2",
                    "--per-host-data", "sharded", "--max-target-len", "16",
                    "--max-source-len", "16"],
        # 2 processes x (trainer + 2 spawn-context workers) on a 1-CPU CI
        # host: give the pool time to warm up
        timeout=1800,
        # the 1-CPU clamp would silence the pool; force it on (the pool's
        # correctness on 1 CPU is proven by tests/test_pipeline.py)
        env_extra={"PASERO_FORCE_WORKERS": "2"})
    losses = parse_losses(logs[0])
    assert losses, f"no loss lines:\n{logs[0][-3000:]}"
    import math
    assert all(math.isfinite(v) for v in losses.values())
    # both hosts started their own pool and took their own disjoint shard.
    # Non-master ranks console-log WARNING+ only (cli/train.py
    # setup_logging), so INFO lines must be read from the per-rank log
    # FILES (train.log on the master, train.log.1 on rank 1)
    rank_logs = []
    for name in ("train.log", "train.log.1"):
        with open(os.path.join(corpus_dir, "model_dynpipe", name)) as f:
            rank_logs.append(f.read())
    for rank, log in enumerate(rank_logs):
        assert "started 2 tokenizer worker processes" in log, \
            f"rank {rank} ran without the worker pool:\n{log[-2000:]}"
    both = rank_logs[0] + rank_logs[1]
    assert "per-host data shard 0/2" in both
    assert "per-host data shard 1/2" in both
    assert os.path.exists(
        os.path.join(corpus_dir, "model_dynpipe", "model_3.npz"))


@pytest.mark.slow
def test_two_process_sharded_input_pipeline(corpus_dir):
    """The 'sharded' per-host input mode: each host samples a disjoint
    stream and contributes half of every fixed-shape batch."""
    _, logs = launch_pair(
        "train", corpus_dir,
        extra_args=["-o", "model_sharded", *TRAIN_ARGS,
                    "--per-host-data", "sharded", "--max-target-len", "16",
                    "--max-source-len", "16"],
        timeout=900)
    losses = parse_losses(logs[0])
    assert losses, f"no loss lines:\n{logs[0][-3000:]}"
    import math
    assert all(math.isfinite(v) for v in losses.values())
    assert "per-host data shard" in logs[0] + logs[1]
    assert os.path.exists(
        os.path.join(corpus_dir, "model_sharded", "model_3.npz"))
