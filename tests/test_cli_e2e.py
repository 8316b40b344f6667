"""End-to-end CLI test: build tokenizer -> train -> resume -> decode.

A miniature of the synthetic-corpus slice (SURVEY.md §7 minimum slice),
exercised through the real command-line entry points in subprocesses.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
       "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}


def run(args, cwd, timeout=420, stdin=None):
    result = subprocess.run(
        [sys.executable, "-m"] + args, cwd=cwd, env=ENV, timeout=timeout,
        capture_output=True, text=True, input=stdin)
    assert result.returncode == 0, \
        f"{args} failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}"
    return result


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    words = {"der": "the", "hund": "dog", "springt": "jumps",
             "katze": "cat", "läuft": "runs"}
    import random
    rng = random.Random(0)
    pairs = []
    for _ in range(400):
        src = [rng.choice(list(words)) for _ in range(rng.randint(2, 5))]
        pairs.append((" ".join(src), " ".join(words[w] for w in src)))
    for name, rows in [("train", pairs[:380]), ("valid", pairs[380:])]:
        (d / f"{name}.de").write_text("\n".join(s for s, _ in rows) + "\n")
        (d / f"{name}.en").write_text("\n".join(t for _, t in rows) + "\n")
    return str(d)


@pytest.mark.slow
def test_full_cli_pipeline(workdir):
    run(["cli.tokenizer_cli", "build-tokenizer", "train.de", "train.en",
         "-o", "bpecodes", "--size", "60", "--dict-path", "dict.txt",
         "--dict-min-count", "1", "--dict-padding-factor", "1"], workdir)
    assert os.path.exists(os.path.join(workdir, "dict.txt"))

    train_args = ["cli.train", "--data-dir", ".", "-o", "model",
                  "-s", "de", "-t", "en", "--arch", "transformer_small",
                  "--encoder-layers", "1", "--decoder-layers", "1",
                  "--embed-dim", "32", "--encoder-ffn-dim", "64",
                  "--decoder-ffn-dim", "64", "--encoder-attention-heads", "2",
                  "--decoder-attention-heads", "2", "--max-steps", "30",
                  "--valid-interval", "30", "--log-interval", "30",
                  "--batch-size", "512", "--lr", "0.003", "--warmup", "10",
                  "--seed", "1", "--dataset-type", "debug", "--metrics",
                  "--max-output-len", "12"]
    out = run(train_args, workdir)
    assert os.path.exists(os.path.join(workdir, "model", "model_30.npz"))
    assert os.path.exists(os.path.join(workdir, "model", "inference.yaml"))

    # resume: rerunning immediately finishes at the saved step
    out = run(train_args, workdir)
    assert "resumed at step 30" in out.stdout + out.stderr

    # decode from stdin through the trained model
    out = run(["cli.decode", "model", "--beam-size", "2"],
              workdir, stdin="der hund\n")
    assert out.stdout.strip(), "no decoding output"


@pytest.mark.slow
def test_sigterm_saves_latest_and_exits_143(workdir):
    """SIGTERM -> save model_latest + exit 143 for SLURM requeue
    (reference cli/train.py:36-58, 748-765)."""
    import signal
    import time
    if not os.path.exists(os.path.join(workdir, "dict.txt")):
        run(["cli.tokenizer_cli", "build-tokenizer", "train.de", "train.en",
             "-o", "bpecodes", "--size", "60", "--dict-path", "dict.txt",
             "--dict-min-count", "1", "--dict-padding-factor", "1"], workdir)
    args = [sys.executable, "-m", "cli.train", "--data-dir", ".",
            "-o", "model_sig", "-s", "de", "-t", "en",
            "--arch", "transformer_small", "--encoder-layers", "1",
            "--decoder-layers", "1", "--embed-dim", "32",
            "--encoder-ffn-dim", "64", "--decoder-ffn-dim", "64",
            "--encoder-attention-heads", "2", "--decoder-attention-heads", "2",
            "--max-steps", "100000", "--valid-interval", "100000",
            "--log-interval", "5", "--batch-size", "256", "--lr", "0.003",
            "--warmup", "10", "--seed", "1", "--dataset-type", "debug"]
    proc = subprocess.Popen(args, cwd=workdir, env=ENV,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # consume output continuously so the child never blocks on a full pipe
    import threading
    lines = []
    stepped = threading.Event()

    def reader():
        for line in proc.stdout:
            lines.append(line)
            if "| step " in line:
                stepped.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    assert stepped.wait(timeout=300), "no training step within 300s:\n" + \
        "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=180)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    t.join(timeout=30)
    assert proc.returncode == 143, "".join(lines)[-2000:]
    latest = os.path.join(workdir, "model_sig", "model_latest.npz")
    assert os.path.exists(latest), "model_latest.npz not saved on SIGTERM"


@pytest.mark.slow
def test_stream_speculative_parity(workdir):
    """stream() with --speculative emits the identical token stream."""
    model_dir = os.path.join(workdir, "model")
    if not os.path.exists(os.path.join(model_dir, "inference.yaml")):
        pytest.skip("needs the model trained by test_full_cli_pipeline")
    code = (
        "from pasero_tpu.decoding.generator import TextGenerator\n"
        "plain = list(TextGenerator.build(%r, beam_size=1)"
        ".stream('der hund katze'))\n"
        "spec = list(TextGenerator.build(%r, beam_size=1, speculative=True,"
        "speculative_draft_len=3).stream('der hund katze'))\n"
        "assert plain == spec, (plain, spec)\n"
        "print('PARITY', ''.join(w for w, _ in plain))\n" % (model_dir, model_dir))
    result = subprocess.run([sys.executable, "-c", code], env=ENV,
                            capture_output=True, text=True, timeout=420)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "PARITY" in result.stdout


@pytest.mark.slow
def test_generation_return_layers(workdir):
    """return_layers/return_weights during GENERATION (VERDICT round-1 weak
    #8): decode() attaches per-layer outputs and attention maps for the
    winning beam — the README heatmap workflow on generated output."""
    model_dir = os.path.join(workdir, "model")
    if not os.path.exists(os.path.join(model_dir, "inference.yaml")):
        pytest.skip("needs the model trained by test_full_cli_pipeline")
    code = (
        "import numpy as np\n"
        "from pasero_tpu.decoding.generator import TextGenerator\n"
        "gen = TextGenerator.build(%r, beam_size=2)\n"
        "hyps = gen.decode(['der hund springt'], return_weights=True,\n"
        "                  return_layers=True, return_scores=True)\n"
        "hyp = hyps[0][0]\n"
        "n = len(hyp['tokens'])\n"
        "assert 'cross_attn' in hyp and 'layers' in hyp, hyp.keys()\n"
        "maps = [m for m in hyp['cross_attn'] if m is not None]\n"
        "assert maps, 'no cross-attention maps'\n"
        "assert maps[0].ndim == 4 and maps[0].shape[2] == n, \\\n"
        "    (maps[0].shape, n)\n"
        "rows = maps[0].sum(axis=-1)\n"
        "assert np.allclose(rows, 1.0, atol=1e-3), 'not a distribution'\n"
        "layer = [x for x in hyp['layers'] if x is not None][0]\n"
        "assert layer.shape[1] == n, (layer.shape, n)\n"
        "print('LAYERS OK', n)\n" % model_dir)
    result = subprocess.run([sys.executable, "-c", code], env=ENV,
                            capture_output=True, text=True, timeout=420)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "LAYERS OK" in result.stdout
