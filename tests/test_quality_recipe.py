"""End-to-end quality: the deen-mini recipe trains to a real BLEU.

The round-2 review's 'quality-parity evidence' gap: no committed recipe
had ever produced a BLEU number. This trains a shortened CPU variant of
examples/deen-mini (authored real German-English, unseen-template test
split) through the actual CLI and asserts the score floor. Slow (~10-15
min on a 1-core host) — the full recipe with the pinned expected_scores
runs on the TPU chip (examples/deen-mini/README.md).

test_gate_fires_on_broken_length_penalty is the round-3 review's
regression-sensitivity demand: the expected_scores gate must demonstrably
ABORT the run when beam scoring is broken (here: --len-penalty 10, which
makes the beam prefer the longest hypotheses), not just when the model is
untrained (reference gate: cli/train.py:604-660).
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
       "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}


def run(args, cwd=REPO, timeout=2400, check=True):
    result = subprocess.run([sys.executable, "-m"] + args, cwd=cwd, env=ENV,
                            timeout=timeout, capture_output=True, text=True)
    if check:
        assert result.returncode == 0, \
            f"{args[:2]} failed:\n{result.stdout[-3000:]}\n{result.stderr[-3000:]}"
    return result


ARCH_ARGS = ["-s", "de", "-t", "en", "--arch", "transformer_small",
             "--encoder-layers", "2", "--decoder-layers", "2",
             "--embed-dim", "128", "--encoder-ffn-dim", "256",
             "--decoder-ffn-dim", "256", "--encoder-attention-heads", "4",
             "--decoder-attention-heads", "4"]


@pytest.fixture(scope="module")
def deen_model(tmp_path_factory):
    """The shortened CPU deen-mini model (700 steps), shared by the quality
    and gate tests."""
    data = os.path.join(REPO, "examples", "deen-mini", "data")
    if not os.path.exists(os.path.join(data, "dict.txt")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "examples", "deen-mini",
                                     "prepare.py")], check=True, timeout=300)
        run(["cli.tokenizer_cli", "build-tokenizer", "train.de", "train.en",
             "-o", "bpecodes", "--size", "4000", "--dict-path", "dict.txt",
             "--dict-min-count", "1"], data)

    model_dir = str(tmp_path_factory.mktemp("deen") / "model")
    run(["cli.train", "--data-dir", data, "-o", model_dir, *ARCH_ARGS,
         "--max-steps", "700",
         "--valid-interval", "700", "--log-interval", "100",
         "--batch-size", "3072", "--lr", "0.001", "--warmup", "200",
         "--seed", "1", "--dataset-type", "debug", "--buffer-size", "3000",
         "--dropout", "0.1", "--beam-size", "2", "--max-output-len", "48"])
    return data, model_dir


@pytest.mark.slow
def test_deen_mini_trains_to_bleu(deen_model):
    data, model_dir = deen_model
    out = run(["cli.decode", model_dir,
               "-i", os.path.join(data, "test.de"),
               "-r", os.path.join(data, "test.en"),
               "--metrics", "bleu", "--beam-size", "2",
               "--max-output-len", "48"])
    text = out.stdout + out.stderr
    match = re.search(r"\bbleu (\d+(?:\.\d+)?)", text)
    assert match, f"no BLEU in decode output:\n{text[-2000:]}"
    bleu = float(match.group(1))
    # a 2-layer/128-dim model after 700 CPU steps: comfortably above this
    # floor on the unseen-template test set (chip run scores much higher)
    assert bleu >= 10.0, f"BLEU {bleu} below the 10.0 floor"


@pytest.mark.slow
def test_gate_fires_on_broken_length_penalty(deen_model, tmp_path):
    """expected_scores is regression-SENSITIVE, not just a smoke floor: the
    identical gate that passes with the recipe's beam settings aborts the
    run (nonzero exit + 'score regression') when the length penalty is
    broken — the failure class a memorized-template floor can't catch."""
    data, model_dir = deen_model
    import yaml
    common = ["--data-dir", data, "-o", model_dir, *ARCH_ARGS,
              "--only-validate", "--metrics", "bleu",
              "--beam-size", "2", "--max-output-len", "48",
              "--dataset-type", "debug", "--buffer-size", "3000",
              "--seed", "1"]

    # 1. healthy only-validate run: read the real validation BLEU
    healthy = run(["cli.train", *common])
    text = healthy.stdout + healthy.stderr
    match = re.search(r"valid \| valid\.de-en \|.*?bleu (\d+(?:\.\d+)?)", text)
    assert match, f"no valid bleu line:\n{text[-3000:]}"
    bleu = float(match.group(1))
    assert bleu >= 10.0, f"validation BLEU {bleu} too low to gate on"

    # 2. pin the floor just under the healthy score
    gate = str(tmp_path / "gate.yaml")
    with open(gate, "w") as f:
        yaml.safe_dump({"expected_scores": [
            {"corpus": "valid.de-en", "steps": 700,
             "metrics": {"bleu": round(bleu - 2.0, 2)}}]}, f)

    gated = run(["cli.train", *common, "--config", gate])
    assert "expected_scores OK" in gated.stdout + gated.stderr

    # 3. same gate, broken beam scoring: the run must ABORT
    broken = run(["cli.train", *common, "--config", gate,
                  "--len-penalty", "10"], check=False)
    btext = broken.stdout + broken.stderr
    assert broken.returncode != 0, \
        f"gate did not fire under --len-penalty 10:\n{btext[-3000:]}"
    assert "score regression" in btext, btext[-3000:]
