"""Checkpoint IO tests: save/load, resume priority, averaging, GC."""

import os

import numpy as np
import pytest

from pasero_tpu import checkpoints as ckpt


def params():
    return {"encoder": {"w": np.ones((4, 4), np.float32)},
            "decoder": {"b": np.zeros(3, np.float32)}}


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path)
    path = ckpt.save_checkpoint(d, 100, params(),
                                extra={"metrics": {"x": 1}})
    assert os.path.exists(os.path.join(d, "model_100.npz"))
    assert os.path.realpath(os.path.join(d, "model_last.npz")) == \
        os.path.realpath(path)
    loaded, missing, unexpected = ckpt.load_params(path, params())
    assert not missing and not unexpected
    np.testing.assert_array_equal(loaded["encoder"]["w"],
                                  params()["encoder"]["w"])
    assert ckpt.load_state(d, 100)["metrics"] == {"x": 1}


def test_resume_priority(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, 10, params())
    assert ckpt.find_checkpoint_to_load(d).endswith("model_last.npz")
    # model_latest (interrupt save) wins over model_last
    ckpt.save_checkpoint(d, 11, params(), name="model_latest",
                         update_last=False)
    assert ckpt.find_checkpoint_to_load(d).endswith("model_latest.npz")
    # --reset ignores both; explicit ckpt is used
    ckpt.save_checkpoint(d, 5, params(), name="model_5", update_last=False)
    path = ckpt.find_checkpoint_to_load(d, ckpt="model_5.npz", reset=True)
    assert path.endswith("model_5.npz")
    with pytest.raises(FileNotFoundError):
        ckpt.find_checkpoint_to_load(d, ckpt="nope.npz", reset=True)


def test_flexible_and_reset_regex(tmp_path):
    d = str(tmp_path)
    path = ckpt.save_checkpoint(d, 1, params())
    target = {"encoder": {"w": np.zeros((4, 4), np.float32)},
              "decoder": {"b": np.zeros(3, np.float32)},
              "extra": {"n": np.zeros(2, np.float32)}}
    with pytest.raises(ValueError):
        ckpt.load_params(path, target)  # missing 'extra'
    loaded, missing, _ = ckpt.load_params(path, target, flexible=True)
    assert missing == ["extra/n"]
    np.testing.assert_array_equal(loaded["extra"]["n"], np.zeros(2))
    # reset_params_regex drops matching checkpoint entries (kept at init)
    loaded, *_ = ckpt.load_params(path, params(),
                                  reset_params_regex=r"encoder")
    np.testing.assert_array_equal(loaded["encoder"]["w"], np.ones((4, 4)))


def test_averaging(tmp_path):
    d = str(tmp_path)
    p1 = {"w": np.full((2, 2), 1.0, np.float32)}
    p2 = {"w": np.full((2, 2), 3.0, np.float32)}
    a = ckpt.save_checkpoint(d, 1, p1, update_last=False)
    b = ckpt.save_checkpoint(d, 2, p2, update_last=False)
    avg = ckpt.average_checkpoints([a, b])
    np.testing.assert_allclose(avg["w"], np.full((2, 2), 2.0))


def test_cleanup_keeps_policy(tmp_path):
    d = str(tmp_path)
    for step in (10, 20, 30, 40, 50):
        ckpt.save_checkpoint(d, step, params())
    ckpt.mark_best(d, 20)
    ckpt.cleanup_checkpoints(d, keep_last=1, keep_interval=40, best_step=20)
    remaining = sorted(f for f in os.listdir(d)
                       if f.startswith("model_") and "last" not in f
                       and "best" not in f)
    # keeps: 50 (last), 40 (interval), 20 (best)
    assert remaining == ["model_20.npz", "model_40.npz", "model_50.npz"]


def test_latest_carries_full_train_state(tmp_path):
    """model_latest (interrupt save) must carry optimizer + step so a
    SLURM-requeued run resumes where it stopped, and must be deletable after
    resume so it never shadows newer model_last (cli/train.py:438)."""
    d = str(tmp_path)
    opt_flat = {"m": np.full(3, 0.5, np.float32)}
    ckpt.save_checkpoint(d, 37, params(), opt_state_flat=opt_flat,
                         extra={"metrics": {"loss": 1.5}},
                         name="model_latest", update_last=False)
    path = ckpt.find_checkpoint_to_load(d)
    assert path.endswith("model_latest.npz")
    # step resolves through state_latest.json
    assert ckpt.checkpoint_step(d, path) == 37
    # optimizer reachable under the 'latest' tag
    loaded_opt = ckpt.load_optimizer_flat(d, "latest")
    np.testing.assert_array_equal(loaded_opt["m"], opt_flat["m"])
    assert ckpt.load_state(d, "latest")["metrics"] == {"loss": 1.5}
    # after resume, discard_latest removes every latest-tagged file
    ckpt.discard_latest(d)
    assert ckpt.find_checkpoint_to_load(d) is None
    assert not os.path.exists(os.path.join(d, "optimizer_latest.npz"))
    assert not os.path.exists(os.path.join(d, "state_latest.json"))


def test_optimizer_tree_roundtrip():
    import optax
    tx = optax.adam(1e-3)
    state = tx.init({"w": np.ones(3, np.float32)})
    flat = ckpt.flatten_tree(state)
    restored = ckpt.restore_tree(state, flat)
    assert restored is not None
    assert ckpt.restore_tree(state, {}) is None  # mismatch -> None


def test_async_checkpointer_and_atomic_save(tmp_path):
    from pasero_tpu.checkpoints import (AsyncCheckpointer, load_flat,
                                        save_checkpoint)
    import numpy as np
    params = {"layer": {"w": np.ones((4, 4), np.float32)}}
    ck = AsyncCheckpointer()
    ck.submit(save_checkpoint, str(tmp_path), 10, params)
    ck.wait()
    flat = load_flat(str(tmp_path / "model_10.npz"))
    assert any("w" in k for k in flat)
    assert not list(tmp_path.glob("*.tmp")), "tmp files must be renamed away"

    # errors surface on the next wait, not silently
    def boom():
        raise RuntimeError("disk full")
    ck.submit(boom)
    import pytest
    with pytest.raises(RuntimeError, match="disk full"):
        ck.wait()
