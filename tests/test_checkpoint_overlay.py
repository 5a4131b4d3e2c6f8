"""Unit tests for the schema-tolerant checkpoint overlay (restore path)."""
import numpy as np

from llm_bci_tpu.training.checkpoint import _overlay


def test_overlay_keeps_live_value_on_shape_mismatch(capsys):
    """A (2,)-key threefry checkpoint restored into a (4,)-key rbg TrainState
    must keep the live rng (and warn), not graft a wrong-shaped leaf that
    crashes later at the first jax.random.split (round-2 advisor finding)."""
    target = {
        "rng": np.zeros((4,), dtype=np.uint32),
        "params": {"w": np.zeros((2, 2), dtype=np.float32)},
    }
    restored = {
        "rng": np.array([1, 2], dtype=np.uint32),
        "params": {"w": np.ones((2, 2), dtype=np.float64)},
    }
    out = _overlay(target, restored)
    # mismatched shape: live value kept
    np.testing.assert_array_equal(out["rng"], target["rng"])
    # matching shape: restored, dtype-cast to the live dtype
    np.testing.assert_array_equal(out["params"]["w"], np.ones((2, 2)))
    assert out["params"]["w"].dtype == np.float32
    assert "shapes differ" in capsys.readouterr().out


def test_overlay_keeps_live_value_on_missing_leaf(capsys):
    target = {"a": np.zeros(3), "b": np.arange(2)}
    out = _overlay(target, {"a": np.ones(3)})
    np.testing.assert_array_equal(out["a"], np.ones(3))
    np.testing.assert_array_equal(out["b"], np.arange(2))
    assert "predates" in capsys.readouterr().out


def test_manager_cache_survives_directory_recreation(tmp_path):
    """save → rmtree → fresh save to the same path (notebooks, parametrized
    tests): the per-directory CheckpointManager cache must notice the wiped
    directory and rebuild, instead of serving step bookkeeping for files
    that no longer exist."""
    import shutil

    from llm_bci_tpu.training.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    d = str(tmp_path / "run")
    state = {"w": np.arange(4, dtype=np.float32)}
    save_train_state(d, 2, state, wait=True)
    step, out = restore_train_state(d, state)
    assert step == 2

    shutil.rmtree(d)

    fresh = {"w": np.full(4, 7.0, dtype=np.float32)}
    save_train_state(d, 1, fresh, wait=True)
    step, out = restore_train_state(d, {"w": np.zeros(4, dtype=np.float32)})
    assert step == 1  # NOT the vanished step 2
    np.testing.assert_array_equal(out["w"], fresh["w"])
