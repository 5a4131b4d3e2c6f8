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
