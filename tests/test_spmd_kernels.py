"""Batch shard_map wrapping of the Pallas kernels on multi-device meshes.

``pallas_call`` is a custom call GSPMD cannot partition; on a multi-device
mesh the flash-attention and CTC kernels must run under ``jax.shard_map``
over the ``data`` axis (``llm_bci_tpu/ops/spmd.py``). Validated here in
interpret mode on the virtual CPU mesh: the wrapped kernels must agree
exactly with the unwrapped single-device path (values and grads), dropout
keep-masks must decorrelate across shards, and non-divisible batches must
fail loudly (flash) or fall back to the partitionable XLA path (CTC).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.ops import ctc as ctc_mod
from llm_bci_tpu.ops import ctc_pallas, flash_attention, spmd
from llm_bci_tpu.parallel.mesh import make_mesh


@pytest.fixture
def mesh8():
    mesh = make_mesh(data=4, fsdp=2, tp=1)
    flash_attention.set_interpret_mode(True)
    ctc_pallas.set_interpret_mode(True)
    yield mesh
    spmd.set_op_mesh(None)
    flash_attention.set_interpret_mode(False)
    ctc_pallas.set_interpret_mode(False)


def _qkv(B=8, T=32, H=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    lengths = rng.integers(T // 2, T + 1, size=(B,))
    key_valid = jnp.asarray(
        (np.arange(T)[None, :] < lengths[:, None]).astype(np.int32)
    )
    return q, k, v, key_valid


def test_flash_shard_map_matches_local(mesh8):
    q, k, v, key_valid = _qkv()

    spmd.set_op_mesh(None)
    ref = flash_attention.banded_flash_attention(
        q, k, v, key_valid, context_forward=4, context_backward=8
    )

    spmd.set_op_mesh(mesh8)
    out = flash_attention.banded_flash_attention(
        q, k, v, key_valid, context_forward=4, context_backward=8
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    # grads agree too (the custom VJP recompute runs inside each shard)
    def loss(fn_mesh, qq):
        spmd.set_op_mesh(fn_mesh)
        return (
            flash_attention.banded_flash_attention(
                qq, k, v, key_valid, context_forward=4, context_backward=8
            )
            ** 2
        ).sum()

    g_ref = jax.grad(lambda qq: loss(None, qq))(q)
    g_out = jax.grad(lambda qq: loss(mesh8, qq))(q)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=1e-5)


def test_flash_shard_map_dropout_decorrelates(mesh8):
    q, k, v, key_valid = _qkv()
    rng = jax.random.PRNGKey(3)

    spmd.set_op_mesh(None)
    local = flash_attention.banded_flash_attention(
        q, k, v, key_valid, dropout_rate=0.5, dropout_rng=rng
    )
    spmd.set_op_mesh(mesh8)
    sharded = flash_attention.banded_flash_attention(
        q, k, v, key_valid, dropout_rate=0.5, dropout_rng=rng
    )
    assert np.isfinite(np.asarray(sharded)).all()
    # each shard folds its data index into the rng: the keep-masks are NOT
    # the local path's masks (which would repeat counters across shards)
    assert not np.allclose(np.asarray(sharded), np.asarray(local))


def test_flash_shard_map_odd_batch_raises(mesh8):
    q, k, v, key_valid = _qkv(B=6)   # 6 % 4 != 0
    spmd.set_op_mesh(mesh8)
    with pytest.raises(ValueError, match="divisible by the data axis"):
        flash_attention.banded_flash_attention(q, k, v, key_valid)


def _ctc_batch(B=8, T=12, V=5, S=3, seed=1):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    log_probs = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
    targets = jnp.asarray(rng.integers(1, V, size=(B, S)).astype(np.int32))
    input_lengths = jnp.asarray(rng.integers(S * 2 + 1, T + 1, size=(B,)).astype(np.int32))
    target_lengths = jnp.asarray(np.full((B,), S, np.int32))
    return log_probs, targets, input_lengths, target_lengths


def test_ctc_shard_map_matches_local(mesh8):
    args = _ctc_batch()

    spmd.set_op_mesh(None)
    ref = ctc_mod.ctc_loss(*args, impl="pallas")

    spmd.set_op_mesh(mesh8)
    out = ctc_mod.ctc_loss(*args, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def loss(fn_mesh, lp):
        spmd.set_op_mesh(fn_mesh)
        return ctc_mod.ctc_loss(lp, *args[1:], impl="pallas").sum()

    g_ref = jax.grad(lambda lp: loss(None, lp))(args[0])
    g_out = jax.grad(lambda lp: loss(mesh8, lp))(args[0])
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=1e-5)


def test_ctc_shard_map_odd_batch_falls_back_to_xla(mesh8):
    args = _ctc_batch(B=6)            # 6 % 4 != 0
    spmd.set_op_mesh(mesh8)
    out = ctc_mod.ctc_loss(*args, impl="pallas")   # falls through, no raise
    spmd.set_op_mesh(None)
    ref = ctc_mod.ctc_loss(*args, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_ndt1_flash_ragged_batch_falls_back_to_xla(mesh8):
    """A ragged eval tail batch (B not divisible by the data axis) on a
    multi-device mesh must route NDT1 attention to the XLA path instead of
    tripping the flash shard_map divisibility error."""
    from llm_bci_tpu.config import update_config
    from llm_bci_tpu.models.ndt1 import NDT1

    cfg = update_config(
        "configs/ndt1.yaml",
        {
            "encoder": {
                "masker": {"neuron": {"active": True, "mode": "random", "ratio": 0.2}},
                "context": {"forward": -2, "backward": -2},
                "smooth_and_noise": {
                    "smooth_sd": None, "white_noise_sd": None,
                    "constant_offset_sd": None, "noise": False,
                },
                "embedder": {
                    "n_channels": 6, "max_F": 40, "input_dim": 8,
                    "stack": {"active": False}, "dropout": 0.0,
                },
                "transformer": {
                    "n_layers": 1, "hidden_size": 8, "n_heads": 2,
                    "inter_size": 8, "dropout": 0.0,
                    "flash_attention": True,   # force-on, not auto
                },
            }
        },
    )
    model = NDT1.from_config(cfg, method_name="mlm", loss="poisson_nll", log_input=True)
    B, T, N = 6, 8, 6                 # 6 % 4 != 0 on the (4, 2) mesh
    rng = np.random.default_rng(0)
    batch = {
        "spikes": jnp.asarray(rng.poisson(1.0, (B, T, N)).astype(np.float32)),
        "spikes_mask": jnp.ones((B, T), jnp.int32),
        "spikes_timestamp": jnp.tile(jnp.arange(T), (B, 1)),
        "spikes_lengths": jnp.full((B,), T, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]

    spmd.set_op_mesh(mesh8)
    out = model.apply({"params": params}, **batch, training=False)
    assert np.isfinite(np.asarray(out.loss))

    # and it equals the single-device (XLA-attention) result exactly
    spmd.set_op_mesh(None)
    ref = model.apply({"params": params}, **batch, training=False)
    np.testing.assert_allclose(
        np.asarray(out.loss), np.asarray(ref.loss), rtol=1e-6
    )


def test_trainer_assigns_op_mesh(tmp_path):
    """Trainer construction assigns the active mesh for the op wrappers."""
    from tests.test_trainer_ndt1 import base_config, synth_dataset
    from llm_bci_tpu.training import Trainer

    spmd.set_op_mesh(None)
    trainer = Trainer(base_config(tmp_path), dataset=synth_dataset())
    assert spmd.op_mesh() is trainer.mesh
    spmd.set_op_mesh(None)
