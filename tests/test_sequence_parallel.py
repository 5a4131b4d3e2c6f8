"""Sequence parallelism (the ``sp`` mesh axis).

The trainer shards the TIME dimension of the spike tensors over ``sp``
(``parallelism.sp`` / ``parallelism.sp_keys``); GSPMD propagates the layout
through the NDT1 encoder and inserts the attention K/V all-gathers. These
tests run on the 8-virtual-CPU mesh from conftest and assert the sp runs are
numerically the runs a pure-data-parallel mesh produces — sharding must not
change semantics (SURVEY §5: sequence-sharding the time axis on the mesh).
"""
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from test_trainer_ndt1 import base_config, synth_dataset


def _train(tmp_path, tag, parallelism, seed=0, max_steps=4):
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path / tag)
    cfg["savestring"] = tag
    cfg["parallelism"] = parallelism
    cfg["seed"] = seed
    cfg["training"]["max_steps"] = max_steps
    cfg["training"]["num_epochs"] = 2  # 16 rows / batch 8 → 2 steps per epoch

    losses: list = []

    def loss_probe(model, model_inputs, unused_inputs, outputs, **kw):
        val = float(np.asarray(outputs["loss"]))
        losses.append(val)
        return val

    trainer = Trainer(
        cfg, dataset=synth_dataset(), metric_fns={"loss_probe": loss_probe}
    )
    trainer.train()
    return trainer, losses


def test_sp_matches_data_parallel_trajectory(tmp_path):
    """(data=2, fsdp=2, sp=2) trains through the same loss trajectory as
    (data=8).

    Same seed, same data order, counter-based PRNG → every stochastic draw
    (masker, noise, dropout) is placement-invariant, so per-step train
    losses must agree up to reduction-order float noise. (Params after
    AdamW are NOT comparable: leaves with near-zero grads get ±lr
    sign-noise first-step updates. Eval losses are useless here too — the
    masker is inactive at eval, so the mlm eval loss is exactly 0.)"""
    _, losses_dp = _train(tmp_path, "dp", {"data": -1, "fsdp": 1})
    trainer_sp, losses_sp = _train(
        tmp_path, "sp", {"data": 2, "fsdp": 2, "sp": 2, "fsdp_min_size": 64}
    )
    assert trainer_sp.mesh.shape["sp"] == 2
    assert len(losses_dp) == len(losses_sp) == 4
    assert all(np.isfinite(losses_sp))
    np.testing.assert_allclose(losses_dp, losses_sp, rtol=1e-3)


def test_sp_shards_time_dim_of_spike_keys(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["parallelism"] = {"data": 2, "fsdp": 1, "sp": 4}
    trainer = Trainer(cfg, dataset=synth_dataset())

    batch = {
        "spikes": np.zeros((8, 20, 12), np.float32),
        "spikes_mask": np.ones((8, 20), np.int32),
        "spikes_timestamp": np.tile(np.arange(20, dtype=np.int32), (8, 1)),
        "spikes_lengths": np.full((8,), 20, np.int32),
    }
    dev = trainer._put_batch(batch)
    assert dev["spikes"].sharding.spec == P("data", "sp")
    assert dev["spikes_mask"].sharding.spec == P("data", "sp")
    # Non-time keys stay batch-only sharded.
    assert dev["spikes_lengths"].sharding.spec == P("data")

    # The Pallas batch-parallel kernels are gated off while sp is active.
    from llm_bci_tpu.ops.spmd import sequence_sharded

    assert sequence_sharded()
    from llm_bci_tpu.ops.spmd import set_op_mesh

    set_op_mesh(None)
    assert not sequence_sharded()


def test_sp_time_dim_indivisible_falls_back(tmp_path):
    """T not divisible by sp → the key quietly keeps plain batch sharding."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["parallelism"] = {"data": 2, "fsdp": 1, "sp": 4}
    trainer = Trainer(cfg, dataset=synth_dataset())
    dev = trainer._put_batch({"spikes": np.zeros((8, 19, 12), np.float32)})
    assert dev["spikes"].sharding.spec == P("data")
    from llm_bci_tpu.ops.spmd import set_op_mesh

    set_op_mesh(None)


def _ctc_config(tmp_path, parallelism, seed=0):
    cfg = base_config(tmp_path)
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["model_kwargs"] = {
        "method_name": "ctc", "vocab_size": 7, "blank_id": 0, "zero_infinity": True,
    }
    cfg["model"]["encoder"]["masker"]["neuron"]["active"] = False
    cfg["model"]["encoder"]["embedder"]["stack"] = {
        "active": True, "size": 4, "stride": 2,
    }
    cfg["method"]["dataset_kwargs"] = {"targets_name": "targets"}
    pad = {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None}
    cfg["method"]["dataloader_kwargs"]["pad_dict"].update(
        {"targets": dict(pad), "targets_mask": dict(pad)}
    )
    for spec in cfg["method"]["dataloader_kwargs"]["pad_dict"].values():
        spec["side"] = "right"
    cfg["parallelism"] = parallelism
    cfg["seed"] = seed
    return cfg


def test_sp_ctc_matches_data_parallel(tmp_path):
    """CTC under sp: the stacking conv runs on a time-sharded input and the
    loss gathers the (B, T', V) log-probs over sp (the lattice recursion is
    sequential over full T' — ops/ctc.py documents why the Pallas dispatch
    is deliberately NOT sp-gated). Losses must match the dp-only run."""
    from llm_bci_tpu.training import Trainer

    def run(tag, parallelism):
        losses = []

        def probe(model, mi, ui, outputs, **kw):
            val = float(np.asarray(outputs["loss"]))
            losses.append(val)
            return val

        cfg = _ctc_config(tmp_path / tag, parallelism)
        cfg["savestring"] = tag
        trainer = Trainer(
            cfg,
            dataset=synth_dataset(with_targets=True),
            metric_fns={"probe": probe},
        )
        trainer.train()
        return losses

    losses_dp = run("ctc_dp", {"data": -1, "fsdp": 1})
    losses_sp = run("ctc_sp", {"data": 2, "fsdp": 1, "sp": 4})
    assert len(losses_sp) == len(losses_dp) > 0
    assert all(np.isfinite(losses_sp))
    np.testing.assert_allclose(losses_dp, losses_sp, rtol=1e-3)

    from llm_bci_tpu.ops.spmd import set_op_mesh

    set_op_mesh(None)


def test_make_mesh_sp_axis_validation():
    from llm_bci_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(-1, 2, 1, 2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "sp": 2, "tp": 1}
    with pytest.raises(ValueError):
        make_mesh(2, 2, 2, 2)  # 16 != 8 devices
