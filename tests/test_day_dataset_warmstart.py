"""Day-homogeneous batching + the from_pt warm-start chain
(NDT1 pretrain → NDT1-CTC → BCI), reference SURVEY.md §5."""
import numpy as np
import pytest

from llm_bci_tpu.config import DictConfig
from llm_bci_tpu.data.datasets import DaySpecificSpikingDatasetForDecoding, pad_collate_fn


def day_rows(n=12, T=10, N=6, n_days=3, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "spikes": rng.poisson(1.0, size=(T, N)).astype(np.float32),
            "targets": rng.integers(1, 5, size=(3,)),
            "day_idx": np.asarray(i % n_days),
        }
        for i in range(n)
    ]


def test_day_dataset_batches_are_day_homogeneous():
    ds = DaySpecificSpikingDatasetForDecoding(day_rows(), batch_size=2, seed=0)
    assert len(ds) == 6  # 3 days × ceil(4/2)
    for i in range(len(ds)):
        batch = ds[i]
        days = {int(row["day_idx"]) for row in batch}
        assert len(days) == 1
        assert len(batch) <= 2


def test_day_dataset_collate_flattens():
    ds = DaySpecificSpikingDatasetForDecoding(day_rows(), batch_size=2, seed=0)
    pad = {"dim": 0, "side": "right", "value": 0, "truncate": 10, "min_length": 10}
    model_inputs, unused = pad_collate_fn(
        [ds[0], ds[1]],
        model_inputs=["spikes", "targets", "day_idx"],
        pad_dict={"spikes": pad},
    )
    assert model_inputs["spikes"].shape[0] == 4  # 2 dataset-batches of 2 flattened


def test_ndt1_warm_start_chain(tmp_path):
    """Pretrain NDT1-mlm → save → warm-start a second NDT1 via from_pt and
    check encoder params transferred (reference models/ndt1.py:468-476)."""
    from llm_bci_tpu.training import Trainer
    from test_trainer_ndt1 import base_config, synth_dataset
    import jax

    cfg = base_config(tmp_path)
    cfg["training"]["save_every"] = 2
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()
    ckpt = str(tmp_path / "ckpt" / "smoke" / "STEP2")

    cfg2 = base_config(tmp_path)
    cfg2["savestring"] = "warm"
    cfg2["model"]["encoder"]["from_pt"] = ckpt
    trainer2 = Trainer(cfg2, dataset=synth_dataset(seed=1))

    p1 = jax.device_get(trainer.state.params)["encoder"]
    p2 = jax.device_get(trainer2.state.params)["encoder"]
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_bci_loads_pretrained_ndt1(tmp_path):
    """BCI with load_ndt1_from_pt pulls the pretrained encoder weights
    (reference configs/trainer_bci.yaml:52)."""
    import jax
    from llm_bci_tpu.training import Trainer
    from test_trainer_ndt1 import base_config, synth_dataset
    from test_bci import bci_config, synth_bci_dataset

    # 1. pretrain a tiny NDT1 whose encoder matches the BCI's ndt1 config
    cfg = base_config(tmp_path)
    cfg["model"]["encoder"]["embedder"].update({"n_channels": 8, "max_F": 16, "input_dim": 12})
    cfg["model"]["encoder"]["transformer"].update({"n_layers": 2, "hidden_size": 16, "n_heads": 2, "inter_size": 32})
    cfg["model"]["encoder"]["smooth_and_noise"] = {
        "smooth_sd": 1, "white_noise_sd": 0.1, "constant_offset_sd": None, "noise": True,
    }
    cfg["model"]["encoder"]["embedder"]["dropout"] = 0.1
    cfg["model"]["encoder"]["transformer"]["dropout"] = 0.1
    cfg["training"]["save_every"] = 2
    trainer = Trainer(cfg, dataset=synth_dataset(T=16, N=8))
    trainer.train()
    ckpt = str(tmp_path / "ckpt" / "smoke" / "STEP2")

    # 2. BCI with the same encoder arch, warm-started
    cfg2 = bci_config(tmp_path)
    cfg2["model"]["ndt1"]["encoder"]["masker"] = {"neuron": {"active": True, "mode": "random", "ratio": 0.3}}
    cfg2["model"]["ndt1"]["encoder"]["embedder"]["stack"] = {"active": False}
    cfg2["method"]["model_kwargs"]["load_ndt1_from_pt"] = ckpt
    trainer2 = Trainer(cfg2, dataset=synth_bci_dataset())

    enc_pre = jax.device_get(trainer.state.params)["encoder"]
    enc_bci = jax.device_get(trainer2.state.params)["ndt1_encoder"]
    a = jax.tree_util.tree_leaves(enc_pre)
    b = jax.tree_util.tree_leaves(enc_bci)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)
