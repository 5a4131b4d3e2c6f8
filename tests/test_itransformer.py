"""iTransformer methods (mlm / stat / dyn behaviour / ctc) through the Trainer."""
import numpy as np
import pytest

from llm_bci_tpu.config import DictConfig


def synth_ibl_dataset(n_train=16, n_test=8, T=12, N=10, seed=0):
    rng = np.random.default_rng(seed)
    regions = np.array(["CA1", "PO", "LP", "DG", "VISa"])

    def make(n):
        rows = []
        for i in range(n):
            reg = regions[rng.integers(0, len(regions), size=N)]
            rows.append(
                {
                    "spikes": rng.poisson(1.0, size=(T, N)).astype(np.float32),
                    "neuron_regions": reg.tolist(),
                    "neuron_depths": rng.uniform(0, 1, size=N).astype(np.float32),
                    "choice": np.atleast_1d(float(rng.integers(0, 2))),
                    "wheel": rng.normal(size=(T,)).astype(np.float32),
                }
            )
        return rows

    return {"train": make(n_train), "test": make(n_test)}


def it_config(tmp_path, method="mlm", **mk):
    pad = lambda: {"dim": 0, "side": "left", "value": 0, "truncate": 12, "min_length": 12}
    return DictConfig(
        {
            "savestring": "it_smoke",
            "verbosity": 3,
            "dirs": {"checkpoint_dir": str(tmp_path / "ckpt"), "log_dir": None},
            "training": {
                "num_epochs": 1, "train_batch_size": 8, "test_batch_size": 8, "max_steps": 2,
            },
            "model": {
                "model_class": "iTransformer",
                "masker": {
                    "main": {
                        "force_active": True, "mode": "neuron", "ratio": 0.2,
                        "zero_ratio": 1.0, "random_ratio": 1.0,
                    }
                },
                "encoder": {
                    "embedder": {"mode": "mlp", "max_n_bins": 12, "dropout": 0.1},
                    "hidden_size": 24, "n_heads": 2, "n_layers": 2,
                    "max_n_channels": 32, "embed_region": True, "embed_depth": True,
                    "regions": ["CA1", "PO", "LP", "DG", "VISa"],
                    "dropout": 0.1,
                },
                "decoder": {"mlp_decoder": True, "use_cls": True},
            },
            "data": {"dataset_class": "base"},
            "method": {
                "model_kwargs": {"method_name": method, **mk},
                "dataset_kwargs": {},
                "dataloader_kwargs": {
                    "pad_dict": {
                        "spikes": pad(), "spikes_mask": pad(), "spikes_timestamp": pad(),
                    }
                },
            },
            "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.3},
            "parallelism": {"data": -1, "fsdp": 1},
        }
    )


def _prep(dataset, regions):
    from llm_bci_tpu.models.itransformer import region_names_to_idx

    for rows in dataset.values():
        region_names_to_idx(rows, regions)
    return dataset


REGIONS = ["CA1", "PO", "LP", "DG", "VISa"]


def test_itransformer_mlm(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = it_config(tmp_path, "mlm", loss="poisson_nll", log_input=True)
    trainer = Trainer(cfg, dataset=_prep(synth_ibl_dataset(), REGIONS))
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss) and loss > 0


def test_itransformer_stat_behaviour(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = it_config(tmp_path, "stat_behaviour", loss="xent", n_labels=2)
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["dataset_kwargs"] = {"targets_name": "choice"}
    trainer = Trainer(cfg, dataset=_prep(synth_ibl_dataset(), REGIONS))
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss) and loss > 0


def test_itransformer_dyn_behaviour(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = it_config(tmp_path, "dyn_behaviour")
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["dataset_kwargs"] = {"targets_name": "wheel"}
    cfg["method"]["dataloader_kwargs"]["pad_dict"]["targets"] = {
        "dim": 0, "side": "left", "value": 0, "truncate": 12, "min_length": 12,
    }
    trainer = Trainer(cfg, dataset=_prep(synth_ibl_dataset(), REGIONS))
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)


def test_itransformer_ctc(tmp_path):
    from llm_bci_tpu.training import Trainer

    ds = _prep(synth_ibl_dataset(), REGIONS)
    rng = np.random.default_rng(1)
    for rows in ds.values():
        for row in rows:
            row["phonemes_idx"] = rng.integers(1, 7, size=(int(rng.integers(2, 5)),))
    cfg = it_config(tmp_path, "ctc", vocab_size=7, blank_id=0, zero_infinity=True)
    cfg["model"]["masker"]["main"]["force_active"] = False
    cfg["model"]["masker"]["main"]["active"] = False
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["dataset_kwargs"] = {"targets_name": "phonemes_idx"}
    cfg["method"]["dataloader_kwargs"]["pad_dict"]["targets"] = {
        "dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None,
    }
    trainer = Trainer(cfg, dataset=ds)
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)


def test_itransformer_region_masking_modes(tmp_path):
    """inter-/intra-region masking produce masks confined to the right
    channels (reference masker-copy semantics)."""
    import jax
    import jax.numpy as jnp

    from llm_bci_tpu.models.masker import MaskerConfig, apply_masker

    B, T, N = 2, 6, 10
    rng = np.random.default_rng(0)
    spikes = jnp.asarray(rng.poisson(1.0, size=(B, T, N)).astype(np.float32))
    regions_idx = jnp.asarray(rng.integers(0, 3, size=(B, N)))

    cfg = MaskerConfig(mode="inter-region", ratio=1.0, mask_region_ids=(1,), n_mask_regions=1)
    _, mask = apply_masker(cfg, spikes, jax.random.PRNGKey(0), True, regions_idx)
    mask = np.asarray(mask)
    sel = np.asarray(regions_idx) == 1
    assert (mask[:, 0, :][~sel] == 0).all()
    assert (mask[:, 0, :][sel] == 1).all()

    cfg = MaskerConfig(mode="intra-region", ratio=0.0, target_region_ids=(2,), n_mask_regions=1)
    _, tmask = apply_masker(cfg, spikes, jax.random.PRNGKey(0), True, regions_idx)
    tmask = np.asarray(tmask)
    sel2 = np.asarray(regions_idx) == 2
    # targets restricted to the target region
    assert (tmask[:, 0, :][~sel2] == 0).all()
