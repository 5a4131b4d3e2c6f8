"""Config-branch coverage: IBL loader on a real HF dataset fixture; NDT1
RoPE / adapt / day+block tokens / factors projection branches."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_bci_tpu.config import update_config


def test_load_ibl_dataset_roundtrip(tmp_path):
    """Build an HF dataset with the IBL sparse-spike schema and load it
    (reference data_utils/ibl_dataset.py:30-83)."""
    datasets = pytest.importorskip("datasets")
    from scipy.sparse import csr_array

    from llm_bci_tpu.data.ibl import load_ibl_dataset

    rng = np.random.default_rng(0)
    T, N, n_trials = 12, 6, 10
    dense = rng.poisson(0.5, size=(n_trials, T, N)).astype(np.float32)
    cols = {
        "spikes_sparse_data": [], "spikes_sparse_indices": [],
        "spikes_sparse_indptr": [], "spikes_sparse_shape": [],
        "cluster_uuids": [], "cluster_regions": [], "cluster_depths": [],
        "choice": [], "wheel": [],
    }
    for i in range(n_trials):
        sp = csr_array(dense[i])
        cols["spikes_sparse_data"].append(sp.data.tolist())
        cols["spikes_sparse_indices"].append(sp.indices.tolist())
        cols["spikes_sparse_indptr"].append(sp.indptr.tolist())
        cols["spikes_sparse_shape"].append([T, N])
        cols["cluster_uuids"].append([f"u{j}" for j in range(N)])
        cols["cluster_regions"].append(["CA1", "PO", "LP"][i % 3:] [:1] * N)
        cols["cluster_depths"].append(rng.uniform(0, 1, N).tolist())
        cols["choice"].append([float(rng.integers(0, 2))])
        cols["wheel"].append(rng.normal(size=T).tolist())
    ds = datasets.Dataset.from_dict(cols)
    ds.save_to_disk(str(tmp_path / "eid1"))

    out = load_ibl_dataset(
        str(tmp_path), "eid1", test_size=0.3, seed=1,
        static_behaviours=["choice"], dynamic_behaviours=["wheel"],
        norm_behaviours=True,
    )
    assert set(out) == {"train", "test"}
    row = out["train"][0]
    assert row["spikes"].shape == (T, N)
    assert len(row["neuron_regions"]) == N
    assert row["choice"].shape == (1,)
    assert row["wheel"].shape == (T,)
    # spikes reconstructed exactly from the sparse encoding
    total = sum(r["spikes"].sum() for rows in out.values() for r in rows)
    np.testing.assert_allclose(total, dense.sum(), rtol=1e-6)
    # normalized dynamic behaviour ~ zero mean
    wheels = np.concatenate([r["wheel"] for rows in out.values() for r in rows])
    assert abs(wheels.mean()) < 1e-5


def _ndt1(overrides, **mk):
    from llm_bci_tpu.models.ndt1 import NDT1

    cfg = update_config(
        "configs/ndt1.yaml",
        {
            "encoder": update_config(
                {
                    "masker": {"neuron": {"active": True, "mode": "random", "ratio": 0.2}},
                    "smooth_and_noise": {"smooth_sd": None, "noise": False,
                                         "white_noise_sd": None, "constant_offset_sd": None},
                    "embedder": {
                        "n_channels": 8, "max_F": 12, "input_dim": 8,
                        "n_days": 3, "n_blocks": 2,
                        "stack": {"active": False}, "dropout": 0.0,
                    },
                    "transformer": {"n_layers": 1, "hidden_size": 8, "n_heads": 2,
                                    "inter_size": 8, "dropout": 0.0},
                },
                overrides,
            )
        },
    )
    return NDT1.from_config(cfg, method_name="mlm", loss="poisson_nll",
                            log_input=True, **mk)


def _batch(B=2, T=12, N=8):
    rng = np.random.default_rng(0)
    return {
        "spikes": jnp.asarray(rng.poisson(1.0, (B, T, N)).astype(np.float32)),
        "spikes_mask": jnp.ones((B, T), jnp.int32),
        "spikes_timestamp": jnp.tile(jnp.arange(T), (B, 1)),
        "spikes_lengths": jnp.full((B,), T, jnp.int32),
        "day_idx": jnp.asarray([0, 2]),
        "block_idx": jnp.asarray([1, 0]),
    }


def _run(model, batch):
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]
    out = model.apply(
        {"params": params}, **batch, training=True,
        rngs={"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2),
              "mask": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(out.loss))
    return params, out


def test_ndt1_rope():
    model = _ndt1({"transformer": {"use_rope": True}})
    _run(model, _batch())


def test_ndt1_adapt_per_day_embedding():
    model = _ndt1({"embedder": {"adapt": True}})
    params, _ = _run(model, _batch())
    assert params["encoder"]["embedder"]["embed_spikes_days"].shape == (3, 8, 8)
    # per-day einsum == per-example Linear with that day's weights
    batch = _batch()
    w = params["encoder"]["embedder"]["embed_spikes_days"]
    b = params["encoder"]["embedder"]["embed_spikes_days_bias"]
    x0 = np.asarray(batch["spikes"][0]) @ np.asarray(w[0]) + np.asarray(b[0])
    x1 = np.asarray(batch["spikes"][1]) @ np.asarray(w[2]) + np.asarray(b[2])
    assert x0.shape == (12, 8) and x1.shape == (12, 8)


def test_ndt1_day_block_tokens():
    model = _ndt1({"embedder": {"day_token": True, "block_token": True}})
    _run(model, _batch())


def test_ndt1_factors_projection():
    model = _ndt1({"factors": {"active": True, "size": 6, "fixup_init": True}})
    params, out = _run(model, _batch())
    assert params["encoder"]["out_proj"]["proj"]["kernel"].shape == (8, 6)
    # decoder consumes the factor space
    assert params["decoder"]["kernel"].shape == (6, 8)


def test_ndt1_temporal_masker_expansion():
    model = _ndt1({"masker": {"neuron": {
        "active": True, "mode": "temporal", "ratio": 0.3,
        "expand_prob": 1.0, "max_timespan": 3,
    }}})
    _run(model, _batch())
