"""NDT1 spike-bin generation (autoregressive + mlm)."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_bci_tpu.config import update_config
from llm_bci_tpu.models.ndt1 import NDT1


def build(method, context_forward):
    cfg = update_config(
        "configs/ndt1.yaml",
        {
            "encoder": {
                "masker": {"neuron": {"active": method == "mlm", "mode": "random", "ratio": 0.2}},
                "context": {"forward": context_forward, "backward": -2},
                "smooth_and_noise": {"smooth_sd": None, "white_noise_sd": None, "constant_offset_sd": None, "noise": False},
                "embedder": {
                    "n_channels": 6, "max_F": 40, "input_dim": 8,
                    "stack": {"active": False}, "dropout": 0.0,
                },
                "transformer": {
                    "n_layers": 1, "hidden_size": 8, "n_heads": 2, "inter_size": 8, "dropout": 0.0,
                },
            }
        },
    )
    return NDT1.from_config(cfg, method_name=method, loss="poisson_nll", log_input=True)


def test_generate_autoregressive():
    model = build("autoregressive", context_forward=0)
    B, T, N = 2, 8, 6
    rng = np.random.default_rng(0)
    batch = {
        "spikes": jnp.asarray(rng.poisson(1.0, (B, T, N)).astype(np.float32)),
        "spikes_mask": jnp.ones((B, T), jnp.int32),
        "spikes_timestamp": jnp.tile(jnp.arange(T), (B, 1)),
        "spikes_lengths": jnp.full((B,), T, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]
    preds, bins = model.apply(
        {"params": params},
        batch["spikes"], batch["spikes_mask"], batch["spikes_timestamp"],
        batch["spikes_lengths"],
        max_new_bins=4,
        method="generate",
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    assert preds.shape == (B, 4, N) and bins.shape == (B, 4, N)
    assert np.all(np.asarray(preds) >= 0)        # rates are positive
    assert np.all(np.asarray(bins) >= 0)         # Poisson samples
    assert np.all(np.asarray(bins) == np.round(np.asarray(bins)))


def test_generate_mlm():
    model = build("mlm", context_forward=-2)
    B, T, N = 1, 6, 6
    rng = np.random.default_rng(0)
    batch = {
        "spikes": jnp.asarray(rng.poisson(1.0, (B, T, N)).astype(np.float32)),
        "spikes_mask": jnp.ones((B, T), jnp.int32),
        "spikes_timestamp": jnp.tile(jnp.arange(T), (B, 1)),
        "spikes_lengths": jnp.full((B,), T, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]
    preds, bins = model.apply(
        {"params": params},
        batch["spikes"], batch["spikes_mask"], batch["spikes_timestamp"],
        batch["spikes_lengths"],
        max_new_bins=3,
        method="generate",
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    assert preds.shape == (B, 3, N)
    assert np.isfinite(np.asarray(preds)).all()
