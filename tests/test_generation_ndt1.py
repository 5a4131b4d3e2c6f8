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


def test_generate_scan_matches_unrolled_reference():
    """The scanned fixed-buffer generate must equal a hand-unrolled loop of
    full forwards (deterministic mse head: no sampling rng in the way)."""
    from llm_bci_tpu.models.ndt1 import NDT1

    cfg = update_config(
        "configs/ndt1.yaml",
        {
            "encoder": {
                "masker": {"neuron": {"active": False, "mode": "random", "ratio": 0.2}},
                "context": {"forward": 0, "backward": -2},
                "smooth_and_noise": {"smooth_sd": None, "white_noise_sd": None, "constant_offset_sd": None, "noise": False},
                "embedder": {"n_channels": 6, "max_F": 40, "input_dim": 8,
                             "stack": {"active": False}, "dropout": 0.0},
                "transformer": {"n_layers": 1, "hidden_size": 8, "n_heads": 2,
                                "inter_size": 8, "dropout": 0.0},
            }
        },
    )
    model = NDT1.from_config(cfg, method_name="autoregressive", loss="mse")
    B, T, N, G = 2, 8, 6, 4
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
        batch["spikes_lengths"], max_new_bins=G, method="generate",
    )

    # Unrolled reference: grow the same fixed buffer with explicit forwards.
    buf = jnp.concatenate([batch["spikes"], jnp.zeros((B, G, N), jnp.float32)], 1)
    mask = jnp.concatenate([batch["spikes_mask"], jnp.zeros((B, G), jnp.int32)], 1)
    ts = jnp.concatenate(
        [batch["spikes_timestamp"],
         batch["spikes_timestamp"][:, -1:] + jnp.arange(1, G + 1)[None, :]], 1
    )
    ref = []
    for i in range(G):
        t_new = T + i

        def fwd(m, b, mk):
            x, _, _ = m.encoder(b, mk, ts, batch["spikes_lengths"], None, None, False)
            return m._decode(x)

        p = model.apply({"params": params}, buf, mask, method=fwd)
        new = p[:, t_new - 1, :]
        buf = buf.at[:, t_new, :].set(new)
        mask = mask.at[:, t_new].set(1)
        ref.append(new)
    ref = jnp.stack(ref, 1)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_generate_program_size_constant_in_max_new_bins():
    """One trace regardless of max_new_bins: the jaxpr must not inline one
    encoder copy per generated bin (round-2 weakness #5)."""
    model = build("autoregressive", context_forward=0)
    B, T, N = 1, 6, 6
    rng = np.random.default_rng(0)
    batch = {
        "spikes": jnp.asarray(rng.poisson(1.0, (B, T, N)).astype(np.float32)),
        "spikes_mask": jnp.ones((B, T), jnp.int32),
        "spikes_timestamp": jnp.tile(jnp.arange(T), (B, 1)),
        "spikes_lengths": jnp.full((B,), T, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]

    def size(g):
        jaxpr = jax.make_jaxpr(
            lambda p, s: model.apply(
                {"params": p},
                s, batch["spikes_mask"], batch["spikes_timestamp"],
                batch["spikes_lengths"], max_new_bins=g, method="generate",
                rngs={"sample": jax.random.PRNGKey(1)},
            )
        )(params, batch["spikes"])
        return len(str(jaxpr))

    s2, s8 = size(2), size(8)
    assert s8 < s2 * 1.2, f"program grew with max_new_bins: {s2} -> {s8}"


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
