"""Benchmark: flagship training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default workload = the reference's headline recipe
(configs/trainer_ctc_ndt1.yaml: 5 layers / 1024 hidden, stack 32 stride 4,
batch 64) on synthetic speechbci-shaped data (T=512 bins, 256 channels,
41-token phoneme vocab). ``--workload bci`` instead measures the
end-to-end BCI fine-tune step (NDT1 trunk + projector + LoRA Llama-ish
decoder) at a single-chip-feasible size. The reference publishes no
absolute numbers (BASELINE.md); ``vs_baseline`` compares against
BENCH_BASELINE.json when present.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

B, T, N, VOCAB = 64, 512, 256, 41
WARMUP, ITERS = 3, 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from llm_bci_tpu.config import update_config, resolve_path
    from llm_bci_tpu.models.ndt1 import NDT1

    cfg = update_config(
        resolve_path("configs/ndt1.yaml"),
        {
            "encoder": {
                "masker": {"neuron": {"active": False}},
                "embedder": {
                    "n_channels": N,
                    "max_F": 1024,
                    "input_dim": 256,
                    "stack": {"active": True, "size": 32, "stride": 4},
                },
            }
        },
    )
    model = NDT1.from_config(
        cfg, method_name="ctc", vocab_size=VOCAB, blank_id=0, zero_infinity=True,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
    )

    rng = np.random.default_rng(0)
    S = 64
    batch = {
        "spikes": rng.poisson(1.0, size=(B, T, N)).astype(np.float32),
        "spikes_mask": np.ones((B, T), np.int32),
        "spikes_timestamp": np.tile(np.arange(T, dtype=np.int32), (B, 1)),
        "spikes_lengths": np.full((B,), T, np.int32),
        "targets": rng.integers(1, VOCAB, size=(B, S)).astype(np.int32),
        "targets_lengths": rng.integers(30, S, size=(B,)).astype(np.int32),
    }

    params = jax.jit(
        lambda r: model.init(r, **batch, training=False)["params"]
    )(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3, weight_decay=5e-5)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)

        def loss_fn(p):
            out = model.apply(
                {"params": p}, **batch, training=True,
                rngs={"dropout": k1, "noise": k2, "mask": k3},
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    dev_batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, dev_batch, sub)
    float(jax.device_get(loss))  # full sync (device_get, not just ready-flag)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, dev_batch, sub)
    final_loss = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    samples_per_sec = B * ITERS / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path)).get("ndt1_ctc_train_samples_per_sec")
        if base:
            vs = samples_per_sec / base

    print(
        json.dumps(
            {
                "metric": "ndt1_ctc_train_samples_per_sec",
                "value": round(samples_per_sec, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


def main_bci():
    """BCI end-to-end step: NDT1 trunk + projector + LoRA Llama decoder.
    Single-chip-feasible LLM size (12L/1024h ~ 200M, GQA 4 kv heads)."""
    import jax
    import jax.numpy as jnp
    import optax

    from llm_bci_tpu.config import DictConfig
    from llm_bci_tpu.models.bci import BCI
    from llm_bci_tpu.models.llama import LlamaConfig, lora_trainable_mask

    Bb, Tsp, Nch, L = 8, 512, 256, 64
    llama = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_hidden_layers=12, num_attention_heads=16, num_key_value_heads=4,
        max_position_embeddings=2048,
    )
    model = BCI(
        config={
            "projector": {"stacking": 1, "inter_size": 2048, "bias": True, "act": "relu"},
            "ndt1": {"encoder": DictConfig({
                "masker": {"neuron": {"active": False}},
                "smooth_and_noise": {"noise": True, "smooth_sd": 2,
                                     "white_noise_sd": 1.0, "constant_offset_sd": 0.2},
                "context": {"forward": -2, "backward": -2},
                "embedder": {"n_channels": Nch, "n_blocks": 24, "n_days": 24,
                             "max_F": 1024, "input_dim": 256, "adapt": False,
                             "day_token": False, "block_token": False, "pos": True,
                             "act": "softsign", "bias": True, "dropout": 0.2,
                             "stack": {"active": True, "size": 32, "stride": 4}},
                "transformer": {"n_layers": 5, "hidden_size": 1024, "use_rope": False,
                                "rope_theta": 10000.0, "flash_attention": False,
                                "n_heads": 8, "attention_bias": True, "act": "gelu",
                                "inter_size": 1024, "mlp_bias": True, "dropout": 0.4,
                                "fixup_init": True, "compute_dtype": "bfloat16"},
                "factors": {"active": False, "size": 1024, "act": "relu", "bias": True,
                            "dropout": 0.0, "fixup_init": False, "init_range": 0.1},
            }).get_dict()},
        },
        llama_config=llama,
        lora_r=8, lora_alpha=32.0, lora_dropout=0.0,
        lora_targets=("q_proj", "v_proj", "k_proj", "o_proj",
                      "gate_proj", "up_proj", "down_proj"),
    )
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(3, 32000, size=(Bb, L)).astype(np.int32),
        "attention_mask": np.ones((Bb, L), np.int32),
        "input_split": np.full((Bb,), 8, np.int32),
        "spikes": rng.poisson(1.0, size=(Bb, Tsp, Nch)).astype(np.float32),
        "spikes_mask": np.ones((Bb, Tsp), np.int32),
        "spikes_timestamp": np.tile(np.arange(Tsp, dtype=np.int32), (Bb, 1)),
        "spikes_lengths": np.full((Bb,), Tsp, np.int32),
        "targets": np.concatenate(
            [np.full((Bb, 16), -100, np.int32),
             rng.integers(3, 32000, size=(Bb, L - 16)).astype(np.int32)], axis=1),
    }
    import jax

    params = jax.jit(
        lambda r: model.init(r, **batch, training=False)["params"]
    )(jax.random.PRNGKey(0))
    mask = model.trainable_mask(params)
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.adamw(5e-5, weight_decay=0.01), "freeze": optax.set_to_zero()},
        labels,
    )
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        k1, k2, k3 = jax.random.split(rng, 3)

        def loss_fn(p):
            return model.apply(
                {"params": p}, **batch, training=True,
                rngs={"dropout": k1, "noise": k2, "mask": k3},
            ).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    dev_batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, dev_batch, sub)
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, dev_batch, sub)
    final_loss = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    samples_per_sec = Bb * ITERS / dt
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    vs = 1.0
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path)).get("bci_lora_train_samples_per_sec")
        if base:
            vs = samples_per_sec / base
    print(json.dumps({
        "metric": "bci_lora_train_samples_per_sec",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    if "--workload" in sys.argv and "bci" in sys.argv:
        main_bci()
    else:
        main()
