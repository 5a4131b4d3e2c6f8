"""Benchmark: NDT1-CTC flagship training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's headline recipe (configs/trainer_ctc_ndt1.yaml:
5 layers / 1024 hidden, stack 32 stride 4, batch 64) on synthetic
speechbci-shaped data (T=512 bins, 256 channels, 41-token phoneme vocab).
The reference publishes no absolute throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against BENCH_BASELINE.json if present (written
once to pin a self-baseline), else 1.0.
"""
from __future__ import annotations

import json
import os
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

    @jax.jit
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


if __name__ == "__main__":
    main()
