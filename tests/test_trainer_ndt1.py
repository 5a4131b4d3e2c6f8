"""End-to-end Trainer + NDT1 smoke tests on synthetic spiking data.

Runs on the 8-virtual-CPU-device mesh from conftest — this also exercises
the data/fsdp sharding path the reference never tested (SURVEY.md §4).
"""
import numpy as np
import pytest

from llm_bci_tpu.config import DictConfig, update_config


def synth_dataset(n_train=16, n_test=8, T=20, N=12, n_days=3, seed=0, with_targets=False, vocab=7):
    rng = np.random.default_rng(seed)

    def make(n):
        rows = []
        for i in range(n):
            row = {
                "spikes": rng.poisson(1.0, size=(T, N)).astype(np.float32),
                "day_idx": np.asarray(i % n_days),
                "block_idx": np.asarray(i % 2),
            }
            if with_targets:
                L = int(rng.integers(2, 6))
                row["targets"] = rng.integers(1, vocab, size=(L,)).astype(np.int32)
            rows.append(row)
        return rows

    return {"train": make(n_train), "test": make(n_test)}


def base_config(tmp_path, **model_kwargs):
    return DictConfig(
        {
            "savestring": "smoke",
            "verbosity": 3,
            "dirs": {"checkpoint_dir": str(tmp_path / "ckpt"), "log_dir": None},
            "training": {
                "num_epochs": 1,
                "train_batch_size": 8,
                "test_batch_size": 8,
                "max_steps": 2,
            },
            "model": update_config(
                "configs/ndt1.yaml",
                {
                    "encoder": {
                        "masker": {"neuron": {"active": True, "mode": "random", "ratio": 0.3}},
                        "smooth_and_noise": {"smooth_sd": 1, "white_noise_sd": 0.1, "constant_offset_sd": 0.1},
                        "embedder": {
                            "n_channels": 12,
                            "max_F": 20,
                            "input_dim": 16,
                            "stack": {"active": False},
                            "dropout": 0.1,
                        },
                        "transformer": {
                            "n_layers": 2,
                            "hidden_size": 16,
                            "n_heads": 2,
                            "inter_size": 32,
                            "dropout": 0.1,
                        },
                    }
                },
            ),
            "data": {"dataset_class": "base"},
            "method": {
                "model_kwargs": {"method_name": "mlm", "loss": "poisson_nll", "log_input": True, **model_kwargs},
                "dataloader_kwargs": {
                    "pad_dict": {
                        "spikes": {"dim": 0, "side": "left", "value": 0, "truncate": None, "min_length": None},
                        "spikes_mask": {"dim": 0, "side": "left", "value": 0, "truncate": None, "min_length": None},
                        "spikes_timestamp": {"dim": 0, "side": "left", "value": 0, "truncate": None, "min_length": None},
                    }
                },
            },
            "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.1},
            "parallelism": {"data": -1, "fsdp": 1},
        }
    )


def test_trainer_mlm_end_to_end(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    trainer = Trainer(cfg, dataset=synth_dataset())
    loss_before, _ = trainer.evaluate()
    trainer.train()
    loss_after, _ = trainer.evaluate()
    assert np.isfinite(loss_before) and np.isfinite(loss_after)
    assert int(np.asarray(trainer.state.step)) == 2


def test_cache_device_batches_reshuffles_composition(tmp_path):
    """After the first epoch, cached batches are re-batched by a device-side
    gather over a fresh permutation: composition reshuffles like the
    streaming path (round-2 deviation fixed), and the gathered device rows
    must equal the host model_inputs rows handed to metric fns."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["cache_device_batches"] = True
    cfg["training"]["max_steps"] = 100  # don't cut the caching pass short
    trainer = Trainer(cfg, dataset=synth_dataset(n_train=24))

    def epoch_batches():
        out = []
        for dev_batch, model_inputs, unused in trainer._prefetch(
            trainer.train_dataloader
        ):
            np.testing.assert_allclose(
                np.asarray(dev_batch["spikes"]), model_inputs["spikes"], rtol=1e-6
            )
            out.append(np.asarray(model_inputs["spikes"]))
        return out

    e1, e2, e3 = epoch_batches(), epoch_batches(), epoch_batches()
    # same example pool each epoch...
    for e in (e2, e3):
        a = np.sort(np.concatenate(e1, 0).reshape(24, -1), axis=0)
        b = np.sort(np.concatenate(e, 0).reshape(24, -1), axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-6)
    # ...but at least one batch's composition changed (24 examples / bs 8:
    # the chance a fresh permutation reproduces the same 3 groups is ~1e-9)
    assert any(
        not np.allclose(np.sort(a.reshape(8, -1), 0), np.sort(b.reshape(8, -1), 0))
        for a, b in zip(e2, e3)
    ) or any(
        not np.allclose(np.sort(a.reshape(8, -1), 0), np.sort(b.reshape(8, -1), 0))
        for a, b in zip(e1, e2)
    )


def test_cache_device_batches_eval_replays_items_directly(tmp_path):
    """Non-shuffled (eval) dataloaders replay the cached batch tuples as-is
    — same objects, no per-pass gather/permutation machinery."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["cache_device_batches"] = True
    cfg["training"]["max_steps"] = 100
    trainer = Trainer(cfg, dataset=synth_dataset())

    first = list(trainer._prefetch(trainer.test_dataloader))
    second = list(trainer._prefetch(trainer.test_dataloader))
    assert len(first) == len(second) > 0
    for a, b in zip(first, second):
        assert a is b


def test_cache_device_batches_ragged_drop_last_streams(tmp_path):
    """With drop_last and a ragged tail, epoch 1's shuffle decides which
    examples get dropped — replaying that pool would freeze the SAME tail
    out of every epoch, so the cache must fall back to streaming (which
    drops a fresh random tail each epoch)."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["cache_device_batches"] = True
    cfg["training"]["max_steps"] = 100
    cfg["training"]["drop_last_train_dataloader"] = True
    trainer = Trainer(cfg, dataset=synth_dataset(n_train=20))  # 20 % 8 = 4

    seen = set()
    for _ in range(5):
        for dev_batch, model_inputs, unused in trainer._prefetch(
            trainer.train_dataloader
        ):
            for row in np.asarray(model_inputs["spikes"]):
                seen.add(row.tobytes())
    # streaming epochs rotate the dropped tail: far more than one epoch's
    # 16 kept examples show up across 5 epochs (deterministic under seed)
    assert len(seen) > 16


def test_cache_device_batches_replays_list_columns(tmp_path):
    """model_inputs columns that collate to python lists (ragged /
    non-array values) must survive into replay epochs, permuted in lockstep
    with the device arrays."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["cache_device_batches"] = True
    cfg["training"]["max_steps"] = 100
    trainer = Trainer(cfg, dataset=synth_dataset())

    class FakeLoader:
        shuffle = True

        def __init__(self, n=12, bs=4):
            self.dataset = list(range(n))
            self.bs = bs

        def __iter__(self):
            for s in range(0, len(self.dataset), self.bs):
                idx = range(s, s + self.bs)
                yield (
                    {
                        "spikes": np.asarray(
                            [[float(i)] * 3 for i in idx], np.float32
                        ),
                        "raw": [f"r{i}" for i in idx],
                    },
                    {"meta": [f"m{i}" for i in idx]},
                )

    loader = FakeLoader()
    list(trainer._prefetch(loader))  # caching pass
    replayed = list(trainer._prefetch(loader))
    assert len(replayed) == 3
    for dev_batch, model_inputs, unused in replayed:
        assert "raw" in model_inputs and "meta" in unused
        for j, row in enumerate(np.asarray(dev_batch["spikes"])):
            i = int(row[0])
            assert model_inputs["raw"][j] == f"r{i}"
            assert unused["meta"][j] == f"m{i}"


def test_trainer_fsdp_mesh(tmp_path):
    """Same run on a 2x4 (data, fsdp) mesh — exercises param sharding."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["parallelism"] = {"data": 2, "fsdp": 4, "fsdp_min_size": 16}
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)


def test_trainer_ctc_decoding(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["model_kwargs"] = {
        "method_name": "ctc",
        "vocab_size": 7,
        "blank_id": 0,
        "zero_infinity": True,
    }
    cfg["model"]["encoder"]["masker"]["neuron"]["active"] = False
    cfg["model"]["encoder"]["embedder"]["stack"] = {"active": True, "size": 4, "stride": 2}
    cfg["method"]["dataset_kwargs"] = {"targets_name": "targets"}
    cfg["method"]["dataloader_kwargs"]["pad_dict"].update(
        {
            "targets": {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None},
            "targets_mask": {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None},
        }
    )
    for spec in cfg["method"]["dataloader_kwargs"]["pad_dict"].values():
        spec["side"] = "right"
    trainer = Trainer(cfg, dataset=synth_dataset(with_targets=True))
    trainer.train()
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)


def test_checkpoint_resume(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["save_every"] = 2
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()

    trainer2 = Trainer(cfg, dataset=synth_dataset())
    step = trainer2.resume_from()
    assert step == 2
    p1 = np.asarray(
        next(iter(jax_leaves(trainer.state.params)))
    )
    p2 = np.asarray(next(iter(jax_leaves(trainer2.state.params))))
    np.testing.assert_allclose(p1, p2)


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_fsdp_resume_opt_state_sharded(tmp_path):
    """A resumed fsdp>1 run must re-place the restored optimizer state with
    the live FSDP shardings — not leave it replicated (VERDICT r1 weak #1).
    Also covers param/opt value round-trip under sharding."""
    import jax

    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["save_every"] = 2
    cfg["parallelism"] = {"data": 2, "fsdp": 4, "fsdp_min_size": 16}
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()
    live_shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, trainer.state.opt_state)
    )
    # the config is small but fsdp_min_size=16 forces real sharding somewhere
    assert any(
        not s.is_fully_replicated for s in live_shardings
    ), "test premise: some optimizer leaf must be FSDP-sharded"

    trainer2 = Trainer(cfg, dataset=synth_dataset())
    step = trainer2.resume_from()
    assert step == 2
    live_leaves = jax.tree_util.tree_leaves(trainer.state.opt_state)
    restored_leaves = jax.tree_util.tree_leaves(trainer2.state.opt_state)
    for a, b in zip(live_leaves, restored_leaves):
        # equivalent placement (specs may differ by trailing None only)
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim), (
            a.sharding, b.sharding)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_rng_impl_rbg(tmp_path):
    """training.rng_impl=rbg trains with the XLA RngBitGenerator keys (the
    TPU-default fast path; on TPU `auto` resolves to this). The flag is a
    process-global JAX config, so restore the previous impl afterwards."""
    import jax

    from llm_bci_tpu.training import Trainer

    prev = jax.config.jax_default_prng_impl
    try:
        cfg = base_config(tmp_path)
        cfg["training"]["rng_impl"] = "rbg"
        trainer = Trainer(cfg, dataset=synth_dataset())
        assert jax.config.jax_default_prng_impl == "rbg"
        # rbg raw keys are (4,) uint32 (threefry's are (2,))
        assert np.asarray(trainer.state.rng).shape == (4,)
        trainer.train()
        loss, _ = trainer.evaluate()
        assert np.isfinite(loss)
    finally:
        jax.config.update("jax_default_prng_impl", prev)


def test_resume_from_old_schema_checkpoint(tmp_path):
    """Checkpoints written before TrainState grew a leaf (e.g. ``rng``) must
    still resume: matching leaves restore, missing ones keep live values
    (structure-tolerant graft in restore_train_state)."""
    import dataclasses
    import os

    import jax

    from llm_bci_tpu.training import Trainer
    from llm_bci_tpu.training.checkpoint import restore_train_state, save_train_state

    cfg = base_config(tmp_path)
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()

    # Simulate the old schema: save a state with NO rng leaf (None = empty
    # subtree under JAX pytree flattening, as before the rng field existed).
    old_style = dataclasses.replace(trainer.state, rng=None)
    ckpt_dir = os.path.join(str(tmp_path), "old_state")
    save_train_state(ckpt_dir, 2, old_style)

    trainer2 = Trainer(cfg, dataset=synth_dataset())
    live_rng = np.asarray(trainer2.state.rng).copy()
    step, state = restore_train_state(ckpt_dir, trainer2.state)
    assert step == 2
    # params restored from the checkpoint...
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(trainer.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ...and the missing rng leaf kept its live value instead of crashing.
    np.testing.assert_array_equal(np.asarray(state.rng), live_rng)


def test_halt_on_nonfinite_loss(tmp_path):
    """training.halt_on_nonfinite raises at the eval boundary when the loss
    diverges (failure detection the reference lacks, SURVEY.md §5)."""
    import pytest

    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["max_steps"] = 4
    cfg["training"]["eval_every"] = 2
    cfg["training"]["halt_on_nonfinite"] = True
    cfg["optimizer"]["lr"] = 1e12          # guaranteed divergence
    trainer = Trainer(cfg, dataset=synth_dataset())
    with pytest.raises(FloatingPointError, match="Non-finite loss"):
        trainer.train()


def test_lagged_metric_prepare_protocol(tmp_path):
    """Train metric fns run one step late; a fn exposing .prepare(outputs)
    must get its device value back as prepared=..., once per step, and the
    prepared value must equal what the fn would compute itself."""
    from llm_bci_tpu.training import Trainer

    calls = {"prepare": 0, "fn": 0, "mismatch": 0, "missing": 0}

    def mean_rate(model, model_inputs, unused_inputs, outputs, **kw):
        calls["fn"] += 1
        prepared = kw.get("prepared")
        if prepared is None:
            calls["missing"] += 1
            return 0.0
        direct = np.asarray(outputs["preds"].mean())
        if not np.allclose(np.asarray(prepared), direct, rtol=1e-6):
            calls["mismatch"] += 1
        return float(np.asarray(prepared))

    def prepare(outputs):
        calls["prepare"] += 1
        return outputs["preds"].mean()

    mean_rate.prepare = prepare

    cfg = base_config(tmp_path)
    cfg["training"]["num_epochs"] = 2     # 2 steps/epoch at B=8, n=16
    cfg["training"]["max_steps"] = 3
    trainer = Trainer(cfg, dataset=synth_dataset(), metric_fns={"rate": mean_rate})
    trainer.train()
    assert calls["prepare"] == 3
    assert calls["fn"] == 3          # every step drained exactly once
    assert calls["missing"] == 0     # prepared handed through on each drain
    assert calls["mismatch"] == 0    # lagged value matches direct compute


def test_metric_lag_depth_preserves_values(tmp_path):
    """training.metric_lag batches metric readbacks (one device fetch per
    batch); depth must not change the VALUES or their order — only when
    they are read. Includes an eval boundary mid-run so the flush path is
    exercised."""
    from llm_bci_tpu.training import Trainer

    def run(lag):
        cfg = base_config(tmp_path / f"lag{lag}")
        cfg["training"]["num_epochs"] = 4       # 2 steps/epoch at B=8, n=16
        cfg["training"]["max_steps"] = 7
        cfg["training"]["eval_every"] = 3
        cfg["training"]["metric_lag"] = lag
        seen = []

        def rate(model, mi, ui, outputs, **kw):
            prepared = kw.get("prepared")
            seen.append(
                float(np.asarray(prepared))
                if prepared is not None
                else float(np.asarray(outputs["loss"]))
            )
            return seen[-1]

        rate.prepare = lambda outputs: outputs["loss"]
        t = Trainer(cfg, dataset=synth_dataset(), metric_fns={"rate": rate})
        t.train()
        return seen

    seen1 = run(1)
    seen8 = run(8)
    assert len(seen1) == len(seen8) and len(seen1) >= 7
    np.testing.assert_allclose(np.asarray(seen1), np.asarray(seen8), rtol=1e-5)


def test_metric_lag_batches_one_fetch_per_lag_steps(monkeypatch):
    """The aging drain must actually AMORTIZE: at steady state one
    ``jax.device_get`` moves ``lag`` entries every ``lag`` adds (the whole
    point of the feature on remote-attached devices), while keeping the
    newest ``lag-1`` pending for pipelining. Pins the drain watermark so a
    refactor can't quietly degrade it to a fetch every other step (which
    once happened with every value-preservation test green)."""
    import jax

    from llm_bci_tpu.training.trainer import _LaggedMetricReadback

    fetches = []
    real_get = jax.device_get
    monkeypatch.setattr(jax, "device_get", lambda x: fetches.append(len(x)) or real_get(x))

    consumed = []
    lag = 4
    r = _LaggedMetricReadback(
        {}, lag, lambda ctx, out, prep, scalars: consumed.append(ctx)
    )
    n = 100
    for i in range(n):
        r.add(i, {"loss": np.float32(i), "n_examples": np.int32(1)})
    r.flush()

    assert consumed == list(range(n))           # order preserved
    assert sum(fetches) == n                    # nothing dropped or re-fetched
    # steady state: one fetch per `lag` adds (plus the warm-up and the flush)
    assert len(fetches) <= n // lag + 2, fetches
    assert max(fetches) <= 2 * lag              # bounded memory per fetch


def test_component_blobs_false_keeps_orbax_only(tmp_path):
    """training.component_blobs=false skips the reference-layout msgpack
    blobs at save boundaries (their device_get of every param is the one
    synchronous piece of an async save) while the Orbax train_state still
    resumes."""
    import os

    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["save_every"] = 2
    cfg["training"]["component_blobs"] = False
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.train()

    step_dir = tmp_path / "ckpt" / "smoke" / "STEP2"
    assert os.path.isfile(str(step_dir / "trainer_config.yaml"))
    assert not os.path.exists(str(step_dir / "encoder.msgpack"))

    # the documented escape hatch: a one-off forced blob export at the end
    # overrides the config flag for that single save
    trainer.save_checkpoint("FINAL", component_blobs=True)
    final_dir = tmp_path / "ckpt" / "smoke" / "FINAL"
    assert os.path.isfile(str(final_dir / "encoder.msgpack"))

    trainer2 = Trainer(cfg, dataset=synth_dataset())
    assert trainer2.resume_from() == 2
    p1 = np.asarray(next(iter(jax_leaves(trainer.state.params))))
    p2 = np.asarray(next(iter(jax_leaves(trainer2.state.params))))
    np.testing.assert_allclose(p1, p2)


def test_evaluate_metric_lag_and_prepare(tmp_path):
    """evaluate() drains metric fns lagged + batched like the train loop:
    per-batch values and order are depth-independent, and ``fn.prepare``
    results arrive as fetched host values."""
    from llm_bci_tpu.training import Trainer

    def run(lag):
        cfg = base_config(tmp_path / f"evlag{lag}")
        cfg["training"]["metric_lag"] = lag
        cfg["training"]["test_batch_size"] = 2   # several eval batches
        seen = []

        def m(model, mi, ui, outputs, **kw):
            prepared = kw.get("prepared")
            assert prepared is not None
            # drained prepared values are host buffers, not device arrays
            assert not hasattr(prepared, "copy_to_host_async")
            seen.append(float(np.asarray(prepared)))
            return seen[-1]

        # per-batch-varying reduction (eval loss is 0 with inactive maskers)
        m.prepare = lambda outputs: outputs["preds"].sum()
        trainer = Trainer(cfg, dataset=synth_dataset())
        avg_loss, avg_metrics = trainer.evaluate({"m": m})
        return seen, avg_loss, avg_metrics["m"]

    seen1, loss1, avg1 = run(1)
    seen8, loss8, avg8 = run(8)
    assert len(seen1) == len(seen8) >= 2
    np.testing.assert_allclose(np.asarray(seen1), np.asarray(seen8), rtol=1e-5)
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    np.testing.assert_allclose(avg1, avg8, rtol=1e-5)


def test_chain_steps_matches_single_step_training(tmp_path):
    """training.chain_steps=2 (K steps per lax.scan program) must reproduce
    the single-step path exactly: same RNG threading, same per-step
    tx.update, same final params/step — only the dispatch granularity
    changes. Uses an uneven cadence (eval_every=3) so chains are capped at
    boundaries and the epoch tail falls back to single steps."""
    from llm_bci_tpu.training import Trainer

    def run(chain):
        cfg = base_config(tmp_path / f"c{chain}")
        cfg["training"]["num_epochs"] = 4       # 2 steps/epoch at B=8, n=16
        cfg["training"]["max_steps"] = 7
        cfg["training"]["eval_every"] = 3
        cfg["training"]["chain_steps"] = chain
        seen = []

        def rate(model, mi, ui, outputs, **kw):
            seen.append(float(np.asarray(outputs["loss"])))
            return seen[-1]

        t = Trainer(cfg, dataset=synth_dataset(), metric_fns={"rate": rate})
        t.train()
        return t, seen

    t1, seen1 = run(1)
    t2, seen2 = run(2)
    assert int(np.asarray(t1.state.step)) == 7
    assert int(np.asarray(t2.state.step)) == 7
    # 7 train drains + eval-pass calls; identical call pattern either way
    assert len(seen1) == len(seen2)
    np.testing.assert_allclose(np.asarray(seen1), np.asarray(seen2), rtol=1e-5)
    for a, b in zip(jax_leaves(t1.state.params), jax_leaves(t2.state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_chain_steps_ctc_with_none_output_fields(tmp_path):
    """chain_steps must handle output dicts with None fields: the CTC (and
    BCI) outputs leave e.g. mask unset, and lax.scan passes None leaves
    through unstacked — the per-step unstack must not index them."""
    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["data"]["dataset_class"] = "decoding"
    cfg["method"]["model_kwargs"] = {
        "method_name": "ctc", "vocab_size": 7, "blank_id": 0, "zero_infinity": True,
    }
    cfg["model"]["encoder"]["masker"]["neuron"]["active"] = False
    cfg["model"]["encoder"]["embedder"]["stack"] = {"active": True, "size": 4, "stride": 2}
    cfg["method"]["dataset_kwargs"] = {"targets_name": "targets"}
    cfg["method"]["dataloader_kwargs"]["pad_dict"].update(
        {
            "targets": {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None},
            "targets_mask": {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None},
        }
    )
    for spec in cfg["method"]["dataloader_kwargs"]["pad_dict"].values():
        spec["side"] = "right"
    cfg["training"]["num_epochs"] = 2
    cfg["training"]["max_steps"] = 4
    cfg["training"]["chain_steps"] = 2
    seen = []

    def rate(model, mi, ui, outputs, **kw):
        assert outputs.get("mask") is None       # the None field survives
        seen.append(float(np.asarray(outputs["loss"])))
        return seen[-1]

    trainer = Trainer(
        cfg, dataset=synth_dataset(with_targets=True), metric_fns={"rate": rate}
    )
    trainer.train()
    assert int(np.asarray(trainer.state.step)) == 4
    assert len(seen) >= 4 and np.isfinite(seen).all()


def test_preemption_request_saves_and_stops(tmp_path):
    """request_preemption() makes train() save a FULL train state at the
    next step boundary and return — zero lost steps on SIGTERM instead of
    up to save_every (SURVEY §5 failure recovery)."""
    import os

    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["max_steps"] = 50
    cfg["training"]["save_every"] = None
    trainer = Trainer(cfg, dataset=synth_dataset())
    trainer.request_preemption()       # flag set before step 1's boundary
    trainer.train()
    assert int(np.asarray(trainer.state.step)) == 1
    assert os.path.isdir(str(tmp_path / "ckpt" / "smoke" / "STEP1"))

    # the saved state resumes, and the budget picks up where it stopped
    trainer2 = Trainer(cfg, dataset=synth_dataset())
    assert trainer2.resume_from() == 1
    p1 = np.asarray(next(iter(jax_leaves(trainer.state.params))))
    p2 = np.asarray(next(iter(jax_leaves(trainer2.state.params))))
    np.testing.assert_allclose(p1, p2)


def test_sigterm_saves_full_state_mid_train(tmp_path):
    """A real SIGTERM mid-run triggers the boundary save; the previous
    handler is restored after train() returns."""
    import os
    import signal

    from llm_bci_tpu.training import Trainer

    prev = signal.getsignal(signal.SIGTERM)
    cfg = base_config(tmp_path)
    cfg["training"]["max_steps"] = 50
    cfg["training"]["save_every"] = None
    # The metric fn is the injection hook: drain it every step so the
    # SIGTERM lands mid-train (with a deeper metric_lag the first drain
    # would fall after the loop's last boundary and nothing would save —
    # real SIGTERMs arrive asynchronously and don't depend on drains).
    cfg["training"]["metric_lag"] = 1

    fired = []

    def metric(model, model_inputs, unused_inputs, outputs, **kw):
        # runs on the host (drain) during step 2: the handler sets the
        # flag in the main thread, step 2's boundary saves and stops
        if not fired:
            fired.append(True)
            os.kill(os.getpid(), signal.SIGTERM)
        return 0.0

    trainer = Trainer(
        cfg, dataset=synth_dataset(), metric_fns={"poke": metric}
    )
    trainer.train()

    step = int(np.asarray(trainer.state.step))
    assert 1 <= step <= 3, step
    assert os.path.isdir(str(tmp_path / "ckpt" / "smoke" / f"STEP{step}"))
    assert signal.getsignal(signal.SIGTERM) == prev


def test_preemption_skips_eval_at_boundary(tmp_path):
    """A preemption landing on an eval-aligned boundary must NOT burn the
    grace period on the eval pass — save-and-stop comes first."""
    import os

    from llm_bci_tpu.training import Trainer

    cfg = base_config(tmp_path)
    cfg["training"]["max_steps"] = 50
    cfg["training"]["eval_every"] = 1

    trainer = Trainer(cfg, dataset=synth_dataset())

    def no_eval(*a, **k):
        raise AssertionError("evaluate() ran during preemption shutdown")

    trainer.evaluate = no_eval
    trainer.request_preemption()
    trainer.train()
    assert os.path.isdir(str(tmp_path / "ckpt" / "smoke" / "STEP1"))


def _spikes_capture(log):
    """Metric fn that records each step's collated spikes batch."""

    def cap(model, model_inputs, unused_inputs, outputs, **kw):
        log.append(np.asarray(model_inputs["spikes"]).copy())
        return 0.0

    return cap


def test_resume_reproduces_data_stream_and_params(tmp_path):
    """Deterministic resume in the STRONG sense (VERDICT r3 #3): a run
    preempted at step 4 of 7 and resumed must consume byte-identical
    batches 5-7 (the interrupted epoch's order re-derived statelessly and
    fast-forwarded, not re-drawn) and end with the same params as the
    uninterrupted run."""
    from llm_bci_tpu.training import Trainer

    ds = synth_dataset(n_train=24)  # 3 batches/epoch @ bs 8 → step 4 is mid-epoch-2

    def make_cfg(root, max_steps, save_every=None):
        cfg = base_config(root)
        cfg["training"]["max_steps"] = max_steps
        cfg["training"]["num_epochs"] = 10
        cfg["training"]["save_every"] = save_every
        cfg["training"]["metric_lag"] = 1
        return cfg

    full_log = []
    t1 = Trainer(
        make_cfg(tmp_path / "full", 7),
        dataset=ds, metric_fns={"cap": _spikes_capture(full_log)},
    )
    t1.train()
    assert int(np.asarray(t1.state.step)) == 7 and len(full_log) == 7

    # interrupted leg: same seed/config, stops + saves at step 4
    cfg_b = make_cfg(tmp_path / "part", 4, save_every=4)
    part_log = []
    t2 = Trainer(cfg_b, dataset=ds, metric_fns={"cap": _spikes_capture(part_log)})
    t2.train()
    assert int(np.asarray(t2.state.step)) == 4

    # steps 1-4 matched the uninterrupted run (same stateless orders)
    for a, b in zip(full_log[:4], part_log):
        np.testing.assert_array_equal(a, b)

    # resumed leg: widened budget, restores step 4, must replay 5-7 exactly
    cfg_c = make_cfg(tmp_path / "part", 7)
    resumed_log = []
    t3 = Trainer(cfg_c, dataset=ds, metric_fns={"cap": _spikes_capture(resumed_log)})
    assert t3.resume_from() == 4
    t3.train()
    assert int(np.asarray(t3.state.step)) == 7
    assert len(resumed_log) == 3
    for a, b in zip(full_log[4:], resumed_log):
        np.testing.assert_array_equal(a, b)

    p1 = np.asarray(next(iter(jax_leaves(t1.state.params))))
    p3 = np.asarray(next(iter(jax_leaves(t3.state.params))))
    np.testing.assert_allclose(p1, p3, rtol=1e-6, atol=1e-7)


def test_resume_warns_on_changed_dataloader_geometry(tmp_path, capsys):
    """skip_batches = (step-1) % steps_per_epoch assumes the resumed run's
    dataloader geometry matches the interrupted run's; a changed batch
    size must produce a loud warning, not a silent misalignment (r4
    advisor finding)."""
    from llm_bci_tpu.training import Trainer

    ds = synth_dataset(n_train=24)
    cfg = base_config(tmp_path)
    cfg["training"]["max_steps"] = 4
    cfg["training"]["num_epochs"] = 10
    cfg["training"]["save_every"] = 4
    Trainer(cfg, dataset=ds).train()

    cfg2 = base_config(tmp_path)
    cfg2["training"]["train_batch_size"] = 4     # 3 → 6 steps/epoch
    cfg2["training"]["max_steps"] = 6
    cfg2["training"]["num_epochs"] = 10
    t2 = Trainer(cfg2, dataset=ds)
    capsys.readouterr()
    assert t2.resume_from() == 4
    assert "different dataloader geometry" in capsys.readouterr().out

    # unchanged geometry: no warning
    cfg3 = base_config(tmp_path)
    cfg3["training"]["max_steps"] = 6
    cfg3["training"]["num_epochs"] = 10
    t3 = Trainer(cfg3, dataset=ds)
    capsys.readouterr()
    assert t3.resume_from() == 4
    assert "different dataloader geometry" not in capsys.readouterr().out


def test_resume_reproduces_day_dataset_composition(tmp_path):
    """The strong resume guarantee extends to dataset_class: day (VERDICT
    r4 #4): day-batch COMPOSITION is drawn statelessly from
    (seed, epoch, day), so a run preempted mid-epoch and resumed consumes
    byte-identical day-homogeneous batches and ends with the same params
    as the uninterrupted run (reference data_utils/datasets.py:115-175
    draws from pools mutated inside __getitem__, which a resume cannot
    replay)."""
    from llm_bci_tpu.training import Trainer

    # 3 days x 8 examples, day-batches of 4 → 6 loader batches/epoch
    # (loader bs 1); step 4 of 7 is mid-epoch, step 7 is in epoch 2.
    ds = synth_dataset(n_train=24, n_test=8, with_targets=True)

    def make_cfg(root, max_steps, save_every=None):
        cfg = base_config(root)
        cfg["data"]["dataset_class"] = "day"
        cfg["method"]["model_kwargs"] = {
            "method_name": "ctc", "vocab_size": 7, "blank_id": 0,
            "zero_infinity": True,
        }
        cfg["method"]["dataset_kwargs"] = {"targets_name": "targets", "batch_size": 4}
        cfg["method"]["dataloader_kwargs"]["pad_dict"]["targets"] = {
            "dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None
        }
        cfg["method"]["dataloader_kwargs"]["pad_dict"]["targets_mask"] = {
            "dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None
        }
        cfg["training"]["train_batch_size"] = 1
        cfg["training"]["test_batch_size"] = 1
        cfg["training"]["max_steps"] = max_steps
        cfg["training"]["num_epochs"] = 10
        cfg["training"]["save_every"] = save_every
        cfg["training"]["metric_lag"] = 1
        return cfg

    full_log = []
    t1 = Trainer(
        make_cfg(tmp_path / "full", 7),
        dataset=ds, metric_fns={"cap": _spikes_capture(full_log)},
    )
    t1.train()
    assert int(np.asarray(t1.state.step)) == 7 and len(full_log) == 7
    # every captured batch is one day-batch of 4 distinct examples
    assert all(b.shape[0] == 4 for b in full_log)

    part_log = []
    t2 = Trainer(
        make_cfg(tmp_path / "part", 4, save_every=4),
        dataset=ds, metric_fns={"cap": _spikes_capture(part_log)},
    )
    t2.train()
    for a, b in zip(full_log[:4], part_log):
        np.testing.assert_array_equal(a, b)

    resumed_log = []
    t3 = Trainer(
        make_cfg(tmp_path / "part", 7),
        dataset=ds, metric_fns={"cap": _spikes_capture(resumed_log)},
    )
    assert t3.resume_from() == 4
    t3.train()
    assert len(resumed_log) == 3
    for a, b in zip(full_log[4:], resumed_log):
        np.testing.assert_array_equal(a, b)

    p1 = np.asarray(next(iter(jax_leaves(t1.state.params))))
    p3 = np.asarray(next(iter(jax_leaves(t3.state.params))))
    np.testing.assert_allclose(p1, p3, rtol=1e-6, atol=1e-7)


def test_dataloader_stateless_epoch_order():
    """epoch_order is pure in (seed, epoch); set_epoch(skip_batches=k)
    fast-forwards exactly k batches of that epoch's order."""
    from llm_bci_tpu.training.dataloader import HostDataLoader

    data = [{"x": np.asarray([i])} for i in range(10)]
    collate = lambda rows: [int(r["x"][0]) for r in rows]
    dl = HostDataLoader(data, batch_size=3, collate_fn=collate, shuffle=True, seed=5)
    o1, o2 = dl.epoch_order(2), dl.epoch_order(2)
    np.testing.assert_array_equal(o1, o2)
    assert not np.array_equal(dl.epoch_order(2), dl.epoch_order(3))

    dl.set_epoch(2)
    full = list(dl)
    dl.set_epoch(2, skip_batches=2)
    tail = list(dl)
    assert tail == full[2:]
    # plain iteration advances epochs automatically (3 follows the pinned 2)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for b in list(dl)]), dl.epoch_order(3)
    )


def test_cache_device_batches_replay_matches_streaming_order(tmp_path):
    """With the device cache on, later epochs re-batch by gather — and since
    r4 the gather permutation composes the CURRENT epoch's stateless order
    with the cache storage order, so the cached replay visits examples in
    EXACTLY the sequence the streaming path would (deterministic resume
    holds with the cache enabled)."""
    from llm_bci_tpu.training import Trainer

    ds = synth_dataset(n_train=24)
    cfg = base_config(tmp_path)
    cfg["training"]["cache_device_batches"] = True
    cfg["training"]["max_steps"] = 100
    trainer = Trainer(cfg, dataset=ds)

    def epoch_batches(epoch):
        trainer.train_dataloader.set_epoch(epoch)
        return [
            np.asarray(mi["spikes"]).copy()
            for _, mi, _ in trainer._prefetch(trainer.train_dataloader, epoch=epoch)
        ]

    # epoch 1 builds the cache; epochs 2-3 replay through the gather
    cached = {1: epoch_batches(1), 2: epoch_batches(2), 3: epoch_batches(3)}

    cfg2 = base_config(tmp_path / "stream")
    trainer2 = Trainer(cfg2, dataset=ds)  # cache off: pure streaming
    for epoch in (1, 2, 3):
        trainer2.train_dataloader.set_epoch(epoch)
        streamed = [
            np.asarray(mi["spikes"]).copy()
            for _, mi, _ in trainer2._prefetch(trainer2.train_dataloader)
        ]
        assert len(streamed) == len(cached[epoch])
        for a, b in zip(cached[epoch], streamed):
            np.testing.assert_array_equal(a, b)
