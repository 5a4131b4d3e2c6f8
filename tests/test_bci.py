"""End-to-end BCI (debug Llama) through the Trainer, plus splice unit tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.config import DictConfig


def test_splice_embeds_matches_python_loop():
    from llm_bci_tpu.models.bci import splice_embeds

    rng = np.random.default_rng(0)
    B, L, S, H = 3, 7, 4, 5
    text = rng.normal(size=(B, L, H)).astype(np.float32)
    spikes = rng.normal(size=(B, S, H)).astype(np.float32)
    d = np.asarray([0, 3, 7])
    out = np.asarray(splice_embeds(jnp.asarray(text), jnp.asarray(spikes), jnp.asarray(d)))
    for b in range(B):
        ref = np.concatenate([text[b, : d[b]], spikes[b], text[b, d[b] :]], axis=0)
        np.testing.assert_allclose(out[b], ref, atol=1e-6)


def test_splice_2d():
    from llm_bci_tpu.models.bci import splice_embeds

    text = jnp.asarray([[1, 2, 3, 4]])
    spikes = jnp.asarray([[9, 9]])
    out = np.asarray(splice_embeds(text, spikes, jnp.asarray([2])))
    np.testing.assert_array_equal(out, [[1, 2, 9, 9, 3, 4]])


def synth_bci_dataset(n_train=8, n_test=4, T=16, N=8, L=10, vocab=97, seed=0):
    rng = np.random.default_rng(seed)

    def make(n):
        rows = []
        for i in range(n):
            sent_len = int(rng.integers(2, 5))
            prompt_len = L - sent_len
            input_ids = rng.integers(3, vocab, size=(L,)).astype(np.int64)
            labels = np.concatenate(
                [np.full(prompt_len, -100, np.int64), input_ids[prompt_len:]]
            )
            rows.append(
                {
                    "spikes": rng.poisson(1.0, size=(T, N)).astype(np.float32),
                    "input_ids": input_ids,
                    "attention_mask": np.ones(L, np.int64),
                    "input_split": np.atleast_1d(3),
                    "labels": labels,
                    "sentence": "a b c",
                    "day_idx": np.asarray(i % 2),
                    "block_idx": np.asarray(i % 2),
                }
            )
        return rows

    return {"train": make(n_train), "test": make(n_test)}


def bci_config(tmp_path):
    pad = lambda value=0: {
        "dim": 0, "side": "right", "value": value, "truncate": None, "min_length": None,
    }
    return DictConfig(
        {
            "savestring": "bci_smoke",
            "verbosity": 3,
            "dirs": {"checkpoint_dir": str(tmp_path / "ckpt"), "log_dir": None},
            "training": {
                "num_epochs": 1,
                "train_batch_size": 4,
                "test_batch_size": 4,
                "max_steps": 2,
            },
            "model": {
                "model_class": "BCI",
                "ndt1": {
                    "encoder": {
                        "masker": {"neuron": {"active": False}},
                        "smooth_and_noise": {
                            "smooth_sd": 1, "white_noise_sd": 0.1, "constant_offset_sd": None,
                        },
                        "embedder": {
                            "n_channels": 8, "max_F": 16, "input_dim": 12,
                            "stack": {"active": True, "size": 4, "stride": 2},
                            "dropout": 0.1,
                        },
                        "transformer": {
                            "n_layers": 2, "hidden_size": 16, "n_heads": 2,
                            "inter_size": 32, "dropout": 0.1,
                        },
                    },
                },
                "projector": {"stacking": 2, "inter_size": 24, "bias": True, "act": "relu"},
            },
            "data": {"dataset_class": "decoding"},
            "method": {
                "model_kwargs": {
                    "method_name": "endtoend",
                    "debug": True,
                    "lora": {
                        "r": 2, "alpha": 16, "dropout": 0.0,
                        "target_modules": ["q_proj", "v_proj"], "modules_to_save": [],
                    },
                    "freeze_llm": False,
                },
                "dataset_kwargs": {"targets_name": "labels"},
                "dataloader_kwargs": {
                    "pad_dict": {
                        "spikes": pad(),
                        "spikes_mask": pad(),
                        "spikes_timestamp": pad(),
                        "input_ids": pad(0),
                        "attention_mask": pad(0),
                        "targets": pad(-100),
                        "targets_mask": pad(0),
                    }
                },
            },
            "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.3},
            "parallelism": {"data": -1, "fsdp": 1},
        }
    )


def test_llm_remat_same_loss_and_grads():
    """llm_remat rematerializes decoder layers in the backward — the loss
    AND gradients must be identical to the non-remat path."""
    import jax
    import optax

    from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.debug()
    rng = np.random.default_rng(0)
    B, T = 2, 8
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, T)).astype(np.int32))

    def loss_for(remat):
        model = LlamaForCausalLM(cfg, remat=remat, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

        def loss_fn(p):
            logits, _ = model.apply({"params": p}, input_ids=ids)
            return optax.softmax_cross_entropy_with_integer_labels(logits, tgt).sum()

        return params, jax.value_and_grad(loss_fn)(params)

    p0, (l0, g0) = loss_for(False)
    p1, (l1, g1) = loss_for(True)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), g0, g1
    )


def test_bci_trainer_end_to_end(tmp_path):
    import jax

    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path)
    trainer = Trainer(cfg, dataset=synth_bci_dataset())
    before = jax.device_get(trainer.state.params)
    loss0, _ = trainer.evaluate()
    trainer.train()
    loss1, _ = trainer.evaluate()
    assert np.isfinite(loss0) and np.isfinite(loss1)

    # LoRA freeze semantics: frozen base-LLM leaves bit-identical after
    # training; trainable leaves (lora_*, encoder, projector) moved.
    after = jax.device_get(trainer.state.params)
    mask = trainer.model.trainable_mask(before)
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = dict(jax.tree_util.tree_flatten_with_path(after)[0])
    flat_m = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
    n_frozen = n_moved = 0
    for path, b in flat_b:
        a = flat_a[path]
        if flat_m[path]:
            n_moved += not np.allclose(b, a)
        else:
            np.testing.assert_array_equal(
                b, a, err_msg=f"frozen param moved: {path}"
            )
            n_frozen += 1
    assert n_frozen > 0 and n_moved > 0


def test_bci_generate(tmp_path):
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path)
    trainer = Trainer(cfg, dataset=synth_bci_dataset())
    batch, _ = next(iter(trainer.test_dataloader))
    gen_inputs = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in (
            "input_ids", "attention_mask", "input_split", "spikes", "spikes_mask",
            "spikes_timestamp", "spikes_lengths", "block_idx", "day_idx",
        )
    }
    tokens = trainer.model_handle.generate(**gen_inputs, max_new_tokens=5)
    assert tokens.shape == (4, 5)
    beam_tokens = trainer.model_handle.generate(
        **gen_inputs, max_new_tokens=5, num_beams=3
    )
    assert beam_tokens.shape == (4, 5)


def test_from_config_reload_without_debug_flag(tmp_path):
    """A checkpoint reload must reconstruct the trained model WITHOUT the
    original method kwargs: the Llama config comes from the checkpoint's
    llama_config.yaml (a checkpoint dir has no HF config.json) and the
    saved encoder/projector yamls re-merge, so the structure matches the
    trained weights exactly."""
    import dataclasses

    import yaml

    from llm_bci_tpu.models.bci import BCI
    from llm_bci_tpu.models.llama import LlamaConfig

    cfg = bci_config(tmp_path)
    model = BCI.from_config(cfg["model"], **cfg["method"]["model_kwargs"])
    ckpt = str(tmp_path / "STEP1")
    os.makedirs(ckpt, exist_ok=True)
    model.save_config(ckpt)

    # reload with NO debug/llm_path kwargs, only lora (as the saved
    # trainer_config would supply) — must not try pt_path/config.json
    reloaded = BCI.from_config(
        DictConfig({"from_pt": ckpt}),
        method_name="endtoend",
        lora=cfg["method"]["model_kwargs"]["lora"],
        freeze_llm=False,
    )
    assert dataclasses.asdict(reloaded.llama_config) == dataclasses.asdict(
        model.llama_config
    )
    assert reloaded.lora_r == 2 and reloaded.lora_targets == ("q_proj", "v_proj")
    # saved component configs re-merged (trained encoder is 2-layer, not
    # the 5-layer configs/ndt1.yaml default)
    enc = reloaded.config["ndt1"]["encoder"]
    assert enc["transformer"]["n_layers"] == 2
    assert reloaded.config["projector"]["inter_size"] == 24
    assert enc["from_pt"] == ckpt
