"""Full reference workflow on synthetic data: competition .mat files →
``main.py`` end-to-end BCI training (debug Llama + LoRA) → checkpoint →
``eval_phonemes.py`` WER eval with beam search + saved all-beam preds.

This is the pretrain→finetune→evaluate chain a user of the reference runs
(``main.py`` with configs/trainer_bci.yaml, then ``eval_phonemes.py``
-k from_pt=...), exercised against a local offline tokenizer."""
import argparse
import os
import pickle
import sys

import numpy as np
import pytest

pytest.importorskip("scipy")
pytest.importorskip("transformers")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_speechbci_loader import make_mat_dataset


def make_tokenizer(out_dir: str) -> str:
    """Tiny offline WordLevel tokenizer covering the fixture sentences and
    the splice prompt (AutoTokenizer-loadable; no network)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    words = [
        "hello", "world", "good", "day", "how", "are", "you", "fine",
        "thanks", "neural", "activity", ":", "-", ">", "sentence",
    ]
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<unk>",
    )
    fast.save_pretrained(out_dir)
    return out_dir


def pad(value=0):
    return {"dim": 0, "side": "right", "value": value, "truncate": None, "min_length": None}


def test_bci_train_then_wer_eval(tmp_path):
    import yaml

    import main as main_mod
    import eval_phonemes as eval_mod

    mat_dir = str(tmp_path / "mat")
    make_mat_dataset(mat_dir, T=24, C=4)       # 8 channels (tx1+spikePow, area 0:4)
    tok_dir = make_tokenizer(str(tmp_path / "tok"))

    ckpt_root = str(tmp_path / "ckpt")
    cfg = {
        "savestring": "bci_e2e",
        "verbosity": 3,
        "seed": 1,
        "dirs": {"checkpoint_dir": ckpt_root, "log_dir": None},
        "training": {
            "num_epochs": 1, "train_batch_size": 4, "test_batch_size": 4,
            "max_steps": 2, "save_every": 2,
        },
        "data": {
            "data_load": "speechbci", "data_dir": mat_dir,
            "zscore_block": True, "area_start": 0, "area_end": 4,
            "tokenizer_path": tok_dir,
            "prompt": "neural activity:#-> sentence:",
            "dataset_class": "decoding",
            "train_name": "train", "test_name": "test",
        },
        "model": {
            "model_class": "BCI",
            "ndt1": {
                "encoder": {
                    "masker": {"neuron": {"active": False}},
                    "smooth_and_noise": {"smooth_sd": 1, "white_noise_sd": 0.1,
                                         "constant_offset_sd": None},
                    "embedder": {
                        "n_channels": 1, "max_F": 40, "input_dim": 8,
                        "stack": {"active": True, "size": 4, "stride": 2},
                        "dropout": 0.1,
                    },
                    "transformer": {
                        "n_layers": 1, "hidden_size": 16, "n_heads": 2,
                        "inter_size": 16, "dropout": 0.1,
                    },
                },
            },
            "projector": {"stacking": 2, "inter_size": 16, "bias": True, "act": "relu"},
        },
        "method": {
            "model_kwargs": {
                "method_name": "endtoend", "debug": True,
                "lora": {"r": 2, "alpha": 16, "dropout": 0.0,
                         "target_modules": ["q_proj", "v_proj"], "modules_to_save": []},
                "freeze_llm": False,
            },
            "dataset_kwargs": {"targets_name": "labels"},
            "dataloader_kwargs": {
                "pad_dict": {
                    "spikes": pad(), "spikes_mask": pad(), "spikes_timestamp": pad(),
                    "input_ids": pad(0), "attention_mask": pad(0),
                    "targets": pad(-100), "targets_mask": pad(0),
                }
            },
            "metric_kwargs": {},
        },
        "optimizer": {"lr": 1e-3, "scheduler": "cosine", "warmup_pct": 0.3},
        "parallelism": {"data": -1, "fsdp": 1},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    trainer = main_mod.main(
        argparse.Namespace(config_file=cfg_path, kwargs={"seed": "1"})
    )
    assert int(np.asarray(trainer.state.step)) == 2
    step_dir = os.path.join(ckpt_root, "bci_e2e", "STEP2")
    assert os.path.exists(os.path.join(step_dir, "llm.msgpack"))
    assert os.path.exists(os.path.join(step_dir, "trainer_config.yaml"))

    # beams="2,1": the reference's sweep pattern (one process, one compile
    # per beam size, per-K pickles named <savestring>_<k>.pkl — the
    # convention analyze_cli groups on).
    preds_base = str(tmp_path / "wer_preds")
    sweep = eval_mod.main(
        argparse.Namespace(
            config_file="none",
            kwargs={
                "from_pt": step_dir, "beams": "2,1", "test_len": "2",
                "savestring": preds_base,
            },
        )
    )
    assert set(sweep) == {2, 1}
    metrics = sweep[2]
    assert np.isfinite(metrics["WER"]) and np.isfinite(sweep[1]["WER"])
    all_preds = pickle.load(open(preds_base + "_2.pkl", "rb"))
    assert len(all_preds) == 2
    tokens, target = all_preds[0]
    assert np.asarray(tokens).shape[0] == 2          # both beams saved
    assert isinstance(target, str)
    greedy_preds = pickle.load(open(preds_base + "_1.pkl", "rb"))
    assert np.asarray(greedy_preds[0][0]).shape[0] == 1

    # The eval-time model must carry the TRAINED LoRA adapters (the
    # reference loads adapters via peft at eval): compare a lora_A leaf
    # of the reloaded model against the trained trainer's.
    import jax as _jax

    def lora_leaf(params):
        return np.asarray(
            _jax.device_get(
                params["llm"]["layers_0"]["self_attn"]["q_proj"]["lora_A"]
            )
        )

    from llm_bci_tpu.config import DictConfig
    from llm_bci_tpu.models.bci import BCI as _BCI

    saved_cfg = yaml.safe_load(
        open(os.path.join(step_dir, "trainer_config.yaml"))
    )
    model_cfg = saved_cfg.get("model") or {}
    model_cfg["from_pt"] = step_dir
    reloaded = _BCI.from_config(
        DictConfig(model_cfg), **saved_cfg["method"]["model_kwargs"]
    )
    import jax.numpy as jnp

    rb = {k: jnp.asarray(v) for k, v in next(iter(trainer.test_dataloader))[0].items()
          if k in ("input_ids", "attention_mask", "input_split", "spikes",
                   "spikes_mask", "spikes_timestamp", "spikes_lengths",
                   "block_idx", "day_idx", "targets")}
    rparams = reloaded.init(_jax.random.PRNGKey(0), **rb, training=False)["params"]
    rparams = reloaded.warm_start_params(rparams)
    np.testing.assert_array_equal(
        lora_leaf(rparams), lora_leaf(_jax.device_get(trainer.state.params))
    )
    assert not np.all(lora_leaf(rparams) == 0)       # actually trained

    # Serve the SAME bf16-trained checkpoint with the base post-training-
    # quantized to int8 (-k quantize=int8): the restore path requantizes
    # the saved float kernels instead of dtype-casting them.
    metrics_q = eval_mod.main(
        argparse.Namespace(
            config_file="none",
            kwargs={
                "from_pt": step_dir, "beams": "1", "test_len": "2",
                "savestring": str(tmp_path / "wer_preds_int8"),
                "quantize": "int8",
            },
        )
    )
    assert np.isfinite(metrics_q["WER"])
