"""SpeechBCI .mat loader + phoneme labels + full CTC CER pipeline on
synthetic competition-format files."""
import json
import os

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
import scipy.io


def make_mat_dataset(root, n_days=2, n_files_sentences=3, T=30, C=128, seed=0):
    """Write synthetic .mat files in the competition layout
    (reference data_utils/speechbci_dataset.py:52-96 expects fields
    tx1/spikePow/sentenceText/blockIdx and filenames t12.YYYY.MM.DD.mat)."""
    rng = np.random.default_rng(seed)
    sentences = ["hello world", "good day", "how are you", "fine thanks"]
    for split in ("train", "test", "competitionHoldOut"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for d in range(n_days):
            n = n_files_sentences
            tx1 = np.empty((1, n), object)
            spow = np.empty((1, n), object)
            for i in range(n):
                Ti = T + int(rng.integers(0, 5))
                tx1[0, i] = rng.poisson(1.0, size=(Ti, 2 * C)).astype(np.float64)
                spow[0, i] = rng.normal(size=(Ti, 2 * C)).astype(np.float64)
            sent = np.array([sentences[i % len(sentences)] + "   " for i in range(n)])
            block = rng.integers(1, 3, size=(n, 1))
            scipy.io.savemat(
                os.path.join(root, split, f"t12.2022.{d + 4:02d}.18.mat"),
                {"tx1": tx1, "spikePow": spow, "sentenceText": sent, "blockIdx": block},
            )
    return root


def test_load_competition_data(tmp_path):
    from llm_bci_tpu.data.speechbci import load_competition_data

    make_mat_dataset(str(tmp_path))
    ds = load_competition_data(
        str(tmp_path), zscore_block=True, zscore_day=True, area_start=0, area_end=64
    )
    assert set(ds) == {"train", "test", "competitionHoldOut"}
    row = ds["train"][0]
    assert row["spikes"].shape[1] == 128  # 64 tx1 + 64 spikePow channels
    assert row["sentence"] == row["sentence"].lower().strip()
    assert "day_idx" in row and "block_idx" in row
    # per-day z-scoring: near-zero mean over the train split per day
    day0 = np.concatenate(
        [r["spikes"] for r in ds["train"] if int(r["day_idx"]) == 0], axis=0
    )
    assert abs(day0.mean()) < 0.2


def test_day_idxs_filter_and_typo_alias(tmp_path):
    from llm_bci_tpu.data.speechbci import load_competition_data

    make_mat_dataset(str(tmp_path))
    ds = load_competition_data(str(tmp_path), day_idxs=[0])
    assert all(int(r["day_idx"]) == 0 for r in ds["train"])
    # the reference config's `date_idxs` typo is accepted as an alias
    ds2 = load_competition_data(str(tmp_path), date_idxs=[1])
    assert all(int(r["day_idx"]) == 1 for r in ds2["train"])


def test_phoneme_labels_and_ctc_training(tmp_path):
    from llm_bci_tpu.data.speechbci import (
        create_phonemes_ctc_labels,
        load_competition_data,
    )
    from llm_bci_tpu.config import DictConfig
    from llm_bci_tpu.training import Trainer
    from llm_bci_tpu.eval.eval_bci import format_ctc, word_error_count

    make_mat_dataset(str(tmp_path / "mat"))
    ds = load_competition_data(str(tmp_path / "mat"), zscore_block=True)
    vocab_file = os.path.join(os.path.dirname(os.path.dirname(__file__)), "vocab.json")
    # g2p_en is absent in this image; labels come from the vendored
    # ARPAbet dictionary with no warning and no fallback needed.
    ds = create_phonemes_ctc_labels(ds, vocab_file)
    vocab = json.load(open(vocab_file))
    row = ds["train"][0]
    assert row["phonemes"][-1] == "SIL"
    assert all(0 <= i < len(vocab) for i in row["phonemes_idx"])
    # dictionary-backed: "world" maps to its real ARPAbet, not letter soup
    by_sentence = {r["sentence"]: r for split in ds.values() for r in split}
    hello = by_sentence.get("hello world")
    assert hello is not None
    assert hello["phonemes"] == [
        "HH", "AH", "L", "OW", "SIL", "W", "ER", "L", "D", "SIL",
    ]

    pad = lambda: {"dim": 0, "side": "right", "value": 0, "truncate": None, "min_length": None}
    cfg = DictConfig(
        {
            "savestring": "sbci",
            "verbosity": 3,
            "dirs": {"checkpoint_dir": str(tmp_path / "ckpt"), "log_dir": None},
            "training": {"num_epochs": 1, "train_batch_size": 3, "test_batch_size": 3, "max_steps": 2},
            "model": {
                "model_class": "NDT1",
                "encoder": {
                    "masker": {"neuron": {"active": False}},
                    "embedder": {
                        "n_channels": ds["train"][0]["spikes"].shape[1],
                        "max_F": 40, "input_dim": 16,
                        "stack": {"active": True, "size": 4, "stride": 2},
                    },
                    "transformer": {"n_layers": 1, "hidden_size": 16, "n_heads": 2, "inter_size": 16},
                },
            },
            "data": {"dataset_class": "decoding"},
            "method": {
                "model_kwargs": {"method_name": "ctc", "vocab_size": 41, "blank_id": 0, "zero_infinity": True},
                "dataset_kwargs": {"targets_name": "phonemes_idx"},
                "dataloader_kwargs": {"pad_dict": {
                    "spikes": pad(), "spikes_mask": pad(), "spikes_timestamp": pad(),
                    "targets": pad(), "targets_mask": pad(),
                }},
                "metric_kwargs": {"n_print": 0},
            },
            "optimizer": {"lr": 1e-3, "scheduler": "cosine"},
        }
    )

    def cer(model, model_inputs, unused_inputs, outputs, **kw):
        preds = outputs["preds"].argmax(-1)
        pred_strs = [" ".join(format_ctc(p, vocab, 0)) for p in preds]
        phonemes = [" ".join(p) for p in unused_inputs["phonemes"]]
        errors, n = word_error_count(pred_strs, phonemes)
        return errors / n

    trainer = Trainer(cfg, dataset=ds, metric_fns={"CER": cer})
    trainer.train()
    loss, metrics = trainer.evaluate()
    assert np.isfinite(loss)
    assert 0.0 <= metrics["CER"] <= 2.0


def test_eval_phonemes_analysis(tmp_path):
    """bootstrap-CI WER + best-of-k over saved predictions
    (eval_phonemes.py analysis block)."""
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eval_phonemes import best_of_k_wer, bootstrap_wer_ci

    class FakeTok:
        def decode(self, ids, skip_special_tokens=True):
            words = {1: "hello", 2: "world", 3: "good", 4: "day"}
            return " ".join(words.get(int(i), "") for i in ids).strip()

    preds = [
        (np.asarray([[1, 2]]), "hello world"),            # perfect
        (np.asarray([[3, 2], [3, 4]]), "good day"),       # beam 2 perfect
    ]
    path = str(tmp_path / "preds.pkl")
    pickle.dump(preds, open(path, "wb"))
    res = bootstrap_wer_ci(path, FakeTok(), n_boot=100)
    assert 0.0 <= res["wer"] <= 1.0
    assert res["ci_low"] <= res["wer"] <= res["ci_high"] or res["wer"] == 0.0
    assert best_of_k_wer(path, FakeTok()) == 0.0


def test_eval_phonemes_analysis_figures(tmp_path):
    """--analyze writes the reference's two figures (wer.png, best_wer.png)
    and the sorted examples.json from predictions pickles."""
    import json
    import pickle
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eval_phonemes import analyze

    class FakeTok:
        def decode(self, ids, skip_special_tokens=True):
            words = {1: "hello", 2: "world", 3: "good", 4: "day"}
            return " ".join(words.get(int(i), "") for i in ids).strip()

    rng = np.random.default_rng(0)
    paths = {}
    for beams in (1, 3):
        preds = [
            (rng.integers(1, 5, size=(beams, 2)), "hello world"),
            (rng.integers(1, 5, size=(beams, 2)), "good day"),
        ]
        p = str(tmp_path / f"lora_{beams}.pkl")
        pickle.dump(preds, open(p, "wb"))
        paths[beams] = p

    out = str(tmp_path / "plots")
    stats = analyze({"lora": paths}, FakeTok(), out_dir=out, n_boot=50)
    assert os.path.exists(os.path.join(out, "wer.png"))
    assert os.path.exists(os.path.join(out, "best_wer.png"))
    examples = json.load(open(os.path.join(out, "examples.json")))
    assert len(examples) == 2 and all(len(r) == 4 for r in examples)
    # sorted ascending by per-sentence WER
    assert examples[0][2] / examples[0][3] <= examples[1][2] / examples[1][3]
    # best-of-k <= top-beam WER, per run
    for s in stats["lora"].values():
        assert s["best_wer"] <= s["wer"] + 1e-9


def test_dictionary_g2p_oov_gating():
    """OOV words hard-fail unless the letter-to-sound fallback is opted in
    (competition labels must not silently degrade)."""
    from llm_bci_tpu.data.speechbci import DictionaryG2P

    g2p = DictionaryG2P()
    phones = g2p("how are you")
    assert phones == ["HH", "AW1", " ", "AA1", "R", " ", "Y", "UW1"]

    with pytest.raises(ValueError, match="zyzzyva"):
        g2p("the zyzzyva flew")

    g2p_fb = DictionaryG2P(allow_fallback=True)
    phones = g2p_fb("the zyzzyva flew")
    assert " " in phones and len(phones) > 3  # runs end to end


def test_create_phonemes_labels_oov_modes(tmp_path):
    """Default: OOV words label via the rule engine (loud warning, not a
    crash — arbitrary sentences stay labelable self-contained). Strict mode
    still hard-fails."""
    from llm_bci_tpu.data.speechbci import create_phonemes_ctc_labels

    vocab_file = os.path.join(os.path.dirname(os.path.dirname(__file__)), "vocab.json")
    ds = {"train": [{"sentence": "completely untranscribable xylopharmacology"}]}
    out = create_phonemes_ctc_labels(ds, vocab_file)
    assert out["train"][0]["phonemes"][-1] == "SIL"
    with pytest.raises(ValueError, match="dictionary"):
        create_phonemes_ctc_labels(ds, vocab_file, oov="raise")
    out = create_phonemes_ctc_labels(ds, vocab_file, allow_fallback=True)
    assert out["train"][0]["phonemes"][-1] == "SIL"


def test_zscore_dead_channel_no_nan(tmp_path):
    """A channel with zero variance in a block/day must not inject NaN."""
    import scipy.io

    from llm_bci_tpu.data.speechbci import load_competition_data

    rng = np.random.default_rng(0)
    for split in ("train", "test", "competitionHoldOut"):
        os.makedirs(os.path.join(str(tmp_path), split), exist_ok=True)
        n = 3
        tx1 = np.empty((1, n), object)
        spow = np.empty((1, n), object)
        for i in range(n):
            Ti = 12 + i                           # ragged -> object cells
            arr = rng.poisson(1.0, size=(Ti, 4)).astype(np.float64)
            arr[:, 0] = 0.0                       # dead channel
            tx1[0, i] = arr
            spow[0, i] = np.zeros((Ti, 4))        # all-dead feature block
        scipy.io.savemat(
            os.path.join(str(tmp_path), split, "t12.2022.04.18.mat"),
            {"tx1": tx1, "spikePow": spow,
             "sentenceText": np.array(["hi there"] * n),
             "blockIdx": np.ones((n, 1), np.int64)},
        )
    ds = load_competition_data(
        str(tmp_path), zscore_block=True, zscore_day=True, area_start=0, area_end=4
    )
    for row in ds["train"]:
        assert np.isfinite(row["spikes"]).all()
