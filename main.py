"""CLI train entry point: ``python main.py -c configs/xxx.yaml -k a.b=1 ...``

Rebuilds the reference ``main.py:16-247``: config merge, dataset dispatch
(``file``/``ibl``/``speechbci``), dataset-dependent config surgery (region
vocab, stat-behaviour label remap, context-length pinning, ``n_channels``
inference), and metric-fn construction (accuracy / CER / assisted-WER).

Metric fns receive JAX device arrays per the trainer protocol
(``llm_bci_tpu/training/trainer.py``); fns with a ``.prepare`` attribute get
their device reduction dispatched right behind the train step (see
PARITY.md "Documented protocol deviations").
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from llm_bci_tpu.config import (
    DictConfig,
    ParseKwargs,
    config_from_kwargs,
    update_config,
)
from llm_bci_tpu.data.ibl import load_ibl_dataset
from llm_bci_tpu.data.speechbci import (
    create_llm_labels,
    create_phonemes_ctc_labels,
    load_competition_data,
)
from llm_bci_tpu.eval.eval_bci import format_ctc, word_error_count
from llm_bci_tpu.training.trainer import Trainer, default_trainer_config


def main(args):
    config = update_config(
        default_trainer_config(), args.config_file if args.config_file != "none" else None
    )
    config = update_config(config, config_from_kwargs(args.kwargs))

    metric_fns = {}
    eval_metric_fns = {}
    vocab = None
    blank_id = 0
    tokenizer = None

    # ------------------------------------------------------------- dataset
    if config.data.data_load == "file":
        import pickle

        path = os.path.join(config.data.data_dir, config.data.data_file)
        if path.endswith((".pkl", ".pickle")):
            dataset = pickle.load(open(path, "rb"))
        else:
            import torch

            dataset = torch.load(path)
    elif config.data.data_load == "ibl":
        dataset = load_ibl_dataset(**config.data)
    elif config.data.data_load == "speechbci":
        dataset = load_competition_data(**config.data)
        if config["data"].get("vocab_file"):
            blank_id = config.method.model_kwargs.blank_id
            vocab = json.load(open(config.data.vocab_file))
            # data.g2p_oov: warn (default; rule-based labels for OOV words,
            # reported loudly) | raise | lts. allow_g2p_fallback=true kept
            # as a pre-round-3 alias for lts.
            oov = str(config["data"].get("g2p_oov", "warn"))
            if config["data"].get("allow_g2p_fallback"):
                oov = "lts"
            dataset = create_phonemes_ctc_labels(
                dataset, config.data.vocab_file, oov=oov
            )
        if config["data"].get("tokenizer_path"):
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                config.data.tokenizer_path, add_bos_token=False, add_eos_token=False
            )
            dataset = create_llm_labels(dataset, tokenizer, config.data.prompt)
    else:
        raise ValueError(f"Unknown data_load {config.data.data_load!r}")

    # -------------------- region vocabulary for region-aware iTransformer
    if config.model.model_class == "iTransformer" and config.model.encoder.embed_region:
        all_regions = list(
            set(
                str(b)
                for rows in dataset.values()
                for row in rows
                for b in row["neuron_regions"]
            )
        )
        config["model"]["encoder"]["regions"] = all_regions
        for key in config["model"]["masker"].keys():
            config["model"]["masker"][key]["target_regions"] = all_regions
            config["model"]["masker"][key]["mask_regions"] = all_regions
        # Region names never reach the device: add int id columns host-side.
        from llm_bci_tpu.models.itransformer import region_names_to_idx

        for rows in dataset.values():
            region_names_to_idx(rows, all_regions)

    # ------------------------- static behaviour labels → contiguous classes
    if (
        config.method.model_kwargs.method_name == "stat_behaviour"
        and config.method.model_kwargs.loss == "xent"
    ):
        beh = config.method.dataset_kwargs.targets_name
        all_labels = set(int(row[beh][0]) for rows in dataset.values() for row in rows)
        l_to_i = {l: i for i, l in enumerate(all_labels)}
        for rows in dataset.values():
            for row in rows:
                row[beh] = np.atleast_1d([l_to_i[int(row[beh][0])]])
        config["method"]["model_kwargs"]["n_labels"] = len(all_labels)

        def accuracy(model, model_inputs, unused_inputs, outputs, **kwargs):
            # argmax on device: ships (B,) ints instead of the (B, C) logits.
            prepared = kwargs.get("prepared")
            preds = np.asarray(
                prepared if prepared is not None else outputs["preds"].argmax(-1)
            )
            targets = np.asarray(model_inputs["targets"])[:, 0]
            return (preds == targets).sum() / preds.shape[0]

        # Dispatch the argmax right behind the train step in the device FIFO
        # so the lagged drain only transfers a ready (B,) buffer.
        accuracy.prepare = lambda outputs: outputs["preds"].argmax(-1)
        metric_fns["accuracy"] = accuracy

    # ------------------------------------------------------ CTC CER metric
    # Gated on a loaded vocab: the reference's cer closure would hit a
    # NameError for a ctc run without data.vocab_file (reference main.py:
    # 67-72 reads `vocab` set only in the speechbci branch) — it only ever
    # pairs ctc with speechbci. We train fine without the metric and say so.
    if config.method.model_kwargs.method_name == "ctc" and vocab is None:
        print(
            "CTC method without data.vocab_file: skipping the CER metric "
            "(labels train fine; decode metrics need the phoneme vocab).",
            flush=True,
        )
    if config.method.model_kwargs.method_name == "ctc" and vocab is not None:

        def make_cer(n_print_default=0):
            def cer(model, model_inputs, unused_inputs, outputs, **kwargs):
                # argmax on device, then ONE host transfer of (B, T') ints —
                # iterating format_ctc over a device array would sync per
                # element, and pulling the raw (B, T', V) f32 logits is ~160x
                # the bytes. ``prepared`` carries the argmax dispatched right
                # after the train step (Trainer's lagged-metric protocol).
                prepared = kwargs.get("prepared")
                preds = np.asarray(
                    prepared if prepared is not None else outputs["preds"].argmax(-1)
                )
                pred_strs = [" ".join(format_ctc(p, vocab, blank_id)) for p in preds]
                phonemes = [" ".join(p) for p in unused_inputs["phonemes"]]
                errors, n_phonemes = word_error_count(pred_strs, phonemes)
                for i in range(min(kwargs.get("n_print", n_print_default), len(pred_strs))):
                    print(
                        pred_strs[i].replace(" ", "").replace("SIL", " SIL "),
                        "\n#####\n ",
                        phonemes[i].replace(" ", "").replace("SIL", " SIL "),
                        "\n#####\n ",
                        unused_inputs["sentence"][i],
                        "\n#####\n\n ",
                    )
                return errors / n_phonemes

            return cer

        def train_cer(model, model_inputs, unused_inputs, outputs, **kwargs):
            kwargs = {**kwargs, "n_print": 0}
            return make_cer()(model, model_inputs, unused_inputs, outputs, **kwargs)

        train_cer.prepare = lambda outputs: outputs["preds"].argmax(-1)
        metric_fns["CER"] = train_cer
        eval_metric_fns["CER"] = make_cer(1)

    # --------------------------------------------- end-to-end assisted WER
    if config.method.model_kwargs.method_name == "endtoend":

        def assisted_wer(model, model_inputs, unused_inputs, outputs, **kwargs):
            prepared = kwargs.get("prepared")
            preds = np.asarray(
                prepared if prepared is not None else outputs["preds"].argmax(-1)
            )[:, :-1]
            targets = np.asarray(outputs["targets"])[:, 1:]
            pred_sentences = [
                tokenizer.decode(p[t != -100], skip_special_tokens=True)
                for t, p in zip(targets, preds)
            ]
            target_sentences = unused_inputs["sentence"]
            errors, n_words = word_error_count(pred_sentences, target_sentences)
            return errors / n_words

        assisted_wer.prepare = lambda outputs: outputs["preds"].argmax(-1)
        metric_fns["A-WER"] = assisted_wer

    # ------------------------------------- dataset-dependent config surgery
    spikes_name = (
        "spikes"
        if "spikes" in dataset["train"][0]
        else config.method.dataset_kwargs.spikes_name
    )
    if config.model.model_class in ("iTransformer", "PatchTST"):
        if config.model.model_class == "PatchTST":
            config["model"]["encoder"]["num_input_channels"] = dataset["train"][0][
                spikes_name
            ].shape[1]
            p = config.model.encoder.patch_length
            context = (
                (
                    max(
                        row[spikes_name].shape[0]
                        for split in dataset.keys()
                        for row in dataset[split]
                    )
                    + p
                    - 1
                )
                // p
            ) * p
            config["model"]["encoder"]["context_length"] = context
        else:
            context = max(
                row[spikes_name].shape[0]
                for split in dataset.keys()
                for row in dataset[split]
            )
            config["model"]["encoder"]["embedder"]["max_n_bins"] = context
        pad_spec = {
            "dim": 0,
            "side": "left",
            "value": 0,
            "truncate": context,
            "min_length": context,
        }
        config = update_config(
            config,
            DictConfig(
                {
                    "method": {
                        "dataloader_kwargs": {
                            "pad_dict": {
                                "spikes": dict(pad_spec),
                                "spikes_mask": dict(pad_spec),
                                "spikes_timestamp": dict(pad_spec),
                            }
                        }
                    }
                }
            ),
        )
    elif config.model.model_class == "NDT1":
        config["model"]["encoder"]["embedder"]["n_channels"] = dataset["train"][0][
            "spikes"
        ].shape[1]

    trainer = Trainer(
        config,
        dataset=dataset,
        metric_fns=metric_fns or None,
        eval_metric_fns=eval_metric_fns or None,
    )
    # Crash/preemption recovery: `-k training.resume=true` continues from the
    # newest full train-state checkpoint when one exists, else starts fresh —
    # safe to leave on in an auto-restarting launcher.
    if bool(trainer.config.training.get("resume", False)):
        try:
            step = trainer.resume_from()
            trainer.print_v(f"Resumed training from step {step}", verbosity=0)
        except FileNotFoundError:
            trainer.print_v("No checkpoint to resume from; starting fresh", verbosity=0)
    trainer.train()
    return trainer


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c",
        "--config_file",
        type=str,
        help="File (.yaml) with configuration for training",
        default="none",
    )
    parser.add_argument("-k", "--kwargs", nargs="*", action=ParseKwargs)
    args = parser.parse_args()
    main(args)
