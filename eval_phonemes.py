"""WER evaluation of a saved BCI checkpoint: batch-1 generation + decoding.

Rebuilds reference ``eval_phonemes.py:34-123``: reload the trainer config
saved with a checkpoint, rebuild the Trainer with ``test_batch_size=1``, and
drive ``trainer.evaluate`` with a WER metric fn that strips the target
tokens from the prompt, generates with greedy or beam search (jitted KV-cache
decode instead of HF ``generate``), decodes, and accumulates word errors.

Usage:
  python eval_phonemes.py -k from_pt=checkpoints/bci/STEP500 beams=5 \
      savestring=wer_run test_len=50

Also includes the offline analysis helpers of the reference
(``eval_phonemes.py:128-260``): bootstrap-CI WER and best-of-k curves over
the incrementally saved predictions.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import yaml

from llm_bci_tpu.config import DictConfig, ParseKwargs, config_from_kwargs, update_config
from llm_bci_tpu.data.speechbci import create_llm_labels, load_competition_data
from llm_bci_tpu.eval.eval_bci import word_error_count
from llm_bci_tpu.training.trainer import Trainer


def main(args):
    kwargs = config_from_kwargs(args.kwargs)
    beams = kwargs.get("beams", 1)
    from_pt = kwargs.get("from_pt")
    if not from_pt:
        raise SystemExit("pass -k from_pt=<checkpoint dir containing trainer_config.yaml>")
    savestring = kwargs.get("savestring", "test_decoding")
    test_len = kwargs.get("test_len")

    config = DictConfig(yaml.safe_load(open(os.path.join(from_pt, "trainer_config.yaml"))))
    config["model"]["from_pt"] = from_pt
    config["training"]["test_batch_size"] = 1
    config["data"]["test_len"] = test_len
    config["method"]["metric_kwargs"]["n_beams"] = beams

    dataset = load_competition_data(**config.data)
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(
        config.data.tokenizer_path, add_bos_token=False, add_eos_token=False
    )
    dataset = create_llm_labels(dataset, tokenizer, config.data.prompt)

    all_preds = []

    def wer(model, model_inputs, unused_inputs, outputs, **kw):
        import jax.numpy as jnp

        # Strip the target sentence: keep prompt tokens (targets == -100).
        input_ids = np.asarray(model_inputs["input_ids"])
        targets = np.asarray(model_inputs["targets"])
        keep = targets[0] == -100
        prompt_ids = input_ids[:, keep]
        gen_inputs = {
            k: jnp.asarray(np.asarray(v))
            for k, v in model_inputs.items()
            if k in (
                "input_split", "spikes", "spikes_mask", "spikes_timestamp",
                "spikes_lengths", "block_idx", "day_idx",
            )
        }
        n_beams = int(kw.get("n_beams", 1))
        # Reference gen config (eval_phonemes.py:53-71): diverse beam search
        # with one group per beam, diversity_penalty 1.2, all beams returned
        # so the offline best-of-k analysis is meaningful.
        result = model.generate(
            input_ids=jnp.asarray(prompt_ids),
            attention_mask=jnp.ones_like(jnp.asarray(prompt_ids)),
            **gen_inputs,
            max_new_tokens=20,
            num_beams=n_beams,
            num_return_sequences=n_beams,
            num_beam_groups=n_beams if n_beams > 1 else 1,
            diversity_penalty=1.2 if n_beams > 1 else 0.0,
            pad_token_id=tokenizer.unk_token_id or 0,
            eos_token_id=tokenizer.eos_token_id or 2,
        )
        if n_beams > 1:
            tokens = result.sequences[0]          # (k, T_new), best first
        else:
            tokens = result                        # (1, T_new)
        pred_sentence = tokenizer.decode(
            np.asarray(tokens)[0], skip_special_tokens=True
        ).strip()
        target_sentence = unused_inputs["sentence"][0]
        errors, n_words = word_error_count(pred_sentence, target_sentence)
        print("-" + pred_sentence + "-", "\n#####\n")
        print("-" + target_sentence + "-", "\n#####\n\n ")
        all_preds.append((np.asarray(tokens), target_sentence))
        with open(f"{savestring}.pkl", "wb") as f:
            pickle.dump(all_preds, f)
        return errors / n_words

    trainer = Trainer(config, dataset=dataset, metric_fns={"WER": wer})
    _, metrics = trainer.evaluate(eval_train_set=False)
    print(f"WER: {metrics['WER']:.4f}")
    return metrics


# ------------------------------------------------------------------ analysis

def bootstrap_wer_ci(
    preds_file: str, tokenizer, n_boot: int = 1000, seed: int = 0
):
    """Bootstrap confidence interval for WER over saved predictions
    (reference ``eval_phonemes.py:128-203`` analysis block)."""
    all_preds = pickle.load(open(preds_file, "rb"))
    pairs = []
    for tokens, target in all_preds:
        pred = tokenizer.decode(np.asarray(tokens)[0], skip_special_tokens=True).strip()
        pairs.append(word_error_count(pred, target))
    errors = np.array([e for e, _ in pairs])
    words = np.array([w for _, w in pairs])
    rng = np.random.default_rng(seed)
    boots = []
    for _ in range(n_boot):
        idx = rng.integers(0, len(pairs), len(pairs))
        boots.append(errors[idx].sum() / words[idx].sum())
    boots = np.sort(boots)
    return {
        "wer": errors.sum() / words.sum(),
        "ci_low": float(boots[int(0.025 * n_boot)]),
        "ci_high": float(boots[int(0.975 * n_boot)]),
    }


def best_of_k_wer(preds_file: str, tokenizer):
    """Oracle WER over the k returned beams per example
    (reference ``eval_phonemes.py:208-240``)."""
    all_preds = pickle.load(open(preds_file, "rb"))
    total_errors, total_words = 0, 0
    for tokens, target in all_preds:
        tokens = np.asarray(tokens)
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        best = None
        for beam in tokens:
            pred = tokenizer.decode(beam, skip_special_tokens=True).strip()
            e, w = word_error_count(pred, target)
            if best is None or e / max(w, 1) < best[0] / max(best[1], 1):
                best = (e, w)
        total_errors += best[0]
        total_words += best[1]
    return total_errors / total_words


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_file", type=str, default="none")
    parser.add_argument("-k", "--kwargs", nargs="*", action=ParseKwargs)
    main(parser.parse_args())
