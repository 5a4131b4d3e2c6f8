"""WER evaluation of a saved BCI checkpoint: batch-1 generation + decoding.

Rebuilds reference ``eval_phonemes.py:34-123``: reload the trainer config
saved with a checkpoint, rebuild the Trainer with ``test_batch_size=1``, and
drive ``trainer.evaluate`` with a WER metric fn that strips the target
tokens from the prompt, generates with greedy or beam search (jitted KV-cache
decode instead of HF ``generate``), decodes, and accumulates word errors.

Usage:
  python eval_phonemes.py -k from_pt=checkpoints/bci/STEP500 beams=5 \
      savestring=wer_run test_len=50
  # the reference's beam sweep (its analysis block evaluates beams
  # 1,3,5,10,25,50 — /root/reference/eval_phonemes.py:141) in ONE process,
  # writing <savestring>_<k>.pkl per beam size (the naming analyze_cli
  # groups on):
  python eval_phonemes.py -k from_pt=... beams=1,3,5,10,25,50
  # serve the frozen base int8 (weight-only PTQ of the saved kernels):
  python eval_phonemes.py -k from_pt=... quantize=int8

Compile cost: unlike the reference (HF generate = eager torch, no compile),
each beam size K jit-compiles its own decode program (~10 s for K=1 up to
~160 s for K=50 at bench-model scale). To make repeated sweeps practical,
this script enables JAX's persistent compilation cache (default
``~/.cache/llm_bci_tpu/xla``; override with -k compilation_cache=<dir>,
disable with compilation_cache=off): a re-run of the same sweep — after a
crash, with different test_len, on the next checkpoint with identical
shapes — loads every program from disk instead of recompiling. Measured
sweep wallclocks (cold vs warm cache): docs/performance.md "beam sweep".

Also includes the offline analysis helpers of the reference
(``eval_phonemes.py:128-260``): bootstrap-CI WER and best-of-k curves over
the incrementally saved predictions.
"""
from __future__ import annotations

import argparse
import os
import pickle
import time

import numpy as np

from llm_bci_tpu.config import DictConfig, ParseKwargs, config_from_kwargs, update_config
from llm_bci_tpu.data.speechbci import create_llm_labels, load_competition_data
from llm_bci_tpu.eval.eval_bci import word_error_count
from llm_bci_tpu.training.trainer import Trainer


def setup_compilation_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/llm_bci_tpu/xla``) so every jitted decode program — one per
    beam size — compiles once EVER per (model shapes, K), not once per
    process. Pass ``"off"``/``"none"`` to disable. Safe to call before any
    device use; returns the directory or None when disabled."""
    cache_dir = str(
        cache_dir or os.path.expanduser("~/.cache/llm_bci_tpu/xla")
    )
    if cache_dir.lower() in ("off", "none", "0", "false"):
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program that took >=1 s to build: the per-K decode
    # programs are the cost; trivial host-callback jits aren't worth disk.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def main(args):
    kwargs = config_from_kwargs(args.kwargs)
    beams = kwargs.get("beams", 1)
    # "5" → [5]; "1,3,5,10,25,50" → the reference's sweep in one process.
    beam_list = [int(b) for b in str(beams).split(",") if str(b).strip()]
    from_pt = kwargs.get("from_pt")
    if not from_pt:
        raise SystemExit("pass -k from_pt=<checkpoint dir containing trainer_config.yaml>")
    savestring = kwargs.get("savestring", "test_decoding")
    test_len = kwargs.get("test_len")
    setup_compilation_cache(kwargs.get("compilation_cache"))

    # ours (trainer_config.yaml) or a reference checkpoint's torch-pickled
    # trainer_config.pth (reference models/trainer.py:412) — migrated
    # checkpoints evaluate directly (override stale paths with -k).
    from llm_bci_tpu.interop import load_saved_component_config

    saved_cfg = load_saved_component_config(from_pt, "trainer")
    if saved_cfg is None:
        raise SystemExit(f"{from_pt}: no trainer_config.yaml/.pth found")
    config = DictConfig(saved_cfg)
    config["model"]["from_pt"] = from_pt
    config["training"]["test_batch_size"] = 1
    config["data"]["test_len"] = test_len
    config["method"]["metric_kwargs"]["n_beams"] = beam_list[0]
    # -k quantize=int8: serve the frozen LLM base int8 (weight-only) even
    # from a bf16-trained checkpoint — the restore path post-training-
    # quantizes the saved kernels (ops/quant.py adapt_quantization).
    if kwargs.get("quantize"):
        config["method"]["model_kwargs"]["quantize"] = kwargs["quantize"]

    dataset = load_competition_data(**config.data)
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(
        config.data.tokenizer_path, add_bos_token=False, add_eos_token=False
    )
    dataset = create_llm_labels(dataset, tokenizer, config.data.prompt)

    # Mutated per sweep step: the metric fn appends into the CURRENT beam
    # size's prediction list / pickle (named <savestring>_<k>.pkl when
    # sweeping — the grouping convention analyze_cli reads back).
    run = {"preds": [], "path": f"{savestring}.pkl"}

    def wer(model, model_inputs, unused_inputs, outputs, **kw):
        all_preds = run["preds"]
        import jax.numpy as jnp

        # Strip the target sentence AND the pad (unk) tokens: the reference
        # keeps prompt positions with targets == -100 and input_ids !=
        # unk_token_id (eval_phonemes.py:45) — right-pad tokens also carry
        # -100 targets, and leaving them in would let generation attend
        # a tail of unk tokens the reference never sees.
        input_ids = np.asarray(model_inputs["input_ids"])
        targets = np.asarray(model_inputs["targets"])
        unk_id = tokenizer.unk_token_id or 0
        keep = (targets[0] == -100) & (input_ids[0] != unk_id)
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
        with open(run["path"], "wb") as f:
            pickle.dump(all_preds, f)
        return errors / n_words

    trainer = Trainer(config, dataset=dataset, metric_fns={"WER": wer})
    all_metrics = {}
    for k in beam_list:
        trainer.metric_kwargs["n_beams"] = k
        run["preds"] = []
        run["path"] = (
            f"{savestring}_{k}.pkl" if len(beam_list) > 1 else f"{savestring}.pkl"
        )
        t0 = time.perf_counter()
        _, metrics = trainer.evaluate(eval_train_set=False)
        dt = time.perf_counter() - t0
        print(f"beams={k}: WER {metrics['WER']:.4f} ({dt:.1f}s)")
        all_metrics[k] = metrics
    return all_metrics if len(beam_list) > 1 else all_metrics[beam_list[0]]


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


def wer_bootstrap_distributions(
    preds_file: str, tokenizer, n_boot: int = 1000, seed: int = 0
):
    """Paired bootstrap vectors for top-beam WER and best-of-k WER over one
    predictions pickle: the same resample index set drives both curves, as in
    the reference's statistics block (``eval_phonemes.py:136-163``)."""
    all_preds = pickle.load(open(preds_file, "rb"))
    words, errors, best_errors = [], [], []
    for tokens, target in all_preds:
        tokens = np.asarray(tokens)
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        per_beam = [
            word_error_count(
                tokenizer.decode(beam, skip_special_tokens=True).strip(), target
            )
            for beam in tokens
        ]
        words.append(per_beam[0][1])
        errors.append(per_beam[0][0])
        best_errors.append(min(e for e, _ in per_beam))
    words = np.asarray(words)
    errors = np.asarray(errors)
    best_errors = np.asarray(best_errors)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(words), size=(n_boot, len(words)))
    return {
        "wer": errors.sum() / words.sum(),
        "best_wer": best_errors.sum() / words.sum(),
        "boots_wer": errors[idx].sum(1) / words[idx].sum(1),
        "boots_best": best_errors[idx].sum(1) / words[idx].sum(1),
    }


def _grouped_bar_figure(stats, boot_key, ylabel, xlabel, out_path):
    """Grouped bars (one group per beam size, one bar per run label) with
    95% bootstrap CI whiskers — the reference's figure layout
    (``eval_phonemes.py:172-240``), rendered from our stats."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = list(stats)
    beams_axis = sorted({b for m in stats.values() for b in m})
    x = np.arange(len(beams_axis))
    width = 0.8 / max(len(labels), 1)
    fig, ax = plt.subplots(figsize=(10, 6))
    for j, lab in enumerate(labels):
        pos, means, lo, hi = [], [], [], []
        # Labels may cover different beam-size sets (e.g. a greedy-only
        # baseline next to beam sweeps): plot each label only at the beam
        # sizes it actually has.
        for xi, b in zip(x, beams_axis):
            if b not in stats[lab]:
                continue
            boots = stats[lab][b][boot_key] * 100.0
            m = boots.mean()
            p_lo, p_hi = np.percentile(boots, [2.5, 97.5])
            pos.append(xi)
            means.append(m)
            lo.append(m - p_lo)
            hi.append(p_hi - m)
        ax.bar(
            np.asarray(pos) + (j - (len(labels) - 1) / 2) * width,
            means,
            yerr=[lo, hi],
            width=width,
            label=lab,
            capsize=3,
        )
    ax.set_xlabel(xlabel, fontsize=14)
    ax.set_ylabel(ylabel, fontsize=14)
    ax.set_xticks(x)
    ax.set_xticklabels([str(b) for b in beams_axis], fontsize=13)
    ax.grid(True, which="both", linestyle="--", linewidth=0.5)
    ax.minorticks_on()
    ax.legend(fontsize=13)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def analyze(
    preds_files,
    tokenizer,
    out_dir: str = "plots/bci",
    n_boot: int = 1000,
    seed: int = 0,
):
    """Offline analysis of saved predictions: writes the reference's two
    figures (``wer.png``: top-beam WER vs beam size; ``best_wer.png``:
    best-of-k oracle WER) plus ``examples.json`` (per-sentence decodes
    sorted by WER, reference ``eval_phonemes.py:245-260``).

    ``preds_files``: ``{run_label: {beams: path_to_pickle}}``.
    Returns the per-run stats dict."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    stats = {
        lab: {
            b: wer_bootstrap_distributions(path, tokenizer, n_boot, seed)
            for b, path in sorted(m.items())
        }
        for lab, m in preds_files.items()
    }
    _grouped_bar_figure(
        stats, "boots_wer", "Word Error Rate (%)", "Beam size",
        os.path.join(out_dir, "wer.png"),
    )
    _grouped_bar_figure(
        stats, "boots_best", "Best Word Error Rate (%)", "Top-$k$",
        os.path.join(out_dir, "best_wer.png"),
    )

    first_lab = next(iter(preds_files))
    first_path = preds_files[first_lab][sorted(preds_files[first_lab])[-1]]
    examples = []
    for tokens, target in pickle.load(open(first_path, "rb")):
        tokens = np.asarray(tokens)
        best = tokens[0] if tokens.ndim > 1 else tokens
        pred = tokenizer.decode(best, skip_special_tokens=True).strip()
        e, w = word_error_count(pred, target)
        examples.append([pred, target, int(e), int(w)])
    examples.sort(key=lambda ex: ex[2] / max(ex[3], 1))
    with open(os.path.join(out_dir, "examples.json"), "w") as f:
        json.dump(examples, f, indent=1)
    return stats


def analyze_cli(kwargs) -> None:
    """``python eval_phonemes.py --analyze -k preds=lora_1.pkl,lora_5.pkl
    tokenizer_path=... out_dir=plots/bci``. Files named ``<label>_<beams>.pkl``
    group into one bar series per label; other stems become their own
    single-beam series."""
    preds = kwargs.get("preds")
    if not preds:
        raise SystemExit("pass -k preds=<comma-separated predictions pickles>")
    tok_path = kwargs.get("tokenizer_path")
    if not tok_path:
        raise SystemExit("pass -k tokenizer_path=<tokenizer dir>")
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tok_path)
    files: dict = {}
    for path in str(preds).split(","):
        stem = os.path.splitext(os.path.basename(path))[0]
        lab, _, tail = stem.rpartition("_")
        if lab and tail.isdigit():
            files.setdefault(lab, {})[int(tail)] = path
        else:
            files.setdefault(stem, {})[1] = path
    stats = analyze(
        files,
        tokenizer,
        out_dir=str(kwargs.get("out_dir", "plots/bci")),
        n_boot=int(kwargs.get("n_boot", 1000)),
        seed=int(kwargs.get("seed", 0)),
    )
    for lab, m in stats.items():
        for b, s in m.items():
            print(
                f"{lab} beams={b}: WER {100 * s['wer']:.2f}% "
                f"best-of-k {100 * s['best_wer']:.2f}%"
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_file", type=str, default="none")
    parser.add_argument("--analyze", action="store_true")
    parser.add_argument("-k", "--kwargs", nargs="*", action=ParseKwargs)
    args = parser.parse_args()
    if args.analyze:
        analyze_cli(config_from_kwargs(args.kwargs))
    else:
        main(args)
