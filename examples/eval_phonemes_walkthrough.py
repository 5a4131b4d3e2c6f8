"""Interactive WER-evaluation walkthrough (two-stage PhonemeLLM pipeline).

Script equivalent of the reference's ``notebooks/eval_phonemes.ipynb``:
build a debug-size PhonemeLLM, splice synthetic CTC phoneme posteriors into
the prompt, generate with greedy + beam search, and score WER.

Runs self-contained on synthetic data (no checkpoints needed):
  python examples/eval_phonemes_walkthrough.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llm_bci_tpu.eval.eval_bci import word_error_count
from llm_bci_tpu.models.phoneme_llm import PhonemeLLM


def main():
    model = PhonemeLLM.from_config({}, debug=True)
    rng = np.random.default_rng(0)
    B, L, P, V = 2, 10, 6, 41
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 32000, size=(B, L))),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "input_split": jnp.full((B,), 4, jnp.int32),
        "phoneme_probs": jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, P, V)).astype(np.float32)), -1
        ),
        "phonemes_mask": jnp.ones((B, P), jnp.int32),
        "targets": jnp.asarray(
            np.concatenate(
                [np.full((B, 6), -100), rng.integers(3, 32000, size=(B, 4))], axis=1
            )
        ),
    }
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]

    out = model.apply({"params": params}, **batch, training=False)
    print(f"loss={float(out.loss):.2f} over {int(out.n_examples)} target tokens")

    gen_inputs = {k: v for k, v in batch.items() if k != "targets"}
    t0 = time.perf_counter()
    greedy = model.apply(
        {"params": params}, **gen_inputs, max_new_tokens=8, method="generate"
    )
    print(f"greedy tokens {np.asarray(greedy)[0]} in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    beam = model.apply(
        {"params": params}, **gen_inputs, max_new_tokens=8, num_beams=4,
        method="generate",
    )
    print(f"beam-4 tokens {np.asarray(beam)[0]} in {time.perf_counter()-t0:.1f}s")

    errors, words = word_error_count("the cat sat on a mat", "the cat sat on the mat")
    print(f"word_error_count demo: {errors}/{words} = {errors/words:.3f} WER")


if __name__ == "__main__":
    main()
