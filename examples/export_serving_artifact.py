"""Serving-export walkthrough: train a debug BCI model for a couple of
steps, export the decode program as a StableHLO artifact, reload it, and
decode — the full deploy loop (docs/serving.md).

Beyond-reference surface: upstream serves by running torch + HF
``generate`` in-process; here the compiled program ships as a file and
the serving host needs jax + the PJRT plugin only.

Runs self-contained on synthetic data:
  python examples/export_serving_artifact.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    # tests double as fixtures: the same debug config the suite trains
    from tests.test_bci import bci_config, synth_bci_dataset

    from llm_bci_tpu.ops import spmd
    from llm_bci_tpu.serving import export_decode, load_decode
    from llm_bci_tpu.training import Trainer

    tmp = tempfile.mkdtemp()
    print("== train a debug BCI model (2 steps) ==")
    trainer = Trainer(bci_config(Path(tmp)), dataset=synth_bci_dataset())
    trainer.train()
    spmd.set_op_mesh(None)  # single-program export

    batch, _ = next(iter(trainer.test_dataloader))
    inputs = {
        k: np.asarray(v)
        for k, v in batch.items()
        if k in (
            "input_ids", "attention_mask", "input_split", "spikes",
            "spikes_mask", "spikes_timestamp", "spikes_lengths",
            "block_idx", "day_idx",
        )
    }
    params = jax.device_get(trainer.state.params)

    print("== export the diverse-beam decode (the WER-eval config) ==")
    path = os.path.join(tmp, "decode.jaxexport")
    t0 = time.perf_counter()
    export_decode(
        trainer.model, params, inputs, path,
        max_new_tokens=8, num_beams=3, num_beam_groups=3,
        diversity_penalty=1.2,
    )
    print(f"   wrote {os.path.getsize(path) / 1e6:.2f} MB "
          f"in {time.perf_counter() - t0:.1f}s -> {path}")

    print("== reload + decode (no model class needed) ==")
    fn = load_decode(path)
    print(f"   artifact platforms: {fn.platforms}")
    tokens = fn(params, inputs)
    print(f"   decoded tokens {np.asarray(tokens).shape}:")
    print(np.asarray(tokens))

    ref = trainer.model.apply(
        {"params": params}, **inputs, method="generate",
        max_new_tokens=8, num_beams=3, num_beam_groups=3,
        diversity_penalty=1.2,
    )
    assert np.array_equal(np.asarray(tokens), np.asarray(ref))
    print("== artifact output matches the in-process generate ==")


if __name__ == "__main__":
    main()
