"""Real-time BCI decode loop: exported NDT1-CTC artifact + streaming
prefix beam search (docs/serving.md).

The real-time serving design splits the work across two overlappable
stages:

  device:  spike window -> per-frame phoneme log-probs
           (the ``export_forward`` artifact — static-shape, one program)
  host:    frame log-probs -> live transcript
           (``CTCPrefixDecoder`` — carries the beam state across windows,
           so chunked decoding is exactly the one-shot search)

This walkthrough simulates a session: an untrained debug NDT1-CTC model
is exported, a synthetic utterance streams through window by window, and
the host decoder prints the running best hypothesis with per-stage
timings. Beyond-reference surface: upstream has no real-time path (it
batch-evaluates WER offline, ``/root/reference/eval_phonemes.py``).

Runs self-contained on synthetic data:
  python examples/realtime_ctc_decode.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

WINDOW_T = 128          # spike bins per device window
N_WINDOWS = 4
BIN_MS = 20             # competition data: 20 ms bins -> 2.56 s windows


def main():
    import __graft_entry__ as g

    from llm_bci_tpu.eval.ctc_decode import CTCPrefixDecoder
    from llm_bci_tpu.serving import export_forward, load_decode

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "vocab.json")) as f:
        vocab = json.load(f)

    print("== build + export the spikes -> log-probs artifact (B=1 window) ==")
    model = g._ndt1_ctc_model(max_F=WINDOW_T)
    full = g._ndt1_batch(B=1, T=WINDOW_T)
    params = model.init(jax.random.PRNGKey(0), **full, training=False)["params"]
    serve = {k: v for k, v in full.items() if not k.startswith("targets")}
    const = {k: v for k, v in full.items() if k.startswith("targets")}

    path = os.path.join(tempfile.mkdtemp(), "ctc_window.jaxexport")
    t0 = time.perf_counter()
    export_forward(model, params, serve, path, outputs=("preds",),
                   const_inputs=const)
    print(f"   wrote {os.path.getsize(path) / 1e6:.2f} MB "
          f"in {time.perf_counter() - t0:.1f}s -> {path}")
    fn = load_decode(path)

    print(f"== stream {N_WINDOWS} windows of {WINDOW_T} bins "
          f"({WINDOW_T * BIN_MS / 1000:.2f}s of neural data each) ==")
    rng = np.random.default_rng(7)
    decoder = CTCPrefixDecoder(beam_width=16, blank_id=0)
    dev_ms = host_ms = 0.0
    for w in range(N_WINDOWS):
        window = dict(serve)
        window["spikes"] = rng.poisson(
            1.0, size=serve["spikes"].shape).astype(np.float32)

        t0 = time.perf_counter()
        out = fn(params, window)
        logprobs = np.asarray(out["preds"][0], dtype=np.float64)  # (T', V)
        t1 = time.perf_counter()
        labels, logp = decoder.step(logprobs)
        t2 = time.perf_counter()

        dev_ms += (t1 - t0) * 1e3
        host_ms += (t2 - t1) * 1e3
        live = " ".join(vocab[i] for i in labels) or "(silence)"
        print(f"   window {w}: forward {(t1 - t0) * 1e3:6.1f} ms | "
              f"decode {(t2 - t1) * 1e3:5.1f} ms | live: {live}")

    labels, logp = decoder.best()
    print(f"== final hypothesis ({len(labels)} phonemes, log-prob {logp:.2f}) ==")
    print("  ", " ".join(vocab[i] for i in labels) or "(silence)")

    frames = N_WINDOWS * (np.asarray(full["spikes"]).shape[1] - 8) // 4
    budget_ms = N_WINDOWS * WINDOW_T * BIN_MS
    print(f"== budget: {dev_ms + host_ms:.0f} ms compute for {budget_ms} ms "
          f"of signal ({(dev_ms + host_ms) / budget_ms:.1%} duty cycle; "
          f"host decode {host_ms / max(frames, 1):.2f} ms/frame, beam 16) ==")
    # the two stages pipeline in a real deployment: window k+1's device
    # forward runs while window k decodes on the host
    assert dev_ms + host_ms < budget_ms, "slower than real time on this host"
    print("== real-time on this host ==")


if __name__ == "__main__":
    main()
