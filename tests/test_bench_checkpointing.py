"""The driver records the LAST JSON line of ``bench.py``'s stdout, so the
7B block (~1 h of legs on the dev chip) checkpoints its partial results
via ``bench_bci7b(on_partial=...)`` as each sub-leg lands — a wall-clock
cut or a deterministic failure in a later leg must not lose the numbers
already measured. This drives that protocol with stubbed leg functions
(no TPU, no jax) and pins the callback order and the accumulated keys.
"""
import importlib.util
import os
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.setenv("BENCH_SKIP_7B32", "0")
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_for_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_for_test"] = mod
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.modules.pop("bench_for_test", None)


def _stub_legs(monkeypatch, bench, fail_on=None):
    """Stub the two leg functions bench_bci7b composes. ``fail_on`` names a
    (fn, key_prefix/llm marker) at which to raise."""
    def fake_bci(chain=1, quant=None, llm="bench", n_layers=None, remat=False,
                 key_prefix="bci"):
        if fail_on == key_prefix:
            raise RuntimeError(f"boom in {key_prefix}")
        return {
            f"{key_prefix}_mfu": 0.5,
            f"{key_prefix}_lora_samples_per_sec": 40.0 if key_prefix == "bci7b" else 18.0,
        }

    def fake_generate(greedy_only=False, quant=None, llm="bench", n_layers=None):
        tag = "int8" if quant == "int8" else "bf16"
        if fail_on == f"gen-{tag}-{n_layers}":
            raise RuntimeError(f"boom in generate {tag}")
        out = {"greedy_tokens_per_sec": 1000.0 if quant is None else 1500.0}
        if not greedy_only:
            out["beam5_sequences_per_sec"] = 25.0
        return out

    monkeypatch.setattr(bench, "bench_bci", fake_bci)
    monkeypatch.setattr(bench, "bench_generate", fake_generate)


def test_bci7b_checkpoints_after_every_leg(monkeypatch, bench):
    _stub_legs(monkeypatch, bench)
    calls = []
    out = bench.bench_bci7b(on_partial=lambda d, pending: calls.append((dict(d), pending)))

    # full-depth legs run FIRST (highest information value if the wall
    # clock cuts the block), with a checkpoint after every sub-leg
    assert [p for _, p in calls] == [
        "32L fine-tune + 16L legs", "16L legs", "16L decode A/B legs",
    ]
    # keys accumulate monotonically
    assert set(calls[0][0]) == {
        "bci7b32_int8_greedy_tokens_per_sec",
        "bci7b32_int8_beam5_sequences_per_sec",
    }
    assert "bci7b32_lora_samples_per_sec" in calls[1][0]
    assert "bci7b_mfu" in calls[2][0]
    # the final return carries everything, including the last leg
    assert out["bci7b32_lora_samples_per_sec"] == 18.0
    assert out["bci7b32_train_layers"] == 32
    assert out["bci7b_int8_vs_bf16"] == 1.5


def test_bci7b_failure_in_last_leg_keeps_measured_keys(monkeypatch, bench):
    """A deterministic failure in the 32L fine-tune must surface (no blind
    retry, r4 advisor finding) while the serving keys measured before it
    survive via the last checkpoint callback."""
    _stub_legs(monkeypatch, bench, fail_on="bci7b32")
    calls = []
    with pytest.raises(RuntimeError, match="boom in bci7b32"):
        bench.bench_bci7b(on_partial=lambda d, p: calls.append((dict(d), p)))
    # the last checkpoint before the failure has the 32L serving numbers
    last = calls[-1][0]
    assert calls[-1][1] == "32L fine-tune + 16L legs"
    assert last["bci7b32_int8_greedy_tokens_per_sec"] == 1500.0
    assert last["bci7b32_int8_beam5_sequences_per_sec"] == 25.0


def test_bci7b_transient_relay_abort_retries_once(monkeypatch, bench):
    """Only the known transient ('response body closed...') is retried;
    it recovers on the second attempt and the leg's numbers land."""
    attempts = {"n": 0}

    def flaky_bci(chain=1, quant=None, llm="bench", n_layers=None, remat=False,
                  key_prefix="bci"):
        if key_prefix == "bci7b":
            attempts["n"] += 1
            if attempts["n"] == 1:
                raise RuntimeError(
                    "response body closed before all bytes were read"
                )
        return {f"{key_prefix}_mfu": 0.5,
                f"{key_prefix}_lora_samples_per_sec": 40.0}

    def fake_generate(greedy_only=False, quant=None, llm="bench", n_layers=None):
        out = {"greedy_tokens_per_sec": 1000.0}
        if not greedy_only:
            out["beam5_sequences_per_sec"] = 25.0
        return out

    monkeypatch.setattr(bench, "bench_bci", flaky_bci)
    monkeypatch.setattr(bench, "bench_generate", fake_generate)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench.bench_bci7b()
    assert attempts["n"] == 2
    assert out["bci7b_mfu"] == 0.5
