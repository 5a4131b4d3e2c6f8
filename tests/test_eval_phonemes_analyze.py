"""The --analyze figure path of eval_phonemes.py: the reference's two
published figures (WER vs beams, best-of-k) plus examples.json must render
from saved predictions pickles (reference eval_phonemes.py:172-260)."""
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eval_phonemes import analyze, best_of_k_wer, bootstrap_wer_ci


class StubTokenizer:
    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(i)) for i in np.atleast_1d(ids) if int(i) > 2)


def _write_preds(path, n=12, k=3, seed=0):
    """(tokens (k, L), target str) pairs; beam 0 has one word wrong for
    half the rows, some later beam is always exact."""
    rng = np.random.default_rng(seed)
    tok = StubTokenizer()
    rows = []
    for i in range(n):
        words = rng.integers(10, 99, size=5)
        target = tok.decode(words)
        beams = np.tile(words, (k, 1))
        if i % 2 == 0:
            beams[0, 0] = 7  # skip-token: beam 0 drops a word
        rows.append((beams, target))
    with open(path, "wb") as f:
        pickle.dump(rows, f)
    return path


def test_analyze_writes_figures_and_examples(tmp_path):
    tok = StubTokenizer()
    files = {
        "lora": {
            1: _write_preds(str(tmp_path / "lora_1.pkl"), seed=1),
            5: _write_preds(str(tmp_path / "lora_5.pkl"), seed=2),
        },
        "full": {5: _write_preds(str(tmp_path / "full_5.pkl"), seed=3)},
    }
    out = str(tmp_path / "plots")
    stats = analyze(files, tok, out_dir=out, n_boot=50, seed=0)

    for fname in ("wer.png", "best_wer.png", "examples.json"):
        p = os.path.join(out, fname)
        assert os.path.exists(p) and os.path.getsize(p) > 0, fname

    # beam 0 drops one of five words in half the rows -> WER 10%;
    # a later beam is always exact -> best-of-k 0
    s = stats["lora"][5]
    assert abs(s["wer"] - 0.1) < 1e-9
    assert s["best_wer"] == 0.0
    assert s["boots_wer"].shape == (50,)

    examples = json.load(open(os.path.join(out, "examples.json")))
    assert len(examples) == 12
    # sorted by per-sentence WER: exact decodes first
    rates = [e / max(w, 1) for _, _, e, w in examples]
    assert rates == sorted(rates)


def test_bootstrap_ci_brackets_wer(tmp_path):
    tok = StubTokenizer()
    path = _write_preds(str(tmp_path / "p_1.pkl"), n=30, k=1, seed=4)
    out = bootstrap_wer_ci(path, tok, n_boot=200, seed=0)
    assert out["ci_low"] <= out["wer"] <= out["ci_high"]
    path5 = _write_preds(str(tmp_path / "p_5.pkl"), n=30, k=4, seed=5)
    assert best_of_k_wer(path5, tok) == 0.0
