"""CTC prefix beam search vs exact enumeration (llm_bci_tpu/eval/ctc_decode.py)."""
import numpy as np
import pytest

from llm_bci_tpu.eval.ctc_decode import ctc_brute_force, ctc_prefix_beam_search


def _rand_logprobs(T, V, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(scale=2.0, size=(T, V))
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", range(6))
def test_wide_beam_matches_brute_force(seed):
    """With a beam wider than the whole prefix space, the search is exact:
    top sequence AND its summed-alignment probability match enumeration."""
    lp = _rand_logprobs(T=5, V=3, seed=seed)
    exact = ctc_brute_force(lp)
    beam = ctc_prefix_beam_search(lp, beam_width=1000, n_best=len(exact))
    assert beam[0][0] == exact[0][0]
    for (bl, bp), (el, ep) in zip(beam, exact):
        assert bl == el
        np.testing.assert_allclose(bp, ep, rtol=1e-10)


def test_narrow_beam_still_finds_clear_winner():
    """A peaked distribution survives aggressive pruning."""
    T, V = 8, 5
    lp = np.full((T, V), np.log(0.02 / (V - 1)))
    want = [2, 3, 1]
    frames = [2, 2, 0, 3, 0, 1, 1, 0]          # with blanks + repeats
    for t, c in enumerate(frames):
        lp[t] = np.log(0.02 / (V - 1))
        lp[t, c] = np.log(0.98)
    best = ctc_prefix_beam_search(lp, beam_width=2)[0]
    assert best[0] == want


def test_beam_beats_greedy_on_split_mass():
    """The canonical CTC case: greedy picks the single best alignment, the
    beam sums alignments. Two frames of (blank .6 / 'a' .4): greedy says
    blank-blank -> [], but P([a]) = .4*.6 + .6*.4 + .4*.4 = .64 > .36."""
    lp = np.log(np.array([[0.6, 0.4], [0.6, 0.4]]))
    greedy = [int(f.argmax()) for f in lp]
    assert all(c == 0 for c in greedy)          # greedy collapses to []
    best = ctc_prefix_beam_search(lp, beam_width=4)[0]
    assert best[0] == [1]
    np.testing.assert_allclose(np.exp(best[1]), 0.64, rtol=1e-12)


def test_repeat_needs_blank_between():
    """[a, a] requires a blank between emissions; without one the frames
    collapse to [a]."""
    # frames: a a -> only [a] (no alignment yields [a, a])
    lp = np.log(np.array([[1e-9, 1.0], [1e-9, 1.0]]) / (1 + 1e-9))
    res = dict(
        (tuple(l), p) for l, p in ctc_prefix_beam_search(lp, beam_width=10, n_best=10)
    )
    assert max(res, key=res.get) == (1,)
    exact = dict((tuple(l), p) for l, p in ctc_brute_force(lp))
    np.testing.assert_allclose(res[(1,)], exact[(1,)], rtol=1e-9, atol=1e-12)


def test_lm_shallow_fusion_reranks():
    """An LM hook that penalizes label 2 flips a near-tie."""
    lp = np.log(np.array([[0.02, 0.49, 0.49]] * 2))

    def lm(prefix, c):
        return -5.0 if c == 2 else 0.0

    best_no_lm = ctc_prefix_beam_search(lp, beam_width=8)[0][0]
    best_lm = ctc_prefix_beam_search(lp, beam_width=8, lm=lm, lm_weight=1.0)[0][0]
    assert 2 not in best_lm
    assert set(best_no_lm) <= {1, 2}


def test_matches_jax_ctc_loss_probability():
    """Cross-check against the training loss: the beam's summed-alignment
    log-prob for a sequence must equal -ctc_loss(target=sequence)."""
    import jax.numpy as jnp

    from llm_bci_tpu.ops.ctc import ctc_loss

    lp = _rand_logprobs(T=6, V=4, seed=11)
    target = ctc_prefix_beam_search(lp, beam_width=1000, n_best=1)[0]
    labels, logp = target
    if not labels:
        pytest.skip("degenerate draw: empty best sequence")
    loss = ctc_loss(
        jnp.asarray(lp, jnp.float32)[None],
        jnp.asarray([labels + [0] * (6 - len(labels))], jnp.int32),
        jnp.asarray([6], jnp.int32),
        jnp.asarray([len(labels)], jnp.int32),
        blank_id=0,
        impl="xla",
    )
    np.testing.assert_allclose(-float(loss[0]), logp, rtol=1e-5)


def test_streaming_decoder_matches_one_shot():
    """CTCPrefixDecoder over arbitrary window splits is EXACTLY the
    one-shot search over the concatenated frames — the beam state carries
    blank/repeat bookkeeping across window boundaries."""
    from llm_bci_tpu.eval.ctc_decode import CTCPrefixDecoder

    lp = _rand_logprobs(T=24, V=6, seed=3)
    ref = ctc_prefix_beam_search(lp, beam_width=8, n_best=4)

    for splits in [(6, 6, 6, 6), (1,) * 24, (5, 11, 8), (24,)]:
        dec = CTCPrefixDecoder(beam_width=8)
        off = 0
        for w in splits:
            labels, logp = dec.step(lp[off : off + w])
            off += w
        assert off == 24
        got = dec.n_best(4)
        assert [l for l, _ in got] == [l for l, _ in ref]
        np.testing.assert_allclose(
            [p for _, p in got], [p for _, p in ref], rtol=1e-12
        )


def test_streaming_decoder_reset_and_live_best():
    """reset() starts a fresh utterance; step() returns the running best
    so a live transcript can render mid-utterance."""
    from llm_bci_tpu.eval.ctc_decode import CTCPrefixDecoder

    lp = _rand_logprobs(T=10, V=5, seed=11)
    dec = CTCPrefixDecoder(beam_width=8)
    mid, _ = dec.step(lp[:4])
    assert mid == ctc_prefix_beam_search(lp[:4], beam_width=8)[0][0]
    dec.step(lp[4:])
    assert dec.best()[0] == ctc_prefix_beam_search(lp, beam_width=8)[0][0]

    dec.reset()
    dec.step(lp)
    assert dec.best()[0] == ctc_prefix_beam_search(lp, beam_width=8)[0][0]

    with pytest.raises(ValueError):
        dec.step(lp[0])  # (V,) — must be (T, V)
