"""Beam-search correctness against an exhaustive reference.

Uses a synthetic decoder whose logits depend only on the step index, so
sequence scores decompose additively per position and beam search is exact
(the prefix of any top-k hypothesis is itself a top-k prefix). The
exhaustive reference enumerates every token path and applies the same
HF-style hypothesis semantics (EOS closes a hypothesis with the length
penalty applied at that length; survivors are scored at full length).

Reference surface: HF ``generate`` options used by the upstream WER eval
(``/root/reference/eval_phonemes.py:53-71``).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.models.generation import (
    BeamResult,
    beam_search,
    diverse_beam_search,
    greedy_decode,
)

V, EOS, PAD = 5, 2, 0
NEW = 3


def make_fake_decoder(step_logits):
    """Decoder with logits[t] fixed per position (independent of history).

    ``step_logits``: (P + NEW, V). The "embedding" of a token is its one-hot;
    cache is a running position counter so each call knows where it is.
    """
    table = jnp.asarray(step_logits, jnp.float32)

    def decode_step(embeds, mask, cache, cache_index):
        B, T, _ = embeds.shape
        pos = cache_index + jnp.arange(T)
        logits = jnp.broadcast_to(table[pos], (B, T, V))
        return logits, cache

    def embed_tokens(ids):
        return jax.nn.one_hot(ids, V, dtype=jnp.float32)

    return decode_step, embed_tokens


def exhaustive_hypotheses(step_logits, P, length_penalty):
    """All hypotheses under HF semantics, best-first: (score, tokens)."""
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(step_logits), axis=-1))
    hyps = []
    for path in itertools.product(range(V), repeat=NEW):
        score, tokens = 0.0, []
        for t, tok in enumerate(path):
            score += logp[P - 1 + t, tok]
            tokens.append(tok)
            if tok == EOS:
                n_new = t + 1
                hyps.append((score / (n_new ** length_penalty), tuple(tokens)))
                break
        else:
            hyps.append((score / (NEW ** length_penalty), tuple(tokens)))
    # Dedup (paths that hit EOS early collapse to the same hypothesis).
    seen, out = set(), []
    for s, tks in sorted(hyps, key=lambda x: -x[0]):
        if tks not in seen:
            seen.add(tks)
            out.append((s, tks))
    return out


def run_beam(step_logits, K, length_penalty=0.0, early_stopping=False):
    P = 1
    decode_step, embed_tokens = make_fake_decoder(step_logits)
    embeds = jax.nn.one_hot(jnp.asarray([[1]]), V, dtype=jnp.float32)
    attn = jnp.ones((1, P), jnp.int32)
    cache = jnp.zeros((K,), jnp.float32)
    return beam_search(
        decode_step, embed_tokens, embeds, attn, cache, NEW, K,
        eos_token_id=EOS, pad_token_id=PAD, length_penalty=length_penalty,
        early_stopping=early_stopping,
    )


@pytest.mark.parametrize("length_penalty", [0.0, 1.0])
def test_beam_matches_exhaustive(length_penalty):
    rng = np.random.default_rng(7)
    step_logits = rng.normal(size=(1 + NEW, V)).astype(np.float32)
    K = 4
    result = run_beam(step_logits, K, length_penalty)
    assert isinstance(result, BeamResult)
    assert result.sequences.shape == (1, K, NEW)

    scores = np.asarray(result.scores[0])
    assert np.all(np.diff(scores) <= 1e-6), "scores must be sorted descending"

    expected = exhaustive_hypotheses(step_logits, P=1, length_penalty=length_penalty)
    exp_by_tokens = dict((tks, s) for s, tks in expected)
    if length_penalty == 0.0:
        # Without a length penalty, additive per-position scores give beam
        # search the prefix property, so the top-K is exact.
        for k in range(K):
            exp_score, exp_tokens = expected[k]
            got = tuple(int(x) for x in np.asarray(result.sequences[0, k]))
            got = got[: len(exp_tokens)]  # strip pad tail past EOS
            assert got == exp_tokens, f"beam {k}: {got} != {exp_tokens}"
            np.testing.assert_allclose(scores[k], exp_score, atol=1e-5)
    else:
        # With a length penalty the 2K-candidate cutoff (HF semantics too)
        # is not exhaustive-exact; the top-1 still is here, and every
        # returned hypothesis must carry its true penalized log-prob.
        exp_score, exp_tokens = expected[0]
        got = tuple(int(x) for x in np.asarray(result.sequences[0, 0]))
        assert got[: len(exp_tokens)] == exp_tokens
        np.testing.assert_allclose(scores[0], exp_score, atol=1e-5)
        for k in range(K):
            seq = np.asarray(result.sequences[0, k])
            tks = tuple(int(x) for x in seq)
            if EOS in seq:
                tks = tks[: int(np.argmax(seq == EOS)) + 1]
            assert tks in exp_by_tokens, f"beam {k} not a valid hypothesis"
            np.testing.assert_allclose(scores[k], exp_by_tokens[tks], atol=1e-5)
    # pad-filled tail past EOS
    for k in range(K):
        seq = np.asarray(result.sequences[0, k])
        if EOS in seq:
            e = int(np.argmax(seq == EOS))
            assert np.all(seq[e + 1:] == PAD)


def test_best_of_k_beats_single_beam():
    """Oracle WER over k beams <= 1-beam WER, strict when the target is a
    runner-up hypothesis (reference best-of-k analysis,
    eval_phonemes.py:208-240)."""
    rng = np.random.default_rng(3)
    step_logits = rng.normal(size=(1 + NEW, V)).astype(np.float32)
    result = run_beam(step_logits, K=4, length_penalty=0.0)
    seqs = np.asarray(result.sequences[0])                   # (4, NEW)

    class StubTokenizer:
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids if int(i) not in (EOS, PAD))

    tok = StubTokenizer()
    target = tok.decode(seqs[1])                             # 2nd-best hyp
    from llm_bci_tpu.eval.eval_bci import word_error_count

    e1, w1 = word_error_count(tok.decode(seqs[0]), target)
    best = min(
        word_error_count(tok.decode(s), target)[0] / max(word_error_count(tok.decode(s), target)[1], 1)
        for s in seqs
    )
    assert best == 0.0
    assert e1 / max(w1, 1) > best


def test_early_stopping_freezes_hypothesis_set():
    """With early_stopping=True a batch stops collecting once K hyps exist;
    the result is still a valid sorted hypothesis set."""
    rng = np.random.default_rng(11)
    logits = rng.normal(size=(1 + NEW, V)).astype(np.float32)
    logits[:, EOS] += 4.0                                    # EOS very likely
    r_stop = run_beam(logits, K=2, length_penalty=0.0, early_stopping=True)
    r_full = run_beam(logits, K=2, length_penalty=0.0, early_stopping=False)
    s_stop = np.asarray(r_stop.scores[0])
    s_full = np.asarray(r_full.scores[0])
    assert np.all(np.diff(s_stop) <= 1e-6)
    # The non-early-stopped search can only find equal-or-better hypotheses.
    assert s_full[0] >= s_stop[0] - 1e-6


def test_diverse_beam_groups_differ():
    """num_beam_groups == num_beams with a large diversity penalty must make
    the groups' first tokens distinct; with penalty 0 all groups collapse to
    the greedy path (reference gen config eval_phonemes.py:53-71)."""
    rng = np.random.default_rng(5)
    step_logits = rng.normal(size=(1 + NEW, V)).astype(np.float32)
    step_logits[:, EOS] -= 10.0                              # avoid EOS
    P, G = 1, 3
    decode_step, embed_tokens = make_fake_decoder(step_logits)
    embeds = jax.nn.one_hot(jnp.asarray([[1]]), V, dtype=jnp.float32)
    attn = jnp.ones((1, P), jnp.int32)

    def run(penalty):
        return diverse_beam_search(
            decode_step, embed_tokens, embeds, attn,
            jnp.zeros((G,), jnp.float32), NEW, G,
            eos_token_id=EOS, pad_token_id=PAD,
            length_penalty=1.0, diversity_penalty=penalty,
        )

    diverse = run(100.0)
    first_tokens = set(int(t) for t in np.asarray(diverse.sequences[0, :, 0]))
    assert len(first_tokens) == G, "groups must pick distinct first tokens"

    collapsed = run(0.0)
    greedy = greedy_decode(
        decode_step, embed_tokens, embeds, attn,
        jnp.zeros((1,), jnp.float32), NEW, eos_token_id=EOS, pad_token_id=PAD,
    )
    for g in range(G):
        np.testing.assert_array_equal(
            np.asarray(collapsed.sequences[0, g]), np.asarray(greedy[0])
        )

    # Sorted scores in both cases.
    assert np.all(np.diff(np.asarray(diverse.scores[0])) <= 1e-6)
