"""Jitted autoregressive decoding: greedy, beam search, diverse beam search.

Replaces HF ``model.generate(inputs_embeds=...)`` as used by the reference
(``models/bci.py:224-246``, ``eval_phonemes.py:53-71``). Everything is
static-shape: the prompt is consumed in one prefill step, then
``max_new_tokens`` single-token steps run under ``lax.scan`` — one
compilation per (batch, prompt_len, max_new_tokens) signature.

Beam search follows HF ``BeamSearchScorer`` semantics:

- finished hypotheses are collected into a per-batch top-K set the moment a
  beam emits EOS, with the length penalty applied *at finish time*
  (``score / n_new_tokens**length_penalty``) — not once at the end;
- live beams are refilled from the top-2K candidates that did not emit EOS;
- ``early_stopping=True`` freezes a batch's hypothesis set as soon as K
  hypotheses exist; ``early_stopping=False`` additionally requires that the
  best attainable live score can no longer beat the worst finished one;
- at the end, still-live beams of unfinished batches are merged into the
  set (HF ``finalize``), and all K hypotheses are returned sorted by score.

``diverse_beam_search`` reproduces HF group beam search with
``num_beam_groups == num_beams`` (group size 1) and ``diversity_penalty`` —
exactly the generation config the reference's WER eval uses
(``eval_phonemes.py:53-71``): within each step, groups pick tokens
sequentially, each penalized by the frequency of tokens already chosen by
earlier groups at that step.

``decode_step(embeds, attention_mask, cache, cache_index) -> (logits, cache)``
is the model hook (a closure over bound module state), ``embed_tokens`` maps
sampled ids back to embeddings.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _prefill(decode_step, inputs_embeds, attn_mask_prompt, cache, total_len):
    """Run the prompt through the model once; returns (last_logits, cache,
    key_mask) where key_mask is the (B, total_len) validity mask over the
    cache."""
    B, P, _ = inputs_embeds.shape
    key_mask = jnp.zeros((B, total_len), attn_mask_prompt.dtype)
    key_mask = jax.lax.dynamic_update_slice(key_mask, attn_mask_prompt, (0, 0))
    logits, cache = decode_step(inputs_embeds, key_mask, cache, jnp.int32(0))
    return logits[:, -1, :], cache, key_mask


def greedy_decode(
    decode_step: Callable,
    embed_tokens: Callable,
    inputs_embeds: jax.Array,     # (B, P, H)
    attention_mask: jax.Array,    # (B, P)
    cache,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
) -> jax.Array:                   # (B, max_new_tokens)
    B, P, _ = inputs_embeds.shape
    total_len = P + max_new_tokens
    logits, cache, key_mask = _prefill(
        decode_step, inputs_embeds, attention_mask, cache, total_len
    )

    def step(carry, t):
        logits, cache, key_mask, done = carry
        token = jnp.argmax(logits, axis=-1)                       # (B,)
        token = jnp.where(done, pad_token_id, token)
        done = done | (token == eos_token_id)
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((B, 1), key_mask.dtype), (0, P + t)
        )
        embeds = embed_tokens(token[:, None])                     # (B, 1, H)
        logits, cache = decode_step(embeds, key_mask, cache, P + t)
        return (logits[:, -1, :], cache, key_mask, done), token

    (_, _, _, _), tokens = jax.lax.scan(
        step,
        (logits, cache, key_mask, jnp.zeros((B,), bool)),
        jnp.arange(max_new_tokens),
    )
    return tokens.T                                               # (B, T_new)


class BeamResult(NamedTuple):
    """All hypotheses, sorted best-first per batch element."""

    sequences: jax.Array          # (B, K, max_new_tokens) int32, pad-filled
    scores: jax.Array             # (B, K) length-penalized log-prob


def _gather_beams(x, beam_idx, B, K_src):
    """x: (B*K_src, ...); beam_idx: (B, K_dst) indices into the K_src dim."""
    K_dst = beam_idx.shape[1]
    xs = x.reshape((B, K_src) + x.shape[1:])
    out = jnp.take_along_axis(
        xs, beam_idx.reshape((B, K_dst) + (1,) * (x.ndim - 1)), axis=1
    )
    return out.reshape((B * K_dst,) + x.shape[1:])


def beam_search(
    decode_step: Callable,
    embed_tokens: Callable,
    inputs_embeds: jax.Array,     # (B, P, H)
    attention_mask: jax.Array,    # (B, P)
    cache,                         # batch dim B*num_beams
    max_new_tokens: int,
    num_beams: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
) -> BeamResult:
    """HF-semantics beam search; returns all ``num_beams`` hypotheses per
    batch element sorted by penalized score (see module docstring)."""
    B, P, _ = inputs_embeds.shape
    K = num_beams
    total_len = P + max_new_tokens

    def expand(x):
        return jnp.repeat(x, K, axis=0)

    logits, cache, key_mask = _prefill(
        decode_step, expand(inputs_embeds), expand(attention_mask), cache, total_len
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)               # (B*K, V)
    V = log_probs.shape[-1]

    # Only beam 0 live at t=0 so the K identical prompt copies don't tie.
    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B,)
    ).reshape(B, K)
    live_tokens = jnp.full((B, K, max_new_tokens), pad_token_id, jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
    fin_tokens = jnp.full((B, K, max_new_tokens), pad_token_id, jnp.int32)
    stopped = jnp.zeros((B,), bool)

    def step(carry, t):
        (log_probs, cache, key_mask, live_scores, live_tokens,
         fin_scores, fin_tokens, stopped) = carry
        n_new = (t + 1).astype(jnp.float32)

        cand = live_scores[:, :, None] + log_probs.reshape(B, K, V)
        cand = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * K)          # (B, 2K)
        src_beam = top_idx // V                                    # (B, 2K)
        token = (top_idx % V).astype(jnp.int32)                    # (B, 2K)
        is_eos = token == eos_token_id

        # Candidate token buffers: source beam's tokens with `token` at t
        # (EOS included, matching HF's finalize which appends it).
        cand_tokens = jnp.take_along_axis(
            live_tokens, src_beam[:, :, None], axis=1
        )                                                          # (B, 2K, T)
        t_onehot = jax.nn.one_hot(t, max_new_tokens, dtype=bool)
        cand_tokens = jnp.where(t_onehot[None, None, :], token[:, :, None], cand_tokens)

        # ---- finished set: insert EOS candidates, penalized at finish time.
        # HF BeamSearchScorer.process skips EOS candidates ranked >= K among
        # the sorted 2K (is_beam_token_worse_than_top_num_beams) — only the
        # top-K slots may finish a hypothesis.
        rank_ok = jnp.arange(2 * K)[None, :] < K
        pen = jnp.where(
            is_eos & rank_ok & ~stopped[:, None],
            top_scores / (n_new ** length_penalty),
            NEG_INF,
        )                                                          # (B, 2K)
        merged_scores = jnp.concatenate([fin_scores, pen], axis=1)          # (B, 3K)
        merged_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)  # (B, 3K, T)
        fin_scores, keep = jax.lax.top_k(merged_scores, K)
        fin_tokens = jnp.take_along_axis(merged_tokens, keep[:, :, None], axis=1)

        # ---- live refill: best K non-EOS candidates of the 2K.
        live_cand = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, pick = jax.lax.top_k(live_cand, K)            # (B, K)
        live_src = jnp.take_along_axis(src_beam, pick, axis=1)     # (B, K)
        live_tok = jnp.take_along_axis(token, pick, axis=1)        # (B, K)
        live_tokens = jnp.where(
            t_onehot[None, None, :],
            live_tok[:, :, None],
            jnp.take_along_axis(live_tokens, live_src[:, :, None], axis=1),
        )

        cache = jax.tree_util.tree_map(
            lambda c: _gather_beams(c, live_src, B, K), cache
        )
        key_mask = _gather_beams(key_mask, live_src, B, K)

        # ---- stopping (HF BeamHypotheses.is_done).
        have_k = fin_scores[:, K - 1] > NEG_INF / 2
        if early_stopping:
            stopped = stopped | have_k
        else:
            best_possible = live_scores[:, 0] / (n_new ** length_penalty)
            stopped = stopped | (have_k & (fin_scores[:, K - 1] >= best_possible))

        # ---- one decode step for the refilled live beams.
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((B * K, 1), key_mask.dtype), (0, P + t)
        )
        embeds = embed_tokens(live_tok.reshape(B * K)[:, None])
        logits, cache = decode_step(embeds, key_mask, cache, P + t)
        log_probs = jax.nn.log_softmax(logits[:, -1, :], axis=-1)
        return (
            log_probs, cache, key_mask, live_scores, live_tokens,
            fin_scores, fin_tokens, stopped,
        ), None

    (log_probs, cache, key_mask, live_scores, live_tokens,
     fin_scores, fin_tokens, stopped), _ = jax.lax.scan(
        step,
        (log_probs, cache, key_mask, live_scores, live_tokens,
         fin_scores, fin_tokens, stopped),
        jnp.arange(max_new_tokens),
    )

    # finalize: merge still-live beams of unfinished batches (HF skips
    # batches whose hypothesis set is done).
    pen_live = jnp.where(
        stopped[:, None],
        NEG_INF,
        live_scores / (float(max_new_tokens) ** length_penalty),
    )
    merged_scores = jnp.concatenate([fin_scores, pen_live], axis=1)
    merged_tokens = jnp.concatenate([fin_tokens, live_tokens], axis=1)
    scores, keep = jax.lax.top_k(merged_scores, K)
    sequences = jnp.take_along_axis(merged_tokens, keep[:, :, None], axis=1)
    return BeamResult(sequences=sequences, scores=scores)


def diverse_beam_search(
    decode_step: Callable,
    embed_tokens: Callable,
    inputs_embeds: jax.Array,     # (B, P, H)
    attention_mask: jax.Array,    # (B, P)
    cache,                         # batch dim B*num_beams
    max_new_tokens: int,
    num_beams: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    diversity_penalty: float = 1.0,
) -> BeamResult:
    """HF group beam search with ``num_beam_groups == num_beams`` (one beam
    per group) — the reference's WER-eval generation config
    (``eval_phonemes.py:53-71``: ``num_beam_groups=beams,
    diversity_penalty=1.2, num_return_sequences=beams``).

    Per step, groups select tokens sequentially; group g's log-probs are
    penalized by ``diversity_penalty * count`` of each token among groups
    0..g-1's selections at this step. Each group keeps one finished
    hypothesis (penalized at finish time); a group whose live beam emits EOS
    continues with its runner-up candidate. Returns all G hypotheses sorted.
    """
    B, P, _ = inputs_embeds.shape
    G = num_beams
    total_len = P + max_new_tokens

    def expand(x):
        return jnp.repeat(x, G, axis=0)

    logits, cache, key_mask = _prefill(
        decode_step, expand(inputs_embeds), expand(attention_mask), cache, total_len
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)               # (B*G, V)
    V = log_probs.shape[-1]

    live_scores = jnp.zeros((B, G), jnp.float32)
    live_tokens = jnp.full((B, G, max_new_tokens), pad_token_id, jnp.int32)
    fin_scores = jnp.full((B, G), NEG_INF, jnp.float32)
    fin_tokens = jnp.full((B, G, max_new_tokens), pad_token_id, jnp.int32)
    done = jnp.zeros((B, G), bool)                                 # group finished

    def step(carry, t):
        (log_probs, cache, key_mask, live_scores, live_tokens,
         fin_scores, fin_tokens, done) = carry
        n_new = (t + 1).astype(jnp.float32)
        lp_groups = log_probs.reshape(B, G, V)

        # Sequential group selection with cumulative diversity counts.
        def group_step(freq, g):
            # freq: (B, V) counts of tokens chosen by earlier groups this step
            scores_g = live_scores[:, g][:, None] + lp_groups[:, g, :] \
                - diversity_penalty * freq                        # (B, V)
            top2_scores, top2_tok = jax.lax.top_k(scores_g, 2)    # (B, 2)
            is_eos1 = top2_tok[:, 0] == eos_token_id
            # live continuation: runner-up if best is EOS, else best.
            live_tok_g = jnp.where(is_eos1, top2_tok[:, 1], top2_tok[:, 0])
            live_score_g = jnp.where(is_eos1, top2_scores[:, 1], top2_scores[:, 0])
            # candidate finished hyp: the EOS pick (only while the group is
            # still decoding). The group does NOT freeze here — HF group
            # beam search (early_stopping=False) keeps decoding the
            # runner-up path and may later replace the stored hypothesis.
            fin_cand_score = jnp.where(
                is_eos1 & ~done[:, g],
                top2_scores[:, 0] / (n_new ** length_penalty),
                NEG_INF,
            )
            # groups stopped by is_done keep emitting pad at frozen score.
            live_tok_g = jnp.where(done[:, g], pad_token_id, live_tok_g)
            live_score_g = jnp.where(done[:, g], live_scores[:, g], live_score_g)
            # HF counts the *selected* (live) token toward later groups' freq.
            freq = freq + jax.nn.one_hot(live_tok_g, V, dtype=freq.dtype) \
                * (~done[:, g])[:, None].astype(freq.dtype)
            return freq, (live_tok_g.astype(jnp.int32), live_score_g,
                          fin_cand_score)

        freq0 = jnp.zeros((B, V), jnp.float32)
        _, (tok_seq, score_seq, fin_cand) = jax.lax.scan(
            group_step, freq0, jnp.arange(G)
        )
        live_tok = tok_seq.T                                       # (B, G)
        new_live_scores = score_seq.T
        fin_cand = fin_cand.T                                      # (B, G)

        # Each group holds at most one finished hyp: replace if better.
        t_onehot = jax.nn.one_hot(t, max_new_tokens, dtype=bool)
        eos_tokens = jnp.where(
            t_onehot[None, None, :], eos_token_id, live_tokens
        )                                                          # hyp + EOS at t
        better = fin_cand > fin_scores
        fin_scores = jnp.where(better, fin_cand, fin_scores)
        fin_tokens = jnp.where(better[:, :, None], eos_tokens, fin_tokens)

        # HF BeamHypotheses.is_done (early_stopping=False): the group stops
        # only when its stored hypothesis can no longer be beaten by the
        # best attainable penalized score of its live beam.
        has_fin = fin_scores > NEG_INF / 2
        best_possible = new_live_scores / (n_new ** length_penalty)
        done = done | (has_fin & (fin_scores >= best_possible))

        live_scores = new_live_scores
        live_tokens = jnp.where(t_onehot[None, None, :], live_tok[:, :, None], live_tokens)

        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((B * G, 1), key_mask.dtype), (0, P + t)
        )
        embeds = embed_tokens(live_tok.reshape(B * G)[:, None])
        logits, cache = decode_step(embeds, key_mask, cache, P + t)
        log_probs = jax.nn.log_softmax(logits[:, -1, :], axis=-1)
        return (
            log_probs, cache, key_mask, live_scores, live_tokens,
            fin_scores, fin_tokens, done,
        ), None

    (log_probs, cache, key_mask, live_scores, live_tokens,
     fin_scores, fin_tokens, done), _ = jax.lax.scan(
        step,
        (log_probs, cache, key_mask, live_scores, live_tokens,
         fin_scores, fin_tokens, done),
        jnp.arange(max_new_tokens),
    )

    # finalize per group: finished hyp if any, else the live beam.
    pen_live = live_scores / (float(max_new_tokens) ** length_penalty)
    use_fin = fin_scores > NEG_INF / 2
    scores = jnp.where(use_fin, fin_scores, pen_live)
    sequences = jnp.where(use_fin[:, :, None], fin_tokens, live_tokens)
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    sequences = jnp.take_along_axis(sequences, order[:, :, None], axis=1)
    return BeamResult(sequences=sequences, scores=scores)
