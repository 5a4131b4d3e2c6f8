"""Jitted autoregressive decoding: greedy + beam search over a KV cache.

Replaces HF ``model.generate(inputs_embeds=...)`` as used by the reference
(``models/bci.py:224-246``, ``eval_phonemes.py:53-71``). Everything is
static-shape: the prompt is consumed in one prefill step, then
``max_new_tokens`` single-token steps run under ``lax.scan`` — one
compilation per (batch, prompt_len, max_new_tokens) signature.

``decode_step(embeds, attention_mask, cache, cache_index) -> (logits, cache)``
is the model hook (a closure over bound module state), ``embed_tokens`` maps
sampled ids back to embeddings.
"""
from __future__ import annotations

from typing import Callable, Tuple

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
) -> jax.Array:                   # (B, max_new_tokens) best beam
    """Standard beam search (HF ``num_beams`` semantics, no diversity
    groups); returns the highest-scoring beam's new tokens."""
    B, P, _ = inputs_embeds.shape
    K = num_beams
    total_len = P + max_new_tokens

    # Expand prompt to beams: (B*K, P, H)
    def expand(x):
        return jnp.repeat(x, K, axis=0)

    logits, cache, key_mask = _prefill(
        decode_step, expand(inputs_embeds), expand(attention_mask), cache, total_len
    )
    log_probs = jax.nn.log_softmax(logits, axis=-1)               # (B*K, V)
    V = log_probs.shape[-1]

    # Beam scores: at t=0 only beam 0 is live so identical beams don't tie.
    beam_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B,)
    )                                                             # (B*K,)
    tokens_buf = jnp.full((B * K, max_new_tokens), pad_token_id, jnp.int32)
    done = jnp.zeros((B * K,), bool)

    def gather_beams(x, beam_idx):
        """x: (B*K, ...) gather along beam dim with (B, K) indices."""
        xs = x.reshape((B, K) + x.shape[1:])
        return jnp.take_along_axis(
            xs, beam_idx.reshape((B, K) + (1,) * (x.ndim - 1)), axis=1
        ).reshape(x.shape)

    def step(carry, t):
        log_probs, cache, key_mask, beam_scores, tokens_buf, done = carry
        # Finished beams only extend with pad at fixed score.
        cand = jnp.where(
            done[:, None],
            jnp.full((B * K, V), NEG_INF).at[:, pad_token_id].set(0.0),
            log_probs,
        )
        scores = beam_scores[:, None] + cand                      # (B*K, V)
        scores = scores.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(scores, K)            # (B, K)
        beam_idx = top_idx // V                                   # (B, K) source beam
        token = (top_idx % V).astype(jnp.int32)                   # (B, K)

        cache = jax.tree_util.tree_map(lambda c: gather_beams(c, beam_idx), cache)
        key_mask = gather_beams(key_mask, beam_idx)
        tokens_buf = gather_beams(tokens_buf, beam_idx)
        done = gather_beams(done, beam_idx)

        token_flat = token.reshape(B * K)
        token_flat = jnp.where(done, pad_token_id, token_flat)
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, token_flat[:, None], (0, t)
        )
        beam_scores = top_scores.reshape(B * K)
        done = done | (token_flat == eos_token_id)

        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((B * K, 1), key_mask.dtype), (0, P + t)
        )
        embeds = embed_tokens(token_flat[:, None])
        logits, cache = decode_step(embeds, key_mask, cache, P + t)
        log_probs = jax.nn.log_softmax(logits[:, -1, :], axis=-1)
        return (log_probs, cache, key_mask, beam_scores, tokens_buf, done), None

    (log_probs, cache, key_mask, beam_scores, tokens_buf, done), _ = jax.lax.scan(
        step,
        (log_probs, cache, key_mask, beam_scores, tokens_buf, done),
        jnp.arange(max_new_tokens),
    )

    # Length-penalized best beam (HF: score / len**penalty).
    lengths = jnp.sum(tokens_buf != pad_token_id, axis=-1).clip(min=1)
    final = beam_scores / (lengths.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(final.reshape(B, K), axis=-1)               # (B,)
    return tokens_buf.reshape(B, K, max_new_tokens)[jnp.arange(B), best]
