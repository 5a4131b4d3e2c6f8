"""Attention entry point — one call site for every model's hot kernel.

TPU-native replacement for the reference's cuDNN
``F.scaled_dot_product_attention`` (``models/ndt1.py:289``) and
``nn.TransformerEncoder`` internals (``models/itransformer.py:68-73,168-173``).

All models route through :func:`dot_product_attention` so the implementation
can be swapped globally (``set_attention_impl``): ``xla`` uses
``jax.nn.dot_product_attention`` (XLA fuses the softmax chain and tiles the
matmuls onto the MXU), ``pallas`` uses the flash kernel in
:mod:`llm_bci_tpu.ops.flash_attention` when the shapes/platform allow it.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_ATTENTION_IMPL = "xla"


def set_attention_impl(name: str) -> None:
    global _ATTENTION_IMPL
    if name not in ("xla", "pallas"):
        raise ValueError(f"Unknown attention impl {name!r}")
    _ATTENTION_IMPL = name


def get_attention_impl() -> str:
    return _ATTENTION_IMPL


def dot_product_attention(
    q: jax.Array,                    # (B, T, H, D)
    k: jax.Array,                    # (B, S, H, D)
    v: jax.Array,                    # (B, S, H, D)
    mask: Optional[jax.Array] = None,  # (B, 1|H, T, S) bool; True = attend
    is_causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:                      # (B, T, H, D)
    """Scaled dot-product attention over (batch, time, heads, head_dim).

    ``dropout_rate`` + ``dropout_rng`` enable attention-probability dropout
    with torch SDPA semantics (``probs * bernoulli(keep) / keep``, reference
    ``models/ndt1.py:289``); pass a rate of 0 (or no rng) at eval.
    """
    if dropout_rate > 0.0 and dropout_rng is not None:
        # Explicit probs path: XLA's fused entry point has no dropout hook.
        # One up-front transpose to (B, H, T, D) so both einsums are plain
        # batched matmuls in that layout — leaving q/k/v in (B, T, H, D)
        # made XLA re-lay-out every operand at the einsum boundaries
        # (~1.4 ms/step of "data formatting" copies at flagship shapes).
        d = q.shape[-1]
        if k.shape[2] != q.shape[2]:
            # Grouped-query attention: broadcast K/V heads logically.
            # (Only the short dropout-training path pays the repeat; the
            # eval/serving path below uses XLA's native GQA support.)
            rep = q.shape[2] // k.shape[2]
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        qh = jnp.swapaxes(q, 1, 2)
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        logits = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / jnp.sqrt(
            jnp.asarray(d, q.dtype)
        )
        if is_causal:
            T, S = logits.shape[-2:]
            causal = jnp.tril(jnp.ones((T, S), bool))
            mask = causal if mask is None else (mask & causal)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.asarray(-1e30, logits.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
        return jnp.swapaxes(jnp.einsum("bhts,bhsd->bhtd", probs, vh), 1, 2)
    if _ATTENTION_IMPL == "pallas":
        from llm_bci_tpu.ops.flash_attention import flash_attention_supported, flash_attention

        if flash_attention_supported(q, k, v, mask, is_causal):
            return flash_attention(q, k, v, mask=mask, is_causal=is_causal)
    return jax.nn.dot_product_attention(
        q, k, v, mask=mask, is_causal=is_causal
    )


def make_attention_mask(
    spikes_mask: jax.Array,             # (B, T) 1 = valid
    context_mask: Optional[jax.Array],  # (T, T) 1 = in-window, or None
) -> jax.Array:                          # (B, 1, T, T) bool
    """Combine the padding mask and the banded context-window mask, with the
    reference's self-attend guarantee for padded queries
    (``models/ndt1.py:435-437``): every position may attend to itself so the
    softmax never sees an all-masked row."""
    B, T = spikes_mask.shape
    valid = spikes_mask.astype(bool)
    mask = valid[:, None, :]                              # (B, 1, T) keys valid
    if context_mask is not None:
        mask = mask & context_mask.astype(bool)[None, :, :]  # (B, T, T)
    else:
        mask = jnp.broadcast_to(mask, (B, T, T))
    eye = jnp.eye(T, dtype=bool)
    mask = mask | eye[None, :, :]
    return mask[:, None, :, :]
