"""Rotary position embeddings (RoPE), Llama convention.

Used by the NDT1 attention option (``models/ndt1.py:44-71``) and the JAX
Llama decoder. cos/sin tables are precomputed host-side once per max length.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_cos_sin(dim: int, max_len: int, base: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)                       # (max_len, dim//2)
    emb = np.concatenate([freqs, freqs], axis=-1)       # (max_len, dim)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary_pos_emb(
    q: jax.Array,          # (B, H, T, D)
    k: jax.Array,          # (B, H, T, D)
    pos_ids: jax.Array,    # (B, T) int positions
    cos: jax.Array,        # (max_len, D)
    sin: jax.Array,        # (max_len, D)
) -> Tuple[jax.Array, jax.Array]:
    c = cos[pos_ids][:, None, :, :].astype(q.dtype)  # (B, 1, T, D)
    s = sin[pos_ids][:, None, :, :].astype(q.dtype)
    q_rot = q * c + _rotate_half(q) * s
    k_rot = k * c + _rotate_half(k) * s
    return q_rot, k_rot
