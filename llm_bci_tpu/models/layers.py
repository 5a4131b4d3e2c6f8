"""Shared transformer building blocks.

``TorchEncoderLayer``/``TorchEncoderStack`` reproduce the semantics of
``torch.nn.TransformerEncoderLayer``/``TransformerEncoder`` (post-LN,
4x FFN, final norm) that back the reference iTransformer
(``models/itransformer.py:58-73,158-173``) — attention rides
:func:`llm_bci_tpu.ops.attention.dot_product_attention` so the whole stack
shares one hot kernel.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from llm_bci_tpu.ops.attention import dot_product_attention


class MultiHeadSelfAttention(nn.Module):
    hidden_size: int
    n_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                        # (B, T, H)
        mask: Optional[jax.Array] = None,    # (B, 1, T, T) bool
        training: bool = False,
    ) -> jax.Array:
        B, T, _ = x.shape
        head = self.hidden_size // self.n_heads
        qkv = nn.Dense(
            3 * self.hidden_size, use_bias=self.use_bias, dtype=self.dtype, name="qkv"
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_heads, head)
        k = k.reshape(B, T, self.n_heads, head)
        v = v.reshape(B, T, self.n_heads, head)
        out = dot_product_attention(q, k, v, mask=mask).reshape(B, T, self.hidden_size)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return nn.Dense(
            self.hidden_size, use_bias=self.use_bias, dtype=self.dtype, name="out_proj"
        )(out)


class TorchEncoderLayer(nn.Module):
    """Post-LN block: x = LN(x + attn(x)); x = LN(x + ffn(x)) — torch
    ``TransformerEncoderLayer(norm_first=False)`` semantics."""

    hidden_size: int
    n_heads: int
    act: Callable
    dropout: float = 0.0
    ffn_mult: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        a = MultiHeadSelfAttention(
            self.hidden_size, self.n_heads, self.dropout, dtype=self.dtype, name="attn"
        )(x, mask, training)
        a = nn.Dropout(self.dropout, deterministic=not training)(a)
        x = nn.LayerNorm(name="norm1")(x + a)
        h = nn.Dense(self.ffn_mult * self.hidden_size, dtype=self.dtype, name="linear1")(x)
        h = self.act(h)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.LayerNorm(name="norm2")(x + h)


class TorchEncoderStack(nn.Module):
    """N post-LN layers + final LayerNorm (torch ``TransformerEncoder`` with
    ``norm=LayerNorm``)."""

    hidden_size: int
    n_heads: int
    n_layers: int
    act: Callable
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        for i in range(self.n_layers):
            x = TorchEncoderLayer(
                self.hidden_size, self.n_heads, self.act, self.dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask, training)
        return nn.LayerNorm(name="norm")(x)


class MLPStack(nn.Module):
    """torchvision-style MLP: Dense→act→drop per hidden layer, last layer
    linear+drop (``torchvision.ops.MLP`` used at reference
    ``models/itransformer.py:108-116``)."""

    hidden_channels: tuple
    act: Callable
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        n = len(self.hidden_channels)
        for i, h in enumerate(self.hidden_channels):
            x = nn.Dense(h, use_bias=self.use_bias, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:
                x = self.act(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x
