"""Elementwise losses with torch-compatible semantics (reduction='none').

Replaces ``nn.PoissonNLLLoss`` / ``nn.MSELoss`` / ``nn.CrossEntropyLoss``
as used by the reference models (``models/ndt1.py:507-517``,
``models/itransformer.py:287-307``, ``models/bci.py:102``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def poisson_nll_loss(preds: jax.Array, targets: jax.Array, log_input: bool = True) -> jax.Array:
    """Poisson NLL without the Stirling term, matching
    ``torch.nn.PoissonNLLLoss(reduction="none", full=False)``:
    ``exp(x) - t*x`` when ``log_input`` else ``x - t*log(x + eps)``."""
    if log_input:
        return jnp.exp(preds) - targets * preds
    return preds - targets * jnp.log(preds + 1e-8)


def mse_loss(preds: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.square(preds - targets)


def cross_entropy_loss(
    logits: jax.Array,            # (..., V)
    targets: jax.Array,           # (...) int labels; ignore_index skipped
    ignore_index: int = -100,
) -> jax.Array:                   # (...) per-position loss, 0 at ignored
    """Per-position cross entropy matching
    ``torch.nn.CrossEntropyLoss(reduction="none", ignore_index=-100)``."""
    logits = logits.astype(jnp.float32)
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    return jnp.where(valid, logz - picked, 0.0)
