"""Banded context (attention-window) masks.

Semantics match the reference buffer builder (``models/ndt1.py:30-41``):
``mask[i, j] = 1`` iff key ``j`` lies in ``[i - backward, i + forward]``.
Special values: ``-1`` masks self-offset in that direction (window of -1),
``-2`` means unbounded. ``(-2, -2)`` is the all-ones mask.
"""
from __future__ import annotations

import numpy as np


def create_context_mask(context_forward: int, context_backward: int, max_F: int) -> np.ndarray:
    if context_forward == -2 and context_backward == -2:
        return np.ones((max_F, max_F), dtype=np.int64)
    fwd = context_forward if context_forward >= -1 else max_F
    bwd = context_backward if context_backward >= -1 else max_F
    i = np.arange(max_F)[:, None]
    j = np.arange(max_F)[None, :]
    mask = (j <= i + fwd).astype(np.int64)
    if context_backward >= -1:
        mask &= (j >= i - bwd).astype(np.int64)
    return mask
