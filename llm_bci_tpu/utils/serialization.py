"""Param pytree (de)serialization for component checkpoints.

Replaces the reference's ``torch.save(state_dict)`` component blobs
(``models/ndt1.py:685-692`` etc.) with flax msgpack files. Full train-state
checkpoints (params + optimizer + step) live in
:mod:`llm_bci_tpu.training.checkpoint` via Orbax; these msgpack blobs cover
the ``from_pt`` component warm-start chain (NDT1-CTC → BCI).
"""
from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, target: Any) -> Any:
    """Load msgpack bytes into the structure of ``target`` (shape-checked)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
