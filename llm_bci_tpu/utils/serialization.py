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
    """Load msgpack bytes into the structure of ``target`` (shape-checked).

    Tolerant of a quantization-layout change between save and load: float
    kernels saved from an unquantized model re-quantize into an int8+scale
    target (post-training quantization), and int8+scale pairs dequantize
    into a float target — see
    :func:`llm_bci_tpu.ops.quant.adapt_quantization`.
    """
    from llm_bci_tpu.ops.quant import adapt_quantization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw = adapt_quantization(raw, serialization.to_state_dict(target))
    return serialization.from_state_dict(target, raw)
