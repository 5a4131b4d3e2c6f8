"""Model output contract.

Every model's ``forward``/``loss_fn`` returns a :class:`ModelOutput` (or a
subclass) carrying at least ``loss`` and ``n_examples``; the trainer averages
``sum(loss) / sum(n_examples)`` across steps and devices. This mirrors the
reference contract (``models/model_output.py:11-17``) but as a JAX pytree so
outputs can flow through ``jit`` boundaries.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelOutput:
    loss: Optional[jax.Array] = None
    n_examples: Optional[jax.Array] = None
    mask: Optional[jax.Array] = None
    preds: Optional[jax.Array] = None
    targets: Optional[jax.Array] = None

    def to_dict(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}
