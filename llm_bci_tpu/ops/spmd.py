"""Batch-dim ``shard_map`` wrapping for Pallas kernels on multi-device meshes.

``pallas_call`` lowers to a Mosaic custom call the SPMD partitioner cannot
split: inside a ``jit`` whose operands are sharded over a multi-device mesh,
the kernel's inputs would be all-gathered per call (or the compile fails) —
silently negating the data/fsdp sharding the trainer's annotations express.

The batch-parallel kernels (banded flash attention, Pallas CTC) are instead
wrapped in ``jax.shard_map`` over the mesh's ``data`` axis: each device runs
the kernel on its local batch shard — exactly the data-parallel semantics of
:func:`llm_bci_tpu.parallel.mesh.batch_sharding`. Axes not named in the
specs (``fsdp``, ``sp``, ``tp``) replicate the computation, matching the
activation layout. (Under ``sp > 1`` time-sharded activations would be
all-gathered at the shard_map boundary — callers consult
:func:`sequence_sharded` and prefer their XLA path instead.)

The Trainer assigns the active mesh on every construction
(:func:`set_op_mesh`; 1-device meshes clear it), so models applied outside
any trainer — single-chip serving, the bench — keep the unwrapped kernels.
Like any module-level dispatch hint, a bare ``model.apply`` after a
multi-device Trainer in the same process inherits the last assignment;
call ``set_op_mesh(None)`` to clear it explicitly.
"""
from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

_MESH: Optional[Mesh] = None


def set_op_mesh(mesh: Optional[Mesh]) -> None:
    """Assign the mesh that batch-parallel Pallas ops shard over (clears
    when ``mesh`` is ``None`` or single-device)."""
    global _MESH
    _MESH = mesh if mesh is not None and mesh.size > 1 else None


def op_mesh() -> Optional[Mesh]:
    """The active multi-device mesh, or ``None`` (run kernels unwrapped)."""
    return _MESH


def batch_shardable(batch: int) -> bool:
    """Whether a batch of this size splits evenly over the active mesh's
    ``data`` axis (callers fall back to their XLA path when it doesn't)."""
    return _MESH is None or batch % _MESH.shape["data"] == 0


def sequence_sharded() -> bool:
    """True when the active mesh has a non-trivial sequence-parallel axis.

    The batch-parallel Pallas kernels assume each device holds FULL
    sequences for its batch shard; wrapping them in the data-axis
    ``shard_map`` under ``sp > 1`` would silently all-gather the time dim
    per call. Callers (NDT1's per-trace flash decision) route to the XLA
    SDPA path instead, which GSPMD partitions over ``sp`` natively."""
    return _MESH is not None and _MESH.shape.get("sp", 1) > 1
