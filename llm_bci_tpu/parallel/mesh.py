"""Device mesh + sharding rules — the framework's entire distribution story.

Replaces the reference's Accelerate/DeepSpeed stack (``models/trainer.py:77-80,
258-262``, ``deepspeed/*.yaml``) with one `jax.sharding.Mesh` and GSPMD:

* axis ``data``  — batch sharding (Accelerate DDP with ``split_batches=True``:
  the configured batch size is the *global* batch, split across devices).
* axis ``fsdp``  — parameter/optimizer-state sharding (ZeRO-1/2/3 as a single
  mechanism: `NamedSharding` on the param pytree; XLA inserts all-gathers on
  use and reduce-scatters on grads, riding ICI).

No hand-written collectives: losses/metrics are reduced by `jax.jit` output
shardings; the `psum`s come from GSPMD.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, fsdp, sp, tp) mesh. ``-1`` takes all remaining devices.

    ``tp`` is the tensor-parallel axis (Megatron-style sharding of the BCI
    LLM's projection matrices — see :func:`tp_llama_rules`); it is the
    innermost axis so TP collectives ride the fastest ICI links. ``sp`` is
    the sequence-parallel axis: the trainer shards the TIME dimension of the
    spike tensors over it (see :func:`sequence_sharding`), so long-context
    NDT1 activations (attention logits, per-bin embeddings) split across
    chips — GSPMD inserts the K/V all-gathers attention needs. With
    ``sp=1``/``tp=1`` the mesh behaves exactly like the historical 2D
    (data, fsdp) mesh: PartitionSpecs never name trivial axes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = {"data": data, "fsdp": fsdp, "sp": sp, "tp": tp}
    free = [k for k, v in sizes.items() if v == -1]
    if len(free) > 1:
        raise ValueError("Only one mesh axis may be -1")
    if free:
        fixed = 1
        for k, v in sizes.items():
            if v != -1:
                fixed *= v
        sizes[free[0]] = n // fixed
    if sizes["data"] * sizes["fsdp"] * sizes["sp"] * sizes["tp"] != n:
        raise ValueError(
            f"mesh {sizes['data']}x{sizes['fsdp']}x{sizes['sp']}x{sizes['tp']}"
            f" (data x fsdp x sp x tp) != {n} devices"
        )
    arr = np.asarray(devices).reshape(
        sizes["data"], sizes["fsdp"], sizes["sp"], sizes["tp"]
    )
    return Mesh(arr, ("data", "fsdp", "sp", "tp"))


def tp_llama_rules(mesh: Mesh) -> Dict[str, P]:
    """Megatron-style tensor-parallel rules for the Llama decoder stack
    (reference scale: ``deepspeed/kai.yaml`` shards only optimizer state;
    TP is a beyond-reference axis for serving/fine-tuning models whose
    *activations* or per-layer weights outgrow one chip).

    Column-parallel: q/k/v and gate/up kernels shard their OUTPUT dim over
    ``tp`` (heads/intermediate split — requires ``num_key_value_heads %
    tp == 0``). Row-parallel: o_proj and down_proj shard their INPUT dim;
    GSPMD inserts the per-layer psum/reduce-scatter that completes the
    partial sums. LoRA adapters, norms, embeddings and the lm_head stay
    replicated (rank-8 factors and norm vectors are tiny; the vocab matmul
    at B·T of the fine-tune recipe is cheaper replicated than the logits
    all-gather a sharded lm_head implies). When ``fsdp > 1`` the matched
    kernels shard their other dim over ``fsdp`` as well.
    """
    f = "fsdp" if mesh.shape["fsdp"] > 1 else None
    return {
        r"self_attn/(q_proj|k_proj|v_proj)/kernel$": P(f, "tp"),
        r"self_attn/o_proj/kernel$": P("tp", f),
        r"mlp/(gate_proj|up_proj)/kernel$": P(f, "tp"),
        r"mlp/down_proj/kernel$": P("tp", f),
        # int8-quantized bases carry per-output-channel scales: they follow
        # their kernel's output dim — sharded over tp when column-parallel,
        # replicated when row-parallel (o/down output dim is unsharded).
        r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel_scale$": P("tp"),
        r"(o_proj|down_proj)/kernel_scale$": P(),
        r"(lora_A|lora_B)$": P(),
    }


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data axis, replicated over fsdp."""
    return NamedSharding(mesh, P("data"))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, time, ...) arrays: batch over ``data``, time over ``sp``.

    The trainer applies this to the time-axis batch keys
    (``parallelism.sp_keys``, default the ``spikes*`` tensors) when the mesh
    has ``sp > 1`` — per-device activation memory and attention-logits work
    then scale with T/sp, the TPU-native long-context story (SURVEY §5:
    sequence-sharding the time axis on the mesh)."""
    return NamedSharding(mesh, P("data", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(
    path: Tuple[str, ...],
    leaf: jax.Array,
    mesh: Mesh,
    min_size: int = 1 << 20,
) -> P:
    """Default FSDP rule: shard the largest divisible dimension of any param
    with >= ``min_size`` elements over the ``fsdp`` axis; small params stay
    replicated. Mirrors what ZeRO-3 buys the reference's BCI-LLM workload
    without per-layer annotations."""
    n_fsdp = mesh.shape["fsdp"]
    if n_fsdp == 1 or leaf.size < min_size:
        return P()
    # Prefer sharding the last dim, then earlier dims, whichever divides.
    dims = list(range(leaf.ndim))
    for d in sorted(dims, key=lambda d: (-leaf.shape[d],)):
        if leaf.shape[d] % n_fsdp == 0:
            spec = [None] * leaf.ndim
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def shard_pytree(
    tree: Any,
    mesh: Mesh,
    rules: Optional[Dict[str, P]] = None,
    min_size: int = 1 << 20,
) -> Any:
    """Produce a NamedSharding pytree for ``tree``.

    ``rules`` maps path-regex -> PartitionSpec and wins over the default FSDP
    rule; paths are '/'-joined param names (e.g. ``encoder/layer_0/attn/query/kernel``).
    """
    rules = rules or {}
    compiled = [(re.compile(k), v) for k, v in rules.items()]

    def spec_for(path, leaf) -> NamedSharding:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for pat, spec in compiled:
            if pat.search(name):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, fsdp_param_spec(path, leaf, mesh, min_size))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def device_put_sharded_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Transfer a host numpy batch to device, batch-dim sharded over ``data``."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
