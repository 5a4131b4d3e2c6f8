"""AOT serving export: serialize the compiled decode program with
``jax.export``.

Beyond-reference deployment surface (the reference serves by running the
full torch + HF-``generate`` stack in-process, ``/root/reference/
eval_phonemes.py:113-135``): the BCI decode program — spliced neural
prompt → token ids, greedy or (diverse) beam — is lowered ONCE to
StableHLO and serialized. A serving host then needs only:

* the exported artifact (this module's ``load_decode``),
* the weights (the component msgpack / Orbax checkpoint),
* jax + the PJRT TPU plugin — no model-definition Python, no flax, no
  framework version skew between trainer and server.

Parameters stay ARGUMENTS of the exported program (not baked constants):
the artifact is a few MB of MLIR regardless of model size, weights ship
separately in whatever quantization layout they were trained/PTQ'd to
(bf16 or int8 + scales — the exported program embeds the matching
dequant math).

Export is cross-platform: ``platforms=("tpu",)`` lowers for TPU from any
host (the default also includes the host platform so tests can execute
the artifact). ``jax.export`` guarantees backward compatibility for
serialized artifacts across jax releases.

One caveat: the Pallas-vs-XLA kernel dispatch (int8 dequant matmul,
banded flash) reads ``jax.default_backend()`` at TRACE time, so an
artifact exported on a CPU host embeds the XLA fallback paths even for
its ``tpu`` platform — numerically identical, but without the fused-
kernel bandwidth wins. Export perf-critical TPU artifacts on a TPU host.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
from jax import export as jax_export


def _struct_tree(tree: Any):
    """ShapeDtypeStruct skeleton of a pytree of (device/num)py arrays."""
    import numpy as np

    def one(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree_util.tree_map(one, tree)


def _default_platforms() -> Tuple[str, ...]:
    host = jax.default_backend()
    return ("tpu",) if host == "tpu" else ("tpu", host)


def _export(fn, params, example_inputs, out_path: str, platforms) -> str:
    """Lower ``fn(params, inputs)``, serialize, write. Shared tail of the
    two exporters so artifact handling can't diverge between them.

    The op mesh is cleared for the trace: a live multi-device Trainer in
    the same process assigns it (``ops/spmd.set_op_mesh``), and a
    ``shard_map``-wrapped kernel would bake that mesh into the artifact —
    serving artifacts are single-program by design."""
    from llm_bci_tpu.ops import spmd

    platforms = list(platforms if platforms is not None else _default_platforms())
    prev_mesh = spmd.op_mesh()
    spmd.set_op_mesh(None)
    try:
        exp = jax_export.export(jax.jit(fn), platforms=platforms)(
            _struct_tree(params), _struct_tree(example_inputs)
        )
    finally:
        spmd.set_op_mesh(prev_mesh)
    parent = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(parent, exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(exp.serialize())
    return out_path


def export_decode(
    model,
    params: Dict[str, Any],
    example_inputs: Dict[str, Any],
    out_path: str,
    *,
    max_new_tokens: int,
    num_beams: int = 1,
    num_return_sequences: int = 1,
    num_beam_groups: int = 1,
    diversity_penalty: float = 0.0,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Lower ``model``'s generate method to StableHLO and serialize it.

    ``example_inputs`` fixes the serving signature (batch size, padded
    prompt/spike lengths — TPU serving is static-shape by design, matching
    the frozen-pad dataloader); only shapes/dtypes are read, values are
    ignored. Generation hyperparameters are baked into the artifact: one
    artifact per serving configuration, the deployment-friendly choice
    (the reference's HF ``GenerationConfig`` equivalent, pinned at export
    time instead of load time).

    ``platforms`` defaults to ``("tpu", <host>)`` so the artifact runs on
    the serving TPU and remains executable host-side for smoke tests.
    Returns ``out_path``.
    """
    gen_kwargs = dict(
        max_new_tokens=max_new_tokens,
        num_beams=num_beams,
        num_return_sequences=num_return_sequences,
        num_beam_groups=num_beam_groups,
        diversity_penalty=diversity_penalty,
        length_penalty=length_penalty,
        early_stopping=early_stopping,
        eos_token_id=eos_token_id,
        pad_token_id=pad_token_id,
    )

    def decode(params, inputs):
        return model.apply(
            {"params": params}, **inputs, method="generate", **gen_kwargs
        )

    return _export(decode, params, example_inputs, out_path, platforms)


def export_forward(
    model,
    params: Dict[str, Any],
    example_inputs: Dict[str, Any],
    out_path: str,
    *,
    outputs: Sequence[str] = ("preds",),
    const_inputs: Optional[Dict[str, Any]] = None,
    rngs: Optional[Dict[str, Any]] = None,
    platforms: Optional[Sequence[str]] = None,
    **apply_kwargs,
) -> str:
    """Export a model's inference forward pass (``training=False``).

    The real-time BCI case: an NDT1-CTC artifact maps a spike window to
    per-frame phoneme log-probabilities on-device — the closed-loop
    decode loop ships this plus a host-side CTC beam/lexicon stage, with
    no flax/model code on the serving host. Works for any registered
    model (iTransformer/PatchTST behavior decoders export the same way).

    ``outputs`` selects ``ModelOutput`` fields; the artifact returns a
    plain dict of arrays (no custom pytree types to register on the
    serving host) and XLA dead-code-eliminates everything the selection
    doesn't need — e.g. with ``outputs=("preds",)`` the CTC loss (and its
    dummy targets) vanish from the compiled program. ``const_inputs``
    are baked as constants to satisfy loss-path arguments the serving
    signature shouldn't expose (dummy ``targets``/``targets_lengths``);
    ``apply_kwargs`` bake likewise (e.g. ``masker_overrides``), as do
    ``rngs`` for models whose inference path draws a stream (force-active
    maskers: the key becomes a constant, so the artifact's mask draw is
    fixed — export per draw if you need several). Returns ``out_path``.
    """
    const_inputs = const_inputs or {}

    def forward(params, inputs):
        out = model.apply(
            {"params": params}, **inputs, **const_inputs,
            training=False, rngs=rngs, **apply_kwargs,
        )
        return {k: getattr(out, k) for k in outputs}

    return _export(forward, params, example_inputs, out_path, platforms)


def load_decode(path: str):
    """Deserialize an exported decode artifact.

    Returns ``fn(params, inputs) -> tokens`` (or a ``BeamResult``-shaped
    tuple when the artifact was exported with
    ``num_return_sequences > 1``). The callable is jitted — the first
    call traces the exported program once, every later call hits the
    cached executable (the latency-critical property for the per-window
    serving loop); no model class or config is needed.
    """
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())

    jfn = jax.jit(lambda params, inputs: exp.call(params, inputs))

    def fn(params, inputs):
        return jfn(params, inputs)

    fn.in_avals = exp.in_avals
    fn.platforms = exp.platforms
    return fn
