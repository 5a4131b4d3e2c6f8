"""Int8 weight-only quantization for the frozen LLM base.

Serving/fine-tune memory lever beyond the reference (whose LLM runs fp16,
``/root/reference/models/bci.py:71``): the frozen Llama projection kernels
and lm_head are stored as **int8 + one f32 scale per output channel**
(symmetric, absmax). Matmuls dequantize on the fly:

    y = (x @ q.astype(compute)) * scale        # q int8, exact in bf16

int8 magnitudes (<= 127) are exactly representable in bf16, so the only
error is the weight rounding itself (<= scale/2 per element). The win is
HBM bytes — the usual bound for both the B<=8 KV-cache decode (weights
stream every token) and the frozen-base fine-tune step: int8 halves
weight traffic vs the bf16 (or the reference's fp16, both 2-byte)
layout, and a 7B base drops to ~6.8 GB of HBM.

Two matmul paths:

* XLA (`_int8_matmul_xla`): convert + dot; on TPU the convert may
  materialize a bf16 copy of the weight block in HBM, which forfeits the
  bandwidth win — kept as the reference/CPU/grad path.
* Pallas (`_int8_matmul_pallas`): tiles of the int8 kernel are DMA'd to
  VMEM, converted in-register, fed to the MXU, and scaled into the f32
  accumulator — weights cross HBM exactly once, as int8. Forward only
  (the frozen base never takes weight grads; x-grads flow through the
  XLA path of the custom VJP).

`int8_matmul` dispatches: Pallas on TPU for tile-aligned shapes, XLA
otherwise. Backward is always XLA: dL/dx = (g * scale) @ q^T.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret_mode(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


def quantize_int8(w, axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric absmax int8 quantization, one scale per output channel.

    ``w`` is an (in, out)-style kernel; ``axis`` is the reduction (input)
    axis. Host-side numpy — used at HF-import/warm-start time. Returns
    ``(q int8, scale f32)`` with ``q * scale ~= w`` and scale shaped like
    ``w`` with ``axis`` removed.
    """
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=axis).astype(np.float32)


def dequantize_int8(q, scale, dtype=np.float32) -> np.ndarray:
    """Inverse of :func:`quantize_int8` for (in, out) kernels (host-side
    numpy). Shared by both checkpoint-layout adapters — keep the math in
    one place."""
    w = np.asarray(q).astype(np.float32) * np.asarray(scale, np.float32)[None, :]
    return w.astype(np.dtype(dtype))


def adapt_quantization(saved, target):
    """Re-lay-out a saved param (sub)tree to match ``target``'s quantization.

    Checkpoints are written in whatever layout the model trained with; a
    user may then load them into a model built with a different
    ``quantize`` setting. At any dict node holding a ``kernel`` leaf:

    * target int8 + ``kernel_scale``, saved float → **quantize** the saved
      kernel (symmetric absmax, per-output-channel — post-training
      quantization of the trained weights);
    * target float, saved int8 + ``kernel_scale`` → **dequantize**;
    * layouts already agree → pass through.

    Host-side numpy; other leaves pass through untouched. Without this,
    a leaf-wise dtype cast would turn trained bf16 kernels into garbage
    int8 (unscaled truncation) or int8 codes into tiny floats.
    """
    if not (isinstance(saved, dict) and isinstance(target, dict)):
        return saved
    out = {
        k: adapt_quantization(v, target[k])
        if isinstance(v, dict) and isinstance(target.get(k), dict)
        else v
        for k, v in saved.items()
    }
    t_k, s_k = target.get("kernel"), out.get("kernel")
    if t_k is None or s_k is None or isinstance(s_k, dict):
        return out
    t_int8 = np.dtype(getattr(t_k, "dtype", np.float32)) == np.int8
    s_arr = np.asarray(s_k)
    # note: bf16 arrays restore as ml_dtypes.bfloat16, which is NOT a
    # np.floating subtype — "float" here means "not an integer code".
    s_float = not np.issubdtype(s_arr.dtype, np.integer)
    if t_int8 and s_float:
        s_arr = s_arr.astype(np.float32)
        q, scale = quantize_int8(s_arr, axis=0)
        out["kernel"], out["kernel_scale"] = q, scale
    elif not t_int8 and s_arr.dtype == np.int8 and "kernel_scale" in out:
        out["kernel"] = dequantize_int8(
            s_arr, out.pop("kernel_scale"), getattr(t_k, "dtype", np.float32)
        )
    return out


# ---------------------------------------------------------------------------
# Pallas kernel: out[m, n] = sum_k x[m, k] * q[k, n] * scale[n]
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = q_ref[:].astype(x.dtype)  # int8 -> compute dtype, in-register
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _int8_matmul_pallas(
    x: jax.Array,  # (M, K) float
    q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32
    out_dtype,
    bm: int,
    bn: int,
    bk: int,
) -> jax.Array:
    M, K = x.shape
    N = q.shape[1]
    nm, nn, nk = M // bm, N // bn, K // bk
    kernel = functools.partial(_int8_matmul_kernel, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=None
        if _INTERPRET
        else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(x, q, scale[None, :])


def _int8_matmul_xla(x, q, scale, out_dtype):
    y = jax.lax.dot_general(
        x,
        q.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * scale.astype(jnp.float32)).astype(out_dtype)


def _fit_block(dim: int, block: int) -> int:
    """Largest of {block, 256, 128} that divides ``dim`` (else ``block``,
    and the viability check routes to the XLA fallback)."""
    for b in (block, 256, 128):
        if b <= block and dim % b == 0:
            return b
    return block


# Per-operand VMEM budgets for the auto block planner (bytes). Mosaic
# double-buffers the streamed weight blocks, so the working set is about
# 2*weight + acc + in/out blocks — comfortably inside ~16 MB VMEM.
_WEIGHT_BLOCK_BUDGET = 2 * 1024 * 1024
_ACC_BLOCK_BUDGET = 2 * 1024 * 1024


def _divisor_block(dim: int, cap: int, unit: int = 128) -> int:
    """Largest multiple of ``unit`` that divides ``dim``, at most ``cap``
    (0 when none exists)."""
    best = 0
    b = unit
    top = min(dim, cap)
    while b <= top:
        if dim % b == 0:
            best = b
        b += unit
    return best


def _plan_blocks(K: int, N: int, bm: int):
    """Pick (bn, bk) for the dequant kernel by HBM contiguity, not FLOPs.

    The op is weight-bandwidth bound (that's the whole point of int8
    storage), and ``q`` is (K, N) row-major: a (bk, bn) block reads
    ``bn``-byte contiguous runs with stride N. Fixed small blocks (the old
    256-ish defaults) made the big decode weights — lm_head is (1024,
    32000) — stream in 256-byte chunks, which measures ~3.5x off the HBM
    roofline and lost to the plain bf16 matmul. So: maximize ``bn`` first
    (whole rows when they fit, so blocks are fully contiguous), then grow
    ``bk`` within the weight-block budget. ``bm`` caps ``bn`` through the
    f32 accumulator's budget. Returns None when no 128-multiple divides a
    dim (→ XLA fallback)."""
    bn = _divisor_block(
        N, min(_WEIGHT_BLOCK_BUDGET // 128, _ACC_BLOCK_BUDGET // (bm * 4))
    )
    if not bn:
        return None
    bk = _divisor_block(K, _WEIGHT_BLOCK_BUDGET // bn)
    if not bk:
        return None
    return bn, bk


def _pallas_viable(M: int, K: int, N: int, bm: int, bn: int, bk: int) -> bool:
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    return M % bm == 0 and K % bk == 0 and N % bn == 0


def _int8_matmul_impl(x, q, scale, out_dtype, blocks):
    if blocks is None:  # impl="xla": partitionable path, no Pallas dispatch
        return _int8_matmul_xla(x, q, scale, out_dtype)
    bm, bn, bk = blocks
    M = x.shape[0]
    if _pallas_viable(M, x.shape[1], q.shape[1], bm, bn, bk):
        return _int8_matmul_pallas(x, q, scale, out_dtype, bm, bn, bk)
    return _int8_matmul_xla(x, q, scale, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _int8_matmul(x, q, scale, out_dtype, blocks):
    return _int8_matmul_impl(x, q, scale, out_dtype, blocks)


def _int8_matmul_fwd(x, q, scale, out_dtype, blocks):
    # residuals must be JAX types — carry x's dtype as a 0-size sentinel
    x_tag = jnp.zeros((0,), x.dtype)
    return _int8_matmul_impl(x, q, scale, out_dtype, blocks), (x_tag, q, scale)


def _int8_matmul_bwd(out_dtype, blocks, res, g):
    x_tag, q, scale = res
    x_dtype = x_tag.dtype
    # dL/dx = (g * scale) @ (q * 1.0)^T — weights are frozen under quant,
    # so only the activation gradient exists (q/scale get symbolic zeros).
    gs = g.astype(jnp.float32) * scale.astype(jnp.float32)
    dx = jax.lax.dot_general(
        gs.astype(x_dtype),
        q.astype(x_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_dtype)
    return dx, None, None


_int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def int8_matmul(
    x: jax.Array,  # (..., K)
    q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32
    out_dtype=None,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    impl: str = "auto",
) -> jax.Array:
    """``(x @ dequant(q, scale))`` with int8 weights streamed from HBM.

    Leading dims of ``x`` are flattened into M. On TPU, tile-aligned shapes
    (M % 16 after M-padding; K and N divisible by a 128-multiple) run the
    Pallas kernel; everything else falls back to the exact-same-math XLA
    path. ``block_n``/``block_k`` default to the contiguity-maximizing
    plan of :func:`_plan_blocks`; pass explicit values only to pin a
    specific tiling (tests).

    ``impl="xla"`` skips the Pallas kernel entirely: ``pallas_call`` is a
    custom call the SPMD partitioner can't split, so any computation whose
    operands are sharded over a multi-device mesh (tp/fsdp kernels,
    data-sharded activations) must take the XLA convert+dot path, which
    partitions normally and keeps the int8 HBM-residency win. The Trainer
    selects it per model via ``quantize: int8_xla`` (set automatically
    when ``mesh.size > 1``).
    """
    # dtype as its NAME: custom_vjp nondiff args must be plain hashables.
    out_dtype = np.dtype(out_dtype or x.dtype).name
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = q.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    # Small-M calls (M <= 1024) take the XLA convert+dot — now measured
    # for BOTH call classes that hit this branch (the r4 advisor flagged
    # that only serving had been measured):
    # * serving (training=False — LoRADense also pins impl="xla"
    #   explicitly): END-TO-END at true Llama-2-7B widths (16 layers,
    #   greedy B=8, r4), full-XLA decodes 1014-1017 tok/s vs the Pallas
    #   kernel's 955 (bf16: 662);
    # * small-batch TRAINING forwards (B*T <= 1024 debug/small
    #   fine-tunes): kernel-level fwd+bwd at M=512, 7B widths (r5, real
    #   chip): XLA 0.98 ms vs Pallas 1.29 ms at (4096,4096); 1.03 vs
    #   1.78 ms at the (4096,11008) ffn shape — XLA's fused convert+dot
    #   beats the M-padded (512→bm) Pallas schedule at skinny M both
    #   directions. docs/performance.md "int8 dispatch".
    # Larger-M calls (the standard fine-tune step's M = B*T ~ 1480) keep
    # the Pallas kernel (measured faster end-to-end: 36.5 vs 34.3
    # samples/s at 7B/16L, r4). Explicitly pinned blocks still take the
    # kernel (tests pin tilings).
    if impl == "auto" and block_n is None and block_k is None and M <= 1024:
        return _int8_matmul(x2, q, scale, out_dtype, None).reshape(*lead, N)
    if impl == "xla":
        return _int8_matmul(x2, q, scale, out_dtype, None).reshape(*lead, N)
    # Sublane-pad M (bf16 tile height 16) so tiny decode batches still take
    # the kernel; pad rows multiply zeros and are sliced off.
    bm = min(block_m, max(16, -(-M // 16) * 16))
    if block_n is None and block_k is None:
        plan = _plan_blocks(K, N, bm)
        block_n, block_k = plan if plan else (512, 256)
    else:
        # Explicit blocks: shrink to fit the dim (Llama-2-7B's ffn/vocab
        # dims 11008/32000 are 256- but not 512-aligned — a fixed block
        # would silently route exactly the largest kernels to XLA).
        block_n = _fit_block(N, block_n or 512)
        block_k = _fit_block(K, block_k or 256)
    Mp = -(-M // bm) * bm
    if Mp != M and _pallas_viable(Mp, K, N, bm, block_n, block_k):
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = _int8_matmul(x2, q, scale, out_dtype, (bm, block_n, block_k))
    if y.shape[0] != M:
        y = y[:M]
    return y.reshape(*lead, N)
