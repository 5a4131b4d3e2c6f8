"""Pallas flash attention with banded context + key-padding masks.

The hot kernel of the NDT1 mlm workload (T up to ``max_F=1024``,
``configs/ndt1.yaml:39``): XLA's plain SDPA materializes the (B, H, T, T)
score tensor in HBM for these sizes; this kernel streams K/V blocks through
VMEM with the online-softmax recurrence, and the mask never exists as a
tensor at all — the banded window ``[i - backward, i + forward]``
(reference ``models/ndt1.py:30-41``) and the key-padding mask are evaluated
from block indices + a (B, S) validity vector inside the kernel.

Performance structure: the k-block sweep is a *grid dimension* (not an
in-kernel loop) with "arbitrary" semantics, so Mosaic double-buffers the
K/V DMAs against compute; the k index map is clamped to the band, so
off-band blocks are never fetched; QKᵀ/PV ride the MXU in the input dtype
(bf16) with fp32 accumulation; softmax state (m, l, acc) lives in VMEM
scratch across the k sweep.

Forward + backward (recompute-based) via ``jax.custom_vjp``; rows with no
valid key produce 0 (downstream losses mask them, so the reference's
"self-attend hack" for padded rows is unnecessary).

Layout: (B, T, H, D) public API; internally (B*H, T, D) padded to block
multiples (T) and 128 lanes (D).

Numerics: matmuls run at the default TPU precision (bf16 passes with fp32
accumulation), like XLA's own SDPA — compiled outputs agree with a dense
fp32 reference to ~1e-2 relative (bf16 rounding), and to 2e-5 in interpret
mode (tests/test_flash_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_INTERPRET = False  # set True to run kernels in interpreter mode (tests/CPU)

# "auto" dispatch crossover: XLA's fused SDPA wins below this sequence
# length (measured: flash loses at the stacked-CTC T'=121, wins 1.8x at
# mlm T=1024 with batch >= 32). Single source of truth — both the NDT1
# per-layer "auto" mode and flash_attention_supported() read it.
FLASH_AUTO_MIN_T = 512


def set_interpret_mode(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _compiler_params(semantics):
    if _INTERPRET:
        return None
    try:
        return pltpu.CompilerParams(dimension_semantics=semantics)
    except TypeError:  # older/newer param name differences
        return None


def _keep_mask(seed_u32, bh, q_pos, k_pos, drop_p: float):
    """Deterministic per-(batch·head, q_pos, k_pos, seed) keep mask for
    attention-probability dropout, as a murmur3-style integer mixer on the
    absolute positions. Counter-based (not stateful), so the backward
    recompute regenerates the identical mask from the same coordinates —
    and it runs under the CPU interpreter, where ``pltpu.prng_*`` has no
    lowering. ~8 VPU ops per element; negligible against the MXU work at
    banded shapes."""
    x = (
        q_pos.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        ^ k_pos.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    )
    x = x ^ (bh.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    x = x + seed_u32
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(drop_p * 4294967296.0), 4294967295))
    return x >= thresh


def _band_kblocks(bq: int, bk: int, fwd: int, bwd: int, nK: int) -> int:
    """Number of k blocks any q block can touch within the band."""
    span = bwd + fwd + bq  # key positions reachable from a q block
    return min(-(-span // bk) + 1, nK)


def _band_qblocks(bq: int, bk: int, fwd: int, bwd: int, nQ: int) -> int:
    span = fwd + bwd + bk
    return min(-(-span // bq) + 1, nQ)


# ---------------------------------------------------------------------------
# Forward kernel — grid (BH, nQ, nKb); k sweep innermost with VMEM carry
# ---------------------------------------------------------------------------

def _fwd_kernel(
    seed_ref,     # SMEM (1,) int32 — dropout seed (unused when drop_p == 0)
    q_ref,        # (1, Bq, D)
    k_ref,        # (1, Bk, D)
    v_ref,        # (1, Bk, D)
    valid_ref,    # (1, 1, Bk)
    o_ref,        # (1, Bq, D)
    lse_ref,      # (1, 1, Bq)
    acc_ref,      # VMEM (Bq, D) f32
    m_ref,        # VMEM (Bq, 128) f32
    l_ref,        # VMEM (Bq, 128) f32
    *,
    fwd: int,
    bwd: int,
    block_q: int,
    block_k: int,
    n_kb: int,
    num_k_blocks: int,
    scale: float,
    drop_p: float,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    Bq, D = q_ref.shape[1], q_ref.shape[2]
    lo_kb = jnp.maximum((qi * block_q - bwd) // block_k, 0)
    kb = jnp.minimum(lo_kb + kj, num_k_blocks - 1)

    @pl.when(kj == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # Clamped duplicate blocks at the edges are fully masked out below, and
    # blocks beyond the band contribute nothing: compute only when in band.
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 0)
    k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 1)
    in_band = (k_pos >= q_pos - bwd) & (k_pos <= q_pos + fwd)
    not_duplicate = kj == 0  # first sweep position is never a clamp-duplicate
    is_dup = (jnp.minimum(lo_kb + kj, num_k_blocks - 1) != lo_kb + kj) & (~not_duplicate)

    @pl.when(jnp.logical_not(is_dup))
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        valid = valid_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                           # (Bq, Bk) f32
        mask = in_band & (valid[None, :] != 0)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0]
        l_prev = l_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
        alpha = jnp.where(m_prev <= NEG_INF, 0.0, alpha)
        p = jnp.exp(s - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        # l accumulates the UNdropped probs (the softmax normalizer is not
        # affected by dropout in torch-SDPA semantics); only the value
        # accumulation sees the keep/(1-p) scaling.
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        p_acc = p
        if drop_p > 0.0:
            keep = _keep_mask(
                jnp.asarray(seed_ref[0], jnp.uint32), bh, q_pos, k_pos, drop_p,
            )
            p_acc = p * keep.astype(p.dtype) / (1.0 - drop_p)
        acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
            p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(kj == n_kb - 1)
    def _finalize():
        l_i = l_ref[:, 0]
        m_i = m_ref[:, 0]
        l_safe = jnp.where(l_i > 0, l_i, 1.0)
        o_ref[0] = (acc_ref[...] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(l_i > 0, m_i + jnp.log(l_safe), NEG_INF)


def _flash_fwd(q, k, v, key_valid, seed, fwd, bwd, scale, block_q, block_k, drop_p):
    BH, T, D = q.shape
    nQ = T // block_q
    nK = T // block_k
    n_kb = _band_kblocks(block_q, block_k, fwd, bwd, nK)

    def kidx(b, qi, kj):
        lo = jnp.maximum((qi * block_q - bwd) // block_k, 0)
        return (b, jnp.minimum(lo + kj, nK - 1), 0)

    kernel = functools.partial(
        _fwd_kernel, fwd=fwd, bwd=bwd, block_q=block_q, block_k=block_k,
        n_kb=n_kb, num_k_blocks=nK, scale=scale, drop_p=drop_p,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(BH, nQ, n_kb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), kidx),
            pl.BlockSpec((1, block_k, D), kidx),
            pl.BlockSpec((1, 1, block_k), lambda b, qi, kj: kidx(b, qi, kj)[:1] + (0,) + kidx(b, qi, kj)[1:2]),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, kj: (b, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(seed, q, k, v, key_valid)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels (recompute)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_acc,
    *, fwd: int, bwd: int, block_q: int, block_k: int,
    n_kb: int, num_k_blocks: int, scale: float, drop_p: float,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    Bq, D = q_ref.shape[1], q_ref.shape[2]
    lo_kb = jnp.maximum((qi * block_q - bwd) // block_k, 0)
    kb = jnp.minimum(lo_kb + kj, num_k_blocks - 1)

    @pl.when(kj == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    is_dup = (jnp.minimum(lo_kb + kj, num_k_blocks - 1) != lo_kb + kj) & (kj != 0)

    @pl.when(jnp.logical_not(is_dup))
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        valid = valid_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (Bq, s.shape[1]), 0)
        k_pos = kb * s.shape[1] + jax.lax.broadcasted_iota(jnp.int32, (Bq, s.shape[1]), 1)
        mask = (k_pos >= q_pos - bwd) & (k_pos <= q_pos + fwd) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if drop_p > 0.0:
            # dP = D ⊙ (dO Vᵀ); delta = Σ_j P D dp is rowsum(do·out), already
            # dropout-aware since out itself came from the dropped probs.
            keep = _keep_mask(
                jnp.asarray(seed_ref[0], jnp.uint32), bh, q_pos, k_pos, drop_p,
            )
            dp = dp * keep.astype(dp.dtype) / (1.0 - drop_p)
        ds = p * (dp - delta[:, None])
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kj == n_kb - 1)
    def _finalize():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, fwd: int, bwd: int, block_q: int, block_k: int,
    n_qb: int, num_q_blocks: int, scale: float, drop_p: float,
):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    Bk, D = k_ref.shape[1], k_ref.shape[2]
    lo_qb = jnp.maximum((ki * block_k - fwd) // block_q, 0)
    qb = jnp.minimum(lo_qb + qj, num_q_blocks - 1)

    @pl.when(qj == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    is_dup = (jnp.minimum(lo_qb + qj, num_q_blocks - 1) != lo_qb + qj) & (qj != 0)

    @pl.when(jnp.logical_not(is_dup))
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        valid = valid_ref[0, 0]
        Bq = q.shape[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                           # (Bq, Bk)
        q_pos = qb * Bq + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 0)
        k_pos = ki * Bk + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
        mask = (k_pos >= q_pos - bwd) & (k_pos <= q_pos + fwd) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        p_v = p
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if drop_p > 0.0:
            # Same counter-based mask as the forward: dV sees the dropped
            # probs, dP is masked before the softmax backward.
            keep = _keep_mask(
                jnp.asarray(seed_ref[0], jnp.uint32), bh, q_pos, k_pos, drop_p,
            )
            d = keep.astype(p.dtype) / (1.0 - drop_p)
            p_v = p * d
            dp = dp * d
        dv_acc[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qj == n_qb - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, key_valid, seed, out, lse, do, fwd, bwd, scale, block_q,
               block_k, drop_p):
    BH, T, D = q.shape
    nQ = T // block_q
    nK = T // block_k
    n_kb = _band_kblocks(block_q, block_k, fwd, bwd, nK)
    n_qb = _band_qblocks(block_q, block_k, fwd, bwd, nQ)
    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]

    def kidx(b, qi, kj):
        lo = jnp.maximum((qi * block_q - bwd) // block_k, 0)
        return (b, jnp.minimum(lo + kj, nK - 1), 0)

    def kidx3(b, qi, kj):
        lo = jnp.maximum((qi * block_q - bwd) // block_k, 0)
        return (b, 0, jnp.minimum(lo + kj, nK - 1))

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, fwd=fwd, bwd=bwd, block_q=block_q, block_k=block_k,
            n_kb=n_kb, num_k_blocks=nK, scale=scale, drop_p=drop_p,
        ),
        grid=(BH, nQ, n_kb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), kidx),
            pl.BlockSpec((1, block_k, D), kidx),
            pl.BlockSpec((1, 1, block_k), kidx3),
            pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, kj: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, kj: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, kj: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(seed, q, k, v, key_valid, do, lse, delta)

    def qidx(b, ki, qj):
        lo = jnp.maximum((ki * block_k - fwd) // block_q, 0)
        return (b, jnp.minimum(lo + qj, nQ - 1), 0)

    def qidx3(b, ki, qj):
        lo = jnp.maximum((ki * block_k - fwd) // block_q, 0)
        return (b, 0, jnp.minimum(lo + qj, nQ - 1))

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, fwd=fwd, bwd=bwd, block_q=block_q, block_k=block_k,
            n_qb=n_qb, num_q_blocks=nQ, scale=scale, drop_p=drop_p,
        ),
        grid=(BH, nK, n_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), qidx),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qj: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qj: (b, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, ki, qj: (b, 0, ki)),
            pl.BlockSpec((1, block_q, D), qidx),
            pl.BlockSpec((1, 1, block_q), qidx3),
            pl.BlockSpec((1, 1, block_q), qidx3),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, ki, qj: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, ki, qj: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), k.dtype),
            jax.ShapeDtypeStruct((BH, T, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(seed, q, k, v, key_valid, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded (BH, T, D) layout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_core(q, k, v, key_valid, seed, fwd, bwd, scale, block_q, block_k,
                drop_p):
    out, _ = _flash_fwd(
        q, k, v, key_valid, seed, fwd, bwd, scale, block_q, block_k, drop_p
    )
    return out


def _flash_core_fwd(q, k, v, key_valid, seed, fwd, bwd, scale, block_q,
                    block_k, drop_p):
    out, lse = _flash_fwd(
        q, k, v, key_valid, seed, fwd, bwd, scale, block_q, block_k, drop_p
    )
    return out, (q, k, v, key_valid, seed, out, lse)


def _flash_core_bwd(fwd, bwd, scale, block_q, block_k, drop_p, res, do):
    q, k, v, key_valid, seed, out, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, key_valid, seed, out, lse, do, fwd, bwd, scale, block_q,
        block_k, drop_p,
    )
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _band_bounds(fwd: Optional[int], bwd: Optional[int], T: int) -> Tuple[int, int]:
    """Static (forward, backward) widths; None/unbounded → T."""
    f = T if fwd is None else fwd
    b = T if bwd is None else bwd
    return f, b


def banded_flash_attention(
    q: jax.Array,                  # (B, T, H, D)
    k: jax.Array,                  # (B, T, H, D)
    v: jax.Array,                  # (B, T, H, D)
    key_valid: Optional[jax.Array] = None,   # (B, T) 1 = valid key
    context_forward: Optional[int] = None,   # None = unbounded
    context_backward: Optional[int] = None,
    block_q: int = 512,
    block_k: int = 512,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention with a static banded window and dynamic key padding.

    Rows with no valid key in their band return 0.

    ``dropout_rate`` > 0 with a ``dropout_rng`` applies torch-SDPA-semantics
    attention-probability dropout INSIDE the kernel (counter-based mask on
    absolute positions, regenerated exactly in the backward recompute) —
    the (B, H, T, T) probability/keep-mask tensors never exist in HBM.

    Default blocks: 512 measured fastest across T=512..1024 on v5e
    (fwd+bwd, B=64 H=8 D=128: 21.7 ms vs 36.3 ms at block 128 and
    ~39 ms for XLA SDPA at T=1024); the clamp below keeps small-T shapes
    legal. Callers can override for VMEM-constrained configs.

    On a multi-device mesh (``ops.spmd.set_op_mesh``, assigned by the
    Trainer) the kernel runs under ``jax.shard_map`` over the ``data``
    axis — ``pallas_call`` is a custom call GSPMD can't partition, so the
    unwrapped kernel would force per-call all-gathers of the sharded
    activations. Each shard folds its ``data`` index into the dropout rng
    so keep-masks stay independent across shards.
    """
    from llm_bci_tpu.ops.spmd import batch_shardable, op_mesh

    mesh = op_mesh()
    if mesh is not None:
        B = q.shape[0]
        if not batch_shardable(B):
            raise ValueError(
                f"banded_flash_attention on a multi-device mesh needs the "
                f"batch ({B}) divisible by the data axis "
                f"({mesh.shape['data']}); route this call to the XLA "
                "attention path instead"
            )
        from jax.sharding import PartitionSpec as P

        kwargs = dict(
            context_forward=context_forward,
            context_backward=context_backward,
            block_q=block_q,
            block_k=block_k,
            dropout_rate=dropout_rate,
        )
        has_kv = key_valid is not None
        has_rng = dropout_rng is not None and float(dropout_rate) > 0.0
        spec4 = P("data", None, None, None)
        args, specs = [q, k, v], [spec4, spec4, spec4]
        if has_kv:
            args.append(key_valid)
            specs.append(P("data", None))
        if has_rng:
            args.append(dropout_rng)
            specs.append(P())

        def body(qs, ks, vs, *rest):
            it = iter(rest)
            kv = next(it) if has_kv else None
            rng = next(it) if has_rng else None
            if rng is not None:
                # independent keep-masks per shard: the kernel's counters
                # restart from the local batch index on every device
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return _banded_flash_attention_local(
                qs, ks, vs, kv, dropout_rng=rng, **kwargs
            )

        # check_vma=False: pallas_call's out_shape carries no varying-
        # mesh-axes annotation, which the vma checker requires.
        return jax.shard_map(
            body, mesh=mesh, in_specs=tuple(specs), out_specs=spec4,
            check_vma=False,
        )(*args)

    return _banded_flash_attention_local(
        q, k, v, key_valid, context_forward, context_backward,
        block_q, block_k, dropout_rate, dropout_rng,
    )


def _banded_flash_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: Optional[jax.Array] = None,
    context_forward: Optional[int] = None,
    context_backward: Optional[int] = None,
    block_q: int = 512,
    block_k: int = 512,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    B, T, H, D = q.shape
    fwd_w, bwd_w = _band_bounds(context_forward, context_backward, T)
    scale = 1.0 / float(np.sqrt(D))
    drop_p = float(dropout_rate)
    if drop_p > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(
            dropout_rng, (1,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        )
    else:
        drop_p = 0.0
        seed = jnp.zeros((1,), jnp.int32)

    # TPU tiles are (8, 128): block sizes must be sublane-aligned, and the
    # sequence is padded to a block multiple (padded keys are invalid).
    block = min(block_q, block_k, max(8, -(-T // 8) * 8), 512)
    block = -(-block // 8) * 8
    block_q = block_k = block
    Tp = -(-T // block) * block
    Dp = max(-(-D // 128) * 128, 128)

    if key_valid is None:
        key_valid = jnp.ones((B, T), jnp.int32)
    key_valid = key_valid.astype(jnp.int32)

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, Dp - D)))

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    valid = jnp.pad(key_valid, ((0, 0), (0, Tp - T)))
    valid = jnp.repeat(valid, H, axis=0)[:, None, :]   # (B*H, 1, Tp)

    out = _flash_core(
        qb, kb, vb, valid, seed, fwd_w, bwd_w, scale, block_q, block_k, drop_p
    )
    out = out[:, :T, :D].reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def flash_attention_supported(q, k, v, mask, is_causal) -> bool:
    """Routing predicate for the generic ``dot_product_attention`` entry
    (``set_attention_impl("pallas")``): the kernel handles self-attention
    with no mask or a causal band. Dense boolean masks are not expressible
    as band+padding at trace time — those callers should use
    :func:`banded_flash_attention` directly. Short sequences stay on XLA
    SDPA, where the fused dense kernel is faster (measured crossover ~512)."""
    import jax as _jax

    if mask is not None:
        return False
    if not (_jax.default_backend() == "tpu" or _INTERPRET):
        return False
    B, T, H, D = q.shape
    if k.shape[1] != T or v.shape[1] != T:
        return False        # self-attention lengths only
    if k.shape[2] != H or v.shape[2] != H:
        return False        # no GQA here: the kernel reshapes k/v with q's H
    return T >= FLASH_AUTO_MIN_T


def flash_attention(q, k, v, mask=None, is_causal=False):
    """Generic-entry flash attention: full or causal self-attention
    (band forward=0). Masked variants go through
    :func:`banded_flash_attention` with an explicit key-validity vector."""
    if mask is not None:
        raise NotImplementedError(
            "dense masks are not supported on the generic flash path; "
            "use banded_flash_attention(key_valid=...) for band+padding"
        )
    return banded_flash_attention(
        q, k, v, None,
        context_forward=0 if is_causal else None,
        context_backward=None,
    )
