"""Pallas flash attention with banded context + key-padding masks.

The hot kernel of the NDT1 mlm workload (T up to ``max_F=1024``,
``configs/ndt1.yaml:39``): XLA's plain SDPA materializes the (B, H, T, T)
score tensor in HBM for these sizes; this kernel streams K/V blocks through
VMEM with the online-softmax recurrence, and the mask never exists as a
tensor at all — the banded window ``[i - backward, i + forward]``
(reference ``models/ndt1.py:30-41``) and the key-padding mask are evaluated
from block indices + a (B, S) validity vector inside the kernel.

Forward + backward (recompute-based) via ``jax.custom_vjp``; rows with no
valid key produce 0 (downstream losses mask them, so the reference's
"self-attend hack" for padded rows is unnecessary).

Layout: (B, T, H, D) public API matching
:func:`llm_bci_tpu.ops.attention.dot_product_attention`; internally
(B*H, T, D) with T padded to the q/k block size and D padded to 128 lanes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e30
_INTERPRET = False  # set True to run kernels in interpreter mode (tests/CPU)


def set_interpret_mode(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _band_bounds(fwd: Optional[int], bwd: Optional[int], T: int) -> Tuple[int, int]:
    """Static (forward, backward) widths; None/unbounded → T."""
    f = T if fwd is None else fwd
    b = T if bwd is None else bwd
    return f, b


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref,        # (1, Bq, D)
    k_ref,        # (1, S, D)
    v_ref,        # (1, S, D)
    valid_ref,    # (1, 1, S)
    o_ref,        # (1, Bq, D)
    lse_ref,      # (1, 1, Bq)
    *,
    fwd: int,
    bwd: int,
    block_k: int,
    scale: float,
):
    qi = pl.program_id(1)
    Bq = q_ref.shape[1]
    S = k_ref.shape[1]
    D = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32) * scale               # (Bq, D)
    q_pos = qi * Bq + jax.lax.broadcasted_iota(jnp.int32, (Bq, 1), 0)[:, 0]

    num_kb = S // block_k
    # Band-restricted k-block range for this q block.
    lo_kb = jnp.maximum((qi * Bq - bwd) // block_k, 0)
    hi_kb = jnp.minimum(((qi + 1) * Bq - 1 + fwd) // block_k + 1, num_kb)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        valid = valid_ref[0, 0, pl.ds(kb * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                   # (Bq, Bk)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 1)
        i = q_pos[:, None]
        mask = (k_pos >= i - bwd) & (k_pos <= i + fwd) & (valid[None, :] != 0)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1))
        # exp-normalize with dead-row protection
        alpha = jnp.exp(jnp.minimum(m_i - m_new, 0.0))
        alpha = jnp.where(m_i <= NEG_INF, 0.0, alpha)
        p = jnp.exp(s - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        l_new = l_i * alpha + jnp.sum(p, axis=1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((Bq, D), jnp.float32)
    m0 = jnp.full((Bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Bq,), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(lo_kb, hi_kb, body, (acc0, m0, l0))

    l_safe = jnp.where(l_i > 0, l_i, 1.0)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse = jnp.where(l_i > 0, m_i + jnp.log(l_safe), NEG_INF)
    lse_ref[0, 0] = lse.astype(jnp.float32)


def _flash_fwd(
    q, k, v, key_valid, fwd, bwd, scale, block_q, block_k
):
    """(BH, T, D) inputs → (out, lse)."""
    BH, T, D = q.shape
    S = k.shape[1]
    grid = (BH, T // block_q)
    kernel = functools.partial(
        _fwd_kernel, fwd=fwd, bwd=bwd, block_k=block_k, scale=scale
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(q, k, v, key_valid)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels (recompute)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    *, fwd: int, bwd: int, block_k: int, scale: float,
):
    qi = pl.program_id(1)
    Bq = q_ref.shape[1]
    S = k_ref.shape[1]
    D = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    q_pos = qi * Bq + jax.lax.broadcasted_iota(jnp.int32, (Bq, 1), 0)[:, 0]

    num_kb = S // block_k
    lo_kb = jnp.maximum((qi * Bq - bwd) // block_k, 0)
    hi_kb = jnp.minimum(((qi + 1) * Bq - 1 + fwd) // block_k + 1, num_kb)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        valid = valid_ref[0, 0, pl.ds(kb * block_k, block_k)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_pos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 1)
        i = q_pos[:, None]
        mask = (k_pos >= i - bwd) & (k_pos <= i + fwd) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(lo_kb, hi_kb, body, jnp.zeros((Bq, D), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, valid_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    *, fwd: int, bwd: int, block_q: int, scale: float,
):
    ki = pl.program_id(1)
    Bk = k_ref.shape[1]
    T = q_ref.shape[1]
    D = k_ref.shape[2]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    valid = valid_ref[0, 0]
    k_pos = ki * Bk + jax.lax.broadcasted_iota(jnp.int32, (Bk, 1), 0)[:, 0]

    num_qb = T // block_q
    # Queries whose band reaches this k block: i >= j - fwd, i <= j + bwd.
    lo_qb = jnp.maximum((ki * Bk - fwd) // block_q, 0)
    hi_qb = jnp.minimum(((ki + 1) * Bk - 1 + bwd) // block_q + 1, num_qb)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32) * scale
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                   # (Bq, Bk)
        q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, Bk), 0)
        j = k_pos[None, :]
        mask = (j >= q_pos - bwd) & (j <= q_pos + fwd) & (valid[None, :] != 0)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None])
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk0 = jnp.zeros((Bk, D), jnp.float32)
    dv0 = jnp.zeros((Bk, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo_qb, hi_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, key_valid, out, lse, do, fwd, bwd, scale, block_q, block_k):
    BH, T, D = q.shape
    S = k.shape[1]
    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]  # (BH, 1, T)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, fwd=fwd, bwd=bwd, block_k=block_k, scale=scale
        ),
        grid=(BH, T // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        interpret=_INTERPRET,
    )(q, k, v, key_valid, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, fwd=fwd, bwd=bwd, block_q=block_q, scale=scale
        ),
        grid=(BH, S // block_k),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, T, D), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S, D), k.dtype),
            jax.ShapeDtypeStruct((BH, S, D), v.dtype),
        ],
        interpret=_INTERPRET,
    )(q, k, v, key_valid, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded (BH, T, D) layout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core(q, k, v, key_valid, fwd, bwd, scale, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, key_valid, fwd, bwd, scale, block_q, block_k)
    return out


def _flash_core_fwd(q, k, v, key_valid, fwd, bwd, scale, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, key_valid, fwd, bwd, scale, block_q, block_k)
    return out, (q, k, v, key_valid, out, lse)


def _flash_core_bwd(fwd, bwd, scale, block_q, block_k, res, do):
    q, k, v, key_valid, out, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, key_valid, out, lse, do, fwd, bwd, scale, block_q, block_k
    )
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def banded_flash_attention(
    q: jax.Array,                  # (B, T, H, D)
    k: jax.Array,                  # (B, T, H, D)
    v: jax.Array,                  # (B, T, H, D)
    key_valid: Optional[jax.Array] = None,   # (B, T) 1 = valid key
    context_forward: Optional[int] = None,   # None = unbounded
    context_backward: Optional[int] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jax.Array:
    """Flash attention with a static banded window and dynamic key padding.

    Rows with no valid key in their band return 0.
    """
    B, T, H, D = q.shape
    fwd_w, bwd_w = _band_bounds(context_forward, context_backward, T)
    scale = 1.0 / float(np.sqrt(D))

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

    out = _flash_core(qb, kb, vb, valid, fwd_w, bwd_w, scale, block_q, block_k)
    out = out[:, :T, :D].reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def flash_attention_supported(q, k, v, mask, is_causal) -> bool:
    """The generic ``dot_product_attention`` entry can only route here when
    the mask is expressible as band+padding — callers with structured masks
    should use :func:`banded_flash_attention` directly."""
    return False


def flash_attention(q, k, v, mask=None, is_causal=False):
    raise NotImplementedError(
        "use banded_flash_attention for band+padding masks"
    )
