"""Pallas CTC loss — alpha/beta recursions entirely in VMEM.

The XLA `lax.scan` implementation (:mod:`llm_bci_tpu.ops.ctc`) is
latency-bound: ~15 small VPU ops per sequential step × T steps dominate the
NDT1-CTC training step. Here the whole recursion runs inside one Pallas
kernel over an (B_blk, T, L) emission lattice held in VMEM, so the
sequential loop pays no per-op dispatch.

Forward: alpha recursion → final lattice row; loss assembled in XLA
(terminal-slot selection + zero_infinity).
Backward (``jax.custom_vjp``): one kernel recomputes alpha (stored in VMEM
scratch), runs the beta recursion backward, and emits the posterior
occupancy ``exp(alpha + beta - logp)``; the gradient w.r.t. log_probs is
then one batched einsum with the label one-hot (slots → vocab), all MXU.

Semantics identical to :func:`llm_bci_tpu.ops.ctc.ctc_loss` (torch
``CTCLoss(reduction='none', blank, zero_infinity)``); the XLA version stays
as the CPU/interpret reference.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_INTERPRET = False


def set_interpret_mode(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


# Shifts are circular rolls WITHOUT lane masking: the lattice always has
# >= 2 trailing pad slots (L = 2S+1 odd < Lp multiple of 128) whose
# emissions are NEG_INF, so wrapped-around values land on permanently-dead
# slots and can never propagate into valid ones. The kernels are never
# autodiffed (gradients come analytically from the occupancy), so the
# lse needs only a clamp — no NaN-through-where guards.


def _shift_right(x: jax.Array, k: int) -> jax.Array:
    return pltpu.roll(x, k, 1)


def _shift_left(x: jax.Array, k: int) -> jax.Array:
    return pltpu.roll(x, x.shape[1] - k, 1)  # roll requires non-negative


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(jnp.maximum(a, b), c), NEG_INF)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def _alpha_step(alpha, emit_t, skip_gate):
    adv1 = _shift_right(alpha, 1)
    adv2 = _shift_right(alpha, 2) + skip_gate
    return _lse3(alpha, adv1, adv2) + emit_t


def _beta_step(beta_next, emit_next, skip_gate):
    """beta[t,s] = lse_d(beta[t+1,s+d] + skip_gate(s+d if d==2) + emit[t+1,s+d])."""
    term = beta_next + emit_next
    adv1 = _shift_left(term, 1)
    adv2 = _shift_left(term + skip_gate, 2)
    return _lse3(term, adv1, adv2)


def _fwd_kernel(emit_ref, skip_ref, init_ref, len_ref, alpha_out_ref):
    """The whole batch block is vectorized per step: emit (Bb, T, L);
    skip/init/len (Bb, L); out alpha_final (Bb, L)."""
    T = emit_ref.shape[1]
    skip_gate = skip_ref[...]
    lengths = len_ref[...]                     # (Bb, L) broadcast scalar
    alpha0 = init_ref[...] + emit_ref[:, 0, :]

    def body(t, alpha):
        new = _alpha_step(alpha, emit_ref[:, t, :], skip_gate)
        return jnp.where(t < lengths, new, alpha)

    alpha = jax.lax.fori_loop(1, T, body, alpha0)
    alpha_out_ref[...] = alpha


def _bwd_kernel(
    emit_ref, skip_ref, init_ref, len_ref, term_ref, logp_ref,
    occ_ref, alpha_scratch,
):
    """Recompute alpha lattice into scratch, run beta backward, emit
    occupancy exp(alpha + beta - logp) (zeroed past input_length)."""
    T = emit_ref.shape[1]
    skip_gate = skip_ref[...]
    lengths = len_ref[...]
    term_gate = term_ref[...]
    logp = logp_ref[...]                        # (Bb, L) broadcast, finite-safe

    alpha_scratch[:, 0, :] = init_ref[...] + emit_ref[:, 0, :]

    def fwd_body(t, alpha):
        new = _alpha_step(alpha, emit_ref[:, t, :], skip_gate)
        new = jnp.where(t < lengths, new, alpha)
        alpha_scratch[:, t, :] = new
        return new

    jax.lax.fori_loop(1, T, fwd_body, alpha_scratch[:, 0, :])

    # Backward: beta at t = T-1 (within valid length) is the terminal gate.
    def bwd_body(i, beta):
        t = T - 1 - i
        # occupancy at t uses beta_t; beta for padded frames = terminal gate.
        alpha_t = alpha_scratch[:, t, :]
        occ = jnp.exp(jnp.minimum(alpha_t + beta - logp, 0.0))
        occ = jnp.where(t < lengths, occ, 0.0)
        occ_ref[:, t, :] = occ
        # step to beta_{t-1}: uses emissions at t
        beta_prev = _beta_step(beta, emit_ref[:, t, :], skip_gate)
        # if t-1 is past the valid range (t-1 >= len-1 i.e. t >= len),
        # beta_{t-1} stays the terminal gate.
        return jnp.where(t < lengths, beta_prev, term_gate)

    jax.lax.fori_loop(0, T, bwd_body, term_gate)


def _prep(log_probs, targets, input_lengths, target_lengths, blank_id):
    """Host-side lattice prep shared by fwd/bwd (pure XLA, all parallel)."""
    B, T, V = log_probs.shape
    S = targets.shape[1]
    L = 2 * S + 1
    Lp = max(-(-L // 128) * 128, 128)

    slot = jnp.arange(L)
    label_idx = jnp.clip((slot - 1) // 2, 0, S - 1)
    z = jnp.where(slot % 2 == 1, targets[:, label_idx], blank_id)    # (B, L)
    z_shift2 = jnp.concatenate([jnp.full((B, 2), -1, jnp.int32), z[:, :-2]], axis=1)
    can_skip = (z != blank_id) & (z != z_shift2)

    # Lattice emissions via a one-hot MXU matmul: exact at float32 precision
    # and ~5x faster than the equivalent take_along_axis gather, which XLA
    # lowers to a serialized dynamic-slice loop on TPU.
    onehot_z = jax.nn.one_hot(z, V, dtype=log_probs.dtype)           # (B, L, V)
    emit = jnp.einsum("btv,blv->btl", log_probs, onehot_z, precision="float32")
    emit = jnp.pad(emit, ((0, 0), (0, 0), (0, Lp - L)), constant_values=NEG_INF)

    skip_gate = jnp.where(
        jnp.pad(can_skip, ((0, 0), (0, Lp - L))), 0.0, NEG_INF
    ).astype(jnp.float32)

    slot_p = jnp.arange(Lp)
    init_gate = jnp.where(slot_p[None, :] <= 1, 0.0, NEG_INF)
    init_gate = jnp.where(
        (slot_p[None, :] == 1) & (target_lengths[:, None] == 0), NEG_INF, init_gate
    )
    init_gate = jnp.where(slot_p[None, :] >= L, NEG_INF, init_gate).astype(jnp.float32)

    term_blank = slot_p[None, :] == (2 * target_lengths)[:, None]
    term_label = (slot_p[None, :] == jnp.maximum(2 * target_lengths - 1, 0)[:, None]) & (
        target_lengths[:, None] > 0
    )
    term_gate = jnp.where(term_blank | term_label, 0.0, NEG_INF).astype(jnp.float32)

    len_bcast = jnp.broadcast_to(
        input_lengths.astype(jnp.int32)[:, None], (B, Lp)
    )
    return emit, skip_gate, init_gate, term_gate, len_bcast, z, Lp, L


def _batch_block(B: int, T: int, Lp: int, budget_bytes: int) -> int:
    """Largest batch block (multiple of 8, divides padded B) within VMEM."""
    per_row = T * Lp * 4
    bb = max(8, min(B, (budget_bytes // max(per_row, 1)) // 8 * 8))
    return max(8, min(bb, 512))


def _pad_batch(arrs, B, Bb, pad_values):
    Bp = -(-B // Bb) * Bb
    return [
        jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1), constant_values=v)
        for a, v in zip(arrs, pad_values)
    ], Bp


def _run_fwd(emit, skip_gate, init_gate, len_bcast):
    B, T, Lp = emit.shape
    Bb = _batch_block(B, T, Lp, 6 << 20)
    (emit, skip_gate, init_gate, len_bcast), Bp = _pad_batch(
        [emit, skip_gate, init_gate, len_bcast.astype(jnp.float32)],
        B, Bb, [NEG_INF, NEG_INF, NEG_INF, 0.0],
    )
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(Bp // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, T, Lp), lambda b: (b, 0, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_INTERPRET,
    )(emit, skip_gate, init_gate, len_bcast)
    return out[:B]


def _run_bwd(emit, skip_gate, init_gate, len_bcast, term_gate, logp_bcast):
    B, T, Lp = emit.shape
    # bwd holds emit + alpha lattice + occupancy block: ~3 rows of T*Lp each.
    Bb = _batch_block(B, T, Lp, 2 << 20)
    (emit, skip_gate, init_gate, len_bcast, term_gate, logp_bcast), Bp = _pad_batch(
        [emit, skip_gate, init_gate, len_bcast.astype(jnp.float32), term_gate, logp_bcast],
        B, Bb, [NEG_INF, NEG_INF, NEG_INF, 0.0, NEG_INF, 0.0],
    )
    occ = pl.pallas_call(
        _bwd_kernel,
        grid=(Bp // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, T, Lp), lambda b: (b, 0, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
            pl.BlockSpec((Bb, Lp), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, T, Lp), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, T, Lp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bb, T, Lp), jnp.float32)],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_INTERPRET,
    )(emit, skip_gate, init_gate, len_bcast, term_gate, logp_bcast)
    return occ[:B]


def _loss_from_alpha(alpha_final, term_gate, zero_infinity):
    logp = jax.nn.logsumexp(alpha_final + term_gate, axis=-1)
    loss = -logp
    if zero_infinity:
        loss = jnp.where(loss >= -NEG_INF / 2, 0.0, loss)
    return loss, logp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, targets, input_lengths, target_lengths,
                    blank_id: int = 0, zero_infinity: bool = True):
    loss, _ = _fwd_impl(log_probs, targets, input_lengths, target_lengths,
                        blank_id, zero_infinity)
    return loss


def _fwd_impl(log_probs, targets, input_lengths, target_lengths,
              blank_id, zero_infinity):
    log_probs = jnp.asarray(log_probs).astype(jnp.float32)
    targets = jnp.asarray(targets).astype(jnp.int32)
    input_lengths = jnp.asarray(input_lengths).astype(jnp.int32)
    target_lengths = jnp.asarray(target_lengths).astype(jnp.int32)
    emit, skip_gate, init_gate, term_gate, len_bcast, z, Lp, L = _prep(
        log_probs, targets, input_lengths, target_lengths, blank_id
    )
    alpha_final = _run_fwd(emit, skip_gate, init_gate, len_bcast)
    loss, logp = _loss_from_alpha(alpha_final, term_gate, zero_infinity)
    return loss, (log_probs, targets, input_lengths, target_lengths, logp)


def _fwd_vjp(log_probs, targets, input_lengths, target_lengths,
             blank_id, zero_infinity):
    loss, res = _fwd_impl(log_probs, targets, input_lengths, target_lengths,
                          blank_id, zero_infinity)
    return loss, res


def _bwd_vjp(blank_id, zero_infinity, res, g):
    log_probs, targets, input_lengths, target_lengths, logp = res
    B, T, V = log_probs.shape
    emit, skip_gate, init_gate, term_gate, len_bcast, z, Lp, L = _prep(
        log_probs, targets, input_lengths, target_lengths, blank_id
    )
    finite = jnp.isfinite(logp) & (logp > NEG_INF / 2)
    logp_safe = jnp.where(finite, logp, 0.0)
    logp_bcast = jnp.broadcast_to(logp_safe[:, None], (B, Lp)).astype(jnp.float32)

    occupancy = _run_bwd(emit, skip_gate, init_gate, len_bcast, term_gate, logp_bcast)
    occupancy = jnp.where(finite[:, None, None], occupancy, 0.0)

    # slots → vocab: one-hot over the extended labels (pad slots map nowhere).
    onehot = (
        jax.nn.one_hot(z, V, dtype=jnp.float32)
    )                                                   # (B, L, V)
    onehot = jnp.pad(onehot, ((0, 0), (0, Lp - L), (0, 0)))
    dlogp = jnp.einsum("btl,blv->btv", occupancy, onehot, precision="float32")
    # loss = -logp  →  dloss/dlogprob = -dlogp/dlogprob; chain with g (B,).
    grad = -dlogp * g[:, None, None]
    return grad, None, None, None


ctc_loss_pallas.defvjp(_fwd_vjp, _bwd_vjp)
