"""On-device CTC loss — log-space alpha recursion via ``lax.scan``.

TPU-native replacement for the cuDNN ``nn.CTCLoss`` the reference leans on
(``models/ndt1.py:517,581``, ``models/itransformer.py:297,393``,
``models/patchtst.py:207,248``). Semantics match
``torch.nn.CTCLoss(reduction="none", blank, zero_infinity)``: the returned
vector holds one *unnormalized* negative log-likelihood per example (the
reference then ``.sum()``s it).

Everything is static-shape: the scan runs over the padded time axis and the
alpha lattice spans the padded label axis; ``input_lengths`` /
``target_lengths`` select the valid region, so one compilation serves every
batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logsumexp3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    m = jnp.maximum(jnp.maximum(a, b), c)
    dead = m <= NEG_INF
    m_safe = jnp.where(dead, 0.0, m)
    # Double-where: in the dead branch the args are replaced by finite values
    # so the (unselected) log/exp path has finite gradients — otherwise
    # grad(where) sees log(0) = -inf and poisons the backward pass with NaN.
    a_s = jnp.where(dead, 0.0, a - m_safe)
    b_s = jnp.where(dead, 0.0, b - m_safe)
    c_s = jnp.where(dead, 0.0, c - m_safe)
    out = m_safe + jnp.log(jnp.exp(a_s) + jnp.exp(b_s) + jnp.exp(c_s))
    return jnp.where(dead, NEG_INF, out)


def ctc_loss(
    log_probs: jax.Array,        # (B, T, V) log-softmax normalized
    targets: jax.Array,          # (B, S) int labels (padding arbitrary)
    input_lengths: jax.Array,    # (B,) valid frames per example
    target_lengths: jax.Array,   # (B,) valid labels per example
    blank_id: int = 0,
    zero_infinity: bool = True,
    impl: str = "auto",          # auto | xla | pallas
) -> jax.Array:                  # (B,) per-example -log p(targets | log_probs)
    """CTC forward (alpha) recursion in log space.

    The label sequence is extended with interleaved blanks:
    ``z = [blank, y1, blank, y2, ..., yS, blank]`` (length ``2S+1``).
    ``alpha[t, s]`` accumulates path probabilities; allowed transitions are
    stay, advance-by-1, and advance-by-2 (the skip is illegal into a blank or
    into a label equal to the one two slots back).
    """
    if impl == "pallas" or (impl == "auto" and jax.default_backend() == "tpu"):
        from llm_bci_tpu.ops.ctc_pallas import ctc_loss_pallas
        from llm_bci_tpu.ops.spmd import batch_shardable, op_mesh

        mesh = op_mesh()
        if mesh is None:
            return ctc_loss_pallas(
                log_probs, targets, input_lengths, target_lengths,
                blank_id, zero_infinity,
            )
        if batch_shardable(log_probs.shape[0]):
            # Multi-device mesh: pallas_call is a custom call GSPMD can't
            # partition — run the kernel per data-shard via shard_map
            # (batch-parallel: one alpha lattice per example).
            #
            # Deliberately NOT gated on spmd.sequence_sharded() (unlike the
            # flash-attention dispatch): the alpha recursion is sequential
            # over the FULL time axis, so sp>1 time-sharded log_probs must
            # be gathered under ANY implementation — XLA's scan would
            # insert the same all-gather. The jit boundary reshards the
            # small (B, T, V≈41) tensor once and the VMEM kernel keeps its
            # ~10x win over the scan; sp replicas recompute redundantly
            # (~0.3 ms at flagship shapes).
            from jax.sharding import PartitionSpec as P

            return jax.shard_map(
                lambda lp, t, il, tl: ctc_loss_pallas(
                    lp, t, il, tl, blank_id, zero_infinity
                ),
                mesh=mesh,
                in_specs=(
                    P("data", None, None), P("data", None),
                    P("data"), P("data"),
                ),
                out_specs=P("data"),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation, which the vma checker requires
                check_vma=False,
            )(log_probs, targets, input_lengths, target_lengths)
        # odd batch: fall through to the XLA scan, which partitions natively

    B, T, V = log_probs.shape
    S = targets.shape[1]
    L = 2 * S + 1

    # jnp.asarray: inputs may be host numpy (e.g. under abstract init), and
    # numpy fancy-indexing with traced indices would call __array__ on them.
    log_probs = jnp.asarray(log_probs).astype(jnp.float32)
    targets = jnp.asarray(targets).astype(jnp.int32)
    input_lengths = jnp.asarray(input_lengths).astype(jnp.int32)
    target_lengths = jnp.asarray(target_lengths).astype(jnp.int32)

    # Extended label sequence z: even slots are blank, odd slot 2i+1 is y_i.
    slot = jnp.arange(L)
    label_idx = jnp.clip((slot - 1) // 2, 0, S - 1)
    z = jnp.where(slot % 2 == 1, targets[:, label_idx], blank_id)  # (B, L)

    # Skip transition legality per slot (static over time).
    z_shift2 = jnp.concatenate([jnp.full((B, 2), -1, jnp.int32), z[:, :-2]], axis=1)
    can_skip = (z != blank_id) & (z != z_shift2)  # (B, L)

    # Emission lattice for every frame at once, as a one-hot MXU matmul
    # (exact at float32 precision): XLA lowers the equivalent
    # take_along_axis gather to a serialized dynamic-slice loop on TPU
    # (~11 ms at flagship shapes vs ~2 ms for the matmul). The scan then
    # streams precomputed (B, L) rows instead of gathering from the full
    # (B, T, V) tensor every sequential step.
    onehot_z = jax.nn.one_hot(z, V, dtype=log_probs.dtype)       # (B, L, V)
    emit_all = jnp.einsum(
        "btv,blv->btl", log_probs, onehot_z, precision="float32"
    )                                                            # (B, T, L)

    # Lane-align the lattice: L = 2S+1 is odd; pad to a multiple of 128 so
    # per-step VPU ops tile cleanly (dead slots stay at NEG_INF).
    Lp = max(-(-L // 128) * 128, 128)
    pad = Lp - L
    emit_seq = jnp.pad(emit_all, ((0, 0), (0, 0), (0, pad))).transpose(1, 0, 2)
    can_skip_p = jnp.pad(can_skip, ((0, 0), (0, pad)))
    slot_p = jnp.arange(Lp)
    skip_gate = jnp.where(can_skip_p, 0.0, NEG_INF)              # additive mask

    # alpha_0: only slots 0 (blank) and 1 (first label) are reachable.
    alpha0 = jnp.where(slot_p[None, :] <= 1, emit_seq[0], NEG_INF)
    # Degenerate empty-target case: slot 1 unreachable when S_b == 0.
    alpha0 = jnp.where(
        (slot_p[None, :] == 1) & (target_lengths[:, None] == 0), NEG_INF, alpha0
    )
    alpha0 = jnp.where(slot_p[None, :] >= L, NEG_INF, alpha0)

    neg_col1 = jnp.full((B, 1), NEG_INF)
    neg_col2 = jnp.full((B, 2), NEG_INF)

    def step(alpha, xs):
        t, emit = xs
        adv1 = jnp.concatenate([neg_col1, alpha[:, :-1]], axis=1)
        adv2 = jnp.concatenate([neg_col2, alpha[:, :-2]], axis=1) + skip_gate
        # One stacked 3-way logsumexp (fewer per-step kernels than three
        # pairwise wheres; the scan body is latency-bound).
        cand = jnp.stack([alpha, adv1, adv2], axis=1)            # (B, 3, Lp)
        m = cand.max(axis=1)
        dead = m <= NEG_INF
        m_safe = jnp.where(dead, 0.0, m)
        # Double-where keeps backward finite on dead slots (log(0) guard).
        shifted = jnp.where(dead[:, None, :], 0.0, cand - m_safe[:, None, :])
        lse = m_safe + jnp.log(jnp.sum(jnp.exp(shifted), axis=1))
        new_alpha = jnp.where(dead, NEG_INF, lse) + emit
        # Frames past input_length leave alpha untouched.
        new_alpha = jnp.where((t < input_lengths)[:, None], new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (jnp.arange(1, T), emit_seq[1:]), unroll=1
    )
    # T == 1 edge case: scan over an empty range returns alpha0 unchanged.

    # log p = logsumexp over the two terminal slots (last blank, last label).
    last_blank = jnp.take_along_axis(alpha, (2 * target_lengths)[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(
        alpha, jnp.maximum(2 * target_lengths - 1, 0)[:, None], axis=1
    )[:, 0]
    last_label = jnp.where(target_lengths == 0, NEG_INF, last_label)
    log_p = jnp.logaddexp(last_blank, last_label)

    loss = -log_p
    if zero_infinity:
        loss = jnp.where(loss >= -NEG_INF / 2, 0.0, loss)
    # Match torch: an example whose input is shorter than needed for its
    # target yields inf (-> 0 under zero_infinity) via the unreachable lattice.
    return loss
