"""Pallas CTC kernel vs the XLA-scan reference and torch: values + grads,
variable lengths, zero_infinity, empty targets (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_bci_tpu.ops import ctc_pallas
from llm_bci_tpu.ops.ctc import ctc_loss


@pytest.fixture(autouse=True)
def _interpret_mode():
    # per-test (not import-time): other modules' fixtures reset the flag,
    # so relying on import order makes the file order-dependent
    ctc_pallas.set_interpret_mode(True)
    yield
    ctc_pallas.set_interpret_mode(False)


def make_case(B=4, T=14, V=7, S=5, seed=0, full_lengths=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = rng.integers(1, V, size=(B, S)).astype(np.int32)
    if full_lengths:
        il = np.full((B,), T, np.int32)
        tl = np.full((B,), S, np.int32)
    else:
        il = rng.integers(T - 4, T + 1, size=(B,)).astype(np.int32)
        tl = rng.integers(1, S + 1, size=(B,)).astype(np.int32)
    return logits, targets, il, tl


@pytest.mark.parametrize("full_lengths", [True, False])
def test_pallas_matches_xla_forward(full_lengths):
    logits, targets, il, tl = make_case(full_lengths=full_lengths)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ref = ctc_loss(lp, targets, il, tl, impl="xla")
    ours = ctc_pallas.ctc_loss_pallas(lp, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_matches_torch_grads():
    import torch

    logits, targets, il, tl = make_case(seed=3)

    def loss_fn(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_pallas.ctc_loss_pallas(
            lp, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)
        ).sum()

    val, grad = jax.value_and_grad(loss_fn)(jnp.asarray(logits))

    tlogits = torch.tensor(logits, requires_grad=True)
    tlp = torch.log_softmax(tlogits, -1)
    tloss = torch.nn.CTCLoss(reduction="none", blank=0, zero_infinity=True)(
        tlp.transpose(0, 1),
        torch.tensor(targets),
        torch.tensor(il),
        torch.tensor(tl),
    ).sum()
    tloss.backward()
    np.testing.assert_allclose(float(val), float(tloss.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad), tlogits.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_pallas_zero_infinity_and_empty_targets():
    # Infeasible: target longer than frames allow → inf → 0 with grads 0.
    B, T, V, S = 2, 4, 5, 4
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    targets = np.asarray([[1, 1, 1, 1], [2, 0, 0, 0]], np.int32)  # 1,1,1,1 needs 7 frames
    il = np.asarray([T, T], np.int32)
    tl = np.asarray([4, 1], np.int32)

    def loss_fn(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_pallas.ctc_loss_pallas(
            lp, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)
        )

    losses = loss_fn(jnp.asarray(logits))
    assert float(losses[0]) == 0.0                    # zeroed infinity
    assert np.isfinite(float(losses[1])) and float(losses[1]) > 0

    grad = jax.grad(lambda x: loss_fn(x).sum())(jnp.asarray(logits))
    assert np.isfinite(np.asarray(grad)).all()
    np.testing.assert_allclose(np.asarray(grad)[0], 0.0, atol=1e-6)

    # Empty target: loss = -sum log p(blank) over valid frames.
    targets2 = np.zeros((1, 2), np.int32)
    lp = jax.nn.log_softmax(jnp.asarray(logits[:1]), axis=-1)
    loss = ctc_pallas.ctc_loss_pallas(
        lp, jnp.asarray(targets2), jnp.asarray([T]), jnp.asarray([0])
    )
    expected = -np.asarray(lp)[0, :, 0].sum()
    np.testing.assert_allclose(float(loss[0]), expected, rtol=1e-5)


def test_dispatch_auto_uses_xla_on_cpu():
    logits, targets, il, tl = make_case()
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    auto = ctc_loss(lp, targets, il, tl, impl="auto")
    ref = ctc_loss(lp, targets, il, tl, impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref))
