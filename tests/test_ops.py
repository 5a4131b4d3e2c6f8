import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_bci_tpu.ops import (
    create_context_mask,
    ctc_loss,
    gaussian_kernel,
    mse_loss,
    poisson_nll_loss,
    cross_entropy_loss,
    smooth_spikes,
)


# ---------------------------------------------------------------- CTC loss
def _torch_ctc(log_probs, targets, input_lengths, target_lengths, blank, zero_inf):
    import torch

    lp = torch.tensor(np.transpose(log_probs, (1, 0, 2)))  # (T, B, V)
    fn = torch.nn.CTCLoss(reduction="none", blank=blank, zero_infinity=zero_inf)
    return (
        fn(
            lp,
            torch.tensor(targets),
            torch.tensor(input_lengths),
            torch.tensor(target_lengths),
        )
        .numpy()
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, V, S = 4, 25, 8, 9
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.integers(1, V, size=(B, S)).astype(np.int32)
    input_lengths = rng.integers(S + 2, T + 1, size=(B,)).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=(B,)).astype(np.int32)

    ours = ctc_loss(log_probs, jnp.asarray(targets), jnp.asarray(input_lengths),
                    jnp.asarray(target_lengths), blank_id=0, zero_infinity=True)
    ref = _torch_ctc(np.asarray(log_probs), targets, input_lengths, target_lengths, 0, True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_ctc_repeated_labels_and_blank_target_edge():
    rng = np.random.default_rng(3)
    B, T, V = 3, 20, 6
    log_probs = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32)))
    # repeated labels force the no-skip rule
    targets = np.array([[2, 2, 3, 3], [1, 1, 1, 1], [4, 3, 4, 3]], dtype=np.int32)
    input_lengths = np.array([20, 15, 12], dtype=np.int32)
    target_lengths = np.array([4, 4, 3], dtype=np.int32)
    ours = ctc_loss(log_probs, jnp.asarray(targets), jnp.asarray(input_lengths),
                    jnp.asarray(target_lengths))
    ref = _torch_ctc(np.asarray(log_probs), targets, input_lengths, target_lengths, 0, True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_ctc_zero_infinity():
    """Target longer than input frames -> inf -> 0 under zero_infinity."""
    rng = np.random.default_rng(4)
    B, T, V = 1, 4, 5
    log_probs = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32)))
    targets = np.array([[1, 1, 2, 2, 3, 3]], dtype=np.int32)  # needs >= 11 frames
    loss = ctc_loss(log_probs, jnp.asarray(targets), jnp.asarray([4]), jnp.asarray([6]))
    assert float(loss[0]) == 0.0


def test_ctc_jit_static_shapes():
    fn = jax.jit(lambda lp, t, il, tl: ctc_loss(lp, t, il, tl).sum())
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(2, 10, 5)).astype(np.float32)))
    out = fn(lp, jnp.ones((2, 3), jnp.int32), jnp.asarray([10, 8]), jnp.asarray([3, 2]))
    assert np.isfinite(float(out))


# ---------------------------------------------------------------- losses
def test_poisson_nll_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    t = rng.poisson(2.0, size=(4, 7)).astype(np.float32)
    ours = np.asarray(poisson_nll_loss(jnp.asarray(x), jnp.asarray(t), log_input=True))
    ref = torch.nn.PoissonNLLLoss(reduction="none", log_input=True)(
        torch.tensor(x), torch.tensor(t)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)

    x_pos = np.abs(x) + 0.1
    ours = np.asarray(poisson_nll_loss(jnp.asarray(x_pos), jnp.asarray(t), log_input=False))
    ref = torch.nn.PoissonNLLLoss(reduction="none", log_input=False)(
        torch.tensor(x_pos), torch.tensor(t)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_cross_entropy_ignore_index():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 4)).astype(np.float32))
    targets = jnp.asarray([0, 1, -100, 3, -100])
    loss = cross_entropy_loss(logits, targets)
    assert float(loss[2]) == 0.0 and float(loss[4]) == 0.0
    import torch

    ref = torch.nn.CrossEntropyLoss(reduction="none", ignore_index=-100)(
        torch.tensor(np.asarray(logits)),
        torch.tensor(np.asarray(targets), dtype=torch.long),
    ).numpy()
    np.testing.assert_allclose(np.asarray(loss), ref, rtol=1e-5, atol=1e-6)


def test_mse():
    a, b = jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 4.0])
    np.testing.assert_allclose(np.asarray(mse_loss(a, b)), [1.0, 4.0])


# ---------------------------------------------------------------- smoothing
def test_gaussian_smoothing_matches_torch_conv():
    import torch
    import torch.nn.functional as F

    sd = 2
    kernel = gaussian_kernel(sd)
    rng = np.random.default_rng(0)
    spikes = rng.poisson(1.0, size=(2, 30, 5)).astype(np.float32)

    ours = np.asarray(smooth_spikes(jnp.asarray(spikes), jnp.asarray(kernel)))

    k = torch.tensor(kernel)
    x = torch.tensor(spikes).transpose(-1, -2)  # (B, N, T)
    ref = (
        F.conv1d(x, k[None, None, :].expand(5, 1, len(kernel)), padding="same", groups=5)
        .transpose(-1, -2)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------- context mask
def _torch_context_mask(fwd, bwd, max_F):
    import torch

    if fwd == -2 and bwd == -2:
        return torch.ones(max_F, max_F).to(torch.int64).numpy()
    f = fwd if fwd >= -1 else max_F
    mask = torch.triu(torch.ones(max_F, max_F), diagonal=-f).to(torch.int64).transpose(0, 1)
    if bwd >= -1:
        back = torch.triu(torch.ones(max_F, max_F), diagonal=-bwd).to(torch.int64)
        mask = mask & back
    return mask.numpy()


@pytest.mark.parametrize("fwd,bwd", [(-2, -2), (-1, -2), (0, -2), (3, 2), (0, 0), (-2, 4), (2, -1)])
def test_context_mask_matches_reference(fwd, bwd):
    ours = create_context_mask(fwd, bwd, 12)
    ref = _torch_context_mask(fwd, bwd, 12)
    np.testing.assert_array_equal(ours, ref)


def test_attention_prob_dropout_semantics():
    """Attention-prob dropout (reference models/ndt1.py:289, torch SDPA
    semantics): rate 0 or no rng -> identical to the fused path; active
    dropout perturbs outputs, differs per rng, and keeps expectation approx
    unchanged (inverted-scale Bernoulli)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_bci_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 8, 2, 4)).astype(np.float32))
        for _ in range(3)
    )
    base = dot_product_attention(q, k, v)
    none = dot_product_attention(q, k, v, dropout_rate=0.5, dropout_rng=None)
    np.testing.assert_allclose(np.asarray(none), np.asarray(base), atol=1e-6)

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    d1 = dot_product_attention(q, k, v, dropout_rate=0.5, dropout_rng=k1)
    d2 = dot_product_attention(q, k, v, dropout_rate=0.5, dropout_rng=k2)
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))

    # inverted scaling: mean over many keys approaches the clean output
    outs = [
        np.asarray(
            dot_product_attention(q, k, v, dropout_rate=0.3,
                                  dropout_rng=jax.random.PRNGKey(i))
        )
        for i in range(200)
    ]
    np.testing.assert_allclose(np.mean(outs, axis=0), np.asarray(base), atol=0.1)


def test_stack_projection_equals_unfold_linear():
    """StackProjection (fused strided conv) must equal the reference's
    Unfold->Linear decomposition (stack_timesteps + dense matmul) with the
    SAME kernel/bias params (models/ndt1.py:133-142)."""
    import jax
    import jax.numpy as jnp

    from llm_bci_tpu.models.ndt1 import StackProjection, stack_timesteps

    B, T, D, H, size, stride = 3, 40, 6, 10, 8, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mod = StackProjection(hidden_size=H, size=size, stride=stride)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)

    kernel = params["params"]["kernel"]        # (size*D, H)
    bias = params["params"]["bias"]
    ref = stack_timesteps(x, size, stride) @ kernel + bias
    assert out.shape == (B, 1 + (T - size) // stride, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
