"""Pallas banded flash attention vs dense reference (interpret mode on CPU),
forward and gradients, with window + padding masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode():
    # per-test (not import-time): other modules' fixtures reset the flag,
    # so relying on import order makes the file order-dependent
    fa.set_interpret_mode(True)
    yield
    fa.set_interpret_mode(False)


def dense_reference(q, k, v, key_valid, fwd, bwd):
    B, T, H, D = q.shape
    scale = 1.0 / np.sqrt(D)
    s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    f = T if fwd is None else fwd
    bw = T if bwd is None else bwd
    band = (j >= i - bw) & (j <= i + f)
    mask = band[None, None] & key_valid.astype(bool)[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    # dead rows (no valid key) → 0
    dead = ~mask.any(-1)
    p = jnp.where(dead[..., None], 0.0, p)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def make_inputs(B=2, T=24, H=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize(
    "fwd,bwd",
    [(None, None), (0, None), (3, 5), (0, 0)],
)
def test_forward_matches_dense(fwd, bwd):
    q, k, v = make_inputs()
    B, T = q.shape[:2]
    valid = jnp.ones((B, T), jnp.int32)
    out = fa.banded_flash_attention(
        q, k, v, valid, context_forward=fwd, context_backward=bwd,
        block_q=8, block_k=8,
    )
    ref = dense_reference(q, k, v, valid, fwd, bwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_padding():
    q, k, v = make_inputs(T=16)
    B, T = q.shape[:2]
    # right-padded keys
    valid = jnp.concatenate([jnp.ones((B, 10), jnp.int32), jnp.zeros((B, 6), jnp.int32)], 1)
    out = fa.banded_flash_attention(q, k, v, valid, block_q=8, block_k=8)
    ref = dense_reference(q, k, v, valid, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dead_rows_zero():
    q, k, v = make_inputs(T=8)
    B, T = q.shape[:2]
    valid = jnp.zeros((B, T), jnp.int32)
    out = fa.banded_flash_attention(q, k, v, valid, block_q=8, block_k=8)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_gradients_match_dense():
    q, k, v = make_inputs(T=16, D=8)
    B, T = q.shape[:2]
    valid = jnp.concatenate([jnp.ones((B, 12), jnp.int32), jnp.zeros((B, 4), jnp.int32)], 1)
    fwd, bwd = 4, 6

    def loss_fa(q, k, v):
        out = fa.banded_flash_attention(
            q, k, v, valid, context_forward=fwd, context_backward=bwd,
            block_q=8, block_k=8,
        )
        return (out * jnp.arange(out.size).reshape(out.shape)).sum()

    def loss_ref(q, k, v):
        out = dense_reference(q, k, v, valid, fwd, bwd)
        return (out * jnp.arange(out.size).reshape(out.shape)).sum()

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_odd_lengths_and_head_dim():
    # T not a multiple of the block, D < 128 → wrapper pads and slices back.
    q, k, v = make_inputs(T=13, D=5)
    B, T = q.shape[:2]
    valid = jnp.ones((B, T), jnp.int32)
    out = fa.banded_flash_attention(q, k, v, valid, block_q=8, block_k=8)
    ref = dense_reference(q, k, v, valid, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ------------------------------------------------------- in-kernel dropout

def _np_keep_mask(seed, BH, T, drop_p):
    """Reproduce the kernel's counter-based keep mask in numpy."""
    i = np.arange(T, dtype=np.uint32)
    q = (i[:, None] * np.uint32(0x9E3779B1)) ^ (i[None, :] * np.uint32(0x85EBCA77))
    out = np.empty((BH, T, T), bool)
    for bh in range(BH):
        x = q ^ np.uint32((bh * 0xC2B2AE3D) & 0xFFFFFFFF)
        x = (x + np.uint32(seed)) & 0xFFFFFFFF
        x ^= x >> np.uint32(16)
        x = (x * np.uint32(0x7FEB352D)) & 0xFFFFFFFF
        x ^= x >> np.uint32(15)
        x = (x * np.uint32(0x846CA68B)) & 0xFFFFFFFF
        x ^= x >> np.uint32(16)
        out[bh] = x >= np.uint32(min(int(drop_p * 4294967296.0), 4294967295))
    return out


def dense_reference_dropout(q, k, v, key_valid, fwd, bwd, keep, drop_p):
    """torch-SDPA dropout semantics: normalizer from the UNdropped probs."""
    B, T, H, D = q.shape
    scale = 1.0 / np.sqrt(D)
    s = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    f = T if fwd is None else fwd
    bw = T if bwd is None else bwd
    band = (j >= i - bw) & (j <= i + f)
    mask = band[None, None] & key_valid.astype(bool)[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dead = ~mask.any(-1)
    p = jnp.where(dead[..., None], 0.0, p)
    keep = keep.reshape(B, H, T, T)
    p = p * keep / (1.0 - drop_p)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("fwd,bwd", [(None, None), (3, 5)])
def test_dropout_forward_matches_dense(fwd, bwd):
    q, k, v = make_inputs(T=16)
    B, T, H, D = q.shape
    valid = jnp.ones((B, T), jnp.int32)
    drop_p = 0.4
    rng = jax.random.PRNGKey(11)
    out = fa.banded_flash_attention(
        q, k, v, valid, context_forward=fwd, context_backward=bwd,
        block_q=8, block_k=8, dropout_rate=drop_p, dropout_rng=rng,
    )
    seed = int(jax.random.randint(rng, (1,), 0, np.iinfo(np.int32).max, jnp.int32)[0])
    keep = _np_keep_mask(seed, B * H, T, drop_p)
    ref = dense_reference_dropout(q, k, v, valid, fwd, bwd, jnp.asarray(keep), drop_p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    # sanity: dropout actually dropped something, deterministically
    no_drop = fa.banded_flash_attention(
        q, k, v, valid, context_forward=fwd, context_backward=bwd,
        block_q=8, block_k=8,
    )
    assert np.abs(np.asarray(out) - np.asarray(no_drop)).max() > 1e-3
    out2 = fa.banded_flash_attention(
        q, k, v, valid, context_forward=fwd, context_backward=bwd,
        block_q=8, block_k=8, dropout_rate=drop_p, dropout_rng=rng,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_dropout_gradients_match_dense():
    q, k, v = make_inputs(T=16, seed=3)
    B, T, H, D = q.shape
    valid = jnp.concatenate(
        [jnp.ones((B, 12), jnp.int32), jnp.zeros((B, 4), jnp.int32)], 1
    )
    drop_p = 0.3
    rng = jax.random.PRNGKey(5)
    seed = int(jax.random.randint(rng, (1,), 0, np.iinfo(np.int32).max, jnp.int32)[0])
    keep = jnp.asarray(_np_keep_mask(seed, B * H, T, drop_p))
    w = jnp.asarray(np.random.default_rng(9).normal(size=(B, T, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        out = fa.banded_flash_attention(
            q, k, v, valid, context_forward=3, context_backward=5,
            block_q=8, block_k=8, dropout_rate=drop_p, dropout_rng=rng,
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        out = dense_reference_dropout(q, k, v, valid, 3, 5, keep, drop_p)
        return jnp.sum(out * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_dropout_keep_fraction():
    keep = _np_keep_mask(123, 4, 64, 0.4)
    assert abs(keep.mean() - 0.6) < 0.02
