"""Numerical parity vs torch for the transformer building blocks.

SURVEY.md §4 calls for parity tests against recorded PyTorch outputs; these
copy torch weights into the flax modules and compare outputs at fp32
tolerance (eval mode, dropout off).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_torch_encoder_stack_parity():
    """TorchEncoderStack == torch.nn.TransformerEncoder(norm_first=False)."""
    import torch
    from llm_bci_tpu.models.layers import TorchEncoderStack
    from flax import linen as nn

    H, heads, layers, B, T = 16, 2, 2, 3, 5
    torch.manual_seed(0)
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=H, nhead=heads, dim_feedforward=4 * H, dropout=0.0,
        activation="relu", batch_first=True,
    )
    t_enc = torch.nn.TransformerEncoder(
        t_layer, num_layers=layers, norm=torch.nn.LayerNorm(H)
    )
    t_enc.eval()

    x_np = np.random.default_rng(0).normal(size=(B, T, H)).astype(np.float32)
    with torch.no_grad():
        ref = t_enc(torch.tensor(x_np)).numpy()

    model = TorchEncoderStack(H, heads, layers, nn.relu, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]

    # Copy torch weights into the flax param tree.
    def t(x):
        return np.asarray(x.detach().numpy())

    new = jax.device_get(params)
    for i, tl in enumerate(t_enc.layers):
        lp = new[f"layer_{i}"]
        w_in = t(tl.self_attn.in_proj_weight)        # (3H, H)
        b_in = t(tl.self_attn.in_proj_bias)          # (3H,)
        lp["attn"]["qkv"]["kernel"] = w_in.T
        lp["attn"]["qkv"]["bias"] = b_in
        lp["attn"]["out_proj"]["kernel"] = t(tl.self_attn.out_proj.weight).T
        lp["attn"]["out_proj"]["bias"] = t(tl.self_attn.out_proj.bias)
        lp["linear1"]["kernel"] = t(tl.linear1.weight).T
        lp["linear1"]["bias"] = t(tl.linear1.bias)
        lp["linear2"]["kernel"] = t(tl.linear2.weight).T
        lp["linear2"]["bias"] = t(tl.linear2.bias)
        lp["norm1"]["scale"] = t(tl.norm1.weight)
        lp["norm1"]["bias"] = t(tl.norm1.bias)
        lp["norm2"]["scale"] = t(tl.norm2.weight)
        lp["norm2"]["bias"] = t(tl.norm2.bias)
    new["norm"]["scale"] = t(t_enc.norm.weight)
    new["norm"]["bias"] = t(t_enc.norm.bias)

    ours = model.apply({"params": new}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_ndt1_attention_parity_with_torch_sdpa():
    """NeuralAttention (XLA path) == torch SDPA with the same projections
    and the combined padding/self-attend mask (models/ndt1.py:232-292)."""
    import torch
    import torch.nn.functional as F
    from llm_bci_tpu.models.ndt1 import NeuralAttention
    from llm_bci_tpu.ops.attention import make_attention_mask
    from llm_bci_tpu.ops.context import create_context_mask

    H, heads, B, T = 16, 2, 2, 6
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(B, T, H)).astype(np.float32)
    spikes_mask = np.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int64)
    context = create_context_mask(2, 3, T)

    model = NeuralAttention(
        hidden_size=H, n_heads=heads, use_bias=True, dropout=0.0,
        use_rope=False, rope_theta=10000.0, max_F=T, n_layers=1, fixup_init=False,
    )
    attn_mask = make_attention_mask(jnp.asarray(spikes_mask), jnp.asarray(context))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x_np), attn_mask, None, None, False
    )["params"]
    ours = model.apply(
        {"params": params}, jnp.asarray(x_np), attn_mask, None, None, False
    )

    p = jax.device_get(params)
    xt = torch.tensor(x_np)

    def lin(name):
        w = torch.tensor(p[name]["kernel"])  # (H, H) input-major
        b = torch.tensor(p[name]["bias"])
        return lambda v: v @ w + b

    q = lin("query")(xt).view(B, T, heads, H // heads).transpose(1, 2)
    k = lin("key")(xt).view(B, T, heads, H // heads).transpose(1, 2)
    v = lin("value")(xt).view(B, T, heads, H // heads).transpose(1, 2)
    tmask = torch.tensor(np.asarray(attn_mask)).expand(B, heads, T, T)
    out = F.scaled_dot_product_attention(q, k, v, attn_mask=tmask)
    out = out.transpose(1, 2).reshape(B, T, H)
    ref = lin("out_proj")(out).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)
