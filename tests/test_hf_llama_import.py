"""HF Llama weight-import bridge: logits parity with transformers.

``load_hf_llama_params`` is the only bridge from real Llama-2 checkpoints
(reference ``models/bci.py:55-63`` loads via AutoModelForCausalLM) into our
JAX stack; round-trip a tiny randomly-initialized HF LlamaForCausalLM
through it and assert full-vocab logits parity at fp32.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from llm_bci_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    load_hf_llama_params,
)


def make_hf_checkpoint(tmp_path, n_heads=4, n_kv=4, tie=False):
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=n_heads,
        num_key_value_heads=n_kv,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf = hf.to(torch.float32).eval()
    out_dir = str(tmp_path / f"hf_llama_{n_heads}_{n_kv}_{tie}")
    hf.save_pretrained(out_dir)
    return out_dir, hf


@pytest.mark.parametrize("n_kv", [4, 2])
def test_hf_llama_import_logits_parity(tmp_path, n_kv):
    """MHA (n_kv == heads) and GQA (n_kv < heads) checkpoints."""
    out_dir, hf = make_hf_checkpoint(tmp_path, n_heads=4, n_kv=n_kv)
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=n_kv,
        max_position_embeddings=64,
    )
    params = load_hf_llama_params(out_dir, cfg)
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 7:] = 0  # exercise padding too

    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()

    ours, _ = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    ours = np.asarray(ours)
    # compare only valid positions (padded positions are don't-care)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid], rtol=1e-4, atol=1e-4)


def test_hf_llama_import_param_structure_matches_init(tmp_path):
    """The imported pytree must be structurally identical to model.init's
    (same keys/shapes), so device_put with recorded shardings works."""
    out_dir, _ = make_hf_checkpoint(tmp_path)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = load_hf_llama_params(out_dir, cfg)
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    init = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
    )["params"]
    flat_a = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_b = {tuple(str(p) for p in kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    for kp, leaf in flat_a:
        key = tuple(str(p) for p in kp)
        assert key in flat_b, f"missing imported param {key}"
        assert flat_b[key].shape == leaf.shape, key
    assert len(flat_a) == len(flat_b)
