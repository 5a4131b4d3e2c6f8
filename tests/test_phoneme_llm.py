"""PhonemeLLM (two-stage phoneme→LLM pipeline) forward + generation."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_bci_tpu.models.phoneme_llm import PhonemeLLM


def make_batch(B=2, L=10, P=6, V=41, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(3, 32000, size=(B, L))),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "input_split": jnp.full((B,), 4, jnp.int32),
        "phoneme_probs": jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, P, V)).astype(np.float32)), -1
        ),
        "phonemes_mask": jnp.ones((B, P), jnp.int32),
        "targets": jnp.asarray(
            np.concatenate(
                [np.full((B, 6), -100), rng.integers(3, 32000, size=(B, 4))], axis=1
            )
        ),
    }


def test_phoneme_llm_forward_and_generate():
    model = PhonemeLLM.from_config({}, debug=True)
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]
    out = model.apply({"params": params}, **batch, training=False)
    assert np.isfinite(float(out.loss))
    assert int(out.n_examples) == 2 * 4

    gen_inputs = {k: v for k, v in batch.items() if k != "targets"}
    tokens = model.apply(
        {"params": params}, **gen_inputs, max_new_tokens=4, method="generate"
    )
    assert tokens.shape == (2, 4)


def test_phoneme_llm_lora_mask():
    model = PhonemeLLM.from_config(
        {}, debug=True,
        lora={"r": 2, "alpha": 16, "dropout": 0.0, "target_modules": ["q_proj"]},
    )
    batch = make_batch()
    params = model.init(jax.random.PRNGKey(0), **batch, training=False)["params"]
    mask = model.trainable_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    llm_trainable = [
        "/".join(str(p.key) for p in k)
        for k, v in flat
        if v and str(k[0].key) == "llm"
    ]
    assert llm_trainable and all("lora_" in t for t in llm_trainable)
    coupler_trainable = [k for k, v in flat if v and "coupler" in str(k[0].key)]
    assert coupler_trainable
