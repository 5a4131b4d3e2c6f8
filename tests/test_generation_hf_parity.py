"""End-to-end beam-search parity against HF ``transformers.generate``.

The reference's WER eval drives HF ``model.generate(inputs_embeds=...)``
with beam / diverse-beam configs (``/root/reference/eval_phonemes.py:53-71``).
Here the SAME tiny Llama checkpoint runs through both stacks — HF generate
on the torch side, our jitted KV-cache ``beam_search``/``diverse_beam_search``
on the JAX side (weights imported via ``load_hf_llama_params``) — and the
returned sequences and penalized scores must agree.

Driving HF with ``inputs_embeds`` (as the reference does) makes its length
penalty count only generated tokens, matching our ``n_new`` convention.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from llm_bci_tpu.models.generation import beam_search, diverse_beam_search, greedy_decode
from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM, load_hf_llama_params
from test_hf_llama_import import make_hf_checkpoint

B, P, NEW, EOS, PAD = 2, 6, 6, 2, 0


def _setup(tmp_path):
    out_dir, hf = make_hf_checkpoint(tmp_path)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    params = load_hf_llama_params(out_dir, cfg)
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    bound = model.bind({"params": params})

    rng = np.random.default_rng(3)
    ids = rng.integers(3, 128, size=(B, P)).astype(np.int32)
    attn = np.ones((B, P), np.int32)

    def decode_step(embeds, mask, cache, cache_index):
        return bound(
            inputs_embeds=embeds, attention_mask=mask,
            cache=cache, cache_index=cache_index,
        )

    def embed_tokens(tok):
        return bound.embed(tok)

    embeds = np.asarray(bound.embed(jnp.asarray(ids)))
    return hf, bound, ids, attn, embeds, decode_step, embed_tokens


def _hf_generate(hf, embeds, attn, **kw):
    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(attn).long(),
            max_new_tokens=NEW, do_sample=False,
            pad_token_id=PAD, eos_token_id=EOS,
            return_dict_in_generate=True, output_scores=True,
            **kw,
        )
    return out


def _pad_to(x, n):
    return np.pad(x, ((0, 0), (0, n - x.shape[1])), constant_values=PAD)


def test_greedy_matches_hf(tmp_path):
    hf, bound, ids, attn, embeds, decode_step, embed_tokens = _setup(tmp_path)
    out = _hf_generate(hf, embeds, attn)
    hf_tokens = _pad_to(out.sequences.numpy(), NEW)

    cache = bound.init_cache(B, P + NEW)
    ours = np.asarray(
        greedy_decode(
            decode_step, embed_tokens, jnp.asarray(embeds), jnp.asarray(attn),
            cache, NEW, EOS, PAD,
        )
    )
    # after EOS both pad; compare up to and including first EOS per row
    for b in range(B):
        row_hf, row_us = hf_tokens[b], ours[b]
        np.testing.assert_array_equal(row_us, row_hf)


@pytest.mark.parametrize("length_penalty", [1.0, 1.3])
def test_beam_search_matches_hf(tmp_path, length_penalty):
    hf, bound, ids, attn, embeds, decode_step, embed_tokens = _setup(tmp_path)
    K = 3
    out = _hf_generate(
        hf, embeds, attn,
        num_beams=K, num_return_sequences=K,
        length_penalty=length_penalty, early_stopping=False,
    )
    hf_tokens = _pad_to(out.sequences.numpy(), NEW).reshape(B, K, NEW)
    hf_scores = out.sequences_scores.numpy().reshape(B, K)

    cache = bound.init_cache(B * K, P + NEW)
    res = beam_search(
        decode_step, embed_tokens, jnp.asarray(embeds), jnp.asarray(attn),
        cache, NEW, K, EOS, PAD,
        length_penalty=length_penalty, early_stopping=False,
    )
    np.testing.assert_allclose(np.asarray(res.scores), hf_scores, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.sequences), hf_tokens)


def test_diverse_beam_search_matches_hf(tmp_path):
    """The reference WER-eval config: groups == beams, diversity 1.2."""
    hf, bound, ids, attn, embeds, decode_step, embed_tokens = _setup(tmp_path)
    K = 3
    try:
        out = _hf_generate(
            hf, embeds, attn,
            num_beams=K, num_beam_groups=K, num_return_sequences=K,
            diversity_penalty=1.2, length_penalty=1.0, early_stopping=False,
        )
    except ValueError as e:
        # transformers >= 4.57 moved group beam search to a hub-hosted
        # custom_generate repo; without network access the HF side can't
        # run. Our diverse beam search is still covered by the exhaustive
        # reference in test_generation_beams.py.
        pytest.skip(f"HF group beam search unavailable offline: {e}")
    hf_tokens = _pad_to(out.sequences.numpy(), NEW).reshape(B, K, NEW)
    hf_scores = out.sequences_scores.numpy().reshape(B, K)

    cache = bound.init_cache(B * K, P + NEW)
    res = diverse_beam_search(
        decode_step, embed_tokens, jnp.asarray(embeds), jnp.asarray(attn),
        cache, NEW, K, EOS, PAD,
        length_penalty=1.0, diversity_penalty=1.2,
    )
    # HF returns hypotheses sorted best-first across groups; ours likewise.
    np.testing.assert_allclose(np.asarray(res.scores), hf_scores, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(res.sequences), hf_tokens)
