"""Llama stack + generation correctness on the debug-size config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM, lora_trainable_mask


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = LlamaConfig(
        vocab_size=97,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 97, size=(2, 10)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    return cfg, model, params


def test_causal_masking(tiny_llm):
    cfg, model, params = tiny_llm
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8)))
    logits, _ = model.apply({"params": params}, input_ids=ids)
    # Changing a future token must not affect earlier logits.
    ids2 = ids.at[0, 5].set((ids[0, 5] + 1) % cfg.vocab_size)
    logits2, _ = model.apply({"params": params}, input_ids=ids2)
    np.testing.assert_allclose(
        np.asarray(logits[:, :5]), np.asarray(logits2[:, :5]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[:, 5:]), np.asarray(logits2[:, 5:]))


def test_padding_mask(tiny_llm):
    cfg, model, params = tiny_llm
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8)))
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0]])
    logits, _ = model.apply({"params": params}, input_ids=ids, attention_mask=mask)
    # Padded tail tokens must not affect valid-prefix logits.
    ids2 = ids.at[0, 7].set((ids[0, 7] + 3) % cfg.vocab_size)
    logits2, _ = model.apply({"params": params}, input_ids=ids2, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(logits[:, :6]), np.asarray(logits2[:, :6]), atol=1e-5
    )


def test_kv_cache_matches_full_forward(tiny_llm):
    cfg, model, params = tiny_llm
    rng = np.random.default_rng(3)
    B, T = 2, 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
    full_logits, _ = model.apply({"params": params}, input_ids=ids)

    # Prefill 4 tokens, then decode 2 with the cache.
    cache = model.apply({"params": params}, B, T, method="init_cache")
    key_mask = jnp.concatenate([jnp.ones((B, 4), jnp.int32), jnp.zeros((B, 2), jnp.int32)], 1)
    logits, cache = model.apply(
        {"params": params},
        input_ids=ids[:, :4],
        attention_mask=key_mask,
        cache=cache,
        cache_index=jnp.int32(0),
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits[:, :4]), atol=1e-4)
    for t in range(4, 6):
        key_mask = key_mask.at[:, t].set(1)
        logits, cache = model.apply(
            {"params": params},
            input_ids=ids[:, t : t + 1],
            attention_mask=key_mask,
            cache=cache,
            cache_index=jnp.int32(t),
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits[:, t]), atol=1e-4
        )


def test_greedy_decode_matches_manual(tiny_llm):
    cfg, model, params = tiny_llm
    from llm_bci_tpu.models.generation import greedy_decode

    rng = np.random.default_rng(4)
    B, P, NEW = 2, 5, 4
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, P)))
    embeds = model.apply({"params": params}, ids, method="embed")
    attn = jnp.ones((B, P), jnp.int32)

    def decode_step(e, m, c, i):
        return model.apply(
            {"params": params}, inputs_embeds=e, attention_mask=m, cache=c, cache_index=i
        )

    def embed_tokens(t):
        return model.apply({"params": params}, t, method="embed")

    cache = model.apply({"params": params}, B, P + NEW, method="init_cache")
    tokens = greedy_decode(
        decode_step, embed_tokens, embeds, attn, cache, NEW,
        eos_token_id=2, pad_token_id=0,
    )
    assert tokens.shape == (B, NEW)

    # Manual no-cache greedy reference.
    cur = ids
    for _ in range(NEW):
        logits, _ = model.apply({"params": params}, input_ids=cur)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    manual = np.asarray(cur[:, P:])
    ours = np.asarray(tokens)
    # Compare until first EOS per row (post-EOS tokens are pad by design).
    for b in range(B):
        for t in range(NEW):
            if manual[b, t] == 2:
                break
            assert ours[b, t] == manual[b, t]


def test_beam_search_beats_or_matches_greedy_logprob(tiny_llm):
    cfg, model, params = tiny_llm
    from llm_bci_tpu.models.generation import beam_search, greedy_decode

    rng = np.random.default_rng(5)
    B, P, NEW, K = 1, 4, 4, 3
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, P)))
    embeds = model.apply({"params": params}, ids, method="embed")
    attn = jnp.ones((B, P), jnp.int32)

    def decode_step(e, m, c, i):
        return model.apply(
            {"params": params}, inputs_embeds=e, attention_mask=m, cache=c, cache_index=i
        )

    def embed_tokens(t):
        return model.apply({"params": params}, t, method="embed")

    def seq_logprob(new_tokens):
        cur = jnp.concatenate([ids, jnp.asarray(new_tokens)[None, :]], axis=1)
        logits, _ = model.apply({"params": params}, input_ids=cur)
        lp = jax.nn.log_softmax(logits, axis=-1)
        total = 0.0
        for t in range(NEW):
            total += float(lp[0, P - 1 + t, int(new_tokens[t])])
        return total

    greedy = greedy_decode(
        decode_step, embed_tokens, embeds, attn,
        model.apply({"params": params}, B, P + NEW, method="init_cache"),
        NEW, eos_token_id=2, pad_token_id=0,
    )
    beam = beam_search(
        decode_step, embed_tokens, embeds, attn,
        model.apply({"params": params}, B * K, P + NEW, method="init_cache"),
        NEW, K, eos_token_id=2, pad_token_id=0,
    ).sequences[:, 0]
    g, b = np.asarray(greedy)[0], np.asarray(beam)[0]
    if 2 not in g and 2 not in b and 0 not in g and 0 not in b:
        assert seq_logprob(b) >= seq_logprob(g) - 1e-4


def test_lora_mask():
    cfg = LlamaConfig.debug()
    model = LlamaForCausalLM(
        cfg, lora_r=4, lora_targets=("q_proj", "v_proj"), dtype=jnp.float32
    )
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    mask = lora_trainable_mask(params, freeze_all_base=True)
    flat = dict(jax.tree_util.tree_flatten_with_path(mask)[0])
    trainables = ["/".join(str(p.key) for p in k) for k, v in flat.items() if v]
    assert trainables and all("lora_" in t for t in trainables)

def test_fused_lora_group_matches_per_adapter():
    """apply_lora_group (one concat-A matmul + block-diag-B matmul) must
    equal per-adapter ``y + (α/r)·(x@A)@B`` exactly at dropout=0 — incl.
    mixed groups where only some projections carry adapters."""
    from llm_bci_tpu.models.llama import apply_lora_group

    rng = np.random.default_rng(3)
    B, T, H, r = 2, 5, 16, 4
    alpha = 32.0
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    feats = [24, 8, 8]
    deferred, expected = [], []
    for i, f in enumerate(feats):
        y = jnp.asarray(rng.normal(size=(B, T, f)), jnp.float32)
        if i == 1:  # untargeted projection: no adapter
            deferred.append((y, None, None))
            expected.append(y)
            continue
        a = jnp.asarray(rng.normal(size=(H, r)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(r, f)), jnp.float32)
        deferred.append((y, a, b))
        expected.append(y + (alpha / r) * ((x @ a) @ b))
    outs = apply_lora_group(x, deferred, alpha=alpha, r=r)
    for o, e in zip(outs, expected):
        np.testing.assert_allclose(np.asarray(o), np.asarray(e), rtol=1e-5, atol=1e-5)


def test_lora_forward_changes_with_nonzero_B():
    """End-to-end: perturbing lora_B must move the logits through the fused
    group path (guards against a fusion that silently drops deltas), and
    zero-init lora_B must leave logits at the base value."""
    cfg = LlamaConfig.debug()
    targets = ("q_proj", "v_proj", "k_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")
    model = LlamaForCausalLM(cfg, lora_r=4, lora_targets=targets, dtype=jnp.float32)
    base = LlamaForCausalLM(cfg, lora_r=0, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(3, 97, size=(2, 6)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    def strip_lora(p):
        if isinstance(p, dict):
            return {k: strip_lora(v) for k, v in p.items()
                    if k not in ("lora_A", "lora_B")}
        return p

    logits0, _ = model.apply({"params": params}, input_ids=ids)
    logits_base, _ = base.apply({"params": strip_lora(params)}, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(logits_base), rtol=1e-5, atol=1e-5
    )

    bumped = jax.tree_util.tree_map_with_path(
        lambda path, v: v + 0.05
        if any(str(getattr(p, "key", "")) == "lora_B" for p in path)
        else v,
        params,
    )
    logits1, _ = model.apply({"params": bumped}, input_ids=ids)
    assert float(jnp.max(jnp.abs(logits1 - logits0))) > 1e-3
