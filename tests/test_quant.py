"""Int8 weight-only quantization of the frozen LLM base.

Beyond-reference serving/memory lever (the reference runs its LLM fp16,
``/root/reference/models/bci.py:71``): frozen Llama projection kernels and
lm_head stored int8 + per-output-channel f32 scales, dequantized on the fly
(``llm_bci_tpu/ops/quant.py``). Covers the op (XLA + interpret-mode Pallas
kernel, values and grads), the Llama module path, param quantization of a
loaded pytree, and the BCI trainer/generation end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_bci_tpu.ops import quant

from tests.test_bci import bci_config, synth_bci_dataset


def _dequant(q, s):
    return q.astype(np.float32) * np.asarray(s)[None, :]


def test_quantize_int8_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.02, size=(128, 256)).astype(np.float32)
    q, s = quant.quantize_int8(w)
    assert q.dtype == np.int8 and s.shape == (256,)
    err = np.abs(_dequant(q, s) - w)
    assert (err <= s[None, :] / 2 + 1e-9).all()
    # exact at the absmax positions (symmetric absmax hits ±127 exactly)
    assert np.abs(q).max() == 127


def test_int8_matmul_xla_matches_dequant():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.05, size=(64, 192)).astype(np.float32)
    x = rng.normal(size=(3, 5, 64)).astype(np.float32)
    q, s = quant.quantize_int8(w)
    y = quant.int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s))
    ref = x @ _dequant(q, s)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_int8_matmul_pallas_interpret_matches_xla():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.05, size=(256, 256)).astype(np.float32)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    q, s = quant.quantize_int8(w)
    args = (jnp.asarray(x), jnp.asarray(q), jnp.asarray(s))
    y_xla = quant.int8_matmul(*args)
    quant.set_interpret_mode(True)
    try:
        y_pl = quant.int8_matmul(*args, block_n=128, block_k=128)
    finally:
        quant.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), rtol=1e-5)


def test_plan_blocks_maximizes_row_contiguity():
    """The auto planner picks bn-first (the contiguous span of a (K, N)
    row-major weight block): whole rows when they fit the VMEM budget,
    and the largest 128-multiple divisor otherwise. Fixed small bn was
    the round-3 int8-decode regression (256-byte strided HBM reads)."""
    # decode (bm=16): whole-row blocks for every Llama proj shape
    assert quant._plan_blocks(1024, 1024, 16) == (1024, 1024)
    assert quant._plan_blocks(1024, 256, 16) == (256, 1024)
    assert quant._plan_blocks(1024, 2816, 16) == (2816, 512)
    assert quant._plan_blocks(2816, 1024, 16) == (1024, 1408)
    # lm_head: 32000 has no whole-row fit; 16000-byte runs, 2 MB blocks
    assert quant._plan_blocks(1024, 32000, 16) == (16000, 128)
    # true 7B dims stay fully contiguous
    assert quant._plan_blocks(4096, 4096, 16) == (4096, 512)
    assert quant._plan_blocks(4096, 11008, 16) == (11008, 128)
    # training bm: the f32 accumulator budget caps bn
    bn, bk = quant._plan_blocks(1024, 32000, 256)
    assert bn * 256 * 4 <= quant._ACC_BLOCK_BUDGET
    assert 32000 % bn == 0 and 1024 % bk == 0
    # shapes with no 128-multiple divisor -> None -> XLA fallback
    assert quant._plan_blocks(100, 200, 16) is None


def test_int8_matmul_planned_blocks_interpret_matches_xla():
    """Interpret-mode check of the kernel at an auto-planned whole-row
    tiling (bn == N), the layout the decode path now uses."""
    rng = np.random.default_rng(7)
    w = rng.normal(0, 0.05, size=(256, 1536)).astype(np.float32)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    q, s = quant.quantize_int8(w)
    args = (jnp.asarray(x), jnp.asarray(q), jnp.asarray(s))
    assert quant._plan_blocks(256, 1536, 16) == (1536, 256)
    y_xla = quant.int8_matmul(*args, impl="xla")
    quant.set_interpret_mode(True)
    try:
        y_pl = quant.int8_matmul(*args)
    finally:
        quant.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), rtol=1e-5)


def test_int8_matmul_grad_is_dequant_grad():
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.05, size=(64, 96)).astype(np.float32)
    x = rng.normal(size=(7, 64)).astype(np.float32)
    q, s = quant.quantize_int8(w)

    g = jax.grad(
        lambda xx: (quant.int8_matmul(xx, jnp.asarray(q), jnp.asarray(s)) ** 2).sum()
    )(jnp.asarray(x))
    wd = _dequant(q, s)
    gref = 2.0 * (x @ wd) @ wd.T
    np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-4, atol=1e-5)
    # int8 kernel and scale take no gradient (frozen by construction)
    gq, gs = jax.grad(
        lambda qq, ss: quant.int8_matmul(
            jnp.asarray(x), qq, ss
        ).sum(),
        argnums=(0, 1),
        allow_int=True,
    )(jnp.asarray(q), jnp.asarray(s))
    assert np.all(np.asarray(gs) == 0)


def test_quantize_llama_params_structure():
    from llm_bci_tpu.models.llama import (
        LlamaConfig,
        LlamaForCausalLM,
        quantize_llama_params,
    )

    cfg = LlamaConfig.debug()
    model = LlamaForCausalLM(cfg, freeze_base=True)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((1, 4), jnp.int32)
    )["params"]
    qparams = quantize_llama_params(jax.device_get(params))
    attn = qparams["layers_0"]["self_attn"]["q_proj"]
    assert attn["kernel"].dtype == np.int8
    assert attn["kernel_scale"].shape == (cfg.hidden_size,)
    assert qparams["lm_head"]["kernel"].dtype == np.int8
    # norms/embeddings untouched
    assert qparams["norm"]["weight"].dtype != np.int8
    assert qparams["embed_tokens"]["embedding"].dtype != np.int8
    qparams2 = quantize_llama_params(jax.device_get(params), quant_lm_head=False)
    assert qparams2["lm_head"]["kernel"].dtype != np.int8


def test_llama_quant_forward_matches_dequantized_model():
    """A quant='int8' Llama must produce (near-)identical logits to the
    plain bf16 model evaluated at the dequantized weights — the quant path
    changes the storage format, not the math."""
    from llm_bci_tpu.models.llama import (
        LlamaConfig,
        LlamaForCausalLM,
        quantize_llama_params,
    )

    cfg = LlamaConfig.debug()
    base = LlamaForCausalLM(cfg, freeze_base=True, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, size=(2, 6)))
    params = base.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    host = jax.device_get(params)
    qparams = quantize_llama_params(host)

    # dequantize back into the plain model's layout
    def dq(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                if "kernel_scale" in v:
                    out[k] = {
                        kk: vv
                        for kk, vv in v.items()
                        if kk != "kernel_scale"
                    }
                    out[k]["kernel"] = _dequant(v["kernel"], v["kernel_scale"])
                else:
                    out[k] = dq(v)
            else:
                out[k] = v
        return out

    deq_params = dq(qparams)
    logits_ref, _ = base.apply({"params": deq_params}, input_ids=ids)

    qmodel = LlamaForCausalLM(cfg, freeze_base=True, dtype=jnp.float32, quant="int8")
    logits_q, _ = qmodel.apply({"params": qparams}, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_ref), rtol=1e-4, atol=1e-4
    )


def test_bci_trainer_int8_quant(tmp_path):
    """End-to-end: BCI with method.model_kwargs.quantize=int8 trains (LoRA
    on an int8 base), evaluates finite, and generates."""
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path)
    cfg["method"]["model_kwargs"]["quantize"] = "int8"
    trainer = Trainer(cfg, dataset=synth_bci_dataset())

    # the multi-device test mesh rewrites the mode to the
    # GSPMD-partitionable impl (identical int8 storage layout)
    import jax as _jax

    if len(_jax.devices()) > 1:
        assert trainer.model.quant == "int8_xla"

    # the base kernels really are int8 + scales; LoRA factors stay float
    flat = jax.tree_util.tree_flatten_with_path(trainer.state.params)[0]
    kinds = {"int8_kernels": 0, "scales": 0, "lora": 0}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if not name.startswith("llm/"):
            continue
        if name.endswith("proj/kernel") or name.endswith("lm_head/kernel"):
            assert leaf.dtype == jnp.int8, name
            kinds["int8_kernels"] += 1
        if name.endswith("kernel_scale"):
            assert leaf.dtype == jnp.float32, name
            kinds["scales"] += 1
        if "lora_" in name:
            assert leaf.dtype == jnp.float32, name
            kinds["lora"] += 1
    assert kinds["int8_kernels"] > 0 and kinds["scales"] == kinds["int8_kernels"]
    assert kinds["lora"] > 0

    loss0, _ = trainer.evaluate()
    trainer.train()
    loss1, _ = trainer.evaluate()
    assert np.isfinite(loss0) and np.isfinite(loss1)

    batch, _ = next(iter(trainer.test_dataloader))
    gen_inputs = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in (
            "input_ids", "attention_mask", "input_split", "spikes", "spikes_mask",
            "spikes_timestamp", "spikes_lengths", "block_idx", "day_idx",
        )
    }
    tokens = trainer.model_handle.generate(**gen_inputs, max_new_tokens=4)
    assert np.asarray(tokens).shape[-1] == 4


def test_caller_supplied_int8_model_rewritten_on_mesh(tmp_path):
    """Trainer(model=...) must get the same int8 -> int8_xla rewrite as the
    config-built path: a caller-supplied int8 model on a multi-device mesh
    would otherwise keep the Pallas dequant matmul GSPMD can't partition."""
    from llm_bci_tpu.models.bci import BCI
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path)
    cfg["method"]["model_kwargs"]["quantize"] = "int8"
    model = BCI.from_config(cfg["model"], **cfg["method"]["model_kwargs"])
    assert model.quant == "int8"

    trainer = Trainer(cfg, model=model, dataset=synth_bci_dataset())
    if len(jax.devices()) > 1:
        assert trainer.model.quant == "int8_xla"
    loss, _ = trainer.evaluate()
    assert np.isfinite(loss)


def test_adapt_quantization_both_directions():
    """Float kernels re-quantize into an int8+scale layout and int8+scale
    pairs dequantize into a float layout; unrelated leaves pass through."""
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.02, size=(16, 8)).astype(np.float32)
    q, s = quant.quantize_int8(w)

    float_tree = {"proj": {"kernel": w}, "norm": {"weight": np.ones(8)}}
    int8_tree = {
        "proj": {"kernel": q, "kernel_scale": s},
        "norm": {"weight": np.ones(8)},
    }

    # float checkpoint -> int8 model: post-training quantization
    out = quant.adapt_quantization(float_tree, int8_tree)
    np.testing.assert_array_equal(out["proj"]["kernel"], q)
    np.testing.assert_allclose(out["proj"]["kernel_scale"], s)
    np.testing.assert_array_equal(out["norm"]["weight"], np.ones(8))

    # int8 checkpoint -> float model: dequantize, drop the scale
    out = quant.adapt_quantization(int8_tree, float_tree)
    assert "kernel_scale" not in out["proj"]
    np.testing.assert_allclose(
        out["proj"]["kernel"], _dequant(q, s), rtol=1e-6, atol=1e-7
    )

    # already matching layouts pass through untouched
    out = quant.adapt_quantization(int8_tree, int8_tree)
    np.testing.assert_array_equal(out["proj"]["kernel"], q)
    out = quant.adapt_quantization(float_tree, float_tree)
    np.testing.assert_array_equal(out["proj"]["kernel"], w)


def test_msgpack_warmstart_across_quant_change(tmp_path):
    """A component msgpack saved from a bf16 model loads into a
    quantize='int8' model (and vice versa) with proper (de)quantization —
    the user trains unquantized, then serves int8 from the same blob."""
    from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from llm_bci_tpu.utils.serialization import load_params, save_params

    cfg = LlamaConfig.debug()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, size=(1, 5)))
    base = LlamaForCausalLM(cfg, freeze_base=True, dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(0), input_ids=ids)["params"]
    path = str(tmp_path / "llm.msgpack")
    save_params(path, params)

    qmodel = LlamaForCausalLM(
        cfg, freeze_base=True, dtype=jnp.float32, quant="int8"
    )
    qtarget = qmodel.init(jax.random.PRNGKey(1), input_ids=ids)["params"]
    qloaded = load_params(path, qtarget)

    # spot-check one projection: the loaded int8 codes are the PTQ of the
    # saved float kernel, not a dtype cast of it
    saved_k = np.asarray(
        jax.device_get(params["layers_0"]["self_attn"]["q_proj"]["kernel"])
    )
    exp_q, exp_s = quant.quantize_int8(saved_k)
    got = qloaded["layers_0"]["self_attn"]["q_proj"]
    np.testing.assert_array_equal(np.asarray(got["kernel"]), exp_q)
    np.testing.assert_allclose(np.asarray(got["kernel_scale"]), exp_s)

    # logits of the quantized load match the original within quant error
    logits_f, _ = base.apply({"params": params}, input_ids=ids)
    logits_q, _ = qmodel.apply({"params": qloaded}, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_f), rtol=0.1, atol=0.05
    )

    # reverse: int8 blob into a float model dequantizes
    qpath = str(tmp_path / "llm_q.msgpack")
    save_params(qpath, qloaded)
    floaded = load_params(qpath, params)
    np.testing.assert_allclose(
        np.asarray(floaded["layers_0"]["self_attn"]["q_proj"]["kernel"]),
        _dequant(exp_q, exp_s),
        rtol=1e-6,
        atol=1e-7,
    )


def test_orbax_overlay_requantizes():
    """The Orbax restore overlay quantizes float kernels into int8 targets
    (and dequantizes int8 into float targets) instead of dtype-casting."""
    from llm_bci_tpu.training.checkpoint import _overlay

    rng = np.random.default_rng(7)
    w = rng.normal(0, 0.02, size=(8, 4)).astype(np.float32)
    q, s = quant.quantize_int8(w)

    target = {
        "params": {"proj": {"kernel": q * 0, "kernel_scale": s * 0}},
        "step": np.int32(0),
    }
    restored = {"params": {"proj": {"kernel": w}}, "step": np.int32(5)}
    out = _overlay(target, restored)
    np.testing.assert_array_equal(out["params"]["proj"]["kernel"], q)
    np.testing.assert_allclose(out["params"]["proj"]["kernel_scale"], s)
    assert out["step"] == 5

    target_f = {"params": {"proj": {"kernel": w * 0}}, "step": np.int32(0)}
    restored_q = {
        "params": {"proj": {"kernel": q, "kernel_scale": s}},
        "step": np.int32(5),
    }
    out = _overlay(target_f, restored_q)
    np.testing.assert_allclose(
        out["params"]["proj"]["kernel"], _dequant(q, s), rtol=1e-6, atol=1e-7
    )


def test_fit_block_7b_shapes():
    """Llama-2-7B's ffn (11008) and vocab (32000) dims are 256- but not
    512-aligned: the block must shrink so they still take the Pallas path."""
    assert quant._fit_block(11008, 512) == 256
    assert quant._fit_block(32000, 512) == 256
    assert quant._fit_block(4096, 512) == 512
    assert quant._fit_block(100, 512) == 512  # no fit -> XLA fallback
    assert not quant._pallas_viable(16, 100, 100, 16, 512, 512)


def test_impl_xla_matches_auto():
    """impl='xla' (the GSPMD-partitionable mode multi-device Trainers
    select via quantize=int8_xla) computes the same values as the auto
    dispatch and never enters the Pallas path."""
    rng = np.random.default_rng(5)
    w = rng.normal(0, 0.05, size=(256, 256)).astype(np.float32)
    x = rng.normal(size=(8, 256)).astype(np.float32)
    q, s = quant.quantize_int8(w)
    args = (jnp.asarray(x), jnp.asarray(q), jnp.asarray(s))
    y_auto = quant.int8_matmul(*args)
    y_xla = quant.int8_matmul(*args, impl="xla")
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_auto), rtol=1e-6)
    # grads flow identically through the custom VJP on both routes
    g_auto = jax.grad(lambda xx: quant.int8_matmul(xx, *args[1:]).sum())(args[0])
    g_xla = jax.grad(
        lambda xx: quant.int8_matmul(xx, *args[1:], impl="xla").sum()
    )(args[0])
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_auto), rtol=1e-6)


def test_lora_dense_serving_training_same_values():
    """The int8 LoRADense routes serving calls (training=False) through the
    XLA convert+dot and training calls through the auto/Pallas path
    (measured-faster per mode, r4 — llama.py dispatch comment). The two
    routes must compute identical values: only the weight-streaming
    schedule may differ."""
    import jax

    from llm_bci_tpu.models.llama import LoRADense

    layer = LoRADense(features=128, r=4, quant="int8", dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(6, 96)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    # non-trivial codes: the init scale is constant, so draw real values
    params = dict(params)
    params["kernel"] = jnp.asarray(
        rng.integers(-127, 128, size=(96, 128)).astype(np.int8)
    )
    params["kernel_scale"] = jnp.asarray(
        rng.uniform(0.001, 0.02, size=(128,)).astype(np.float32)
    )
    y_serve = layer.apply({"params": params}, x, training=False)
    y_train = layer.apply(
        {"params": params}, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_train), rtol=1e-6, atol=1e-6
    )
