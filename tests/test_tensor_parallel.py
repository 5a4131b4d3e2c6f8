"""Tensor-parallel (Megatron-style) sharding of the BCI LLM.

Beyond-reference scaling axis (the reference's only sharding is DeepSpeed
ZeRO, ``deepspeed/*.yaml``): ``parallelism.tp`` shards the Llama projection
kernels column/row-wise over the innermost mesh axis via
``tp_llama_rules`` and lets GSPMD insert the per-layer collectives.
Runs on the 8-virtual-CPU-device mesh from conftest.
"""
import jax
import numpy as np
import pytest

from tests.test_bci import bci_config, synth_bci_dataset


def _run(tmp_path, parallelism, tag):
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path / tag)
    cfg["parallelism"] = parallelism
    trainer = Trainer(cfg, dataset=synth_bci_dataset())
    loss0, _ = trainer.evaluate()
    trainer.train()
    loss1, _ = trainer.evaluate()
    return trainer, loss0, loss1


def test_tp_matches_no_tp(tmp_path):
    """A (2,2,2) data×fsdp×tp run must reproduce the (2,4,1) run: same
    eval losses before and after two optimizer steps (the math is
    identical — only the partitioning differs)."""
    t_ref, r0, r1 = _run(tmp_path, {"data": 2, "fsdp": 4, "tp": 1}, "ref")
    t_tp, s0, s1 = _run(tmp_path, {"data": 2, "fsdp": 2, "tp": 2}, "tp")
    assert np.isfinite(s0) and np.isfinite(s1)
    np.testing.assert_allclose(s0, r0, rtol=2e-4)
    np.testing.assert_allclose(s1, r1, rtol=2e-4)


def test_tp_shards_projection_kernels(tmp_path):
    """The LLM q/v kernels must actually be laid out over the tp axis
    (column-parallel), o_proj row-parallel, and LoRA factors replicated."""
    trainer, _, _ = _run(tmp_path, {"data": 2, "fsdp": 2, "tp": 2}, "shard")
    flat = dict(jax.tree_util.tree_flatten_with_path(trainer.state.params)[0])

    def spec_of(suffix):
        for path, leaf in flat.items():
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if name.endswith(suffix):
                return tuple(leaf.sharding.spec)
        raise AssertionError(f"no param path ends with {suffix}")

    assert spec_of("self_attn/q_proj/kernel")[-1] == "tp"
    assert spec_of("mlp/up_proj/kernel")[-1] == "tp"
    assert spec_of("self_attn/o_proj/kernel")[0] == "tp"
    assert spec_of("mlp/down_proj/kernel")[0] == "tp"

    # The INTENDED placement replicates the rank-r LoRA factors (the live
    # post-step layout may legally differ: the train step's output
    # shardings are GSPMD-propagated, and aligning lora_B with its
    # column-parallel base is a valid choice).
    flat_sh = dict(
        jax.tree_util.tree_flatten_with_path(trainer.param_shardings)[0]
    )
    for path, sh in flat_sh.items():
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("lora_A") or name.endswith("lora_B"):
            assert "tp" not in str(sh.spec), name


@pytest.mark.parametrize("quant", [None, "int8"])
def test_tp_decode_matches_replicated(tmp_path, quant):
    """Multi-chip serving: the jitted KV-cache decode (the WER-eval surface,
    ``eval_phonemes.py`` → ``ModelHandle.generate``) must produce the same
    tokens whether the LLM kernels are TP-sharded over the mesh or the same
    parameter VALUES run replicated — GSPMD inserts the per-layer
    collectives, the decode math is identical. The int8 case serves the
    frozen base from int8 codes + per-channel scales sharded by
    ``tp_llama_rules`` (the Trainer rewrites int8 → int8_xla, the
    partitionable matmul, on multi-device meshes)."""
    import jax.numpy as jnp

    from llm_bci_tpu.parallel.mesh import replicated
    from llm_bci_tpu.training import Trainer

    cfg = bci_config(tmp_path / f"tpdec{quant or 'bf16'}")
    cfg["parallelism"] = {"data": 2, "fsdp": 2, "tp": 2}
    if quant:
        cfg["method"]["model_kwargs"]["quantize"] = quant
    trainer = Trainer(cfg, dataset=synth_bci_dataset())
    trainer.train()

    batch, _ = next(iter(trainer.test_dataloader))
    gen_inputs = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in (
            "input_ids", "attention_mask", "input_split", "spikes",
            "spikes_mask", "spikes_timestamp", "spikes_lengths",
            "block_idx", "day_idx",
        )
    }
    beam_kw = dict(max_new_tokens=5, num_beams=3, num_return_sequences=3)
    toks_tp = trainer.model_handle.generate(**gen_inputs, max_new_tokens=5)
    beam_tp = trainer.model_handle.generate(**gen_inputs, **beam_kw)

    # identical values, replicated placement
    host_params = jax.device_get(trainer.state.params)
    repl = jax.device_put(host_params, replicated(trainer.mesh))
    toks_rep = trainer.model.apply(
        {"params": repl}, **gen_inputs, max_new_tokens=5, method="generate"
    )
    beam_rep = trainer.model.apply(
        {"params": repl}, **gen_inputs, **beam_kw, method="generate"
    )
    np.testing.assert_array_equal(np.asarray(toks_tp), np.asarray(toks_rep))
    # Beam TOKENS can legally flip on near-tied hypotheses (the sharded
    # matmuls reduce in a different order); the hypothesis SCORES are the
    # numeric surface to compare.
    np.testing.assert_allclose(
        np.asarray(beam_tp.scores), np.asarray(beam_rep.scores),
        rtol=2e-4, atol=1e-5,
    )


def test_mesh_tp_defaults_backward_compatible():
    """tp defaults to 1 and the -1 fill accounts for it."""
    from llm_bci_tpu.parallel import make_mesh

    mesh = make_mesh(-1, 2, 2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "sp": 1, "tp": 2}
    mesh = make_mesh(-1, 1)
    assert mesh.shape == {"data": 8, "fsdp": 1, "sp": 1, "tp": 1}
    with pytest.raises(ValueError):
        make_mesh(3, 3, 1)
