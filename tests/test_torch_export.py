"""Reference-checkpoint EXPORT: train here, keep serving/analyzing in torch.

The inverse of ``test_torch_import.py``: init OUR models, export with
``llm_bci_tpu.interop.torch_export``, load into the LIVE reference modules
(strict ``load_state_dict`` / the reference's own ``from_pt`` constructor
path), and assert forward parity — so a user can round-trip checkpoints in
both directions.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import torch

import test_torch_parity_fullmodel as pf
from test_torch_parity_fullmodel import reference_repo


# ---------------------------------------------------------------- NDT1 ----


def test_ndt1_export_loads_via_reference_from_pt(tmp_path):
    """Flagship NDT1-CTC: export, then let the reference's own from_pt
    constructor path (config re-merge + strict weight load,
    reference models/ndt1.py:468-505) consume the dir."""
    enc_cfg = pf.encoder_config(stack=True)
    kwargs = dict(method_name="ctc", vocab_size=7, blank_id=0, zero_infinity=True)
    model = pf.build_our_ndt1(enc_cfg, **kwargs)
    batch = pf.make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(2), "mask": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    from llm_bci_tpu.interop import ndt1_save_reference_checkpoint

    ckpt = str(tmp_path / "ndt1_out")
    ndt1_save_reference_checkpoint(params, model.config, ckpt)
    for f in ("encoder.bin", "decoder.bin", "encoder_config.pth"):
        assert os.path.isfile(os.path.join(ckpt, f))

    tmodel = pf.build_reference_ndt1(
        dict(enc_cfg, from_pt=ckpt), **kwargs
    )
    t_loss, t_n, t_preds = pf.torch_forward_loss(tmodel, batch, True)
    o_loss, o_n, o_preds = pf.our_forward_loss(model, params, batch, True)
    assert t_n == o_n
    if o_preds.shape[1] > t_preds.shape[1]:  # tile-aligned stacked length
        o_preds = o_preds[:, : t_preds.shape[1]]
    np.testing.assert_allclose(o_preds, t_preds, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-4, atol=1e-4)


def test_ndt1_export_import_roundtrip_identity(tmp_path):
    """export → import is the identity on every leaf (adapt variant with
    per-day stacked weights)."""
    enc_cfg = pf.encoder_config(stack=False)
    enc_cfg["embedder"].update(adapt=True)
    kwargs = dict(method_name="mlm", loss="poisson_nll", log_input=True)
    model = pf.build_our_ndt1(enc_cfg, **kwargs)
    batch = pf.make_batch()
    batch["day_idx"] = np.array([0, 1, 3], np.int64)
    params = model.init(
        {"params": jax.random.PRNGKey(3), "mask": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), jax.device_get(params)
    )

    from llm_bci_tpu.interop import (
        ndt1_params_from_torch,
        ndt1_save_reference_checkpoint,
    )

    ckpt = str(tmp_path / "ndt1_rt")
    ndt1_save_reference_checkpoint(params, model.config, ckpt)
    back = ndt1_params_from_torch(
        ckpt, jax.tree_util.tree_map(np.zeros_like, params)
    )
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, back)


# -------------------------------------------------------- iTransformer ----


@pytest.mark.parametrize("use_cls", [True, False])
def test_itransformer_export_strict_load_parity(tmp_path, use_cls):
    cfg = pf.itransformer_config(use_cls=use_cls, mask_active=False)
    kwargs = dict(method_name="stat_behaviour", loss="xent", n_labels=3)
    model = pf.build_our_itransformer(cfg, **kwargs)
    b = pf.make_it_batch()
    common = {
        k: b[k]
        for k in ("spikes", "spikes_mask", "spikes_timestamp", "spikes_spacestamp")
    }
    jb = {k: jnp.asarray(v) for k, v in common.items()}
    jb["targets"] = jnp.asarray(b["stat_targets"])
    params = model.init(jax.random.PRNGKey(4), **jb, training=False)["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    from llm_bci_tpu.interop import itransformer_save_reference_checkpoint

    ckpt = str(tmp_path / "it_out")
    itransformer_save_reference_checkpoint(
        params, model.config, ckpt, method_name="stat_behaviour"
    )

    tmodel = pf.build_reference_itransformer(cfg, **kwargs)
    with reference_repo():
        tmodel.encoder.load_state_dict(
            torch.load(os.path.join(ckpt, "encoder.bin"), weights_only=True),
            strict=True,
        )
        tmodel.decoder.load_state_dict(
            torch.load(os.path.join(ckpt, "decoder.bin"), weights_only=True),
            strict=True,
        )
    # the torch-pickled configs are loadable plain dicts
    enc_cfg = torch.load(
        os.path.join(ckpt, "encoder_config.pth"), weights_only=True
    )
    assert enc_cfg["hidden_size"] == cfg["encoder"]["hidden_size"]

    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in common.items()}
    tb["spikes_spacestamp"] = tb["spikes_spacestamp"][0]
    tb["targets"] = torch.from_numpy(b["stat_targets"])
    with torch.no_grad():
        tout = tmodel(**tb)
    jout = model.apply({"params": params}, **jb, training=False)
    np.testing.assert_allclose(
        np.asarray(jout.preds), tout.preds.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(float(jout.loss), float(tout.loss), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- PatchTST ----


def test_patchtst_export_strict_load_parity(tmp_path):
    import test_torch_parity_patchtst as pp

    model = pp.build_ours()
    spikes, mask, lens, targets, tlens = pp.make_batch()
    variables = model.init(
        jax.random.PRNGKey(5),
        spikes=jnp.asarray(spikes),
        spikes_mask=jnp.asarray(mask),
        spikes_lengths=jnp.asarray(lens),
        targets=jnp.asarray(targets),
        targets_lengths=jnp.asarray(tlens),
        training=False,
    )
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    # non-trivial running stats so the export is meaningful
    bs = variables["batch_stats"]["encoder"]
    i = 0
    rng = np.random.default_rng(0)
    while f"layer_{i}" in bs:
        for norm in ("norm1", "norm2"):
            if "bn" in bs[f"layer_{i}"][norm]:
                n = bs[f"layer_{i}"][norm]["bn"]["mean"].shape[0]
                bs[f"layer_{i}"][norm]["bn"]["mean"] = rng.normal(
                    0, 0.3, n
                ).astype(np.float32)
                bs[f"layer_{i}"][norm]["bn"]["var"] = (
                    1.0 + rng.uniform(0, 0.5, n)
                ).astype(np.float32)
        i += 1

    from llm_bci_tpu.interop import patchtst_save_reference_checkpoint

    ckpt = str(tmp_path / "ptst_out")
    patchtst_save_reference_checkpoint(variables, model.config, ckpt)

    tmodel = pp.build_reference()
    with reference_repo():
        tmodel.encoder.load_state_dict(
            torch.load(os.path.join(ckpt, "encoder.bin"), weights_only=True),
            strict=True,
        )
        tmodel.decoder.load_state_dict(
            torch.load(os.path.join(ckpt, "decoder.bin"), weights_only=True),
            strict=True,
        )
    tmodel.eval()

    with torch.no_grad():
        tout = tmodel(
            spikes=torch.from_numpy(spikes),
            spikes_mask=torch.from_numpy(mask).long(),
            spikes_lengths=torch.from_numpy(lens).long(),
            targets=torch.from_numpy(targets).long(),
            targets_lengths=torch.from_numpy(tlens).long(),
        )
    jout = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        spikes=jnp.asarray(spikes),
        spikes_mask=jnp.asarray(mask),
        spikes_lengths=jnp.asarray(lens),
        targets=jnp.asarray(targets),
        targets_lengths=jnp.asarray(tlens),
        training=False,
    )
    np.testing.assert_allclose(
        np.asarray(jout.preds), tout.preds.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(jout.loss), float(tout.loss), rtol=1e-4, atol=1e-3)


# ------------------------------------------------------------------ BCI ----


def test_bci_export_loads_via_reference_from_pt(tmp_path):
    """Our trained BCI dir loads through the reference's own from_pt path
    (AutoModelForCausalLM.from_pretrained + ndt1 from_pt + projector.bin,
    reference models/bci.py:46-101) — forward parity end to end."""
    import test_torch_parity_bci as pb

    ours = pb.build_ours()
    batch = pb.make_batch()
    params = ours.init(
        jax.random.PRNGKey(6),
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    # the 0.02-std embed init amplifies op-order noise through RMSNorm
    # (see test_torch_parity_bci.build_reference) — scale it up
    params["llm"]["embed_tokens"]["embedding"] = (
        params["llm"]["embed_tokens"]["embedding"] * 25.0
    )

    from llm_bci_tpu.interop import bci_save_reference_checkpoint

    ckpt = str(tmp_path / "bci_out")
    bci_save_reference_checkpoint(
        params, ours.config, ckpt, llama_config=ours.llama_config
    )

    with reference_repo():
        from models.bci import BCI as TorchBCI
        from utils.config_utils import DictConfig as RefDictConfig

        ref = TorchBCI(
            RefDictConfig(
                {
                    "from_pt": ckpt,
                    "projector": dict(pb.PROJ),
                    "ndt1": {"encoder": pb.bci_encoder_cfg(), "decoder": {}},
                }
            ),
            llm_path=None, lora=None, freeze_llm=False,
            method_name="endtoend", vocab_size=41, blank_id=0,
            zero_infinity=True, loss="poisson_nll", log_input=True,
        )
    ref = ref.float().eval()

    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    with torch.no_grad():
        tout = ref(**tb)
    jout = ours.apply(
        {"params": params},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )
    assert int(jout.n_examples) == int(tout.n_examples)
    np.testing.assert_allclose(
        np.asarray(jout.preds), tout.preds.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(jout.loss), float(tout.loss), rtol=1e-4, atol=1e-3)


# ---------------------------------------------------- Llama + peft LoRA ----


def test_llama_lora_export_to_peft_logits_parity(tmp_path):
    """Export our LoRA-trained Llama as HF base + peft adapter; the live
    peft stack reproduces our logits."""
    peft = pytest.importorskip("peft")

    from llm_bci_tpu.interop import save_hf_llama, save_peft_adapter
    from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    targets = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )
    model = LlamaForCausalLM(
        cfg, lora_r=4, lora_alpha=16.0, lora_targets=targets, dtype=jnp.float32
    )
    ids = np.arange(20, dtype=np.int32).reshape(2, 10) % 128
    mask = np.ones_like(ids)
    params = model.init(
        jax.random.PRNGKey(7),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    # randomize the zero-init B factors so the adapter actually matters
    rng = np.random.default_rng(8)
    i = 0
    while f"layers_{i}" in params:
        for blk in ("self_attn", "mlp"):
            for proj in params[f"layers_{i}"][blk].values():
                if "lora_B" in proj:
                    proj["lora_B"] = rng.normal(0, 0.2, proj["lora_B"].shape).astype(
                        np.float32
                    )
        i += 1

    base_dir = str(tmp_path / "hf_base")
    adapter_dir = str(tmp_path / "adapter")
    save_hf_llama(params, cfg, base_dir)
    n = save_peft_adapter(params, adapter_dir, lora_alpha=16.0)
    assert n == 2 * 7  # 2 layers × 7 projections

    from transformers import AutoModelForCausalLM

    base = AutoModelForCausalLM.from_pretrained(base_dir, torch_dtype=torch.float32)
    pmodel = peft.PeftModel.from_pretrained(base, adapter_dir).eval()
    with torch.no_grad():
        t_logits = pmodel(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    o_logits, _ = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(o_logits), t_logits, rtol=2e-4, atol=2e-4)


def test_llama_tied_embeddings_export_logits_parity(tmp_path):
    """tie_word_embeddings=True models have no lm_head param of their own;
    the export must load non-strict and re-tie (a strict/assign load either
    demands the missing key or unties the weights)."""
    from llm_bci_tpu.interop import save_hf_llama
    from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = np.arange(20, dtype=np.int32).reshape(2, 10) % 96
    mask = np.ones_like(ids)
    params = model.init(
        jax.random.PRNGKey(3),
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    assert "lm_head" not in params

    out_dir = str(tmp_path / "hf_tied")
    save_hf_llama(params, cfg, out_dir)

    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(out_dir, torch_dtype=torch.float32)
    assert hf.config.tie_word_embeddings
    # The reloaded head really is the embedding table (still tied).
    assert (
        hf.lm_head.weight.data_ptr()
        == hf.model.embed_tokens.weight.data_ptr()
    )
    with torch.no_grad():
        t_logits = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    o_logits, _ = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(o_logits), t_logits, rtol=2e-4, atol=2e-4)


def test_save_peft_adapter_requires_trained_alpha(tmp_path):
    """A tree that carries LoRA factors cannot be exported without the alpha
    it was trained with — peft scales deltas by adapter_config.json's
    alpha/r, so writing a default would silently mis-scale the torch side."""
    from llm_bci_tpu.interop import save_peft_adapter

    rng = np.random.default_rng(0)
    params = {
        "layers_0": {
            "self_attn": {
                "q_proj": {
                    "kernel": rng.normal(size=(8, 8)).astype(np.float32),
                    "lora_A": rng.normal(size=(8, 4)).astype(np.float32),
                    "lora_B": rng.normal(size=(4, 8)).astype(np.float32),
                }
            },
            "mlp": {},
        }
    }
    with pytest.raises(ValueError, match="lora_alpha"):
        save_peft_adapter(params, str(tmp_path / "adapter"))
    # no factors → nothing written, no alpha needed
    assert save_peft_adapter({"layers_0": {"self_attn": {}, "mlp": {}}},
                             str(tmp_path / "empty")) == 0
