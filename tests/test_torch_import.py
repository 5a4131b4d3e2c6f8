"""Reference-checkpoint import: train in torch upstream, load here.

Each test drives the REAL reference module (read-only import from
/root/reference), saves a checkpoint with the reference's own
``save_checkpoint`` (``models/ndt1.py:685-692``, ``models/itransformer.py:
403-411``, ``models/patchtst.py:258-266``, ``models/bci.py:250-264``),
imports it through ``llm_bci_tpu.interop`` (mostly via the transparent
``load_checkpoint_params`` routing), and asserts forward parity — the
contract a migrating user needs: their trained torch checkpoints keep
working.
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


def test_ndt1_torch_checkpoint_roundtrip(tmp_path):
    """Flagship NDT1-CTC (stacked) reference checkpoint → from_pt route."""
    enc_cfg = pf.encoder_config(stack=True)
    kwargs = dict(
        method_name="ctc", vocab_size=7, blank_id=0, zero_infinity=True
    )
    tmodel = pf.build_reference_ndt1(enc_cfg, **kwargs)
    ckpt = str(tmp_path / "ndt1")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    model = pf.build_our_ndt1(enc_cfg, **kwargs)
    batch = pf.make_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    from llm_bci_tpu.interop import is_torch_checkpoint

    assert is_torch_checkpoint(ckpt)
    params = model.load_checkpoint_params(ckpt, params)

    t_loss, t_n, t_preds = pf.torch_forward_loss(tmodel, batch, True)
    o_loss, o_n, o_preds = pf.our_forward_loss(model, params, batch, True)
    assert t_n == o_n
    if o_preds.shape[1] > t_preds.shape[1]:  # tile-aligned stacked length
        o_preds = o_preds[:, : t_preds.shape[1]]
    np.testing.assert_allclose(o_preds, t_preds, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(o_loss, t_loss, rtol=1e-4, atol=1e-4)


def test_ndt1_torch_import_adapt_factors(tmp_path):
    """The per-day-adapt variant: ModuleList embed layers → stacked einsum
    weights, plus the active factors projection — forward parity after
    import."""
    enc_cfg = pf.encoder_config(stack=False)
    enc_cfg["embedder"].update(adapt=True)
    enc_cfg["factors"] = {
        "active": True, "size": 12, "act": "relu", "bias": True,
        "dropout": 0.0, "fixup_init": False, "init_range": 0.1,
    }
    kwargs = dict(method_name="mlm", loss="poisson_nll", log_input=True)
    tmodel = pf.build_reference_ndt1(enc_cfg, **kwargs)
    ckpt = str(tmp_path / "ndt1_adapt")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    model = pf.build_our_ndt1(enc_cfg, **kwargs)
    batch = pf.make_batch()
    batch["day_idx"] = np.array([0, 1, 3], np.int64)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    from llm_bci_tpu.interop import ndt1_params_from_torch

    params = ndt1_params_from_torch(ckpt, params)

    t_loss, t_n, t_preds = pf.torch_forward_loss(tmodel, batch, False)
    o_loss, o_n, o_preds = pf.our_forward_loss(model, params, batch, False)
    assert t_n == o_n
    np.testing.assert_allclose(o_preds, t_preds, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(o_loss, t_loss, rtol=3e-3, atol=3e-3)


def test_ndt1_torch_import_day_block_tables(tmp_path):
    """day/block prefix-token tables land in the right leaves (the
    reference forward cannot run this variant — its context/targets masks
    are not sized for prefix tokens, models/ndt1.py:435,550 — so the check
    is numeric against the torch state dict)."""
    enc_cfg = pf.encoder_config(stack=False)
    enc_cfg["embedder"].update(day_token=True, block_token=True)
    kwargs = dict(method_name="ctc", vocab_size=7, blank_id=0, zero_infinity=True)
    tmodel = pf.build_reference_ndt1(enc_cfg, **kwargs)
    ckpt = str(tmp_path / "ndt1_tok")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    model = pf.build_our_ndt1(enc_cfg, **kwargs)
    batch = pf.make_batch()
    batch["day_idx"] = np.array([0, 1, 3], np.int64)
    batch["block_idx"] = np.array([2, 0, 1], np.int64)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    from llm_bci_tpu.interop import ndt1_params_from_torch

    params = ndt1_params_from_torch(ckpt, params)
    sd = {k: v.detach().numpy() for k, v in tmodel.encoder.state_dict().items()}
    emb = params["encoder"]["embedder"]
    np.testing.assert_array_equal(
        np.asarray(emb["day_embedding"]), sd["embedder.day_embedding.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(emb["block_embedding"]), sd["embedder.block_embedding.weight"]
    )


def test_ndt1_from_config_remerges_reference_saved_config(tmp_path):
    """`from_pt` at a reference dir re-merges its torch-pickled
    `encoder_config.pth` (reference models/ndt1.py:463-476) so the built
    model matches the checkpoint architecture, then the warm start grafts
    the weights."""
    enc_cfg = pf.encoder_config(stack=False)
    kwargs = dict(method_name="mlm", loss="poisson_nll", log_input=True)
    tmodel = pf.build_reference_ndt1(enc_cfg, **kwargs)
    ckpt = str(tmp_path / "ndt1_cfg")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)
    assert os.path.isfile(os.path.join(ckpt, "encoder_config.pth"))

    from llm_bci_tpu.models.ndt1 import NDT1

    # user config carries only from_pt — architecture must come from the
    # checkpoint's saved config, not the default yaml
    model = NDT1.from_config({"encoder": {"from_pt": ckpt}}, **kwargs)
    tr = model.config["encoder"]["transformer"]
    assert tr["hidden_size"] == enc_cfg["transformer"]["hidden_size"]
    assert tr["n_layers"] == enc_cfg["transformer"]["n_layers"]
    assert model.config["encoder"]["embedder"]["n_channels"] == 8

    batch = pf.make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0)},
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    params = model.warm_start_params(
        jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.encoder.state_dict().items()}
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["layer_0"]["ln1"]["scale"]),
        sd["layers.0.ln1.weight"],
    )


def test_ndt1_torch_import_rejects_wrong_architecture(tmp_path):
    """A checkpoint from a different layout must fail loudly, not partially
    import: here the model has fewer layers than the checkpoint."""
    enc_cfg = pf.encoder_config(stack=True)
    kwargs = dict(method_name="ctc", vocab_size=7, blank_id=0, zero_infinity=True)
    tmodel = pf.build_reference_ndt1(enc_cfg, **kwargs)
    ckpt = str(tmp_path / "ndt1_big")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    small = dict(enc_cfg)
    small["transformer"] = dict(enc_cfg["transformer"], n_layers=1)
    model = pf.build_our_ndt1(small, **kwargs)
    batch = pf.make_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    with pytest.raises(ValueError, match="layers"):
        model.load_checkpoint_params(ckpt, params)


def test_load_saved_component_config_formats(tmp_path):
    """The saved-config loader reads ours (yaml), the reference's
    torch-pickled .pth (models/trainer.py:412), and the reference
    PatchTST's torch pickle wearing a .yaml name (models/patchtst.py:260)."""
    import yaml

    from llm_bci_tpu.interop import load_saved_component_config

    d1 = tmp_path / "ours"; d1.mkdir()
    yaml.safe_dump({"a": 1}, open(d1 / "trainer_config.yaml", "w"))
    assert load_saved_component_config(str(d1), "trainer") == {"a": 1}

    d2 = tmp_path / "ref"; d2.mkdir()
    torch.save({"b": {"c": 2}}, str(d2 / "trainer_config.pth"))
    assert load_saved_component_config(str(d2), "trainer") == {"b": {"c": 2}}

    d3 = tmp_path / "ptst"; d3.mkdir()
    torch.save({"d": 3}, str(d3 / "encoder_config.yaml"))  # torch zip, .yaml name
    assert load_saved_component_config(str(d3), "encoder") == {"d": 3}

    assert load_saved_component_config(str(tmp_path), "missing") is None


def test_load_saved_component_config_missing_next_to_weights(tmp_path):
    """Weights with NO saved config is a hard error (shape-compatible
    architecture drift would graft silently wrong) — for the projector
    too: both the reference (models/bci.py:257-258) and our save always
    write projector weights WITH a config, so a bare blob is anomalous.
    A config-free dir with no weights still warns-and-returns-None."""
    import warnings

    from llm_bci_tpu.interop import load_saved_component_config

    d = tmp_path / "bare"; d.mkdir()
    (d / "encoder.msgpack").write_bytes(b"\x80")
    with pytest.raises(FileNotFoundError, match="no saved 'encoder' config"):
        load_saved_component_config(str(d), "encoder")

    torch.save({"w": torch.zeros(1)}, str(d / "projector.bin"))
    with pytest.raises(FileNotFoundError, match="no saved 'projector' config"):
        load_saved_component_config(str(d), "projector")

    d2 = tmp_path / "noweights"; d2.mkdir()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert load_saved_component_config(str(d2), "projector") is None
    assert any("re-merge" in str(w.message) for w in rec)


# -------------------------------------------------------- iTransformer ----


def test_itransformer_torch_checkpoint_roundtrip(tmp_path):
    cfg = pf.itransformer_config(use_cls=True, mask_active=False)
    kwargs = dict(method_name="stat_behaviour", loss="xent", n_labels=3)
    tmodel = pf.build_reference_itransformer(cfg, **kwargs)
    ckpt = str(tmp_path / "it")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    model = pf.build_our_itransformer(cfg, **kwargs)
    b = pf.make_it_batch()
    common = {
        k: b[k]
        for k in ("spikes", "spikes_mask", "spikes_timestamp", "spikes_spacestamp")
    }
    jb = {k: jnp.asarray(v) for k, v in common.items()}
    jb["targets"] = jnp.asarray(b["stat_targets"])
    params = model.init(jax.random.PRNGKey(0), **jb, training=False)["params"]
    params = model.load_checkpoint_params(ckpt, params)

    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in common.items()}
    tb["spikes_spacestamp"] = tb["spikes_spacestamp"][0]
    tb["targets"] = torch.from_numpy(b["stat_targets"])
    with torch.no_grad():
        tout = tmodel(**tb)
    jout = model.apply({"params": params}, **jb, training=False)
    np.testing.assert_allclose(
        np.asarray(jout.preds), np.asarray(tout.preds), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(float(jout.loss), float(tout.loss), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- PatchTST ----


def test_patchtst_torch_checkpoint_roundtrip(tmp_path):
    import test_torch_parity_patchtst as pp

    tmodel = pp.build_reference()
    spikes, mask, lens, targets, tlens = pp.make_batch()
    # Burn in the BatchNorm running stats so the import is meaningful
    # (fresh stats are the 0/1 init everywhere).
    tmodel.train()
    with torch.no_grad():
        for _ in range(3):
            tmodel(
                spikes=torch.from_numpy(spikes),
                spikes_mask=torch.from_numpy(mask).long(),
                spikes_lengths=torch.from_numpy(lens).long(),
                targets=torch.from_numpy(targets).long(),
                targets_lengths=torch.from_numpy(tlens).long(),
            )
    tmodel.eval()
    ckpt = str(tmp_path / "ptst")
    os.makedirs(ckpt)
    with reference_repo():
        tmodel.save_checkpoint(ckpt)

    model = pp.build_ours()
    variables = model.init(
        jax.random.PRNGKey(0),
        spikes=jnp.asarray(spikes),
        spikes_mask=jnp.asarray(mask),
        spikes_lengths=jnp.asarray(lens),
        targets=jnp.asarray(targets),
        targets_lengths=jnp.asarray(tlens),
        training=False,
    )
    from llm_bci_tpu.interop import patchtst_variables_from_torch

    variables = patchtst_variables_from_torch(ckpt, variables)
    # the burned-in running stats actually arrived
    bn = variables["batch_stats"]["encoder"]["layer_0"]["norm1"]["bn"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)

    with torch.no_grad():
        tout = tmodel(
            spikes=torch.from_numpy(spikes),
            spikes_mask=torch.from_numpy(mask).long(),
            spikes_lengths=torch.from_numpy(lens).long(),
            targets=torch.from_numpy(targets).long(),
            targets_lengths=torch.from_numpy(tlens).long(),
        )
    jout = model.apply(
        variables,
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


def test_bci_torch_checkpoint_roundtrip(tmp_path):
    import test_torch_parity_bci as pb

    ref, _llm_dir = pb.build_reference(tmp_path)
    ckpt = str(tmp_path / "bci_ckpt")
    with reference_repo():
        ref.save_checkpoint(ckpt)  # llm save_pretrained + ndt1 bins + projector

    ours = pb.build_ours()
    batch = pb.make_batch()
    params = ours.init(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(v) for k, v in batch.items()},
        training=False,
    )["params"]
    params = jax.tree_util.tree_map(np.array, jax.device_get(params))
    params = ours.load_checkpoint_params(ckpt, params)

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


# ------------------------------------------------------- peft LoRA import ----


def test_peft_lora_adapter_import_logits_parity(tmp_path):
    """A peft LoRA adapter (the reference's fine-tune artifact,
    configs/trainer_bci.yaml:54-59) grafts onto our Llama and reproduces
    the peft model's logits. LoRA B factors are randomized first — peft
    zero-inits them, which would make the check vacuous."""
    peft = pytest.importorskip("peft")
    from test_hf_llama_import import make_hf_checkpoint

    from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM, load_hf_llama_params

    out_dir, hf = make_hf_checkpoint(tmp_path, n_heads=4, n_kv=4)
    lora_cfg = peft.LoraConfig(
        r=4,
        lora_alpha=16,
        lora_dropout=0.0,
        target_modules=[
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ],
        inference_mode=False,
    )
    pmodel = peft.get_peft_model(hf, lora_cfg)
    torch.manual_seed(3)
    with torch.no_grad():
        for name, p in pmodel.named_parameters():
            if "lora_" in name:
                p.normal_(0.0, 0.2)
    pmodel = pmodel.eval()
    adapter_dir = str(tmp_path / "adapter")
    pmodel.save_pretrained(adapter_dir)

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    model = LlamaForCausalLM(
        cfg,
        lora_r=4,
        lora_alpha=16.0,
        lora_targets=(
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ),
        dtype=jnp.float32,
    )
    ids = np.arange(20, dtype=np.int32).reshape(2, 10) % 128
    mask = np.ones_like(ids)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )["params"]
    params = jax.tree_util.tree_map(np.array, jax.device_get(params))

    from llm_bci_tpu.interop import lora_params_from_peft_adapter
    from llm_bci_tpu.interop.torch_import import _merge_into

    _merge_into(params, load_hf_llama_params(out_dir, cfg), "llm")
    adapter_file = next(
        os.path.join(adapter_dir, f)
        for f in os.listdir(adapter_dir)
        if f.startswith("adapter_model.")
    )
    lora_params_from_peft_adapter(adapter_file, params)

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


def test_peft_adapter_config_alpha_mismatch_raises(tmp_path):
    """The LoRA scaling (alpha/r) is config, not a weight: importing an
    adapter trained under a different lora_alpha would silently mis-scale
    every delta, so adapter_config.json is validated against the live
    model's values before any weight is read."""
    import json

    import pytest

    from llm_bci_tpu.interop import lora_params_from_peft_adapter

    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16.0}, f)
    adapter = str(tmp_path / "adapter_model.safetensors")

    with pytest.raises(ValueError, match="lora_alpha=16"):
        lora_params_from_peft_adapter(adapter, {}, expect_r=8, expect_alpha=32.0)
    with pytest.raises(ValueError, match="r=8"):
        lora_params_from_peft_adapter(adapter, {}, expect_r=4, expect_alpha=16.0)

    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16.0, "use_rslora": True}, f)
    with pytest.raises(ValueError, match="rslora"):
        lora_params_from_peft_adapter(adapter, {}, expect_r=8, expect_alpha=16.0)
