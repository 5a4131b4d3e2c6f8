"""Whole-model PatchTST parity vs the PyTorch reference.

The reference wraps HF ``PatchTSTModel`` (``/root/reference/models/patchtst.py``
``:159-266``); our flax implementation rebuilds patchify / positional
encoding / batchnorm encoder / heads from scratch. Here the ACTUAL reference
module (driven from /root/reference with transformers' PatchTST) gets its
weights copied into ours and full CTC forward losses must agree at fp32
tolerance in eval mode (mlm full-forward parity is blocked by HF applying
random patch masking with torch RNG even in eval — its PretrainHead is
parity-checked at head level instead)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_torch_parity_fullmodel import reference_repo

B, T, C, PL, PS, D, NH, FF, NL, VOCAB = 2, 20, 4, 5, 5, 16, 2, 32, 2, 7


def encoder_cfg(scaling=None):
    return {
        "num_input_channels": C, "context_length": T,
        "patch_length": PL, "patch_stride": PS,
        "num_hidden_layers": NL, "d_model": D, "num_attention_heads": NH,
        "share_embedding": True, "channel_attention": False, "ffn_dim": FF,
        "norm_type": "batchnorm", "norm_eps": 1e-5,
        "attention_dropout": 0.0, "positional_dropout": 0.0,
        "path_dropout": 0.0, "ff_dropout": 0.0, "bias": True,
        "activation_function": "gelu", "pre_norm": True,
        "positional_encoding_type": "sincos", "init_std": 0.02,
        "scaling": scaling, "do_mask_input": False, "mask_type": "random",
        "random_mask_ratio": 0.1, "channel_consistent_masking": False,
        "mask_value": 0,
    }


DECODER_CFG = {
    "share_projection": True, "pooling_type": "mean", "head_dropout": 0.0,
    "mlp_decoder": False, "mlp_activation": "gelu",
}


def build_reference(scaling=None):
    torch.manual_seed(0)
    with reference_repo():
        from models.patchtst import PatchTSTForSpikingActivity as TorchPatchTST
        from utils.config_utils import DictConfig as RefDictConfig

        model = TorchPatchTST(
            RefDictConfig({"encoder": encoder_cfg(scaling), "decoder": dict(DECODER_CFG)}),
            method_name="ctc", vocab_size=VOCAB, blank_id=0, zero_infinity=True,
        )
    model.eval()
    return model


def build_ours(scaling=None):
    from llm_bci_tpu.models.patchtst import PatchTSTForSpikingActivity

    return PatchTSTForSpikingActivity.from_config(
        {"encoder": encoder_cfg(scaling), "decoder": dict(DECODER_CFG)},
        method_name="ctc", vocab_size=VOCAB, blank_id=0, zero_infinity=True,
    )


def copy_weights(tmodel, variables):
    """HF PatchTSTModel + PredictHead state_dict -> our flax variables
    (params AND batch_stats — eval batchnorm uses running stats)."""
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    v = jax.tree_util.tree_map(np.array, jax.device_get(variables))
    p, bs = v["params"], v["batch_stats"]

    enc = p["encoder"]
    enc["patch_embed"]["kernel"] = sd["encoder.encoder.embedder.input_embedding.weight"].T
    enc["patch_embed"]["bias"] = sd["encoder.encoder.embedder.input_embedding.bias"]

    for i in range(NL):
        dst = enc[f"layer_{i}"]
        src = f"encoder.encoder.layers.{i}"
        qkv_w = np.concatenate(
            [sd[f"{src}.self_attn.{n}.weight"].T for n in ("q_proj", "k_proj", "v_proj")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [sd[f"{src}.self_attn.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj")]
        )
        dst["qkv"]["kernel"] = qkv_w
        dst["qkv"]["bias"] = qkv_b
        dst["attn_out"]["kernel"] = sd[f"{src}.self_attn.out_proj.weight"].T
        dst["attn_out"]["bias"] = sd[f"{src}.self_attn.out_proj.bias"]
        dst["ff1"]["kernel"] = sd[f"{src}.ff.0.weight"].T
        dst["ff1"]["bias"] = sd[f"{src}.ff.0.bias"]
        dst["ff2"]["kernel"] = sd[f"{src}.ff.3.weight"].T
        dst["ff2"]["bias"] = sd[f"{src}.ff.3.bias"]
        for ours_norm, hf_norm in (("norm1", "norm_sublayer1"), ("norm2", "norm_sublayer3")):
            dst[ours_norm]["bn"]["scale"] = sd[f"{src}.{hf_norm}.batchnorm.weight"]
            dst[ours_norm]["bn"]["bias"] = sd[f"{src}.{hf_norm}.batchnorm.bias"]
            nbs = bs["encoder"][f"layer_{i}"][ours_norm]["bn"]
            nbs["mean"] = sd[f"{src}.{hf_norm}.batchnorm.running_mean"]
            nbs["var"] = sd[f"{src}.{hf_norm}.batchnorm.running_var"]

    p["decoder"]["proj_out"]["kernel"] = sd["decoder.projection.weight"].T
    p["decoder"]["proj_out"]["bias"] = sd["decoder.projection.bias"]
    return {"params": p, "batch_stats": bs}


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    lens = np.array([T, T - 3], np.int32)
    spikes = rng.poisson(1.0, size=(B, T, C)).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    tlens = np.array([3, 2], np.int32)
    targets = rng.integers(1, VOCAB, size=(B, 4)).astype(np.int32)
    return spikes, mask, lens, targets, tlens


@pytest.mark.parametrize("scaling", [None, "std"])
def test_patchtst_ctc_full_forward_parity(scaling):
    ref = build_reference(scaling)
    ours = build_ours(scaling)
    spikes, mask, lens, targets, tlens = make_batch()

    variables = ours.init(
        jax.random.PRNGKey(0),
        spikes=spikes, spikes_mask=mask, spikes_lengths=lens,
        targets=targets, targets_lengths=tlens, training=False,
    )
    variables = copy_weights(ref, variables)

    with torch.no_grad():
        tout = ref(
            spikes=torch.from_numpy(spikes),
            spikes_mask=torch.from_numpy(mask).long(),
            spikes_lengths=torch.from_numpy(lens).long(),
            targets=torch.from_numpy(targets).long(),
            targets_lengths=torch.from_numpy(tlens).long(),
        )

    jout = ours.apply(
        variables,
        spikes=spikes, spikes_mask=mask, spikes_lengths=lens,
        targets=targets, targets_lengths=tlens, training=False,
    )
    np.testing.assert_allclose(
        np.asarray(jout.preds), tout.preds.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(jout.loss), float(tout.loss), rtol=1e-4, atol=1e-4
    )


def test_patchtst_pretrain_head_parity():
    """PretrainHead (mlm reconstruction) at head level: same embedding in,
    same per-patch reconstruction out (shared projection; relu for
    log_input=False count outputs)."""
    with reference_repo():
        from models.patchtst import PretrainHead as TorchHead
        from utils.config_utils import DictConfig as RefDictConfig

        torch.manual_seed(1)
        thead = TorchHead(
            RefDictConfig(dict(DECODER_CFG)), C, D, PL, log_input=False
        ).eval()

    from llm_bci_tpu.models.patchtst import PretrainHead

    jhead = PretrainHead(
        config=dict(DECODER_CFG), num_input_channels=C, d_model=D,
        patch_length=PL, log_input=False,
    )
    P = 1 + (T - PL) // PS
    emb = np.random.default_rng(2).normal(size=(B, C, P, D)).astype(np.float32)
    params = jhead.init(jax.random.PRNGKey(0), jnp.asarray(emb), training=False)
    params = jax.tree_util.tree_map(np.array, jax.device_get(params))
    sd = {k: v.detach().numpy() for k, v in thead.state_dict().items()}
    params["params"]["proj_out"]["kernel"] = sd["projection.weight"].T
    params["params"]["proj_out"]["bias"] = sd["projection.bias"]

    with torch.no_grad():
        tref = thead(torch.from_numpy(emb)).numpy()
    jout = np.asarray(jhead.apply(params, jnp.asarray(emb), training=False))
    np.testing.assert_allclose(jout, tref, rtol=1e-5, atol=1e-5)
