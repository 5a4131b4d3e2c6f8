"""Export trained checkpoints TO the reference (PyTorch) formats.

The inverse of :mod:`llm_bci_tpu.interop.torch_import`: given a param
tree trained here, write the component ``.bin`` state dicts (plus the
torch-pickled component configs) exactly as the reference's
``save_checkpoint`` methods lay them out, so the upstream code — or any
torch serving stack built on it — loads the weights with a strict
``load_state_dict``:

* NDT1          — ``encoder.bin`` + ``decoder.bin`` + ``encoder_config.pth``
                  (``/root/reference/models/ndt1.py:685-692``)
* iTransformer  — + ``decoder_config.pth``
                  (``/root/reference/models/itransformer.py:403-411``)
* PatchTST      — ``encoder.bin`` = an HF ``PatchTSTModel`` state dict
                  incl. BatchNorm running stats from ``batch_stats``
                  (``/root/reference/models/patchtst.py:258-266``)
* BCI           — NDT1 bins + ``projector.bin``/``projector_config.pth`` +
                  the LLM as a full HF Llama ``save_pretrained`` dir and,
                  when LoRA factors are present, a peft
                  ``adapter_model.safetensors`` + ``adapter_config.json``
                  (``/root/reference/models/bci.py:250-264``)

Everything is host-side numpy→torch; tensors are emitted float32 (the
reference trains fp32 / force-casts its LLM itself). Strictness matches
the importer: a param-tree leaf that the target layout has no slot for
raises rather than being dropped.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "ndt1_save_reference_checkpoint",
    "itransformer_save_reference_checkpoint",
    "patchtst_save_reference_checkpoint",
    "bci_save_reference_checkpoint",
    "hf_llama_state_dict",
    "save_hf_llama",
    "save_peft_adapter",
]


def _np(x: Any) -> np.ndarray:
    import jax

    return np.asarray(jax.device_get(x), dtype=np.float32)


class _Emit:
    """Collects a torch state dict from our numpy param subtrees."""

    def __init__(self, what: str):
        self.sd: Dict[str, np.ndarray] = {}
        self.what = what

    def put(self, key: str, value: Any) -> None:
        if key in self.sd:
            raise ValueError(f"{self.what}: duplicate export key {key!r}")
        self.sd[key] = _np(value)

    def lin(self, src: Dict, prefix: str) -> None:
        """flax ``Dense`` → torch ``nn.Linear`` (kernel transposed)."""
        self.put(prefix + ".weight", np.asarray(_np(src["kernel"])).T)
        if "bias" in src:
            self.put(prefix + ".bias", src["bias"])

    def norm(self, src: Dict, prefix: str) -> None:
        self.put(prefix + ".weight", src["scale"])
        self.put(prefix + ".bias", src["bias"])

    def torch_sd(self) -> Dict:
        import torch

        # copy=True: jax.device_get can hand back read-only buffers, which
        # torch.from_numpy warns about
        return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in self.sd.items()}


def _torch_save(obj: Any, path: str) -> None:
    import torch

    torch.save(obj, path)


def _plain_config(cfg: Any, strip: Tuple[str, ...] = ()) -> Dict:
    """Deep-copy a config dict, dropping our beyond-reference keys (and
    ``from_pt`` — a stale path inside a saved config would make the
    reference try to re-load from it, reference ``models/ndt1.py:468``)."""
    drop = set(strip) | {"from_pt", "compute_dtype", "flash_attention", "remat"}

    def walk(x):
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items() if k not in drop}
        if isinstance(x, (list, tuple)):
            return [walk(v) for v in x]
        return x

    return walk(dict(cfg))


# --------------------------------------------------------------------------
# NDT1
# --------------------------------------------------------------------------


def _emit_ndt1_encoder(enc: Dict, what: str = "NDT1 encoder") -> _Emit:
    e = _Emit(what)
    emb = enc["embedder"]
    if "embed_spikes" in emb:
        e.lin(emb["embed_spikes"], "embedder.embed_spikes")
    elif "embed_spikes_days" in emb:
        # stacked (n_days, n_channels, input_dim) einsum weights → the
        # reference's per-day nn.Linear ModuleList (models/ndt1.py:123-130)
        w = _np(emb["embed_spikes_days"])
        for d in range(w.shape[0]):
            e.put(f"embedder.embed_spikes.{d}.weight", w[d].T)
        if "embed_spikes_days_bias" in emb:
            b = _np(emb["embed_spikes_days_bias"])
            for d in range(b.shape[0]):
                e.put(f"embedder.embed_spikes.{d}.bias", b[d])
    else:
        raise ValueError(f"{what}: no spike-embedding leaves in the param tree")
    if "stack_projection" in emb:
        e.lin(emb["stack_projection"], "embedder.stack_projection")
    if "projection" in emb:
        e.lin(emb["projection"], "embedder.projection")
    if "embed_pos" in emb:
        e.put("embedder.embed_pos.weight", emb["embed_pos"])
    if "block_embedding" in emb:
        e.put("embedder.block_embedding.weight", emb["block_embedding"])
    if "day_embedding" in emb:
        e.put("embedder.day_embedding.weight", emb["day_embedding"])

    i = 0
    while f"layer_{i}" in enc:
        src = enc[f"layer_{i}"]
        dst = f"layers.{i}"
        for name in ("query", "key", "value", "out_proj"):
            e.lin(src["attn"][name], f"{dst}.attn.{name}")
        for name in ("up_proj", "down_proj"):
            e.lin(src["mlp"][name], f"{dst}.mlp.{name}")
        e.norm(src["ln1"], f"{dst}.ln1")
        e.norm(src["ln2"], f"{dst}.ln2")
        i += 1
    e.norm(enc["out_norm"], "out_norm")
    if "out_proj" in enc and isinstance(enc["out_proj"], dict) and "proj" in enc["out_proj"]:
        e.lin(enc["out_proj"]["proj"], "out_proj.proj.0")
    return e


def ndt1_save_reference_checkpoint(params: Dict, config: Dict, save_dir: str) -> None:
    """Our NDT1 param tree + model config → a reference-format checkpoint
    dir the upstream ``NDT1(..., from_pt=dir)`` loads strictly
    (``/root/reference/models/ndt1.py:468-505,685-692``)."""
    os.makedirs(save_dir, exist_ok=True)
    e = _emit_ndt1_encoder(params["encoder"])
    _torch_save(e.torch_sd(), os.path.join(save_dir, "encoder.bin"))

    if "decoder" in params:
        d = _Emit("NDT1 decoder")
        d.lin(params["decoder"], "0")  # Sequential(Linear, LogSoftmax/ReLU…)
        _torch_save(d.torch_sd(), os.path.join(save_dir, "decoder.bin"))

    _torch_save(
        _plain_config(config["encoder"]),
        os.path.join(save_dir, "encoder_config.pth"),
    )


# --------------------------------------------------------------------------
# iTransformer
# --------------------------------------------------------------------------


def _emit_torch_encoder_stack(e: _Emit, src: Dict, dst: str) -> None:
    """our ``TorchEncoderStack`` → torch ``nn.TransformerEncoder``."""
    i = 0
    while f"layer_{i}" in src:
        s = src[f"layer_{i}"]
        p = f"{dst}.layers.{i}"
        e.put(f"{p}.self_attn.in_proj_weight", _np(s["attn"]["qkv"]["kernel"]).T)
        e.put(f"{p}.self_attn.in_proj_bias", s["attn"]["qkv"]["bias"])
        e.lin(s["attn"]["out_proj"], f"{p}.self_attn.out_proj")
        e.lin(s["linear1"], f"{p}.linear1")
        e.lin(s["linear2"], f"{p}.linear2")
        e.norm(s["norm1"], f"{p}.norm1")
        e.norm(s["norm2"], f"{p}.norm2")
        i += 1
    e.norm(src["norm"], f"{dst}.norm")


def itransformer_save_reference_checkpoint(
    params: Dict,
    config: Dict,
    save_dir: str,
    method_name: str = "ctc",
) -> None:
    """Our iTransformer param tree → reference checkpoint dir
    (``/root/reference/models/itransformer.py:403-411``). ``method_name``
    fixes the decoder ``nn.Sequential`` index layout (AverageTokens is
    prepended for non-CLS ctc/behaviour heads,
    ``/root/reference/models/itransformer.py:264-279``)."""
    os.makedirs(save_dir, exist_ok=True)
    enc = params["encoder"]
    e = _Emit("iTransformer encoder")

    if "embed_mlp" in enc:  # embedder mode "mlp"
        # torchvision MLP([h, h]) = Sequential(Linear, act, Dropout,
        # Linear, Dropout) inside embed.0; embed.1 = LayerNorm
        # (reference models/itransformer.py:108-118).
        e.lin(enc["embed_mlp"]["dense_0"], "embed.0.0")
        e.lin(enc["embed_mlp"]["dense_1"], "embed.0.3")
        e.norm(enc["embed_norm"], "embed.1")
    elif "embed_univariate" in enc:  # embedder mode "transformer"
        u = enc["embed_univariate"]
        e.lin(u["embed_in"], "embed.embed_spikes.0")
        e.lin(u["embed_out"], "embed.embed_spikes.2")
        e.put("embed.embed_pos.weight", u["embed_pos"])
        e.put("embed.cls_embed.weight", u["cls_embed"])
        _emit_torch_encoder_stack(e, u["transformer"], "embed.transformer")
        e.lin(enc["embed_proj"], "embed_proj.0")
        e.norm(enc["embed_proj_norm"], "embed_proj.1")
    else:
        raise ValueError("iTransformer: unknown embedder layout in params")

    if "channel_embeddings" in enc:
        e.put("channel_embeddings.0.weight", enc["channel_embeddings"])
        e.norm(enc["channel_norm"], "channel_embeddings.1")
    if "region_embeddings" in enc:
        e.put("region_embeddings.0.weight", enc["region_embeddings"])
        e.norm(enc["region_norm"], "region_embeddings.1")
    if "depth_in" in enc:
        e.lin(enc["depth_in"], "depth_embeddings.0")
        e.lin(enc["depth_out"], "depth_embeddings.2")
        e.norm(enc["depth_norm"], "depth_embeddings.3")
    if "cls_embed" in enc:
        e.put("cls_embed.weight", enc["cls_embed"])
    _emit_torch_encoder_stack(e, enc["transformer"], "transformer")
    _torch_save(e.torch_sd(), os.path.join(save_dir, "encoder.bin"))

    # decoder Sequential index layout (reference models/itransformer.py:264-279)
    use_cls = bool(config["decoder"]["use_cls"])
    off = (
        1
        if method_name in ("ctc", "dyn_behaviour", "stat_behaviour") and not use_cls
        else 0
    )
    d = _Emit("iTransformer decoder")
    if "decoder_hidden" in params:
        d.lin(params["decoder_hidden"], str(off))
        d.lin(params["decoder_out"], str(off + 2))
    else:
        d.lin(params["decoder_out"], str(off))
    _torch_save(d.torch_sd(), os.path.join(save_dir, "decoder.bin"))

    _torch_save(
        _plain_config(config["encoder"]),
        os.path.join(save_dir, "encoder_config.pth"),
    )
    _torch_save(
        _plain_config(config["decoder"]),
        os.path.join(save_dir, "decoder_config.pth"),
    )


# --------------------------------------------------------------------------
# PatchTST
# --------------------------------------------------------------------------


def patchtst_save_reference_checkpoint(
    variables: Dict, config: Dict, save_dir: str
) -> None:
    """Our PatchTST variables (params + batch_stats) → reference checkpoint
    dir whose ``encoder.bin`` is a strict HF ``PatchTSTModel`` state dict
    (``/root/reference/models/patchtst.py:258-266``). The constant sincos
    table exports as HF's ``position_enc`` parameter; BatchNorm running
    stats come from ``batch_stats`` (zeros/ones init when absent)."""
    import torch

    os.makedirs(save_dir, exist_ok=True)
    p = variables["params"]
    bs = variables.get("batch_stats")
    enc = p["encoder"]
    ebs = bs["encoder"] if bs is not None else None
    e = _Emit("PatchTST encoder")

    e.lin(enc["patch_embed"], "encoder.embedder.input_embedding")
    i = 0
    while f"layer_{i}" in enc:
        s = enc[f"layer_{i}"]
        dst = f"encoder.layers.{i}"
        qkv_w = _np(s["qkv"]["kernel"]).T  # (3H, H) rows = q,k,v stacked
        qkv_b = _np(s["qkv"]["bias"])
        H = qkv_w.shape[0] // 3
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            e.put(f"{dst}.self_attn.{name}.weight", qkv_w[j * H : (j + 1) * H])
            e.put(f"{dst}.self_attn.{name}.bias", qkv_b[j * H : (j + 1) * H])
        e.lin(s["attn_out"], f"{dst}.self_attn.out_proj")
        e.lin(s["ff1"], f"{dst}.ff.0")
        e.lin(s["ff2"], f"{dst}.ff.3")
        for ours, hf in (("norm1", "norm_sublayer1"), ("norm2", "norm_sublayer3")):
            if "bn" in s[ours]:
                e.put(f"{dst}.{hf}.batchnorm.weight", s[ours]["bn"]["scale"])
                e.put(f"{dst}.{hf}.batchnorm.bias", s[ours]["bn"]["bias"])
                if ebs is not None:
                    nbs = ebs[f"layer_{i}"][ours]["bn"]
                    mean, var = nbs["mean"], nbs["var"]
                else:
                    n = _np(s[ours]["bn"]["scale"]).shape[0]
                    mean, var = np.zeros(n, np.float32), np.ones(n, np.float32)
                e.put(f"{dst}.{hf}.batchnorm.running_mean", mean)
                e.put(f"{dst}.{hf}.batchnorm.running_var", var)
                self_key = f"{dst}.{hf}.batchnorm.num_batches_tracked"
                e.sd[self_key] = np.zeros((), np.int64)  # unused at momentum=0.1
            else:
                e.norm(s[ours]["ln"], f"{dst}.{hf}")
        i += 1

    from llm_bci_tpu.models.patchtst import num_patches, sincos_position_encoding

    ecfg = config["encoder"]
    d_model = _np(enc["patch_embed"]["kernel"]).shape[1]
    seq = num_patches(
        int(ecfg["context_length"]),
        int(ecfg["patch_length"]),
        int(ecfg["patch_stride"]),
    ) + int(bool(ecfg.get("use_cls_token", False)))
    e.put(
        "encoder.positional_encoder.position_enc",
        np.asarray(sincos_position_encoding(seq, d_model)),
    )

    sd = e.torch_sd()
    sd["encoder.positional_encoder.position_enc"] = sd[
        "encoder.positional_encoder.position_enc"
    ].float()
    # num_batches_tracked must stay int64
    for k in list(sd):
        if k.endswith("num_batches_tracked"):
            sd[k] = torch.zeros((), dtype=torch.int64)
    _torch_save(sd, os.path.join(save_dir, "encoder.bin"))

    dec = p["decoder"]
    d = _Emit("PatchTST decoder")
    if "proj_out_w" in dec:  # per-channel heads → torch ModuleList
        w = _np(dec["proj_out_w"])
        b = _np(dec["proj_out_b"])
        if "proj_hidden_w" in dec:
            hw, hb = _np(dec["proj_hidden_w"]), _np(dec["proj_hidden_b"])
            for c in range(w.shape[0]):
                d.put(f"projections.{c}.0.weight", hw[c].T)
                d.put(f"projections.{c}.0.bias", hb[c])
                d.put(f"projections.{c}.2.weight", w[c].T)
                d.put(f"projections.{c}.2.bias", b[c])
        else:
            for c in range(w.shape[0]):
                d.put(f"projections.{c}.weight", w[c].T)
                d.put(f"projections.{c}.bias", b[c])
    elif "proj_hidden" in dec:
        d.lin(dec["proj_hidden"], "projection.0")
        d.lin(dec["proj_out"], "projection.2")
    else:
        d.lin(dec["proj_out"], "projection")
    _torch_save(d.torch_sd(), os.path.join(save_dir, "decoder.bin"))

    # the reference torch.saves its configs under .yaml names
    # (models/patchtst.py:260-262) — match it so its load path works
    _torch_save(
        _plain_config(config["encoder"]),
        os.path.join(save_dir, "encoder_config.yaml"),
    )
    _torch_save(
        _plain_config(config["decoder"]),
        os.path.join(save_dir, "decoder_config.yaml"),
    )


# --------------------------------------------------------------------------
# Llama → HF / peft
# --------------------------------------------------------------------------


def hf_llama_state_dict(llm_params: Dict, tie_word_embeddings: bool = False) -> Dict:
    """Our Llama param tree (base weights only) → an HF
    ``LlamaForCausalLM`` torch state dict (inverse of
    ``models/llama.py:load_hf_llama_params``). LoRA factors and quant
    scales are skipped here — see :func:`save_peft_adapter`; int8 kernels
    raise (dequantize first)."""
    import torch

    def t(x):
        arr = np.asarray(x)
        if arr.dtype == np.int8:
            raise ValueError(
                "hf_llama_state_dict: int8-quantized kernel — export needs the "
                "bf16/f32 tree (dequantize_int8 / re-import the HF base first)"
            )
        return torch.from_numpy(np.array(_np(arr), copy=True))

    sd = {
        "model.embed_tokens.weight": t(llm_params["embed_tokens"]["embedding"]),
        "model.norm.weight": t(llm_params["norm"]["weight"]),
    }
    if not tie_word_embeddings:
        sd["lm_head.weight"] = t(_np(llm_params["lm_head"]["kernel"]).T)
    i = 0
    while f"layers_{i}" in llm_params:
        lp = llm_params[f"layers_{i}"]
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = t(lp["input_layernorm"]["weight"])
        sd[p + "post_attention_layernorm.weight"] = t(
            lp["post_attention_layernorm"]["weight"]
        )
        for blk, names in (
            ("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
            ("mlp", ("gate_proj", "up_proj", "down_proj")),
        ):
            for name in names:
                sd[p + f"{blk}.{name}.weight"] = t(_np(lp[blk][name]["kernel"]).T)
        i += 1
    return sd


def save_hf_llama(llm_params: Dict, llama_config, save_dir: str) -> None:
    """Write a full HF Llama checkpoint dir (config.json + safetensors)
    from our param tree via a live ``transformers`` model, so the result
    is loadable by ``AutoModelForCausalLM.from_pretrained`` — the
    reference BCI's LLM restore path (``/root/reference/models/bci.py:262``)."""
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    cfg = HFConfig(
        vocab_size=llama_config.vocab_size,
        hidden_size=llama_config.hidden_size,
        intermediate_size=llama_config.intermediate_size,
        num_hidden_layers=llama_config.num_hidden_layers,
        num_attention_heads=llama_config.num_attention_heads,
        num_key_value_heads=llama_config.num_key_value_heads,
        max_position_embeddings=llama_config.max_position_embeddings,
        rms_norm_eps=llama_config.rms_norm_eps,
        rope_theta=llama_config.rope_theta,
        tie_word_embeddings=llama_config.tie_word_embeddings,
    )
    with torch.device("meta"):
        hf = HFLlama(cfg)
    tie = bool(llama_config.tie_word_embeddings)
    sd = hf_llama_state_dict(llm_params, tie)
    if tie:
        # Tied models expose lm_head.weight in their state dict even though
        # it is the embedding tensor: a strict load would demand the key,
        # and assign=True would UNtie the weights if we supplied a copy.
        # Load everything else, then re-tie the head onto the assigned
        # embedding table.
        missing, unexpected = hf.load_state_dict(sd, strict=False, assign=True)
        if unexpected or set(missing) - {"lm_head.weight"}:
            raise ValueError(
                f"save_hf_llama: unexpected={unexpected} "
                f"missing={sorted(set(missing) - {'lm_head.weight'})}"
            )
        hf.tie_weights()
    else:
        hf.load_state_dict(sd, strict=True, assign=True)
    hf.save_pretrained(save_dir)


_PEFT_BLOCKS = {
    "q_proj": "self_attn", "k_proj": "self_attn", "v_proj": "self_attn",
    "o_proj": "self_attn",
    "gate_proj": "mlp", "up_proj": "mlp", "down_proj": "mlp",
}


def save_peft_adapter(
    llm_params: Dict, save_dir: str, lora_alpha: Optional[float] = None
) -> int:
    """Write the LoRA factors of our Llama tree as a peft adapter dir
    (``adapter_model.safetensors`` + ``adapter_config.json``) that
    ``peft.PeftModel.from_pretrained`` loads onto the HF base. peft stores
    (r, in)/(out, r) — ours are the transposes. Returns the number of
    adapted projections (0 = nothing written).

    ``lora_alpha`` must be the alpha the model was TRAINED with
    (``model.lora_alpha`` / ``method.model_kwargs.lora.alpha``): peft scales
    deltas by alpha/r from ``adapter_config.json``, so recording a guess
    would silently mis-scale every adapter on the torch side. It is not a
    weight, so it cannot be derived from the param tree — hence required
    whenever the tree actually carries factors."""
    tensors: Dict[str, np.ndarray] = {}
    targets = set()
    ranks = set()
    i = 0
    while f"layers_{i}" in llm_params:
        lp = llm_params[f"layers_{i}"]
        for proj, blk in _PEFT_BLOCKS.items():
            node = lp[blk].get(proj, {})
            if "lora_A" not in node:
                continue
            a = _np(node["lora_A"])  # ours (in, r)
            b = _np(node["lora_B"])  # ours (r, out)
            base = f"base_model.model.model.layers.{i}.{blk}.{proj}"
            tensors[f"{base}.lora_A.weight"] = np.ascontiguousarray(a.T)
            tensors[f"{base}.lora_B.weight"] = np.ascontiguousarray(b.T)
            targets.add(proj)
            ranks.add(int(a.shape[1]))
        i += 1
    if not tensors:
        return 0
    if lora_alpha is None:
        raise ValueError(
            "save_peft_adapter: the param tree carries LoRA factors but no "
            "lora_alpha was given — pass the alpha the model was trained "
            "with (model.lora_alpha / method.model_kwargs.lora.alpha); "
            "adapter_config.json must record it for peft to scale correctly"
        )
    if len(ranks) != 1:
        raise ValueError(
            f"save_peft_adapter: projections have differing LoRA ranks "
            f"{sorted(ranks)} — a peft adapter_config records one r"
        )
    r = ranks.pop()
    os.makedirs(save_dir, exist_ok=True)
    from safetensors.numpy import save_file

    save_file(tensors, os.path.join(save_dir, "adapter_model.safetensors"))
    adapter_cfg = {
        "peft_type": "LORA",
        "task_type": "CAUSAL_LM",
        "r": int(r),
        "lora_alpha": float(lora_alpha),
        "lora_dropout": 0.0,
        "target_modules": sorted(targets),
        "bias": "none",
        "fan_in_fan_out": False,
        "inference_mode": True,
    }
    with open(os.path.join(save_dir, "adapter_config.json"), "w") as f:
        json.dump(adapter_cfg, f, indent=2)
    return len(tensors) // 2


# --------------------------------------------------------------------------
# BCI
# --------------------------------------------------------------------------


def bci_save_reference_checkpoint(
    params: Dict,
    config: Dict,
    save_dir: str,
    llama_config=None,
    lora_alpha: Optional[float] = None,
    vocab_size: Optional[int] = None,
) -> None:
    """Our BCI param tree → reference BCI checkpoint dir
    (``/root/reference/models/bci.py:250-264``): inner-NDT1 ``encoder.bin``
    (+ a zero-initialized vestigial ``decoder.bin`` — the reference
    constructs that head but its BCI forward never calls it,
    ``/root/reference/models/bci.py:125``), ``projector.bin`` +
    ``projector_config.pth``, the LLM base as HF weights, and the LoRA
    factors (if any) as a peft adapter in the same dir."""
    import torch

    os.makedirs(save_dir, exist_ok=True)

    e = _emit_ndt1_encoder(params["ndt1_encoder"], "BCI ndt1 encoder")
    _torch_save(e.torch_sd(), os.path.join(save_dir, "encoder.bin"))
    _torch_save(
        _plain_config(config["ndt1"]["encoder"]),
        os.path.join(save_dir, "encoder_config.pth"),
    )

    # vestigial CTC head: Linear(out_size, vocab) zeros — shape from config
    enc_cfg = config["ndt1"]["encoder"]
    out_size = (
        enc_cfg["factors"]["size"]
        if enc_cfg.get("factors", {}).get("active")
        else enc_cfg["transformer"]["hidden_size"]
    )
    vs = int(vocab_size or 41)
    _torch_save(
        {
            "0.weight": torch.zeros(vs, out_size),
            "0.bias": torch.zeros(vs),
        },
        os.path.join(save_dir, "decoder.bin"),
    )

    gp = _Emit("projector")
    if "projector_in" in params:
        gp.lin(params["projector_in"], "0")
        gp.lin(params["projector_out"], "2")
    else:
        gp.lin(params["projector_out"], "")
        # single nn.Linear keys are bare "weight"/"bias"
        gp.sd = {k.lstrip("."): v for k, v in gp.sd.items()}
    _torch_save(gp.torch_sd(), os.path.join(save_dir, "projector.bin"))
    _torch_save(
        _plain_config(config["projector"]),
        os.path.join(save_dir, "projector_config.pth"),
    )

    if llama_config is not None:
        save_hf_llama(params["llm"], llama_config, save_dir)
        save_peft_adapter(params["llm"], save_dir, lora_alpha=lora_alpha)
