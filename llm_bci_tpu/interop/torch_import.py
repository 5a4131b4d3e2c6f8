"""Import reference (PyTorch) checkpoints into this framework's param trees.

The reference saves per-component torch state dicts:

* NDT1          — ``encoder.bin`` + ``decoder.bin``
                  (``/root/reference/models/ndt1.py:685-692``)
* iTransformer  — ``encoder.bin`` + ``decoder.bin``
                  (``/root/reference/models/itransformer.py:403-411``)
* PatchTST      — ``encoder.bin`` (an HF ``PatchTSTModel`` state dict) +
                  ``decoder.bin`` (``/root/reference/models/patchtst.py:258-266``)
* BCI           — ``llm.save_pretrained`` output (full HF weights, or a peft
                  LoRA ``adapter_model.*``) + the inner NDT1's bins +
                  ``projector.bin`` (``/root/reference/models/bci.py:250-264``)

These importers graft those weights into param trees produced by
``model.init`` on OUR models, so a user migrating from the reference can
keep trained checkpoints: point ``from_pt:`` (or ``load_ndt1_from_pt``)
at a reference checkpoint directory and the model-level
``load_checkpoint_params`` routes here automatically when it finds
``encoder.bin`` instead of ``encoder.msgpack``.

Every importer is strict: grafted leaves are shape-checked against the
template tree, and any reference key that is neither consumed nor on a
documented ignore list raises — silent drops are how migrations rot.
torch is imported lazily (host-side only; the result is a numpy pytree).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "is_torch_checkpoint",
    "load_saved_component_config",
    "ndt1_params_from_torch",
    "ndt1_encoder_params_from_torch",
    "itransformer_params_from_torch",
    "patchtst_variables_from_torch",
    "bci_params_from_torch",
    "lora_params_from_peft_adapter",
]


def is_torch_checkpoint(load_dir: str, component: str = "encoder") -> bool:
    """True when ``load_dir`` holds a reference-format torch checkpoint for
    ``component`` (a ``{component}.bin`` blob) rather than this framework's
    msgpack. Decoder-only warm starts pass ``component="decoder"`` — the
    dir may carry just that blob (reference ``models/itransformer.py:403-411``)."""
    return os.path.isfile(
        os.path.join(load_dir, f"{component}.bin")
    ) and not os.path.isfile(os.path.join(load_dir, f"{component}.msgpack"))


def _torch_pickled_config(path: str) -> Dict:
    import torch

    try:
        # the reference saves dict(config.<component>) — plain containers
        cfg = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # a save may pickle the DictConfig subclass itself; unpickle it as a
        # plain dict without importing the reference package
        import pickle
        import types

        class _CfgUnpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if name == "DictConfig":
                    return dict
                return super().find_class(module, name)

        shim = types.SimpleNamespace(Unpickler=_CfgUnpickler, load=pickle.load)
        cfg = torch.load(
            path, map_location="cpu", pickle_module=shim, weights_only=False
        )

    def plain(x):
        if isinstance(x, dict):
            return {k: plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [plain(v) for v in x]
        return x

    return plain(cfg)


def load_saved_component_config(load_dir: str, component: str) -> Optional[Dict]:
    """The component config saved next to a checkpoint: ours
    (``{component}_config.yaml``, real yaml) or the reference's
    torch-pickled plain dict — ``{component}_config.pth`` (reference
    ``models/ndt1.py:687``, ``models/bci.py:258``) or a torch pickle the
    reference PatchTST misleadingly names ``*.yaml``
    (``models/patchtst.py:260-262``). Returns None when none exists."""
    ypath = os.path.join(load_dir, f"{component}_config.yaml")
    if os.path.isfile(ypath):
        with open(ypath, "rb") as f:
            head = f.read(2)
        if head == b"PK":  # torch zip save wearing a .yaml name
            return _torch_pickled_config(ypath)
        import yaml

        with open(ypath) as f:
            return yaml.safe_load(f)
    ppath = os.path.join(load_dir, f"{component}_config.pth")
    if os.path.isfile(ppath):
        return _torch_pickled_config(ppath)
    # A missing saved config is legitimate only when there are no trained
    # weights here to mis-match: ``training.component_blobs=false`` STEP
    # dirs carry neither blobs nor component configs (train_state/ has the
    # full state). When the dir DOES hold this component's weights,
    # building from the live/default config is exactly how a structurally
    # different model loads shape-matching weights without any error —
    # hard-fail instead. This applies to the projector too: both the
    # reference (``models/bci.py:257-258`` writes projector.bin AND
    # projector_config.pth) and our own save always pair projector weights
    # with a config, so a bare projector blob is anomalous. (The one
    # config-less artifact the reference produces is NDT1's decoder,
    # ``models/ndt1.py:688`` — no caller requests a 'decoder' config.)
    # NOTE: the probe covers the {component}.bin/.msgpack blobs the four
    # model loaders request; other weight spellings the importer reads
    # elsewhere (peft adapter_model.*, HF pytorch_model*.bin shards for
    # the llm component) never route through this function.
    has_weights = any(
        os.path.isfile(os.path.join(load_dir, f"{component}.{ext}"))
        for ext in ("bin", "msgpack")
    )
    if has_weights:
        raise FileNotFoundError(
            f"from_pt dir {load_dir!r} holds {component} weights but no "
            f"saved '{component}' config ({component}_config.yaml/.pth): "
            "refusing to graft trained weights onto the live/default "
            "config — shape-compatible architecture drift (e.g. a "
            "different n_heads) would load silently wrong. Copy the saved "
            "config next to the weights, or point from_pt at the full "
            "checkpoint dir."
        )
    import warnings

    warnings.warn(
        f"from_pt dir {load_dir!r} has no saved '{component}' config "
        f"({component}_config.yaml/.pth): the {component} config re-merge "
        "is skipped and the model is built from the live/default config. "
        "If this dir came from a checkpoint, copy the saved config next to "
        "the weights (or point from_pt at the full STEP dir).",
        stacklevel=3,
    )
    return None


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


class _Graft:
    """Tracks consumption of a torch state dict while grafting into a
    numpy param tree; raises on shape mismatch and leftover keys."""

    def __init__(self, sd: Dict[str, np.ndarray], what: str):
        self.sd = dict(sd)
        self.what = what
        self.used: set = set()

    def has(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"{self.what}: missing key {key!r} in torch checkpoint")
        self.used.add(key)
        return self.sd[key]

    def put(self, dst: Dict, name: str, value: np.ndarray) -> None:
        if name not in dst:
            raise KeyError(
                f"{self.what}: our param tree has no leaf {name!r} "
                f"(tree keys: {sorted(dst)})"
            )
        tgt = np.shape(dst[name])
        if tuple(tgt) != tuple(np.shape(value)):
            raise ValueError(
                f"{self.what}: shape mismatch for {name!r}: checkpoint "
                f"{np.shape(value)} vs model {tgt} — the reference config "
                "this checkpoint was trained with does not match the model"
            )
        dst[name] = np.ascontiguousarray(value, dtype=np.asarray(dst[name]).dtype)

    def lin(self, dst: Dict, prefix: str) -> None:
        """torch ``nn.Linear`` → flax ``Dense``: weight transposed."""
        self.put(dst, "kernel", self.take(prefix + ".weight").T)
        if self.has(prefix + ".bias"):
            self.put(dst, "bias", self.take(prefix + ".bias"))

    def norm(self, dst: Dict, prefix: str) -> None:
        """torch ``nn.LayerNorm`` → flax ``LayerNorm`` (weight→scale)."""
        self.put(dst, "scale", self.take(prefix + ".weight"))
        self.put(dst, "bias", self.take(prefix + ".bias"))

    def finish(self, ignore: Tuple[str, ...] = ()) -> None:
        """Raise if any checkpoint key was neither consumed nor matches an
        ``ignore`` regex (buffers, vestigial heads)."""
        left = [
            k
            for k in self.sd
            if k not in self.used and not any(re.fullmatch(p, k) for p in ignore)
        ]
        if left:
            raise ValueError(
                f"{self.what}: {len(left)} torch checkpoint key(s) were not "
                f"imported: {sorted(left)[:8]}{'…' if len(left) > 8 else ''} — "
                "unknown architecture variant; refusing a partial import"
            )


def _as_numpy_tree(params: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), jax.device_get(params))


# --------------------------------------------------------------------------
# NDT1 (reference models/ndt1.py): encoder.bin = NeuralEncoder.state_dict()
# --------------------------------------------------------------------------


def _graft_ndt1_encoder(g: _Graft, enc: Dict) -> None:
    emb = enc["embedder"]
    if g.has("embedder.embed_spikes.weight"):
        g.lin(emb["embed_spikes"], "embedder.embed_spikes")
    else:
        # adapt: per-day nn.Linear list (reference models/ndt1.py:123-130)
        # → our stacked (n_days, n_channels, input_dim) einsum weights.
        days = sorted(
            int(m.group(1))
            for k in g.sd
            if (m := re.fullmatch(r"embedder\.embed_spikes\.(\d+)\.weight", k))
        )
        if not days:
            raise KeyError("NDT1: no embedder.embed_spikes weights in checkpoint")
        w = np.stack(
            [g.take(f"embedder.embed_spikes.{d}.weight").T for d in days], axis=0
        )
        g.put(emb, "embed_spikes_days", w)
        if g.has("embedder.embed_spikes.0.bias"):
            b = np.stack(
                [g.take(f"embedder.embed_spikes.{d}.bias") for d in days], axis=0
            )
            g.put(emb, "embed_spikes_days_bias", b)
    if g.has("embedder.stack_projection.weight"):
        # Our StackProjection keeps the Dense (size·D, H) kernel layout on
        # purpose so this import is a plain transpose (models/ndt1.py).
        g.lin(emb["stack_projection"], "embedder.stack_projection")
    if g.has("embedder.projection.weight"):
        g.lin(emb["projection"], "embedder.projection")
    if g.has("embedder.embed_pos.weight"):
        g.put(emb, "embed_pos", g.take("embedder.embed_pos.weight"))
    if g.has("embedder.block_embedding.weight"):
        g.put(emb, "block_embedding", g.take("embedder.block_embedding.weight"))
    if g.has("embedder.day_embedding.weight"):
        g.put(emb, "day_embedding", g.take("embedder.day_embedding.weight"))

    i = 0
    while f"layer_{i}" in enc:
        dst = enc[f"layer_{i}"]
        src = f"layers.{i}"
        for name in ("query", "key", "value", "out_proj"):
            g.lin(dst["attn"][name], f"{src}.attn.{name}")
        for name in ("up_proj", "down_proj"):
            g.lin(dst["mlp"][name], f"{src}.mlp.{name}")
        g.norm(dst["ln1"], f"{src}.ln1")
        g.norm(dst["ln2"], f"{src}.ln2")
        i += 1
    if g.has(f"layers.{i}.ln1.weight"):
        raise ValueError(
            f"NDT1: checkpoint has ≥{i + 1} transformer layers, model has {i}"
        )
    g.norm(enc["out_norm"], "out_norm")
    if g.has("out_proj.proj.0.weight"):
        g.lin(enc["out_proj"]["proj"], "out_proj.proj.0")


def ndt1_encoder_params_from_torch(load_dir: str, encoder_params: Dict) -> Dict:
    """Graft just ``encoder.bin`` into an NDT1-encoder param subtree (the
    BCI ``load_ndt1_from_pt`` warm-start chain,
    ``/root/reference/models/bci.py:76-80``)."""
    encoder_params = _as_numpy_tree(encoder_params)
    g = _Graft(_load_state_dict(os.path.join(load_dir, "encoder.bin")), "NDT1 encoder")
    _graft_ndt1_encoder(g, encoder_params)
    g.finish()
    return encoder_params


def ndt1_params_from_torch(load_dir: str, params: Dict) -> Dict:
    """Reference NDT1 checkpoint dir (``encoder.bin``/``decoder.bin``,
    ``/root/reference/models/ndt1.py:685-692``) → our param tree (a template
    from ``NDT1`` ``model.init``; returned tree has the imported weights)."""
    params = _as_numpy_tree(params)
    g = _Graft(_load_state_dict(os.path.join(load_dir, "encoder.bin")), "NDT1 encoder")
    _graft_ndt1_encoder(g, params["encoder"])
    # cos/sin RoPE tables and context_mask are non-persistent buffers
    # (reference models/ndt1.py:262-264,392) — absent from state dicts.
    g.finish()

    dec_path = os.path.join(load_dir, "decoder.bin")
    if os.path.isfile(dec_path) and "decoder" in params:
        gd = _Graft(_load_state_dict(dec_path), "NDT1 decoder")
        # decoder is Sequential(Linear, LogSoftmax/ReLU…) → index-0 Linear
        # (reference models/ndt1.py:493-500).
        gd.lin(params["decoder"], "0")
        gd.finish()
    return params


# --------------------------------------------------------------------------
# iTransformer (reference models/itransformer.py)
# --------------------------------------------------------------------------


def _seq_linear_prefixes(sd_keys, prefix: str) -> List[str]:
    """Linear prefixes (``<prefix><idx>``) inside a torch ``nn.Sequential``,
    in index order."""
    idxs = sorted(
        int(m.group(1))
        for k in sd_keys
        if (m := re.fullmatch(re.escape(prefix) + r"(\d+)\.weight", k))
    )
    return [f"{prefix}{i}" for i in idxs]


def _graft_torch_encoder_stack(g: _Graft, dst: Dict, src: str) -> None:
    """torch ``nn.TransformerEncoder`` → our ``TorchEncoderStack``."""
    i = 0
    while f"layer_{i}" in dst:
        d = dst[f"layer_{i}"]
        lsrc = f"{src}.layers.{i}"
        g.put(d["attn"]["qkv"], "kernel", g.take(f"{lsrc}.self_attn.in_proj_weight").T)
        g.put(d["attn"]["qkv"], "bias", g.take(f"{lsrc}.self_attn.in_proj_bias"))
        g.lin(d["attn"]["out_proj"], f"{lsrc}.self_attn.out_proj")
        g.lin(d["linear1"], f"{lsrc}.linear1")
        g.lin(d["linear2"], f"{lsrc}.linear2")
        g.norm(d["norm1"], f"{lsrc}.norm1")
        g.norm(d["norm2"], f"{lsrc}.norm2")
        i += 1
    if g.has(f"{src}.layers.{i}.norm1.weight"):
        raise ValueError(f"{g.what}: checkpoint has ≥{i + 1} layers, model has {i}")
    g.norm(dst["norm"], f"{src}.norm")


def itransformer_params_from_torch(
    load_dir: str, params: Dict, components: Tuple[str, ...] = ("encoder", "decoder")
) -> Dict:
    """Reference iTransformer checkpoint (``encoder.bin``/``decoder.bin``,
    ``/root/reference/models/itransformer.py:403-411``) → our param tree.
    ``components`` scopes the import (the reference warm-starts encoder and
    decoder from independent ``from_pt`` dirs,
    ``/root/reference/models/itransformer.py:228-245``)."""
    params = _as_numpy_tree(params)
    if "decoder" in components:
        _graft_itransformer_decoder(load_dir, params)
    if "encoder" not in components:
        return params
    enc = params["encoder"]
    g = _Graft(
        _load_state_dict(os.path.join(load_dir, "encoder.bin")), "iTransformer encoder"
    )

    if "embed_mlp" in enc:  # embedder mode "mlp"
        # torchvision-style MLP Sequential inside embed.0; embed.1 = LayerNorm
        # (reference models/itransformer.py:108-117).
        linears = _seq_linear_prefixes(g.sd, "embed.0.")
        if len(linears) != 2:
            raise ValueError(
                f"iTransformer: expected 2 embed MLP linears, found {len(linears)}"
            )
        g.lin(enc["embed_mlp"]["dense_0"], linears[0])
        g.lin(enc["embed_mlp"]["dense_1"], linears[1])
        g.norm(enc["embed_norm"], "embed.1")
    elif "embed_univariate" in enc:  # embedder mode "transformer"
        u = enc["embed_univariate"]
        g.lin(u["embed_in"], "embed.embed_spikes.0")
        g.lin(u["embed_out"], "embed.embed_spikes.2")
        g.put(u, "embed_pos", g.take("embed.embed_pos.weight"))
        g.put(u, "cls_embed", g.take("embed.cls_embed.weight"))
        _graft_torch_encoder_stack(g, u["transformer"], "embed.transformer")
        g.lin(enc["embed_proj"], "embed_proj.0")
        g.norm(enc["embed_proj_norm"], "embed_proj.1")
    else:
        raise ValueError("iTransformer: unknown embedder layout in our params")

    if "channel_embeddings" in enc:
        g.put(enc, "channel_embeddings", g.take("channel_embeddings.0.weight"))
        g.norm(enc["channel_norm"], "channel_embeddings.1")
    if "region_embeddings" in enc:
        g.put(enc, "region_embeddings", g.take("region_embeddings.0.weight"))
        g.norm(enc["region_norm"], "region_embeddings.1")
    if "depth_in" in enc:
        # depth MLP Sequential: Linear, act, Linear, LayerNorm
        # (reference models/itransformer.py:144-150).
        g.lin(enc["depth_in"], "depth_embeddings.0")
        g.lin(enc["depth_out"], "depth_embeddings.2")
        g.norm(enc["depth_norm"], "depth_embeddings.3")
    if "cls_embed" in enc:
        g.put(enc, "cls_embed", g.take("cls_embed.weight"))
    _graft_torch_encoder_stack(g, enc["transformer"], "transformer")
    g.finish()
    return params


def _graft_itransformer_decoder(load_dir: str, params: Dict) -> None:
    gd = _Graft(
        _load_state_dict(os.path.join(load_dir, "decoder.bin")), "iTransformer decoder"
    )
    # Sequential([AverageTokens], [Linear, act]×mlp_decoder, Linear, …)
    # (reference models/itransformer.py:264-279): map by Linear order.
    linears = _seq_linear_prefixes(gd.sd, "")
    if len(linears) == 2 and "decoder_hidden" in params:
        gd.lin(params["decoder_hidden"], linears[0])
        gd.lin(params["decoder_out"], linears[1])
    elif len(linears) == 1 and "decoder_hidden" not in params:
        gd.lin(params["decoder_out"], linears[0])
    else:
        raise ValueError(
            f"iTransformer: decoder has {len(linears)} linears but model "
            f"{'has' if 'decoder_hidden' in params else 'lacks'} a hidden layer "
            "— mlp_decoder mismatch between checkpoint and config"
        )
    gd.finish()


# --------------------------------------------------------------------------
# PatchTST (reference models/patchtst.py; encoder.bin = HF PatchTSTModel)
# --------------------------------------------------------------------------


def patchtst_variables_from_torch(
    load_dir: str, variables: Dict, components: Tuple[str, ...] = ("encoder", "decoder")
) -> Dict:
    """Reference PatchTST checkpoint (``encoder.bin`` = HF ``PatchTSTModel``
    state dict, ``decoder.bin`` = head; ``/root/reference/models/patchtst.py:
    258-266``) → our flax variables (params AND batch_stats — the encoder's
    BatchNorm running stats live in the checkpoint). When ``variables`` has
    no ``batch_stats`` tree to graft into (a params-only call site), the
    checkpoint's running stats are dropped with a warning. ``components``
    scopes the import (the reference warm-starts encoder/decoder from
    independent dirs, ``/root/reference/models/patchtst.py:180,192``)."""
    variables = _as_numpy_tree(variables)
    p, bs = variables["params"], variables.get("batch_stats")
    if "decoder" in components:
        _graft_patchtst_decoder(load_dir, p)
    if "encoder" not in components:
        return variables
    enc = p["encoder"]
    ebs = bs["encoder"] if bs is not None else None
    g = _Graft(
        _load_state_dict(os.path.join(load_dir, "encoder.bin")), "PatchTST encoder"
    )

    g.lin(enc["patch_embed"], "encoder.embedder.input_embedding")
    i = 0
    while f"layer_{i}" in enc:
        dst = enc[f"layer_{i}"]
        src = f"encoder.layers.{i}"
        qkv_w = np.concatenate(
            [g.take(f"{src}.self_attn.{n}.weight").T for n in ("q_proj", "k_proj", "v_proj")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [g.take(f"{src}.self_attn.{n}.bias") for n in ("q_proj", "k_proj", "v_proj")]
        )
        g.put(dst["qkv"], "kernel", qkv_w)
        g.put(dst["qkv"], "bias", qkv_b)
        g.lin(dst["attn_out"], f"{src}.self_attn.out_proj")
        g.lin(dst["ff1"], f"{src}.ff.0")
        g.lin(dst["ff2"], f"{src}.ff.3")
        for ours, hf in (("norm1", "norm_sublayer1"), ("norm2", "norm_sublayer3")):
            if "bn" in dst[ours]:
                g.put(dst[ours]["bn"], "scale", g.take(f"{src}.{hf}.batchnorm.weight"))
                g.put(dst[ours]["bn"], "bias", g.take(f"{src}.{hf}.batchnorm.bias"))
                if ebs is not None:
                    nbs = ebs[f"layer_{i}"][ours]["bn"]
                    g.put(nbs, "mean", g.take(f"{src}.{hf}.batchnorm.running_mean"))
                    g.put(nbs, "var", g.take(f"{src}.{hf}.batchnorm.running_var"))
                else:
                    import warnings

                    g.take(f"{src}.{hf}.batchnorm.running_mean")
                    g.take(f"{src}.{hf}.batchnorm.running_var")
                    warnings.warn(
                        "PatchTST torch import: dropping BatchNorm running "
                        "stats (no batch_stats tree at this call site — use "
                        "patchtst_variables_from_torch / the trainer "
                        "warm-start for a complete import)",
                        stacklevel=2,
                    )
                g.used.add(f"{src}.{hf}.batchnorm.num_batches_tracked")
            else:
                g.norm(dst[ours]["ln"], f"{src}.{hf}")
        i += 1

    # HF stores the positional encoding as a trainable nn.Parameter; ours is
    # the constant (normalized) sincos table. Accept it only if it is still
    # the sincos init — a checkpoint that trained it can't be represented.
    pe_key = "encoder.positional_encoder.position_enc"
    if g.has(pe_key):
        from llm_bci_tpu.models.patchtst import sincos_position_encoding

        pe = g.take(pe_key)
        ours_pe = np.asarray(sincos_position_encoding(pe.shape[0], pe.shape[1]))
        if not np.allclose(pe, ours_pe, atol=1e-4):
            raise ValueError(
                "PatchTST: the checkpoint's positional encoding differs from "
                "the sincos table (it was trained with "
                "positional_encoding_type != 'sincos' or updated in training) "
                "— not representable in this implementation"
            )
    g.finish(ignore=(r".*num_batches_tracked", r"encoder\.embedder\.padding.*"))
    return variables


def _graft_patchtst_decoder(load_dir: str, p: Dict) -> None:
    gd = _Graft(
        _load_state_dict(os.path.join(load_dir, "decoder.bin")), "PatchTST decoder"
    )
    dec = p["decoder"]
    if gd.has("projection.weight"):  # shared PredictHead/PretrainHead Linear
        gd.lin(dec["proj_out"], "projection")
    elif gd.has("projection.0.weight"):  # mlp_decoder Sequential
        gd.lin(dec["proj_hidden"], "projection.0")
        gd.lin(dec["proj_out"], "projection.2")
    elif gd.has("projections.0.weight") or gd.has("projections.0.0.weight"):
        # per-channel heads → our stacked einsum params
        C = np.shape(dec["proj_out_w"])[0]
        if gd.has("projections.0.0.weight"):  # per-channel MLP
            w1 = np.stack([gd.take(f"projections.{c}.0.weight").T for c in range(C)])
            b1 = np.stack([gd.take(f"projections.{c}.0.bias") for c in range(C)])
            gd.put(dec, "proj_hidden_w", w1)
            gd.put(dec, "proj_hidden_b", b1)
            w = np.stack([gd.take(f"projections.{c}.2.weight").T for c in range(C)])
            b = np.stack([gd.take(f"projections.{c}.2.bias") for c in range(C)])
        else:
            w = np.stack([gd.take(f"projections.{c}.weight").T for c in range(C)])
            b = np.stack([gd.take(f"projections.{c}.bias") for c in range(C)])
        gd.put(dec, "proj_out_w", w)
        gd.put(dec, "proj_out_b", b)
    else:
        raise ValueError(
            f"PatchTST: unrecognized decoder layout: {sorted(gd.sd)[:6]}"
        )
    gd.finish()


# --------------------------------------------------------------------------
# BCI (reference models/bci.py): NDT1 bins + projector.bin + HF/peft llm
# --------------------------------------------------------------------------

_PEFT_LORA_RE = re.compile(
    r"base_model\.model\.model\.layers\.(\d+)\.(self_attn|mlp)\.(\w+)\."
    r"lora_(A|B)(?:\.default)?\.weight"
)


def lora_params_from_peft_adapter(
    adapter_path: str,
    llm_params: Dict,
    expect_r: Optional[int] = None,
    expect_alpha: Optional[float] = None,
) -> Dict:
    """Graft a peft LoRA adapter file (``adapter_model.safetensors`` or
    ``.bin``; key layout ``base_model.model.model.layers.{i}.self_attn.
    q_proj.lora_A.weight``) into our Llama param tree's ``lora_A``/``lora_B``
    leaves (``models/llama.py``; peft stores (r, in) / (out, r) — ours are
    the transposes). Reference adapter config:
    ``/root/reference/configs/trainer_bci.yaml:54-59``.

    The LoRA *scaling* (alpha/r) is model config, not a weight: peft records
    it in ``adapter_config.json`` and our Llama bakes it in at construction
    (``lora_alpha``). Grafting factors trained under a different alpha would
    silently mis-scale every delta, so when ``adapter_config.json`` sits
    next to the weights its ``r``/``lora_alpha`` are validated against
    ``expect_r``/``expect_alpha`` (pass the live model's values)."""
    _validate_peft_adapter_config(
        os.path.join(os.path.dirname(adapter_path), "adapter_config.json"),
        expect_r,
        expect_alpha,
    )
    if adapter_path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(adapter_path)
    else:
        sd = _load_state_dict(adapter_path)
    g = _Graft(dict(sd), "peft LoRA adapter")
    n = 0
    for key in list(g.sd):
        m = _PEFT_LORA_RE.fullmatch(key)
        if not m:
            raise ValueError(f"peft adapter: unrecognized key {key!r}")
        layer, block, proj, ab = m.groups()
        dst = llm_params[f"layers_{layer}"][block][proj]
        if f"lora_{ab}" not in dst:
            raise ValueError(
                f"peft adapter targets {block}.{proj} but the model was built "
                "without LoRA there (check lora target_modules / lora_r)"
            )
        g.put(dst, f"lora_{ab}", g.take(key).T)
        n += 1
    g.finish()
    if n == 0:
        raise ValueError(f"peft adapter {adapter_path!r} held no LoRA weights")
    return llm_params


def _validate_peft_adapter_config(
    cfg_path: str, expect_r: Optional[int], expect_alpha: Optional[float]
) -> None:
    if not os.path.isfile(cfg_path):
        return
    import json

    with open(cfg_path) as f:
        acfg = json.load(f)
    if acfg.get("rank_pattern") or acfg.get("alpha_pattern"):
        raise ValueError(
            f"peft adapter {cfg_path!r} uses per-module rank_pattern/"
            "alpha_pattern — our Llama applies one uniform lora_r/lora_alpha"
        )
    if acfg.get("use_rslora"):
        raise ValueError(
            f"peft adapter {cfg_path!r} was trained with use_rslora "
            "(alpha/sqrt(r) scaling) — our Llama scales by alpha/r"
        )
    a_r, a_alpha = acfg.get("r"), acfg.get("lora_alpha")
    if expect_r is not None and a_r is not None and int(a_r) != int(expect_r):
        raise ValueError(
            f"peft adapter was trained with r={a_r} but the model is "
            f"configured with lora.r={expect_r} — set "
            f"method.model_kwargs.lora.r={a_r} to import it"
        )
    if (
        expect_alpha is not None
        and a_alpha is not None
        and float(a_alpha) != float(expect_alpha)
    ):
        raise ValueError(
            f"peft adapter was trained with lora_alpha={a_alpha} but the "
            f"model is configured with lora.alpha={expect_alpha}: the deltas "
            f"would be mis-scaled by {float(expect_alpha) / float(a_alpha):g}× "
            f"— set method.model_kwargs.lora.alpha={a_alpha} to import it"
        )


def _find_peft_adapter(load_dir: str) -> Optional[str]:
    for name in ("adapter_model.safetensors", "adapter_model.bin"):
        p = os.path.join(load_dir, name)
        if os.path.isfile(p):
            return p
    return None


def _has_full_hf_weights(load_dir: str) -> bool:
    if not os.path.isfile(os.path.join(load_dir, "config.json")):
        return False
    names = os.listdir(load_dir)
    return any(
        re.fullmatch(r"(pytorch_model.*\.bin|model.*\.safetensors)", n) for n in names
    )


def bci_params_from_torch(
    load_dir: str,
    params: Dict,
    llama_config=None,
    llm_dir: Optional[str] = None,
    quant: Optional[str] = None,
    lora_r: Optional[int] = None,
    lora_alpha: Optional[float] = None,
) -> Dict:
    """Reference BCI checkpoint dir (``/root/reference/models/bci.py:250-264``)
    → our param tree. Imports, in order:

    * the inner NDT1 encoder (``encoder.bin`` → ``params['ndt1_encoder']``;
      the vestigial NDT1 ``decoder.bin`` head is skipped — the reference's
      BCI forward never calls it, ``/root/reference/models/bci.py:125``),
    * the projector (``projector.bin``: a single Linear or the
      Linear/act/Linear Sequential, ``/root/reference/models/bci.py:90-96``),
    * the LLM: full HF weights when the dir has them (frozen/no-LoRA runs),
      and/or a peft LoRA adapter (``adapter_model.*``). Pass ``llm_dir`` to
      source base weights from the original HF model directory when the
      checkpoint holds only the adapter (peft's ``save_pretrained`` saves
      the adapter alone).
    """
    params = _as_numpy_tree(params)

    g = _Graft(_load_state_dict(os.path.join(load_dir, "encoder.bin")), "BCI ndt1")
    _graft_ndt1_encoder(g, params["ndt1_encoder"])
    g.finish()

    gp = _Graft(_load_state_dict(os.path.join(load_dir, "projector.bin")), "projector")
    if gp.has("weight"):  # single Linear (inter_size: null)
        if "projector_in" in params:
            raise ValueError(
                "BCI: checkpoint projector is a single Linear but the model "
                "was configured with projector.inter_size"
            )
        gp.put(params["projector_out"], "kernel", gp.take("weight").T)
        if gp.has("bias"):
            gp.put(params["projector_out"], "bias", gp.take("bias"))
    else:
        gp.lin(params["projector_in"], "0")
        gp.lin(params["projector_out"], "2")
    gp.finish()

    base_dir = None
    if _has_full_hf_weights(load_dir):
        base_dir = load_dir
    elif llm_dir and _has_full_hf_weights(llm_dir):
        base_dir = llm_dir
    if base_dir is not None:
        if llama_config is None:
            raise ValueError("bci_params_from_torch needs llama_config to import HF weights")
        from llm_bci_tpu.models.llama import load_hf_llama_params

        hf = load_hf_llama_params(base_dir, llama_config)
        if quant:
            from llm_bci_tpu.models.llama import quantize_llama_params

            hf = quantize_llama_params(hf, quant)
        _merge_into(params["llm"], hf, "BCI llm")

    adapter = _find_peft_adapter(load_dir)
    if adapter is not None:
        lora_params_from_peft_adapter(
            adapter, params["llm"], expect_r=lora_r, expect_alpha=lora_alpha
        )
    if base_dir is None and adapter is None:
        raise ValueError(
            f"BCI: {load_dir!r} holds neither full HF weights nor a peft "
            "adapter — nothing to import for the LLM (pass llm_dir for the base)"
        )
    return params


def _merge_into(dst: Dict, src: Dict, what: str) -> None:
    """Recursively overwrite ``dst`` leaves with ``src`` (shape-checked);
    ``dst`` keys absent from ``src`` (lora factors, quant scales) persist."""
    for k, v in src.items():
        if isinstance(v, dict):
            if k not in dst or not isinstance(dst[k], dict):
                raise KeyError(f"{what}: model tree lacks branch {k!r}")
            _merge_into(dst[k], v, f"{what}.{k}")
        else:
            if k not in dst:
                raise KeyError(f"{what}: model tree lacks leaf {k!r}")
            if (
                np.asarray(dst[k]).dtype == np.int8
                and np.asarray(v).dtype != np.int8
            ):
                raise ValueError(
                    f"{what}.{k}: target model is int8-quantized — import the "
                    "torch checkpoint into a bf16 model first, then apply "
                    "quantize_llama_params"
                )
            if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"{what}.{k}: shape {np.shape(v)} vs model {np.shape(dst[k])}"
                )
            dst[k] = np.ascontiguousarray(v, dtype=np.asarray(dst[k]).dtype)
