"""PatchTST for spiking activity — patch-based time-series transformer.

TPU-native rebuild of the reference wrapper (``models/patchtst.py:159-266``)
**without** the HF ``PatchTSTModel`` crutch (SURVEY.md §2.6): patchify,
random patch masking, channel-independent transformer encoder, and the
mlm/ctc heads are implemented directly in flax.

Semantics mirror HF PatchTST where the reference depends on them:
* patchify = unfold(T, patch_length, patch_stride), channels-first output
  ``(B, C, num_patches, patch_length)``;
* ``do_mask_input`` random masking keeps ``L*(1-ratio)`` patches per
  (batch, channel) via noise-argsort (optionally channel-consistent), fills
  masked patches with ``mask_value``; the returned ``mask`` is True on
  masked patches;
* encoder: shared patch embedding, sincos positional encoding, pre-norm (or
  post-norm) layers with BatchNorm ("batchnorm") or LayerNorm over d_model,
  attention over patches with channels folded into batch
  (``channel_attention: false``).

Heads (reference ``models/patchtst.py:29-154``): PretrainHead reconstructs
per-patch bins (shared or per-channel projections — per-channel is one
batched einsum, not a module list); PredictHead emits CTC logits from
channel-pooled patches.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import unfreeze

from llm_bci_tpu.config import to_plain_dict, update_config, resolve_path
from llm_bci_tpu.model_output import ModelOutput
from llm_bci_tpu.models.ndt1 import ACT2FN, dtype_from
from llm_bci_tpu.ops.attention import dot_product_attention
from llm_bci_tpu.ops.ctc import ctc_loss
from llm_bci_tpu.ops.losses import mse_loss, poisson_nll_loss
from llm_bci_tpu.registry import register_model

DEFAULT_CONFIG = "configs/patchtst.yaml"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PatchTSTOutput(ModelOutput):
    patch_input: Optional[jax.Array] = None


def patchify(x: jax.Array, patch_length: int, patch_stride: int) -> jax.Array:
    """(B, T, C) → (B, C, num_patches, patch_length); static strided gather."""
    B, T, C = x.shape
    P = 1 + (T - patch_length) // patch_stride
    idx = np.arange(P)[:, None] * patch_stride + np.arange(patch_length)[None, :]
    frames = x[:, idx, :]                       # (B, P, patch_length, C)
    return frames.transpose(0, 3, 1, 2)         # (B, C, P, patch_length)


def num_patches(T: int, patch_length: int, patch_stride: int) -> int:
    return 1 + (T - patch_length) // patch_stride


def random_patch_masking(
    patches: jax.Array,   # (B, C, P, L)
    key: jax.Array,
    mask_ratio: float,
    channel_consistent: bool,
    mask_value: float,
) -> Tuple[jax.Array, jax.Array]:
    """HF PatchTST random masking: rank per-(batch,channel) noise, mask the
    top ``ratio`` fraction of patches. Returns (masked, mask[True=masked])."""
    B, C, P, L = patches.shape
    len_keep = int(P * (1 - mask_ratio))
    noise_shape = (B, 1, P) if channel_consistent else (B, C, P)
    noise = jax.random.uniform(key, noise_shape)
    noise = jnp.broadcast_to(noise, (B, C, P))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)  # rank of each patch
    mask = ranks >= len_keep                                   # True = masked
    masked = jnp.where(mask[..., None], mask_value, patches)
    return masked, mask


def sincos_position_encoding(P: int, d_model: int) -> np.ndarray:
    """HF PatchTST 'sincos' table incl. its normalization
    (``PatchTSTPositionalEncoding._init_pe``: the raw sin/cos table is
    mean-centered and scaled by ``1 / (std * 10)`` — the reference's encoder
    adds THIS, not the textbook table)."""
    pos = np.arange(P, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((P, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    pe = pe - pe.mean()
    pe = pe / (pe.std(ddof=1) * 10)   # torch.std is unbiased (ddof=1)
    return pe


class PatchTSTNorm(nn.Module):
    """"batchnorm" (HF PatchTSTBatchNorm: BatchNorm1d over d_model) or
    "layernorm"."""

    norm_type: str
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:
        if self.norm_type == "batchnorm":
            return nn.BatchNorm(
                use_running_average=not training, epsilon=self.eps, name="bn"
            )(x)
        return nn.LayerNorm(epsilon=self.eps, name="ln")(x)


class PatchTSTEncoderLayer(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:  # (BC, P, D)
        c = self.cfg
        D = c["d_model"]
        H = c["num_attention_heads"]
        dt = dtype_from(c.get("compute_dtype")) if c.get("compute_dtype") else None
        act = ACT2FN[c["activation_function"]]
        pre_norm = bool(c.get("pre_norm", True))
        attn_drop = float(c.get("attention_dropout", 0.0))
        ff_drop = float(c.get("ff_dropout", 0.0))
        path_drop = float(c.get("path_dropout", 0.0))

        def attn_block(h):
            BC, P, _ = h.shape
            qkv = nn.Dense(3 * D, use_bias=c.get("bias", True), dtype=dt, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(BC, P, H, D // H)
            k = k.reshape(BC, P, H, D // H)
            v = v.reshape(BC, P, H, D // H)
            out = dot_product_attention(q, k, v).reshape(BC, P, D)
            out = nn.Dropout(attn_drop, deterministic=not training)(out)
            return nn.Dense(D, use_bias=c.get("bias", True), dtype=dt, name="attn_out")(out)

        def ff_block(h):
            h = nn.Dense(c["ffn_dim"], use_bias=c.get("bias", True), dtype=dt, name="ff1")(h)
            h = act(h)
            h = nn.Dropout(ff_drop, deterministic=not training)(h)
            return nn.Dense(D, use_bias=c.get("bias", True), dtype=dt, name="ff2")(h)

        drop_path = nn.Dropout(path_drop, deterministic=not training, name="drop_path")
        norm1 = PatchTSTNorm(c.get("norm_type", "batchnorm"), c.get("norm_eps", 1e-5), name="norm1")
        norm2 = PatchTSTNorm(c.get("norm_type", "batchnorm"), c.get("norm_eps", 1e-5), name="norm2")

        if pre_norm:
            x = x + drop_path(attn_block(norm1(x, training)))
            x = x + drop_path(ff_block(norm2(x, training)))
        else:
            x = norm1(x + drop_path(attn_block(x)), training)
            x = norm2(x + drop_path(ff_block(x)), training)
        return x


class PatchTSTEncoder(nn.Module):
    """Scaling → patchify → (train-time) random masking → embed → +pos →
    transformer. Returns (last_hidden_state, mask, patch_input)."""

    config: Any

    @nn.compact
    def __call__(
        self, spikes: jax.Array, training: bool
    ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
        c = self.config
        B, T, C = spikes.shape
        scaling = c.get("scaling")
        if scaling == "std":
            mean = spikes.mean(axis=1, keepdims=True)
            std = spikes.std(axis=1, keepdims=True) + 1e-5
            spikes = (spikes - mean) / std
        elif scaling == "mean":
            denom = jnp.abs(spikes).mean(axis=1, keepdims=True) + 1e-5
            spikes = spikes / denom

        patches = patchify(spikes, c["patch_length"], c["patch_stride"])  # (B,C,P,L)
        patch_input = patches
        mask = None
        if c.get("do_mask_input"):
            if c.get("mask_type", "random") != "random":
                raise ValueError("Only random patch masking is implemented")
            if training:
                key = self.make_rng("mask")
                patches, mask = random_patch_masking(
                    patches,
                    key,
                    float(c["random_mask_ratio"]),
                    bool(c.get("channel_consistent_masking", False)),
                    float(c.get("mask_value", 0)),
                )
            else:
                mask = jnp.zeros(patches.shape[:3], bool)

        D = c["d_model"]
        x = nn.Dense(D, use_bias=c.get("bias", True), name="patch_embed")(patches)
        P = x.shape[2]
        pe = jnp.asarray(sincos_position_encoding(P, D))
        x = x + pe[None, None, :, :]
        x = nn.Dropout(
            float(c.get("positional_dropout", 0.0)), deterministic=not training
        )(x)

        x = x.reshape(B * C, P, D)
        for i in range(c["num_hidden_layers"]):
            x = PatchTSTEncoderLayer(cfg=c, name=f"layer_{i}")(x, training)
        x = x.reshape(B, C, P, D).astype(jnp.float32)
        return x, mask, patch_input


class PretrainHead(nn.Module):
    """Per-patch reconstruction (reference ``models/patchtst.py:97-154``)."""

    config: Any
    num_input_channels: int
    d_model: int
    patch_length: int
    log_input: bool

    @nn.compact
    def __call__(self, embedding: jax.Array, training: bool) -> jax.Array:
        c = self.config
        drop = nn.Dropout(
            float(c.get("head_dropout", 0.0)), deterministic=not training
        )
        x = drop(embedding)                      # (B, C, P, D)
        if c.get("share_projection", True):
            if c.get("mlp_decoder"):
                x = nn.Dense(self.d_model, name="proj_hidden")(x)
                x = ACT2FN[c.get("mlp_activation", "gelu")](x)
            out = nn.Dense(self.patch_length, name="proj_out")(x)
        else:
            # Per-channel projections as one stacked einsum.
            C = self.num_input_channels
            if c.get("mlp_decoder"):
                w1 = self.param(
                    "proj_hidden_w", nn.initializers.lecun_normal(),
                    (C, self.d_model, self.d_model),
                )
                b1 = self.param("proj_hidden_b", nn.initializers.zeros, (C, self.d_model))
                x = jnp.einsum("bcpd,cde->bcpe", x, w1) + b1[None, :, None, :]
                x = ACT2FN[c.get("mlp_activation", "gelu")](x)
            w = self.param(
                "proj_out_w", nn.initializers.lecun_normal(),
                (C, self.d_model, self.patch_length),
            )
            b = self.param("proj_out_b", nn.initializers.zeros, (C, self.patch_length))
            out = jnp.einsum("bcpd,cdl->bcpl", x, w) + b[None, :, None, :]
        if not self.log_input:
            out = nn.relu(out)
        return out                               # (B, C, P, patch_length)


class PredictHead(nn.Module):
    """CTC logits from channel-pooled patch embeddings
    (reference ``models/patchtst.py:29-94``)."""

    config: Any
    num_input_channels: int
    d_model: int
    vocab_size: int

    @nn.compact
    def __call__(self, embedding: jax.Array, training: bool) -> jax.Array:
        c = self.config
        drop = nn.Dropout(
            float(c.get("head_dropout", 0.0)), deterministic=not training
        )
        pooling = c.get("pooling_type", "mean")
        if c.get("share_projection", True):
            if pooling == "mean":
                pooled = embedding.mean(axis=1)          # (B, P, D)
            elif pooling == "max":
                pooled = embedding.max(axis=1)
            else:
                raise ValueError(f"Unknown pooling {pooling!r}")
            x = drop(pooled)
            if c.get("mlp_decoder"):
                x = nn.Dense(self.d_model, name="proj_hidden")(x)
                x = ACT2FN[c.get("mlp_activation", "gelu")](x)
            out = nn.Dense(self.vocab_size, name="proj_out")(x)
        else:
            C = self.num_input_channels
            x = drop(embedding)
            w = self.param(
                "proj_out_w", nn.initializers.lecun_normal(),
                (C, self.d_model, self.vocab_size),
            )
            b = self.param("proj_out_b", nn.initializers.zeros, (C, self.vocab_size))
            per_channel = jnp.einsum("bcpd,cdv->bcpv", x, w) + b[None, :, None, :]
            out = per_channel.mean(axis=1)
        return nn.log_softmax(out, axis=-1)              # (B, P, vocab)


@register_model("PatchTST")
class PatchTSTForSpikingActivity(nn.Module):
    """PatchTST with mlm / ctc methods (reference ``models/patchtst.py:159-266``)."""

    config: Any
    method_name: str
    loss: str = "poisson_nll"
    log_input: bool = True
    vocab_size: int = 41
    blank_id: int = 0
    zero_infinity: bool = True

    @classmethod
    def from_config(cls, model_config, **method_kwargs) -> "PatchTSTForSpikingActivity":
        cfg = update_config(resolve_path(DEFAULT_CONFIG), model_config)
        from llm_bci_tpu.interop.torch_import import load_saved_component_config

        for comp in ("encoder", "decoder"):
            pt = cfg[comp].get("from_pt")
            if pt:
                # ours (yaml) or the reference's torch-pickled config (which
                # PatchTST names *.yaml, reference models/patchtst.py:260-262)
                saved = load_saved_component_config(pt, comp)
                if saved is not None:
                    cfg[comp] = update_config(cfg[comp], saved)
                cfg[comp]["from_pt"] = pt
        if method_kwargs.get("compute_dtype") and "compute_dtype" not in cfg["encoder"]:
            cfg["encoder"]["compute_dtype"] = method_kwargs["compute_dtype"]
        kwargs = {
            k: v
            for k, v in method_kwargs.items()
            if k in ("method_name", "loss", "log_input", "vocab_size", "blank_id", "zero_infinity")
        }
        return cls(config=to_plain_dict(cfg), **kwargs)

    def setup(self):
        enc = self.config["encoder"]
        if self.method_name == "mlm" and not enc.get("do_mask_input"):
            raise ValueError("Can't pretrain with inactive masking")
        self.encoder = PatchTSTEncoder(config=enc, name="encoder")
        if self.method_name == "mlm":
            self.decoder = PretrainHead(
                config=self.config["decoder"],
                num_input_channels=enc["num_input_channels"],
                d_model=enc["d_model"],
                patch_length=enc["patch_length"],
                log_input=self.log_input,
                name="decoder",
            )
        elif self.method_name == "ctc":
            self.decoder = PredictHead(
                config=self.config["decoder"],
                num_input_channels=enc["num_input_channels"],
                d_model=enc["d_model"],
                vocab_size=self.vocab_size,
                name="decoder",
            )
        else:
            raise ValueError(
                f"Method {self.method_name} not implemented yet for PatchTST"
            )

    def __call__(
        self,
        spikes: jax.Array,              # (B, T, C)
        spikes_mask: jax.Array,         # (B, T)
        spikes_lengths: Optional[jax.Array] = None,
        targets: Optional[jax.Array] = None,
        targets_lengths: Optional[jax.Array] = None,
        training: bool = False,
    ) -> PatchTSTOutput:
        enc = self.config["encoder"]
        pl_, ps = enc["patch_length"], enc["patch_stride"]
        embedding, mask, patch_input = self.encoder(spikes, training)
        preds = self.decoder(embedding, training)

        if self.method_name == "mlm":
            # Patch-level padding mask: patch valid iff all source bins valid
            # (reference models/patchtst.py:230-233 unfold+prod).
            pm = patchify(spikes_mask[:, :, None].astype(jnp.float32), pl_, ps)
            pm = (jnp.prod(pm[:, 0, :, :], axis=-1) > 0)            # (B, P)
            full_mask = mask & pm[:, None, :]                       # (B, C, P)
            if self.loss == "poisson_nll":
                losses = poisson_nll_loss(preds, patch_input, log_input=self.log_input)
            elif self.loss == "mse":
                losses = mse_loss(preds, patch_input)
            else:
                raise ValueError(f"Loss {self.loss} not implemented yet for mlm")
            loss = (losses * full_mask[..., None]).sum()
            return PatchTSTOutput(
                loss=loss,
                n_examples=full_mask.sum(),
                mask=full_mask.astype(jnp.int32),
                preds=preds,
                targets=patch_input,
                patch_input=patch_input,
            )

        # ctc
        lens = (1 + (spikes_lengths - pl_) // ps).astype(spikes_lengths.dtype)
        loss = ctc_loss(
            preds, targets, lens, targets_lengths,
            blank_id=self.blank_id, zero_infinity=self.zero_infinity,
        ).sum()
        return PatchTSTOutput(
            loss=loss,
            n_examples=jnp.asarray(spikes.shape[0], jnp.int32),
            preds=preds,
            targets=targets,
        )

    # -- checkpointing (reference models/patchtst.py:258-266) --

    @staticmethod
    def save_checkpoint(save_dir: str, params: Dict) -> None:
        from llm_bci_tpu.utils.serialization import save_params

        params = unfreeze(params)
        save_params(os.path.join(save_dir, "encoder.msgpack"), params["encoder"])
        save_params(os.path.join(save_dir, "decoder.msgpack"), params["decoder"])

    def save_config(self, save_dir: str) -> None:
        for comp in ("encoder", "decoder"):
            with open(os.path.join(save_dir, f"{comp}_config.yaml"), "w") as f:
                yaml.safe_dump(to_plain_dict(self.config[comp]), f)

    def load_checkpoint_params(self, load_dir: str, params: Dict) -> Dict:
        from llm_bci_tpu.utils.serialization import load_params

        params = unfreeze(params)
        from llm_bci_tpu.interop.torch_import import is_torch_checkpoint

        if is_torch_checkpoint(load_dir):
            # params-only call site: BatchNorm running stats are dropped
            # (warned); the trainer's warm_start_variables path keeps them.
            from llm_bci_tpu.interop.torch_import import patchtst_variables_from_torch

            return patchtst_variables_from_torch(load_dir, {"params": params})["params"]
        for comp in ("encoder", "decoder"):
            path = os.path.join(load_dir, f"{comp}.msgpack")
            if os.path.exists(path):
                params[comp] = load_params(path, params[comp])
        return params

    def warm_start_params(self, params: Dict) -> Dict:
        params = unfreeze(params)
        for comp in ("encoder", "decoder"):
            pt = self.config[comp].get("from_pt")
            if pt:
                from llm_bci_tpu.utils.serialization import load_params

                path = os.path.join(pt, f"{comp}.msgpack")
                if os.path.exists(path):
                    params[comp] = load_params(path, params[comp])
        return params

    def warm_start_variables(self, variables: Dict) -> Dict:
        """``from_pt`` warm start over full variables (params AND
        batch_stats) — the trainer prefers this hook when present so
        reference torch checkpoints restore their BatchNorm running stats
        (they live inside ``encoder.bin``)."""
        from llm_bci_tpu.interop.torch_import import (
            is_torch_checkpoint,
            patchtst_variables_from_torch,
        )

        if not any(self.config[c].get("from_pt") for c in ("encoder", "decoder")):
            return variables  # identity return == nothing to load
        variables = dict(variables)
        variables["params"] = unfreeze(variables["params"])
        for comp in ("encoder", "decoder"):
            pt = self.config[comp].get("from_pt")
            if not pt:
                continue
            torch_fmt = is_torch_checkpoint(pt) or (
                comp == "decoder" and is_torch_checkpoint(pt, "decoder")
            )
            if torch_fmt:
                variables = patchtst_variables_from_torch(
                    pt, variables, components=(comp,)
                )
            else:
                from llm_bci_tpu.utils.serialization import load_params

                path = os.path.join(pt, f"{comp}.msgpack")
                if os.path.exists(path):
                    variables["params"][comp] = load_params(
                        path, variables["params"][comp]
                    )
        return variables
