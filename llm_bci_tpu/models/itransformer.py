"""iTransformer — channels-as-tokens encoder over binned spikes (TPU rebuild).

Functional parity with the reference ``models/itransformer.py`` redesigned
for JAX/XLA:

* the per-channel ``UnivariateTransformer`` embedder folds channels into the
  batch dim (one big batched attention instead of a view loop);
* brain-region *names* never reach the device: the region vocabulary lives
  in the config (set by the CLI surgery, reference ``main.py:40-45``) and
  examples carry ``neuron_regions_idx`` int arrays — see
  :func:`region_names_to_idx`;
* region-aware maskers (v2 modes forward-pred / inter- / intra-region,
  reference ``models/masker copy.py:34-141``) are the jit-safe functions in
  :mod:`llm_bci_tpu.models.masker` with dynamic overrides for eval sweeps.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import unfreeze

from llm_bci_tpu.config import DictConfig, to_plain_dict, update_config, resolve_path
from llm_bci_tpu.model_output import ModelOutput
from llm_bci_tpu.models.layers import MLPStack, TorchEncoderStack
from llm_bci_tpu.models.masker import MaskerConfig, apply_maskers
from llm_bci_tpu.models.ndt1 import ACT2FN, dtype_from
from llm_bci_tpu.ops.ctc import ctc_loss
from llm_bci_tpu.ops.losses import cross_entropy_loss, mse_loss, poisson_nll_loss
from llm_bci_tpu.registry import register_model

DEFAULT_CONFIG = "configs/itransformer.yaml"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class iTransformerOutput(ModelOutput):
    pass


def region_names_to_idx(rows: List[Dict[str, Any]], regions: List[str]) -> None:
    """Host-side: add ``neuron_regions_idx`` int columns from string region
    names so device code never touches strings (applied by the CLI after the
    region vocabulary is collected, reference ``main.py:40-45``)."""
    r_to_i = {r: i for i, r in enumerate(regions)}
    for row in rows:
        if "neuron_regions" in row and "neuron_regions_idx" not in row:
            row["neuron_regions_idx"] = np.asarray(
                [r_to_i[str(r)] for r in row["neuron_regions"]], dtype=np.int32
            )


class UnivariateTransformer(nn.Module):
    """Per-channel time-series transformer with CLS readout (reference
    ``models/itransformer.py:40-93``). Channels ride the batch dim."""

    hidden_size: int
    n_heads: int
    n_layers: int
    act_name: str
    dropout: float
    max_n_bins: int

    @nn.compact
    def __call__(
        self,
        spikes: jax.Array,                 # (B, T, N)
        spikes_timestamp: Optional[jax.Array],
        training: bool,
    ) -> jax.Array:                        # (B, N, hidden)
        B, T, N = spikes.shape
        act = ACT2FN[self.act_name]
        x = spikes[..., None]                           # (B, T, N, 1)
        h = nn.Dense(self.hidden_size, name="embed_in")(x)
        h = act(h)
        h = nn.Dense(self.hidden_size, name="embed_out")(h)  # (B, T, N, H)

        if spikes_timestamp is None:
            spikes_timestamp = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        pos = self.param(
            "embed_pos", nn.initializers.normal(1.0), (self.max_n_bins, self.hidden_size)
        )
        h = h + pos[spikes_timestamp][:, :, None, :]

        h = h.transpose(0, 2, 1, 3)                      # (B, N, T, H)
        cls = self.param("cls_embed", nn.initializers.normal(1.0), (1, self.hidden_size))
        cls_tok = jnp.broadcast_to(cls[None, None, :, :], (B, N, 1, self.hidden_size))
        h = jnp.concatenate([cls_tok, h], axis=2)        # (B, N, 1+T, H)

        h = h.reshape(B * N, T + 1, self.hidden_size)
        h = TorchEncoderStack(
            self.hidden_size, self.n_heads, self.n_layers, act, self.dropout,
            name="transformer",
        )(h, training=training)
        return h.reshape(B, N, T + 1, self.hidden_size)[:, :, 0, :]


class iTransformerEncoder(nn.Module):
    """Channel-token encoder: per-channel embed (mlp over time bins, or
    univariate transformer), additive channel/region/depth embeddings,
    optional CLS, transformer backbone (reference
    ``models/itransformer.py:98-210``)."""

    config: Any   # plain-dict encoder config
    use_cls: bool

    @nn.compact
    def __call__(
        self,
        spikes: jax.Array,                    # (B, T, N)
        spikes_timestamp: Optional[jax.Array],
        spikes_spacestamp: Optional[jax.Array],
        neuron_regions_idx: Optional[jax.Array],
        neuron_depths: Optional[jax.Array],
        training: bool,
    ) -> jax.Array:                           # (B, [1+]N, hidden)
        cfg = self.config
        emb = cfg["embedder"]
        H = cfg["hidden_size"]
        act = ACT2FN[cfg["activation"]]
        dt = dtype_from(cfg.get("compute_dtype")) if cfg.get("compute_dtype") else None
        B, T, N = spikes.shape

        if emb["mode"] == "mlp":
            # MLP over the (padded) time axis per channel; LayerNorm after
            # (reference models/itransformer.py:108-117 "MAJOR CHANGE").
            tokens = MLPStack(
                (H, H), act, emb["dropout"], use_bias=cfg["bias"], dtype=dt,
                name="embed_mlp",
            )(spikes.transpose(0, 2, 1), training)
            tokens = nn.LayerNorm(name="embed_norm")(tokens)
        elif emb["mode"] == "transformer":
            u = UnivariateTransformer(
                hidden_size=emb["hidden_size"],
                n_heads=emb["n_heads"],
                n_layers=emb["n_layers"],
                act_name=emb["activation"],
                dropout=emb["dropout"],
                max_n_bins=emb["max_n_bins"],
                name="embed_univariate",
            )(spikes, spikes_timestamp, training)
            tokens = nn.Dense(H, name="embed_proj")(u)
            tokens = nn.LayerNorm(name="embed_proj_norm")(tokens)
        else:
            raise ValueError(f"Unknown embedder mode {emb['mode']!r}")

        if cfg["max_n_channels"] != 0:
            table = self.param(
                "channel_embeddings", nn.initializers.normal(1.0), (cfg["max_n_channels"], H)
            )
            if spikes_spacestamp is None:
                spikes_spacestamp = jnp.arange(N)[None, :]
            tokens = tokens + nn.LayerNorm(name="channel_norm")(table[spikes_spacestamp])

        if cfg["embed_region"]:
            regions = cfg["regions"] or []
            table = self.param(
                "region_embeddings", nn.initializers.normal(1.0), (max(len(regions), 1), H)
            )
            tokens = tokens + nn.LayerNorm(name="region_norm")(table[neuron_regions_idx])

        if cfg["embed_depth"]:
            d = neuron_depths[..., None]
            d = nn.Dense(H, name="depth_in")(d)
            d = act(d)
            d = nn.Dense(H, name="depth_out")(d)
            tokens = tokens + nn.LayerNorm(name="depth_norm")(d)

        if self.use_cls:
            cls = self.param("cls_embed", nn.initializers.normal(1.0), (1, H))
            cls_tok = jnp.broadcast_to(cls[None, :, :], (B, 1, H))
            tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        tokens = nn.Dropout(emb["dropout"], deterministic=not training)(tokens)
        out = TorchEncoderStack(
            H, cfg["n_heads"], cfg["n_layers"], act, cfg["dropout"], dtype=dt,
            name="transformer",
        )(tokens, training=training)
        return out.astype(jnp.float32)


@register_model("iTransformer")
class iTransformer(nn.Module):
    """iTransformer with method heads mlm / ctc / dyn_behaviour /
    stat_behaviour (reference ``models/itransformer.py:213-411``)."""

    config: Any
    method_name: str
    loss: str = "poisson_nll"
    log_input: bool = True
    vocab_size: int = 41
    blank_id: int = 0
    zero_infinity: bool = True
    n_labels: int = 2

    @classmethod
    def from_config(cls, model_config, **method_kwargs) -> "iTransformer":
        cfg = update_config(resolve_path(DEFAULT_CONFIG), model_config)
        from llm_bci_tpu.interop.torch_import import load_saved_component_config

        for comp in ("encoder", "decoder"):
            pt = cfg[comp].get("from_pt")
            if pt:
                # ours (yaml) or a reference torch checkpoint's *_config.pth
                saved = load_saved_component_config(pt, comp)
                if saved is not None:
                    cfg[comp] = update_config(cfg[comp], saved)
                cfg[comp]["from_pt"] = pt
        if method_kwargs.get("compute_dtype") and "compute_dtype" not in cfg["encoder"]:
            cfg["encoder"]["compute_dtype"] = method_kwargs["compute_dtype"]
        kwargs = {
            k: v
            for k, v in method_kwargs.items()
            if k in (
                "method_name", "loss", "log_input", "vocab_size", "blank_id",
                "zero_infinity", "n_labels",
            )
        }
        return cls(config=to_plain_dict(cfg), **kwargs)

    def setup(self):
        cfg = self.config
        regions = cfg["encoder"].get("regions") or []
        r_to_i = {r: i for i, r in enumerate(regions)}
        self.masker_cfgs = tuple(
            MaskerConfig.from_config(DictConfig(m), region_to_id=r_to_i)
            for m in cfg["masker"].values()
        )
        self.use_cls = cfg["decoder"]["use_cls"]
        self.encoder = iTransformerEncoder(
            config=cfg["encoder"], use_cls=self.use_cls, name="encoder"
        )

        method = self.method_name
        max_n_bins = cfg["encoder"]["embedder"]["max_n_bins"]
        if method == "mlm":
            n_outputs = max_n_bins
        elif method == "ctc":
            n_outputs = self.vocab_size * max_n_bins
            self.output_shape = (max_n_bins, self.vocab_size)
        elif method == "dyn_behaviour":
            n_outputs = max_n_bins
        elif method == "stat_behaviour":
            n_outputs = self.n_labels if self.loss == "xent" else 1
        else:
            raise ValueError(f"Method {method} not implemented")
        self.n_outputs = n_outputs

    @nn.compact
    def _decode(self, x: jax.Array, training: bool) -> jax.Array:
        cfg = self.config
        method = self.method_name
        if method in ("ctc", "dyn_behaviour", "stat_behaviour") and not self.use_cls:
            x = x.sum(axis=1)  # AverageTokens over channels (reference :30-36)
        if cfg["decoder"]["mlp_decoder"]:
            x = nn.Dense(cfg["encoder"]["hidden_size"], name="decoder_hidden")(x)
            x = ACT2FN[cfg["decoder"]["activation"]](x)
        preds = nn.Dense(self.n_outputs, name="decoder_out")(x)
        if method == "mlm" and not self.log_input:
            preds = nn.relu(preds)
        if method == "ctc":
            preds = preds.reshape(preds.shape[:-1] + self.output_shape)
            preds = nn.log_softmax(preds, axis=-1)
        return preds

    def __call__(
        self,
        spikes: jax.Array,                 # (B, T, N)
        spikes_mask: jax.Array,            # (B, T)
        spikes_timestamp: jax.Array,       # (B, T)
        spikes_spacestamp: Optional[jax.Array] = None,  # (B, N)
        spikes_lengths: Optional[jax.Array] = None,     # (B,)
        targets: Optional[jax.Array] = None,
        targets_lengths: Optional[jax.Array] = None,
        neuron_regions_idx: Optional[jax.Array] = None,  # (B, N)
        neuron_depths: Optional[jax.Array] = None,       # (B, N)
        training: bool = False,
        masker_overrides: Optional[dict] = None,
    ) -> iTransformerOutput:
        method = self.method_name
        if method == "mlm":
            targets = spikes

        if self.masker_cfgs:
            key = (
                self.make_rng("mask")
                if training or any(c.force_active for c in self.masker_cfgs)
                else jax.random.PRNGKey(0)
            )
            spikes, targets_mask = apply_maskers(
                self.masker_cfgs,
                spikes,
                key,
                training,
                neuron_regions_idx=neuron_regions_idx,
                overrides=masker_overrides,
            )
        else:
            targets_mask = jnp.zeros(spikes.shape, dtype=jnp.int32)

        x = self.encoder(
            spikes,
            spikes_timestamp,
            spikes_spacestamp,
            neuron_regions_idx,
            neuron_depths,
            training,
        )

        if self.use_cls:
            x = x[:, 1:, :] if method == "mlm" else x[:, 0, :]

        preds = self._decode(x, training)

        if method == "mlm":
            preds = preds.transpose(0, 2, 1)             # (B, T, N)
            tmask = targets_mask & spikes_mask[:, :, None]
            if self.loss == "poisson_nll":
                losses = poisson_nll_loss(preds, targets, log_input=self.log_input)
            elif self.loss == "mse":
                losses = mse_loss(preds, targets)
            else:
                raise ValueError(f"Loss {self.loss} not implemented yet for mlm")
            loss = (losses * tmask).sum()
            return iTransformerOutput(
                loss=loss, n_examples=tmask.sum(), preds=preds, targets=targets, mask=tmask
            )

        if method == "dyn_behaviour":
            tmask = spikes_mask
            loss = (mse_loss(preds, targets) * tmask).sum()
            return iTransformerOutput(
                loss=loss, n_examples=tmask.sum(), preds=preds, targets=targets, mask=tmask
            )

        if method == "stat_behaviour":
            if self.loss == "xent":
                loss = cross_entropy_loss(preds, targets[:, 0].astype(jnp.int32)).sum()
            else:
                loss = mse_loss(preds[:, 0], targets[:, 0]).sum()
            return iTransformerOutput(
                loss=loss,
                n_examples=jnp.asarray(targets.shape[0], dtype=jnp.int32),
                preds=preds,
                targets=targets,
            )

        # ctc: preds (B, max_n_bins, vocab)
        loss = ctc_loss(
            preds,
            targets,
            spikes_lengths,
            targets_lengths,
            blank_id=self.blank_id,
            zero_infinity=self.zero_infinity,
        ).sum()
        return iTransformerOutput(
            loss=loss,
            n_examples=targets_lengths.sum(),
            preds=preds,
            targets=targets,
        )

    # -- checkpointing (reference models/itransformer.py:403-411) --

    @staticmethod
    def save_checkpoint(save_dir: str, params: Dict) -> None:
        from llm_bci_tpu.utils.serialization import save_params

        params = unfreeze(params)
        enc = params.get("encoder", {})
        dec = {k: v for k, v in params.items() if k != "encoder"}
        save_params(os.path.join(save_dir, "encoder.msgpack"), enc)
        save_params(os.path.join(save_dir, "decoder.msgpack"), dec)

    def save_config(self, save_dir: str) -> None:
        for comp in ("encoder", "decoder"):
            with open(os.path.join(save_dir, f"{comp}_config.yaml"), "w") as f:
                yaml.safe_dump(to_plain_dict(self.config[comp]), f)

    def load_checkpoint_params(self, load_dir: str, params: Dict) -> Dict:
        from llm_bci_tpu.utils.serialization import load_params

        params = unfreeze(params)
        from llm_bci_tpu.interop.torch_import import is_torch_checkpoint

        if is_torch_checkpoint(load_dir):
            from llm_bci_tpu.interop.torch_import import itransformer_params_from_torch

            return itransformer_params_from_torch(load_dir, params)
        enc_path = os.path.join(load_dir, "encoder.msgpack")
        if os.path.exists(enc_path):
            params["encoder"] = load_params(enc_path, params["encoder"])
        dec_path = os.path.join(load_dir, "decoder.msgpack")
        if os.path.exists(dec_path):
            dec = {k: v for k, v in params.items() if k != "encoder"}
            dec = load_params(dec_path, dec)
            params.update(dec)
        return params

    def warm_start_params(self, params: Dict) -> Dict:
        from llm_bci_tpu.interop.torch_import import (
            is_torch_checkpoint,
            itransformer_params_from_torch,
        )

        enc_pt = self.config["encoder"].get("from_pt")
        if enc_pt:
            params = unfreeze(params)
            if is_torch_checkpoint(enc_pt):
                params = itransformer_params_from_torch(
                    enc_pt, params, components=("encoder",)
                )
            else:
                from llm_bci_tpu.utils.serialization import load_params

                params["encoder"] = load_params(
                    os.path.join(enc_pt, "encoder.msgpack"), params["encoder"]
                )
        dec_pt = self.config["decoder"].get("from_pt")
        if dec_pt:
            params = unfreeze(params)
            if is_torch_checkpoint(dec_pt) or is_torch_checkpoint(
                dec_pt, "decoder"
            ):
                params = itransformer_params_from_torch(
                    dec_pt, params, components=("decoder",)
                )
            else:
                from llm_bci_tpu.utils.serialization import load_params

                dec = {k: v for k, v in params.items() if k != "encoder"}
                dec = load_params(os.path.join(dec_pt, "decoder.msgpack"), dec)
                params.update(dec)
        return params
