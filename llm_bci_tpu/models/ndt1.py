"""NDT1 — transformer encoder over time-binned spikes (TPU-native rebuild).

Functional parity with the reference ``models/ndt1.py`` (flagship model for
mlm / autoregressive SSL and CTC phoneme decoding), redesigned for JAX/XLA:

* flax.linen module tree; parameters are a pytree sharded via
  :mod:`llm_bci_tpu.parallel` partition rules (FSDP instead of ZeRO).
* ``nn.Unfold`` temporal stacking + projection (reference
  ``models/ndt1.py:133-142``) becomes ONE strided conv
  (:class:`StackProjection`) — no frame materialization, conv-transpose
  backward.
* per-day ``adapt`` embedding (reference ``models/ndt1.py:123-130``: a python
  loop over per-day ``nn.Linear``) becomes one batched einsum over a stacked
  ``(n_days, n_channels, input_dim)`` weight — no host loop, MXU-friendly.
* attention routes through :func:`llm_bci_tpu.ops.attention.dot_product_attention`
  (XLA fused SDPA now, Pallas flash kernel switchable) with the combined
  banded-context + padding + self-attend mask of ``models/ndt1.py:435-437``.
* stochastic pieces (white/offset noise ``models/ndt1.py:99-104``, maskers,
  dropout) draw from named flax RNG streams — deterministic eval by default.

Attention-probability dropout (``models/ndt1.py:289``) is applied with
torch SDPA semantics on BOTH paths: the XLA path materializes the probs,
the flash (Pallas) path evaluates a counter-based keep mask inside the
kernel (no (B, H, T, T) tensors ever exist).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import linen as nn
from flax.core import unfreeze

from llm_bci_tpu.config import DictConfig, update_config, to_plain_dict, resolve_path
from llm_bci_tpu.model_output import ModelOutput
from llm_bci_tpu.models.masker import MaskerConfig, apply_maskers
from llm_bci_tpu.ops.attention import dot_product_attention, make_attention_mask
from llm_bci_tpu.ops.context import create_context_mask
from llm_bci_tpu.ops.ctc import ctc_loss
from llm_bci_tpu.ops.flash_attention import FLASH_AUTO_MIN_T as _FLASH_AUTO_MIN_T
from llm_bci_tpu.ops.losses import mse_loss, poisson_nll_loss
from llm_bci_tpu.ops.rotary import apply_rotary_pos_emb, rope_cos_sin
from llm_bci_tpu.ops.smoothing import gaussian_kernel, smooth_spikes
from llm_bci_tpu.registry import register_model

DEFAULT_CONFIG = "configs/ndt1.yaml"

ACT2FN: Dict[str, Callable] = {
    "softsign": nn.soft_sign,
    # exact (erf) gelu: torch nn.GELU / transformers ACT2FN["gelu"] default,
    # which the reference uses everywhere; flax's default is the tanh approx.
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
    "silu": nn.silu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def dtype_from(name) -> Any:
    """'bfloat16'/'float32'/None → jnp dtype (None → float32)."""
    if name in (None, "float32", "fp32"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float16", "fp16"):
        return jnp.float16
    return jnp.dtype(name)


def torch_linear_kernel_init(scale: float = 1.0):
    """Kaiming-uniform kernel init matching ``torch.nn.Linear`` defaults
    (uniform in ±1/sqrt(fan_in)), with an optional fixup scale
    (``models/ndt1.py:332-344``)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = scale / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NDT1Output(ModelOutput):
    pass


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class SmoothAndNoise(nn.Module):
    """Gaussian temporal smoothing + train-time white/constant-offset noise
    (reference ``models/ndt1.py:78-107``). Pure elementwise + depthwise conv;
    XLA fuses it into the embedding matmul's prologue."""

    noise: bool
    smooth_sd: Optional[float]
    white_noise_sd: Optional[float]
    constant_offset_sd: Optional[float]

    @nn.compact
    def __call__(self, spikes: jax.Array, training: bool) -> jax.Array:
        B, T, N = spikes.shape
        if self.smooth_sd is not None:
            kernel = jnp.asarray(gaussian_kernel(self.smooth_sd))
            spikes = smooth_spikes(spikes, kernel)
        if self.noise and training:
            if self.white_noise_sd is not None:
                key = self.make_rng("noise")
                spikes = spikes + self.white_noise_sd * jax.random.normal(
                    key, (B, T, N), spikes.dtype
                )
            if self.constant_offset_sd is not None:
                key = self.make_rng("noise")
                spikes = spikes + self.constant_offset_sd * jax.random.normal(
                    key, (B, 1, N), spikes.dtype
                )
        return spikes


class StackProjection(nn.Module):
    """Temporal stacking + projection fused as ONE strided conv:
    ``out[b,l,h] = Σ_{w,d} x[b, l·stride+w, d] · kernel[w·D+d, h]`` — the
    reference's Unfold→Linear (``models/ndt1.py:133-142,179-183``) without
    ever materializing the ``(B, L, size·D)`` frame tensor (the size/stride
    overlap makes it ~size/stride× the input bytes), and with a
    conv-transpose backward instead of the gather's scatter-add (measured
    ~2.3 ms faster fwd+bwd at flagship shapes on v5e). Params keep the
    Dense names/shapes (``kernel (size·D, H)``, ``bias (H,)``) so
    checkpoints and the torch-import bridge are unchanged."""

    hidden_size: int
    size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:     # (B, T, D) -> (B, L, H)
        D = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_linear_kernel_init(),
            (self.size * D, self.hidden_size),
        )
        bias = self.param(
            "bias", torch_linear_bias_init(self.size * D), (self.hidden_size,)
        )
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.reshape(self.size, D, self.hidden_size).astype(self.dtype),
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(self.dtype)


def stack_timesteps(x: jax.Array, size: int, stride: int) -> jax.Array:
    """Temporal stacking: frame ``t'`` concatenates bins
    ``[t'*stride, t'*stride + size)`` along features. Replaces the reference
    ``nn.Unfold`` (``models/ndt1.py:133-142,179-183``) with a static gather —
    XLA lowers it to a strided load feeding the projection matmul."""
    B, T, D = x.shape
    L = 1 + (T - size) // stride
    idx = np.arange(L)[:, None] * stride + np.arange(size)[None, :]   # (L, size)
    frames = x[:, idx, :]                                             # (B, L, size, D)
    return frames.reshape(B, L, size * D)


def stacked_lengths(lengths: jax.Array, size: int, stride: int, active: bool) -> jax.Array:
    """Sequence lengths after stacking (reference ``models/ndt1.py:207-208``)."""
    if not active:
        return lengths
    return (1 + (lengths - size) // stride).astype(lengths.dtype)


class NeuralEmbeddingLayer(nn.Module):
    """Spike embedding: (per-day) linear, activation, temporal stacking,
    learned positional embedding, optional day/block prefix tokens
    (reference ``models/ndt1.py:110-204``)."""

    hidden_size: int
    n_channels: int
    n_blocks: int
    n_days: int
    max_F: int
    input_dim: int
    adapt: bool
    day_token: bool
    block_token: bool
    pos: bool
    act: str
    use_bias: bool
    dropout: float
    stack_active: bool
    stack_size: int
    stack_stride: int
    stack_pad_multiple: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        spikes: jax.Array,            # (B, T, N)
        spikes_mask: jax.Array,       # (B, T)
        spikes_timestamp: jax.Array,  # (B, T)
        block_idx: Optional[jax.Array],
        day_idx: Optional[jax.Array],
        training: bool,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if (self.adapt or self.day_token) and day_idx is None:
            raise ValueError("adapt/day_token require a day_idx batch column")
        if self.block_token and block_idx is None:
            raise ValueError("block_token requires a block_idx batch column")
        if self.adapt:
            # Stacked per-day weights; one einsum instead of a host loop over
            # per-day nn.Linear (reference models/ndt1.py:123-130,170).
            w = self.param(
                "embed_spikes_days",
                torch_linear_kernel_init(),
                (self.n_days, self.n_channels, self.input_dim),
            )
            x = jnp.einsum(
                "btc,bcd->btd",
                spikes.astype(self.dtype),
                w[day_idx].astype(self.dtype),
            )
            if self.use_bias:
                b = self.param(
                    "embed_spikes_days_bias",
                    torch_linear_bias_init(self.n_channels),
                    (self.n_days, self.input_dim),
                )
                x = x + b[day_idx][:, None, :]
        else:
            x = nn.Dense(
                self.input_dim,
                use_bias=self.use_bias,
                dtype=self.dtype,
                kernel_init=torch_linear_kernel_init(),
                bias_init=torch_linear_bias_init(self.n_channels),
                name="embed_spikes",
            )(spikes)

        x = ACT2FN[self.act](x)

        if self.stack_active:
            x = StackProjection(
                hidden_size=self.hidden_size,
                size=self.stack_size,
                stride=self.stack_stride,
                dtype=self.dtype,
                name="stack_projection",
            )(x)
            L = x.shape[1]
            spikes_timestamp = spikes_timestamp[:, :L]
            # A stacked frame is valid only if every source bin was valid
            # (reference models/ndt1.py:181-183 prod over the unfold window).
            mask_frames = stack_timesteps(
                spikes_mask[:, :, None].astype(jnp.float32),
                self.stack_size,
                self.stack_stride,
            )
            spikes_mask = jnp.prod(mask_frames, axis=-1).astype(spikes_mask.dtype)
            # Tile-align the stacked length: the flagship recipe yields
            # L = (512-32)/4+1 = 121, which mis-tiles every (M=121, ...)
            # matmul against the TPU's 8-sublane grid. Pad frames are
            # attention-masked and beyond every CTC input length, so they
            # are semantically inert (the CTC head additionally pins their
            # log-probs to blank for decode hygiene).
            pad = (-x.shape[1]) % max(self.stack_pad_multiple, 1)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                spikes_mask = jnp.pad(spikes_mask, ((0, 0), (0, pad)))
                spikes_timestamp = jnp.pad(spikes_timestamp, ((0, 0), (0, pad)))
        else:
            x = nn.Dense(
                self.hidden_size,
                dtype=self.dtype,
                kernel_init=torch_linear_kernel_init(),
                bias_init=torch_linear_bias_init(self.input_dim),
                name="projection",
            )(x)

        if self.pos:
            pos_table = self.param(
                "embed_pos", nn.initializers.normal(1.0), (self.max_F, self.hidden_size)
            )
            x = x + pos_table[spikes_timestamp].astype(self.dtype)

        if self.block_token:
            block_table = self.param(
                "block_embedding", nn.initializers.normal(1.0), (self.n_blocks, self.hidden_size)
            )
            x = jnp.concatenate([block_table[block_idx][:, None, :], x], axis=1)
            spikes_mask = jnp.concatenate(
                [jnp.ones_like(spikes_mask[:, :1]), spikes_mask], axis=1
            )

        if self.day_token:
            day_table = self.param(
                "day_embedding", nn.initializers.normal(1.0), (self.n_days, self.hidden_size)
            )
            x = jnp.concatenate([day_table[day_idx][:, None, :], x], axis=1)
            spikes_mask = jnp.concatenate(
                [jnp.ones_like(spikes_mask[:, :1]), spikes_mask], axis=1
            )

        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x, spikes_mask, spikes_timestamp


class NeuralAttention(nn.Module):
    """Multi-head self-attention with optional RoPE; masks/bias handled by
    :func:`llm_bci_tpu.ops.attention.dot_product_attention`
    (reference ``models/ndt1.py:232-292``)."""

    hidden_size: int
    n_heads: int
    use_bias: bool
    dropout: float
    use_rope: bool
    rope_theta: float
    max_F: int
    n_layers: int
    fixup_init: bool
    dtype: Any = jnp.float32
    use_flash: bool = False
    context_forward: Optional[int] = None   # flash path band (None = unbounded)
    context_backward: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,               # (B, T, H)
        attn_mask: Optional[jax.Array],  # (B, 1, T, T) bool, or None (flash)
        key_valid: Optional[jax.Array],  # (B, T), flash path padding mask
        timestamp: Optional[jax.Array],
        training: bool,
    ) -> jax.Array:
        B, T, _ = x.shape
        head_size = self.hidden_size // self.n_heads
        assert self.hidden_size % self.n_heads == 0

        fixup = 0.67 * self.n_layers ** (-0.25) if self.fixup_init else 1.0
        dense = lambda name, scale=1.0: nn.Dense(
            self.hidden_size,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(scale),
            bias_init=torch_linear_bias_init(self.hidden_size),
            name=name,
        )
        q = dense("query")(x).reshape(B, T, self.n_heads, head_size)
        k = dense("key")(x).reshape(B, T, self.n_heads, head_size)
        v = dense("value", fixup * (2**0.5) if self.fixup_init else 1.0)(x).reshape(
            B, T, self.n_heads, head_size
        )

        if self.use_rope:
            cos, sin = rope_cos_sin(head_size, self.max_F, self.rope_theta)
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            qh, kh = apply_rotary_pos_emb(qh, kh, timestamp, jnp.asarray(cos), jnp.asarray(sin))
            q = qh.transpose(0, 2, 1, 3)
            k = kh.transpose(0, 2, 1, 3)

        if self.use_flash and attn_mask is None:
            from llm_bci_tpu.ops.flash_attention import banded_flash_attention

            # Attention-prob dropout runs INSIDE the kernel (counter-based
            # mask, torch SDPA semantics — reference models/ndt1.py:289);
            # no (B, H, T, T) probs/keep tensors are materialized.
            out = banded_flash_attention(
                q, k, v, key_valid,
                context_forward=self.context_forward,
                context_backward=self.context_backward,
                dropout_rate=self.dropout if training else 0.0,
                dropout_rng=self.make_rng("dropout")
                if training and self.dropout > 0.0
                else None,
            )
        else:
            # Attention-probability dropout with torch SDPA semantics
            # (reference models/ndt1.py:289: dropout_p = dropout in training).
            out = dot_product_attention(
                q, k, v, mask=attn_mask,
                dropout_rate=self.dropout if training else 0.0,
                dropout_rng=self.make_rng("dropout")
                if training and self.dropout > 0.0
                else None,
            )
        out = out.reshape(B, T, self.hidden_size)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return dense("out_proj", fixup)(out)


class NeuralMLP(nn.Module):
    """Up-proj → act → down-proj → dropout (reference ``models/ndt1.py:214-227``)."""

    hidden_size: int
    inter_size: int
    act: str
    use_bias: bool
    dropout: float
    fixup_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:
        x = nn.Dense(
            self.inter_size,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(self.hidden_size),
            name="up_proj",
        )(x)
        x = ACT2FN[self.act](x)
        x = nn.Dense(
            self.hidden_size,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(self.fixup_scale),
            bias_init=torch_linear_bias_init(self.inter_size),
            name="down_proj",
        )(x)
        return nn.Dropout(self.dropout, deterministic=not training)(x)


class NeuralEncoderLayer(nn.Module):
    """Pre-LN block: LN→attn→residual, LN→MLP→residual
    (reference ``models/ndt1.py:299-329``)."""

    max_F: int
    cfg: Any  # transformer sub-config (hashable DictConfig snapshot)
    dtype: Any = jnp.float32
    use_flash: bool = False
    context_forward: Optional[int] = None
    context_backward: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attn_mask: Optional[jax.Array],
        key_valid: Optional[jax.Array],
        timestamp: Optional[jax.Array],
        training: bool,
    ) -> jax.Array:
        c = self.cfg
        fixup = 0.67 * c["n_layers"] ** (-0.25) if c["fixup_init"] else 1.0
        x = x + NeuralAttention(
            hidden_size=c["hidden_size"],
            n_heads=c["n_heads"],
            use_bias=c["attention_bias"],
            dropout=c["dropout"],
            use_rope=c["use_rope"],
            rope_theta=c["rope_theta"],
            max_F=self.max_F,
            n_layers=c["n_layers"],
            fixup_init=c["fixup_init"],
            dtype=self.dtype,
            use_flash=self.use_flash,
            context_forward=self.context_forward,
            context_backward=self.context_backward,
            name="attn",
        )(
            nn.LayerNorm(name="ln1")(x), attn_mask, key_valid,
            timestamp if c["use_rope"] else None, training,
        )
        x = x + NeuralMLP(
            hidden_size=c["hidden_size"],
            inter_size=c["inter_size"],
            act=c["act"],
            use_bias=c["mlp_bias"],
            dropout=c["dropout"],
            fixup_scale=fixup,
            dtype=self.dtype,
            name="mlp",
        )(nn.LayerNorm(name="ln2")(x), training)
        return x


class NeuralFactorsProjection(nn.Module):
    """Optional projection to a low-dim factor space
    (reference ``models/ndt1.py:348-373``)."""

    hidden_size: int
    active: bool
    size: int
    act: str
    use_bias: bool
    dropout: float
    fixup_init: bool
    init_range: float

    @property
    def out_size(self) -> int:
        return self.size if self.active else self.hidden_size

    @nn.compact
    def __call__(self, x: jax.Array, training: bool) -> jax.Array:
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        if not self.active:
            return x
        kernel_init = (
            nn.initializers.uniform(scale=2 * self.init_range)
            if self.fixup_init
            else torch_linear_kernel_init()
        )
        # uniform(scale) is [0, scale); recenter to ±init_range when fixup.
        if self.fixup_init:
            base = kernel_init

            def kernel_init(key, shape, dtype=jnp.float32):  # noqa: F811
                return base(key, shape, dtype) - self.init_range

        x = nn.Dense(
            self.size,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=nn.initializers.zeros if self.fixup_init else torch_linear_bias_init(self.hidden_size),
            name="proj",
        )(x)
        return ACT2FN[self.act](x)


class NeuralEncoder(nn.Module):
    """Full NDT1 trunk: smooth+noise → maskers → embed/stack → transformer →
    out-norm → factors projection (reference ``models/ndt1.py:376-450``)."""

    config: Any  # plain-dict encoder config snapshot

    def setup(self):
        cfg = self.config
        emb = cfg["embedder"]
        tr = cfg["transformer"]
        dt = dtype_from(cfg.get("compute_dtype"))
        self.compute_dtype = dt
        self.masker_cfgs = tuple(
            MaskerConfig.from_config(DictConfig(m)) for m in cfg["masker"].values()
        )
        self.context_mask_np = create_context_mask(
            cfg["context"]["forward"], cfg["context"]["backward"], emb["max_F"]
        )
        self.smooth_and_noise = SmoothAndNoise(
            noise=cfg["smooth_and_noise"]["noise"],
            smooth_sd=cfg["smooth_and_noise"]["smooth_sd"],
            white_noise_sd=cfg["smooth_and_noise"]["white_noise_sd"],
            constant_offset_sd=cfg["smooth_and_noise"]["constant_offset_sd"],
        )
        self.embedder = NeuralEmbeddingLayer(
            hidden_size=tr["hidden_size"],
            n_channels=emb["n_channels"],
            n_blocks=emb["n_blocks"],
            n_days=emb["n_days"],
            max_F=emb["max_F"],
            input_dim=emb["input_dim"],
            adapt=emb["adapt"],
            day_token=emb["day_token"],
            block_token=emb["block_token"],
            pos=emb["pos"],
            act=emb["act"],
            use_bias=emb["bias"],
            dropout=emb["dropout"],
            stack_active=emb["stack"]["active"],
            stack_size=emb["stack"]["size"],
            stack_stride=emb["stack"]["stride"],
            stack_pad_multiple=int(emb["stack"].get("pad_to_multiple", 1)),
            dtype=dt,
        )
        ctx = cfg["context"]
        # flash_attention: true | false | "auto". "auto" picks the Pallas
        # kernel per traced sequence length (wins at long unstacked mlm
        # shapes, loses to XLA SDPA at the short stacked-CTC lengths) —
        # measured crossover recorded in _FLASH_AUTO_MIN_T.
        mode = tr.get("flash_attention", "auto")
        self.flash_mode = {True: "on", False: "off"}.get(mode, str(mode))
        fwd_w = None if ctx["forward"] < 0 else ctx["forward"]
        bwd_w = None if ctx["backward"] < 0 else ctx["backward"]
        # context value -1 means "mask self-offset" (window width -1 in that
        # direction, models/ndt1.py:30-41); only expressible as a dense mask.
        flash_ok = ctx["forward"] != -1 and ctx["backward"] != -1
        self.flash_possible = flash_ok and self.flash_mode != "off"
        self.layers = [
            NeuralEncoderLayer(
                max_F=emb["max_F"], cfg=tr, dtype=dt,
                use_flash=self.flash_possible,
                context_forward=fwd_w, context_backward=bwd_w,
                name=f"layer_{i}",
            )
            for i in range(tr["n_layers"])
        ]
        self.out_norm = nn.LayerNorm(name="out_norm")
        fac = cfg["factors"]
        self.out_proj = NeuralFactorsProjection(
            hidden_size=tr["hidden_size"],
            active=fac["active"],
            size=fac["size"],
            act=fac["act"],
            use_bias=fac["bias"],
            dropout=fac["dropout"],
            fixup_init=fac["fixup_init"],
            init_range=fac["init_range"],
        )

    def _use_flash_now(self, T: int, B: Optional[int] = None) -> bool:
        """Per-trace flash decision: T is static under jit, so "auto" costs
        nothing at runtime. The Pallas kernel needs a TPU backend (or the
        test-only interpreter mode). On a multi-device op mesh the kernel
        runs under ``shard_map`` over the ``data`` axis, which needs the
        (static) batch divisible by it — ragged eval tail batches fall back
        to the XLA path, like the CTC loss does."""
        if not self.flash_possible:
            return False
        from llm_bci_tpu.ops import flash_attention as fa
        from llm_bci_tpu.ops.spmd import batch_shardable, sequence_sharded

        backend_ok = jax.default_backend() == "tpu" or fa._INTERPRET
        if not backend_ok:
            return False
        if B is not None and not batch_shardable(B):
            self._note_flash_fallback(
                f"batch {B} not shardable over the mesh data axis "
                "(ragged eval tail)"
            )
            return False
        if sequence_sharded():
            # sp > 1: activations are time-sharded; the data-axis shard_map
            # around the kernel would all-gather T per layer. XLA SDPA keeps
            # the sp layout (GSPMD gathers K/V once per attention instead).
            self._note_flash_fallback(
                "sequence-parallel (sp>1) activations are time-sharded; the "
                "XLA SDPA path keeps the sp layout"
            )
            return False
        if self.flash_mode == "on":
            return True
        return self.flash_mode == "auto" and T >= _FLASH_AUTO_MIN_T

    def _note_flash_fallback(self, why: str) -> None:
        """An explicit ``flash_attention: on`` falling back to the XLA path
        must be loud — a user forcing the Pallas kernel (e.g. to benchmark
        it) would otherwise measure the wrong code path. ``auto`` fallbacks
        stay silent (that's what auto means)."""
        if self.flash_mode == "on":
            import warnings

            warnings.warn(
                f"flash_attention: on — falling back to XLA SDPA: {why}",
                stacklevel=3,
            )

    def __call__(
        self,
        spikes: jax.Array,            # (B, T, N)
        spikes_mask: jax.Array,       # (B, T)
        spikes_timestamp: jax.Array,  # (B, T)
        spikes_lengths: jax.Array,    # (B,)
        block_idx: Optional[jax.Array] = None,
        day_idx: Optional[jax.Array] = None,
        training: bool = False,
        neuron_regions_idx: Optional[jax.Array] = None,
        masker_overrides: Optional[dict] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, T, N = spikes.shape
        remat = bool(self.config.get("remat", False))

        spikes = self.smooth_and_noise(spikes, training)

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

        x, spikes_mask, spikes_timestamp = self.embedder(
            spikes.astype(self.compute_dtype), spikes_mask, spikes_timestamp,
            block_idx, day_idx, training,
        )
        Tn = x.shape[1]

        if self._use_flash_now(Tn, x.shape[0]):
            # Flash path: the band + padding mask is evaluated inside the
            # Pallas kernel — no (B, T, T) mask tensor is ever materialized.
            attn_mask = None
        else:
            # Built at the traced length (not sliced from a max_F buffer): the
            # mask is static numpy per compilation, and generation may extend
            # the sequence past max_F (pos-emb lookups clamp there).
            if Tn <= self.context_mask_np.shape[0]:
                context = jnp.asarray(self.context_mask_np[:Tn, :Tn])
            else:
                cfg_ctx = self.config["context"]
                context = jnp.asarray(
                    create_context_mask(cfg_ctx["forward"], cfg_ctx["backward"], Tn)
                )
            attn_mask = make_attention_mask(spikes_mask, context)

        for layer in self.layers:
            if remat:
                x = nn.remat(NeuralEncoderLayer.__call__, static_argnums=(5,))(
                    layer, x, attn_mask, spikes_mask, spikes_timestamp, training
                )
            else:
                x = layer(x, attn_mask, spikes_mask, spikes_timestamp, training)
        x = self.out_norm(x)

        # Drop day/block prefix tokens (reference models/ndt1.py:444-448).
        # Deviation: the reference trims only x and returns the token-extended
        # spikes_mask, which breaks the mlm loss broadcast whenever prefix
        # tokens are on; we trim the mask symmetrically.
        if self.embedder.day_token:
            x = x[:, 1:, :]
            spikes_mask = spikes_mask[:, 1:]
        if self.embedder.block_token:
            x = x[:, 1:, :]
            spikes_mask = spikes_mask[:, 1:]

        return (
            self.out_proj(x, training).astype(jnp.float32),
            spikes_mask,
            targets_mask,
        )


# ---------------------------------------------------------------------------
# NDT1 with method heads
# ---------------------------------------------------------------------------


@register_model("NDT1")
class NDT1(nn.Module):
    """NDT1 with method-specific decoder head and loss
    (reference ``models/ndt1.py:455-693``).

    ``method_name`` in {"mlm", "autoregressive", "ctc", "endtoend"}; method
    kwargs arrive via ``config.method.model_kwargs`` exactly as in the
    reference trainer.
    """

    config: Any        # plain-dict model config (with "encoder"/"decoder")
    method_name: str
    loss: str = "poisson_nll"
    log_input: bool = True
    vocab_size: int = 41
    blank_id: int = 0
    zero_infinity: bool = True

    @classmethod
    def from_config(cls, model_config, **method_kwargs) -> "NDT1":
        """Build from a trainer-style config, merging over the default yaml
        and applying ``from_pt`` config re-merge (reference
        ``models/ndt1.py:463-476``). Returns the module; weights warm-start
        happens in :meth:`load_checkpoint_params`."""
        cfg = update_config(resolve_path(DEFAULT_CONFIG), model_config)
        enc_pt = cfg["encoder"].get("from_pt")
        if enc_pt:
            from llm_bci_tpu.interop.torch_import import load_saved_component_config

            # ours (yaml) or a reference torch checkpoint's encoder_config.pth
            saved = load_saved_component_config(enc_pt, "encoder")
            if saved is not None:
                cfg["encoder"] = update_config(cfg["encoder"], saved)
            cfg["encoder"]["from_pt"] = enc_pt
        if "compute_dtype" in method_kwargs and "compute_dtype" not in cfg["encoder"]:
            cfg["encoder"]["compute_dtype"] = method_kwargs["compute_dtype"]
        kwargs = {k: v for k, v in method_kwargs.items() if k in (
            "method_name", "loss", "log_input", "vocab_size", "blank_id", "zero_infinity"
        )}
        return cls(config=to_plain_dict(cfg), **kwargs)

    def setup(self):
        method = self.method_name
        enc = self.config["encoder"]
        if method == "mlm":
            if not any(m.get("active", True) for m in enc["masker"].values()):
                raise ValueError("Can't pretrain with inactive masking")
            if enc["embedder"]["stack"]["active"]:
                raise ValueError("Can't pretrain with stacked inputs")
            n_outputs = enc["embedder"]["n_channels"]
        elif method == "autoregressive":
            if enc["context"]["forward"] != 0:
                raise ValueError("Autoregressive training requires context.forward == 0")
            if enc["embedder"]["stack"]["active"]:
                raise ValueError("Can't train autoregressive with stacked inputs")
            n_outputs = enc["embedder"]["n_channels"]
        elif method in ("ctc", "endtoend"):
            n_outputs = self.vocab_size
        else:
            raise ValueError(f"Method {method} not implemented yet for NDT1")

        self.encoder = NeuralEncoder(config=enc, name="encoder")
        fac = enc["factors"]
        out_size = fac["size"] if fac["active"] else enc["transformer"]["hidden_size"]
        self.decoder = nn.Dense(
            n_outputs,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(out_size),
            name="decoder",
        )

    def _decode(self, x: jax.Array) -> jax.Array:
        preds = self.decoder(x)
        method = self.method_name
        if method in ("mlm", "autoregressive") and (
            self.loss == "mse" or not self.log_input
        ):
            preds = nn.relu(preds)
        elif method in ("ctc", "endtoend"):
            preds = nn.log_softmax(preds, axis=-1)
        return preds

    def _ssl_loss(self, preds: jax.Array, targets: jax.Array) -> jax.Array:
        if self.loss == "poisson_nll":
            return poisson_nll_loss(preds, targets, log_input=self.log_input)
        if self.loss == "mse":
            return mse_loss(preds, targets)
        raise ValueError(f"Loss {self.loss} not implemented yet for mlm")

    def __call__(
        self,
        spikes: jax.Array,            # (B, T, N)
        spikes_mask: jax.Array,       # (B, T)
        spikes_timestamp: jax.Array,  # (B, T)
        spikes_lengths: jax.Array,    # (B,)
        targets: Optional[jax.Array] = None,
        targets_lengths: Optional[jax.Array] = None,
        block_idx: Optional[jax.Array] = None,
        day_idx: Optional[jax.Array] = None,
        training: bool = False,
        neuron_regions_idx: Optional[jax.Array] = None,
        masker_overrides: Optional[dict] = None,
    ) -> NDT1Output:
        method = self.method_name
        if method in ("mlm", "autoregressive"):
            targets = spikes

        x, spikes_mask_out, targets_mask = self.encoder(
            spikes,
            spikes_mask,
            spikes_timestamp,
            spikes_lengths,
            block_idx,
            day_idx,
            training,
            neuron_regions_idx=neuron_regions_idx,
            masker_overrides=masker_overrides,
        )
        emb = self.config["encoder"]["embedder"]
        lens = stacked_lengths(
            spikes_lengths, emb["stack"]["size"], emb["stack"]["stride"], emb["stack"]["active"]
        )
        preds = self._decode(x)

        if method == "mlm":
            tmask = targets_mask & spikes_mask_out[:, :, None]
            loss = (self._ssl_loss(preds, targets) * tmask).sum()
            return NDT1Output(
                loss=loss,
                n_examples=tmask.sum(),
                preds=preds,
                targets=targets,
                mask=tmask,
            )
        if method == "autoregressive":
            shift_mask = spikes_mask_out[:, :-1]
            loss = (
                self._ssl_loss(preds[:, :-1, :], targets[:, 1:, :])
                * shift_mask[:, :, None]
            ).sum()
            return NDT1Output(
                loss=loss,
                n_examples=shift_mask.sum() * targets.shape[2],
                preds=preds,
                targets=targets,
                mask=spikes_mask_out,
            )
        # ctc / endtoend
        if emb["stack"]["active"]:
            # Frames beyond the unpadded stacked length exist only for tile
            # alignment (pad_to_multiple); they sit past every CTC input
            # length so the loss never sees them, but greedy decodes of the
            # full (B, L', V) preds would. Pin them to blank.
            L_valid = 1 + (spikes.shape[1] - emb["stack"]["size"]) // emb["stack"]["stride"]
            if preds.shape[1] > L_valid:
                pad_rows = preds[:, L_valid:, :]
                blank_row = jnp.full_like(pad_rows, -1e9).at[:, :, self.blank_id].set(0.0)
                preds = jnp.concatenate([preds[:, :L_valid, :], blank_row], axis=1)
        loss = ctc_loss(
            preds,
            targets,
            lens,
            targets_lengths,
            blank_id=self.blank_id,
            zero_infinity=self.zero_infinity,
        ).sum()
        return NDT1Output(
            loss=loss,
            n_examples=jnp.asarray(spikes.shape[0], dtype=jnp.int32),
            preds=preds,
            targets=targets,
        )

    # ------------------------------------------------------------ generation

    def generate(
        self,
        spikes: jax.Array,             # (B, T0, N)
        spikes_mask: jax.Array,        # (B, T0)
        spikes_timestamp: jax.Array,   # (B, T0)
        spikes_lengths: Optional[jax.Array] = None,
        block_idx: Optional[jax.Array] = None,
        day_idx: Optional[jax.Array] = None,
        max_new_bins: int = 16,
    ) -> Tuple[jax.Array, jax.Array]:  # (B, max_new_bins, N) preds, sampled bins
        """Iterative spike-bin generation (reference ``models/ndt1.py:608-682``).

        TPU-first formulation: instead of re-allocating a growing sequence
        per step, a fixed ``(B, T0+max_new_bins, N)`` buffer is extended via
        ``dynamic_update_slice`` with a validity mask — every step runs the
        same static-shape forward, so the whole loop jits as one program.
        ``autoregressive`` predicts the next bin from the last valid one and
        Poisson-samples it; ``mlm`` appends a zeroed bin and reconstructs it.
        """
        if self.method_name not in ("mlm", "autoregressive"):
            raise ValueError(f"generate not supported for method {self.method_name}")
        B, T0, N = spikes.shape
        Tmax = T0 + max_new_bins

        buf = jnp.concatenate([spikes, jnp.zeros((B, max_new_bins, N), spikes.dtype)], 1)
        mask = jnp.concatenate(
            [spikes_mask, jnp.zeros((B, max_new_bins), spikes_mask.dtype)], 1
        )
        last_ts = spikes_timestamp[:, -1]
        new_ts = last_ts[:, None] + jnp.arange(1, max_new_bins + 1)[None, :]
        ts = jnp.concatenate([spikes_timestamp, new_ts.astype(spikes_timestamp.dtype)], 1)
        lengths = (
            spikes_lengths
            if spikes_lengths is not None
            else jnp.full((B,), T0, jnp.int32)
        )

        # One lax.scan step per new bin: the encoder is traced ONCE however
        # large max_new_bins is (the unrolled form inlined max_new_bins full
        # encoder copies into one program — compile-time blowup plus
        # O(T·max_new_bins) recompute visible to the scheduler).
        def step(mdl, carry, t_new):
            buf, mask = carry
            if mdl.method_name == "mlm":
                mask = mask.at[:, t_new].set(1)
            x, _, _ = mdl.encoder(buf, mask, ts, lengths, block_idx, day_idx, False)
            preds = mdl._decode(x)
            pos = t_new if mdl.method_name == "mlm" else t_new - 1
            new_preds = preds[:, pos, :]
            new_bins = new_preds
            if mdl.loss == "poisson_nll":
                if mdl.log_input:
                    new_preds = jnp.exp(new_preds)
                    new_bins = new_preds
                key = mdl.make_rng("sample")
                new_bins = jax.random.poisson(key, new_bins).astype(buf.dtype)
            buf = buf.at[:, t_new, :].set(new_bins)
            if mdl.method_name == "autoregressive":
                mask = mask.at[:, t_new].set(1)
            return (buf, mask), (new_preds, new_bins)

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"sample": True},
            in_axes=0,
            out_axes=1,
        )
        _, (preds_out, bins_out) = scan(
            self, (buf, mask), jnp.arange(T0, T0 + max_new_bins)
        )
        return preds_out, bins_out

    # -- checkpointing (component-level, reference models/ndt1.py:685-692) --

    @staticmethod
    def save_checkpoint(save_dir: str, params: Dict) -> None:
        from llm_bci_tpu.utils.serialization import save_params

        params = unfreeze(params)
        save_params(os.path.join(save_dir, "encoder.msgpack"), params["encoder"])
        save_params(os.path.join(save_dir, "decoder.msgpack"), params["decoder"])

    def save_config(self, save_dir: str) -> None:
        with open(os.path.join(save_dir, "encoder_config.yaml"), "w") as f:
            yaml.safe_dump(to_plain_dict(self.config["encoder"]), f)

    def load_checkpoint_params(self, load_dir: str, params: Dict) -> Dict:
        from llm_bci_tpu.utils.serialization import load_params

        params = unfreeze(params)
        from llm_bci_tpu.interop.torch_import import is_torch_checkpoint

        if is_torch_checkpoint(load_dir):
            # Migration path: ``from_pt`` pointed at a checkpoint saved by
            # the PyTorch reference (encoder.bin/decoder.bin,
            # reference models/ndt1.py:685-692) — import it in place.
            from llm_bci_tpu.interop.torch_import import ndt1_params_from_torch

            return ndt1_params_from_torch(load_dir, params)
        params["encoder"] = load_params(
            os.path.join(load_dir, "encoder.msgpack"), params["encoder"]
        )
        dec = os.path.join(load_dir, "decoder.msgpack")
        if os.path.exists(dec):
            params["decoder"] = load_params(dec, params["decoder"])
        return params

    def warm_start_params(self, params: Dict) -> Dict:
        """Apply ``from_pt`` warm start if configured (reference
        ``models/ndt1.py:468-476,502-504``)."""
        enc_pt = self.config["encoder"].get("from_pt")
        if enc_pt:
            params = self.load_checkpoint_params(enc_pt, params)
        return params
