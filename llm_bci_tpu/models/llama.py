"""Llama decoder stack in JAX/flax — the BCI workload's LLM trunk.

TPU-native replacement for the reference's HF ``AutoModelForCausalLM``
Llama-2 (+ LoRA via peft) usage (``models/bci.py:11,51-63``):

* bf16 compute / fp32 master params policy instead of the reference's
  force-fp16 cast (``models/bci.py:71``) — bf16 is the MXU-native dtype.
* GQA attention through :func:`llm_bci_tpu.ops.attention.dot_product_attention`.
* LoRA as first-class factored params on selected Dense layers
  (``LoRADense``) — the frozen/trainable split is an optimizer mask
  (see :func:`lora_trainable_mask`), the TPU analog of peft's
  requires_grad partition.
* functional KV cache (explicit pytree in/out) so generation jits with
  static shapes; weights shard over the ``fsdp`` mesh axis (ZeRO-3
  equivalent for the reference's ``deepspeed/kai.yaml`` recipe).

HF weight import for real Llama-2 checkpoints: :func:`load_hf_llama_params`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from llm_bci_tpu.ops.attention import dot_product_attention
from llm_bci_tpu.ops.quant import int8_matmul, quantize_int8
from llm_bci_tpu.ops.rotary import apply_rotary_pos_emb, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False

    @property
    def n_kv(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def debug(cls) -> "LlamaConfig":
        """Tiny config mirroring the reference's debug fixture
        (``models/bci.py:51-53``): 2 layers / 32 hidden / 4 heads."""
        return cls(
            vocab_size=32000,
            hidden_size=32,
            intermediate_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
        )

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LlamaConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return (w * x).astype(dtype)


# Scale used when an int8-quantized layer is initialized from scratch
# (tests / debug models; real runs quantize loaded HF weights instead):
# ±4σ of the normal(0.02) init maps onto the int8 range.
_INT8_INIT_SCALE = 0.02 * 4.0 / 127.0


def _int8_kernel_init(key, shape, dtype):
    w = jax.random.normal(key, shape, jnp.float32) * 0.02
    return jnp.clip(jnp.round(w / _INT8_INIT_SCALE), -127, 127).astype(dtype)


class LoRADense(nn.Module):
    """Dense with optional LoRA adapter: ``y = xW + (alpha/r) * drop(x)AB``.
    The base ``kernel`` is frozen via the optimizer mask; A/B train.

    ``quant="int8"`` stores the frozen base kernel as int8 with one f32
    scale per output channel (``kernel_scale``); the matmul dequantizes
    on the fly via :func:`llm_bci_tpu.ops.quant.int8_matmul`, halving the
    kernel's HBM traffic vs bf16. Requires a frozen base (the int8 leaf
    can't take optimizer updates)."""

    features: int
    use_bias: bool = False
    r: int = 0
    alpha: float = 32.0
    lora_dropout: float = 0.0
    freeze_base: bool = False
    dtype: Any = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, training: bool = False, defer_lora: bool = False
    ):
        in_features = x.shape[-1]
        frozen = self.r > 0 or self.freeze_base
        if self.quant in ("int8", "int8_xla"):
            if not frozen:
                raise ValueError(
                    "quant='int8' requires a frozen base (LoRA or freeze)"
                )
            kernel_q = self.param(
                "kernel", _int8_kernel_init, (in_features, self.features), jnp.int8
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.constant(_INT8_INIT_SCALE),
                (self.features,),
                jnp.float32,
            )
            # "int8_xla" = same storage, partitionable matmul (multi-device
            # meshes; the Trainer rewrites the mode when mesh.size > 1).
            # Serving calls (training=False: prefill AND decode) also take
            # the XLA convert+dot — measured 1014-1017 vs 955 tok/s for the
            # Pallas kernel at 7B/16L greedy decode (r4); the fine-tune
            # step's forward keeps the Pallas kernel at standard shapes
            # (M = B*T > 1024), which wins fwd+bwd there (36.5 vs 34.3
            # samples/s at 7B/16L). Training forwards with B*T <= 1024
            # reroute to XLA inside int8_matmul's "auto" — measured faster
            # at those skinny shapes too (0.98 vs 1.29 ms fwd+bwd at M=512,
            # 7B widths, r5 — ops/quant.py dispatch comment). Same math
            # either way; only the weight-streaming schedule differs.
            y = int8_matmul(
                x,
                kernel_q,
                jax.lax.stop_gradient(kernel_scale),
                out_dtype=self.dtype,
                impl="xla"
                if (self.quant == "int8_xla" or not training)
                else "auto",
            )
        elif self.quant is not None:
            raise ValueError(f"unknown quant mode {self.quant!r}")
        else:
            # Frozen base params are STORED in compute dtype (the reference
            # casts its whole LLM to fp16, models/bci.py:71): they never
            # receive optimizer updates, so no fp32 master copy is needed —
            # and keeping them f32 would re-convert ~2x the bytes from HBM
            # every step.
            kernel = self.param(
                "kernel",
                nn.initializers.normal(0.02),
                (in_features, self.features),
                self.dtype if frozen else jnp.float32,
            ).astype(self.dtype)
            if frozen:
                # stop_gradient lets XLA prune the dW matmul in backward —
                # the optimizer mask alone would still pay for it.
                kernel = jax.lax.stop_gradient(kernel)
            y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.zeros,
                (self.features,),
                self.dtype if frozen else jnp.float32,
            )
            if frozen:
                bias = jax.lax.stop_gradient(bias)
            y = y + bias.astype(self.dtype)
        if self.r > 0:
            a = self.param(
                "lora_A",
                nn.initializers.normal(1.0 / max(self.r, 1)),
                (in_features, self.r),
            ).astype(self.dtype)
            b = self.param("lora_B", nn.initializers.zeros, (self.r, self.features)).astype(
                self.dtype
            )
            if defer_lora:
                # Caller computes the adapter delta itself (grouped with its
                # siblings — see apply_lora_group); params stay under this
                # module's scope so checkpoints/HF import are unchanged.
                return y, a, b
            h = nn.Dropout(self.lora_dropout, deterministic=not training)(x)
            y = y + (self.alpha / self.r) * ((h @ a) @ b)
        if defer_lora:
            return y, None, None
        return y


def apply_lora_group(
    x: jax.Array,
    deferred,                      # sequence of (y_base, a|None, b|None)
    *,
    alpha: float,
    r: int,
    dropout_fn=None,               # callable x→drop(x); None = identity
):
    """Apply the LoRA deltas of several same-input projections as ONE pair
    of matmuls: ``h = drop(x) @ [A_1 … A_g]`` then
    ``Δ = h @ blockdiag(B_1 … B_g)``, split back per projection.

    Rationale: rank-8 adapters emit (B, T, 8) intermediates whose <128-lane
    layout forces XLA relayout copies around every adapter (~0.9 ms/step of
    the BCI profile); grouping q/k/v (and gate/up) reads ``x`` once and cuts
    the tiny-tensor op count 3→1. Exactly equivalent to per-adapter
    application except under ``lora_dropout > 0`` while training, where the
    group shares one input keep-mask (peft draws an independent mask per
    adapter — documented deviation, same marginal rate).
    """
    loras = [(i, a, b) for i, (_, a, b) in enumerate(deferred) if a is not None]
    outs = [y for y, _, _ in deferred]
    if not loras:
        return outs
    if dropout_fn is None:
        dropout_fn = lambda v: v
    if len(loras) == 1:
        i, a, b = loras[0]
        h = dropout_fn(x)
        outs[i] = outs[i] + (alpha / r) * ((h @ a) @ b)
        return outs
    a_cat = jnp.concatenate([a for _, a, _ in loras], axis=1)      # (H, g·r)
    feats = [b.shape[1] for _, _, b in loras]
    b_bd = jax.scipy.linalg.block_diag(*[b for _, _, b in loras])  # (g·r, ΣF)
    h = dropout_fn(x)
    delta = (alpha / r) * ((h @ a_cat) @ b_bd)                     # (B, T, ΣF)
    off = 0
    for (i, _, _), f in zip(loras, feats):
        outs[i] = outs[i] + delta[..., off : off + f]
        off += f
    return outs


def lora_trainable_mask(params: Any, freeze_all_base: bool) -> Any:
    """Bool pytree: True = trainable. With LoRA, only ``lora_A``/``lora_B``
    leaves under the LLM train (peft semantics); ``freeze_all_base`` freezes
    every non-LoRA LLM leaf (reference ``freeze_llm``, ``models/bci.py:65-67``)."""

    def mask(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if any(n.startswith("lora_") for n in names):
            return True
        return not freeze_all_base

    return jax.tree_util.tree_map_with_path(mask, params)


def make_causal_padding_mask(
    attention_mask: jax.Array,  # (B, S) 1 = valid keys
    q_len: int,
    q_offset: jax.Array | int = 0,
) -> jax.Array:  # (B, 1, q_len, S) bool
    """Causal + padding mask: query at absolute position ``q_offset + i`` may
    attend to key j iff ``j <= q_offset + i`` and key j is valid."""
    B, S = attention_mask.shape
    j = jnp.arange(S)[None, :]
    i = jnp.arange(q_len)[:, None] + q_offset
    causal = j <= i                                        # (q_len, S)
    mask = causal[None, :, :] & attention_mask.astype(bool)[:, None, :]
    return mask[:, None, :, :]


class LlamaAttention(nn.Module):
    config: LlamaConfig
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_base: bool = False
    dtype: Any = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, T, H)
        mask: jax.Array,                    # (B, 1, T, S) bool
        positions: jax.Array,               # (B, T)
        cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        training: bool = False,
    ) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
        cfg = self.config
        B, T, _ = x.shape
        H, nH, nKV, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.n_kv, cfg.head_dim

        def proj(name, out):
            r = self.lora_r if name in self.lora_targets else 0
            return LoRADense(
                out, r=r, alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                freeze_base=self.freeze_base, dtype=self.dtype,
                quant=self.quant, name=name,
            )

        # q/k/v share input x: their LoRA deltas fuse into one grouped
        # matmul pair (see apply_lora_group).
        qd = proj("q_proj", nH * hd)(x, training, defer_lora=True)
        kd = proj("k_proj", nKV * hd)(x, training, defer_lora=True)
        vd = proj("v_proj", nKV * hd)(x, training, defer_lora=True)
        drop = nn.Dropout(self.lora_dropout)
        q, k, v = apply_lora_group(
            x, (qd, kd, vd),
            alpha=self.lora_alpha, r=max(self.lora_r, 1),
            dropout_fn=lambda v: drop(v, deterministic=not training),
        )
        q = q.reshape(B, T, nH, hd)
        k = k.reshape(B, T, nKV, hd)
        v = v.reshape(B, T, nKV, hd)

        cos, sin = rope_cos_sin(hd, cfg.max_position_embeddings, cfg.rope_theta)
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        qh, kh = apply_rotary_pos_emb(qh, kh, positions, jnp.asarray(cos), jnp.asarray(sin))
        q = qh.transpose(0, 2, 1, 3).astype(self.dtype)
        k = kh.transpose(0, 2, 1, 3).astype(self.dtype)

        new_cache = None
        if cache is not None:
            # Functional KV cache: write new keys/values at cache_index.
            k_cache = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            new_cache = {"k": k_cache, "v": v_cache}
            k, v = k_cache, v_cache

        # GQA: K/V keep their nKV heads — jax.nn.dot_product_attention
        # broadcasts groups natively (the old jnp.repeat materialized
        # nH/nKV× the K/V (and KV-cache read) bytes every step).
        out = dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(B, T, nH * hd)
        out = proj("o_proj", H)(out, training)
        return out, new_cache


class LlamaMLP(nn.Module):
    config: LlamaConfig
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_base: bool = False
    dtype: Any = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        cfg = self.config

        def proj(name, out):
            r = self.lora_r if name in self.lora_targets else 0
            return LoRADense(
                out, r=r, alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                freeze_base=self.freeze_base, dtype=self.dtype,
                quant=self.quant, name=name,
            )

        gd = proj("gate_proj", cfg.intermediate_size)(x, training, defer_lora=True)
        ud = proj("up_proj", cfg.intermediate_size)(x, training, defer_lora=True)
        drop = nn.Dropout(self.lora_dropout)
        gate, up = apply_lora_group(
            x, (gd, ud),
            alpha=self.lora_alpha, r=max(self.lora_r, 1),
            dropout_fn=lambda v: drop(v, deterministic=not training),
        )
        return proj("down_proj", cfg.hidden_size)(nn.silu(gate) * up, training)


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_base: bool = False
    dtype: Any = jnp.bfloat16
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_index=None, training=False):
        h, new_cache = LlamaAttention(
            self.config, self.lora_r, self.lora_alpha, self.lora_dropout,
            self.lora_targets, self.freeze_base, self.dtype,
            quant=self.quant, name="self_attn",
        )(
            RMSNorm(self.config.rms_norm_eps, name="input_layernorm")(x),
            mask, positions, cache, cache_index, training,
        )
        x = x + h
        h = LlamaMLP(
            self.config, self.lora_r, self.lora_alpha, self.lora_dropout,
            self.lora_targets, self.freeze_base, self.dtype,
            quant=self.quant, name="mlp",
        )(RMSNorm(self.config.rms_norm_eps, name="post_attention_layernorm")(x), training)
        return x + h, new_cache


class LlamaForCausalLM(nn.Module):
    """Causal LM over token ids or pre-spliced ``inputs_embeds`` — the BCI
    path always uses embeds (reference ``models/bci.py:192-196``)."""

    config: LlamaConfig
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_base: bool = False
    dtype: Any = jnp.bfloat16
    remat: bool = False
    quant: Optional[str] = None

    def setup(self):
        cfg = self.config
        # Frozen-base runs (LoRA / freeze_llm) store the table in compute
        # dtype and stop its gradient — the scatter-add of a (vocab, H) f32
        # grad buffer for a frozen table is pure waste.
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            param_dtype=self.dtype if self.freeze_base else jnp.float32,
            name="embed_tokens",
        )
        # remat=True rematerializes each decoder layer in the backward —
        # activation memory drops from O(L·B·T·H) to O(B·T·H), the standard
        # trade for fitting 7B-shape fine-tune batches on one chip.
        layer_cls = (
            nn.remat(LlamaDecoderLayer, static_argnums=(6,))
            if self.remat
            else LlamaDecoderLayer
        )
        self.layers = [
            layer_cls(
                cfg, self.lora_r, self.lora_alpha, self.lora_dropout,
                self.lora_targets, self.freeze_base, self.dtype,
                quant=self.quant, name=f"layers_{i}",
            )
            for i in range(cfg.num_hidden_layers)
        ]
        self.norm = RMSNorm(cfg.rms_norm_eps, name="norm")
        if not cfg.tie_word_embeddings:
            # LoRADense with r=0 == plain Dense, but honors freeze_base
            # (stop_gradient kills the (vocab, H) dW matmul — ~97 GFLOP per
            # flagship step — and the param is stored in compute dtype).
            self.lm_head = LoRADense(
                cfg.vocab_size, use_bias=False, r=0,
                freeze_base=self.freeze_base, dtype=self.dtype,
                quant=self.quant if self.freeze_base else None, name="lm_head",
            )

    def embed(self, input_ids: jax.Array) -> jax.Array:
        table = self.embed_tokens.embedding
        if self.freeze_base:
            table = jax.lax.stop_gradient(table)
        return jnp.take(table, input_ids, axis=0)

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,       # (B, T)
        inputs_embeds: Optional[jax.Array] = None,   # (B, T, H)
        attention_mask: Optional[jax.Array] = None,  # (B, S) over keys
        positions: Optional[jax.Array] = None,       # (B, T)
        cache: Optional[Tuple[Dict[str, jax.Array], ...]] = None,
        cache_index: Optional[jax.Array] = None,
        training: bool = False,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds.astype(self.dtype)
        B, T, _ = x.shape
        S = attention_mask.shape[1] if attention_mask is not None else T
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        q_offset = cache_index if cache_index is not None else 0
        mask = make_causal_padding_mask(attention_mask, T, q_offset)
        if positions is None:
            positions = jnp.arange(T)[None, :] + q_offset
            positions = jnp.broadcast_to(positions, (B, T))

        new_caches = []
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            x, new_cache = layer(x, mask, positions, layer_cache, cache_index, training)
            new_caches.append(new_cache)
        x = self.norm(x)

        if self.config.tie_word_embeddings:
            table = self.embed_tokens.embedding
            if self.freeze_base:
                table = jax.lax.stop_gradient(table)
            logits = x @ table.T.astype(self.dtype)
        else:
            logits = self.lm_head(x)
        logits = logits.astype(jnp.float32)
        return (logits, tuple(new_caches) if cache is not None else None)

    def init_cache(self, batch_size: int, max_len: int):
        cfg = self.config
        layer = lambda: {
            "k": jnp.zeros((batch_size, max_len, cfg.n_kv, cfg.head_dim), self.dtype),
            "v": jnp.zeros((batch_size, max_len, cfg.n_kv, cfg.head_dim), self.dtype),
        }
        return tuple(layer() for _ in range(cfg.num_hidden_layers))


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------

def load_hf_llama_params(model_dir: str, config: LlamaConfig) -> Dict:
    """Convert a HF torch Llama checkpoint into this module's param pytree.
    Host-side, torch-cpu only (weights then get device_put with shardings)."""
    import torch
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32)
    sd = hf.state_dict()

    def t(name):
        return np.asarray(sd[name].numpy())

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": t("model.embed_tokens.weight")},
        "norm": {"weight": t("model.norm.weight")},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": t("lm_head.weight").T}
    for i in range(config.num_hidden_layers):
        p = f"model.layers.{i}."
        params[f"layers_{i}"] = {
            "input_layernorm": {"weight": t(p + "input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": t(p + "post_attention_layernorm.weight")
            },
            "self_attn": {
                "q_proj": {"kernel": t(p + "self_attn.q_proj.weight").T},
                "k_proj": {"kernel": t(p + "self_attn.k_proj.weight").T},
                "v_proj": {"kernel": t(p + "self_attn.v_proj.weight").T},
                "o_proj": {"kernel": t(p + "self_attn.o_proj.weight").T},
            },
            "mlp": {
                "gate_proj": {"kernel": t(p + "mlp.gate_proj.weight").T},
                "up_proj": {"kernel": t(p + "mlp.up_proj.weight").T},
                "down_proj": {"kernel": t(p + "mlp.down_proj.weight").T},
            },
        }
    return params


_QUANT_PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)


def quantize_llama_params(
    params: Dict, mode: str = "int8", quant_lm_head: bool = True
) -> Dict:
    """Quantize the frozen-base projection kernels (and lm_head) of a loaded
    Llama param pytree to int8 + per-output-channel scales — the layout
    ``LoRADense(quant="int8")`` expects. Norms, embeddings, biases and LoRA
    factors pass through untouched. Host-side (numpy); used at HF-import /
    warm-start time."""
    if mode not in ("int8", "int8_xla"):  # identical storage layout
        raise ValueError(f"unknown quant mode {mode!r}")

    def walk(node: Dict, name: str) -> Dict:
        if name == "lm_head" and not quant_lm_head:
            return node
        if name in _QUANT_PROJ_NAMES and "kernel" in node:
            q, scale = quantize_int8(np.asarray(node["kernel"]), axis=0)
            out = {k: v for k, v in node.items() if k != "kernel"}
            out["kernel"] = q
            out["kernel_scale"] = scale
            return out
        return {
            k: walk(v, k) if isinstance(v, dict) else v for k, v in node.items()
        }

    return walk(dict(params), "")
