"""BCI — spike encoder → projector → prompt-spliced Llama LM (TPU rebuild).

Functional parity with the reference ``models/bci.py:31-265`` (the flagship
end-to-end workload: NDT1 trunk feeding a LoRA-adapted Llama-2 that emits
the spoken sentence), redesigned for JAX/XLA:

* the per-example python splice loop (``models/bci.py:143-168``) becomes one
  vectorized gather (:func:`splice_embeds`) — static output length, no host
  loop, batchable on the MXU;
* Llama is the JAX stack in :mod:`llm_bci_tpu.models.llama` with LoRA params
  and an optimizer-mask freeze (peft equivalent); bf16 compute instead of
  the reference's fp16 cast (``models/bci.py:71``);
* generation is a jitted greedy/beam decode with a functional KV cache
  (replaces HF ``llm.generate``, ``models/bci.py:224-246``).

Deliberate deviations (documented per SURVEY.md §7e): the reference passes
``block_idx``/``day_idx`` positionally into the encoder's
``spikes_lengths``/``block_idx`` slots (``models/bci.py:125`` — a latent
arg-shift bug); we pass them by keyword. The reference also instantiates the
unused NDT1 CTC decoder head inside BCI; we keep only the encoder.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import yaml
from flax import linen as nn
from flax.core import unfreeze

from llm_bci_tpu.config import to_plain_dict, update_config, resolve_path
from llm_bci_tpu.model_output import ModelOutput
from llm_bci_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    load_hf_llama_params,
    lora_trainable_mask,
    quantize_llama_params,
)
from llm_bci_tpu.models.ndt1 import ACT2FN, NDT1, NeuralEncoder
from llm_bci_tpu.ops.losses import cross_entropy_loss
from llm_bci_tpu.registry import register_model

DEFAULT_CONFIG = "configs/bci.yaml"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BCIOutput(ModelOutput):
    pass


def splice_embeds(
    text: jax.Array,        # (B, L, H) or (B, L)
    spikes: jax.Array,      # (B, S, H) or (B, S)
    input_split: jax.Array,  # (B,) insertion offset d
) -> jax.Array:             # (B, L+S, ...)
    """Vectorized per-example insertion of ``spikes`` into ``text`` at
    position ``d``: out = [text[:d], spikes, text[d:]]. One gather instead of
    the reference's python concat loop (``models/bci.py:143-166``)."""
    B = text.shape[0]
    L = text.shape[1]
    S = spikes.shape[1]
    d = input_split.reshape(B).astype(jnp.int32)[:, None]           # (B, 1)
    j = jnp.arange(L + S, dtype=jnp.int32)[None, :]                 # (1, L+S)
    in_spike = (j >= d) & (j < d + S)                               # (B, L+S)
    text_idx = jnp.clip(jnp.where(j < d, j, j - S), 0, L - 1)
    spike_idx = jnp.clip(j - d, 0, S - 1)
    t = jnp.take_along_axis(
        text, text_idx.reshape(text_idx.shape + (1,) * (text.ndim - 2)), axis=1
    )
    s = jnp.take_along_axis(
        spikes, spike_idx.reshape(spike_idx.shape + (1,) * (spikes.ndim - 2)), axis=1
    )
    sel = in_spike.reshape(in_spike.shape + (1,) * (text.ndim - 2))
    return jnp.where(sel, s, t)


@register_model("BCI")
class BCI(nn.Module):
    """End-to-end BCI model (reference ``models/bci.py:31-265``)."""

    config: Any                  # plain dict with projector / ndt1 sub-configs
    llama_config: LlamaConfig
    method_name: str = "endtoend"
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_llm: bool = False
    dtype: Any = jnp.bfloat16
    # "int8" stores the frozen LLM base as int8 + per-channel scales
    # (weight-only; LoRA/norms/embeddings stay bf16) — ~half the HBM bytes
    # of the bf16 base (the reference's fp16 layout is the same 2 B/weight).
    quant: Any = None

    @classmethod
    def from_config(cls, model_config, **method_kwargs) -> "BCI":
        cfg = update_config(resolve_path(DEFAULT_CONFIG), model_config)
        # Fully merge the NDT1 defaults here so the config is complete as a
        # plain attribute (setup()-created state is not visible outside
        # init/apply in linen).
        cfg["ndt1"] = update_config(resolve_path("configs/ndt1.yaml"), cfg["ndt1"])
        pt_path = cfg.get("from_pt")
        ndt1_pt = pt_path or method_kwargs.get("load_ndt1_from_pt")
        if ndt1_pt:
            cfg["ndt1"]["encoder"]["from_pt"] = ndt1_pt
        if pt_path:
            # Re-merge the component configs saved with the checkpoint
            # (save_config) so the reloaded model is structurally identical
            # to the trained one (reference from_pretrained re-reads its
            # saved configs, models/bci.py:88-101).
            from llm_bci_tpu.interop.torch_import import load_saved_component_config

            for key in ("projector", "encoder"):
                # ours (yaml) or the reference's *_config.pth next to the bins
                saved = load_saved_component_config(pt_path, key)
                if saved is None:
                    continue
                if key == "projector":
                    cfg["projector"] = update_config(cfg["projector"], saved)
                else:
                    cfg["ndt1"]["encoder"] = update_config(
                        cfg["ndt1"]["encoder"], saved
                    )
                    # the saved config may carry a stale training-time
                    # from_pt (the NDT1 pretrain dir); this reload's source
                    # of truth is the checkpoint itself
                    cfg["ndt1"]["encoder"]["from_pt"] = ndt1_pt

        debug = bool(method_kwargs.get("debug", False))
        saved_llama_cfg = (
            os.path.join(pt_path, "llama_config.yaml") if pt_path else None
        )
        if debug:
            llama_config = LlamaConfig.debug()
        elif saved_llama_cfg and os.path.exists(saved_llama_cfg):
            # checkpoint reload: save_config writes the dataclass as yaml
            # (HF dirs have config.json, checkpoint dirs do not)
            llama_config = LlamaConfig(**yaml.safe_load(open(saved_llama_cfg)))
        else:
            llm_path = method_kwargs.get("llm_path")
            cfg_json = os.path.join(llm_path, "config.json")
            import json

            llama_config = LlamaConfig.from_dict(json.load(open(cfg_json)))
            cfg["llm_path"] = llm_path

        # LoRA adapters are built whenever the (saved) config asks for them —
        # including from_pt reloads: eval_phonemes serves the FINE-TUNED
        # model, and the checkpoint's llm.msgpack carries the trained
        # lora_A/B (the reference loads adapters via peft at eval,
        # eval_phonemes.py:60-66). Dropping them here would silently score
        # the un-adapted base (flax's from_state_dict ignores unknown keys).
        lora = method_kwargs.get("lora")
        lora_kwargs = {}
        if lora is not None:
            lora_kwargs = dict(
                lora_r=int(lora["r"]),
                lora_alpha=float(lora["alpha"]),
                lora_dropout=float(lora["dropout"]),
                lora_targets=tuple(lora["target_modules"]),
            )
        return cls(
            config=to_plain_dict(cfg),
            llama_config=llama_config,
            method_name=method_kwargs.get("method_name", "endtoend"),
            freeze_llm=bool(method_kwargs.get("freeze_llm", False)),
            quant=method_kwargs.get("quantize"),
            **lora_kwargs,
        )

    def setup(self):
        cfg = self.config
        # The trunk keeps the exact reference splice semantics: tile-pad
        # frames (stack.pad_to_multiple) would occupy prompt positions and
        # shift every later token's position in the LLM — FORCE it off for
        # BCI, even if the config carries it (e.g. a from_pt reload
        # re-merging an NDT1 pretrain's saved encoder config, or a copied
        # flagship recipe).
        enc_cfg = dict(cfg["ndt1"]["encoder"])
        stack = enc_cfg.get("embedder", {}).get("stack", {})
        if stack.get("pad_to_multiple", 1) not in (None, 1):
            emb = dict(enc_cfg["embedder"])
            emb["stack"] = {**stack, "pad_to_multiple": 1}
            enc_cfg["embedder"] = emb
        self.encoder = NeuralEncoder(config=enc_cfg, name="ndt1_encoder")
        self.llm = LlamaForCausalLM(
            self.llama_config,
            lora_r=self.lora_r,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            lora_targets=self.lora_targets,
            freeze_base=self.freeze_llm or self.lora_r > 0,
            dtype=self.dtype,
            remat=bool(cfg.get("llm_remat", False)),
            quant=self.quant,
            name="llm",
        )
        proj = cfg["projector"]
        self.stacking = int(proj["stacking"])
        self._proj_act = proj["act"]
        self._proj_inter = proj["inter_size"]
        if self._proj_inter is not None:
            self.projector_in = nn.Dense(
                self._proj_inter, use_bias=proj["bias"], name="projector_in"
            )
        self.projector_out = nn.Dense(
            self.llama_config.hidden_size, use_bias=proj["bias"], name="projector_out"
        )

    def _project(self, x: jax.Array) -> jax.Array:
        if self._proj_inter is not None:
            x = ACT2FN[self._proj_act](self.projector_in(x))
        return self.projector_out(x)

    def prepare_embeds(
        self,
        input_ids: jax.Array,          # (B, L)
        attention_mask: jax.Array,     # (B, L)
        input_split: jax.Array,        # (B,) or (B, 1)
        spikes: jax.Array,             # (B, T, N)
        spikes_mask: jax.Array,        # (B, T)
        spikes_timestamp: jax.Array,   # (B, T)
        spikes_lengths: jax.Array,     # (B,)
        block_idx: Optional[jax.Array],
        day_idx: Optional[jax.Array],
        targets: Optional[jax.Array],
        training: bool,
    ):
        text_embeds = self.llm.embed(jnp.asarray(input_ids))        # (B, L, H)

        spikes_embeds, sp_mask, _ = self.encoder(
            spikes, spikes_mask, spikes_timestamp, spikes_lengths,
            block_idx=block_idx, day_idx=day_idx, training=training,
        )                                                            # (B, T', h)

        B, T, H = spikes_embeds.shape
        if T % self.stacking != 0:
            new_T = -(-T // self.stacking) * self.stacking
            spikes_embeds = jnp.pad(spikes_embeds, ((0, 0), (0, new_T - T), (0, 0)))
            sp_mask = jnp.pad(sp_mask, ((0, 0), (0, new_T - T)))
            T = new_T

        spikes_embeds = spikes_embeds.reshape(B, T // self.stacking, H * self.stacking)
        spikes_embeds = self._project(spikes_embeds)                # (B, S, H_llm)
        sp_mask = sp_mask.reshape(B, T // self.stacking, self.stacking)
        sp_mask = (sp_mask.sum(-1) == self.stacking).astype(attention_mask.dtype)

        input_split = jnp.asarray(input_split).reshape(B)
        inputs_embeds = splice_embeds(
            text_embeds.astype(jnp.float32), spikes_embeds.astype(jnp.float32), input_split
        )
        attention_mask = splice_embeds(jnp.asarray(attention_mask), sp_mask, input_split)
        if targets is not None:
            targets = splice_embeds(
                jnp.asarray(targets),
                jnp.full_like(sp_mask, -100),
                input_split,
            )
        return inputs_embeds, attention_mask, targets

    def __call__(
        self,
        input_ids: jax.Array,          # (B, L)
        attention_mask: jax.Array,     # (B, L)
        input_split: jax.Array,        # (B,)
        spikes: jax.Array,             # (B, T, N)
        spikes_mask: jax.Array,        # (B, T)
        spikes_timestamp: jax.Array,   # (B, T)
        spikes_lengths: jax.Array,     # (B,)
        block_idx: Optional[jax.Array] = None,
        day_idx: Optional[jax.Array] = None,
        targets: Optional[jax.Array] = None,   # (B, L) token ids, -100 on prompt
        training: bool = False,
    ) -> BCIOutput:
        inputs_embeds, attention_mask, targets = self.prepare_embeds(
            input_ids, attention_mask, input_split, spikes, spikes_mask,
            spikes_timestamp, spikes_lengths, block_idx, day_idx, targets, training,
        )
        logits, _ = self.llm(
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            training=training,
        )

        loss = None
        n_examples = None
        if targets is not None:
            shift_logits = logits[:, :-1, :]
            shift_targets = targets[:, 1:]
            loss = cross_entropy_loss(shift_logits, shift_targets).sum()
            n_examples = (shift_targets != -100).sum()

        return BCIOutput(loss=loss, n_examples=n_examples, preds=logits, targets=targets)

    # ------------------------------------------------------------ generation

    def generate(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        input_split: jax.Array,
        spikes: jax.Array,
        spikes_mask: jax.Array,
        spikes_timestamp: jax.Array,
        spikes_lengths: jax.Array,
        block_idx: Optional[jax.Array] = None,
        day_idx: Optional[jax.Array] = None,
        max_new_tokens: int = 20,
        num_beams: int = 1,
        pad_token_id: int = 0,
        eos_token_id: int = 2,
        length_penalty: float = 1.0,
        early_stopping: bool = False,
        num_return_sequences: int = 1,
        num_beam_groups: int = 1,
        diversity_penalty: float = 0.0,
    ):
        """Greedy (num_beams=1), beam-search, or diverse-beam-search decode
        from the spliced prompt — HF ``generate(inputs_embeds=...)``
        semantics of returning only the new tokens (reference
        ``models/bci.py:224-246``).

        Returns (B, max_new_tokens) ids when ``num_return_sequences == 1``;
        with ``num_return_sequences > 1`` returns a
        :class:`~llm_bci_tpu.models.generation.BeamResult` with all
        hypotheses sorted best-first — the surface ``eval_phonemes`` needs
        for best-of-k WER (reference ``eval_phonemes.py:53-71,208-240``).
        ``num_beam_groups == num_beams > 1`` selects diverse beam search
        (the reference's WER-eval config)."""
        from llm_bci_tpu.models.generation import (
            beam_search,
            diverse_beam_search,
            greedy_decode,
        )

        if num_return_sequences > num_beams:
            raise ValueError("num_return_sequences must be <= num_beams")

        inputs_embeds, attn_mask, _ = self.prepare_embeds(
            input_ids, attention_mask, input_split, spikes, spikes_mask,
            spikes_timestamp, spikes_lengths, block_idx, day_idx, None, False,
        )

        def decode_step(embeds, mask, cache, cache_index):
            return self.llm(
                inputs_embeds=embeds,
                attention_mask=mask,
                cache=cache,
                cache_index=cache_index,
            )

        def embed_tokens(ids):
            return self.llm.embed(ids)

        B, P, _ = inputs_embeds.shape
        if num_beams <= 1:
            return greedy_decode(
                decode_step, embed_tokens, inputs_embeds, attn_mask,
                self.llm.init_cache(B, P + max_new_tokens),
                max_new_tokens, eos_token_id, pad_token_id,
            )
        cache = self.llm.init_cache(B * num_beams, P + max_new_tokens)
        if num_beam_groups > 1:
            if num_beam_groups != num_beams:
                raise ValueError(
                    "only num_beam_groups == num_beams (group size 1) is "
                    "supported, matching the reference eval config"
                )
            result = diverse_beam_search(
                decode_step, embed_tokens, inputs_embeds, attn_mask, cache,
                max_new_tokens, num_beams, eos_token_id, pad_token_id,
                length_penalty, diversity_penalty,
            )
        else:
            result = beam_search(
                decode_step, embed_tokens, inputs_embeds, attn_mask, cache,
                max_new_tokens, num_beams, eos_token_id, pad_token_id,
                length_penalty, early_stopping,
            )
        if num_return_sequences == 1:
            return result.sequences[:, 0]
        from llm_bci_tpu.models.generation import BeamResult

        return BeamResult(
            sequences=result.sequences[:, :num_return_sequences],
            scores=result.scores[:, :num_return_sequences],
        )

    # ---------------------------------------------------------- checkpoints

    def trainable_mask(self, params: Dict) -> Dict:
        """Optimizer mask: LoRA-only training inside the LLM when LoRA is on,
        full freeze with ``freeze_llm`` (reference ``models/bci.py:57-67``);
        encoder/projector always train."""
        params = unfreeze(params)
        out = {}
        for k, v in params.items():
            if k == "llm":
                freeze_base = self.freeze_llm or self.lora_r > 0
                out[k] = lora_trainable_mask(v, freeze_all_base=freeze_base)
            else:
                out[k] = jax.tree_util.tree_map(lambda _: True, v)
        return out

    @staticmethod
    def save_checkpoint(save_dir: str, params: Dict) -> None:
        from llm_bci_tpu.utils.serialization import save_params

        params = unfreeze(params)
        save_params(os.path.join(save_dir, "llm.msgpack"), params["llm"])
        save_params(os.path.join(save_dir, "encoder.msgpack"), params["ndt1_encoder"])
        projector = {
            k: v for k, v in params.items() if k.startswith("projector")
        }
        save_params(os.path.join(save_dir, "projector.msgpack"), projector)

    def save_config(self, save_dir: str) -> None:
        with open(os.path.join(save_dir, "projector_config.yaml"), "w") as f:
            yaml.safe_dump(to_plain_dict(self.config["projector"]), f)
        with open(os.path.join(save_dir, "encoder_config.yaml"), "w") as f:
            yaml.safe_dump(to_plain_dict(self.config["ndt1"]["encoder"]), f)
        with open(os.path.join(save_dir, "llama_config.yaml"), "w") as f:
            yaml.safe_dump(dataclasses.asdict(self.llama_config), f)

    def load_checkpoint_params(self, load_dir: str, params: Dict) -> Dict:
        from llm_bci_tpu.utils.serialization import load_params

        params = unfreeze(params)
        from llm_bci_tpu.interop.torch_import import is_torch_checkpoint

        if is_torch_checkpoint(load_dir):
            # Reference-format BCI checkpoint (models/bci.py:250-264): the
            # inner NDT1 bins + projector.bin + the llm dir (full HF weights
            # or a peft LoRA adapter; base weights fall back to llm_path).
            from llm_bci_tpu.interop.torch_import import bci_params_from_torch

            return bci_params_from_torch(
                load_dir,
                params,
                llama_config=self.llama_config,
                llm_dir=self.config.get("llm_path"),
                quant=self.quant,
                lora_r=self.lora_r if self.lora_r > 0 else None,
                lora_alpha=self.lora_alpha if self.lora_r > 0 else None,
            )
        for name, fname in (
            ("llm", "llm.msgpack"),
            ("ndt1_encoder", "encoder.msgpack"),
        ):
            path = os.path.join(load_dir, fname)
            if os.path.exists(path):
                params[name] = load_params(path, params[name])
        proj_path = os.path.join(load_dir, "projector.msgpack")
        if os.path.exists(proj_path):
            projector = {k: v for k, v in params.items() if k.startswith("projector")}
            params.update(load_params(proj_path, projector))
        return params

    def warm_start_params(self, params: Dict) -> Dict:
        params = unfreeze(params)
        pt_path = self.config.get("from_pt")
        if pt_path:
            return self.load_checkpoint_params(pt_path, params)
        # NDT1 encoder warm start (pretrain → finetune chain,
        # configs/trainer_bci.yaml:52 load_ndt1_from_pt).
        enc_pt = self.config["ndt1"]["encoder"].get("from_pt")
        if enc_pt:
            from llm_bci_tpu.interop.torch_import import (
                is_torch_checkpoint,
                ndt1_encoder_params_from_torch,
            )

            if is_torch_checkpoint(enc_pt):
                params["ndt1_encoder"] = ndt1_encoder_params_from_torch(
                    enc_pt, params["ndt1_encoder"]
                )
            else:
                from llm_bci_tpu.utils.serialization import load_params

                params["ndt1_encoder"] = load_params(
                    os.path.join(enc_pt, "encoder.msgpack"), params["ndt1_encoder"]
                )
        # Real Llama weights from an HF checkpoint directory.
        llm_path = self.config.get("llm_path")
        if llm_path and os.path.exists(os.path.join(llm_path, "config.json")):
            hf_params = load_hf_llama_params(llm_path, self.llama_config)
            if self.quant:
                hf_params = quantize_llama_params(hf_params, self.quant)
            params["llm"] = _merge_params(params["llm"], hf_params)
        return params


def _merge_params(target: Dict, source: Dict) -> Dict:
    """Recursively overlay ``source`` leaves onto ``target`` (keeps LoRA
    params absent from the HF checkpoint)."""
    out = dict(target)
    for k, v in source.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_params(out[k], v)
        else:
            out[k] = v
    return out
