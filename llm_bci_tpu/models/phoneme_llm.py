"""PhonemeLLM — phoneme-probability sequences spliced into an LLM prompt.

The reference ships only the adapter config (``configs/phoneme_coupler.yaml``)
and drives a ``PhonemeLLM`` class from ``notebooks/eval_phonemes.ipynb`` whose
source is absent from the snapshot (SURVEY.md §2.3 "vestigial"). This is a
working reconstruction of that pipeline stage: CTC phoneme log-probs (from a
pretrained NDT1-CTC) are projected through the coupler MLP into the LLM
embedding space and spliced into the prompt at ``input_split`` — the
two-stage alternative to the end-to-end BCI model.
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
from llm_bci_tpu.models.llama import LlamaConfig, LlamaForCausalLM, lora_trainable_mask
from llm_bci_tpu.models.bci import splice_embeds, _merge_params
from llm_bci_tpu.models.ndt1 import ACT2FN
from llm_bci_tpu.ops.losses import cross_entropy_loss
from llm_bci_tpu.registry import register_model

DEFAULT_CONFIG = "configs/phoneme_coupler.yaml"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PhonemeLLMOutput(ModelOutput):
    pass


@register_model("PhonemeLLM")
class PhonemeLLM(nn.Module):
    """Coupler MLP + Llama over prompt-spliced phoneme embeddings."""

    config: Any                   # coupler config dict
    llama_config: LlamaConfig
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ()
    freeze_llm: bool = False
    dtype: Any = jnp.bfloat16

    @classmethod
    def from_config(cls, model_config, **method_kwargs) -> "PhonemeLLM":
        cfg = update_config(resolve_path(DEFAULT_CONFIG), model_config)
        if method_kwargs.get("debug"):
            llama_config = LlamaConfig.debug()
        else:
            import json

            llm_path = method_kwargs.get("llm_path")
            llama_config = LlamaConfig.from_dict(
                json.load(open(os.path.join(llm_path, "config.json")))
            )
            cfg["llm_path"] = llm_path
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
            freeze_llm=bool(method_kwargs.get("freeze_llm", False)),
            **lora_kwargs,
        )

    def setup(self):
        cfg = self.config
        self.llm = LlamaForCausalLM(
            self.llama_config,
            lora_r=self.lora_r,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            lora_targets=self.lora_targets,
            freeze_base=self.freeze_llm or self.lora_r > 0,
            dtype=self.dtype,
            name="llm",
        )
        self.coupler_in = nn.Dense(
            cfg["inter_size"], use_bias=cfg["bias"], name="coupler_in"
        )
        self.coupler_out = nn.Dense(
            self.llama_config.hidden_size, use_bias=cfg["bias"], name="coupler_out"
        )

    def _couple(self, phoneme_probs: jax.Array) -> jax.Array:
        x = ACT2FN[self.config["act"]](self.coupler_in(phoneme_probs))
        return self.coupler_out(x)

    def prepare_embeds(self, input_ids, attention_mask, input_split,
                       phoneme_probs, phonemes_mask, targets):
        text_embeds = self.llm.embed(jnp.asarray(input_ids))
        ph_embeds = self._couple(jnp.asarray(phoneme_probs))
        B = text_embeds.shape[0]
        input_split = jnp.asarray(input_split).reshape(B)
        inputs_embeds = splice_embeds(
            text_embeds.astype(jnp.float32), ph_embeds.astype(jnp.float32), input_split
        )
        attention_mask = splice_embeds(
            jnp.asarray(attention_mask), jnp.asarray(phonemes_mask), input_split
        )
        if targets is not None:
            targets = splice_embeds(
                jnp.asarray(targets),
                jnp.full_like(jnp.asarray(phonemes_mask), -100),
                input_split,
            )
        return inputs_embeds, attention_mask, targets

    def __call__(
        self,
        input_ids: jax.Array,        # (B, L)
        attention_mask: jax.Array,   # (B, L)
        input_split: jax.Array,      # (B,)
        phoneme_probs: jax.Array,    # (B, P, vocab) CTC posteriors
        phonemes_mask: jax.Array,    # (B, P)
        targets: Optional[jax.Array] = None,
        training: bool = False,
    ) -> PhonemeLLMOutput:
        inputs_embeds, attention_mask, targets = self.prepare_embeds(
            input_ids, attention_mask, input_split, phoneme_probs, phonemes_mask, targets
        )
        logits, _ = self.llm(
            inputs_embeds=inputs_embeds, attention_mask=attention_mask, training=training
        )
        loss = None
        n_examples = None
        if targets is not None:
            shift_logits = logits[:, :-1, :]
            shift_targets = targets[:, 1:]
            losses = cross_entropy_loss(shift_logits, shift_targets)
            if self.config.get("loss_reduction", "sum") == "mean":
                denom = jnp.maximum((shift_targets != -100).sum(), 1)
                loss = losses.sum() / denom
            else:
                loss = losses.sum()
            n_examples = (shift_targets != -100).sum()
        return PhonemeLLMOutput(
            loss=loss, n_examples=n_examples, preds=logits, targets=targets
        )

    def generate(
        self,
        input_ids, attention_mask, input_split, phoneme_probs, phonemes_mask,
        max_new_tokens: int = 20, num_beams: int = 1,
        pad_token_id: int = 0, eos_token_id: int = 2, length_penalty: float = 1.0,
        num_return_sequences: int = 1,
    ) -> jax.Array:
        from llm_bci_tpu.models.generation import beam_search, greedy_decode

        inputs_embeds, attn_mask, _ = self.prepare_embeds(
            input_ids, attention_mask, input_split, phoneme_probs, phonemes_mask, None
        )

        def decode_step(e, m, c, i):
            return self.llm(inputs_embeds=e, attention_mask=m, cache=c, cache_index=i)

        def embed_tokens(t):
            return self.llm.embed(t)

        B, P, _ = inputs_embeds.shape
        if num_beams <= 1:
            return greedy_decode(
                decode_step, embed_tokens, inputs_embeds, attn_mask,
                self.llm.init_cache(B, P + max_new_tokens),
                max_new_tokens, eos_token_id, pad_token_id,
            )
        result = beam_search(
            decode_step, embed_tokens, inputs_embeds, attn_mask,
            self.llm.init_cache(B * num_beams, P + max_new_tokens),
            max_new_tokens, num_beams, eos_token_id, pad_token_id, length_penalty,
        )
        # Match BCI.generate's surface: best sequence by default, the full
        # sorted BeamResult when the caller asks for several hypotheses.
        if num_return_sequences <= 1:
            return result.sequences[:, 0]
        from llm_bci_tpu.models.generation import BeamResult

        return BeamResult(
            sequences=result.sequences[:, :num_return_sequences],
            scores=result.scores[:, :num_return_sequences],
        )

    def trainable_mask(self, params: Dict) -> Dict:
        params = unfreeze(params)
        out = {}
        for k, v in params.items():
            if k == "llm":
                out[k] = lora_trainable_mask(
                    v, freeze_all_base=self.freeze_llm or self.lora_r > 0
                )
            else:
                out[k] = jax.tree_util.tree_map(lambda _: True, v)
        return out

    @staticmethod
    def save_checkpoint(save_dir: str, params: Dict) -> None:
        from llm_bci_tpu.utils.serialization import save_params

        params = unfreeze(params)
        save_params(os.path.join(save_dir, "llm.msgpack"), params["llm"])
        coupler = {k: v for k, v in params.items() if k.startswith("coupler")}
        save_params(os.path.join(save_dir, "coupler.msgpack"), coupler)

    def save_config(self, save_dir: str) -> None:
        with open(os.path.join(save_dir, "coupler_config.yaml"), "w") as f:
            yaml.safe_dump(to_plain_dict(self.config), f)

    def load_checkpoint_params(self, load_dir: str, params: Dict) -> Dict:
        from llm_bci_tpu.utils.serialization import load_params

        params = unfreeze(params)
        llm_path = os.path.join(load_dir, "llm.msgpack")
        if os.path.exists(llm_path):
            params["llm"] = load_params(llm_path, params["llm"])
        coupler_path = os.path.join(load_dir, "coupler.msgpack")
        if os.path.exists(coupler_path):
            coupler = {k: v for k, v in params.items() if k.startswith("coupler")}
            params.update(load_params(coupler_path, coupler))
        return params
