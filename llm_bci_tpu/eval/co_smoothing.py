"""Co-smoothing evaluation: bits-per-spike of held-out neuron predictions.

TPU-native rebuild of reference ``utils/eval_co_smoothing.py:15-243``. The
reference mutates the model's masker module and reruns a full eval pass per
neuron (``:147-153``), recompiling nothing because torch is eager. Here the
masked-channel / region selections are *dynamic inputs*
(:class:`llm_bci_tpu.models.masker.MaskerOverrides`) to one jitted eval
function — the whole N-neuron sweep reuses a single XLA compilation.

Modes (reference ``:127,160,207``):
* ``neuron``        — co-smooth mask one channel at a time;
* ``intra-region``  — all channels outside the target region masked, plus
  the held-out channel; targets restricted to the region;
* ``inter-region``  — mask all channels of one region, predict it from the
  others (one pass per region, scored per neuron).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_bci_tpu.eval.metrics import bits_per_spike
from llm_bci_tpu.models.masker import MaskerConfig, MaskerOverrides


def _eval_model_with_maskers(model, masker_cfgs: Dict[str, dict]):
    """Clone the model with its masker block replaced (maskers are
    param-free, so trainer params still apply)."""
    import copy

    cfg = copy.deepcopy(model.config)
    if "encoder" in cfg and isinstance(cfg["encoder"], dict) and "masker" in cfg["encoder"]:
        cfg["encoder"]["masker"] = masker_cfgs       # NDT1 layout
    elif "masker" in cfg:
        cfg["masker"] = masker_cfgs                  # iTransformer layout
    else:
        raise ValueError("Model config carries no masker block")
    return dataclasses.replace(model, config=cfg)


_COSMOOTH = {
    "force_active": True, "mode": "co-smooth", "ratio": 1.0,
    "zero_ratio": 1.0, "random_ratio": 1.0, "channels": [0],
}


def co_smoothing_eval(
    trainer,
    save_path: str = "figs",
    method: str = "",
    is_aligned: bool = False,
    subtract_psth: Optional[str] = "task",
    onset_alignment: Optional[List[int]] = None,
    target_regions: Optional[List[str]] = None,
    modes: Optional[List[str]] = None,
    make_r2_plots: bool = False,
    max_N: Optional[int] = None,
) -> Dict[str, Dict[str, list]]:
    modes = modes or ["neuron", "intra-region", "inter-region"]
    target_regions = target_regions or ["all"]
    onset_alignment = onset_alignment if onset_alignment is not None else [40]

    model = trainer.model
    params = trainer.state.params
    # Non-params collections (e.g. BatchNorm running stats) ride along like
    # the trainer's own eval_step — a model with mutable state would
    # otherwise fail with a missing-collection error here.
    extra_vars = dict(getattr(trainer.state, "extra_vars", {}) or {})
    log_input = bool(getattr(model, "log_input", True))

    region_list = [str(r) for r in trainer.test_dataset[0]["neuron_regions"]]
    uuids_list = trainer.test_dataset[0].get(
        "neuron_uuids", [str(i) for i in range(len(region_list))]
    )
    all_regions = sorted(set(region_list))
    region_to_id = {r: i for i, r in enumerate(all_regions)}
    regions_idx_row = np.asarray([region_to_id[r] for r in region_list], np.int32)
    neurons_by_region = {
        r: [i for i, rr in enumerate(region_list) if rr == r] for r in all_regions
    }
    if "all" in target_regions:
        target_regions = all_regions

    batches = list(trainer.test_dataloader)  # (model_inputs, unused) pairs
    N_total = batches[0][0]["spikes"].shape[2]
    N = max_N or N_total
    T = batches[0][0]["spikes"].shape[1]

    # Condition matrix for aligned sessions (reference
    # utils/eval_co_smoothing.py:49-89): choice/reward/block tiled over time.
    behavior_set = None
    var_name2idx = var_value2label = var_tasklist = None
    if is_aligned:
        rows = [trainer.test_dataset[i] for i in range(len(trainer.test_dataset))]
        b_list = []
        for var in ("choice", "reward", "block"):
            v = np.stack([np.asarray(r[var]).reshape(-1)[0] for r in rows], axis=0)
            b_list.append(np.tile(v[:, None], (1, T)))
        behavior_set = np.stack(b_list, axis=-1)
        var_name2idx = {"choice": [0], "reward": [1], "block": [2], "wheel": [3]}
        var_value2label = {
            "block": {(0.2,): "p(left)=0.2", (0.5,): "p(left)=0.5", (0.8,): "p(left)=0.8"},
            "choice": {(-1.0,): "right", (1.0,): "left"},
            "reward": {(0.0,): "no reward", (1.0,): "reward"},
        }
        var_tasklist = ["block", "choice", "reward"]

    def run_sweep(
        masker_cfgs: Dict[str, dict],
        overrides_for,
        sweep_batch: int = 8,
        channel_for=None,
    ):
        """overrides_for(n_or_region) -> {idx: MaskerOverrides}.

        Returns (one, many): ``one(point)`` evaluates a single sweep point;
        ``many(points)`` vmaps the model over up to ``sweep_batch`` stacked
        override sets at once — the reference's N× sequential eval passes
        (``utils/eval_co_smoothing.py:147-153``) become ⌈N/K⌉ batched passes
        under one compilation (SURVEY.md §3.5 north star).

        ``channel_for(point) -> int``: when given, each sweep point's
        prediction is sliced to that single channel ON DEVICE and ``many``
        yields rates shaped (K, trials, T) instead of (K, trials, T, N).
        The neuron / intra-region modes only ever consume the held-out
        channel (bits-per-spike and the single-cell plots), so this is
        lossless for them and cuts device→host traffic by N× — the sweep
        was transfer-bound, not compute-bound, on remote-attached setups
        (r5: 256-channel sweep moved ~6.5 MB/neuron before, ~26 KB after)."""
        eval_model = _eval_model_with_maskers(model, masker_cfgs)

        def apply_fn(params, batch, overrides, channel=None):
            out = eval_model.apply(
                {"params": params, **extra_vars},
                **batch,
                training=False,
                masker_overrides=overrides,
                # force_active maskers draw from the 'mask' stream even at
                # eval; fixed key = deterministic sweep.
                rngs={"mask": jax.random.PRNGKey(0)},
            )
            preds = out.preds
            if channel is not None:
                preds = jnp.take(preds, channel, axis=-1)   # (trials, T)
            return preds

        eval_fn = jax.jit(apply_fn)
        # vmap over the stacked overrides (and channels); params/batch
        # broadcast.
        eval_fn_vmapped = jax.jit(jax.vmap(
            apply_fn, in_axes=(None, None, 0, 0 if channel_for else None)
        ))

        def dev_batches():
            for model_inputs, _ in batches:
                dev = {
                    k: v for k, v in model_inputs.items() if isinstance(v, np.ndarray)
                }
                if "neuron_regions_idx" not in dev:
                    B = dev["spikes"].shape[0]
                    dev["neuron_regions_idx"] = np.tile(regions_idx_row, (B, 1))
                yield dev

        def one(point) -> np.ndarray:
            overrides = overrides_for(point)
            ch = jnp.asarray(channel_for(point)) if channel_for else None
            preds = [
                np.asarray(eval_fn(params, dev, overrides, ch))
                for dev in dev_batches()
            ]
            preds = np.concatenate(preds, axis=0)
            return np.exp(preds) if log_input else preds

        def many(points):
            """Yields (start, rates) chunks of up to ``sweep_batch`` sweep
            points, rates shaped (K, trials, T, N) — or (K, trials, T)
            under ``channel_for``. Chunked so the host never holds the
            full (n_points, trials, T, N) array — at IBL scale (~700
            neurons) that would be tens of GB."""
            for start in range(0, len(points), sweep_batch):
                chunk = points[start : start + sweep_batch]
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs, axis=0),
                    *[overrides_for(pt) for pt in chunk],
                )
                chs = (
                    jnp.asarray([channel_for(pt) for pt in chunk])
                    if channel_for
                    else None
                )
                preds = [
                    np.asarray(eval_fn_vmapped(params, dev, stacked, chs))
                    for dev in dev_batches()
                ]
                rates = np.concatenate(preds, axis=1)
                yield start, (np.exp(rates) if log_input else rates)

        return one, many

    spikes_all = np.concatenate([b[0]["spikes"] for b in batches], axis=0)

    def score(rates: np.ndarray, n_i: int, mode: str):
        # rates: (trials, T, N) from a full-prediction pass, or (trials, T)
        # already device-sliced to channel n_i (run_sweep channel_for).
        col = rates if rates.ndim == 2 else rates[:, :, n_i]
        bps = bits_per_spike(col[:, :, None], spikes_all[:, :, [n_i]])
        r2 = [0.0, 0.0]
        if make_r2_plots:
            if is_aligned:
                from llm_bci_tpu.eval.viz_neuron_fit import viz_single_cell

                r2 = list(
                    viz_single_cell(
                        behavior_set, spikes_all[:, :, n_i], col,
                        var_name2idx, var_tasklist, var_value2label, [],
                        subtract_psth=subtract_psth,
                        aligned_tbins=onset_alignment,
                        neuron_idx=str(uuids_list[n_i])[:4],
                        neuron_region=region_list[n_i],
                        method=method, mode=mode, save_path=save_path,
                    )
                )
            else:
                from llm_bci_tpu.eval.viz_neuron_fit import viz_single_cell_unaligned

                r2 = [
                    viz_single_cell_unaligned(
                        spikes_all[:, :, n_i], col,
                        neuron_idx=str(uuids_list[n_i])[:4],
                        neuron_region=region_list[n_i],
                        method=method, mode=mode, save_path=save_path,
                    ),
                    0.0,
                ]
        return bps, r2

    results: Dict[str, Dict[str, list]] = {}

    if "neuron" in modes:
        _, many = run_sweep(
            {"main": dict(_COSMOOTH)},
            lambda n_i: {0: MaskerOverrides(
                channels_onehot=jnp.asarray(np.arange(N_total) == n_i)
            )},
            channel_for=lambda n_i: n_i,
        )
        bps_list, r2_list = [], []
        for start, rates in many(list(range(N))):
            for j in range(rates.shape[0]):
                bps, r2 = score(rates[j], start + j, "neuron")
                bps_list.append(bps)
                r2_list.append(r2)
        results["neuron"] = {"bps": bps_list, "r2": r2_list}

    if "intra-region" in modes:
        region_cfg = {
            "force_active": True, "mode": "intra-region", "ratio": 0.0,
            "zero_ratio": 1.0, "random_ratio": 1.0, "target_regions": [],
        }
        _, many = run_sweep(
            {"region": region_cfg, "main": dict(_COSMOOTH)},
            lambda n_i: {
                0: MaskerOverrides(
                    target_region_sel=jnp.asarray(
                        (regions_idx_row == region_to_id[region_list[n_i]])[None, :]
                    )
                ),
                1: MaskerOverrides(
                    channels_onehot=jnp.asarray(np.arange(N_total) == n_i)
                ),
            },
            channel_for=lambda n_i: n_i,
        )
        bps_list, r2_list = [], []
        for start, rates in many(list(range(N))):
            for j in range(rates.shape[0]):
                bps, r2 = score(rates[j], start + j, "intra-region")
                bps_list.append(bps)
                r2_list.append(r2)
        results["intra-region"] = {"bps": bps_list, "r2": r2_list}

    if "inter-region" in modes:
        region_cfg = {
            "force_active": True, "mode": "inter-region", "ratio": 1.0,
            "zero_ratio": 1.0, "random_ratio": 1.0, "mask_regions": [],
        }
        one, _ = run_sweep(
            {"region": region_cfg},
            lambda region: {
                0: MaskerOverrides(
                    mask_region_sel=jnp.asarray(
                        (regions_idx_row == region_to_id[region])[None, :]
                    )
                )
            },
        )
        bps_list, r2_list = [], []
        for region in target_regions:
            rates = one(region)
            for n_i in neurons_by_region[region]:
                if n_i >= N:
                    continue
                bps, r2 = score(rates, n_i, "inter-region")
                bps_list.append(bps)
                r2_list.append(r2)
        results["inter-region"] = {"bps": bps_list, "r2": r2_list}

    return results
