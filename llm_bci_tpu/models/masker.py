"""Spike masking for self-supervised objectives — pure functions over PRNG keys.

Covers the union of both reference masker variants (``models/masker.py:27-110``
and ``models/masker copy.py:34-141``):

* ``temporal``  — mask whole timesteps; optional consecutive-bin expansion
* ``neuron``    — mask whole channels
* ``random``    — mask individual (t, n) bins
* ``region``    — mask all channels in configured brain regions (v1)
* ``co-smooth`` — mask a fixed channel set
* ``forward-pred`` — mask a fixed timestep set (v2)
* ``inter-region`` — mask ``n_mask_regions`` sampled regions; targets = masked (v2)
* ``intra-region`` — mask everything except a sampled target region (plus a
  ``ratio`` fraction inside it); targets restricted to the target region (v2)

Masked bins are zeroed with prob ``zero_ratio``; of the remainder,
``random_ratio`` are replaced by uniform values in ``[0, spikes.max()]`` (the
max is taken *after* zeroing, matching ``models/masker.py:98-102``).

TPU-first design notes: everything is static-shape and jit-safe. Brain-region
*names* never reach the device — the trainer resolves them to integer ids and
passes ``neuron_regions_idx`` ``(B, N)``; configured region lists become
static id tuples. The co-smoothing eval harness needs to sweep the masked
channel without recompiling, so region/channel selections can also be supplied
as dynamic override arrays (see :class:`MaskerOverrides`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskerConfig:
    """Static (hashable) masker configuration; safe to close over under jit."""

    mode: str = "random"
    active: bool = True
    force_active: bool = False
    ratio: float = 0.1
    zero_ratio: float = 1.0
    random_ratio: float = 1.0
    expand_prob: float = 0.0
    max_timespan: int = 1
    channels: Optional[Tuple[int, ...]] = None        # co-smooth
    timesteps: Optional[Tuple[int, ...]] = None       # forward-pred
    mask_region_ids: Optional[Tuple[int, ...]] = None    # region / inter-region
    target_region_ids: Optional[Tuple[int, ...]] = None  # intra-region
    n_mask_regions: int = 1

    @classmethod
    def from_config(cls, cfg, region_to_id=None) -> "MaskerConfig":
        """Build from a DictConfig-style mapping; region *names* in
        ``regions`` / ``mask_regions`` / ``target_regions`` are resolved to
        integer ids via ``region_to_id``."""

        def ids(names):
            if names is None:
                return None
            if len(names) and region_to_id is None:
                raise ValueError("Region-based masking needs a region_to_id vocabulary")
            return tuple(int(region_to_id[r]) for r in names)

        def tup(xs):
            return None if xs is None else tuple(int(x) for x in xs)

        return cls(
            mode=cfg.get("mode", "random"),
            active=bool(cfg.get("active", True)),
            force_active=bool(cfg.get("force_active", False)),
            ratio=float(cfg.get("ratio", 0.1) or 0.0),
            zero_ratio=float(cfg.get("zero_ratio", 1.0)),
            random_ratio=float(cfg.get("random_ratio", 1.0)),
            expand_prob=float(cfg.get("expand_prob", 0.0) or 0.0),
            max_timespan=int(cfg.get("max_timespan", 1) or 1),
            channels=tup(cfg.get("channels")),
            timesteps=tup(cfg.get("timesteps")),
            mask_region_ids=ids(cfg.get("mask_regions") or cfg.get("regions")),
            target_region_ids=ids(cfg.get("target_regions")),
            n_mask_regions=int(cfg.get("n_mask_regions", 1) or 1),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MaskerOverrides:
    """Dynamic (traced) selection overrides for eval harnesses.

    ``channels_onehot (N,)`` replaces the static co-smooth channel set;
    ``mask_region_sel`` / ``target_region_sel`` ``(B, N)`` replace region
    sampling. Lets co-smoothing sweep all N neurons under one compiled fn
    (vmap over the onehot) instead of the reference's N× eval passes
    (``utils/eval_co_smoothing.py:147-153``).
    """

    channels_onehot: Optional[jax.Array] = None
    timesteps_onehot: Optional[jax.Array] = None
    mask_region_sel: Optional[jax.Array] = None
    target_region_sel: Optional[jax.Array] = None


def _expand_timesteps_dynamic(mask: jax.Array, timespan: jax.Array, max_timespan: int) -> jax.Array:
    """OR-dilate a (B, T) mask with a centered window of *dynamic* width
    ``timespan`` <= ``max_timespan`` (replaces the dynamic-width conv1d at
    ``models/masker.py:107-110``). Static unroll over the max window; each
    shifted copy is gated by the dynamic bounds."""
    pad_lo_max = (max_timespan - 1) // 2
    pad_hi_max = max_timespan // 2
    lo = -((timespan - 1) // 2)   # dynamic ints
    hi = timespan // 2
    out = jnp.zeros_like(mask)
    for j in range(-pad_lo_max, pad_hi_max + 1):
        if j == 0:
            shifted = mask
        elif j > 0:
            shifted = jnp.pad(mask[:, j:], ((0, 0), (0, j)))
        else:
            shifted = jnp.pad(mask[:, :j], ((0, 0), (-j, 0)))
        gate = jnp.logical_and(j >= lo, j <= hi)
        out = jnp.maximum(out, jnp.where(gate, shifted, 0))
    return out


def _isin_static(x: jax.Array, ids: Sequence[int]) -> jax.Array:
    out = jnp.zeros(x.shape, dtype=bool)
    for i in ids:
        out |= x == i
    return out


def _isin_dynamic(x: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.any(x[..., None] == ids, axis=-1)


def apply_masker(
    cfg: MaskerConfig,
    spikes: jax.Array,                       # (B, T, N)
    key: jax.Array,
    training: bool,
    neuron_regions_idx: Optional[jax.Array] = None,  # (B, N) int region ids
    overrides: Optional[MaskerOverrides] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(masked_spikes, targets_mask)``; ``targets_mask`` is int32,
    1 on bins the model must reconstruct."""
    B, T, N = spikes.shape
    ov = overrides or MaskerOverrides()

    if not cfg.active or (not training and not cfg.force_active):
        return spikes, jnp.zeros(spikes.shape, dtype=jnp.int32)

    k_span, k_width, k_sel, k_mask, k_zero, k_rand, k_vals = jax.random.split(key, 7)

    mode = cfg.mode
    intra_targets_sel = None  # (B, N) bool, intra-region only

    if mode == "temporal":
        # Dynamic expansion span; the per-bin ratio shrinks by the span so the
        # expected masked fraction stays ~ratio (models/masker.py:54-60).
        expand = jax.random.bernoulli(k_span, cfg.expand_prob)
        timespan = jnp.where(
            expand, jax.random.randint(k_width, (), 1, cfg.max_timespan + 1), 1
        )
        probs = jnp.full((B, T), cfg.ratio) / timespan
        mask_bt = jax.random.bernoulli(k_mask, probs)
        mask_bt = _expand_timesteps_dynamic(mask_bt.astype(jnp.int32), timespan, cfg.max_timespan) > 0
        mask = jnp.broadcast_to(mask_bt[:, :, None], (B, T, N))
    elif mode == "neuron":
        mask_bn = jax.random.bernoulli(k_mask, cfg.ratio, (B, N))
        mask = jnp.broadcast_to(mask_bn[:, None, :], (B, T, N))
    elif mode == "random":
        mask = jax.random.bernoulli(k_mask, cfg.ratio, (B, T, N))
    elif mode == "region":
        if neuron_regions_idx is None:
            raise ValueError("Can't mask region without brain region information")
        sel = (
            ov.mask_region_sel
            if ov.mask_region_sel is not None
            else _isin_static(neuron_regions_idx, cfg.mask_region_ids or ())
        )
        mask = jnp.broadcast_to(sel[:, None, :], (B, T, N))
    elif mode == "co-smooth":
        if ov.channels_onehot is not None:
            onehot = ov.channels_onehot.astype(bool)
        else:
            if cfg.channels is None:
                raise ValueError("No channels to mask")
            onehot = _isin_static(jnp.arange(N), cfg.channels)
        mask = jnp.broadcast_to(onehot[None, None, :], (B, T, N))
    elif mode == "forward-pred":
        if ov.timesteps_onehot is not None:
            onehot = ov.timesteps_onehot.astype(bool)
        else:
            if cfg.timesteps is None:
                raise ValueError("No time steps to mask")
            onehot = _isin_static(jnp.arange(T), cfg.timesteps)
        mask = jnp.broadcast_to(onehot[None, :, None], (B, T, N))
    elif mode == "inter-region":
        if neuron_regions_idx is None:
            raise ValueError("Can't mask region without brain region information")
        if ov.mask_region_sel is not None:
            sel = ov.mask_region_sel.astype(bool)
        else:
            cand = jnp.asarray(cfg.mask_region_ids)
            picked = jax.random.choice(
                k_sel, cand, (cfg.n_mask_regions,), replace=False
            )
            sel = _isin_dynamic(neuron_regions_idx, picked)
        probs = jnp.where(sel, cfg.ratio, 0.0)
        mask_bn = jax.random.bernoulli(k_mask, probs)
        mask = jnp.broadcast_to(mask_bn[:, None, :], (B, T, N))
    elif mode == "intra-region":
        if neuron_regions_idx is None:
            raise ValueError("Can't mask region without brain region information")
        if ov.target_region_sel is not None:
            sel = ov.target_region_sel.astype(bool)
        else:
            cand = jnp.asarray(cfg.target_region_ids)
            picked = jax.random.choice(
                k_sel, cand, (cfg.n_mask_regions,), replace=False
            )
            sel = _isin_dynamic(neuron_regions_idx, picked)
        # Outside the target region everything is masked (prob 1); inside,
        # a ``ratio`` fraction is masked. Targets live inside the region only
        # (models/masker copy.py:94-104,134).
        probs = jnp.where(sel, cfg.ratio, 1.0)
        mask_bn = jax.random.bernoulli(k_mask, probs)
        mask = jnp.broadcast_to(mask_bn[:, None, :], (B, T, N))
        intra_targets_sel = sel
    else:
        raise ValueError(f"Masking mode {mode} not implemented")

    # Corrupt: zero a zero_ratio fraction; of the rest, replace random_ratio
    # with uniform draws scaled by the post-zeroing max.
    zero_idx = jax.random.bernoulli(k_zero, cfg.zero_ratio, (B, T, N)) & mask
    spikes = jnp.where(zero_idx, 0.0, spikes)
    random_idx = jax.random.bernoulli(k_rand, cfg.random_ratio, (B, T, N)) & mask & ~zero_idx
    random_spikes = spikes.max() * jax.random.uniform(k_vals, (B, T, N), dtype=spikes.dtype)
    spikes = jnp.where(random_idx, random_spikes, spikes)

    targets_mask = mask
    if intra_targets_sel is not None:
        targets_mask = mask & jnp.broadcast_to(intra_targets_sel[:, None, :], (B, T, N))
    return spikes, targets_mask.astype(jnp.int32)


def apply_maskers(
    cfgs: Sequence[MaskerConfig],
    spikes: jax.Array,
    key: jax.Array,
    training: bool,
    neuron_regions_idx: Optional[jax.Array] = None,
    overrides: Optional[dict] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Apply a list of maskers in sequence, OR-ing their target masks
    (reference loop ``models/ndt1.py:424-427``). ``overrides`` maps masker
    index -> :class:`MaskerOverrides`."""
    targets_mask = jnp.zeros(spikes.shape, dtype=jnp.int32)
    for i, cfg in enumerate(cfgs):
        key, sub = jax.random.split(key)
        ov = (overrides or {}).get(i)
        spikes, new_mask = apply_masker(
            cfg, spikes, sub, training, neuron_regions_idx, ov
        )
        targets_mask = targets_mask | new_mask
    return spikes, targets_mask
