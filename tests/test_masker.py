import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_bci_tpu.models.masker import (
    MaskerConfig,
    MaskerOverrides,
    apply_masker,
    apply_maskers,
)

B, T, N = 8, 40, 16


def _spikes(seed=0):
    return jnp.asarray(np.random.default_rng(seed).poisson(2.0, size=(B, T, N)).astype(np.float32))


def test_inactive_at_eval():
    cfg = MaskerConfig(mode="random", ratio=0.5)
    s = _spikes()
    out, mask = apply_masker(cfg, s, jax.random.key(0), training=False)
    assert mask.sum() == 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(s))


def test_force_active_at_eval():
    cfg = MaskerConfig(mode="random", ratio=0.5, force_active=True)
    _, mask = apply_masker(cfg, _spikes(), jax.random.key(0), training=False)
    assert mask.sum() > 0


def test_random_mode_ratio():
    cfg = MaskerConfig(mode="random", ratio=0.3)
    _, mask = apply_masker(cfg, _spikes(), jax.random.key(1), training=True)
    frac = float(mask.mean())
    assert 0.25 < frac < 0.35


def test_neuron_mode_masks_whole_channels():
    cfg = MaskerConfig(mode="neuron", ratio=0.4)
    out, mask = apply_masker(cfg, _spikes(), jax.random.key(2), training=True)
    m = np.asarray(mask)
    # each (b, n) column is fully masked or fully unmasked
    col = m.sum(axis=1)
    assert set(np.unique(col)).issubset({0, T})
    # zero_ratio=1 -> masked bins are zeroed
    assert np.asarray(out)[m.astype(bool)].sum() == 0


def test_temporal_mode_masks_whole_timesteps():
    cfg = MaskerConfig(mode="temporal", ratio=0.3)
    _, mask = apply_masker(cfg, _spikes(), jax.random.key(3), training=True)
    m = np.asarray(mask)
    row = m.sum(axis=2)
    assert set(np.unique(row)).issubset({0, N})


def test_temporal_expansion_spans():
    cfg = MaskerConfig(mode="temporal", ratio=0.2, expand_prob=1.0, max_timespan=5)
    fracs = []
    for seed in range(6):
        _, mask = apply_masker(cfg, _spikes(seed), jax.random.key(seed), training=True)
        fracs.append(float(mask.mean()))
    # expansion keeps expected coverage near ratio (within statistical slack)
    assert 0.08 < np.mean(fracs) < 0.40


def test_cosmooth_static_and_override():
    cfg = MaskerConfig(mode="co-smooth", channels=(2, 5))
    _, mask = apply_masker(cfg, _spikes(), jax.random.key(0), training=True)
    m = np.asarray(mask)
    assert m[:, :, 2].all() and m[:, :, 5].all()
    assert m[:, :, 0].sum() == 0

    onehot = jnp.zeros((N,)).at[7].set(1)
    _, mask = apply_masker(
        cfg, _spikes(), jax.random.key(0), training=True,
        overrides=MaskerOverrides(channels_onehot=onehot),
    )
    m = np.asarray(mask)
    assert m[:, :, 7].all() and m[:, :, 2].sum() == 0


def test_forward_pred_timesteps():
    cfg = MaskerConfig(mode="forward-pred", timesteps=(30, 31, 32))
    _, mask = apply_masker(cfg, _spikes(), jax.random.key(0), training=True)
    m = np.asarray(mask)
    assert m[:, 30:33, :].all() and m[:, :30, :].sum() == 0


def _regions_idx():
    # regions 0,1,2,3 tiled over channels
    return jnp.asarray(np.tile(np.arange(4), N // 4)[None, :].repeat(B, 0))


def test_region_mode():
    cfg = MaskerConfig(mode="region", mask_region_ids=(1,))
    _, mask = apply_masker(
        cfg, _spikes(), jax.random.key(0), training=True, neuron_regions_idx=_regions_idx()
    )
    m = np.asarray(mask)
    regions = np.tile(np.arange(4), N // 4)
    assert m[:, :, regions == 1].all()
    assert m[:, :, regions != 1].sum() == 0


def test_inter_region_targets_are_masked_regions():
    cfg = MaskerConfig(mode="inter-region", ratio=1.0, mask_region_ids=(0, 2), n_mask_regions=1)
    _, mask = apply_masker(
        cfg, _spikes(), jax.random.key(5), training=True, neuron_regions_idx=_regions_idx()
    )
    m = np.asarray(mask)
    regions = np.tile(np.arange(4), N // 4)
    masked_regions = {int(r) for r in np.unique(regions[m[0, 0] > 0])}
    assert masked_regions.issubset({0, 2}) and len(masked_regions) == 1
    assert m[:, :, regions == 1].sum() == 0


def test_intra_region_targets_restricted_to_target_region():
    cfg = MaskerConfig(mode="intra-region", ratio=0.3, target_region_ids=(3,), n_mask_regions=1)
    out, mask = apply_masker(
        cfg, _spikes(), jax.random.key(6), training=True, neuron_regions_idx=_regions_idx()
    )
    m = np.asarray(mask)
    regions = np.tile(np.arange(4), N // 4)
    # targets only in region 3
    assert m[:, :, regions != 3].sum() == 0
    # everything outside region 3 was corrupted (zeroed) though not a target
    o = np.asarray(out)
    assert o[:, :, regions != 3].sum() == 0


def test_zero_and_random_replacement_mix():
    cfg = MaskerConfig(mode="random", ratio=1.0, zero_ratio=0.5, random_ratio=1.0)
    s = _spikes()
    out, mask = apply_masker(cfg, s, jax.random.key(7), training=True)
    o = np.asarray(out)
    changed = o != np.asarray(s)
    assert 0.5 < changed.mean() <= 1.0
    zeros = (o == 0).mean()
    assert 0.3 < zeros < 0.75


def test_multiple_maskers_or_masks():
    cfgs = [
        MaskerConfig(mode="co-smooth", channels=(0,)),
        MaskerConfig(mode="co-smooth", channels=(1,)),
    ]
    _, mask = apply_maskers(cfgs, _spikes(), jax.random.key(0), training=True)
    m = np.asarray(mask)
    assert m[:, :, 0].all() and m[:, :, 1].all() and m[:, :, 2].sum() == 0


def test_jit_and_vmap_compatible():
    cfg = MaskerConfig(mode="co-smooth", channels=(0,))

    @jax.jit
    def run(s, key, onehot):
        return apply_masker(cfg, s, key, True, overrides=MaskerOverrides(channels_onehot=onehot))

    onehots = jnp.eye(N)[:4]
    s = _spikes()
    outs = jax.vmap(lambda oh: run(s, jax.random.key(0), oh)[1])(onehots)
    assert outs.shape == (4, B, T, N)
    for i in range(4):
        assert np.asarray(outs[i])[:, :, i].all()
