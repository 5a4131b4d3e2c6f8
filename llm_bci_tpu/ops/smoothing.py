"""Gaussian temporal smoothing of spike trains.

TPU-native equivalent of the reference's depthwise CUDA conv1d
(``models/ndt1.py:78-107``): one shared gaussian kernel correlated along the
time axis of every channel, 'same' padding. XLA fuses this with the
surrounding elementwise noise ops.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel(smooth_sd: float) -> np.ndarray:
    """Normalized gaussian window of width ``1 + 6*sd`` (matches
    ``scipy.signal.gaussian(1 + 6*sd, sd)`` used at ``models/ndt1.py:87``)."""
    width = int(1 + 6 * smooth_sd)
    n = np.arange(width, dtype=np.float64) - (width - 1) / 2.0
    k = np.exp(-0.5 * (n / smooth_sd) ** 2)
    return (k / k.sum()).astype(np.float32)


def smooth_spikes(spikes: jax.Array, kernel: jax.Array) -> jax.Array:
    """Correlate ``spikes (B, T, N)`` with ``kernel (W,)`` along T, 'same'
    padding (asymmetric for even W, matching torch's padding="same")."""
    B, T, N = spikes.shape
    W = kernel.shape[0]
    in_dtype = spikes.dtype
    # Channels ride the batch dimension: (B, T, N) -> (B*N, T, 1) conv
    # would transpose twice; instead use a depthwise conv over feature dim.
    lhs = spikes.astype(jnp.float32)
    rhs = jnp.tile(kernel.astype(jnp.float32)[:, None, None], (1, 1, N))  # (W, 1, N)
    pad_lo = (W - 1) // 2
    pad_hi = W - 1 - pad_lo
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=N,
    )
    return out.astype(in_dtype)
