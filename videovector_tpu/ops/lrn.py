"""Local Response Normalization.

ref:src/caffe/layers/lrn_layer.cpp — cross-channel: for each position,
scale = 1 + (alpha/size)·Σ_{c' in window} x²  with window = channels
[c−size/2, c+size/2] clipped; y = x·scale^{−beta} (:105-160). Within-channel
mode delegates to average pooling of x² over a size×size spatial window
(the reference composes pool+power layers, :40-70)."""

from __future__ import annotations

import jax.numpy as jnp


from videovector_tpu.ops.pooling import avg_pool


def channel_window_sum(sq, axis: int, local_size: int):
    """Clipped sliding-window sum over `axis` as unrolled shifted adds.

    This formulation is deliberate: a reduce_window over a non-minor axis
    MISCOMPILES on the TPU backend at C=96 (post-optimization shape
    mismatch in the fused pow), and over the minor (lane) axis it ran as a
    standalone 0.24 ms op where shifted adds fuse into the neighboring
    elementwise pass (trace, batch 50). local_size is tiny (5 in every
    shipped config) so the unroll is a single fused pass."""
    half = local_size // 2
    c = sq.shape[axis]
    pads = [(0, 0)] * sq.ndim
    pads[axis] = (half, local_size - 1 - half)
    sqp = jnp.pad(sq, pads)
    idx = [slice(None)] * sq.ndim
    summed = None
    for o in range(local_size):
        idx[axis] = slice(o, o + c)
        part = sqp[tuple(idx)]
        summed = part if summed is None else summed + part
    return summed


def _check_odd(local_size: int) -> None:
    # ref lrn_layer.cpp LayerSetUp: CHECK_EQ(size_ % 2, 1) << "LRN only
    # supports odd values for local_size" — an even size would silently
    # use a window shifted one channel vs Caffe's (size-1)/2 pre-pad
    if local_size % 2 != 1:
        raise ValueError(f"LRN local_size must be odd (got {local_size}); "
                         f"the reference CHECKs this at setup")


def lrn_cross_channel(x, *, local_size: int = 5, alpha: float = 1.0,
                      beta: float = 0.75):
    """x: (N, C, H, W)."""
    _check_odd(local_size)
    summed = channel_window_sum(x * x, 1, local_size)
    scale = 1.0 + (alpha / local_size) * summed
    return x * jnp.power(scale, -beta)


def lrn_within_channel(x, *, local_size: int = 5, alpha: float = 1.0,
                       beta: float = 0.75):
    _check_odd(local_size)
    half = local_size // 2
    mean_sq = avg_pool(x * x, kernel=(local_size, local_size), stride=(1, 1),
                       pad=(half, half))
    scale = 1.0 + alpha * mean_sq
    return x * jnp.power(scale, -beta)
