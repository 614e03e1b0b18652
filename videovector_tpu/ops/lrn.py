"""Local Response Normalization.

ref:src/caffe/layers/lrn_layer.cpp — cross-channel: for each position,
scale = 1 + (alpha/size)·Σ_{c' in window} x²  with window = channels
[c−size/2, c+size/2] clipped; y = x·scale^{−beta} (:105-160). Within-channel
mode delegates to average pooling of x² over a size×size spatial window
(the reference composes pool+power layers, :40-70)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from videovector_tpu.ops.pooling import avg_pool


def lrn_cross_channel(x, *, local_size: int = 5, alpha: float = 1.0,
                      beta: float = 0.75):
    """x: (N, C, H, W)."""
    half = local_size // 2
    sq = x * x
    # channel-window sum as shifted adds: a reduce_window over the
    # (non-minor) C axis miscompiles on the TPU backend at C=96
    # (post-optimization shape mismatch in the fused pow); local_size is
    # tiny (5 in every shipped config) so unrolled shifts fuse to the same
    # single pass over the tensor
    c = x.shape[1]
    sqp = jnp.pad(sq, ((0, 0), (half, local_size - 1 - half), (0, 0), (0, 0)))
    summed = sqp[:, 0:c]
    for o in range(1, local_size):
        summed = summed + sqp[:, o:o + c]
    scale = 1.0 + (alpha / local_size) * summed
    return x * jnp.power(scale, -beta)


def lrn_within_channel(x, *, local_size: int = 5, alpha: float = 1.0,
                       beta: float = 0.75):
    half = local_size // 2
    mean_sq = avg_pool(x * x, kernel=(local_size, local_size), stride=(1, 1),
                       pad=(half, half))
    scale = 1.0 + alpha * mean_sq
    return x * jnp.power(scale, -beta)
