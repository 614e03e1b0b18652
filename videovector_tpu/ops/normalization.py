"""Normalization ops."""

from __future__ import annotations

import jax.numpy as jnp

L2_NORM_EPS = 1e-10


def l2_normalize_rows(x, eps: float = L2_NORM_EPS):
    """Row-wise L2 normalize: y = x / (‖x‖₂ + eps), rows = leading axis,
    features = everything else (ref:src/caffe/layers/normalization_layer.cpp:29-61;
    eps added to the norm, not to the squared norm).

    Zero rows (common after ReLU + dropout .9) need care: naive autodiff of
    sqrt(Σx²) is 0/0 = NaN at x = 0, poisoning training. The reference's
    hand-written backward returns a zero gradient there (its numerator terms
    all carry x, normalization_layer.cpp:63-112); the where-guard below
    reproduces that: zero rows output 0 with zero gradient, nonzero rows get
    the exact quotient-rule gradient.
    """
    feat_axes = tuple(range(1, x.ndim))
    sq = jnp.sum(x * x, axis=feat_axes, keepdims=True)
    safe_norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, x / (safe_norm + eps), 0.0)


def mvn(x, *, normalize_variance: bool = True, across_channels: bool = False,
        eps: float = 1e-10):
    """Mean-variance normalization (ref:src/caffe/layers/mvn_layer.cpp).

    x: (N, C, H, W). across_channels=False normalizes each (H, W) plane per
    channel; True normalizes over C·H·W per sample.
    """
    if x.ndim != 4:
        raise ValueError("mvn expects NCHW")
    axes = (1, 2, 3) if across_channels else (2, 3)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    out = x - mean
    if normalize_variance:
        var = jnp.mean(out * out, axis=axes, keepdims=True)
        out = out / (jnp.sqrt(var) + eps)
    return out
