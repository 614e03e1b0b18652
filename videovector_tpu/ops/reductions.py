"""Reduction and elementwise-combination ops (Sum layer, Eltwise layer)."""

from __future__ import annotations

import jax.numpy as jnp


def sum_reduce(x, num_output: int = 1):
    """Sum over all non-leading axes per sample; broadcast the scalar to
    `num_output` channels (ref:src/caffe/layers/sum_layer.cpp:32-54). Used as
    the dot-product score reducer after an Eltwise PROD: the broadcast lets
    one target score line up against `num_negatives` negative scores."""
    s = jnp.sum(x.reshape(x.shape[0], -1), axis=1, keepdims=True)
    if num_output == 1:
        return s
    return jnp.broadcast_to(s, (x.shape[0], num_output))


def eltwise_prod(*xs):
    """Eltwise PROD (ref:src/caffe/layers/eltwise_layer.cpp)."""
    out = xs[0]
    for x in xs[1:]:
        out = out * x
    return out


def eltwise_sum(*xs, coeffs=None):
    """Eltwise SUM with optional per-input coefficients."""
    if coeffs is None:
        coeffs = [1.0] * len(xs)
    if len(coeffs) != len(xs):
        raise ValueError("coeff count must match input count")
    out = coeffs[0] * xs[0]
    for c, x in zip(coeffs[1:], xs[1:]):
        out = out + c * x
    return out


def eltwise_max(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out
