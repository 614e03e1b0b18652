"""Elementwise ("neuron") ops.

Caffe-equivalent semantics from ref:include/caffe/neuron_layers.hpp:25-578 and
the corresponding src/caffe/layers/*_layer.cpp implementations. All are pure
elementwise maps fused by XLA into surrounding matmuls — there is no reason for
hand kernels here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x, negative_slope: float = 0.0):
    """ReLU with optional leak (ref:src/caffe/layers/relu_layer.cpp)."""
    if negative_slope == 0.0:
        return jnp.maximum(x, 0)
    return jnp.maximum(x, 0) + negative_slope * jnp.minimum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def bnll(x):
    """Binomial normal log likelihood: log(1 + exp(x)), overflow-safe
    (ref:src/caffe/layers/bnll_layer.cpp uses a branch at 0; softplus is the
    same function)."""
    return jax.nn.softplus(x)


def power(x, power: float = 1.0, scale: float = 1.0, shift: float = 0.0):
    """(shift + scale * x) ** power (ref:src/caffe/layers/power_layer.cpp)."""
    base = shift + scale * x
    if power == 1.0:
        return base
    return jnp.power(base, power)


def absval(x):
    return jnp.abs(x)


def threshold(x, threshold: float = 0.0):
    """1 if x > t else 0 (ref:src/caffe/layers/threshold_layer.cpp)."""
    return (x > threshold).astype(x.dtype)


def dropout(x, *, rate: float, rng, deterministic: bool = False):
    """Inverted dropout: keep with prob (1-rate), scale kept units by
    1/(1-rate) at train time; identity at test time
    (ref:src/caffe/layers/dropout_layer.cpp, scale_ = 1/(1-threshold)).

    The flagship config uses rate=0.9
    (ref:projects/videovec_embedding/mednet_embedding_train.prototxt:220-230).
    """
    if deterministic or rate == 0.0:
        return x
    if rate >= 1.0:
        # keep=0 sends a 0/0 through the VJP of x/keep → NaN gradients on
        # step one with no error; the reference DCHECKs threshold < 1
        raise ValueError(f"dropout rate must be < 1 (got {rate})")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
