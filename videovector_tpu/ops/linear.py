"""Fully-connected (InnerProduct) op.

Reference: ref:src/caffe/layers/inner_product_layer.cpp. Caffe stores the
weight as (num_output, fan_in) and computes y = x·Wᵀ + b. We store W as
(fan_in, num_output) — the natural layout for x @ W on the MXU; weight
loaders transpose when importing Caffe blobs.

Quirk preserved: the nonstandard `inner_product_param.regularization` value r
scales the weight gradient by (1 + r/2) in backward
(ref:src/caffe/layers/inner_product_layer.cpp:80-90, param caffe.proto:836).
Implemented with a custom_vjp only when r != 0 so the common path stays a
plain fused GEMM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _matmul(x, w, preferred_dtype):
    return jnp.dot(x, w, preferred_element_type=preferred_dtype)


def inner_product(x, w, b=None, *, regularization: float = 0.0,
                  preferred_dtype=jnp.float32):
    """y = x @ w (+ b). x: (M, K) [leading dims beyond 2 are flattened, as
    Caffe flattens C·H·W], w: (K, N), b: (N,)."""
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    if regularization > 0.0:
        # ref inner_product_layer.cpp:80-90 guards with
        # `if (regularization_ > 0)` — a negative value is inert there,
        # so scaling the weight grad for it would diverge
        y = _inner_product_reg(x, w, regularization)
    else:
        y = _matmul(x, w, preferred_dtype)
    if b is not None:
        y = y + b
    return y


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _inner_product_reg(x, w, regularization):
    return _matmul(x, w, jnp.float32)


def _ip_reg_fwd(x, w, regularization):
    return _matmul(x, w, jnp.float32), (x, w)


def _ip_reg_bwd(regularization, res, g):
    x, w = res
    dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.T, g, preferred_element_type=jnp.float32)
    dw = (dw * (1.0 + regularization / 2.0)).astype(w.dtype)
    return dx, dw


_inner_product_reg.defvjp(_ip_reg_fwd, _ip_reg_bwd)
