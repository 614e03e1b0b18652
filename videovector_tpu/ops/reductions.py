"""Reduction and elementwise-combination ops (Sum layer, Eltwise layer)."""

from __future__ import annotations

import jax
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


def eltwise_prod(*xs, stable_grad: bool = True):
    """Eltwise PROD (ref:src/caffe/layers/eltwise_layer.cpp).

    `stable_grad` = EltwiseParameter.stable_prod_grad (default true): the
    stable backward computes each input's grad as the product of the OTHER
    inputs (ref eltwise_layer.cpp:121-131) — which is exactly what autodiff
    of the chained multiply yields, so the default needs no custom rule.
    stable_prod_grad=false reproduces the reference's division formulation
    grad_i = (top / bottom_i) · top_diff (ref :132-134) — different only
    where an input is 0 (0/0 → NaN there, by design: "may be numerically
    unstable", caffe.proto:728-731)."""
    if stable_grad or len(xs) == 1:
        out = xs[0]
        for x in xs[1:]:
            out = out * x
        return out
    return _prod_div_grad(tuple(xs))


@jax.custom_vjp
def _prod_div_grad(xs):
    out = xs[0]
    for x in xs[1:]:
        out = out * x
    return out


def _prod_div_fwd(xs):
    out = _prod_div_grad(xs)
    return out, (xs, out)


def _prod_div_bwd(res, g):
    xs, out = res
    return (tuple((out / x) * g for x in xs),)


_prod_div_grad.defvjp(_prod_div_fwd, _prod_div_bwd)


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
