"""Pooling (MAX / AVE / STOCHASTIC) with Caffe geometry.

Caffe computes output size with CEIL division and clips the last window to
start strictly inside the image when padded
(ref:src/caffe/layers/pooling_layer.cpp:66-90). AVE pooling divides by the
window size computed over the PADDED bounds (not clipped to the image,
ref :169-196) — both quirks preserved; they change CaffeNet's pool shapes
(55→27→13) and edge values, so they're load-bearing for fc7 parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _pooled_size(size, k, s, p):
    out = int(np.ceil((size + 2 * p - k) / s)) + 1
    if p > 0 and (out - 1) * s >= size + p:
        out -= 1
    return out


def _pool_geometry(h, w, kernel, stride, pad):
    kh, kw = kernel
    sh, sw = stride
    ph, pw = pad
    oh = _pooled_size(h, kh, sh, ph)
    ow = _pooled_size(w, kw, sw, pw)
    # pad enough on the bottom/right for the ceil-mode windows
    pad_h_end = max((oh - 1) * sh + kh - h - ph, 0)
    pad_w_end = max((ow - 1) * sw + kw - w - pw, 0)
    return oh, ow, (ph, pad_h_end), (pw, pad_w_end)


def max_pool(x, *, kernel, stride, pad=(0, 0)):
    """x: (N, C, H, W)."""
    _, _, h, w = x.shape
    _, _, pad_h, pad_w = _pool_geometry(h, w, kernel, stride, pad)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), pad_h, pad_w))


def avg_pool(x, *, kernel, stride, pad=(0, 0)):
    """Caffe AVE: divide by the window area within PADDED bounds."""
    n, c, h, w = x.shape
    oh, ow, pad_h, pad_w = _pool_geometry(h, w, kernel, stride, pad)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), pad_h, pad_w))
    # divisor per output position (static — computed at trace time)
    div = np.zeros((oh, ow), np.float32)
    for i in range(oh):
        hs = i * stride[0] - pad[0]
        he = min(hs + kernel[0], h + pad[0])
        for j in range(ow):
            ws = j * stride[1] - pad[1]
            we = min(ws + kernel[1], w + pad[1])
            div[i, j] = (he - hs) * (we - ws)
    return summed / jnp.asarray(div)


def stochastic_pool(x, *, kernel, stride, pad=(0, 0), rng=None,
                    deterministic: bool = True):
    """Stochastic pooling (ref:src/caffe/layers/pooling_layer.cu STOCHASTIC):
    TEST mode = value-weighted average Σx²/Σx over the window. TRAIN mode
    samples a window element with probability ∝ its value — implemented as an
    exponential race: key = Exp(1)/x, pick the window element with the
    smallest key (equivalent to value-proportional sampling)."""
    _, _, h, w = x.shape
    dims = (1, 1, kernel[0], kernel[1])
    strides = (1, 1, stride[0], stride[1])
    _, _, pad_h, pad_w = _pool_geometry(h, w, kernel, stride, pad)
    padding = ((0, 0), (0, 0), pad_h, pad_w)
    if deterministic or rng is None:
        num = lax.reduce_window(x * x, 0.0, lax.add, dims, strides, padding)
        den = lax.reduce_window(x, 0.0, lax.add, dims, strides, padding)
        return num / jnp.where(den == 0, 1.0, den)
    import jax
    u = jax.random.uniform(rng, x.shape, minval=1e-6, maxval=1.0)
    score = jnp.where(x > 0, x / (-jnp.log(u)), 0.0)  # max-score ⇔ min-key
    # joint max over (score, value) pairs: reduce on score, carry the value
    # by packing value into the mantissa-safe second reduce
    best_score = lax.reduce_window(score, -jnp.inf, lax.max, dims, strides,
                                   padding)
    # second pass: take the x whose score equals the window max (ties have
    # measure zero for continuous scores; overlapping windows share samples)
    masked = jnp.where(
        score == _window_broadcast(best_score, x.shape, kernel, stride,
                                   (padding[2], padding[3])),
        x, -jnp.inf)
    picked = lax.reduce_window(masked, -jnp.inf, lax.max, dims, strides,
                               padding)
    return jnp.where(jnp.isfinite(picked), picked, 0.0)


def _window_broadcast(pooled, full_shape, kernel, stride, pads):
    """Scatter each pooled value back over its (possibly overlapping) window,
    taking the max where windows overlap. Used to compare per-position scores
    with their window maxima."""
    n, c, h, w = full_shape
    (ph0, ph1), (pw0, pw1) = pads
    oh, ow = pooled.shape[2], pooled.shape[3]
    out = jnp.full((n, c, h + ph0 + ph1, w + pw0 + pw1), -jnp.inf,
                   dtype=pooled.dtype)
    for i in range(kernel[0]):
        for j in range(kernel[1]):
            upd = jnp.full_like(out, -jnp.inf)
            upd = upd.at[:, :, i:i + oh * stride[0]:stride[0],
                         j:j + ow * stride[1]:stride[1]].set(pooled)
            out = jnp.maximum(out, upd)
    return out[:, :, ph0:ph0 + h, pw0:pw0 + w]
