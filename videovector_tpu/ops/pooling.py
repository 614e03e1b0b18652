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
    # divisor in x's dtype: an f32 divisor would promote a bf16 chain to
    # f32 and double the downstream pool/LRN HBM traffic (the exact
    # promotion the int8-serving conv-bias fix removed, PERF.md r4)
    return summed / jnp.asarray(div, dtype=x.dtype)


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
    # per-window INDEPENDENT argmax via patch extraction: a reduce_window
    # max + equality-broadcast formulation is wrong with overlapping
    # windows (stride < kernel) — a window whose winning element is
    # covered by a stronger neighboring window matches nothing and used
    # to emit a spurious 0.0. K strided slices keep each window's race
    # private; K = kernel area is small (9 for pool3x3).
    oh, ow, pad_h, pad_w = _pool_geometry(h, w, kernel, stride, pad)
    sc = _patches(score, oh, ow, kernel, stride, (pad_h, pad_w), -jnp.inf)
    xs = _patches(x, oh, ow, kernel, stride, (pad_h, pad_w), 0.0)
    idx = jnp.argmax(sc, axis=-1)
    return jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]


def _patches(arr, oh, ow, kernel, stride, pads, fill):
    """(N, C, H, W) → (N, C, OH, OW, KH·KW): each output position's window
    elements along the last axis (one strided slice per kernel offset)."""
    a = jnp.pad(arr, ((0, 0), (0, 0), pads[0], pads[1]),
                constant_values=fill)
    ps = []
    for i in range(kernel[0]):
        for j in range(kernel[1]):
            ps.append(lax.slice(
                a, (0, 0, i, j),
                (a.shape[0], a.shape[1],
                 i + (oh - 1) * stride[0] + 1, j + (ow - 1) * stride[1] + 1),
                (1, 1, stride[0], stride[1])))
    return jnp.stack(ps, axis=-1)
