"""Convolution ops (NCHW, Caffe weight layout).

The reference lowers conv to im2col + GEMM (ref:src/caffe/layers/conv_layer.cpp,
ref:src/caffe/util/im2col.cpp). On TPU, XLA lowers `lax.conv_general_dilated`
straight onto the MXU with fused layout handling — an explicit im2col would
materialize the patch matrix in HBM and waste bandwidth. We keep Caffe's
weight layout (num_output, in_channels/group, kh, kw) = OIHW, which is also
lax's default, so `.caffemodel` conv blobs load with no transposition.

im2col/col2im are still provided (the reference exposes an IM2COL layer and
tests it) as pure functions built on patch extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv2d(x, w, b=None, *, stride=(1, 1), pad=(0, 0), groups: int = 1,
           preferred_dtype=jnp.float32):
    """x: (N, C, H, W); w: (O, C/groups, kh, kw); b: (O,).
    Caffe ConvolutionParameter semantics: symmetric zero padding, stride,
    `group` channel blocking (ref:include/caffe/vision_layers.hpp:19-112)."""
    out = lax.conv_general_dilated(
        x, w,
        window_strides=tuple(stride),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    # float inputs (f32/bf16): cast the f32-accumulated result back to the
    # input dtype; integer inputs (int8 PTQ) keep the int32 accumulator
    # for the caller to dequantize
    if jnp.issubdtype(x.dtype, jnp.floating):
        return out.astype(x.dtype)
    return out


def im2col(x, *, kernel=(1, 1), stride=(1, 1), pad=(0, 0)):
    """(N, C, H, W) → (N, C·kh·kw, out_h, out_w), channel-major patch order
    matching ref:src/caffe/util/im2col.cpp:8-35 (c*kh*kw + kh_i*kw + kw_i)."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = pad
    n, c, h, w = x.shape
    out_h = (h + 2 * ph - kh) // sh + 1
    out_w = (w + 2 * pw - kw) // sw + 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    cols = []
    for i in range(kh):
        for j in range(kw):
            patch = lax.slice(
                xp, (0, 0, i, j),
                (n, c, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1),
                (1, 1, sh, sw))
            cols.append(patch)
    stacked = jnp.stack(cols, axis=2)      # (N, C, kh*kw, oh, ow)
    return stacked.reshape(n, c * kh * kw, out_h, out_w)


def col2im(cols, *, input_hw, kernel=(1, 1), stride=(1, 1), pad=(0, 0)):
    """Adjoint of im2col (scatter-add of patches) — matches
    ref:src/caffe/util/im2col.cpp col2im_cpu. Implemented as the transpose of
    im2col via jax.linear_transpose (exact adjoint by construction)."""
    h, w = input_hw
    n = cols.shape[0]
    kh, kw = kernel
    c = cols.shape[1] // (kh * kw)

    def fwd(x):
        return im2col(x, kernel=kernel, stride=stride, pad=pad)

    transpose = jax.linear_transpose(
        fwd, jax.ShapeDtypeStruct((n, c, h, w), cols.dtype))
    (out,) = transpose(cols)
    return out
