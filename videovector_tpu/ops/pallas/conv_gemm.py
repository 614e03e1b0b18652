"""Conv as im2col + Pallas GEMM — the reference's conv lowering
(ref:src/caffe/layers/conv_layer.cpp im2col+GEMM; ref:src/caffe/util/
im2col.cu) rebuilt as a TPU kernel path.

The default conv path (ops/conv.py) is `lax.conv_general_dilated`, which XLA
maps to the MXU directly — that stays the production route. This module is
the hand-kernel alternative: patch-unroll (ops.conv.im2col) then the Pallas
tiled GEMM, useful for (a) kernel-level parity debugging against the
reference's conv math, (b) shapes where the explicit GEMM schedule wins.
"""

from __future__ import annotations

from videovector_tpu.ops.conv import im2col
from videovector_tpu.ops.pallas.matmul import matmul_padded


def conv2d_im2col_gemm(x, w, b=None, *, stride=(1, 1), pad=(0, 0),
                       interpret: bool = False):
    """x: (N, C, H, W); w: (O, C, kh, kw); b: (O,) → (N, O, oh, ow).
    Groups unsupported on this path (use ops.conv.conv2d)."""
    n, c, h, w_in = x.shape
    o, c2, kh, kw = w.shape
    if c != c2:
        raise ValueError("conv_gemm path does not support groups")
    cols = im2col(x, kernel=(kh, kw), stride=stride, pad=pad)  # (N, C·kh·kw, oh, ow)
    _, ck, oh, ow = cols.shape
    # (N·oh·ow, C·kh·kw) @ (C·kh·kw, O)
    lhs = cols.transpose(0, 2, 3, 1).reshape(n * oh * ow, ck)
    rhs = w.reshape(o, ck).T
    out = matmul_padded(lhs, rhs, b, interpret=interpret)
    return out.reshape(n, oh, ow, o).transpose(0, 3, 1, 2)
