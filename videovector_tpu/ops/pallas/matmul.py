"""Pallas TPU matmul with fused epilogue (bias + ReLU).

The hand-kernel path for the framework's dominant op: the (B·R, D)×(D, E)
embedding-tower GEMM (and, through ops/pallas/conv_gemm.py, conv-as-
im2col+GEMM — the reference's conv strategy, ref:src/caffe/layers/
conv_layer.cpp + util/im2col.cpp, re-done as an MXU kernel instead of CUDA).

Grid: (M/bm, N/bn, K/bk) with a VMEM accumulator carried across the K
dimension; inputs fed as bf16 (MXU native), accumulation in f32, epilogue
(bias add + ReLU) fused into the final K step so the activation never makes
an extra HBM round trip.

Tests run in interpreter mode on CPU; on TPU the kernel compiles via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, fuse_relu: bool,
                   n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:]
        if b_ref is not None:
            out = out + b_ref[:]
        if fuse_relu:
            out = jnp.maximum(out, 0.0)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "fuse_relu", "interpret",
                                             "out_dtype"))
def matmul(x, w, b=None, *, block_m: int = 256, block_n: int = 256,
           block_k: int = 512, fuse_relu: bool = False, interpret: bool = False,
           out_dtype=jnp.float32):
    """x: (M, K), w: (K, N), b: (N,) optional → (M, N).

    M/K/N must be divisible by the block sizes (callers pad; the flagship
    shapes 1920×4096×4096 divide evenly after padding M to 2048)."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0, (
        f"shape ({m},{k})x({k},{n}) not divisible by blocks "
        f"({block_m},{block_n},{block_k})")
    n_k = k // block_k

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
    ]
    args = [x, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        args.append(b.reshape(1, n))

        def kernel(x_ref, w_ref, b_ref, o_ref, acc_ref):
            _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref,
                           fuse_relu=fuse_relu, n_k=n_k)
    else:
        def kernel(x_ref, w_ref, o_ref, acc_ref):
            _matmul_kernel(x_ref, w_ref, None, o_ref, acc_ref,
                           fuse_relu=fuse_relu, n_k=n_k)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // block_m, n // block_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * x.dtype.itemsize + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def matmul_padded(x, w, b=None, **kw):
    """matmul with automatic zero-padding to block multiples."""
    m, k = x.shape
    _, n = w.shape
    bm = min(kw.get("block_m", 256), _round_up(m, 8))
    pm = _round_up(m, bm)
    pn = _round_up(n, kw.get("block_n", 256))
    pk = _round_up(k, kw.get("block_k", 512))
    xp = jnp.pad(x, ((0, pm - m), (0, pk - k))) if (pm != m or pk != k) else x
    wp = jnp.pad(w, ((0, pk - k), (0, pn - n))) if (pk != k or pn != n) else w
    bp = None
    if b is not None:
        bp = jnp.pad(b, (0, pn - n)) if pn != n else b
    kw.setdefault("block_m", min(256, pm))
    kw.setdefault("block_n", min(256, pn))
    kw.setdefault("block_k", min(512, pk))
    out = matmul(xp, wp, bp, **kw)
    return out[:m, :n]


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m
