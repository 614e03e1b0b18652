"""Pallas kernel tests (interpreter mode on CPU; same kernels compile via
Mosaic on TPU — bench.py exercises that path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.ops.conv import conv2d
from videovector_tpu.ops.pallas.conv_gemm import conv2d_im2col_gemm
from videovector_tpu.ops.pallas.matmul import matmul, matmul_padded


def test_pallas_matmul_matches_xla(rng):
    x = jnp.asarray(rng.randn(256, 512).astype(np.float32))
    w = jnp.asarray(rng.randn(512, 256).astype(np.float32))
    out = matmul(x, w, block_m=128, block_n=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), atol=1e-3)


def test_pallas_matmul_bias_relu_epilogue(rng):
    x = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    out = matmul(x, w, b, block_m=128, block_n=128, block_k=128,
                 fuse_relu=True, interpret=True)
    expect = np.maximum(np.asarray(x) @ np.asarray(w) + np.asarray(b), 0)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-3)


def test_pallas_matmul_padded_odd_shapes(rng):
    x = jnp.asarray(rng.randn(100, 300).astype(np.float32))
    w = jnp.asarray(rng.randn(300, 70).astype(np.float32))
    out = matmul_padded(x, w, interpret=True)
    assert out.shape == (100, 70)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), atol=1e-3)


def test_conv_im2col_gemm_matches_lax_conv(rng):
    x = jnp.asarray(rng.randn(2, 3, 9, 9).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 3, 3, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    ours = conv2d_im2col_gemm(x, w, b, stride=(2, 2), pad=(1, 1),
                              interpret=True)
    ref = conv2d(x, w, b, stride=(2, 2), pad=(1, 1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-3)
