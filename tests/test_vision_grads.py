"""Backward cross-checks for the conv stack against torch autograd — the
analogue of the reference's GradientChecker suites for conv/pool/LRN
(ref:src/caffe/test/test_convolution_layer.cpp etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from videovector_tpu.ops.conv import conv2d
from videovector_tpu.ops.lrn import lrn_cross_channel
from videovector_tpu.ops.pooling import avg_pool, max_pool


def _torch_grads(fn, *tensors):
    ts = [torch.from_numpy(np.asarray(t)).requires_grad_(True) for t in tensors]
    out = fn(*ts)
    out.sum().backward()
    return [t.grad.numpy() for t in ts]


def test_conv_backward_matches_torch(rng):
    x = rng.randn(2, 4, 7, 7).astype(np.float32)
    w = rng.randn(6, 2, 3, 3).astype(np.float32)  # groups=2
    b = rng.randn(6).astype(np.float32)

    gx, gw, gb = jax.grad(
        lambda x, w, b: jnp.sum(conv2d(x, w, b, stride=(2, 2), pad=(1, 1),
                                       groups=2)),
        argnums=(0, 1, 2))(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    tx, tw, tb = _torch_grads(
        lambda x, w, b: F.conv2d(x, w, b, stride=2, padding=1, groups=2),
        x, w, b)
    np.testing.assert_allclose(np.asarray(gx), tx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), tw, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), tb, atol=1e-4)


def test_max_pool_backward_matches_torch(rng):
    x = rng.randn(1, 3, 9, 9).astype(np.float32)
    gx = jax.grad(lambda x: jnp.sum(max_pool(x, kernel=(3, 3),
                                             stride=(2, 2)) ** 2))(jnp.asarray(x))
    (tx,) = _torch_grads(
        lambda x: F.max_pool2d(x, 3, 2, ceil_mode=True) ** 2, x)
    np.testing.assert_allclose(np.asarray(gx), tx, atol=1e-4)


def test_avg_pool_backward_matches_torch(rng):
    x = rng.randn(1, 2, 7, 7).astype(np.float32)
    gx = jax.grad(lambda x: jnp.sum(avg_pool(x, kernel=(3, 3), stride=(2, 2),
                                             pad=(1, 1)) ** 2))(jnp.asarray(x))
    (tx,) = _torch_grads(
        lambda x: F.avg_pool2d(x, 3, 2, padding=1, ceil_mode=True,
                               count_include_pad=True) ** 2, x)
    np.testing.assert_allclose(np.asarray(gx), tx, atol=1e-4)


def test_lrn_backward_matches_torch(rng):
    x = rng.randn(2, 8, 4, 4).astype(np.float32)
    gx = jax.grad(lambda x: jnp.sum(lrn_cross_channel(
        x, local_size=5, alpha=1e-4, beta=0.75) ** 2))(jnp.asarray(x))
    (tx,) = _torch_grads(
        lambda x: F.local_response_norm(x, 5, alpha=1e-4, beta=0.75,
                                        k=1.0) ** 2, x)
    np.testing.assert_allclose(np.asarray(gx), tx, atol=1e-4)


def test_prefetcher_thread_safety_smoke(rng):
    """Hammer the prefetcher from a consumer while the producer races
    (the framework's only host-concurrency surface besides the native ring;
    the reference relied on join-before-copy discipline,
    ref base_data_layer.cpp:81-95)."""
    from videovector_tpu.data.prefetch import DevicePrefetcher

    def gen():
        for i in range(200):
            yield {"x": np.full((4,), i, np.float32)}

    pf = DevicePrefetcher(gen(), depth=3)
    seen = [int(np.asarray(b["x"])[0]) for b in pf]
    assert seen == list(range(200))
