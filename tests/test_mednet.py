"""MedNet fast-path tests: NHWC tower agrees with the graph engine running
the unmodified reference extraction prototxt with the same weights."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse_file
from videovector_tpu.graph import Net
from videovector_tpu.models.mednet import MedNet, MedNetConfig

REF_EXTRACT = ("/root/reference/projects/videovec_embedding/"
               "videovec_extraction.prototxt")


def test_spatial_out_matches_caffenet():
    assert MedNet()._spatial_out() == 6   # 227 → conv/pool chain → 6


def test_forward_shapes(rng, key):
    model = MedNet(MedNetConfig(compute_dtype="float32"))
    params = model.init(key)
    x = jnp.asarray(rng.randn(2, 227, 227, 3).astype(np.float32))
    out = model.forward(params, x)
    assert out.shape == (2, 4096)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not os.path.exists(REF_EXTRACT), reason="no reference")
def test_parity_with_graph_engine(rng):
    """Same weights, NCHW engine vs NHWC fast path → same ip2 features."""
    net = Net(parse_file(REF_EXTRACT), phase="TEST")
    spec = {"data": jax.ShapeDtypeStruct((2, 3, 227, 227), jnp.float32),
            "label": jax.ShapeDtypeStruct((2,), jnp.float32)}
    net_params, _ = net.init(jax.random.PRNGKey(3), spec)

    model = MedNet(MedNetConfig(compute_dtype="float32"))
    params = MedNet.params_from_graph_engine(net_params)
    # graph net names fc6/fc7 layers as in CaffeNet
    assert set(params) >= {"conv1", "conv2", "conv3", "conv4", "conv5",
                           "fc6", "fc7"}

    img = rng.randn(2, 3, 227, 227).astype(np.float32)
    batch = {"data": jnp.asarray(img), "label": jnp.zeros((2,), jnp.float32)}
    _, blobs = net.apply(net_params, batch, return_blobs=True)
    ref_ip2 = np.asarray(blobs["ip2"])

    ours = np.asarray(model.forward(params, jnp.asarray(
        img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref_ip2, rtol=1e-3, atol=1e-3)


def test_conv1_space_to_depth_exact(rng):
    """The space-to-depth conv1 lowering (optional, MedNetConfig
    .conv1_space_to_depth) is the exact same math as the plain strided
    conv — the kernel zero-pads to a stride multiple so the extra input
    row/col contributes nothing."""
    plain = MedNet(MedNetConfig(compute_dtype="float32",
                                conv1_space_to_depth=False))
    s2d = MedNet(MedNetConfig(compute_dtype="float32",
                              conv1_space_to_depth=True))
    params = plain.init(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.randn(2, 227, 227, 3).astype(np.float32))
    a = np.asarray(plain.forward(params, img, upto="fc6"))
    b = np.asarray(s2d.forward(params, img, upto="fc6"))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
