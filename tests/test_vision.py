"""Conv-stack tests: Caffe geometry (ceil pooling, grouped conv), torch
cross-checks for conv/pool numerics, im2col layout, LRN formula, the full
CaffeNet extraction prototxt through the graph engine, DataTransformer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from videovector_tpu.config import parse_file
from videovector_tpu.data.transformer import (
    TransformConfig, make_batch_transform, sample_transform_params,
    transform_datum,
)
from videovector_tpu.data.wire import Datum
from videovector_tpu.graph import Net
from videovector_tpu.ops.conv import col2im, conv2d, im2col
from videovector_tpu.ops.lrn import lrn_cross_channel
from videovector_tpu.ops.pooling import avg_pool, max_pool, stochastic_pool

REF_EXTRACT = ("/root/reference/projects/videovec_embedding/"
               "videovec_extraction.prototxt")


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 6, 9, 9).astype(np.float32)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)   # groups=2
    b = rng.randn(8).astype(np.float32)
    out = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                 stride=(2, 2), pad=(1, 1), groups=2)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=2, padding=1, groups=2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_max_pool_ceil_mode_matches_torch(rng):
    # CaffeNet pool geometry: 55 → 27 requires ceil mode (k=3, s=2)
    x = rng.randn(1, 2, 55, 55).astype(np.float32)
    out = max_pool(jnp.asarray(x), kernel=(3, 3), stride=(2, 2))
    assert out.shape == (1, 2, 27, 27)
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, ceil_mode=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_max_pool_with_padding_clip(rng):
    x = rng.randn(1, 1, 6, 6).astype(np.float32)
    out = max_pool(jnp.asarray(x), kernel=(3, 3), stride=(2, 2), pad=(1, 1))
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, padding=1, ceil_mode=True)
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_avg_pool_caffe_divisor(rng):
    """AVE divides by window size within PADDED bounds (ref :169-196) —
    torch equivalent: count_include_pad=True, ceil_mode=True."""
    x = rng.randn(1, 2, 7, 7).astype(np.float32)
    out = avg_pool(jnp.asarray(x), kernel=(3, 3), stride=(2, 2), pad=(1, 1))
    ref = F.avg_pool2d(torch.from_numpy(x), 3, 2, padding=1, ceil_mode=True,
                       count_include_pad=True)
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_stochastic_pool_test_mode(rng):
    x = np.abs(rng.randn(1, 1, 4, 4)).astype(np.float32)
    out = stochastic_pool(jnp.asarray(x), kernel=(2, 2), stride=(2, 2))
    win = x[0, 0, :2, :2]
    expect = (win ** 2).sum() / win.sum()
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expect, rtol=1e-5)


def test_stochastic_pool_train_samples_window_values(rng, key):
    x = np.abs(rng.randn(1, 1, 6, 6)).astype(np.float32) + 0.1
    out = stochastic_pool(jnp.asarray(x), kernel=(2, 2), stride=(2, 2),
                          rng=key, deterministic=False)
    out = np.asarray(out)
    for i in range(3):
        for j in range(3):
            win = x[0, 0, 2*i:2*i+2, 2*j:2*j+2]
            assert out[0, 0, i, j] in win


def test_im2col_layout_and_col2im_adjoint(rng):
    x = rng.randn(2, 3, 5, 5).astype(np.float32)
    cols = im2col(jnp.asarray(x), kernel=(3, 3), stride=(2, 2), pad=(1, 1))
    # torch unfold uses the same (c, kh, kw) channel-major order
    ref = F.unfold(torch.from_numpy(x), 3, padding=1, stride=2)  # (N, C*9, L)
    oh = ow = 3
    np.testing.assert_allclose(
        np.asarray(cols).reshape(2, 27, oh * ow), ref.numpy(), atol=1e-6)
    # col2im is the exact adjoint (fold with divisor-free accumulation)
    back = col2im(cols, input_hw=(5, 5), kernel=(3, 3), stride=(2, 2),
                  pad=(1, 1))
    ref_fold = F.fold(ref, (5, 5), 3, padding=1, stride=2)
    np.testing.assert_allclose(np.asarray(back), ref_fold.numpy(), atol=1e-5)


def test_lrn_formula(rng):
    x = rng.randn(2, 7, 3, 3).astype(np.float32)
    alpha, beta, size = 1e-4, 0.75, 5
    out = lrn_cross_channel(jnp.asarray(x), local_size=size, alpha=alpha,
                            beta=beta)
    # manual loop oracle (scale = 1 + alpha/size * window sum of squares)
    expect = np.empty_like(x)
    for n in range(2):
        for c in range(7):
            lo, hi = max(0, c - size // 2), min(7, c + size // 2 + 1)
            s = (x[n, lo:hi] ** 2).sum(axis=0)
            expect[n, c] = x[n, c] * (1.0 + alpha / size * s) ** (-beta)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)
    # torch LRN uses the same formula (k=1)
    ref = F.local_response_norm(torch.from_numpy(x), size, alpha=alpha,
                                beta=beta, k=1.0)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_EXTRACT), reason="no reference")
def test_caffenet_extraction_net_shapes(rng):
    """The unmodified videovec_extraction.prototxt builds and produces the
    canonical CaffeNet activation shapes at 227×227."""
    net = Net(parse_file(REF_EXTRACT), phase="TEST")
    spec = {"data": jax.ShapeDtypeStruct((2, 3, 227, 227), jnp.float32),
            "label": jax.ShapeDtypeStruct((2,), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    shapes = {k: v.shape for k, v in net._blob_shapes.items()}
    assert shapes["conv1"] == (2, 96, 55, 55)
    assert shapes["pool1"] == (2, 96, 27, 27)
    assert shapes["conv2"] == (2, 256, 27, 27)
    assert shapes["pool2"] == (2, 256, 13, 13)
    assert shapes["conv3"] == (2, 384, 13, 13)
    assert shapes["conv5"] == (2, 256, 13, 13)
    assert shapes["pool5"] == (2, 256, 6, 6)
    assert shapes["fc6"] == (2, 4096)
    # fc7's top is named ip1_nonorm; the final ReLU emits ip2 (the blob
    # extract_features dumps, ref feature_extraction_pretrained_mednet.sh)
    assert shapes["ip1_nonorm"] == (2, 4096)
    assert shapes["ip2"] == (2, 4096)
    # grouped convs hold group-split weights (conv2 group=2: 256×48×5×5)
    assert params["conv2"]["w"].shape == (256, 48, 5, 5)

    # forward runs
    batch = {"data": jnp.asarray(rng.randn(2, 3, 227, 227).astype(np.float32)),
             "label": jnp.zeros((2,), jnp.float32)}
    _, blobs = net.apply(params, batch, return_blobs=True)
    assert blobs["ip2"].shape == (2, 4096)
    assert np.isfinite(np.asarray(blobs["ip2"])).all()


# -- DataTransformer ---------------------------------------------------------

def _image_datum(rng, c=3, h=8, w=8):
    pix = rng.randint(0, 256, size=(c, h, w)).astype(np.uint8)
    return Datum(channels=c, height=h, width=w, data=pix.tobytes()), pix


def test_transform_center_crop_and_mean(rng):
    datum, pix = _image_datum(rng)
    mean = rng.rand(3, 8, 8).astype(np.float32)
    cfg = TransformConfig(crop_size=4, scale=0.5)
    out = transform_datum(datum, cfg, mean=mean, train=False)
    expect = (pix[:, 2:6, 2:6].astype(np.float32) - mean[:, 2:6, 2:6]) * 0.5
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_transform_train_crop_mirror(rng):
    datum, pix = _image_datum(rng)
    cfg = TransformConfig(crop_size=4, mirror=True)
    r = np.random.RandomState(3)
    out = transform_datum(datum, cfg, train=True, rng=r)
    assert out.shape == (3, 4, 4)
    # output patch must match some crop of the image (mirrored or not)
    found = False
    for ho in range(5):
        for wo in range(5):
            p = pix[:, ho:ho+4, wo:wo+4].astype(np.float32)
            if np.allclose(out, p) or np.allclose(out, p[:, :, ::-1]):
                found = True
    assert found


def test_transform_datum_scales(rng):
    datum, pix = _image_datum(rng)
    datum.mean = np.asarray([1.0, 2.0, 3.0], np.float32)
    datum.min = np.asarray([0.0, -1.0, 0.5], np.float32)
    datum.max = np.asarray([2.0, 1.0, 1.5], np.float32)
    cfg = TransformConfig(crop_size=4, use_datum_scales=True)
    out = transform_datum(datum, cfg, train=False)
    c = 1
    p = pix[c, 2:6, 2:6].astype(np.float32)
    expect = -1.0 + p * 2.0 / 255.0 - 2.0
    np.testing.assert_allclose(out[c], expect, rtol=1e-5)


def test_fused_batch_transform_matches_host(rng):
    cfg = TransformConfig(crop_size=4, mirror=True, scale=2.0)
    mean = rng.rand(3, 8, 8).astype(np.float32)
    pix = rng.randint(0, 256, size=(5, 3, 8, 8)).astype(np.uint8)
    f = jax.jit(make_batch_transform(cfg, mean, (8, 8)))
    h_off, w_off, mirror = sample_transform_params(
        5, (8, 8), cfg, train=True, rng=np.random.RandomState(0))
    out = np.asarray(f(jnp.asarray(pix), jnp.asarray(h_off),
                       jnp.asarray(w_off), jnp.asarray(mirror)))
    for i in range(5):
        patch = (pix[i, :, h_off[i]:h_off[i]+4, w_off[i]:w_off[i]+4]
                 .astype(np.float32)
                 - mean[:, h_off[i]:h_off[i]+4, w_off[i]:w_off[i]+4]) * 2.0
        if mirror[i]:
            patch = patch[:, :, ::-1]
        np.testing.assert_allclose(out[i], patch, rtol=1e-5)


def test_stochastic_pool_train_overlapping_windows(rng, key):
    """stride < kernel: every window must sample one of ITS OWN elements
    — the old reduce_window+equality formulation emitted spurious 0.0
    whenever a window's winning element was covered by a stronger
    neighboring window (its max was 'stolen' by the broadcast)."""
    import jax
    from videovector_tpu.ops.pooling import stochastic_pool
    x = jnp.asarray(rng.rand(2, 3, 7, 7).astype(np.float32) + 0.5)
    out = stochastic_pool(x, kernel=(3, 3), stride=(1, 1), rng=key,
                          deterministic=False)
    xn = np.asarray(x)
    on = np.asarray(out)
    assert (on > 0).all()          # all inputs >= 0.5 → no zeros possible
    for n in range(2):
        for c in range(3):
            for i in range(on.shape[2]):
                for j in range(on.shape[3]):
                    win = xn[n, c, i:i + 3, j:j + 3]
                    assert np.isclose(win, on[n, c, i, j]).any(), (i, j)


def test_avg_pool_preserves_bf16(rng):
    """The AVE divisor must not promote a bf16 chain to f32 (the exact
    promotion the int8-serving conv-bias fix removed)."""
    from videovector_tpu.ops.pooling import avg_pool
    x = jnp.asarray(rng.rand(1, 2, 8, 8), jnp.bfloat16)
    out = avg_pool(x, kernel=(3, 3), stride=(2, 2))
    assert out.dtype == jnp.bfloat16


def test_lrn_rejects_even_local_size(rng):
    """ref lrn_layer.cpp CHECK_EQ(size_ % 2, 1): an even local_size would
    silently use a window shifted one channel vs Caffe."""
    import pytest
    from videovector_tpu.ops.lrn import lrn_cross_channel, lrn_within_channel
    x = jnp.asarray(rng.rand(1, 8, 4, 4).astype(np.float32))
    with pytest.raises(ValueError, match="odd"):
        lrn_cross_channel(x, local_size=4)
    with pytest.raises(ValueError, match="odd"):
        lrn_within_channel(x, local_size=4)


def test_transform_mirror_requires_crop(rng):
    """ref data_transformer.cpp:43-45 LOG(FATAL): mirror without crop_size
    must error, not silently train without the augmentation."""
    import pytest
    from videovector_tpu.data.transformer import (
        TransformConfig, make_batch_transform, transform_datum,
    )
    from videovector_tpu.data.wire import Datum
    cfg = TransformConfig(crop_size=0, mirror=True)
    d = Datum(channels=1, height=4, width=4,
              data=bytes(rng.randint(0, 255, 16, dtype=np.uint8)))
    with pytest.raises(ValueError, match="mirror"):
        transform_datum(d, cfg, train=True, rng=rng)
    with pytest.raises(ValueError, match="mirror"):
        make_batch_transform(cfg, None, (4, 4))
    with pytest.raises(ValueError, match="datum_scales"):
        make_batch_transform(TransformConfig(crop_size=2,
                                             use_datum_scales=True),
                             None, (4, 4))
