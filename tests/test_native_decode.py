"""Native JPEG decode (native/vvdata.cpp vv_decode_jpeg_bgr): value
parity against cv2/PIL within the established warp-tolerance pattern,
geometry exactness, and the IMAGE_DATA wiring (VERDICT r4 item 4 —
the reference decodes in C++, ref:src/caffe/util/io.cpp:69-88)."""

import io
import os

import numpy as np
import pytest

from videovector_tpu.data import native


def _jpeg(w, h, quality=92, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    img = Image.fromarray(base).resize((w, h))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


needs_jpeg = pytest.mark.skipif(not native.jpeg_available(),
                                reason="libvvdata built without libjpeg")


@needs_jpeg
def test_natural_size_matches_pil_decode():
    """No resample: native output = the JPEG's decoded pixels (same
    libjpeg in PIL), BGR order."""
    from PIL import Image
    payload = _jpeg(96, 64)
    got = native.decode_jpeg_bgr(payload)
    assert got.shape == (64, 96, 3) and got.dtype == np.uint8
    want = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"),
                      np.uint8)[:, :, ::-1]
    # identical libjpeg, possibly different IDCT/SIMD paths → tiny diffs
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 1.0
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 16


@needs_jpeg
@pytest.mark.parametrize("src,dst", [((320, 240), (256, 256)),
                                     ((640, 480), (256, 256)),
                                     ((256, 256), (256, 256)),
                                     ((100, 80), (256, 256))])  # upscale
def test_resize_matches_cv2_within_warp_tolerance(src, dst):
    cv2 = pytest.importorskip("cv2")
    (w, h), (tw, th) = src, dst
    payload = _jpeg(w, h)
    got = native.decode_jpeg_bgr(payload, tw, th)
    assert got.shape == (th, tw, 3)
    ref = cv2.resize(cv2.imdecode(np.frombuffer(payload, np.uint8), 1),
                     (tw, th))
    diff = np.abs(got.astype(int) - ref.astype(int))
    # DCT prescale + float bilinear vs full decode + fixed-point
    # INTER_LINEAR: small resampler differences, same geometry
    assert np.mean(diff) < 3.0
    assert (diff > 40).mean() < 0.01


@needs_jpeg
def test_corrupt_stream_returns_none():
    assert native.decode_jpeg_bgr(b"\xff\xd8 garbage not a jpeg") is None
    assert native.decode_jpeg_bgr(_jpeg(64, 64)[:40], 32, 32) is None


@needs_jpeg
def test_grayscale_source_expands_to_bgr():
    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (40, 40), dtype=np.uint8),
                          mode="L")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    got = native.decode_jpeg_bgr(buf.getvalue())
    assert got.shape == (40, 40, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_image_data_source_uses_decoder_stack(tmp_path):
    """IMAGE_DATA end to end: batches identical within tolerance whether
    the native decoder is on or off (cv2/PIL fallback)."""
    from PIL import Image
    from videovector_tpu.data.generic import ImageDataConfig, ImageDataSource
    from videovector_tpu.data.transformer import TransformConfig
    rng = np.random.RandomState(1)
    listing = tmp_path / "list.txt"
    with open(listing, "w") as f:
        for i in range(4):
            p = tmp_path / f"im{i}.jpg"
            base = rng.randint(0, 255, (45, 60, 3), dtype=np.uint8)
            Image.fromarray(base).resize((480, 360)).save(p, "JPEG",
                                                          quality=92)
            f.write(f"{p} {i}\n")

    def batch():
        src = ImageDataSource(
            ImageDataConfig(source=str(listing), batch_size=4,
                            new_height=256, new_width=256),
            transform=TransformConfig(crop_size=227), train=False)
        return src.next_batch()["data"]

    on = batch()
    os.environ["VVTPU_NATIVE_DECODE"] = "0"
    try:
        off = batch()
    finally:
        os.environ.pop("VVTPU_NATIVE_DECODE", None)
    assert on.shape == off.shape == (4, 3, 227, 227)
    assert np.mean(np.abs(on - off)) < 4.0
