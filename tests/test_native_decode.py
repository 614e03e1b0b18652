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
def test_corrupt_scan_data_after_temp_alloc_returns_none():
    """Truncation AFTER a valid header: jpeg_read_scanlines longjmps out
    mid-decode while the temp buffer is live (48x48 from 64x64 is the
    non-direct bilinear path). Regression: the error path used to read a
    non-volatile pointer modified after setjmp (UB — leak or wild
    delete)."""
    payload = _jpeg(64, 64)
    # a bogus SOF marker inside the entropy-coded scan hits error_exit
    # during jpeg_read_scanlines (mere truncation only warns — libjpeg
    # pads missing scan data with gray)
    mid = len(payload) // 2
    corrupt = payload[:mid] + b"\xff\xc0\x00\x04" + payload[mid:]
    for _ in range(50):  # a leak/heap-corruption would compound
        assert native.decode_jpeg_bgr(corrupt, 48, 48) is None


@needs_jpeg
@pytest.mark.parametrize("w,h", [(1, 64), (64, 1), (1, 1)])
def test_one_pixel_wide_or_tall_source_resizes_safely(w, h):
    """Degenerate 1-pixel-wide/tall sources: the bilinear +1 taps must
    replicate the single row/column, not read past the decode buffer."""
    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    got = native.decode_jpeg_bgr(buf.getvalue(), 32, 32)
    assert got is not None and got.shape == (32, 32, 3)
    # every output pixel blends only real source pixels: it must stay
    # within the source's per-channel value range (replication bound)
    src = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
                     np.uint8)[:, :, ::-1].astype(int)
    for c in range(3):
        assert got[:, :, c].min() >= src[:, :, c].min() - 1
        assert got[:, :, c].max() <= src[:, :, c].max() + 1


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
