"""Tests for the generic data sources (DATA / IMAGE_DATA / MEMORY / HDF5 /
WINDOW / FLEXIBLE / VIDEO_SHOT_WINDOW)."""

import numpy as np
import pytest

from videovector_tpu.data.generic import (
    DatumRecordSource, FlexibleDataConfig, FlexibleDataSource, HDF5Source,
    ImageDataConfig, ImageDataSource, MemoryDataSource, VideoShotWindowSource,
    WindowDataConfig, WindowDataSource, hdf5_output,
)
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.data.transformer import TransformConfig
from videovector_tpu.data.wire import Datum, VideoShotWindow


def _write_datum_records(path, rng, n=10, c=3, h=8, w=8):
    arrays = []
    with RecordWriter(path) as wtr:
        for i in range(n):
            pix = rng.randint(0, 256, size=(c, h, w)).astype(np.uint8)
            arrays.append(pix)
            d = Datum(channels=c, height=h, width=w, data=pix.tobytes(),
                      label=i % 4)
            wtr.append(f"{i:08d}", d.encode())
    return arrays


def test_datum_record_source(tmp_path, rng):
    path = str(tmp_path / "d.vvr")
    arrays = _write_datum_records(path, rng)
    src = DatumRecordSource(path, batch_size=4,
                            transform=TransformConfig(crop_size=6))
    b = src.next_batch()
    assert b["data"].shape == (4, 3, 6, 6)
    np.testing.assert_array_equal(b["label"], [0, 1, 2, 3])
    # center crop of item 0
    np.testing.assert_allclose(b["data"][0],
                               arrays[0][:, 1:7, 1:7].astype(np.float32))


def test_image_data_source(tmp_path, rng):
    from PIL import Image
    paths = []
    for i in range(3):
        img = Image.fromarray(rng.randint(0, 255, (10, 12, 3)).astype(np.uint8))
        p = tmp_path / f"im{i}.png"
        img.save(p)
        paths.append(str(p))
    list_file = tmp_path / "list.txt"
    list_file.write_text("\n".join(f"{p} {i}" for i, p in enumerate(paths)))
    cfg = ImageDataConfig(source=str(list_file), batch_size=3,
                          new_height=8, new_width=8)
    src = ImageDataSource(cfg)
    b = src.next_batch()
    assert b["data"].shape == (3, 3, 8, 8)
    np.testing.assert_array_equal(b["label"], [0, 1, 2])


def test_memory_source(rng):
    src = MemoryDataSource({"x": rng.randn(7, 3), "y": np.arange(7)}, 4)
    b1 = src.next_batch()
    b2 = src.next_batch()
    np.testing.assert_array_equal(b1["y"], [0, 1, 2, 3])
    np.testing.assert_array_equal(b2["y"], [4, 5, 6, 0])


def test_hdf5_source_and_output(tmp_path, rng):
    import h5py
    f1 = tmp_path / "a.h5"
    with h5py.File(f1, "w") as f:
        f.create_dataset("data", data=rng.randn(5, 3).astype(np.float32))
        f.create_dataset("label", data=np.arange(5).astype(np.float32))
    lst = tmp_path / "list.txt"
    lst.write_text(str(f1))
    src = HDF5Source(str(lst), batch_size=3)
    b = src.next_batch()
    assert b["data"].shape == (3, 3)
    np.testing.assert_array_equal(b["label"], [0, 1, 2])
    b = src.next_batch()   # wraps to next file (same file)
    np.testing.assert_array_equal(b["label"], [3, 4, 0])

    out = tmp_path / "out.h5"
    hdf5_output(str(out), {"feat": rng.randn(2, 4)})
    with h5py.File(out) as f:
        assert f["feat"].shape == (2, 4)


def test_window_data_source(tmp_path, rng):
    from PIL import Image
    img_path = tmp_path / "scene.png"
    Image.fromarray(rng.randint(0, 255, (40, 40, 3)).astype(np.uint8)).save(img_path)
    win_file = tmp_path / "windows.txt"
    win_file.write_text(
        "# 0\n"
        f"{img_path}\n3\n40\n40\n3\n"
        "1 0.8 5 5 20 20\n"
        "2 0.6 10 10 30 30\n"
        "0 0.1 0 0 15 15\n")
    cfg = WindowDataConfig(source=str(win_file), batch_size=8, crop_size=12,
                           fg_fraction=0.5)
    src = WindowDataSource(cfg, seed=0)
    assert len(src.fg) == 2 and len(src.bg) == 1
    b = src.next_batch()
    assert b["data"].shape == (8, 3, 12, 12)
    # half fg (labels 1/2), half bg (label 0)
    assert (b["label"][:4] > 0).all()
    assert (b["label"][4:] == 0).all()


def test_flexible_data_source(tmp_path, rng):
    # frame store: 9 ordered frames, value float encodes frame index
    frames_path = str(tmp_path / "frames.vvr")
    h = w = 6
    with RecordWriter(frames_path) as wtr:
        for i in range(9):
            pix = np.full((1, h, w), i * 10, np.uint8)
            wtr.append(f"frame{i:04d}.png", Datum(
                channels=1, height=h, width=w, data=pix.tobytes()).encode())
    # index store: keys "XXXXXXXXXframe0004" (9-char prefix), value "0007..."
    index_path = str(tmp_path / "index.vvr")
    with RecordWriter(index_path) as wtr:
        wtr.append("123456789frame0004", b"0007rest")
    cfg = FlexibleDataConfig(source=index_path, flexible_source=frames_path,
                             flexible_key_suffix=".png", forward_len=1,
                             backward_len=2, use_center_datum=True,
                             batch_size=1)
    src = FlexibleDataSource(cfg, transform=TransformConfig(crop_size=4))
    b = src.next_batch()
    # 4 frames stacked as channels: frames 2,3,4,5
    assert b["data"].shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(b["label"], [7])
    np.testing.assert_allclose(b["data"][0, 0], 20.0)
    np.testing.assert_allclose(b["data"][0, 2], 40.0)
    np.testing.assert_allclose(b["data"][0, 3], 50.0)


def test_video_id_text_source(tmp_path):
    from videovector_tpu.data.generic import VideoIdTextSource
    f = tmp_path / "ids.txt"
    f.write_text("5 7 11\n13")
    src = VideoIdTextSource(str(f), batch_size=6)
    b = src.next_batch()
    np.testing.assert_array_equal(b["data"], [5, 7, 11, 13, 5, 7])


def test_video_shot_window_source(tmp_path, rng):
    path = str(tmp_path / "wins.vvr")
    dim = 5
    with RecordWriter(path) as wtr:
        for i in range(12):
            mk = lambda v: Datum(float_data=np.full(dim, v, np.float32))
            w = VideoShotWindow(video_id=i, shot_id=i * 2,
                                target_shot_word=mk(i),
                                context_shot_words=[mk(i + 100), mk(i + 200)])
            wtr.append(str(i), w.encode())
    src = VideoShotWindowSource(path, batch_size=3, num_negative_samples=2,
                                max_buffer_size=8, negative_swap_percentage=50)
    # reference data order: the reservoir seed consumes the MAIN cursor
    # (video_shot_window_data_layer.cpp:259-341), so training starts at
    # record max_buffer_size, not at 0
    b = src.next_batch()
    assert b["data"].shape == (3, 1 + 2 + 2, dim)
    np.testing.assert_allclose(b["data"][1, 0], 9.0)    # target of win 9
    np.testing.assert_allclose(b["data"][1, 1], 109.0)  # first context
    np.testing.assert_array_equal(b["video_id"], [8, 9, 10])

    # a separate negative dataset does NOT consume the main cursor
    src2 = VideoShotWindowSource(path, batch_size=3, num_negative_samples=2,
                                 max_buffer_size=8,
                                 negative_swap_percentage=50,
                                 negative_path=path)
    b2 = src2.next_batch()
    np.testing.assert_array_equal(b2["video_id"], [0, 1, 2])

    # misconfiguration fails at setup, not mid-training in numpy
    import pytest
    with pytest.raises(ValueError, match="max_buffer_size"):
        VideoShotWindowSource(path, batch_size=3, num_negative_samples=4,
                              max_buffer_size=2)


def test_display_all_ids_logs_items(tmp_path, rng, caplog):
    """display_all_ids: one Item-id:Video-id:Shot-id warning per item
    (ref video_shot_window_data_layer.cpp:469-471)."""
    import logging

    path = str(tmp_path / "wins.vvr")
    dim = 4
    with RecordWriter(path) as wtr:
        for i in range(5):
            mk = lambda v: Datum(float_data=np.full(dim, v, np.float32))
            w = VideoShotWindow(video_id=i + 1, shot_id=i * 2,
                                target_shot_word=mk(i),
                                context_shot_words=[mk(i + 100)])
            wtr.append(str(i), w.encode())
    # the package logger has propagate=False (glog-format handler), so
    # caplog's root-logger handler never sees it — attach directly
    pkg_logger = logging.getLogger("videovector_tpu")
    pkg_logger.addHandler(caplog.handler)
    try:
        src = VideoShotWindowSource(path, batch_size=2, display_all_ids=True)
        src.next_batch()
        msgs = [r.getMessage() for r in caplog.records]
        assert "Item-id:Video-id:Shot-id:0:1:0" in msgs
        assert "Item-id:Video-id:Shot-id:1:2:2" in msgs

        # off by default: no per-item lines
        caplog.clear()
        src2 = VideoShotWindowSource(path, batch_size=2)
        src2.next_batch()
        assert not [m for m in caplog.records
                    if "Item-id" in m.getMessage()]
    finally:
        pkg_logger.removeHandler(caplog.handler)


# ---------------------------------------------------------------------------
# Reference window geometry (ref window_data_layer.cpp:238-324): hand-computed
# pad-then-warp boxes, including edge-touching windows.
# ---------------------------------------------------------------------------

def test_window_geometry_interior_box():
    from videovector_tpu.data.generic import window_geometry
    # context_scale = 227/195; box 50x60 at (10,20) in a 500x400 image
    roi, (rw, rh), pw, ph = window_geometry(
        (10, 20, 59, 79), 500, 400, 227, 16)
    assert roi == (6, 15, 64, 85)      # round(center ± half*227/195)
    assert (rw, rh) == (227, 227)      # nothing clipped -> full warp
    assert (pw, ph) == (0, 0)


def test_window_geometry_edge_touching():
    from videovector_tpu.data.generic import window_geometry
    # box at the image corner: expansion goes 4px out of bounds on both axes
    roi, (rw, rh), pw, ph = window_geometry((0, 0, 49, 49), 100, 100, 227, 16)
    # x1 = round(25 - 25*227/195) = -4 -> clipped to 0, pad_x1 = 4
    assert roi == (0, 0, 54, 54)
    # scale = 227/59; resize = round(55*227/59) = 212; pad = round(4*227/59) = 15
    assert (rw, rh) == (212, 212)
    assert (pw, ph) == (15, 15)
    assert pw + rw == 227 and ph + rh == 227


def test_window_geometry_mirror_pads_right():
    from videovector_tpu.data.generic import window_geometry
    # overflow only on the right edge: without mirror pad_w = pad_x1 = 0,
    # with mirror pad_w = pad_x2 (ref :309-314)
    box = (50, 25, 99, 74)   # touches x = 99 in a 100-wide image
    _, _, pw_plain, _ = window_geometry(box, 100, 100, 227, 16)
    _, _, pw_mirror, _ = window_geometry(box, 100, 100, 227, 16,
                                         do_mirror=True)
    assert pw_plain == 0
    assert pw_mirror > 0


def test_window_geometry_square_mode():
    from videovector_tpu.data.generic import window_geometry
    # use_square with context_pad=0: tall 20x60 box becomes 60x60 expanded
    roi, (rw, rh), pw, ph = window_geometry(
        (100, 100, 119, 159), 500, 400, 227, 0, use_square=True)
    x1, y1, x2, y2 = roi
    # half sides become 30 each; inclusive round gives 2*30+1 = 61
    assert roi == (80, 100, 140, 160)
    assert (x2 - x1 + 1) == (y2 - y1 + 1) == 61
    assert (rw, rh) == (227, 227)


def test_window_geometry_no_context_pad_identity():
    from videovector_tpu.data.generic import window_geometry
    roi, size, pw, ph = window_geometry((3, 4, 30, 40), 100, 100, 227, 0)
    assert roi == (3, 4, 30, 40) and size == (227, 227) and (pw, ph) == (0, 0)


def test_window_source_zero_padding_and_content(tmp_path, rng):
    """End to end: an edge window yields exact zeros in the padding band and
    warped content elsewhere."""
    import cv2
    from videovector_tpu.data.generic import (
        WindowDataConfig, WindowDataSource, window_geometry,
    )
    img = rng.randint(0, 256, (100, 100, 3)).astype(np.uint8)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, img)
    win_file = tmp_path / "windows.txt"
    win_file.write_text(
        f"# 0\n{path}\n3\n100\n100\n2\n"
        "1 0.9 0 0 49 49\n"     # fg, corner window
        "0 0.1 60 60 90 90\n")  # bg
    cfg = WindowDataConfig(source=str(win_file), batch_size=2,
                           fg_fraction=0.5, context_pad=16, crop_size=227,
                           mirror=False)
    src = WindowDataSource(cfg, seed=0)
    b = src.next_batch()
    assert b["data"].shape == (2, 3, 227, 227)
    fg = b["data"][0]
    # pads computed above: 15 rows/cols of exact zeros, content elsewhere
    assert np.all(fg[:, :15, :] == 0) and np.all(fg[:, :, :15] == 0)
    assert np.any(fg[:, 15:, 15:] != 0)
    # content equals cv2 warp of the clipped roi pasted at the pad offset
    roi, (rw, rh), pw, ph = window_geometry((0, 0, 49, 49), 100, 100, 227, 16)
    x1, y1, x2, y2 = roi
    expect = cv2.resize(img[y1:y2 + 1, x1:x2 + 1], (rw, rh),
                        interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(
        fg[:, ph:ph + rh, pw:pw + rw],
        expect.astype(np.float32).transpose(2, 0, 1))


def test_window_source_pil_fallback_warp(tmp_path, rng, monkeypatch):
    """Without cv2 the PIL fallback path (data/generic.py _crop/_imread_bgr)
    must produce the identical geometry (pads, zero bands) and resampling
    within a bounded tolerance of the cv2 warp — PIL and OpenCV bilinear
    kernels differ only in rounding/edge handling
    (ref:src/caffe/layers/window_data_layer.cpp:7-200 uses cv::resize)."""
    import sys
    import cv2
    from videovector_tpu.data.generic import (
        WindowDataConfig, WindowDataSource, window_geometry,
    )
    img = rng.randint(0, 256, (100, 100, 3)).astype(np.uint8)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, img)
    win_file = tmp_path / "windows.txt"
    win_file.write_text(
        f"# 0\n{path}\n3\n100\n100\n2\n"
        "1 0.9 0 0 49 49\n"
        "0 0.1 60 60 90 90\n")
    cfg = WindowDataConfig(source=str(win_file), batch_size=2,
                           fg_fraction=0.5, context_pad=16, crop_size=227,
                           mirror=False)

    with_cv2 = WindowDataSource(cfg, seed=0).next_batch()["data"]
    # hide cv2: `import cv2` now raises ImportError inside the source
    monkeypatch.setitem(sys.modules, "cv2", None)
    without_cv2 = WindowDataSource(cfg, seed=0).next_batch()["data"]

    # identical geometry: the exact-zero padding bands match elementwise
    roi, (rw, rh), pw, ph = window_geometry((0, 0, 49, 49), 100, 100, 227, 16)
    assert np.array_equal(with_cv2 == 0, without_cv2 == 0)
    # resampled content within a bounded kernel difference:
    # measured max |PIL - cv2| is <=3/255 grey levels on random uint8 images
    diff = np.abs(with_cv2 - without_cv2)
    assert float(diff.max()) <= 3.0, float(diff.max())
    assert float(diff.mean()) <= 0.5, float(diff.mean())


def test_hdf5_source_reads_reference_shipped_fixtures(tmp_path):
    """Foreign-artifact HDF5: the reference repo SHIPS sample_data.h5 and a
    gzip-compressed twin (src/caffe/test/test_data/, generated by its
    generate_sample_data.py: data = arange(10*8*6*5) row-major, label =
    1+arange(10)); our HDF5_DATA source must read those exact bytes with
    the reference's file-cycling semantics
    (ref:src/caffe/test/test_hdf5data_layer.cpp:54-110 TestRead)."""
    import os
    ref_dir = "/root/reference/src/caffe/test/test_data"
    plain = os.path.join(ref_dir, "sample_data.h5")
    gz = os.path.join(ref_dir, "sample_data_2_gzip.h5")
    if not (os.path.exists(plain) and os.path.exists(gz)):
        pytest.skip("reference fixtures unavailable")
    from videovector_tpu.data.generic import HDF5Source
    lst = tmp_path / "list.txt"
    lst.write_text(f"{plain}\n{gz}\n")
    src = HDF5Source(str(lst), batch_size=5)

    b1 = src.next_batch()
    assert b1["data"].shape == (5, 8, 6, 5)
    expect = np.arange(10 * 8 * 6 * 5, dtype=np.float32).reshape(10, 8, 6, 5)
    np.testing.assert_array_equal(b1["data"], expect[:5])
    np.testing.assert_array_equal(b1["label"].reshape(-1), [1, 2, 3, 4, 5])
    b2 = src.next_batch()
    np.testing.assert_array_equal(b2["data"], expect[5:])
    # file 2 (gzip-compressed, shuffled variant of the same generator):
    # decompression is h5py's job; we only require identical dtypes/shapes
    # and the 1-indexed label contract
    b3 = src.next_batch()
    assert b3["data"].shape == (5, 8, 6, 5)
    assert set(np.unique(b3["label"])) <= set(range(1, 11))


def test_flexible_source_store_boundary_raises(tmp_path, rng):
    """A frame window that leaves the store bounds must raise — a
    Python-wrapped negative index would silently stack the END of the
    store (another video) into the item. The reference CHECK-fails at
    the boundary (flexible_data_layer.cpp rewind loop)."""
    import pytest
    from videovector_tpu.data.generic import (
        FlexibleDataConfig, FlexibleDataSource,
    )
    from videovector_tpu.data.transformer import TransformConfig
    frames_path = str(tmp_path / "frames.vvr")
    with RecordWriter(frames_path) as wtr:
        for i in range(5):
            pix = np.full((1, 6, 6), i * 10, np.uint8)
            wtr.append(f"f{i}.png", Datum(channels=1, height=6, width=6,
                                          data=pix.tobytes()).encode())
    index_path = str(tmp_path / "index.vvr")
    with RecordWriter(index_path) as wtr:
        wtr.append("123456789f1", b"0007")   # center=1, backward 2 → -1
    cfg = FlexibleDataConfig(source=index_path, flexible_source=frames_path,
                             flexible_key_suffix=".png", forward_len=1,
                             backward_len=2, use_center_datum=True,
                             batch_size=1)
    src = FlexibleDataSource(cfg, transform=TransformConfig(crop_size=4))
    with pytest.raises(ValueError, match="store bounds"):
        src.next_batch()


def test_rand_skip_reference_semantics(tmp_path, rng):
    """rand_skip draws from [0, rand_skip-1] (caffe_rng_rand() %
    rand_skip) and must not exceed the dataset size."""
    import pytest
    from videovector_tpu.data.generic import DatumRecordSource
    path = str(tmp_path / "data.vvr")
    with RecordWriter(path) as wtr:
        for i in range(6):
            wtr.append(str(i), Datum(
                float_data=[float(i)], channels=1, height=1,
                width=1).encode())
    for seed in range(20):
        src = DatumRecordSource(path, batch_size=1, rand_skip=6, seed=seed)
        assert 0 <= src._cursor < 6      # never == rand_skip
        src.next_batch()                 # and always readable
    with pytest.raises(ValueError, match="rand_skip"):
        DatumRecordSource(path, batch_size=1, rand_skip=7)
