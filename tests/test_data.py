"""Data-plane tests: wire codec round-trips, VVR records, reservoir
semantics, context samplers, prefetcher."""

import os

import numpy as np
import pytest

from videovector_tpu.data.records import RecordReader, RecordWriter
from videovector_tpu.data.shots import (
    ExhaustiveShotsConfig, FixedVideoShotGallery, NegativeReservoir,
    SampledShotsConfig, ShotDataset, ShotVideo, TestWindowDataset,
    VideoSampledShotsSource, VideoShotsSource, VideoShotWindowTestSource,
)
from videovector_tpu.data.wire import (
    BlobProto, Datum, TestVideoShotWindows, TrackingWindow, TrackPositions,
    VideoShots, VideoShotWindow,
)
from videovector_tpu.data.prefetch import DevicePrefetcher


# -- wire codec --------------------------------------------------------------

def test_datum_roundtrip(rng):
    d = Datum(channels=3, height=4, width=2, data=b"\x01\x02",
              label=7, float_data=rng.randn(5).astype(np.float32),
              mean=np.asarray([1.0], np.float32))
    d2 = Datum.decode(d.encode())
    assert (d2.channels, d2.height, d2.width, d2.label) == (3, 4, 2, 7)
    assert d2.data == b"\x01\x02"
    np.testing.assert_allclose(d2.float_data, d.float_data)
    np.testing.assert_allclose(d2.mean, [1.0])


def test_negative_int_roundtrip():
    d = Datum(label=-1)
    assert Datum.decode(d.encode()).label == -1


def test_video_shots_roundtrip(rng):
    words = [Datum(float_data=rng.randn(6).astype(np.float32)) for _ in range(3)]
    m = VideoShots(video_id=42, shot_ids=[0, 2, 5], shot_words=words,
                   video_name="vid.mp4")
    m2 = VideoShots.decode(m.encode())
    assert m2.video_id == 42
    assert m2.shot_ids == [0, 2, 5]
    assert m2.video_name == "vid.mp4"
    np.testing.assert_allclose(m2.shot_words[1].float_data, words[1].float_data)


def test_shot_window_and_test_windows_roundtrip(rng):
    t = Datum(float_data=rng.randn(4).astype(np.float32))
    w = VideoShotWindow(video_id=1, shot_id=2, video_name="x",
                        target_shot_word=t, context_shot_words=[t, t])
    w2 = VideoShotWindow.decode(w.encode())
    assert w2.shot_id == 2 and len(w2.context_shot_words) == 2

    tw = TestVideoShotWindows(video_id=9, positive_shot_id=[1, 2],
                              positive_shot_words=[t], context_shot_words=[t],
                              negative_shot_words=[t, t], negative_shot_id=[5, 6])
    tw2 = TestVideoShotWindows.decode(tw.encode())
    assert tw2.video_id == 9
    assert tw2.positive_shot_id == [1, 2]
    assert tw2.negative_shot_id == [5, 6]
    assert len(tw2.negative_shot_words) == 2


def test_tracking_roundtrip(rng):
    tp = TrackPositions(id=3, x=[1.0, 2.0], y=[3.0, 4.0], cl=1)
    tw = TrackingWindow(observed_time=[0.0, 1.0], prediction_time=[2.0],
                        scene_id=5, track_positions=[tp, tp])
    tw2 = TrackingWindow.decode(tw.encode())
    assert tw2.scene_id == 5
    assert len(tw2.track_positions) == 2
    np.testing.assert_allclose(tw2.track_positions[0].x, [1.0, 2.0])


def test_blob_proto_roundtrip(rng):
    arr = rng.randn(2, 3, 4, 5).astype(np.float32)
    b = BlobProto.from_array(arr)
    b2 = BlobProto.decode(b.encode())
    np.testing.assert_allclose(b2.to_array(), arr)


def test_wire_cross_check_with_google_protobuf(tmp_path, rng):
    """Cross-validate our hand codec against the official protobuf runtime
    by compiling an equivalent schema on the fly."""
    protobuf = pytest.importorskip("google.protobuf")
    import subprocess, sys, importlib
    proto = tmp_path / "check.proto"
    proto.write_text(
        'syntax = "proto2";\n'
        "message CheckDatum {\n"
        "  optional int32 channels = 1;\n"
        "  optional int32 height = 2;\n"
        "  optional int32 width = 3;\n"
        "  optional bytes data = 4;\n"
        "  optional int32 label = 5;\n"
        "  repeated float float_data = 6;\n"
        "}\n")
    subprocess.run(["protoc", f"--python_out={tmp_path}", "check.proto"],
                   cwd=tmp_path, check=True)
    sys.path.insert(0, str(tmp_path))
    try:
        mod = importlib.import_module("check_pb2")
        fd = rng.randn(4).astype(np.float32)
        ours = Datum(channels=2, height=3, width=1, data=b"ab", label=-7,
                     float_data=fd)
        theirs = mod.CheckDatum()
        theirs.ParseFromString(ours.encode())
        assert theirs.channels == 2 and theirs.label == -7
        np.testing.assert_allclose(list(theirs.float_data), fd, rtol=1e-6)
        # and the reverse direction
        back = Datum.decode(theirs.SerializeToString())
        np.testing.assert_allclose(back.float_data, fd, rtol=1e-6)
    finally:
        sys.path.remove(str(tmp_path))


# -- records ------------------------------------------------------------------

def test_record_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.vvr")
    with RecordWriter(path) as w:
        for i in range(10):
            w.append(f"key{i:03d}", bytes(rng.bytes(i * 7 + 1)))
    r = RecordReader(path)
    assert len(r) == 10
    assert r.key(3) == b"key003"
    assert r.get("key005") == r.value(5)
    keys = [k for k, _ in r]
    assert keys == [f"key{i:03d}".encode() for i in range(10)]
    r.close()


# -- dataset & reservoir ------------------------------------------------------

def _make_dataset(rng, num_videos=12, min_shots=6, max_shots=12, dim=16):
    videos = []
    for v in range(num_videos):
        s = rng.randint(min_shots, max_shots + 1)
        videos.append(ShotVideo(video_id=v + 100,
                                shot_ids=np.arange(s, dtype=np.int32),
                                features=rng.randn(s, dim).astype(np.float32)))
    return ShotDataset(videos)


def test_dataset_records_roundtrip(tmp_path, rng):
    ds = _make_dataset(rng)
    path = str(tmp_path / "shots.vvr")
    ds.to_records(path)
    ds2 = ShotDataset.from_records(path)
    assert len(ds2) == len(ds)
    np.testing.assert_allclose(ds2[3].features, ds[3].features)
    assert ds2[3].video_id == ds[3].video_id


def test_reservoir_fill_dedup_and_swap(rng):
    ds = _make_dataset(rng, num_videos=5)
    res = NegativeReservoir(20, 16, swap_percentage=50,
                            rng=np.random.RandomState(0))
    res.fill(ds)
    assert len(res.keys) == 20
    assert len(res.key_set) == 20  # all distinct

    # swap: offering new keys replaces ~50%
    before = res.buffer.copy()
    ds2 = _make_dataset(np.random.RandomState(99), num_videos=4)
    for v in ds2.videos:
        v.video_id += 1000  # fresh keys
        res.offer_video(v)
    changed = (np.abs(res.buffer - before).sum(axis=1) > 0).sum()
    assert changed > 0
    assert len(res.key_set) == 20

    # existing keys never re-added
    k0 = res.keys[0]
    res.maybe_add(k0, np.zeros(16, np.float32))
    assert not np.all(res.buffer[0] == 0) or k0 != res.keys[0]


def test_reservoir_sample_distinct():
    res = NegativeReservoir(10, 4, 0, np.random.RandomState(0))
    res.buffer = np.arange(40, dtype=np.float32).reshape(10, 4)
    res.keys = [str(i) for i in range(10)]
    res.key_set = set(res.keys)
    s = res.sample(10)
    # all 10 distinct rows present
    assert len({tuple(r) for r in s}) == 10


# -- flagship sampled source --------------------------------------------------

def test_sampled_window_source_layout(rng):
    ds = _make_dataset(rng, dim=16)
    cfg = SampledShotsConfig(batch_size=8, num_negative_samples=4,
                             max_buffer_size=30, negative_swap_percentage=50,
                             max_same_video_negs=2, context_type="WINDOW",
                             context_size=5)
    src = VideoSampledShotsSource(ds, cfg)
    batch = src.next_batch()
    assert batch["data"].shape == (8, 5 + 4, 16)
    assert batch["video_id"].shape == (8,)
    # every row's target and contexts are real shots from the labeled video
    for b in range(8):
        vid = int(batch["video_id"][b])
        video = next(v for v in ds.videos if v.video_id == vid)
        for c in range(5):
            row = batch["data"][b, c]
            dists = np.abs(video.features - row).sum(axis=1)
            assert dists.min() < 1e-6, f"row {b} ch {c} not from video {vid}"


def test_sampled_same_video_cap_exceeds_negatives(rng):
    """max_same_video_negs > num_negative_samples must not overflow the
    negative slots (the reference's loop bound is max_same_video_negs
    alone and scribbles past the item block,
    ref:video_sampled_shots_data_layer.cpp:485 — we cap at the slot
    count)."""
    ds = _make_dataset(rng, dim=16)
    cfg = SampledShotsConfig(batch_size=8, num_negative_samples=3,
                             max_buffer_size=30, negative_swap_percentage=50,
                             max_same_video_negs=6, context_type="WINDOW",
                             context_size=5)
    src = VideoSampledShotsSource(ds, cfg)
    for _ in range(3):
        batch = src.next_batch()
        assert batch["data"].shape == (8, 5 + 3, 16)
        assert np.isfinite(batch["data"]).all()


def test_sampled_window_contexts_sorted_around_target(rng):
    """WINDOW: target is the middle of 5 sorted sampled indices; contexts are
    the other 4 (ref AddSamplesToTop WINDOW branch)."""
    ds = _make_dataset(rng, num_videos=3, min_shots=10, max_shots=10)
    cfg = SampledShotsConfig(batch_size=4, context_type="WINDOW",
                             context_size=5)
    src = VideoSampledShotsSource(ds, cfg)
    batch = src.next_batch()
    for b in range(4):
        vid = int(batch["video_id"][b])
        video = next(v for v in ds.videos if v.video_id == vid)
        idx = []
        for c in range(5):
            row = batch["data"][b, c]
            pos = int(np.argmin(np.abs(video.features - row).sum(axis=1)))
            idx.append(pos)
        tgt, ctx = idx[0], sorted(idx[1:])
        # target strictly inside the sorted context ids: 2 below, 2 above
        assert sum(1 for c in ctx if c < tgt) == 2
        assert sum(1 for c in ctx if c > tgt) == 2


def test_sampled_pairwise_distance_labels(rng):
    ds = _make_dataset(rng, num_videos=3)
    cfg = SampledShotsConfig(batch_size=16, context_type="PAIRWISE",
                             output_shot_distance=True, max_shot_distance=3)
    src = VideoSampledShotsSource(ds, cfg)
    batch = src.next_batch()
    assert batch["data"].shape[1] == 2
    assert np.all(batch["video_id"] <= 3)
    assert np.all(batch["video_id"] >= 1)


def test_sampled_past_continuous_modes(rng):
    ds = _make_dataset(rng, num_videos=4, min_shots=8, max_shots=14)
    for mode in ("PAST", "PAST_CONTINUOUS", "PAST_CONTINUOUS_FIXED"):
        cfg = SampledShotsConfig(batch_size=6, context_type=mode,
                                 context_size=3, num_negative_samples=3,
                                 max_buffer_size=20,
                                 negative_swap_percentage=30,
                                 max_same_video_negs=2)
        src = VideoSampledShotsSource(ds, cfg)
        batch = src.next_batch()
        assert batch["data"].shape == (6, 3 + 3, ds.feature_dim)
        assert np.isfinite(batch["data"]).all()


def test_sampled_skips_short_videos(rng):
    videos = [ShotVideo(1, np.arange(1, dtype=np.int32),
                        rng.randn(1, 8).astype(np.float32)),
              ShotVideo(2, np.arange(6, dtype=np.int32),
                        rng.randn(6, 8).astype(np.float32))]
    ds = ShotDataset(videos)
    cfg = SampledShotsConfig(batch_size=4, context_type="WINDOW",
                             context_size=5)
    src = VideoSampledShotsSource(ds, cfg)
    batch = src.next_batch()
    assert np.all(batch["video_id"] == 2)  # the 1-shot video is skipped


# -- exhaustive source ----------------------------------------------------------

def test_exhaustive_pairwise_covers_all_ordered_pairs(rng):
    videos = [ShotVideo(7, np.arange(4, dtype=np.int32),
                        np.eye(4, 8, dtype=np.float32))]
    ds = ShotDataset(videos)
    cfg = ExhaustiveShotsConfig(batch_size=12, context_type="PAIRWISE")
    src = VideoShotsSource(ds, cfg)
    batch = src.next_batch()
    # 4 shots → 12 ordered pairs, one batch exactly
    pairs = set()
    for b in range(12):
        i = int(np.argmax(batch["data"][b, 0]))
        j = int(np.argmax(batch["data"][b, 1]))
        pairs.add((i, j))
    assert pairs == {(i, j) for i in range(4) for j in range(4) if i != j}


def test_exhaustive_window_border_padding(rng):
    videos = [ShotVideo(7, np.arange(5, dtype=np.int32),
                        rng.rand(5, 8).astype(np.float32) + 1.0)]
    ds = ShotDataset(videos)
    cfg = ExhaustiveShotsConfig(batch_size=5, context_type="WINDOW",
                                context_size=2)
    src = VideoShotsSource(ds, cfg)
    batch = src.next_batch()
    # first item: target 0 → left context out of range → zeros + flag
    left = batch["data"][0, 1]
    assert np.all(left[:-1] == 0) and left[-1] == 1
    # right context of item 0 is shot 1
    np.testing.assert_allclose(batch["data"][0, 2], ds[0].features[1])
    # middle items fully in range
    assert np.all(batch["data"][2, 1] == ds[0].features[1])


# -- test sources -----------------------------------------------------------------

def _make_test_windows(rng, n=5, ctx=4, pos=2, neg=3, dim=8):
    wins = []
    for i in range(n):
        mk = lambda: Datum(float_data=rng.randn(dim).astype(np.float32))
        wins.append(TestVideoShotWindows(
            video_id=i + 1,
            positive_shot_words=[mk() for _ in range(pos)],
            context_shot_words=[mk() for _ in range(ctx)],
            negative_shot_words=[mk() for _ in range(neg)]))
    return TestWindowDataset(wins)


def test_test_window_source_layout(rng):
    ds = _make_test_windows(rng)
    src = VideoShotWindowTestSource(ds, batch_size=5)
    batch = src.next_batch()
    assert batch["data"].shape == (5, 4 + 2 + 3, 8)
    np.testing.assert_array_equal(batch["video_ids"], [1, 2, 3, 4, 5])

    src2 = VideoShotWindowTestSource(ds, batch_size=5,
                                     include_positives=False,
                                     include_negatives=False)
    assert src2.next_batch()["data"].shape == (5, 4, 8)


def test_fixed_gallery(tmp_path, rng):
    ds = _make_test_windows(rng, n=3, pos=2, neg=1)
    path = str(tmp_path / "gal.vvr")
    with RecordWriter(path) as w:
        for i, win in enumerate(ds.windows):
            w.append(str(i), win.encode())
    g = FixedVideoShotGallery.from_records(path)
    assert g.features.shape == (9, 8)   # 3 windows × (2 pos + 1 neg)
    assert list(g.video_ids) == [1, 1, -1, 2, 2, -1, 3, 3, -1]


# -- prefetcher ---------------------------------------------------------------

def test_device_prefetcher_preserves_order_and_stops(rng):
    def gen():
        for i in range(7):
            yield {"x": np.full((2, 3), i, np.float32)}

    pf = DevicePrefetcher(gen(), depth=2)
    seen = [int(np.asarray(b["x"])[0, 0]) for b in pf]
    assert seen == list(range(7))


def test_device_prefetcher_propagates_errors():
    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    pf = DevicePrefetcher(gen(), depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)


def test_sampled_source_unyieldable_config_raises(rng):
    """Every video skipped by the sampler (all shot counts < context_size)
    must raise after one full dataset pass — the reference CHECK-fails;
    looping forever at 100% CPU is not a data pipeline."""
    videos = [ShotVideo(v + 1, np.arange(3, dtype=np.int32),
                        rng.randn(3, 8).astype(np.float32))
              for v in range(4)]
    ds = ShotDataset(videos)
    cfg = SampledShotsConfig(batch_size=4, context_type="WINDOW",
                             context_size=5, num_negative_samples=0)
    src = VideoSampledShotsSource(ds, cfg)
    import pytest
    with pytest.raises(ValueError, match="no video"):
        src.next_batch()


def test_exhaustive_source_unyieldable_dataset_raises(rng):
    """All videos single-shot: the exhaustive source has no (target,
    context) to emit — must raise, not hang."""
    videos = [ShotVideo(v + 1, np.arange(1, dtype=np.int32),
                        rng.randn(1, 8).astype(np.float32))
              for v in range(3)]
    ds = ShotDataset(videos)
    cfg = ExhaustiveShotsConfig(batch_size=4, context_type="PAIRWISE",
                                num_negative_samples=0)
    src = VideoShotsSource(ds, cfg)
    import pytest
    with pytest.raises(ValueError, match="2 shots"):
        src.next_batch()


def test_wire_truncated_record_raises(rng):
    """A record cut mid-field must raise, not decode to a plausible short
    message (proto2 ParseFromString fails on truncation; the reference
    CHECK-fails). Covers LEN, I32, and I64 truncations."""
    import pytest
    from videovector_tpu.data.wire import Datum, iter_fields

    d = Datum(float_data=rng.randn(64).astype(np.float32).tolist(),
              channels=64, height=1, width=1)
    enc = d.encode()
    assert Datum.decode(enc).channels == 64  # intact round-trip
    with pytest.raises(ValueError, match="truncated"):
        Datum.decode(enc[:len(enc) - 7])      # cut inside a float field
    # cut inside a LEN payload of a nested message
    with pytest.raises(ValueError, match="truncated"):
        list(iter_fields(bytes([0x12, 0x10]) + b"abc"))  # declares 16, has 3
    with pytest.raises(ValueError, match="truncated"):
        list(iter_fields(bytes([0x15, 0x01, 0x02])))     # I32 with 2 bytes
    with pytest.raises(ValueError, match="truncated"):
        list(iter_fields(bytes([0x11, 0x01])))           # I64 with 1 byte
