"""Native data-plane tests: C++ reader/decoder exactness vs the Python
implementation, native sampler semantics, prefetch thread."""

import os
import subprocess

import numpy as np
import pytest

from videovector_tpu.data import native
from videovector_tpu.data.records import RecordReader, RecordWriter
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.data.wire import Datum

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_lib():
    lib = os.path.join(REPO, "native", "libvvdata.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    assert native.available()


def _make_dataset(rng, num_videos=8, shots=10, dim=16):
    videos = []
    for v in range(num_videos):
        videos.append(ShotVideo(v + 1, np.arange(shots, dtype=np.int32),
                                rng.randn(shots, dim).astype(np.float32)))
    return ShotDataset(videos)


def test_native_reader_matches_python(tmp_path, rng):
    _ensure_lib()
    path = str(tmp_path / "r.vvr")
    with RecordWriter(path) as w:
        for i in range(6):
            w.append(f"k{i}", bytes(rng.bytes(10 + i)))
    py = RecordReader(path)
    nat = native.NativeRecordReader(path)
    assert len(nat) == len(py) == 6
    for i in range(6):
        assert nat.value(i) == bytes(py.value(i))
    nat.close()
    py.close()


def test_native_datum_float_decode(tmp_path, rng):
    _ensure_lib()
    path = str(tmp_path / "d.vvr")
    feats = rng.randn(4, 32).astype(np.float32)
    with RecordWriter(path) as w:
        for i, f in enumerate(feats):
            w.append(str(i), Datum(float_data=f).encode())
    nat = native.NativeRecordReader(path)
    for i in range(4):
        np.testing.assert_allclose(nat.datum_floats(i, 32), feats[i])
    nat.close()


def test_native_sampler_layout_and_semantics(tmp_path, rng):
    _ensure_lib()
    ds = _make_dataset(rng)
    path = str(tmp_path / "shots.vvr")
    ds.to_records(path)
    src = native.NativeSampledShotsSource(
        path, batch_size=6, context_size=5, num_negative_samples=4,
        max_buffer_size=20, negative_swap_percentage=50,
        max_same_video_negs=2, seed=7)
    assert src.feature_dim == 16
    assert src.channels == 9
    for _ in range(3):
        batch = src.next_batch()
        assert batch["data"].shape == (6, 9, 16)
        assert np.isfinite(batch["data"]).all()
        # target + 4 contexts come from the labeled video, with the WINDOW
        # invariant: 2 sorted context indices below the target, 2 above
        for b in range(6):
            vid = int(batch["video_id"][b])
            video = next(v for v in ds.videos if v.video_id == vid)
            idx = []
            for c in range(5):
                row = batch["data"][b, c]
                dists = np.abs(video.features - row).sum(axis=1)
                assert dists.min() < 1e-6
                idx.append(int(np.argmin(dists)))
            tgt, ctx = idx[0], sorted(idx[1:])
            assert sum(1 for c in ctx if c < tgt) == 2
            assert sum(1 for c in ctx if c > tgt) == 2
    src.close()


def test_native_writer_byte_identical(tmp_path, rng):
    _ensure_lib()
    p1, p2 = str(tmp_path / "py.vvr"), str(tmp_path / "nat.vvr")
    items = [(f"k{i}", bytes(rng.bytes(10 + i))) for i in range(5)]
    with RecordWriter(p1) as w:
        for k, v in items:
            w.append(k, v)
    with native.NativeRecordWriter(p2) as w:
        for k, v in items:
            w.append(k, v)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_native_sampler_same_video_cap_exceeds_negatives(tmp_path, rng):
    """max_same_video_negs > num_negative_samples: the C++ sampler must cap
    at the slot count (un-capped this memcpy'd past the row — heap
    corruption; the reference has the same latent overrun,
    ref:video_sampled_shots_data_layer.cpp:485)."""
    _ensure_lib()
    ds = _make_dataset(rng)
    path = str(tmp_path / "shots.vvr")
    ds.to_records(path)
    src = native.NativeSampledShotsSource(
        path, batch_size=6, context_size=5, num_negative_samples=3,
        max_buffer_size=20, negative_swap_percentage=50,
        max_same_video_negs=6, seed=7)
    assert src.channels == 8
    for _ in range(4):
        batch = src.next_batch()
        assert batch["data"].shape == (6, 8, 16)
        assert np.isfinite(batch["data"]).all()
    src.close()


def test_native_sampler_skips_short_videos(tmp_path, rng):
    _ensure_lib()
    videos = [ShotVideo(1, np.arange(2, dtype=np.int32),
                        rng.randn(2, 8).astype(np.float32)),
              ShotVideo(2, np.arange(7, dtype=np.int32),
                        rng.randn(7, 8).astype(np.float32))]
    path = str(tmp_path / "s.vvr")
    ShotDataset(videos).to_records(path)
    src = native.NativeSampledShotsSource(path, batch_size=4, context_size=5,
                                          num_negative_samples=0,
                                          max_buffer_size=0,
                                          negative_swap_percentage=0,
                                          max_same_video_negs=0)
    batch = src.next_batch()
    assert np.all(batch["video_id"] == 2)
    src.close()


def test_native_sampler_underfilled_reservoir_fails_like_reference(tmp_path, rng):
    """max_buffer_size larger than the distinct-shot count: the reference
    CHECK-fails (video_shot_window_data_layer.cpp:338), the Python sampler
    raises, and the native twin must refuse too — not silently sample from
    a partially-filled buffer."""
    import pytest
    from videovector_tpu.data import native
    from videovector_tpu.data.shots import ShotDataset, ShotVideo
    videos = [ShotVideo(v + 1, np.arange(4, dtype=np.int32),
                        rng.randn(4, 8).astype(np.float32))
              for v in range(3)]  # 12 distinct shots total
    path = str(tmp_path / "small.vvr")
    ShotDataset(videos).to_records(path)
    with pytest.raises(IOError, match="reservoir"):
        native.NativeSampledShotsSource(
            path, batch_size=4, context_size=5, num_negative_samples=4,
            max_buffer_size=100, negative_swap_percentage=50,
            max_same_video_negs=2)


def test_native_sampler_rejects_invalid_configs(tmp_path, rng):
    """Config contracts mirror the Python twin and fail at create —
    context_size=1 would index perm[half-1]==perm[-1] out of bounds,
    num_negatives > max_buffer_size cannot draw distinct reservoir slots,
    and swap_percentage outside [0, 99] is rejected by the reservoir."""
    _ensure_lib()
    ds = _make_dataset(rng)
    path = str(tmp_path / "shots.vvr")
    ds.to_records(path)
    for kw in ({"context_size": 1},
               {"num_negative_samples": 30, "max_buffer_size": 20},
               {"negative_swap_percentage": 100},
               {"batch_size": 0}):
        args = dict(batch_size=4, context_size=5, num_negative_samples=2,
                    max_buffer_size=20, negative_swap_percentage=50,
                    max_same_video_negs=1, seed=3)
        args.update(kw)
        with pytest.raises(IOError):
            native.NativeSampledShotsSource(path, **args)


def test_native_sampler_unyieldable_dataset_fails_create(tmp_path, rng):
    """Every video shorter than the context window: next_batch could never
    yield an item — create must fail (like the Python twin's error and the
    reference's CHECKs), not hand back a sampler whose worker thread spins
    forever and deadlocks destroy."""
    _ensure_lib()
    videos = [ShotVideo(v + 1, np.arange(3, dtype=np.int32),
                        rng.randn(3, 8).astype(np.float32))
              for v in range(4)]
    path = str(tmp_path / "short.vvr")
    ShotDataset(videos).to_records(path)
    with pytest.raises(IOError):
        native.NativeSampledShotsSource(path, batch_size=4, context_size=5,
                                        num_negative_samples=0,
                                        max_buffer_size=0,
                                        negative_swap_percentage=0,
                                        max_same_video_negs=0, seed=3)


def test_native_reservoir_negatives_distinct_slots(tmp_path, rng):
    """Reservoir negatives within one item are DISTINCT buffer slots
    (Fisher-Yates without replacement — the Python twin's
    rng.choice(replace=False) / the reference's RandomShuffleTopids), not
    independent draws that can repeat a negative."""
    _ensure_lib()
    # buffer of exactly 4 with 4 negatives per item → any replacement
    # sampling would repeat a slot almost surely across 20 batches
    videos = [ShotVideo(v + 1, np.arange(6, dtype=np.int32),
                        np.full((6, 8), v * 6, np.float32)
                        + np.arange(6, dtype=np.float32)[:, None])
              for v in range(4)]
    path = str(tmp_path / "res.vvr")
    ShotDataset(videos).to_records(path)
    src = native.NativeSampledShotsSource(
        path, batch_size=4, context_size=5, num_negative_samples=4,
        max_buffer_size=4, negative_swap_percentage=0,
        max_same_video_negs=0, seed=11)
    for _ in range(20):
        batch = src.next_batch()
        negs = batch["data"][:, 5:, 0]   # first feature identifies the shot
        for b in range(negs.shape[0]):
            vals = [round(float(x), 3) for x in negs[b]]
            assert len(set(vals)) == 4, vals  # all four slots distinct
    src.close()


def test_native_reader_rejects_corrupt_files(tmp_path, rng):
    """Truncated and footer-corrupted stores must fail open cleanly (no
    crash, no fd leak loop), and a truncated Datum must fail float decode
    with the 'bad Datum record' error, not read past the mapping."""
    _ensure_lib()
    ds = _make_dataset(rng, num_videos=2, shots=4, dim=8)
    path = str(tmp_path / "ok.vvr")
    ds.to_records(path)
    blob = open(path, "rb").read()

    trunc = str(tmp_path / "trunc.vvr")
    open(trunc, "wb").write(blob[: len(blob) // 2])
    with pytest.raises(IOError):
        native.NativeRecordReader(trunc)

    bad = bytearray(blob)
    bad[-20:-12] = (1 << 60).to_bytes(8, "little")  # wild index_offset
    badp = str(tmp_path / "bad.vvr")
    open(badp, "wb").write(bytes(bad))
    with pytest.raises(IOError):
        native.NativeRecordReader(badp)

    # truncated Datum bytes through the native float decoder
    d = Datum(float_data=rng.randn(32).astype(np.float32).tolist())
    enc = d.encode()
    vvr = str(tmp_path / "datum.vvr")
    with RecordWriter(vvr) as w:
        w.append("k", enc[: len(enc) - 3])
    r = native.NativeRecordReader(vvr)
    with pytest.raises(ValueError):
        r.datum_floats(0, 32)
    r.close()


def test_native_reader_index_out_of_range(tmp_path, rng):
    """vvr_value's record index is caller-supplied (index stores carry
    arbitrary integers): out-of-range must raise IndexError, not read past
    the entry table (previously an unchecked entries[i])."""
    _ensure_lib()
    path = str(tmp_path / "r.vvr")
    with RecordWriter(path) as w:
        for i in range(3):
            w.append(f"k{i}", bytes(rng.bytes(8)))
    r = native.NativeRecordReader(path)
    assert r.value(2)  # last valid
    for bad in (3, 7, 10 ** 9, -1):
        with pytest.raises(IndexError):
            r.value(bad)
        with pytest.raises(IndexError):
            r.datum_floats(bad, 8)
    r.close()


def test_native_reader_bitflip_fuzz(tmp_path, rng):
    """Random single-bitflips anywhere in a valid store (weighted toward
    the index/footer region, where every corrupted byte is a pointer) must
    either fail open with IOError, serve (possibly garbage) bytes, or fail
    Datum decode with ValueError — never crash or read out of the mapping.
    The Python RecordReader is held to the same bar on the same bytes."""
    _ensure_lib()
    path = str(tmp_path / "ok.vvr")
    feats = rng.randn(6, 16).astype(np.float32)
    with RecordWriter(path) as w:
        for i, f in enumerate(feats):
            w.append(f"key{i}", Datum(float_data=f).encode())
    blob = bytearray(open(path, "rb").read())
    nbytes = len(blob)

    def probe_native(p):
        try:
            r = native.NativeRecordReader(p)
        except IOError:
            return
        try:
            for i in range(min(len(r), 16)):
                r.value(i)
                try:
                    r.datum_floats(i, 16)
                except ValueError:
                    pass
        finally:
            r.close()

    def probe_python(p):
        try:
            r = RecordReader(p)
        except Exception:
            return  # any clean failure is acceptable for corrupt bytes
        try:
            for i in range(min(len(r), 16)):
                bytes(r.value(i))
        except Exception:
            pass
        finally:
            r.close()

    fuzzed = str(tmp_path / "fuzz.vvr")
    for trial in range(160):
        if trial % 2 == 0:
            # index/footer region: every byte is an offset/length/key-len
            pos = int(rng.randint(max(0, nbytes - nbytes // 4), nbytes))
        else:
            pos = int(rng.randint(0, nbytes))
        bit = 1 << int(rng.randint(0, 8))
        blob[pos] ^= bit
        open(fuzzed, "wb").write(bytes(blob))
        probe_native(fuzzed)
        probe_python(fuzzed)
        blob[pos] ^= bit  # restore for the next independent flip
