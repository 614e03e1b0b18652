"""Differential fuzz of the hand wire codec (data/wire.py) against the
OFFICIAL protobuf runtime using the reference's actual .proto files
(video_shot_sentences.proto, tracking_windows.proto, caffe.proto compiled
by protoc at test time). Every custom message class must decode official
bytes and re-encode to bytes the official runtime reads back with
identical VALUES. Presence is value-level by design: the dataclasses
don't model proto2 has_*() (the reference's readers only ever call value
accessors, whose defaults match), so an unset optional int32 and an
explicit 0 compare equal here — every other detail (field numbers, wire
types, packed-vs-plain repeated scalars, nested Datums) must agree."""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest

from videovector_tpu.data import wire

REF_PROTO_DIR = "/root/reference/src/caffe/proto"


@pytest.fixture(scope="module")
def pb_mods(tmp_path_factory):
    pytest.importorskip("google.protobuf")
    for f in ("caffe.proto", "video_shot_sentences.proto",
              "tracking_windows.proto"):
        if not os.path.exists(os.path.join(REF_PROTO_DIR, f)):
            pytest.skip(f"reference {f} not available")
    tmp = str(tmp_path_factory.mktemp("pbwire"))
    try:
        subprocess.run(
            ["protoc", f"--proto_path={REF_PROTO_DIR}",
             f"--python_out={tmp}", "caffe.proto",
             "video_shot_sentences.proto", "tracking_windows.proto"],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("protoc unavailable or incompatible")
    sys.path.insert(0, tmp)
    try:
        yield (importlib.import_module("video_shot_sentences_pb2"),
               importlib.import_module("tracking_windows_pb2"))
    finally:
        sys.path.remove(tmp)


def _values_equal(a, b, path=""):
    """Value-level message equality through the official runtime (unset
    optional scalars read as their defaults on both sides)."""
    from google.protobuf.descriptor import FieldDescriptor as FD
    for fd in a.DESCRIPTOR.fields:
        va, vb = getattr(a, fd.name), getattr(b, fd.name)
        where = f"{path}.{fd.name}"
        if fd.label == FD.LABEL_REPEATED:
            assert len(va) == len(vb), f"{where}: {len(va)} vs {len(vb)}"
            if fd.type == FD.TYPE_MESSAGE:
                for i, (x, y) in enumerate(zip(va, vb)):
                    _values_equal(x, y, f"{where}[{i}]")
            else:
                assert list(va) == list(vb), where
        elif fd.type == FD.TYPE_MESSAGE:
            _values_equal(va, vb, where)
        else:
            assert va == vb, f"{where}: {va!r} vs {vb!r}"


_PAIRS = [
    ("VideoShotWindow", wire.VideoShotWindow, 0),
    ("VideoShots", wire.VideoShots, 0),
    ("TestVideoShotWindows", wire.TestVideoShotWindows, 0),
    ("TrackPositions", wire.TrackPositions, 1),
    ("TrackingWindow", wire.TrackingWindow, 1),
]


@pytest.mark.parametrize("name,cls,mod_idx", _PAIRS)
def test_official_bytes_roundtrip_through_wire(pb_mods, name, cls, mod_idx):
    from test_binproto_protobuf_crosscheck import _fill_random
    mod = pb_mods[mod_idx]
    rng = np.random.RandomState(hash(name) % 2**31)
    for trial in range(6):
        m = getattr(mod, name)()
        _fill_random(m, rng)
        ours = cls.decode(m.SerializeToString())
        back = getattr(mod, name)()
        back.ParseFromString(ours.encode())
        _values_equal(m, back, name)


def test_wire_built_messages_parse_officially(pb_mods, rng):
    """The writer direction on realistic content: wire-built messages (the
    converters' output) parse with the official runtime value-for-value."""
    vs_mod, tw_mod = pb_mods
    d1 = wire.Datum(channels=2, height=3, width=1,
                    float_data=rng.randn(6).astype(np.float32))
    d2 = wire.Datum(data=b"\x00\xffraw\n", label=-4)
    w = wire.VideoShotWindow(video_id=7, shot_id=3, video_name="vídeo–7",
                             target_shot_word=d1,
                             context_shot_words=[d2, d1])
    official = vs_mod.VideoShotWindow()
    official.ParseFromString(w.encode())
    assert official.video_id == 7 and official.shot_id == 3
    assert official.video_name == "vídeo–7"
    np.testing.assert_array_equal(
        np.asarray(official.target_shot_word.float_data, np.float32),
        d1.float_data)
    assert official.context_shot_words[0].data == b"\x00\xffraw\n"
    assert official.context_shot_words[0].label == -4

    t = wire.TrackingWindow(
        observed_time=[0.0, 1.0, 2.5],
        prediction_time=[3.0],
        scene_id=2,
        track_positions=[wire.TrackPositions(
            id=11, x=[0.5, -0.5], y=[1.5, 2.5], cl=1, static_scene=d1)])
    ot = tw_mod.TrackingWindow()
    ot.ParseFromString(t.encode())
    assert list(ot.observed_time) == [0.0, 1.0, 2.5]
    assert ot.track_positions[0].id == 11
    assert list(ot.track_positions[0].x) == [0.5, -0.5]
    np.testing.assert_array_equal(
        np.asarray(ot.track_positions[0].static_scene.float_data,
                   np.float32), d1.float_data)
