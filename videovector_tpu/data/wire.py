"""Protobuf wire-format codec + the dataset message types.

The reference stores datasets as serialized proto2 messages in LMDB/LevelDB
(Datum, ref:src/caffe/proto/caffe.proto:23-37; VideoShotWindow / VideoShots /
TestVideoShotWindows, ref:src/caffe/proto/video_shot_sentences.proto:7-30;
TrackPositions / TrackingWindow, ref:src/caffe/proto/tracking_windows.proto:7-21;
BlobProto, ref:caffe.proto:5-15).

This module is a small, dependency-free proto2 wire codec (varint / 64-bit /
length-delimited / 32-bit, packed repeated scalars) plus plain-dataclass
message types using the reference's field numbers, so bytes written by the
reference tooling decode here and vice versa. We deliberately do NOT compile
.proto files — the schema is ~6 small messages and a hand codec keeps the
data plane self-contained (the C++ native reader shares the same format).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dfield

import numpy as np

# -- wire primitives --------------------------------------------------------

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def write_varint(buf: bytearray, value: int) -> None:
    value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _tag(buf: bytearray, fnum: int, wt: int) -> None:
    write_varint(buf, (fnum << 3) | wt)


def write_int(buf, fnum, value):
    _tag(buf, fnum, _WT_VARINT)
    # proto2 int32: negatives encode as 10-byte two's complement varint
    write_varint(buf, value if value >= 0 else value + (1 << 64))


def write_float(buf, fnum, value):
    _tag(buf, fnum, _WT_I32)
    buf += struct.pack("<f", value)


def write_bytes(buf, fnum, value: bytes):
    _tag(buf, fnum, _WT_LEN)
    write_varint(buf, len(value))
    buf += value


def write_packed_floats(buf, fnum, values):
    arr = np.asarray(values, dtype="<f4")
    _tag(buf, fnum, _WT_LEN)
    write_varint(buf, arr.nbytes)
    buf += arr.tobytes()


def write_repeated_floats(buf, fnum, values):
    # non-packed (proto2 default for the reference's repeated float fields
    # without [packed=true], e.g. Datum.float_data)
    for v in np.asarray(values, dtype=np.float32):
        write_float(buf, fnum, float(v))


def write_msg(buf, fnum, encoded: bytes):
    write_bytes(buf, fnum, encoded)


def _decode_int32(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def iter_fields(data: bytes):
    """Yield (field_number, wire_type, value) where value is int (varint),
    bytes (LEN), or raw 4/8-byte chunks."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = read_varint(data, pos)
        fnum, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            v, pos = read_varint(data, pos)
            yield fnum, wt, v
        elif wt == _WT_I64:
            if pos + 8 > n:
                raise ValueError("truncated I64 field")
            yield fnum, wt, data[pos:pos + 8]
            pos += 8
        elif wt == _WT_LEN:
            # a short slice would decode a truncated record into a
            # plausible-but-wrong message; proto2 parsers fail instead
            # (ParseFromString returns false → the reference CHECK-fails)
            ln, pos = read_varint(data, pos)
            if pos + ln > n:
                raise ValueError(
                    f"truncated LEN field {fnum}: declares {ln} bytes, "
                    f"{n - pos} remain")
            yield fnum, wt, data[pos:pos + ln]
            pos += ln
        elif wt == _WT_I32:
            if pos + 4 > n:
                raise ValueError("truncated I32 field")
            yield fnum, wt, data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _floats_from(wt, v, out: list):
    """Accept both packed (LEN of f4s) and unpacked (I32) repeated float."""
    if wt == _WT_I32:
        out.append(struct.unpack("<f", v)[0])
    elif wt == _WT_LEN:
        out.extend(np.frombuffer(v, dtype="<f4").tolist())
    else:
        raise ValueError("bad float field encoding")


def _ints_from(wt, v, out: list):
    if wt == _WT_VARINT:
        out.append(_decode_int32(v))
    elif wt == _WT_LEN:
        pos = 0
        while pos < len(v):
            x, pos = read_varint(v, pos)
            out.append(_decode_int32(x))
    else:
        raise ValueError("bad int field encoding")


# -- messages ---------------------------------------------------------------

@dataclass
class Datum:
    """caffe.Datum (ref:caffe.proto:23-37). Field numbers: channels=1,
    height=2, width=3, data=4, label=5, float_data=6, mean=7, min=8, max=9."""
    channels: int = 0
    height: int = 0
    width: int = 0
    data: bytes = b""
    label: int | None = None
    float_data: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))
    mean: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))
    min: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))
    max: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))

    def encode(self) -> bytes:
        buf = bytearray()
        if self.channels:
            write_int(buf, 1, self.channels)
        if self.height:
            write_int(buf, 2, self.height)
        if self.width:
            write_int(buf, 3, self.width)
        if self.data:
            write_bytes(buf, 4, self.data)
        if self.label is not None:
            write_int(buf, 5, self.label)
        if len(self.float_data):
            write_repeated_floats(buf, 6, self.float_data)
        for fnum, arr in ((7, self.mean), (8, self.min), (9, self.max)):
            if len(arr):
                write_repeated_floats(buf, fnum, arr)
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "Datum":
        m = cls()
        fd: list = []
        mean: list = []
        mn: list = []
        mx: list = []
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.channels = _decode_int32(v)
            elif fnum == 2:
                m.height = _decode_int32(v)
            elif fnum == 3:
                m.width = _decode_int32(v)
            elif fnum == 4:
                m.data = v
            elif fnum == 5:
                m.label = _decode_int32(v)
            elif fnum == 6:
                _floats_from(wt, v, fd)
            elif fnum == 7:
                _floats_from(wt, v, mean)
            elif fnum == 8:
                _floats_from(wt, v, mn)
            elif fnum == 9:
                _floats_from(wt, v, mx)
        m.float_data = np.asarray(fd, np.float32)
        m.mean = np.asarray(mean, np.float32)
        m.min = np.asarray(mn, np.float32)
        m.max = np.asarray(mx, np.float32)
        return m


@dataclass
class VideoShotWindow:
    """video_shot_sentences.VideoShotWindow (ref video_shot_sentences.proto:7-14):
    video_id=1, shot_id=2, video_name=3, target_shot_word=4,
    context_shot_words=5 (repeated)."""
    video_id: int = 0
    shot_id: int = 0
    video_name: str = ""
    target_shot_word: Datum | None = None
    context_shot_words: list = dfield(default_factory=list)

    def encode(self) -> bytes:
        buf = bytearray()
        write_int(buf, 1, self.video_id)
        write_int(buf, 2, self.shot_id)
        if self.video_name:
            write_bytes(buf, 3, self.video_name.encode())
        if self.target_shot_word is not None:
            write_msg(buf, 4, self.target_shot_word.encode())
        for d in self.context_shot_words:
            write_msg(buf, 5, d.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "VideoShotWindow":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.video_id = _decode_int32(v)
            elif fnum == 2:
                m.shot_id = _decode_int32(v)
            elif fnum == 3:
                m.video_name = v.decode()
            elif fnum == 4:
                m.target_shot_word = Datum.decode(v)
            elif fnum == 5:
                m.context_shot_words.append(Datum.decode(v))
        return m


@dataclass
class VideoShots:
    """video_shot_sentences.VideoShots (ref video_shot_sentences.proto:16-21):
    video_id=1, shot_ids=2 (repeated), shot_words=3 (repeated), video_name=4."""
    video_id: int = 0
    shot_ids: list = dfield(default_factory=list)
    shot_words: list = dfield(default_factory=list)
    video_name: str = ""

    def encode(self) -> bytes:
        buf = bytearray()
        write_int(buf, 1, self.video_id)
        for s in self.shot_ids:
            write_int(buf, 2, s)
        for d in self.shot_words:
            write_msg(buf, 3, d.encode())
        if self.video_name:
            write_bytes(buf, 4, self.video_name.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "VideoShots":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.video_id = _decode_int32(v)
            elif fnum == 2:
                _ints_from(wt, v, m.shot_ids)
            elif fnum == 3:
                m.shot_words.append(Datum.decode(v))
            elif fnum == 4:
                m.video_name = v.decode()
        return m


@dataclass
class TestVideoShotWindows:
    """video_shot_sentences.TestVideoShotWindows
    (ref video_shot_sentences.proto:23-30): video_id=1, positive_shot_id=2,
    video_name=3, positive_shot_words=4, context_shot_words=5,
    negative_shot_words=6, negative_shot_id=7."""
    video_id: int = 0
    positive_shot_id: list = dfield(default_factory=list)
    video_name: str = ""
    positive_shot_words: list = dfield(default_factory=list)
    context_shot_words: list = dfield(default_factory=list)
    negative_shot_words: list = dfield(default_factory=list)
    negative_shot_id: list = dfield(default_factory=list)

    def encode(self) -> bytes:
        buf = bytearray()
        write_int(buf, 1, self.video_id)
        for s in self.positive_shot_id:
            write_int(buf, 2, s)
        if self.video_name:
            write_bytes(buf, 3, self.video_name.encode())
        for d in self.positive_shot_words:
            write_msg(buf, 4, d.encode())
        for d in self.context_shot_words:
            write_msg(buf, 5, d.encode())
        for d in self.negative_shot_words:
            write_msg(buf, 6, d.encode())
        for s in self.negative_shot_id:
            write_int(buf, 7, s)
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "TestVideoShotWindows":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.video_id = _decode_int32(v)
            elif fnum == 2:
                _ints_from(wt, v, m.positive_shot_id)
            elif fnum == 3:
                m.video_name = v.decode()
            elif fnum == 4:
                m.positive_shot_words.append(Datum.decode(v))
            elif fnum == 5:
                m.context_shot_words.append(Datum.decode(v))
            elif fnum == 6:
                m.negative_shot_words.append(Datum.decode(v))
            elif fnum == 7:
                _ints_from(wt, v, m.negative_shot_id)
        return m


@dataclass
class TrackPositions:
    """tracking_windows.TrackPositions (ref tracking_windows.proto:7-13):
    id=1, x=2, y=3, cl=4, static_scene=5."""
    id: int = 0
    x: list = dfield(default_factory=list)
    y: list = dfield(default_factory=list)
    cl: int = 0
    static_scene: Datum | None = None

    def encode(self) -> bytes:
        buf = bytearray()
        write_int(buf, 1, self.id)
        write_repeated_floats(buf, 2, self.x)
        write_repeated_floats(buf, 3, self.y)
        write_int(buf, 4, self.cl)
        if self.static_scene is not None:
            write_msg(buf, 5, self.static_scene.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "TrackPositions":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.id = _decode_int32(v)
            elif fnum == 2:
                _floats_from(wt, v, m.x)
            elif fnum == 3:
                _floats_from(wt, v, m.y)
            elif fnum == 4:
                m.cl = _decode_int32(v)
            elif fnum == 5:
                m.static_scene = Datum.decode(v)
        return m


@dataclass
class TrackingWindow:
    """tracking_windows.TrackingWindow (ref tracking_windows.proto:15-21):
    observed_time=1, prediction_time=2, scene_id=3, track_positions=4."""
    observed_time: list = dfield(default_factory=list)
    prediction_time: list = dfield(default_factory=list)
    scene_id: int = 0
    track_positions: list = dfield(default_factory=list)

    def encode(self) -> bytes:
        buf = bytearray()
        write_repeated_floats(buf, 1, self.observed_time)
        write_repeated_floats(buf, 2, self.prediction_time)
        write_int(buf, 3, self.scene_id)
        for t in self.track_positions:
            write_msg(buf, 4, t.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "TrackingWindow":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                _floats_from(wt, v, m.observed_time)
            elif fnum == 2:
                _floats_from(wt, v, m.prediction_time)
            elif fnum == 3:
                m.scene_id = _decode_int32(v)
            elif fnum == 4:
                m.track_positions.append(TrackPositions.decode(v))
        return m


@dataclass
class BlobProto:
    """caffe.BlobProto (ref:caffe.proto:5-15): num=1, channels=2, height=3,
    width=4, data=5 [packed], diff=6 [packed]."""
    num: int = 0
    channels: int = 0
    height: int = 0
    width: int = 0
    data: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))
    diff: np.ndarray = dfield(default_factory=lambda: np.zeros(0, np.float32))

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "BlobProto":
        """4-D (or fewer, left-padded with 1s) array → BlobProto."""
        shape = (1,) * (4 - arr.ndim) + arr.shape
        n, c, h, w = shape
        return cls(num=n, channels=c, height=h, width=w,
                   data=np.ascontiguousarray(arr, np.float32).reshape(-1))

    def to_array(self) -> np.ndarray:
        return np.asarray(self.data, np.float32).reshape(
            self.num or 1, self.channels or 1, self.height or 1, self.width or 1)

    def encode(self) -> bytes:
        buf = bytearray()
        write_int(buf, 1, self.num)
        write_int(buf, 2, self.channels)
        write_int(buf, 3, self.height)
        write_int(buf, 4, self.width)
        if len(self.data):
            write_packed_floats(buf, 5, self.data)
        if len(self.diff):
            write_packed_floats(buf, 6, self.diff)
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "BlobProto":
        m = cls()
        d: list = []
        df: list = []
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.num = _decode_int32(v)
            elif fnum == 2:
                m.channels = _decode_int32(v)
            elif fnum == 3:
                m.height = _decode_int32(v)
            elif fnum == 4:
                m.width = _decode_int32(v)
            elif fnum == 5:
                _floats_from(wt, v, d)
            elif fnum == 6:
                _floats_from(wt, v, df)
        m.data = np.asarray(d, np.float32)
        m.diff = np.asarray(df, np.float32)
        return m
