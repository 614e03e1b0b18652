"""Caffe-compatible model-weight IO.

A `.caffemodel` is a binary NetParameter holding per-layer BlobProtos
(ref:caffe.proto — NetParameter{name=1, layers=2}; LayerParameter{bottom=2,
top=3, name=4, type=5, blobs=6}; weights saved by Net::ToProto
ref:src/caffe/net.cpp:774-801, loaded name-matched by CopyTrainedLayersFrom
ref:src/caffe/net.cpp:692-771). This module reads/writes exactly that subset
so reference-trained weights load here and our weights load in the reference.

Layout conversion: Caffe InnerProduct weight blobs are (num_output, K)
(4-D (1, 1, N, K)); ours are (K, N) — `load_into_params` transposes for
layers whose param is named "w".
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

from videovector_tpu.data.wire import (
    BlobProto, iter_fields, read_varint, write_bytes, write_int, write_msg,
    _decode_int32,
)


@dataclass
class LayerBlobs:
    name: str = ""
    type_id: int = 0
    blobs: list = dfield(default_factory=list)   # list[BlobProto]

    def encode(self) -> bytes:
        buf = bytearray()
        write_bytes(buf, 4, self.name.encode())
        if self.type_id:
            write_int(buf, 5, self.type_id)
        for b in self.blobs:
            write_msg(buf, 6, b.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "LayerBlobs":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 4:
                m.name = v.decode()
            elif fnum == 5:
                m.type_id = _decode_int32(v)
            elif fnum == 6:
                m.blobs.append(BlobProto.decode(v))
        return m


@dataclass
class NetWeights:
    """The blobs-only view of a NetParameter."""
    name: str = ""
    layers: list = dfield(default_factory=list)   # list[LayerBlobs]

    def encode(self) -> bytes:
        buf = bytearray()
        if self.name:
            write_bytes(buf, 1, self.name.encode())
        for l in self.layers:
            write_msg(buf, 2, l.encode())
        return bytes(buf)

    @classmethod
    def decode(cls, data: bytes) -> "NetWeights":
        m = cls()
        for fnum, wt, v in iter_fields(data):
            if fnum == 1:
                m.name = v.decode()
            elif fnum == 2:
                m.layers.append(LayerBlobs.decode(v))
        return m

    @classmethod
    def load(cls, path: str) -> "NetWeights":
        with open(path, "rb") as f:
            return cls.decode(f.read())

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.encode())

    def by_name(self) -> dict:
        return {l.name: l for l in self.layers}


def lstm_blobs_to_params(blobs: list, hidden: int) -> dict:
    """Caffe LSTM blobs → our layout. Reference blobs (lstm_layer.cpp:70-97):
    W_i (1, 4, H, I), W_h (1, 4, H, H), bias (1, 1, 4, H), gate blocks in
    [i, f, o, g] order (same as ours). Ours: w_i (I, 4H), w_h (H, 4H),
    b (4H,) with 4H column blocks in gate order."""
    def weight(blob):
        arr = blob.to_array()          # (1, 4, H, I)
        _, g, h, i = arr.shape
        # (4, H, I) → (I, 4, H) → (I, 4H)
        return np.transpose(arr[0], (2, 0, 1)).reshape(i, g * h)

    w_i = weight(blobs[0])
    w_h = weight(blobs[1])
    out = {"w_i": w_i.astype(np.float32), "w_h": w_h.astype(np.float32)}
    if len(blobs) > 2:
        out["b"] = blobs[2].to_array().reshape(-1).astype(np.float32)
    return out


def load_into_params(weights: NetWeights, params: dict, *, strict: bool = False):
    """Name-matched weight copy into a graph-engine param pytree
    ({layer: {"w"/"b"/"table": array}} or LSTM param dicts). Mirrors
    CopyTrainedLayersFrom (ref:src/caffe/net.cpp:692-763): unmatched source
    layers are ignored; shape mismatches raise. Returns a new params pytree."""
    src = weights.by_name()
    out = {ln: dict(lp) for ln, lp in params.items()}
    for lname, lparams in out.items():
        if lname not in src:
            if strict:
                raise KeyError(f"no weights for layer {lname!r}")
            continue
        blobs = src[lname].blobs
        if "w_i" in lparams:  # LSTM family
            hidden = lparams["w_h"].shape[0]
            converted = lstm_blobs_to_params(blobs, hidden)
            for k, arr in converted.items():
                if k in lparams:
                    if tuple(arr.shape) != tuple(lparams[k].shape):
                        raise ValueError(
                            f"layer {lname!r} param {k!r}: shape "
                            f"{arr.shape} vs {tuple(lparams[k].shape)}")
                    lparams[k] = arr
            continue
        order = [k for k in ("w", "table", "b") if k in lparams]
        if len(blobs) < len(order):
            raise ValueError(f"layer {lname!r}: {len(blobs)} blobs for "
                             f"{len(order)} params")
        for k, blob in zip(order, blobs):
            arr = blob.to_array()
            tgt = lparams[k]
            if k == "w" and len(tgt.shape) == 2:
                # InnerProduct: Caffe (1,1,N,K) → ours (K,N)
                arr = arr.reshape(arr.shape[-2], arr.shape[-1]).T
            else:
                # conv (OIHW, identical layout), biases, tables
                arr = arr.reshape(tgt.shape)
            if tuple(arr.shape) != tuple(tgt.shape):
                raise ValueError(
                    f"layer {lname!r} param {k!r}: shape {arr.shape} vs "
                    f"{tuple(tgt.shape)}")
            lparams[k] = np.asarray(arr, np.float32)
    return out


def params_to_weights(params: dict, name: str = "net") -> NetWeights:
    """Export a graph-engine param pytree to Caffe layout."""
    layers = []
    for lname in sorted(params.keys()):
        lp = params[lname]
        if "w_i" in lp:  # LSTM family: ours (I, 4H) → Caffe (1, 4, H, I)
            hidden = np.asarray(lp["w_h"]).shape[0]
            blobs = []
            for k in ("w_i", "w_h"):
                arr = np.asarray(lp[k], np.float32)       # (I, 4H)
                i_dim = arr.shape[0]
                caffe = arr.reshape(i_dim, 4, hidden).transpose(1, 2, 0)
                blobs.append(BlobProto(num=1, channels=4, height=hidden,
                                       width=i_dim,
                                       data=np.ascontiguousarray(caffe)
                                       .reshape(-1)))
            if "b" in lp:
                blobs.append(BlobProto(num=1, channels=1, height=4,
                                       width=hidden,
                                       data=np.asarray(lp["b"], np.float32)))
            layers.append(LayerBlobs(name=lname, blobs=blobs))
            continue
        blobs = []
        for k in ("w", "table", "b"):
            if k not in lp:
                continue
            arr = np.asarray(lp[k], np.float32)
            if k == "w" and arr.ndim == 2:
                arr = arr.T  # ours (K,N) → Caffe (N,K)
                blob = BlobProto(num=1, channels=1, height=arr.shape[0],
                                 width=arr.shape[1], data=arr.reshape(-1))
            elif arr.ndim == 1:
                blob = BlobProto(num=1, channels=1, height=1,
                                 width=arr.shape[0], data=arr.reshape(-1))
            else:
                blob = BlobProto.from_array(arr)
            blobs.append(blob)
        layers.append(LayerBlobs(name=lname, blobs=blobs))
    return NetWeights(name=name, layers=layers)
