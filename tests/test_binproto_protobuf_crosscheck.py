"""Differential validation of the binary codec (config/binproto.py) and the
text parser (config/textformat.py) against the OFFICIAL protobuf stack:
protoc-compile the reference's caffe.proto at test time (format constants
only — no reference code runs) and require

  1. official-serialized bytes → binproto.decode → binproto.encode →
     official-parse == the original message (full round trip through our
     codec is invisible to the reference runtime);
  2. the real flagship prototxt parsed by OUR text parser then
     binproto-encoded == the same file parsed by google.protobuf
     text_format (the two independent stacks agree on the shipped config);
  3. ours-built SolverState/SolverParameter bytes parse correctly with the
     official runtime (the .solverstate interop direction).

This is the strongest byte-compatibility evidence available without a
running Caffe binary: every wire detail (packed floats, zigzag, enums,
nested messages, field presence) must agree with protobuf itself.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest

from videovector_tpu.config import binproto
from videovector_tpu.config.textformat import Message, parse

REF_PROTO_DIR = "/root/reference/src/caffe/proto"
REF_PROTOTXT = ("/root/reference/projects/videovec_embedding/"
                "mednet_embedding_train.prototxt")


@pytest.fixture(scope="module")
def caffe_pb2(tmp_path_factory):
    pytest.importorskip("google.protobuf")
    if not os.path.exists(os.path.join(REF_PROTO_DIR, "caffe.proto")):
        pytest.skip("reference caffe.proto not available")
    tmp = str(tmp_path_factory.mktemp("pbgen"))
    try:
        subprocess.run(
            ["protoc", f"--proto_path={REF_PROTO_DIR}",
             f"--python_out={tmp}", "caffe.proto"],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("protoc unavailable or incompatible")
    sys.path.insert(0, tmp)
    try:
        yield importlib.import_module("caffe_pb2")
    finally:
        sys.path.remove(tmp)


def _rich_net(pb):
    """A NetParameter touching every wire shape: nested messages, packed
    floats, negative ints, enums, repeated strings, bools, bytes-ish
    strings."""
    m = pb.NetParameter()
    m.name = "crosscheck"
    m.input.append("data")
    m.input_dim.extend([4, 3, 11, 11])
    m.force_backward = True
    m.state.phase = pb.TRAIN
    m.state.level = -3
    m.state.stage.extend(["a", "b"])

    l1 = m.layers.add()
    l1.name = "conv1"
    l1.type = pb.LayerParameter.CONVOLUTION
    l1.bottom.append("data")
    l1.top.append("conv1")
    l1.blobs_lr.extend([1.0, 2.0])
    l1.weight_decay.extend([1.0, 0.0])
    cp = l1.convolution_param
    cp.num_output = 7
    cp.kernel_size = 3
    cp.pad = 1
    cp.stride = 2
    cp.group = 1
    cp.weight_filler.type = "gaussian"
    cp.weight_filler.std = 0.017
    b = l1.blobs.add()
    b.num, b.channels, b.height, b.width = 7, 3, 3, 3
    vals = (np.arange(7 * 3 * 3 * 3, dtype=np.float32) - 50.0) / 16.0
    vals[0] = -0.0
    vals[1] = 1.5e-38
    b.data.extend(vals.tolist())          # packed repeated float
    b.diff.extend((-vals[:5]).tolist())

    l2 = m.layers.add()
    l2.name = "shots"
    l2.type = pb.LayerParameter.VIDEO_SAMPLED_SHOTS_DATA
    l2.top.append("windows")
    inc = l2.include.add()
    inc.phase = pb.TRAIN
    inc.stage.append("deploy")
    vp = l2.video_sampled_shots_data_param
    vp.source = "/tmp/éxotic–path.vvr"    # non-ASCII string bytes
    vp.batch_size = 128
    vp.context_size = 5
    vp.num_negative_samples = 10
    vp.max_buffer_size = 5000
    vp.negative_swap_percentage = 50
    vp.context_type = vp.PAST_CONTINUOUS_FIXED

    l3 = m.layers.add()
    l3.name = "loss"
    l3.type = pb.LayerParameter.MAX_MARGIN_LOSS
    l3.bottom.extend(["s_true", "s_neg"])
    l3.top.append("loss")
    l3.loss_weight.append(0.25)
    l3.max_margin_loss_param.margin = 2.0
    l3.max_margin_loss_param.norm = pb.MaxMarginLossParameter.L2
    l3.max_margin_loss_param.use_direct_weight = True
    return m


def test_official_bytes_roundtrip_through_binproto(caffe_pb2):
    m = _rich_net(caffe_pb2)
    wire = m.SerializeToString()
    ours = binproto.decode(wire, "NetParameter")
    re = binproto.encode(ours, "NetParameter")
    back = caffe_pb2.NetParameter()
    back.ParseFromString(re)
    assert back == m, (
        "binproto round trip changed the message:\n"
        f"original:\n{m}\nafter:\n{back}")


def test_flagship_prototxt_two_stacks_agree(caffe_pb2):
    from google.protobuf import text_format
    if not os.path.exists(REF_PROTOTXT):
        pytest.skip("reference prototxt not available")
    txt = open(REF_PROTOTXT).read()
    theirs = caffe_pb2.NetParameter()
    text_format.Parse(txt, theirs)
    ours = parse(txt)
    re = binproto.encode(ours, "NetParameter")
    back = caffe_pb2.NetParameter()
    back.ParseFromString(re)
    assert back == theirs, (
        "our textformat+binproto disagree with google text_format on the "
        "reference flagship prototxt")


def test_solverstate_bytes_parse_officially(caffe_pb2):
    st = Message()
    st.add("iter", 1234)
    st.add("learned_net", "model_iter_1234.caffemodel")
    for k in range(2):
        h = Message()
        h.add("num", 1)
        h.add("channels", 1)
        h.add("height", 2)
        h.add("width", 3)
        for v in np.linspace(-1.0, 1.0, 6).astype(np.float32):
            h.add("data", float(v))
        st.add("history", h)
    wire = binproto.encode(st, "SolverState")
    official = caffe_pb2.SolverState()
    official.ParseFromString(wire)
    assert official.iter == 1234
    assert official.learned_net == "model_iter_1234.caffemodel"
    assert len(official.history) == 2
    np.testing.assert_allclose(
        list(official.history[1].data),
        np.linspace(-1.0, 1.0, 6).astype(np.float32))

    # and the reverse: official bytes through our decoder
    ours = binproto.decode(official.SerializeToString(), "SolverState")
    assert int(ours.get("iter")) == 1234
    assert len(ours.get_list("history")) == 2


def test_solver_parameter_enums_and_defaults(caffe_pb2):
    sp = caffe_pb2.SolverParameter()
    sp.net = "n.prototxt"
    sp.base_lr = 0.001
    sp.lr_policy = "inv"
    sp.solver_mode = caffe_pb2.SolverParameter.CPU
    sp.solver_type = caffe_pb2.SolverParameter.ADAGRAD
    sp.random_seed = -1          # negative varint (int32 sign extension)
    sp.test_iter.extend([100, 50])
    ours = binproto.decode(sp.SerializeToString(), "SolverParameter")
    assert ours.get("solver_mode") == "CPU"
    assert ours.get("solver_type") == "ADAGRAD"
    assert int(ours.get("random_seed")) == -1
    assert [int(v) for v in ours.get_list("test_iter")] == [100, 50]
    back = caffe_pb2.SolverParameter()
    back.ParseFromString(binproto.encode(ours, "SolverParameter"))
    assert back == sp


# -- schema-walking random fuzz ----------------------------------------------

def _rand_value(fd, rng):
    from google.protobuf.descriptor import FieldDescriptor as FD
    t = fd.type
    if t == FD.TYPE_FLOAT:
        pool = [-0.0, 0.0, 1.5e-38, 3.4e38, -1.25, 1e-3,
                float(np.float32(rng.randn()))]
        return float(np.float32(pool[rng.randint(len(pool))]))
    if t == FD.TYPE_DOUBLE:
        return float(rng.randn())
    if t in (FD.TYPE_INT32, FD.TYPE_SINT32, FD.TYPE_SFIXED32):
        return int(rng.randint(-2**31, 2**31))
    if t in (FD.TYPE_INT64, FD.TYPE_SINT64, FD.TYPE_SFIXED64):
        return int(rng.randint(-2**62, 2**62))
    if t in (FD.TYPE_UINT32, FD.TYPE_FIXED32):
        return int(rng.randint(0, 2**32))
    if t in (FD.TYPE_UINT64, FD.TYPE_FIXED64):
        return int(rng.randint(0, 2**63))
    if t == FD.TYPE_BOOL:
        return bool(rng.randint(2))
    if t == FD.TYPE_STRING:
        return "".join(chr(int(rng.randint(32, 1000)))
                       for _ in range(int(rng.randint(0, 8))))
    if t == FD.TYPE_BYTES:
        return bytes(rng.bytes(int(rng.randint(1, 12))))
    if t == FD.TYPE_ENUM:
        vals = [v.number for v in fd.enum_type.values]
        return int(vals[rng.randint(len(vals))])
    raise AssertionError(f"unhandled field type {t}")


def _fill_random(msg, rng, depth=0):
    from google.protobuf.descriptor import FieldDescriptor as FD
    for fd in msg.DESCRIPTOR.fields:
        required = fd.label == FD.LABEL_REQUIRED
        if not required and rng.rand() < 0.5:
            continue
        if fd.type == FD.TYPE_MESSAGE:
            if depth >= 3:
                if required:
                    getattr(msg, fd.name).SetInParent()
                continue
            if fd.label == FD.LABEL_REPEATED:
                for _ in range(int(rng.randint(1, 3))):
                    _fill_random(getattr(msg, fd.name).add(), rng, depth + 1)
            else:
                sub = getattr(msg, fd.name)
                sub.SetInParent()
                _fill_random(sub, rng, depth + 1)
        elif fd.label == FD.LABEL_REPEATED:
            for _ in range(int(rng.randint(1, 4))):
                getattr(msg, fd.name).append(_rand_value(fd, rng))
        else:
            setattr(msg, fd.name, _rand_value(fd, rng))


def test_every_message_type_random_roundtrip(caffe_pb2):
    """Walk EVERY message type the schema knows, fill it with random
    values through the official runtime (required fields always set,
    nested messages to depth 3), and require official bytes → binproto
    decode → encode → official parse to reproduce the message exactly —
    text-printer equality, which distinguishes -0.0 from 0.0."""
    from google.protobuf import text_format
    from videovector_tpu.config.proto_schema import MESSAGES

    names = [n for n in caffe_pb2.DESCRIPTOR.message_types_by_name
             if n in MESSAGES]
    # the schema must actually cover the proto file
    assert len(names) >= 50, names
    rng = np.random.RandomState(7)
    checked = 0
    for name in sorted(names):
        for trial in range(3):
            m = getattr(caffe_pb2, name)()
            _fill_random(m, rng)
            wire = m.SerializeToString()
            ours = binproto.decode(wire, name)
            back = getattr(caffe_pb2, name)()
            back.ParseFromString(binproto.encode(ours, name))
            a = text_format.MessageToString(m)
            b = text_format.MessageToString(back)
            assert a == b, (f"{name} trial {trial} diverged:\n"
                            f"official:\n{a}\nround-tripped:\n{b}")
            checked += 1
    assert checked >= 150


def test_text_printer_and_parser_cross_stack(caffe_pb2):
    """TEXT-side twin of the binary fuzz: (a) google-printed text of random
    messages must parse with OUR textformat parser into a message that
    binproto-encodes back to the official content; (b) our schema-aware
    to_text must parse with google's text_format. Exercises float
    formatting (exponents, -0, subnormals), octal/UTF-8 string escapes,
    enum names, and nested braces on every message type."""
    from google.protobuf import text_format
    from videovector_tpu.config.proto_schema import MESSAGES

    names = sorted(n for n in caffe_pb2.DESCRIPTOR.message_types_by_name
                   if n in MESSAGES)
    rng = np.random.RandomState(13)
    for name in names:
        for trial in range(2):
            m = getattr(caffe_pb2, name)()
            _fill_random(m, rng)
            official_txt = text_format.MessageToString(m)

            # (a) google text -> our parse -> binproto -> google parse
            ours = parse(official_txt)
            back = getattr(caffe_pb2, name)()
            back.ParseFromString(binproto.encode(ours, name))
            a, b = official_txt, text_format.MessageToString(back)
            assert a == b, (f"{name}: google text through our parser "
                            f"diverged:\n{a}\nvs\n{b}")

            # (b) our printer -> google parse
            printed = binproto.to_text(binproto.decode(
                m.SerializeToString(), name), name)
            reparsed = getattr(caffe_pb2, name)()
            text_format.Parse(printed, reparsed)
            c = text_format.MessageToString(reparsed)
            assert a == c, (f"{name}: our to_text isn't google-parseable "
                            f"to the same message:\n{a}\nvs\n{c}\n"
                            f"printed:\n{printed}")


def test_cpp_minus_zero_float_literal(caffe_pb2):
    """C++ SimpleFtoa prints float -0.0 as '-0' (python protobuf prints
    '-0.0', so the generic fuzz can't hit this): a reference-written
    prototxt carrying '-0' must keep the sign through our text parser and
    binary codec."""
    import math
    txt = ('layers { name: "c" type: CONVOLUTION '
           'blobs { num: 1 channels: 1 height: 1 width: 2 '
           'data: -0 data: 1 } }')
    ours = parse(txt)
    back = caffe_pb2.NetParameter()
    back.ParseFromString(binproto.encode(ours, "NetParameter"))
    assert math.copysign(1.0, back.layers[0].blobs[0].data[0]) == -1.0
