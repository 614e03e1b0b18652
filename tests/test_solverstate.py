"""`.solverstate` both-ways interop (VERDICT r3 item 3).

The reference snapshots SolverState{iter, learned_net, history BlobProtos}
(ref:src/caffe/proto/caffe.proto:176-180; written src/caffe/solver.cpp:
321-341,578-596; restored :419-429). History blobs are NAMELESS, ordered
like net_->params(). These tests cover: export (snapshot_format: "caffe"
writes the reference-consumable pair), import (resume with momentum
intact), equivalence with the native .vvstate resume, and a hand-assembled
foreign SolverState byte stream (no writer-code involvement)."""

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_e2e import mini_project, _make_shot_records, _make_test_windows  # noqa: F401
from videovector_tpu.config.textformat import parse_file
from videovector_tpu.solver.driver import SolverDriver


def _solver_with(mini, **overrides):
    msg = parse_file(mini["solver"])
    for k, v in overrides.items():
        msg.fields[k] = [v]
    if overrides.get("test_interval") == 0:
        # no test nets: the reference CHECKs test_interval>0 when
        # test_iter entries exist
        msg.fields.pop("test_iter", None)
    return msg


def test_caffe_snapshot_format_writes_reference_pair(mini_project):
    msg = _solver_with(mini_project, max_iter=10, snapshot=5,
                       test_interval=0)
    msg.add("snapshot_format", "caffe")
    driver = SolverDriver(msg).build()
    driver.train()
    prefix = str(mini_project["tmp"] / "snap")
    # scheduled snapshot at 5 + snapshot_after_train at 10, both formats
    for it in (5, 10):
        assert os.path.exists(f"{prefix}_iter_{it}.vvstate")
        assert os.path.exists(f"{prefix}_iter_{it}.caffemodel")
        assert os.path.exists(f"{prefix}_iter_{it}.solverstate")

    from videovector_tpu.data.netproto import load_solverstate
    it, learned_net, blobs = load_solverstate(f"{prefix}_iter_10.solverstate")
    assert it == 10
    assert learned_net.endswith("_iter_10.caffemodel")
    # fc7 is the only param layer: weight + bias history blobs, in order
    assert len(blobs) == 2
    w, b = blobs[0].to_array(), blobs[1].to_array()

    # the history in the solverstate equals the native .vvstate history
    # modulo the Caffe (N, K) transpose
    from videovector_tpu.solver.checkpoint import restore
    _, state = restore(f"{prefix}_iter_10.vvstate")
    assert w.reshape(-1).size == state["history"]["fc7"]["w"].size
    assert b.reshape(-1).size == state["history"]["fc7"]["b"].size
    np.testing.assert_allclose(
        w.reshape(w.shape[-2], w.shape[-1]).T,
        np.asarray(state["history"]["fc7"]["w"]), rtol=1e-6)
    np.testing.assert_allclose(b.reshape(-1),
                               np.asarray(state["history"]["fc7"]["b"]),
                               rtol=1e-6)


def test_solverstate_resume_matches_vvstate_resume(mini_project):
    """Resuming from the .solverstate must continue the trajectory exactly
    like the native .vvstate resume (same rebuilt data stream, same
    params + momentum + iter)."""
    msg = _solver_with(mini_project, max_iter=8, snapshot=8,
                       test_interval=0, display=1)
    msg.add("snapshot_format", "caffe")
    SolverDriver(msg).build().train()
    prefix = str(mini_project["tmp"] / "snap")

    msg2 = _solver_with(mini_project, max_iter=16, snapshot=0,
                        test_interval=0, display=1)
    res_native = SolverDriver(msg2).build().train(
        resume_state_path=f"{prefix}_iter_8.vvstate")
    res_foreign = SolverDriver(msg2).build().train(
        resume_state_path=f"{prefix}_iter_8.solverstate")

    ln = [m[1]["loss"] for m in res_native.metrics_history]
    lf = [m[1]["loss"] for m in res_foreign.metrics_history]
    assert len(ln) == len(lf) > 0
    np.testing.assert_allclose(ln, lf, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res_native.params["fc7"]["w"]),
        np.asarray(res_foreign.params["fc7"]["w"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res_native.state["history"]["fc7"]["w"]),
        np.asarray(res_foreign.state["history"]["fc7"]["w"]),
        rtol=1e-5, atol=1e-7)


def test_orbax_snapshot_roundtrip(tmp_path):
    """export_orbax_snapshot / restore_orbax: exact pytree roundtrip
    through the Orbax (tensorstore) directory format."""
    from videovector_tpu.solver.checkpoint import (export_orbax_snapshot,
                                                   restore_orbax)
    rng = np.random.RandomState(0)
    params = {"fc7": {"w": rng.randn(6, 4).astype(np.float32),
                      "b": rng.randn(4).astype(np.float32)}}
    state = {"iter": jnp.int32(37),
             "history": {"fc7": {"w": rng.randn(6, 4).astype(np.float32),
                                 "b": rng.randn(4).astype(np.float32)}}}
    path = export_orbax_snapshot(str(tmp_path / "snap"), 37, params, state)
    assert path.endswith("_iter_37.orbax") and os.path.isdir(path)
    p2, s2 = restore_orbax(path)
    assert int(s2["iter"]) == 37
    for name in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(p2["fc7"][name]),
                                      params["fc7"][name])
        np.testing.assert_array_equal(np.asarray(s2["history"]["fc7"][name]),
                                      state["history"]["fc7"][name])
    # overwrite semantics: re-export at the same iter must not fail
    export_orbax_snapshot(str(tmp_path / "snap"), 37, params, state)


def test_orbax_resume_matches_vvstate_resume(mini_project):
    """snapshot_format: "orbax" writes the .orbax directory alongside the
    native pair, and resuming from it continues the trajectory exactly
    like the .vvstate resume."""
    msg = _solver_with(mini_project, max_iter=8, snapshot=8,
                       test_interval=0, display=1)
    msg.add("snapshot_format", "orbax")
    SolverDriver(msg).build().train()
    prefix = str(mini_project["tmp"] / "snap")
    assert os.path.isdir(f"{prefix}_iter_8.orbax")
    assert os.path.exists(f"{prefix}_iter_8.vvstate")

    msg2 = _solver_with(mini_project, max_iter=16, snapshot=0,
                        test_interval=0, display=1)
    res_native = SolverDriver(msg2).build().train(
        resume_state_path=f"{prefix}_iter_8.vvstate")
    res_orbax = SolverDriver(msg2).build().train(
        resume_state_path=f"{prefix}_iter_8.orbax")

    ln = [m[1]["loss"] for m in res_native.metrics_history]
    lo = [m[1]["loss"] for m in res_orbax.metrics_history]
    assert len(ln) == len(lo) > 0
    np.testing.assert_allclose(ln, lo, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_native.params["fc7"]["w"]),
        np.asarray(res_orbax.params["fc7"]["w"]), rtol=1e-6, atol=1e-8)


def test_unknown_snapshot_format_rejected(mini_project):
    msg = _solver_with(mini_project, max_iter=2, snapshot=0,
                       test_interval=0)
    msg.add("snapshot_format", "hdf5")
    with pytest.raises(ValueError, match="snapshot_format"):
        SolverDriver(msg).build().train()


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _blob_bytes(num, channels, height, width, data: np.ndarray) -> bytes:
    """Hand-assembled BlobProto: num=1..width=4 varint, data=5 packed f32."""
    buf = bytearray()
    for fnum, v in ((1, num), (2, channels), (3, height), (4, width)):
        buf += _varint((fnum << 3) | 0) + _varint(v)
    payload = np.asarray(data, "<f4").tobytes()
    buf += _varint((5 << 3) | 2) + _varint(len(payload)) + payload
    return bytes(buf)


def test_foreign_hand_assembled_solverstate_restores(tmp_path):
    """A SolverState byte stream written field-by-field per the proto2 wire
    format (no repo writer code) restores iter, weights and momentum — the
    IP-weight (N, K) → (K, N) transpose included."""
    rng = np.random.RandomState(0)
    w_caffe = rng.randn(6, 4).astype(np.float32)   # (N=6, K=4) Caffe layout
    b_ref = rng.randn(6).astype(np.float32)
    hw_caffe = rng.randn(6, 4).astype(np.float32)  # momentum for w
    hb = rng.randn(6).astype(np.float32)

    # learned_net: a blobs-only NetParameter, also hand-assembled —
    # NetParameter.layers=2 { LayerParameter.name=4, blobs=6 }
    def layer_bytes(name, blobs):
        buf = bytearray()
        nm = name.encode()
        buf += _varint((4 << 3) | 2) + _varint(len(nm)) + nm
        for bb in blobs:
            buf += _varint((6 << 3) | 2) + _varint(len(bb)) + bb
        return bytes(buf)

    lb = layer_bytes("ip", [_blob_bytes(1, 1, 6, 4, w_caffe.reshape(-1)),
                            _blob_bytes(1, 1, 1, 6, b_ref)])
    net_bytes = _varint((2 << 3) | 2) + _varint(len(lb)) + lb
    model_path = tmp_path / "foreign_iter_42.caffemodel"
    model_path.write_bytes(net_bytes)

    # SolverState: iter=1 varint, learned_net=2 string, history=3 msgs
    ss = bytearray()
    ss += _varint((1 << 3) | 0) + _varint(42)
    pathb = str(model_path).encode()
    ss += _varint((2 << 3) | 2) + _varint(len(pathb)) + pathb
    for bb in (_blob_bytes(1, 1, 6, 4, hw_caffe.reshape(-1)),
               _blob_bytes(1, 1, 1, 6, hb)):
        ss += _varint((3 << 3) | 2) + _varint(len(bb)) + bb
    state_path = tmp_path / "foreign_iter_42.solverstate"
    state_path.write_bytes(bytes(ss))

    from videovector_tpu.solver.checkpoint import restore_solverstate
    template = {"ip": {"w": np.zeros((4, 6), np.float32),
                       "b": np.zeros((6,), np.float32)}}
    params, state = restore_solverstate(str(state_path), template, ["ip"])
    assert int(state["iter"]) == 42
    np.testing.assert_allclose(np.asarray(params["ip"]["w"]), w_caffe.T)
    np.testing.assert_allclose(np.asarray(params["ip"]["b"]), b_ref)
    np.testing.assert_allclose(np.asarray(state["history"]["ip"]["w"]),
                               hw_caffe.T)
    np.testing.assert_allclose(np.asarray(state["history"]["ip"]["b"]), hb)


def test_foreign_resume_drives_training(tmp_path, mini_project):
    """End to end: a training run seeded from a foreign .solverstate starts
    at the foreign iter and uses the foreign momentum (first-step params
    differ from a no-history start by exactly the momentum carry)."""
    msg = _solver_with(mini_project, max_iter=10, snapshot=5,
                       test_interval=0, display=1)
    msg.add("snapshot_format", "caffe")
    SolverDriver(msg).build().train()
    prefix = str(mini_project["tmp"] / "snap")

    msg2 = _solver_with(mini_project, max_iter=7, snapshot=0,
                        test_interval=0, display=1)
    res = SolverDriver(msg2).build().train(
        resume_state_path=f"{prefix}_iter_5.solverstate")
    # resumed at iter 5 → display-every-1 records iters 5 and 6
    assert [m[0] for m in res.metrics_history] == [5, 6]
    assert int(res.state["iter"]) == 7


def test_solverstate_mismatch_is_loud(tmp_path):
    """Wrong blob count for the net's param layers → hard error, not a
    silently truncated momentum restore."""
    from videovector_tpu.data.netproto import history_from_blobs
    from videovector_tpu.data.wire import BlobProto
    blobs = [BlobProto(num=1, channels=1, height=2, width=3,
                       data=np.zeros(6, np.float32))]
    template = {"ip": {"w": np.zeros((3, 2), np.float32),
                       "b": np.zeros((2,), np.float32)}}
    with pytest.raises(ValueError, match="mismatch"):
        history_from_blobs(blobs, template, ["ip"])
