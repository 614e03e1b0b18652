"""Binary proto codec + full NetParameter round-trip + snapshot_diff
(ref Net::ToProto net.cpp:774-801, Solver::Snapshot solver.cpp:321-341)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videovector_tpu.config import parse, parse_file
from videovector_tpu.config import binproto
from videovector_tpu.config.textformat import Message
from videovector_tpu.graph import Net


def _semantic_eq(a, b, path=""):
    """Field-order-preserving semantic comparison: numbers compare by value
    (int 1 == float 1.0 — text files write either form)."""
    assert set(a.fields) == set(b.fields), \
        f"{path}: {set(a.fields) ^ set(b.fields)}"
    for k in a.fields:
        va, vb = a.fields[k], b.fields[k]
        assert len(va) == len(vb), f"{path}.{k}"
        for x, y in zip(va, vb):
            if isinstance(x, Message):
                _semantic_eq(x, y, f"{path}.{k}")
            elif isinstance(x, (int, float)) and not isinstance(x, bool) \
                    and isinstance(y, (int, float)):
                assert float(np.float32(x)) == float(np.float32(y)), \
                    f"{path}.{k}: {x} != {y}"
            else:
                assert x == y, f"{path}.{k}: {x!r} != {y!r}"


NET = """
name: "rt"
force_backward: true
layers { name: "d" type: MEMORY_DATA top: "x" }
layers { name: "ip" type: INNER_PRODUCT bottom: "x" top: "h"
  blobs_lr: 1 blobs_lr: 2 weight_decay: 1 weight_decay: 0
  inner_product_param { num_output: 4 regularization: 0.99
    weight_filler { type: "gaussian" std: 0.01 } } }
layers { name: "r" type: RELU bottom: "h" top: "h"
  relu_param { negative_slope: 0.1 } }
layers { name: "drop" type: DROPOUT bottom: "h" top: "h"
  dropout_param { dropout_ratio: 0.9 } include: { phase: TRAIN } }
"""


def test_binproto_solver_roundtrip():
    msg = parse_file(
        "projects/videovec_embedding/mednet_embedding_train_solver.prototxt")
    rt = binproto.decode(binproto.encode(msg, "SolverParameter"),
                         "SolverParameter")
    assert rt.dumps() == msg.dumps()


def test_binproto_flagship_net_roundtrip():
    import sys
    sys.path.insert(0, "projects/videovec_embedding")
    from generate_net import emit
    net = parse(emit("train_db", "test_db"))
    rt = binproto.decode(binproto.encode(net, "NetParameter"), "NetParameter")
    _semantic_eq(net, rt)


def test_binproto_unknown_field_raises():
    msg = parse("no_such_field: 3")
    with pytest.raises(ValueError, match="no field"):
        binproto.encode(msg, "NetParameter")


def test_full_netparameter_roundtrip(tmp_path, rng):
    """save_net → load_net: identical configs AND identical weights —
    the reference could rebuild this net from the single binary file."""
    from videovector_tpu.data.netproto import load_net, save_net
    from videovector_tpu.data.weights import load_into_params

    msg = parse(NET)
    net = Net(msg, phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((2, 6), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)

    path = str(tmp_path / "full.caffemodel")
    save_net(path, msg, params)

    msg2, weights = load_net(path)
    _semantic_eq(msg, msg2)

    net2 = Net(msg2, phase="TRAIN")
    params2, _ = net2.init(jax.random.PRNGKey(7), spec)  # different init
    params2 = load_into_params(weights, params2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params2)

    # and the loaded net computes identically
    x = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    # same rng both sides: TRAIN dropout requires a key (engine contract)
    # and identical keys keep the comparison deterministic
    k = jax.random.PRNGKey(3)
    _, o1 = net.apply(params, {"x": x}, rng=k, return_blobs=True)
    _, o2 = net2.apply(params2, {"x": x}, rng=k, return_blobs=True)
    np.testing.assert_array_equal(np.asarray(o1["h"]), np.asarray(o2["h"]))


def test_netparameter_with_diffs(tmp_path, rng):
    """snapshot_diff payload: BlobProto.diff alongside data, recoverable as
    a grads pytree (ref solver.cpp:321-341 net ToProto(write_diff))."""
    from videovector_tpu.data.netproto import (
        diffs_from_weights, load_net, save_net,
    )
    msg = parse(NET)
    net = Net(msg, phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((2, 6), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    grads = jax.tree.map(lambda a: jnp.asarray(
        np.random.RandomState(3).randn(*a.shape).astype(np.float32)), params)

    path = str(tmp_path / "diff.caffemodel")
    save_net(path, msg, params, diffs=grads)
    _, weights = load_net(path)
    recovered = diffs_from_weights(weights, params)
    assert recovered is not None
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6), grads, recovered)

    # without diffs: none recovered
    save_net(path, msg, params)
    _, weights = load_net(path)
    assert diffs_from_weights(weights, params) is None


def test_snapshot_diff_in_training(tmp_path, rng):
    """Training with snapshot_diff persists the last step's gradients in the
    .vvmodel; they match a hand-computed gradient at the same point."""
    from videovector_tpu.solver import SolverConfig
    from videovector_tpu.solver.checkpoint import load_diffs, load_model
    from videovector_tpu.solver.train import train
    from videovector_tpu.solver.solvers import init_solver_state, solver_update

    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" top: "y" }
    layers { name: "ip" type: INNER_PRODUCT bottom: "x" top: "p"
      inner_product_param { num_output: 2
        weight_filler { type: "gaussian" std: 0.5 } } }
    layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "p" bottom: "y" }
    """)
    net = Net(msg, phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((4, 3), jnp.float32),
            "y": jax.ShapeDtypeStruct((4, 2), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batches = [{"x": jnp.asarray(rng.randn(4, 3).astype(np.float32)),
                "y": jnp.asarray(rng.randn(4, 2).astype(np.float32))}
               for _ in range(3)]

    prefix = str(tmp_path / "snap")
    cfg = SolverConfig(base_lr=0.1, max_iter=3, snapshot_prefix=prefix,
                       snapshot_diff=True)
    train(lambda p, b, k: (net.apply(p, b)[0], {}), params, iter(batches), cfg)

    diffs = load_diffs(f"{prefix}_iter_3.vvmodel")
    assert diffs is not None

    # replay: grads at the LAST step (params after 2 updates, batch #3)
    p = jax.tree.map(jnp.array, params)
    st = init_solver_state(cfg, p)
    for b in batches[:2]:
        g = jax.grad(lambda pp: net.apply(pp, b)[0])(p)
        p, st = solver_update(cfg, p, g, st)
    g_last = jax.grad(lambda pp: net.apply(pp, batches[2])[0])(p)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g_last, diffs)

    # params load cleanly (diff keys are side data)
    loaded = load_model(f"{prefix}_iter_3.vvmodel")
    assert "diff" not in loaded and "ip" in loaded


def test_upgrade_cli_binary(tmp_path):
    """upgrade_net_proto reads/writes binary NetParameter
    (upgrade_net_proto_binary parity)."""
    from videovector_tpu.tools.upgrade_net_proto import main
    msg = parse(NET)
    bin_in = str(tmp_path / "net.binaryproto")
    binproto.write_binary(bin_in, msg, "NetParameter")

    txt_out = str(tmp_path / "out.prototxt")
    assert main([bin_in, txt_out]) == 0
    _semantic_eq(msg, parse_file(txt_out))

    bin_out = str(tmp_path / "out.binaryproto")
    assert main([txt_out, bin_out]) == 0
    _semantic_eq(msg, binproto.read_binary(bin_out, "NetParameter"))


def test_schema_aware_text_printer():
    """to_text quotes string fields and leaves enums bare — strict
    TextFormat the reference's text parser accepts."""
    msg = parse(NET)
    text = binproto.to_text(msg, "NetParameter")
    assert 'name: "rt"' in text
    assert 'name: "ip"' in text          # string field quoted
    assert "type: INNER_PRODUCT" in text  # enum bare
    assert 'type: "gaussian"' in text     # filler type is a string field
    _semantic_eq(msg, parse(text))        # reparses to the same message


def test_conditional_lstm_caffemodel_roundtrip(rng):
    """LSTM_CONDITIONAL carries 7 reference blobs
    (ref:src/caffe/layers/lstm_conditional_layer.cpp:70-112:
    W_i, W_h, W_o2h, W_h2o, b, b_o2h, b_h2o) — export and import must map
    ALL of them (the h2o/o2h projections used to be silently dropped both
    ways)."""
    from videovector_tpu.data.weights import (
        NetWeights, load_into_params, params_to_weights,
    )
    h, i, o = 6, 4, 5
    lp = {"w_i": rng.randn(i, 4 * h).astype(np.float32),
          "w_h": rng.randn(h, 4 * h).astype(np.float32),
          "w_o2h": rng.randn(o, 4 * h).astype(np.float32),
          "w_h2o": rng.randn(h, o).astype(np.float32),
          "b": rng.randn(4 * h).astype(np.float32),
          "b_o2h": rng.randn(4 * h).astype(np.float32),
          "b_h2o": rng.randn(o).astype(np.float32)}
    weights = params_to_weights({"dec": lp})
    assert len(weights.layers[0].blobs) == 7
    reloaded = NetWeights.decode(weights.encode())
    template = {"dec": {k: np.zeros_like(v) for k, v in lp.items()}}
    out = load_into_params(reloaded, template)
    for k, v in lp.items():
        np.testing.assert_array_equal(out["dec"][k], v), k


def test_weights_blob_count_check(rng):
    """Blob-count mismatches raise like the reference's CHECK_EQ
    (ref:src/caffe/net.cpp:692-763) — a bias in the file loaded into a
    bias-less net (or vice versa) is a config mismatch, not something to
    silently drop."""
    import pytest
    from videovector_tpu.data.weights import (
        load_into_params, params_to_weights,
    )
    full = {"ip": {"w": rng.randn(3, 4).astype(np.float32),
                   "b": rng.randn(4).astype(np.float32)}}
    weights = params_to_weights(full)
    no_bias = {"ip": {"w": np.zeros((3, 4), np.float32)}}
    with pytest.raises(ValueError, match="blob"):
        load_into_params(weights, no_bias)
    lstm_full = {"enc": {"w_i": rng.randn(4, 24).astype(np.float32),
                         "w_h": rng.randn(6, 24).astype(np.float32),
                         "b": rng.randn(24).astype(np.float32)}}
    lweights = params_to_weights(lstm_full)
    lstm_no_b = {"enc": {k: np.zeros_like(v)
                         for k, v in lstm_full["enc"].items() if k != "b"}}
    with pytest.raises(ValueError, match="blob"):
        load_into_params(lweights, lstm_no_b)


def test_checkpoint_slash_layer_names(tmp_path, rng):
    """GoogLeNet-style layer names with '/' must survive snapshot/restore
    (the flat npz key separator is escaped, not split)."""
    import jax.numpy as jnp
    from videovector_tpu.solver.checkpoint import load_model, restore, snapshot
    params = {"inception_3a/1x1": {"w": rng.randn(2, 3).astype(np.float32)}}
    state = {"iter": jnp.int32(5),
             "history": {"inception_3a/1x1":
                         {"w": rng.randn(2, 3).astype(np.float32)}}}
    mp, sp = snapshot(str(tmp_path / "s"), 5, params, state)
    loaded = load_model(mp)
    assert list(loaded) == ["inception_3a/1x1"]
    np.testing.assert_array_equal(loaded["inception_3a/1x1"]["w"],
                                  params["inception_3a/1x1"]["w"])
    p2, s2 = restore(sp)
    assert list(s2["history"]) == ["inception_3a/1x1"]
    np.testing.assert_array_equal(
        np.asarray(s2["history"]["inception_3a/1x1"]["w"]),
        state["history"]["inception_3a/1x1"]["w"])


def test_binproto_to_text_escapes_newlines():
    """to_text output must be strict-TextFormat parseable — a raw newline
    inside a quoted literal breaks the reference's reader."""
    from videovector_tpu.config.binproto import to_text
    from videovector_tpu.config.textformat import Message, parse
    m = Message()
    m.add("name", "a\nb")
    txt = to_text(m, "NetParameter")
    assert "\n" not in txt.split('"')[1]  # escaped inside the literal
    assert parse(txt).get("name") == "a\nb"
