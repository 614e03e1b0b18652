"""The trajectory-forecast example project: TrackingWindow protos → prototxt
enc-dec net → solver loop, end to end at reduced scale."""

import importlib.util
import os

import numpy as np

_PROJ = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "trajectory_forecast")


def _load(name):
    # explicit file loading: the embedding project also ships generate_net/
    # make_synthetic_data modules and sys.path imports would collide
    spec = importlib.util.spec_from_file_location(
        f"trajproj_{name}", os.path.join(_PROJ, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


emit = _load("generate_net").emit
make_windows = _load("make_synthetic_data").make_windows

from videovector_tpu.config.textformat import Message, parse
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.solver.driver import SolverDriver


def _write_data(tmp_path, rng, n_train=40, n_test=8, t_obs=6, t_pred=3):
    paths = []
    for name, n in (("train", n_train), ("test", n_test)):
        path = str(tmp_path / f"tracks_{name}.vvr")
        with RecordWriter(path) as w:
            for i, win in enumerate(make_windows(rng, n, 3, t_obs, t_pred)):
                w.append(f"{i:08d}", win.encode())
        paths.append(path)
    return paths


def test_trajectory_project_trains_and_evals(tmp_path, rng):
    train, test = _write_data(tmp_path, rng)
    net_path = str(tmp_path / "trajectory_train.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(train, test, batch=12, test_batch=8, hidden=16,
                     t_obs=6, t_pred=3))

    solver = parse(f"""
    net: "{net_path}"
    base_lr: 0.05
    momentum: 0.9
    lr_policy: "fixed"
    max_iter: 120
    display: 10
    test_iter: 2
    test_interval: 60
    snapshot: 0
    snapshot_prefix: "{tmp_path / 'traj'}"
    """)

    driver = SolverDriver(solver).build()
    res = driver.train()
    losses = [m[1]["loss"] for m in res.metrics_history]
    # constant-velocity tracks: the enc-dec must learn to extrapolate
    # (metrics recorded every `display` iters)
    assert np.mean(losses[-3:]) < 0.5 * losses[0]
    # TEST phase ran and produced the displacement loss as a net output
    assert res.test_history
    assert "displacement_loss" in res.test_history[-1][1]


def test_trajectory_net_census(tmp_path, rng):
    train, test = _write_data(tmp_path, rng)
    msg = parse(emit(train, test))
    types = [l.get("type") for l in msg.get_list("layers")]
    assert types.count("TRACKING_WINDOWS_DATA") == 2  # TRAIN + TEST
    assert types.count("LSTM_ENC_DEC") == 1
    assert types.count("EUCLIDEAN_LOSS") == 1
    assert types.count("FLATTEN_BATCH") == 2


def test_serving_export_trajectory_net_parity(tmp_path, rng):
    """vvtpu-serve over the trajectory enc-dec net: the frozen artifact
    reproduces the engine's prediction blob (deployment preserves parity
    for the LSTM workload, not just the embedding tower)."""
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.serving import export_serving, load_serving
    import jax

    train, test = _write_data(tmp_path, rng)
    net_path = str(tmp_path / "traj.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(train, test, batch=8, test_batch=8, hidden=12,
                     t_obs=6, t_pred=3))
    out = str(tmp_path / "traj.vvserve")
    meta = export_serving(net_path, [], ["pred"], out)
    assert meta["outputs"] == ["pred"]  # enc-dec carries no cross-batch state

    call, meta2 = load_serving(out)
    # engine side with the same deterministic init
    from videovector_tpu.graph.data_factory import MergedSource, \
        make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    net = Net(parse(open(net_path).read()), phase="TEST")
    src = MergedSource([make_data_source(l, phase="TEST")
                        for l in net.layers
                        if l.get("type") in DATA_LAYER_TYPES])
    batch = {k: jnp.asarray(v) for k, v in src.next_batch().items()}
    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batch.items()})
    _, blobs = net.apply(params, batch, return_blobs=True)
    served = call({k: np.asarray(v, np.float32) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(served["pred"]),
                               np.asarray(blobs["pred"]),
                               rtol=1e-5, atol=1e-6)


def test_serving_export_stateful_lstm_state_io(tmp_path, rng):
    """A stateful (plain LSTM) tracking net exports with state:<layer>:{c,h}
    inputs/outputs; threading the carry through the artifact over 3
    sequential batches matches the engine's state threading exactly
    (ref lstm_layer.cpp:171-173 cross-batch next_cell_/next_out_)."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.data_factory import MergedSource, \
        make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.serving import export_serving, load_serving

    train, _ = _write_data(tmp_path, rng, t_obs=5, t_pred=2)
    net_text = f"""
    name: "lstm_serve"
    layers {{ name: "d" type: TRACKING_WINDOWS_DATA
      top: "observed" top: "cont_obs" top: "predicted" top: "cont_pred"
      top: "gt"
      tracking_windows_data_param {{ source: "{train}" batch_size: 6
        temporal_observed_size: 5 temporal_predicted_size: 2 }} }}
    layers {{ name: "enc" type: LSTM bottom: "observed" bottom: "cont_obs"
      top: "h" inner_product_param {{ num_output: 10
        weight_filler {{ type: "gaussian" std: 0.2 }} }} }}
    layers {{ name: "sil1" type: SILENCE bottom: "predicted" }}
    layers {{ name: "sil2" type: SILENCE bottom: "cont_pred" }}
    layers {{ name: "sil3" type: SILENCE bottom: "gt" }}
    """
    net_path = tmp_path / "lstm_serve.prototxt"
    net_path.write_text(net_text)
    out = str(tmp_path / "lstm.vvserve")
    meta = export_serving(str(net_path), [], ["h"], out)
    assert meta["state"] == ["state:enc:c", "state:enc:h"]
    assert "state:enc:c" in meta["inputs"]

    call, _ = load_serving(out)
    net = Net(parse(net_text), phase="TEST")
    src = MergedSource([make_data_source(l, phase="TEST")
                        for l in net.layers
                        if l.get("type") in DATA_LAYER_TYPES])
    batches = [src.next_batch() for _ in range(3)]
    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batches[0].items()})

    # engine threading
    state = None
    engine_h = []
    for b in batches:
        _, blobs, state = net.apply(
            params, {k: jnp.asarray(v) for k, v in b.items()},
            state=state, return_blobs=True, return_state=True)
        engine_h.append(np.asarray(blobs["h"]))

    # artifact threading via state:enc:{c,h}
    c = np.zeros_like(np.asarray(state["enc"].c))
    h = np.zeros_like(np.asarray(state["enc"].h))
    for i, b in enumerate(batches):
        feed = {k: np.asarray(v, np.float32) for k, v in b.items()}
        feed["state:enc:c"] = c
        feed["state:enc:h"] = h
        outd = call(feed)
        np.testing.assert_allclose(np.asarray(outd["h"]), engine_h[i],
                                   rtol=1e-5, atol=1e-6)
        c = np.asarray(outd["state:enc:c"])
        h = np.asarray(outd["state:enc:h"])
    # the carry actually mattered (state is nonzero after batch 1)
    assert float(np.abs(c).max()) > 0


def _stateful_lstm_artifact(tmp_path, rng, symbolic_batch=False):
    from videovector_tpu.tools.serving import export_serving, load_serving
    train, _ = _write_data(tmp_path, rng, t_obs=5, t_pred=2)
    net_text = f"""
    name: "lstm_serve"
    layers {{ name: "d" type: TRACKING_WINDOWS_DATA
      top: "observed" top: "cont_obs" top: "predicted" top: "cont_pred"
      top: "gt"
      tracking_windows_data_param {{ source: "{train}" batch_size: 6
        temporal_observed_size: 5 temporal_predicted_size: 2 }} }}
    layers {{ name: "enc" type: LSTM bottom: "observed" bottom: "cont_obs"
      top: "h" inner_product_param {{ num_output: 10
        weight_filler {{ type: "gaussian" std: 0.2 }} }} }}
    layers {{ name: "sil1" type: SILENCE bottom: "predicted" }}
    layers {{ name: "sil2" type: SILENCE bottom: "cont_pred" }}
    layers {{ name: "sil3" type: SILENCE bottom: "gt" }}
    """
    net_path = tmp_path / "lstm_serve.prototxt"
    net_path.write_text(net_text)
    out = str(tmp_path / "lstm.vvserve")
    meta = export_serving(str(net_path), [], ["h"], out,
                          symbolic_batch=symbolic_batch)
    call, meta2 = load_serving(out)
    return call, meta2


def test_serving_batch_axes_recorded_time_major(tmp_path, rng):
    """The artifact records per-tensor batch axes: time-major LSTM blobs
    (T, B, ...) → axis 1, state carries (B, H) → axis 0 — the layout
    data-parallel serving and --symbolic_batch must split/symbolize."""
    _, meta = _stateful_lstm_artifact(tmp_path, rng)
    ax = meta["batch_axes"]
    assert ax["observed"] == 1 and ax["cont_obs"] == 1
    assert ax["state:enc:c"] == 0 and ax["state:enc:h"] == 0
    assert ax["h"] == 1  # output h is (T, B, H)


def test_serving_sharded_stateful_threads_state(tmp_path, rng):
    """shard_serving on a stateful time-major artifact: sequence tops split
    on axis 1, state carries on axis 0 — threading the carry through 3
    sharded calls matches the single-device artifact exactly (each shard
    owns its sub-batch's state; no cross-shard coupling)."""
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.tools.serving import shard_serving
    call, meta = _stateful_lstm_artifact(tmp_path, rng, symbolic_batch=True)
    sharded = shard_serving(call, meta, make_mesh(data=2))

    r = np.random.RandomState(7)
    batches = [{"observed": r.randn(5, 6, 3).astype(np.float32),
                "cont_obs": np.vstack([np.zeros((1, 6), np.float32),
                                       np.ones((4, 6), np.float32)]),
                "predicted": r.randn(2, 6, 3).astype(np.float32),
                "cont_pred": np.ones((2, 6), np.float32),
                "gt": r.randn(2, 6, 2).astype(np.float32)}
               for _ in range(3)]
    for fn in (call, sharded):
        c = np.zeros((6, 10), np.float32)
        h = np.zeros((6, 10), np.float32)
        outs = []
        for b in batches:
            o = fn({**b, "state:enc:c": c, "state:enc:h": h})
            outs.append(np.asarray(o["h"]))
            c, h = np.asarray(o["state:enc:c"]), np.asarray(o["state:enc:h"])
        if fn is call:
            want, want_c = outs, c
    for got, ref in zip(outs, want):
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c, want_c, rtol=1e-5, atol=1e-6)
    assert float(np.abs(c).max()) > 0


def test_serving_symbolic_batch_time_major(tmp_path, rng):
    """--symbolic_batch on a stateful net symbolizes the BATCH axis (axis 1
    for time-major tops, axis 0 for state) — the time axis stays static."""
    call, meta = _stateful_lstm_artifact(tmp_path, rng, symbolic_batch=True)
    assert meta["inputs"]["observed"][0] == [5, -1, 3]
    assert meta["inputs"]["state:enc:c"][0] == [-1, 10]
    r = np.random.RandomState(3)
    for b in (2, 9):
        o = call({"observed": r.randn(5, b, 3).astype(np.float32),
                  "cont_obs": np.ones((5, b), np.float32),
                  "predicted": r.randn(2, b, 3).astype(np.float32),
                  "cont_pred": np.ones((2, b), np.float32),
                  "gt": r.randn(2, b, 2).astype(np.float32),
                  "state:enc:c": np.zeros((b, 10), np.float32),
                  "state:enc:h": np.zeros((b, 10), np.float32)})
        assert np.asarray(o["h"]).shape == (5, b, 10)
        assert np.asarray(o["state:enc:h"]).shape == (b, 10)
