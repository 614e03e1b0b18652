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
