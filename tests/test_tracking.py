"""Social pooling + tracking data source + trajectory model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.data.tracking import (
    TrackingConfig, TrackingWindowDataset, TrackingWindowsSocialSource,
    TrackingWindowsSource,
)
from videovector_tpu.data.wire import TrackingWindow, TrackPositions
from videovector_tpu.models.trajectory import TrajectoryConfig, TrajectoryModel
from videovector_tpu.ops.social import social_pooling
from videovector_tpu.solver import SolverConfig
from videovector_tpu.solver.train import train


def test_social_pooling_formula(rng):
    b, f = 4, 6
    feats = rng.randn(b, 5).astype(np.float32)
    rel = (rng.rand(b, b) > 0.5).astype(np.float32)
    np.fill_diagonal(rel, 0)
    w = rng.randn(2, f).astype(np.float32)
    bias = rng.randn(f).astype(np.float32)
    out = social_pooling(jnp.asarray(feats), jnp.asarray(rel),
                         jnp.asarray(w), jnp.asarray(bias))
    # oracle loop (ref Forward_cpu :92-186)
    expect = np.zeros((b, f), np.float32)
    sig = lambda v: 1 / (1 + np.exp(-v))
    for i in range(b):
        for j in range(b):
            dx = feats[i, 0] - feats[j, 0]
            dy = feats[i, 1] - feats[j, 1]
            expect[i] += rel[i, j] * sig(dx * w[0] + dy * w[1] + bias)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_social_pooling_grads(rng):
    from jax.test_util import check_grads
    feats = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    rel = jnp.asarray(np.ones((3, 3), np.float32) - np.eye(3, dtype=np.float32))
    w = jnp.asarray(rng.randn(2, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(5).astype(np.float32))
    check_grads(lambda f, w, b: jnp.sum(social_pooling(f, rel, w, b) ** 2),
                (feats, w, b), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def _make_windows(rng, num_windows=4, tracks_per=3, length=12):
    windows = []
    tid = 0
    for s in range(num_windows):
        tracks = []
        for _ in range(tracks_per):
            start = rng.rand(2) * 10
            vel = rng.randn(2) * 0.5
            ts = np.arange(length)
            x = start[0] + vel[0] * ts + 0.01 * rng.randn(length)
            y = start[1] + vel[1] * ts + 0.01 * rng.randn(length)
            tracks.append(TrackPositions(id=tid, x=list(x.astype(float)),
                                         y=list(y.astype(float)), cl=0))
            tid += 1
        windows.append(TrackingWindow(
            observed_time=list(range(8)), prediction_time=list(range(8, 12)),
            scene_id=s, track_positions=tracks))
    return TrackingWindowDataset(windows)


def test_tracking_source_layout(rng):
    ds = _make_windows(rng)
    cfg = TrackingConfig(batch_size=5, temporal_observed_size=8,
                         temporal_predicted_size=4)
    src = TrackingWindowsSource(ds, cfg)
    b = src.next_batch()
    assert b["observed"].shape == (8, 5, 3)
    assert b["predicted"].shape == (4, 5, 3)
    assert b["labels"].shape == (4, 5, 2)
    # recentered on last observed position: final observed step ≈ (0, 0)
    np.testing.assert_allclose(b["observed"][7, :, :2], 0.0, atol=1e-6)
    # encoder bit: 0 in observed, 1 in predicted
    assert np.all(b["observed"][:, :, 2] == 0)
    assert np.all(b["predicted"][:, :, 2] == 1)
    # cont bits: first observed row 0, rest 1; predicted all 1
    assert np.all(b["cont_observed"][0] == 0)
    assert np.all(b["cont_observed"][1:] == 1)
    assert np.all(b["cont_predicted"] == 1)


def test_tracking_social_source(rng):
    ds = _make_windows(rng, num_windows=3, tracks_per=3)
    cfg = TrackingConfig(batch_size=7, temporal_observed_size=8,
                         temporal_predicted_size=4)
    src = TrackingWindowsSocialSource(ds, cfg)
    b = src.next_batch()
    # two whole scenes fit (6 tracks), 7th slot padded invalid
    np.testing.assert_array_equal(b["is_valid"], [1, 1, 1, 1, 1, 1, 0])
    rel = b["relations"]
    # scene blocks with zero diagonal
    assert np.all(rel[:3, :3] == (1 - np.eye(3)))
    assert np.all(rel[3:6, 3:6] == (1 - np.eye(3)))
    assert np.all(rel[:3, 3:] == 0)
    assert b["mean_pos"].shape == (7, 2)


def test_trajectory_model_learns(rng):
    """Linear-motion tracks: the model should learn to extrapolate."""
    ds = _make_windows(rng, num_windows=6, tracks_per=3)
    cfg = TrackingConfig(batch_size=6, temporal_observed_size=8,
                         temporal_predicted_size=4)
    src = TrackingWindowsSocialSource(ds, cfg)
    model = TrajectoryModel(TrajectoryConfig(feature_size=3, hidden=32,
                                             pool_feat_size=8))
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p, batch, key):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return model.loss(p, batch)

    scfg = SolverConfig(base_lr=0.01, momentum=0.9, max_iter=80, display=40)
    res = train(loss_fn, params, iter(src), scfg)
    first = res.metrics_history[0][1]["loss"]
    last = res.metrics_history[-1][1]["loss"]
    assert last < first * 0.7


def test_trajectory_conditional_decoder_learns(rng):
    """Conditional (self-feeding) decoder variant learns linear motion."""
    ds = _make_windows(rng, num_windows=6, tracks_per=3)
    cfg = TrackingConfig(batch_size=6, temporal_observed_size=8,
                         temporal_predicted_size=4)
    src = TrackingWindowsSocialSource(ds, cfg)
    model = TrajectoryModel(TrajectoryConfig(
        feature_size=3, hidden=32, pool_feat_size=8, conditional_decoder=True))
    params = model.init(jax.random.PRNGKey(0))
    assert "w_h2o" in params["decoder"]

    def loss_fn(p, batch, key):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return model.loss(p, batch)

    scfg = SolverConfig(base_lr=0.01, momentum=0.9, max_iter=80, display=40)
    res = train(loss_fn, params, iter(src), scfg)
    first = res.metrics_history[0][1]["loss"]
    last = res.metrics_history[-1][1]["loss"]
    assert last < first * 0.8


def test_social_pooling_graph_layer(rng):
    from videovector_tpu.config import parse
    from videovector_tpu.graph import Net
    net = Net(parse("""
    layers { name: "d" type: TRACKING_WINDOWS_SOCIAL_DATA top: "feats" top: "rel" }
    layers { name: "sp" type: SOCIAL_POOLING bottom: "feats" bottom: "rel"
      top: "pooled" social_pooling_param { pool_feat_size: 8 } }
    """), phase="TRAIN")
    spec = {"feats": jax.ShapeDtypeStruct((1, 4, 5, 1), jnp.float32),
            "rel": jax.ShapeDtypeStruct((1, 4, 4, 1), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batch = {"feats": jnp.asarray(rng.randn(1, 4, 5, 1).astype(np.float32)),
             "rel": jnp.ones((1, 4, 4, 1), jnp.float32)}
    _, blobs = net.apply(params, batch, return_blobs=True)
    assert blobs["pooled"].shape == (1, 4, 8, 1)


def test_tracking_max_number_positions_rolling_cap(rng):
    """Reference max_number_positions is a ROLLING cap: every max-th
    emitted track skips the remainder of the current window
    (tracking_windows_data_layer.cpp:393-400). Windows of 3 tracks with
    cap 2: emits tracks (w0:0, w0:1), skips w0:2, (w1:0, w1:1), ..."""
    windows = []
    for wi in range(4):
        tracks = [TrackPositions(id=wi * 10 + t,
                                 x=[float(wi * 10 + t)] * 6,
                                 y=[0.0] * 6, cl=0)
                  for t in range(3)]
        windows.append(TrackingWindow(observed_time=list(range(4)),
                                      prediction_time=[4, 5],
                                      scene_id=wi, track_positions=tracks))
    ds = TrackingWindowDataset(windows)
    cfg = TrackingConfig(batch_size=6, temporal_observed_size=4,
                         temporal_predicted_size=2,
                         max_number_positions=2, output_scene_ids=True)
    src = TrackingWindowsSource(ds, cfg)
    b = src.next_batch()
    # track ids emitted: 0,1 (skip 2), 10,11 (skip 12), 20,21
    np.testing.assert_array_equal(b["scene_ids"], [0, 1, 10, 11, 20, 21])


def test_tracking_all_empty_windows_raises():
    """Every window with zero tracks must raise, not spin forever."""
    import pytest
    windows = [TrackingWindow(observed_time=[0, 1], prediction_time=[2],
                              scene_id=i, track_positions=[])
               for i in range(3)]
    ds = TrackingWindowDataset(windows)
    cfg = TrackingConfig(batch_size=2, temporal_observed_size=2,
                         temporal_predicted_size=1)
    src = TrackingWindowsSource(ds, cfg)
    with pytest.raises(ValueError, match="track_positions"):
        src.next_batch()


def test_social_source_oversized_scenes(rng):
    """Scenes larger than the batch are skipped indefinitely (not capped
    by a total-attempts counter that shipped mostly-padded batches), and
    an all-oversized dataset raises."""
    import pytest

    def scene(wi, k):
        tracks = [TrackPositions(id=wi * 100 + t, x=[float(t)] * 6,
                                 y=[0.0] * 6, cl=0) for t in range(k)]
        return TrackingWindow(observed_time=list(range(4)),
                              prediction_time=[4, 5], scene_id=wi,
                              track_positions=tracks)

    # many oversized scenes + one fitting scene: the batch must still fill
    windows = [scene(i, 9) for i in range(20)] + [scene(99, 2)]
    ds = TrackingWindowDataset(windows)
    cfg = TrackingConfig(batch_size=4, temporal_observed_size=4,
                         temporal_predicted_size=2)
    src = TrackingWindowsSocialSource(ds, cfg)
    b = src.next_batch()
    assert b["is_valid"].sum() == 4   # 2 passes over the fitting scene

    all_big = TrackingWindowDataset([scene(i, 9) for i in range(5)])
    src2 = TrackingWindowsSocialSource(all_big, cfg)
    with pytest.raises(ValueError, match="fits batch_size"):
        src2.next_batch()
