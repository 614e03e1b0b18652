"""Prototxt training over a multi-device mesh via SolverDriver + CLI flag,
and the retrieval csv report."""

import numpy as np

from videovector_tpu.config.textformat import Message
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.parallel import make_mesh
from videovector_tpu.solver.driver import SolverDriver


def _mini_solver(tmp_path, rng):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "projects", "videovec_embedding"))
    from generate_net import emit
    videos = []
    for v in range(10):
        center = rng.randn(32).astype(np.float32)
        feats = np.abs(center + 0.3 * rng.randn(8, 32).astype(np.float32))
        videos.append(ShotVideo(v + 1, np.arange(8, dtype=np.int32), feats))
    train = str(tmp_path / "train.vvr")
    ShotDataset(videos).to_records(train)
    net_path = tmp_path / "net.prototxt"
    # train-only net (test branch removed via test_interval=0)
    text = emit(train, train, batch=8, test_batch=8, negatives=4, embed=16,
                buffer_size=16, same_video_negs=1)
    net_path.write_text(text)
    solver = Message()
    solver.add("net", str(net_path))
    solver.add("base_lr", 0.02)
    solver.add("momentum", 0.9)
    solver.add("max_iter", 8)
    solver.add("display", 4)
    return solver


def test_driver_trains_over_mesh(tmp_path, rng):
    solver = _mini_solver(tmp_path, rng)
    driver = SolverDriver(solver).build()
    mesh = make_mesh(data=4, model=2)
    res = driver.train(mesh=mesh)
    assert res.metrics_history
    assert np.isfinite(res.metrics_history[-1][1]["loss"])


def test_retrieval_eval_sharded_over_mesh(tmp_path, rng):
    """Mesh-sharded gallery eval: the query-chunk axis of the scanned
    engines shards over the mesh "data" axis via shard_map; per-chunk
    partials and per-query rows must be BIT-equal to the single-device
    scan (no collectives — the host reduction sees the same f32 partials
    in the same chunk order), for both engines, a non-divisible chunk
    count, and the csv report (byte-identical file)."""
    import jax.numpy as jnp
    from videovector_tpu.metrics.retrieval import (
        retrieval_stats_chunked, retrieval_stats_report,
    )
    n, d = 531, 12   # q_chunk=64 → 9 chunks, not divisible by 4 shards
    feats = rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 60, size=(n,))
    cls = vids % 5
    mesh = make_mesh(data=4, model=2)   # model axis must be ignored
    for method in ("count", "sort"):
        single = retrieval_stats_chunked(
            jnp.asarray(feats), vids, cls, query_chunk=64, method=method,
            exclude_same_video_shots=True)
        sharded = retrieval_stats_chunked(
            jnp.asarray(feats), vids, cls, query_chunk=64, method=method,
            exclude_same_video_shots=True, mesh=mesh)
        for k in single:
            assert float(single[k]) == float(sharded[k]), (method, k)
    p1 = str(tmp_path / "single.csv")
    p2 = str(tmp_path / "sharded.csv")
    agg1 = retrieval_stats_report(feats, vids, cls, p1)
    agg2 = retrieval_stats_report(feats, vids, cls, p2, mesh=mesh)
    assert agg1 == agg2
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_retrieval_eval_gallery_sharded(tmp_path, rng):
    """GALLERY-sharded eval: gallery rows shard over the mesh "data" axis
    (per-device memory N·D/ndev — galleries beyond one chip's HBM) and
    rank counts combine via exact integer psums. Must equal the
    single-device count engine bit-for-bit — aggregates AND the csv
    report (distributed top-5 merge) — across non-divisible gallery
    sizes (pad rows), duplicate features (distance ties), negative
    classes, and both exclude settings."""
    import jax.numpy as jnp
    from videovector_tpu.metrics.retrieval import (
        retrieval_stats_chunked, retrieval_stats_report,
    )
    mesh = make_mesh(data=4, model=2)   # model axis must be ignored
    n, d = 531, 12   # 531 % 4 != 0 → padded gallery shards
    feats = rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feats[17] = feats[3]     # exact ties exercise the (dist, idx) rule
    feats[404] = feats[3]
    vids = rng.randint(0, 60, size=(n,))
    cls = (vids % 5) - 1     # class −1 rows excluded from means
    for excl in (False, True):
        single = retrieval_stats_chunked(
            jnp.asarray(feats), vids, cls, query_chunk=64, method="count",
            exclude_same_video_shots=excl)
        sharded = retrieval_stats_chunked(
            jnp.asarray(feats), vids, cls, query_chunk=64,
            exclude_same_video_shots=excl, mesh=mesh, shard_gallery=True)
        for k in single:
            assert float(single[k]) == float(sharded[k]), (excl, k)
    # a HOST (numpy) gallery takes the no-single-device-commit path
    # (_shard_gallery device_puts it directly with the sharding)
    host = retrieval_stats_chunked(feats, vids, cls, query_chunk=64,
                                   mesh=mesh, shard_gallery=True)
    for k in host:
        assert float(host[k]) == float(retrieval_stats_chunked(
            jnp.asarray(feats), vids, cls, query_chunk=64,
            method="count")[k]), k
    p1 = str(tmp_path / "single.csv")
    p2 = str(tmp_path / "gshard.csv")
    agg1 = retrieval_stats_report(feats, vids, cls, p1, method="count")
    agg2 = retrieval_stats_report(feats, vids, cls, p2, mesh=mesh,
                                  shard_gallery=True)
    assert agg1 == agg2
    assert open(p1, "rb").read() == open(p2, "rb").read()
    # contract errors: mesh required; sorts don't decompose over shards
    import pytest
    with pytest.raises(ValueError, match="requires mesh"):
        retrieval_stats_chunked(feats, vids, cls, shard_gallery=True)
    with pytest.raises(ValueError, match="count"):
        retrieval_stats_chunked(feats, vids, cls, mesh=mesh,
                                shard_gallery=True, method="sort")
    with pytest.raises(ValueError, match="count"):
        retrieval_stats_report(feats, vids, cls, p2, mesh=mesh,
                               shard_gallery=True, method="sort")


def test_retrieval_stats_report(tmp_path, rng):
    from videovector_tpu.metrics.retrieval import (
        retrieval_stats, retrieval_stats_report,
    )
    import jax.numpy as jnp
    feats = rng.randn(12, 6).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 4, size=(12,))
    classes = vids % 2
    path = str(tmp_path / "stats.csv")
    agg = retrieval_stats_report(feats, vids, classes, path)
    ref = retrieval_stats(jnp.asarray(feats), jnp.asarray(vids),
                          jnp.asarray(classes))
    np.testing.assert_allclose(agg["mean_ap"], float(ref["mean_ap"]),
                               rtol=1e-5)
    lines = open(path).read().strip().split("\n")
    assert lines[0].startswith("#video_id,class_id,ap")
    assert len(lines) == 13  # header + 12 queries
    # per-row ap values average to the aggregate
    aps = [float(l.split(",")[2]) for l in lines[1:]]
    np.testing.assert_allclose(np.mean(aps), agg["mean_ap"], rtol=1e-5)


def test_mesh_training_stateful_lstm_net(tmp_path, rng):
    """Prototxt LSTM net (cross-batch state carry) trained over the mesh:
    the carry rides the replicated metrics channel and re-enters the next
    sharded step — must run and reduce loss."""
    import jax
    import numpy as np
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.solver.driver import SolverDriver
    from videovector_tpu.data.records import RecordWriter
    from videovector_tpu.data.wire import TrackPositions, TrackingWindow

    t_obs, t_pred, b = 6, 3, 16
    path = str(tmp_path / "tracks.vvr")
    with RecordWriter(path) as w:
        tid = 0
        for s in range(60):
            tracks = []
            for _ in range(4):
                vel = rng.randn(2) * 0.4
                ts = np.arange(t_obs + t_pred)
                xy = vel[None, :] * ts[:, None]
                tracks.append(TrackPositions(
                    id=tid, x=list(map(float, xy[:, 0])),
                    y=list(map(float, xy[:, 1])), cl=0))
                tid += 1
            w.append(f"{s:06d}", TrackingWindow(
                observed_time=list(range(t_obs)),
                prediction_time=list(range(t_obs, t_obs + t_pred)),
                scene_id=s, track_positions=tracks).encode())

    net = f"""
    name: "lstm_mesh"
    layers {{ name: "d" type: TRACKING_WINDOWS_DATA
      top: "observed" top: "cont_obs" top: "predicted" top: "cont_pred" top: "gt"
      tracking_windows_data_param {{ source: "{path}" batch_size: {b}
        temporal_observed_size: {t_obs} temporal_predicted_size: {t_pred} }} }}
    layers {{ name: "enc" type: LSTM bottom: "observed" bottom: "cont_obs"
      top: "h" inner_product_param {{ num_output: 16
        weight_filler {{ type: "gaussian" std: 0.2 }} }} }}
    layers {{ name: "fb" type: FLATTEN_BATCH bottom: "h" top: "hf" }}
    layers {{ name: "ro" type: INNER_PRODUCT bottom: "hf" top: "pred"
      inner_product_param {{ num_output: 2 weight_filler {{ type: "xavier" }} }} }}
    layers {{ name: "gtf" type: FLATTEN_BATCH bottom: "observed" top: "obs_f" }}
    layers {{ name: "sl" type: SLICE bottom: "obs_f" top: "xy" top: "rest"
      slice_param {{ slice_dim: 1 slice_point: 2 }} }}
    layers {{ name: "sil" type: SILENCE bottom: "rest" }}
    layers {{ name: "loss" type: EUCLIDEAN_LOSS bottom: "pred" bottom: "xy"
      top: "l" }}
    """
    solver = parse(f"""
    net_param {{ {net} }}
    base_lr: 0.05 momentum: 0.9 lr_policy: "fixed"
    max_iter: 30 display: 5 snapshot: 0 snapshot_prefix: "{tmp_path / 's'}"
    """)
    driver = SolverDriver(solver).build()
    assert driver.train_net.stateful_layer_names == ["enc"]
    mesh = make_mesh(data=4, model=1)
    res = driver.train(mesh=mesh)
    losses = [m[1]["loss"] for m in res.metrics_history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_driver_refeeds_first_batch_and_closes_prefetchers(tmp_path, rng):
    """The batch build() consumes for shape specs must be RE-FED as
    training iteration 0 (the reference trains on the stream's first
    batch), and train() must close its prefetch threads on return."""
    solver = _mini_solver(tmp_path, rng)
    driver = SolverDriver(solver).build()
    first_raw = {k: np.asarray(v).copy()
                 for k, v in driver._first_batch_raw.items()}
    it = driver._data_iter(driver.train_source,
                           first=driver._first_batch_raw)
    b0 = next(it)
    for k in first_raw:
        np.testing.assert_array_equal(np.asarray(b0[k]), first_raw[k])
    b1 = next(it)
    assert any(not np.array_equal(np.asarray(b1[k]), first_raw[k])
               for k in first_raw)
    assert len(driver._prefetchers) == 1
    for pf in driver._prefetchers:
        pf.close()
    driver._prefetchers.clear()

    driver2 = SolverDriver(solver).build()
    driver2.train()
    assert driver2._prefetchers == []   # closed and cleared on return


def test_driver_vvmodel_finetune_copies_and_shape_checks(tmp_path, rng):
    """train(weights_path=.vvmodel) must not mutate driver.params (a
    second train() starts from the original init) and must reject stale
    shapes with a named-layer error."""
    import pytest
    from videovector_tpu.solver.checkpoint import snapshot
    solver = _mini_solver(tmp_path, rng)
    driver = SolverDriver(solver).build()
    init_fc7 = np.asarray(driver.params["fc7"]["w"]).copy()
    good = {"fc7": {"w": rng.randn(*init_fc7.shape).astype(np.float32)}}
    mp, _ = snapshot(str(tmp_path / "ft"), 0, good)
    driver.train(weights_path=mp, max_iter=2)
    np.testing.assert_array_equal(np.asarray(driver.params["fc7"]["w"]),
                                  init_fc7)   # untouched
    bad = {"fc7": {"w": rng.randn(3, 3).astype(np.float32)}}
    mp2, _ = snapshot(str(tmp_path / "bad"), 0, bad)
    driver2 = SolverDriver(solver).build()
    with pytest.raises(ValueError, match="fc7"):
        driver2.train(weights_path=mp2, max_iter=2)
