"""End-to-end trainer tests: the flagship embedding workload learns on
synthetic structured data; snapshot/resume reproduces the exact trajectory."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.data.shots import (
    SampledShotsConfig, ShotDataset, ShotVideo, VideoSampledShotsSource,
)
from videovector_tpu.data.weights import (
    NetWeights, load_into_params, params_to_weights,
)
from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.solver import SolverConfig
from videovector_tpu.solver.checkpoint import load_model, restore, snapshot
from videovector_tpu.solver.train import train


def _structured_dataset(rng, num_videos=20, shots=8, dim=32):
    """Videos whose shots cluster around a per-video direction — temporal
    context is informative, so the ranking loss should actually learn."""
    videos = []
    for v in range(num_videos):
        center = rng.randn(dim).astype(np.float32) * 2
        feats = center + 0.3 * rng.randn(shots, dim).astype(np.float32)
        videos.append(ShotVideo(v + 1, np.arange(shots, dtype=np.int32), feats))
    return ShotDataset(videos)


def test_train_flagship_on_synthetic(rng, tmp_path):
    ds = _structured_dataset(rng)
    data_cfg = SampledShotsConfig(
        batch_size=16, num_negative_samples=5, max_buffer_size=40,
        negative_swap_percentage=50, max_same_video_negs=2,
        context_type="WINDOW", context_size=5)
    src = VideoSampledShotsSource(ds, data_cfg)

    mcfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                                num_negatives=5, margin=1.0,
                                dropout_rate=0.0, compute_dtype="float32")
    model = VideoEmbeddingModel(mcfg)
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p, batch, key):
        return model.loss(p, {"data": jnp.asarray(batch["data"])},
                          rng=key, train=True)

    cfg = SolverConfig(base_lr=0.05, momentum=0.9, weight_decay=1e-4,
                       max_iter=60, display=20,
                       snapshot_prefix=str(tmp_path / "snap"))
    res = train(loss_fn, params, iter(src), cfg)
    first_loss = res.metrics_history[0][1]["loss"]
    last_loss = res.metrics_history[-1][1]["loss"]
    assert last_loss < first_loss * 0.8
    # snapshot_after_train wrote files
    assert glob.glob(str(tmp_path / "snap_iter_60.vvmodel"))


def test_snapshot_resume_exact(rng, tmp_path):
    """Resume from a snapshot reproduces the same params as uninterrupted
    training (iter + history restored, ref Solver::Restore)."""
    ds = _structured_dataset(rng, num_videos=6)
    data_cfg = SampledShotsConfig(batch_size=8, context_type="WINDOW",
                                  context_size=5, seed=7)
    mcfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                                num_negatives=0, margin=1.0, dropout_rate=0.0,
                                compute_dtype="float32")
    # num_negatives=0 won't work for the margin loss; use 2 reservoir negs
    data_cfg.num_negative_samples = 2
    data_cfg.max_buffer_size = 16
    data_cfg.negative_swap_percentage = 0
    mcfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                                num_negatives=2, margin=1.0, dropout_rate=0.0,
                                compute_dtype="float32")
    model = VideoEmbeddingModel(mcfg)
    params0 = model.init(jax.random.PRNGKey(1))

    def loss_fn(p, batch, key):
        return model.loss(p, {"data": jnp.asarray(batch["data"])},
                          rng=key, train=True)

    def batches():
        # deterministic shared batch stream
        src = VideoSampledShotsSource(ds, data_cfg)
        return iter(src)

    # uninterrupted: 10 iters
    cfg_full = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=10)
    res_full = train(loss_fn, params0, batches(), cfg_full)

    # interrupted: 5 iters, snapshot, resume to 10 on the same stream
    cfg_half = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=5,
                            snapshot_prefix=str(tmp_path / "s"))
    stream = batches()
    res_half = train(loss_fn, params0, stream, cfg_half)
    mp, sp = snapshot(str(tmp_path / "s"), 5,
                      jax.device_get(res_half.params),
                      jax.device_get(res_half.state))
    cfg_resume = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=10)
    res_resumed = train(loss_fn, params0, stream, cfg_resume,
                        resume_state_path=sp)

    np.testing.assert_allclose(
        np.asarray(res_resumed.params["tower"]["w"]),
        np.asarray(res_full.params["tower"]["w"]), atol=1e-5)


def test_eval_interval(rng):
    ds = _structured_dataset(rng, num_videos=6)
    data_cfg = SampledShotsConfig(batch_size=8, num_negative_samples=2,
                                  max_buffer_size=16,
                                  negative_swap_percentage=10,
                                  context_type="WINDOW", context_size=5)
    src = VideoSampledShotsSource(ds, data_cfg)
    mcfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                                num_negatives=2, dropout_rate=0.0,
                                compute_dtype="float32")
    model = VideoEmbeddingModel(mcfg)
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p, batch, key):
        return model.loss(p, {"data": jnp.asarray(batch["data"])},
                          rng=key, train=True)

    def eval_fn(p, batch):
        loss, aux = model.loss(p, {"data": jnp.asarray(batch["data"])},
                               train=False)
        return {"eval_loss": loss, "violations": aux["violations"]}

    cfg = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=6,
                       test_interval=3, test_iter=(2,))
    res = train(loss_fn, params, iter(src), cfg,
                eval_fn=eval_fn, test_data=iter(src))
    # tests at iter 0, 3, and final
    assert [t[0] for t in res.test_history] == [0, 3, 6]
    assert "eval_loss" in res.test_history[0][1]


def test_iter_size_accumulation_matches_plain(rng):
    """iter_size=k over k identical batches == one step on that batch."""
    X = rng.randn(8, 3).astype(np.float32)
    y = X @ rng.randn(3).astype(np.float32)

    def loss_fn(p, batch, key):
        pred = batch["x"] @ p["w"]
        return 0.5 * jnp.mean((pred - batch["y"]) ** 2), {}

    def data():
        while True:
            yield {"x": jnp.asarray(X), "y": jnp.asarray(y)}

    from videovector_tpu.solver import SolverConfig
    params = {"w": jnp.zeros(3)}
    r1 = train(loss_fn, params, data(), SolverConfig(base_lr=0.3, max_iter=20))
    r2 = train(loss_fn, params, data(),
               SolverConfig(base_lr=0.3, max_iter=20, iter_size=2))
    np.testing.assert_allclose(np.asarray(r1.params["w"]),
                               np.asarray(r2.params["w"]), atol=1e-5)


def test_caffemodel_weight_io_roundtrip(rng, tmp_path):
    """params → .caffemodel bytes → params (name-matched, transposed)."""
    params = {"fc7": {"w": jnp.asarray(rng.randn(6, 4).astype(np.float32)),
                      "b": jnp.asarray(rng.randn(4).astype(np.float32))},
              "emb": {"table": jnp.asarray(rng.randn(5, 3).astype(np.float32))}}
    w = params_to_weights(params, "net")
    path = str(tmp_path / "net.caffemodel")
    w.save(path)
    w2 = NetWeights.load(path)
    zeros = jax.tree.map(lambda a: jnp.zeros_like(a), params)
    loaded = load_into_params(w2, zeros)
    np.testing.assert_allclose(np.asarray(loaded["fc7"]["w"]),
                               np.asarray(params["fc7"]["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["fc7"]["b"]),
                               np.asarray(params["fc7"]["b"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["emb"]["table"]),
                               np.asarray(params["emb"]["table"]), rtol=1e-6)


def test_lstm_caffemodel_roundtrip(rng, tmp_path):
    """LSTM blobs round-trip through the Caffe (1,4,H,I) layout."""
    from videovector_tpu.data.weights import (
        NetWeights, load_into_params, params_to_weights,
    )
    from videovector_tpu.ops.recurrent import init_lstm_params
    params = {"lstm1": jax.tree.map(
        jnp.asarray, init_lstm_params(jax.random.PRNGKey(3), 5, 4))}
    path = str(tmp_path / "lstm.caffemodel")
    params_to_weights(params).save(path)
    zeros = jax.tree.map(jnp.zeros_like, params)
    loaded = load_into_params(NetWeights.load(path), zeros)
    for k in ("w_i", "w_h", "b"):
        np.testing.assert_allclose(np.asarray(loaded["lstm1"][k]),
                                   np.asarray(params["lstm1"][k]), rtol=1e-6,
                                   err_msg=k)


def test_checkpoint_roundtrip(rng, tmp_path):
    params = {"a": {"w": jnp.asarray(rng.randn(3, 2).astype(np.float32))}}
    state = {"iter": jnp.int32(17),
             "history": {"a": {"w": jnp.ones((3, 2), jnp.float32)}}}
    mp, sp = snapshot(str(tmp_path / "ck"), 17, params, state)
    p2 = load_model(mp)
    np.testing.assert_allclose(np.asarray(p2["a"]["w"]),
                               np.asarray(params["a"]["w"]))
    p3, s3 = restore(sp)
    assert int(s3["iter"]) == 17
    np.testing.assert_allclose(np.asarray(s3["history"]["a"]["w"]), 1.0)


def test_async_snapshotter_atomic_and_error_surfacing(tmp_path):
    """Background snapshot writes: durable after wait(), atomic (no .tmp
    residue), and writer errors surface at the next wait()."""
    import numpy as np
    from videovector_tpu.solver.checkpoint import (
        AsyncSnapshotter, load_model, restore,
    )
    snap = AsyncSnapshotter()
    params = {"fc": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    state = {"iter": 7, "history": {"fc": {"w": np.zeros((2, 3), np.float32)}}}
    snap.submit(str(tmp_path / "s"), 7, params, state)
    snap.wait()
    assert not list(tmp_path.glob("*.tmp"))
    loaded = load_model(str(tmp_path / "s_iter_7.vvmodel"))
    np.testing.assert_array_equal(loaded["fc"]["w"], params["fc"]["w"])
    rparams, rstate = restore(str(tmp_path / "s_iter_7.vvstate"))
    assert int(rstate["iter"]) == 7
    np.testing.assert_array_equal(rparams["fc"]["w"], params["fc"]["w"])

    # unwritable prefix -> the submit thread fails; wait() re-raises
    snap.submit(str(tmp_path / "s_iter_7.vvmodel" / "bad"), 1, params)
    import pytest
    with pytest.raises(Exception):
        snap.wait()


def test_train_sink_fn_fires_every_iteration():
    """TRAIN-phase host sinks: the reference's sink layers write on EVERY
    Forward, train included (write_to_file_layer.cpp:36-64). train() must
    feed "__sinks__" aux entries to train_sink_fn each iteration — and
    under iter_size accumulation the surviving write is the LAST
    sub-batch's (truncate-per-Forward ofstream semantics)."""
    params = {"w": jnp.zeros((3,))}

    def loss_fn(p, batch, key):
        x = batch["x"]
        loss = jnp.sum((p["w"] - jnp.mean(x)) ** 2)
        return loss, {"__sinks__": {"xblob": x}}

    def data():
        i = 0
        while True:
            yield {"x": np.full((4, 3), float(i), np.float32)}
            i += 1

    # plain steps: one sink call per iteration, carrying that step's batch
    seen = []
    train(loss_fn, params, data(),
          SolverConfig(base_lr=0.1, max_iter=3),
          train_sink_fn=lambda blobs: seen.append(
              float(np.asarray(blobs["xblob"])[0, 0])))
    assert seen == [0.0, 1.0, 2.0]

    # fused iter_size=2: one call per step, LAST sub-batch's blobs
    seen_fused = []
    train(loss_fn, params, data(),
          SolverConfig(base_lr=0.1, max_iter=2, iter_size=2),
          train_sink_fn=lambda blobs: seen_fused.append(
              float(np.asarray(blobs["xblob"])[0, 0])))
    assert seen_fused == [1.0, 3.0]

    # host-loop accumulation (the stateful-net path): per-Forward calls
    seen_host = []
    train(loss_fn, params, data(),
          SolverConfig(base_lr=0.1, max_iter=2, iter_size=2),
          fused_accum=False,
          train_sink_fn=lambda blobs: seen_host.append(
              float(np.asarray(blobs["xblob"])[0, 0])))
    assert seen_host == [0.0, 1.0, 2.0, 3.0]


def test_prefetcher_stop_iteration_repeats_and_close_unblocks(rng):
    """A finished DevicePrefetcher must raise StopIteration on EVERY
    subsequent next() (blocking forever on the empty queue hangs the
    caller), and close() must terminate the worker of an infinite source."""
    import itertools
    import time
    import pytest
    from videovector_tpu.data.prefetch import DevicePrefetcher

    pf = DevicePrefetcher(iter([{"x": np.ones(2, np.float32)}]), depth=2)
    assert np.asarray(next(pf)["x"]).sum() == 2.0
    with pytest.raises(StopIteration):
        next(pf)
    with pytest.raises(StopIteration):
        next(pf)   # must not block

    def infinite():
        i = 0
        while True:
            yield {"x": np.full(2, float(i), np.float32)}
            i += 1

    pf2 = DevicePrefetcher(infinite(), depth=2)
    next(pf2)
    pf2.close()
    t0 = time.time()
    assert pf2._thread.join(timeout=5.0) is None
    assert not pf2._thread.is_alive(), "worker did not terminate on close"
    assert time.time() - t0 < 5.0
    with pytest.raises(StopIteration):
        next(pf2)


def test_per_element_output_reporting(rng):
    """Every ELEMENT of every output blob is a train metric and a test
    report column (ref solver.cpp:195-217 and :280-315) — non-scalar
    outputs used to be silently dropped by the solver loop. Scalar
    outputs keep their bare names; multi-element ones expand to name[j]."""
    def loss_fn(p, batch, key):
        loss = jnp.sum(p["w"] * batch["x"]) ** 2
        return loss, {"probe_vec": jnp.asarray([1.0, 2.0, 3.0]),
                      "probe_scalar": jnp.float32(7.0)}

    def eval_fn(p, batch):
        return {"evec": jnp.asarray([[0.5, 1.5]]),   # shape (1, 2) blob
                "escalar": jnp.float32(4.0)}

    def data():
        while True:
            yield {"x": jnp.ones((3,), jnp.float32)}

    params = {"w": jnp.asarray([0.1, 0.2, 0.3])}
    cfg = SolverConfig(base_lr=0.01, momentum=0.9, max_iter=2, display=1,
                       test_interval=1, test_iter=(2,))
    res = train(loss_fn, params, data(), cfg,
                eval_fn=eval_fn, test_data=data())
    _, m = res.metrics_history[0]
    assert m["probe_vec[0]"] == 1.0 and m["probe_vec[2]"] == 3.0
    assert m["probe_scalar"] == 7.0
    _, t = res.test_history[0]
    assert t["evec[0]"] == 0.5 and t["evec[1]"] == 1.5
    assert t["escalar"] == 4.0


def test_keyboard_interrupt_writes_emergency_snapshot(rng, tmp_path):
    """Ctrl-C mid-training writes a snapshot at the interrupted iteration
    before re-raising (the reference aborts and loses progress since the
    last scheduled snapshot; solver/train.py's except KeyboardInterrupt).
    Resuming from it continues the run."""
    import pytest

    ds = _structured_dataset(rng, num_videos=6)
    data_cfg = SampledShotsConfig(batch_size=8, context_type="WINDOW",
                                  context_size=5, seed=7,
                                  num_negative_samples=2, max_buffer_size=16,
                                  negative_swap_percentage=0)
    mcfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                                num_negatives=2, margin=1.0, dropout_rate=0.0,
                                compute_dtype="float32")
    model = VideoEmbeddingModel(mcfg)
    params0 = model.init(jax.random.PRNGKey(1))

    def loss_fn(p, batch, key):
        return model.loss(p, {"data": jnp.asarray(batch["data"])},
                          rng=key, train=True)

    def interrupting(src, at):
        for i, b in enumerate(src):
            if i == at:
                raise KeyboardInterrupt
            yield b

    cfg = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=20,
                       snapshot_prefix=str(tmp_path / "emerg"))
    with pytest.raises(KeyboardInterrupt):
        train(loss_fn, params0, interrupting(
            iter(VideoSampledShotsSource(ds, data_cfg)), 4), cfg)
    snaps = glob.glob(str(tmp_path / "emerg_iter_*.vvstate"))
    assert snaps, "no emergency snapshot written"
    # the snapshot resumes (params + momentum + iter load cleanly)
    from videovector_tpu.solver.checkpoint import restore as _restore
    params, state = _restore(snaps[0])
    assert int(state["iter"]) == 4
    cfg2 = SolverConfig(base_lr=0.02, momentum=0.9, max_iter=6)
    res = train(loss_fn, params0,
                iter(VideoSampledShotsSource(ds, data_cfg)), cfg2,
                resume_state_path=snaps[0])
    assert int(res.state["iter"]) == 6  # continued 4 -> 6, not from 0
