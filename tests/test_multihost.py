"""Multi-host DP input pipeline on the 8-device virtual mesh: global batches
assembled from per-host / per-device shards must train identically to the
single-host shard_batch path (VERDICT r1 item 10)."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.parallel import (
    global_batch_from_device_shards, global_batch_from_local,
    host_shard_range, make_mesh, make_train_step,
)
from videovector_tpu.parallel.train import shard_batch, shard_params
from videovector_tpu.solver import SolverConfig, init_solver_state


def _setup(rng, model_axis=2):
    mesh = make_mesh(data=8 // model_axis, model=model_axis)
    cfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                               num_negatives=6, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh,
                          model_axis=model_axis > 1)
    scfg = SolverConfig(base_lr=0.01, momentum=0.9)
    state = init_solver_state(scfg, params)
    step = make_train_step(lambda p, b, r: model.loss(p, b, rng=r, train=True),
                           scfg, mesh)
    batch_np = rng.randn(8, cfg.num_roles, cfg.feature_dim).astype(np.float32)
    return mesh, params, state, step, batch_np


def test_device_shard_assembly_matches_global(rng):
    """Assembling the batch from per-device shards (the multi-host primitive)
    gives bit-identical training to device_put of the global array."""
    mesh, params, state, step, batch_np = _setup(rng)

    b_global = shard_batch({"data": jnp.asarray(batch_np)}, mesh)
    b_shards = global_batch_from_device_shards({"data": batch_np}, mesh)

    assert b_shards["data"].shape == b_global["data"].shape
    assert b_shards["data"].sharding == b_global["data"].sharding
    np.testing.assert_array_equal(np.asarray(b_shards["data"]),
                                  np.asarray(b_global["data"]))

    p1, s1, m1 = step(params, state, b_global, jax.random.PRNGKey(1))
    # rebuild (donated buffers)
    mesh, params, state, step, _ = _setup(rng := np.random.RandomState(1701))
    b_shards = global_batch_from_device_shards({"data": batch_np}, mesh)
    p2, s2, m2 = step(params, state, b_shards, jax.random.PRNGKey(1))
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(np.asarray(p1["tower"]["w"]),
                                  np.asarray(p2["tower"]["w"]))


def test_process_local_assembly_single_host(rng):
    """make_array_from_process_local_data path: on one host the local slice
    is the whole batch; result matches shard_batch exactly."""
    mesh, params, state, step, batch_np = _setup(rng)
    lo, hi = host_shard_range(8, mesh)
    assert (lo, hi) == (0, 8)  # single process owns everything
    b = global_batch_from_local({"data": batch_np[lo:hi]}, mesh)
    b_ref = shard_batch({"data": jnp.asarray(batch_np)}, mesh)
    assert b["data"].sharding == b_ref["data"].sharding
    np.testing.assert_array_equal(np.asarray(b["data"]),
                                  np.asarray(b_ref["data"]))
    p, s, m = step(params, state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_host_sharded_source_trains(rng):
    """HostShardedSource wraps a host batch source; a few steps run and the
    loss decreases (full pipeline shape: source → per-host slice → global
    assembly → sharded step)."""
    mesh, params, state, step, batch_np = _setup(rng)

    class FakeSource:
        def __init__(self):
            self.rng = np.random.RandomState(0)

        def next_batch(self):
            return {"data": batch_np + 0.01 * self.rng.randn(
                *batch_np.shape).astype(np.float32)}

    from videovector_tpu.parallel import HostShardedSource
    src = HostShardedSource(FakeSource(), mesh, simulate=True)
    losses = []
    for i, b in zip(range(8), src):
        params, state, m = step(params, state, b, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_device_shard_divisibility(rng):
    mesh, *_ = _setup(rng)
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        # 7 rows over a 4-way data axis
        global_batch_from_device_shards(
            {"data": np.zeros((7, 15, 32), np.float32)}, mesh)


def test_host_sharded_source_honors_batch_axes(rng):
    """Time-major sources declare batch axis 1: the simulate cut and the
    global assembly must shard THAT axis, not slice trajectories over
    time."""
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.parallel.multihost import HostShardedSource

    class TimeMajor:
        def batch_axes(self):
            return {"obs": 1, "ids": 0}

        def next_batch(self):
            # (T=3, B=8, D=2): batch rows identifiable by their index
            obs = np.broadcast_to(np.arange(8, dtype=np.float32)[None, :,
                                                                 None],
                                  (3, 8, 2)).copy()
            return {"obs": obs, "ids": np.arange(8, dtype=np.float32)}

    mesh = make_mesh(data=8, model=1)
    src = HostShardedSource(TimeMajor(), mesh, simulate=True)
    assert src.batch_axes() == {"obs": 1, "ids": 0}
    b = src.next_batch()
    assert b["obs"].shape == (3, 8, 2)   # global shape intact
    # each data-axis device holds ONE batch row across all T, not a
    # time-slice of every row
    shard = b["obs"].addressable_shards[0]
    assert shard.data.shape == (3, 1, 2)
    np.testing.assert_allclose(np.asarray(b["obs"])[0, :, 0],
                               np.arange(8, dtype=np.float32))
