"""Product wiring of the on-device negative sampler (VERDICT r4 item 2).

`device_negatives: true` on VIDEO_SAMPLED_SHOTS_DATA routes
data/device_sampler.py through data_factory + SolverDriver: the host
ships only (B, C, D) target+context, the reservoir lives on device and
rides the train loop's carry channel. These tests pin the wiring —
host-batch shape (the H2D cut), reference-semantics initial fill,
reservoir threading across steps, sampling distribution, validation
errors, and `vvtpu train` reachability.
"""

import os
import sys

import numpy as np
import pytest

from videovector_tpu.config.textformat import Message, parse
from videovector_tpu.data.shots import NegativeReservoir, ShotDataset, ShotVideo
from videovector_tpu.solver.driver import SolverDriver

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "videovec_embedding"))
from generate_net import emit  # noqa: E402

FEAT = 16


def _records(tmp_path, tag="train"):
    path = str(tmp_path / f"{tag}.vvr")
    if not os.path.exists(path):
        rng = np.random.RandomState(0)
        videos = []
        for v in range(10):
            center = rng.randn(FEAT).astype(np.float32)
            feats = np.abs(center
                           + 0.3 * rng.randn(8, FEAT).astype(np.float32))
            videos.append(ShotVideo(v + 1, np.arange(8, dtype=np.int32),
                                    feats))
        ShotDataset(videos).to_records(path)
    return path


def _solver(tmp_path, **emit_kw):
    src = _records(tmp_path)
    net_path = str(tmp_path / "net.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(src, src, batch=4, test_batch=2, negatives=4,
                     embed=8, buffer_size=16, device_negatives=True,
                     **emit_kw))
    solver = Message()
    solver.add("net", net_path)
    solver.add("base_lr", 0.02)
    solver.add("momentum", 0.9)
    solver.add("max_iter", 3)
    solver.add("display", 1)
    solver.add("random_seed", 7)
    return solver


def test_trains_and_threads_reservoir(tmp_path):
    driver = SolverDriver(_solver(tmp_path)).build()
    dn = driver.device_negatives
    assert dn is not None and dn["num_negatives"] == 4
    buf0 = dn["buffer"].copy()
    assert buf0.shape == (16, FEAT)
    res = driver.train()
    losses = [m[1]["loss"] for m in res.metrics_history]
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
    # the reservoir threaded through the carry channel and was updated
    # on device (swap 50%, 3 steps x 4 items x 5 offers — P[no swap] ~ 0)
    final = np.asarray(res.final_carry)
    assert final.shape == buf0.shape
    assert not np.array_equal(final, buf0)


def test_host_batch_ships_only_contexts(tmp_path):
    """The H2D cut: the host stream carries (B, C, D), not (B, C+N, D)."""
    driver = SolverDriver(_solver(tmp_path)).build()
    b = driver.train_source.next_batch()
    assert b["data"].shape == (4, 5, FEAT)  # context_size=5, negatives cut
    # while the NET was initialized at the full role count
    host_bytes = b["data"].nbytes
    full_bytes = 4 * 9 * FEAT * 4  # (B, C+N, D) f32
    assert host_bytes == full_bytes * 5 // 9


def test_seed_buffer_is_the_reference_initial_fill(tmp_path):
    """data_factory seeds the device buffer with NegativeReservoir.fill
    (one random shot per video, key dedup — the reference's initial fill,
    ref:video_sampled_shots_data_layer.cpp:245-341), bit-for-bit."""
    driver = SolverDriver(_solver(tmp_path)).build(seed=7)
    ds = ShotDataset.from_records(_records(tmp_path))
    want = NegativeReservoir(16, FEAT, 50, np.random.RandomState(7))
    want.fill(ds)
    np.testing.assert_array_equal(driver.device_negatives["buffer"],
                                  want.buffer)


def test_sampling_distribution_uniform_over_reservoir(tmp_path):
    """Negatives drawn by the device path are uniform over reservoir
    slots, matching the host sampler's Fisher-Yates top-n (statistical
    equivalence — the distribution, not the stream)."""
    import jax
    from videovector_tpu.data.device_sampler import (
        DeviceReservoir, sample_negatives,
    )
    driver = SolverDriver(_solver(tmp_path)).build(seed=7)
    buf = driver.device_negatives["buffer"]
    # identity-coded rows → recover the sampled slot from feature values
    coded = np.zeros_like(buf)
    coded[:, 0] = np.arange(len(buf), dtype=np.float32)
    res = DeviceReservoir(jax.numpy.asarray(coded), 0.0)
    draws = 600
    negs = np.asarray(sample_negatives(
        res, jax.random.PRNGKey(0), draws, 4))[:, :, 0].reshape(-1)
    dev_freq = np.bincount(negs.astype(int), minlength=16) / negs.size

    host = NegativeReservoir(16, FEAT, 0, np.random.RandomState(3))
    host.buffer = coded.copy()
    host_draws = np.concatenate([host.sample(4)[:, 0] for _ in range(draws)])
    host_freq = np.bincount(host_draws.astype(int),
                            minlength=16) / host_draws.size

    uniform = 1.0 / 16
    assert np.abs(dev_freq - uniform).max() < 0.02
    assert np.abs(host_freq - uniform).max() < 0.02
    assert np.abs(dev_freq - host_freq).max() < 0.03
    # within an item: distinct slots (replace=False), like the host's
    # Fisher-Yates top-n per item
    per_item = np.asarray(sample_negatives(
        res, jax.random.PRNGKey(1), 50, 4))[:, :, 0]
    for row in per_item:
        assert len(set(row.tolist())) == 4


def test_validation_errors(tmp_path):
    src = _records(tmp_path)
    # same-video hard negatives are host-path only
    bad = parse(f"""
layers {{ name: "d" type: VIDEO_SAMPLED_SHOTS_DATA top: "data"
  video_sampled_shots_data_param {{
    source: "{src}" batch_size: 4 num_negative_samples: 4
    max_buffer_size: 16 negative_swap_percentage: 50
    max_same_video_negs: 2 context_type: WINDOW context_size: 5
    device_negatives: true }} }}
""").get_list("layers")[0]
    from videovector_tpu.graph.data_factory import make_data_source
    with pytest.raises(ValueError, match="same-video"):
        make_data_source(bad, phase="TRAIN")

    nobuf = parse(f"""
layers {{ name: "d" type: VIDEO_SAMPLED_SHOTS_DATA top: "data"
  video_sampled_shots_data_param {{
    source: "{src}" batch_size: 4 num_negative_samples: 4
    context_type: WINDOW context_size: 5 device_negatives: true }} }}
""").get_list("layers")[0]
    with pytest.raises(ValueError, match="max_buffer_size"):
        make_data_source(nobuf, phase="TRAIN")

    # role_major_data is a different relayout of the same feed — reject
    solver = _solver(tmp_path)
    solver.add("role_major_data", True)
    with pytest.raises(ValueError, match="role_major_data"):
        SolverDriver(solver).build()


def test_device_negatives_rejected_in_test_net(tmp_path):
    """A TEST net declaring device_negatives fails at build with a clear
    message (the reservoir rides the TRAIN carry channel), not an opaque
    shape error at eval time."""
    src = _records(tmp_path)
    net = parse(f"""
layers {{ name: "d" type: VIDEO_SAMPLED_SHOTS_DATA top: "data"
  video_sampled_shots_data_param {{
    source: "{src}" batch_size: 4 num_negative_samples: 4
    max_buffer_size: 16 negative_swap_percentage: 50
    context_type: WINDOW context_size: 5 device_negatives: true }} }}
layers {{ name: "sil" type: SILENCE bottom: "data" }}
""")
    solver = Message()
    solver.add("net_param", net)
    solver.add("base_lr", 0.01)
    solver.add("max_iter", 1)
    solver.add("test_iter", 1)
    solver.add("test_interval", 1)
    with pytest.raises(ValueError, match="TRAIN-net feature"):
        SolverDriver(solver).build()


def test_reachable_from_vvtpu_train(tmp_path):
    """The CLI surface: `vvtpu train --solver=...` runs the device
    sampler end to end (the capability is a product feature, not a
    library)."""
    from videovector_tpu.tools.cli import main as cli_main
    solver = _solver(tmp_path)
    spath = str(tmp_path / "solver.prototxt")
    with open(spath, "w") as f:
        f.write(solver.dumps())
    rc = cli_main(["train", "--solver", spath])
    assert rc == 0


def test_mesh_trajectory_matches_single_device(tmp_path):
    """device_negatives composed with DP: the GSPMD mesh run reproduces
    the single-device loss trajectory (same seed → same host stream,
    same device keys)."""
    import jax
    from videovector_tpu.parallel import make_mesh
    solver = _solver(tmp_path)
    single = SolverDriver(solver).build().train()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    sharded = SolverDriver(solver).build().train(mesh=mesh)
    ls = [m[1]["loss"] for m in single.metrics_history]
    lm = [m[1]["loss"] for m in sharded.metrics_history]
    assert np.allclose(ls, lm, rtol=1e-4, atol=1e-5)
