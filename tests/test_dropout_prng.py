"""Solver `dropout_prng` extension: scoped rbg keys for the stochastic
layers on the PRODUCT path (`vvtpu train` / SolverDriver).

VERDICT r4 item 1: the engine's certified chip numbers were measured with
a process-wide jax_default_prng_impl flip the product surface didn't
have. The fix threads a TYPED key (jax.random.key(impl="rbg")) through
train() exactly the way bench.py does for the native model — scoped to
the per-iteration stochastic-layer stream, never jax.config. These tests
pin the scope: rbg-vs-threefry changes ONLY the dropout masks (identical
trajectories when the net has no live dropout), and the global PRNG
config is untouched (the conftest config guard fails any leak).
"""

import os
import sys

import numpy as np
import pytest

from videovector_tpu.config.textformat import Message
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.solver.driver import SolverDriver
from videovector_tpu.solver.solvers import SolverConfig

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "videovec_embedding"))
from generate_net import emit  # noqa: E402


def _train_losses(tmp_path, dropout: float, prng: str, tag: str):
    rng = np.random.RandomState(0)
    feat = 16
    videos = []
    for v in range(8):
        center = rng.randn(feat).astype(np.float32)
        feats = np.abs(center + 0.3 * rng.randn(8, feat).astype(np.float32))
        videos.append(ShotVideo(v + 1, np.arange(8, dtype=np.int32), feats))
    src = str(tmp_path / f"train_{tag}.vvr")
    if not os.path.exists(src):
        ShotDataset(videos).to_records(src)
    net_path = str(tmp_path / f"net_{tag}.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(src, src, batch=4, test_batch=2, negatives=4,
                     embed=8, buffer_size=16, same_video_negs=1,
                     dropout=dropout))
    solver = Message()
    solver.add("net", net_path)
    solver.add("base_lr", 0.02)
    solver.add("momentum", 0.9)
    solver.add("max_iter", 3)
    solver.add("display", 1)
    solver.add("random_seed", 7)
    if prng != "threefry":
        solver.add("dropout_prng", prng)
    res = SolverDriver(solver).build().train()
    return [m[1]["loss"] for m in res.metrics_history]


def test_rbg_changes_only_dropout_masks(tmp_path):
    # with live dropout the mask stream (and hence the trajectory) differs
    with_t = _train_losses(tmp_path, 0.9, "threefry", "d9")
    with_r = _train_losses(tmp_path, 0.9, "rbg", "d9")
    assert len(with_t) == len(with_r) == 3
    assert any(a != b for a, b in zip(with_t, with_r)), (
        "rbg dropout produced the identical trajectory — the key impl "
        "never reached the dropout masks")

    # without dropout the trajectory must be BIT-identical: the key impl
    # touches nothing else (samplers are host-side numpy, fillers use
    # their own PRNGKey(seed), optimizer math is key-free)
    no_t = _train_losses(tmp_path, 0.0, "threefry", "d0")
    no_r = _train_losses(tmp_path, 0.0, "rbg", "d0")
    assert no_t == no_r


def test_rbg_reproducible_same_seed(tmp_path):
    a = _train_losses(tmp_path, 0.9, "rbg", "rep")
    b = _train_losses(tmp_path, 0.9, "rbg", "rep2")
    assert a == b


def test_config_field_parses_and_validates():
    msg = Message()
    msg.add("base_lr", 0.1)
    msg.add("dropout_prng", "rbg")
    cfg = SolverConfig.from_message(msg)
    assert cfg.dropout_prng == "rbg"
    assert SolverConfig().dropout_prng == "threefry"  # reference default
    with pytest.raises(ValueError, match="dropout_prng"):
        SolverConfig(dropout_prng="rc4")
