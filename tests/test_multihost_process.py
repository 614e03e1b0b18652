"""TRUE multi-process execution (VERDICT r4 item 3 / "missing" #2).

tests/test_multihost.py exercises the assembly math in one process;
here two REAL processes (jax.distributed.initialize, 4 virtual CPU
devices each) train the flagship engine for 3 iterations with
parallel/multihost.py assembling per-process shards —
make_array_from_process_local_data runs with addressable devices a
STRICT SUBSET of the mesh, and gradient psums cross the process boundary
(gloo). The loss trajectory must equal the single-process 8-device run.
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "projects", "videovec_embedding"))
from generate_net import emit  # noqa: E402

from videovector_tpu.config.textformat import Message  # noqa: E402
from videovector_tpu.data.shots import ShotDataset, ShotVideo  # noqa: E402
from videovector_tpu.parallel.multihost_worker import launch_workers  # noqa: E402


def _make_solver(tmp_path) -> str:
    feat = 16
    rng = np.random.RandomState(0)
    videos = []
    for v in range(10):
        center = rng.randn(feat).astype(np.float32)
        feats = np.abs(center + 0.3 * rng.randn(8, feat).astype(np.float32))
        videos.append(ShotVideo(v + 1, np.arange(8, dtype=np.int32), feats))
    src = str(tmp_path / "train.vvr")
    ShotDataset(videos).to_records(src)
    net_path = str(tmp_path / "net.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(src, src, batch=8, test_batch=2, negatives=4,
                     embed=16, buffer_size=16, same_video_negs=1))
    solver = Message()
    solver.add("net", net_path)
    solver.add("base_lr", 0.02)
    solver.add("momentum", 0.9)
    solver.add("max_iter", 3)
    solver.add("random_seed", 7)
    spath = str(tmp_path / "solver.prototxt")
    with open(spath, "w") as f:
        f.write(solver.dumps())
    return spath


def test_two_process_trajectory_equals_single_process(tmp_path):
    spath = _make_solver(tmp_path)
    (single,) = launch_workers(spath, str(tmp_path), 1, 8, cwd=ROOT)
    two = launch_workers(spath, str(tmp_path), 2, 4, cwd=ROOT)
    assert len(single) == 3 and all(np.isfinite(single))
    # every process reports the same replicated metrics
    assert two[0] == two[1]
    # and the 2-process run IS the single-process run (same global batch,
    # same seed, psum across the process boundary)
    np.testing.assert_allclose(two[0], single, rtol=1e-4, atol=1e-5)
