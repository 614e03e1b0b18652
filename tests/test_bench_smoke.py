"""bench.py must keep working unattended at round end (the driver runs it
on the real chip): smoke its measure path on CPU at tiny dims so code rot
in the model/solver APIs it calls shows up here, not in the one-shot chip
run."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_measure_path_cpu(monkeypatch):
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    monkeypatch.setattr(bench, "BATCH", 4)
    monkeypatch.setattr(bench, "NUM_NEG", 2)
    monkeypatch.setattr(bench, "FEAT", 8)
    monkeypatch.setattr(bench, "EMBED", 8)
    monkeypatch.setattr(bench, "WARMUP", 1)
    monkeypatch.setattr(bench, "ITERS", 3)
    tput = bench.measure_tpu()   # name is historical; runs on the default
    # backend — CPU under the test suite's conftest
    assert tput > 0
    # and the baseline file it reads parses
    with open(os.path.join(REPO, "BASELINE_MEASURED.json")) as f:
        assert json.load(f).get("cpu_triplets_per_sec", 0) > 0


def test_bench_frontier_path_cpu(monkeypatch):
    """The stderr frontier measurement (B=1024 gm=8 record) must also
    survive API drift — smoke it at tiny dims on CPU."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    monkeypatch.setattr(bench, "NUM_NEG", 2)
    monkeypatch.setattr(bench, "FEAT", 8)
    monkeypatch.setattr(bench, "EMBED", 8)
    ms, tps = bench.measure_frontier(iters=2)
    assert ms > 0 and tps > 0
