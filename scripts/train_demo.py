"""End-to-end training demo at reference scale on real hardware.

Generates the synthetic videovec dataset (fc7-like 4096-d features), builds
the flagship prototxt with the shipped generator, trains with the reference
solver schedule for --iters iterations, and reports the test-phase retrieval
mAP trajectory — the full `train_mednet_embedding.sh` workflow compressed
into one script.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "videovec_embedding"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--videos", type=int, default=200)
    p.add_argument("--workdir", default="/tmp/vvtpu_demo")
    p.add_argument("--device_negatives", action="store_true",
                   help="on-device negative sampler (data-layer "
                        "device_negatives extension): host ships only "
                        "(B, C, D) target+context — (C+N)/C H2D cut")
    p.add_argument("--dropout_prng", default="",
                   choices=["", "threefry", "rbg"],
                   help="solver dropout_prng extension (rbg = the TPU "
                        "throughput mode, PERF.md round 5)")
    p.add_argument("--snapshot", type=int, default=0,
                   help="snapshot interval (solver `snapshot`)")
    p.add_argument("--snapshot_format", default="",
                   choices=["", "vv", "caffe", "orbax"],
                   help="solver snapshot_format (caffe also writes the "
                        "reference .caffemodel/.solverstate pair)")
    p.add_argument("--resume", default="",
                   help="resume from a snapshot state file")
    p.add_argument("--test_interval", type=int, default=250)
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend (env var alone does "
                        "not stick in this harness — see CLAUDE.md)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    from generate_net import emit
    from videovector_tpu.config.textformat import Message
    from videovector_tpu.data.records import RecordWriter
    from videovector_tpu.data.shots import ShotDataset, ShotVideo
    from videovector_tpu.data.wire import Datum, TestVideoShotWindows
    from videovector_tpu.solver.driver import SolverDriver

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(0)

    train_path = os.path.join(args.workdir, "train.vvr")
    test_path = os.path.join(args.workdir, "test.vvr")
    if not os.path.exists(train_path):
        videos = []
        # hard data: shared global structure dominates; video identity is a
        # weak direction + heavy noise, so raw-feature retrieval is mediocre
        # and the ranking loss has something to learn
        basis = rng.randn(24, args.dim).astype(np.float32)
        for v in range(args.videos):
            vdir = rng.randn(args.dim).astype(np.float32) * 0.35
            coef = rng.rand(12, 24).astype(np.float32)
            feats = np.abs(coef @ basis + vdir
                           + 0.7 * rng.randn(12, args.dim).astype(np.float32))
            videos.append(ShotVideo(v + 1, np.arange(12, dtype=np.int32),
                                    feats))
        ShotDataset(videos).to_records(train_path)
        with RecordWriter(test_path) as w:
            for i in range(673):
                video = videos[i % len(videos)]
                ids = rng.choice(12, size=4, replace=False)
                tw = TestVideoShotWindows(
                    video_id=int(video.video_id),
                    context_shot_words=[Datum(float_data=video.features[j])
                                        for j in ids])
                w.append(str(i), tw.encode())
        print(f"dataset written to {args.workdir}")

    net_path = os.path.join(args.workdir, "net.prototxt")
    with open(net_path, "w") as f:
        buffer_size = min(5000, args.videos * 12 // 2)
        # scale-aware hyperparams (the reference values assume 4096-d fc7
        # features; see PERF.md demo notes)
        weight_std = 0.001 if args.dim >= 2048 else 0.05
        f.write(emit(train_path, test_path, batch=128, test_batch=673,
                     negatives=10, embed=args.dim, margin=1.0,
                     weight_std=weight_std, dropout=0.5,
                     buffer_size=buffer_size,
                     device_negatives=args.device_negatives))

    solver = Message()
    solver.add("net", net_path)
    solver.add("base_lr", 0.003)
    solver.add("momentum", 0.9)
    solver.add("weight_decay", 0.0005)
    solver.add("lr_policy", "inv")
    solver.add("gamma", 0.001)
    solver.add("power", 0.75)
    solver.add("display", 100)
    solver.add("max_iter", args.iters)
    solver.add("test_interval", args.test_interval)
    solver.add("test_iter", 1)
    solver.add("snapshot_prefix", os.path.join(args.workdir, "demo"))
    if args.snapshot:
        solver.add("snapshot", args.snapshot)
    if args.snapshot_format:
        solver.add("snapshot_format", args.snapshot_format)
    if args.dropout_prng:
        solver.add("dropout_prng", args.dropout_prng)

    driver = SolverDriver(solver).build()
    if args.device_negatives:
        # report from the batch the driver already pulled (and re-feeds as
        # iteration 0) — pulling a fresh one here would silently drop a
        # batch from the training stream and shift the trajectory
        b = driver._first_batch_raw[driver.device_negatives["top"]]
        n_negs = driver.device_negatives["num_negatives"]
        full = b.shape[0] * (b.shape[1] + n_negs) * np.prod(b.shape[2:]) * 4
        print(f"device_negatives: host batch {b.shape} = "
              f"{b.nbytes / 1e6:.1f} MB/step H2D "
              f"(host path would ship {full / 1e6:.1f} MB/step)")
    res = driver.train(resume_state_path=args.resume or None)
    print("\n=== retrieval trajectory (test phase, 673-window gallery) ===")
    for it, metrics in res.test_history:
        print(f"iter {it:5d}: mAP={metrics.get('test_map', float('nan')):.4f} "
              f"hit@1={metrics.get('test_hit1', float('nan')):.4f} "
              f"hit@5={metrics.get('test_hit5', float('nan')):.4f}")
    losses = [m[1]["loss"] for m in res.metrics_history]
    print(f"loss: first={losses[0]:.4f} last={losses[-1]:.4f}")


if __name__ == "__main__":
    main()
