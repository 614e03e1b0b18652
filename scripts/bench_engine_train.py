"""Engine-path training throughput at reference dims on the chip.

Times EXACTLY the program `vvtpu train` runs — the prototxt graph engine's
loss (generated flagship net, ref:projects/videovec_embedding/
mednet_embedding_train.prototxt) through solver.train.build_fused_step
(the fused iter_size/grad_microbatch schedule) — and the hand model
through the same harness, at the same batch, for the engine-vs-native
comparison VERDICT r3 item 1 asks for.

Methodology = bench.py: device-resident batch (tunnel H2D is a harness
artifact), ITERS steps inside ONE XLA program (outer lax.scan over the
fused step), scalar fetch to fence, best-of-3.

Usage (on the axon chip):
  python scripts/bench_engine_train.py --batches 128,512,1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "projects", "videovec_embedding"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="128,512,1024")
    p.add_argument("--feat", type=int, default=4096)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--dtype", default="bfloat16",
                   help="engine/model compute dtype (bfloat16 | f32)")
    p.add_argument("--prng", default="rbg", choices=["rbg", "threefry"],
                   help="PRNG impl for the per-step keys (the dropout-mask "
                        "stream) — a TYPED key, matching what `vvtpu "
                        "train` builds under the solver dropout_prng "
                        "extension; NEVER a process-wide jax.config flip "
                        "(the round-4 measurement bug: certified numbers "
                        "came from a global flip the product didn't have)")
    p.add_argument("--workdir", default="/tmp/vvtpu_engine_bench")
    p.add_argument("--skip-native", action="store_true")
    p.add_argument("--skip-gm1", action="store_true",
                   help="skip the unmicrobatched (gm=1) measurement — at "
                        "frontier batches (B>=2048) the full-batch "
                        "program's activations are GB-scale for a number "
                        "the gm ladder already showed is worse")
    p.add_argument("--buffer-size", type=int, default=480,
                   help="data-layer reservoir size in the emitted net "
                        "(must be >= batch; only the net BUILD touches "
                        "it — the measurement feeds a device batch)")
    p.add_argument("--role-major", action="store_true", dest="role_major",
                   help="also measure the engine with a role-major "
                        "(R, B, D, 1) device batch (no in-step relayout)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    key_impl = {"rbg": "rbg", "threefry": "threefry2x32"}[args.prng]
    import jax.numpy as jnp
    import numpy as np
    from generate_net import emit
    from videovector_tpu.config.textformat import Message
    from videovector_tpu.data.shots import ShotDataset, ShotVideo
    from videovector_tpu.solver.driver import SolverDriver
    from videovector_tpu.solver.train import auto_grad_microbatch, \
        build_fused_step

    cd = None if args.dtype in ("f32", "float32") else args.dtype
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(0)
    # the negative reservoir needs >= max batch DISTINCT shots (the
    # reference CHECK-fails otherwise, video_shot_window_data_layer.cpp:338)
    max_batch = max(int(b) for b in args.batches.split(","))
    n_videos = max(40, -(-max_batch // 12) + 8)
    train_path = os.path.join(args.workdir,
                              f"train_{args.feat}_{n_videos}.vvr")
    if not os.path.exists(train_path):
        videos = [ShotVideo(v + 1, np.arange(12, dtype=np.int32),
                            np.abs(rng.randn(12, args.feat))
                            .astype(np.float32))
                  for v in range(n_videos)]
        ShotDataset(videos).to_records(train_path)

    def run_scan(fbody, params, state, batch, iters):
        from jax import lax

        # batch is an ARGUMENT of the jitted program, not a closure: a
        # closed-over device array becomes an HLO constant shipped inside
        # every remote-compile request (252 MB at B=1024 — DESIGN.md
        # decision 20, PERF.md round-5 frontier sweep)
        def one(b, carry, k):
            p, s = carry
            p2, s2, m = fbody(p, s, (b,), k)
            return (p2, s2), m["loss"]

        @jax.jit
        def run(p, s, keys, b):
            (p, s), losses = lax.scan(lambda c, k: one(b, c, k), (p, s),
                                      keys)
            return losses[-1]

        keys = jax.random.split(jax.random.key(1, impl=key_impl), iters)
        float(run(params, state, keys, batch))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, state, keys, batch))
            best = min(best, time.perf_counter() - t0)
        return best / iters

    results = []
    for bsz in [int(b) for b in args.batches.split(",")]:
        net_path = os.path.join(args.workdir, f"net_{bsz}.prototxt")
        with open(net_path, "w") as f:
            f.write(emit(train_path, train_path, batch=bsz, test_batch=8,
                         negatives=10, embed=args.feat,
                         buffer_size=max(args.buffer_size, bsz),
                         weight_std=0.001, dropout=0.9))
        solver = Message()
        solver.add("net", net_path)
        for k, v in (("base_lr", 0.001), ("momentum", 0.9),
                     ("weight_decay", 0.0005), ("lr_policy", "inv"),
                     ("gamma", 0.001), ("power", 0.75), ("max_iter", 1)):
            solver.add(k, v)
        if cd:
            solver.add("compute_dtype", cd)
        driver = SolverDriver(solver).build()
        net = driver.train_net
        cfg = driver.cfg

        def loss_fn(p, b, key, net=net):
            return SolverDriver._loss_with_outputs(net, p, b, key)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        batch = {"data": jax.jit(lambda k: jax.random.normal(
            k, (bsz, 15, args.feat, 1), jnp.float32))(jax.random.PRNGKey(0))}
        gm = auto_grad_microbatch(batch, {"data": 0})
        row = {"batch": bsz, "gm": gm, "prng": args.prng}
        ladder = [(f"gm{gm}", gm)] if args.skip_gm1 \
            else [("gm1", 1), (f"gm{gm}", gm)]
        for label, g in ladder:
            if label in row:
                continue
            fbody = build_fused_step(grad_fn, cfg, 1, g,
                                     lr_mults=driver.lr_mults,
                                     decay_mults=driver.decay_mults,
                                     batch_axes={"data": 0}, jit=False)
            params = jax.tree.map(jnp.array, driver.params)
            from videovector_tpu.solver import init_solver_state
            state = init_solver_state(cfg, params)
            dt = run_scan(fbody, params, state, batch, args.iters)
            row[f"engine_{label}_ms"] = round(dt * 1e3, 3)
            row[f"engine_{label}_triplets_s"] = round(bsz * 10 / dt, 0)

        if args.role_major:
            # role-major feed: (R, B, D, 1) batch, the leading SLICE/CONCAT
            # absorbs to a reshape (graph/fuse.py drole symbols) — measures
            # the engine without the (B, R, D) -> (R, B, D) relayout
            net.role_major_inputs = ("data",)
            rm_batch = {"data": jax.jit(lambda k: jax.random.normal(
                k, (15, bsz, args.feat, 1), jnp.float32))(
                    jax.random.PRNGKey(0))}
            fbody = build_fused_step(grad_fn, cfg, 1, gm,
                                     lr_mults=driver.lr_mults,
                                     decay_mults=driver.decay_mults,
                                     batch_axes={"data": 1}, jit=False)
            params = jax.tree.map(jnp.array, driver.params)
            from videovector_tpu.solver import init_solver_state
            state = init_solver_state(cfg, params)
            dt = run_scan(fbody, params, state, rm_batch, args.iters)
            net.role_major_inputs = ()
            row["engine_rm_ms"] = round(dt * 1e3, 3)
            row["engine_rm_triplets_s"] = round(bsz * 10 / dt, 0)

        if not args.skip_native:
            from videovector_tpu.models import (
                VideoEmbeddingConfig, VideoEmbeddingModel,
            )
            mcfg = VideoEmbeddingConfig(
                feature_dim=args.feat, embed_dim=args.feat,
                num_negatives=10,
                compute_dtype=cd or "float32")
            model = VideoEmbeddingModel(mcfg)

            def nloss(p, b, key):
                return model.loss(p, b, rng=key, train=True,
                                  role_major=True)

            ngrad = jax.value_and_grad(nloss, has_aux=True)
            nbatch = {"data": jax.jit(lambda k: jax.random.normal(
                k, (mcfg.num_roles, bsz, args.feat), jnp.float32))(
                    jax.random.PRNGKey(0))}
            fnative = build_fused_step(ngrad, cfg, 1, gm,
                                       batch_axes={"data": 1}, jit=False)
            nparams = model.init(jax.random.PRNGKey(0))
            from videovector_tpu.solver import init_solver_state
            nstate = init_solver_state(cfg, nparams)
            dt = run_scan(fnative, nparams, nstate, nbatch, args.iters)
            row["native_ms"] = round(dt * 1e3, 3)
            row["native_triplets_s"] = round(bsz * 10 / dt, 0)
            eng = (row.get("engine_rm_ms")
                   or row.get(f"engine_gm{gm}_ms") or row["engine_gm1_ms"])
            row["engine_vs_native"] = round(row["native_ms"] / eng, 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
