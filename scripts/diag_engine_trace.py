"""Op-level trace DIFF: prototxt-engine train step vs the native model.

Builds both steps exactly as scripts/bench_engine_train.py does (same
fused grad_microbatch schedule, same batch), traces each with
jax.profiler, and prints the two top-op tables side by side — the
ground-truth view of the engine-vs-native gap (VERDICT r3 item 1 asks
the engine path to be within ~10%).

python scripts/diag_engine_trace.py --batch 512 [--k 20] [--top 20]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "projects", "videovec_embedding"))


def trace_one(tag, fbody, params, state, batch, k, out_root, top):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def one(carry, kk):
        p, s = carry
        p2, s2, m = fbody(p, s, (batch,), kk)
        return (p2, s2), m["loss"]

    @jax.jit
    def run(p, s, keys):
        (p, s), losses = lax.scan(one, (p, s), keys)
        return losses[-1]

    keys = jax.random.split(jax.random.PRNGKey(1), k)
    float(run(params, state, keys))  # compile + warm
    t0 = time.perf_counter()
    float(run(params, state, keys))
    wall = (time.perf_counter() - t0) / k
    out = os.path.join(out_root, tag)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        float(run(params, state, keys))

    paths = sorted(glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print(f"[{tag}] no xplane captured")
        return wall
    from jax.profiler import ProfileData
    with open(paths[-1], "rb") as f:
        pd = ProfileData.from_serialized_xspace(f.read())
    totals = defaultdict(float)
    count = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = (ev.duration_ns or 0) / 1e6
                if dur <= 0:
                    continue
                totals[(line.name, ev.name)] += dur
                count[(line.name, ev.name)] += 1
    by_line = defaultdict(float)
    for (lname, _), v in totals.items():
        by_line[lname] += v
    if not by_line:
        print(f"[{tag}] empty trace")
        return wall
    busiest = max(by_line, key=by_line.get)
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    for (lname, name), v in totals.items():
        if lname == busiest:
            per_op[name] += v
            per_op_n[name] += count[(lname, name)]
    tot = sum(per_op.values())
    print(f"\n[{tag}] wall {wall*1e3:.3f} ms/step; line {busiest!r} "
          f"total {tot/k:.3f} ms/step")
    for name, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/k:8.4f} ms/step  x{per_op_n[name]//k:<3d} {name[:100]}")
    return wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--feat", type=int, default=4096)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--workdir", default="/tmp/vvtpu_engine_bench")
    p.add_argument("--only", default="engine,native")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np
    from generate_net import emit
    from videovector_tpu.config.textformat import Message
    from videovector_tpu.data.shots import ShotDataset, ShotVideo
    from videovector_tpu.solver import init_solver_state
    from videovector_tpu.solver.driver import SolverDriver
    from videovector_tpu.solver.train import auto_grad_microbatch, \
        build_fused_step

    cd = None if args.dtype in ("f32", "float32") else args.dtype
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.RandomState(0)
    train_path = os.path.join(args.workdir, f"train_{args.feat}.vvr")
    if not os.path.exists(train_path):
        videos = [ShotVideo(v + 1, np.arange(12, dtype=np.int32),
                            np.abs(rng.randn(12, args.feat))
                            .astype(np.float32))
                  for v in range(40)]
        ShotDataset(videos).to_records(train_path)

    bsz = args.batch
    net_path = os.path.join(args.workdir, f"net_{bsz}.prototxt")
    with open(net_path, "w") as f:
        f.write(emit(train_path, train_path, batch=bsz, test_batch=8,
                     negatives=10, embed=args.feat, buffer_size=480,
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

    batch = {"data": jax.jit(lambda k: jax.random.normal(
        k, (bsz, 15, args.feat, 1), jnp.float32))(jax.random.PRNGKey(0))}
    gm = auto_grad_microbatch(batch, {"data": 0})
    out_root = "/tmp/vvtpu_engine_trace"
    only = args.only.split(",")

    if "engine" in only:
        def loss_fn(p, b, key, net=net):
            return SolverDriver._loss_with_outputs(net, p, b, key)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        fbody = build_fused_step(grad_fn, cfg, 1, gm,
                                 lr_mults=driver.lr_mults,
                                 decay_mults=driver.decay_mults,
                                 batch_axes={"data": 0}, jit=False)
        params = jax.tree.map(jnp.array, driver.params)
        state = init_solver_state(cfg, params)
        trace_one(f"engine_gm{gm}", fbody, params, state, batch,
                  args.k, out_root, args.top)

    if "native" in only:
        from videovector_tpu.models import (
            VideoEmbeddingConfig, VideoEmbeddingModel,
        )
        mcfg = VideoEmbeddingConfig(feature_dim=args.feat,
                                    embed_dim=args.feat, num_negatives=10,
                                    compute_dtype=cd or "float32")
        model = VideoEmbeddingModel(mcfg)

        def nloss(p, b, key):
            return model.loss(p, b, rng=key, train=True, role_major=True)

        ngrad = jax.value_and_grad(nloss, has_aux=True)
        nbatch = {"data": jax.jit(lambda k: jax.random.normal(
            k, (mcfg.num_roles, bsz, args.feat), jnp.float32))(
                jax.random.PRNGKey(0))}
        fnative = build_fused_step(ngrad, cfg, 1, gm,
                                   batch_axes={"data": 1}, jit=False)
        nparams = model.init(jax.random.PRNGKey(0))
        nstate = init_solver_state(cfg, nparams)
        trace_one(f"native_gm{gm}", fnative, nparams, nstate, nbatch,
                  args.k, out_root, args.top)


if __name__ == "__main__":
    main()
