"""Frontier sweep: extend the chip-record schedule beyond B=1024.

Round-4's record was B=1024 x grad_microbatch=8, role-major, bf16
compute, f32 batch in HBM (PERF.md).  Per-chip throughput was monotone
128 -> 1024, so this sweep asks two questions on the real chip:

  1. does the scaling continue at B=2048 (gm=16, micro stays 128 rows)?
  2. does storing the device-resident batch in bf16 buy the ~0.3 ms/step
     the HBM roofline predicts (batch read is ~8%% of the B=1024 step)?

Methodology = bench.py measure_frontier: device-resident batch, 50 steps
in ONE XLA program (lax.scan over the fused step), typed rbg keys (the
product dropout_prng mode; NEVER a process-wide PRNG flip), best-of-3,
scalar fetch to fence.  Compile cache pointed at <repo>/.jax_cache so
re-runs skip the multi-minute tunnel AOT.

Usage: python scripts/bench_frontier_sweep.py [--configs B:gm:dtype,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FEAT, EMBED, NUM_NEG = 4096, 4096, 10


def measure(B: int, gm: int, batch_dtype: str, iters: int = 50):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models import (VideoEmbeddingConfig,
                                        VideoEmbeddingModel)
    from videovector_tpu.solver import SolverConfig, init_solver_state
    from videovector_tpu.solver.train import build_fused_step

    cfg = VideoEmbeddingConfig(feature_dim=FEAT, embed_dim=EMBED,
                               num_negatives=NUM_NEG,
                               compute_dtype="bfloat16")
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    solver_cfg = SolverConfig(base_lr=0.001, momentum=0.9,
                              weight_decay=5e-4, lr_policy="inv",
                              gamma=0.001, power=0.75)
    state = init_solver_state(solver_cfg, params)

    def loss_fn(p, b, k):
        return model.loss(p, b, rng=k, train=True, role_major=True)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    fstep = build_fused_step(grad_fn, solver_cfg, 1, gm,
                             batch_axes={"data": 1}, jit=False)
    dt = jnp.dtype(batch_dtype)
    batch = {"data": jax.jit(lambda k: jax.random.normal(
        k, (cfg.num_roles, B, FEAT), jnp.float32).astype(dt))(
            jax.random.PRNGKey(0))}

    # batch is an ARGUMENT, not a closure: a closed-over device array is
    # embedded as an HLO constant, and through the axon tunnel the whole
    # constant ships inside the remote-compile request — at B=2048 the
    # 503 MB payload exceeds the relay's body limit (HTTP 413), and at
    # B=1024 it was the real cost of the observed 20-min "compile".
    def one(b, carry, k):
        p, s = carry
        p2, s2, m = fstep(p, s, (b,), k)
        return (p2, s2), m["loss"]

    @jax.jit
    def run(p, s, keys, b):
        (p, s), losses = lax.scan(lambda c, k: one(b, c, k), (p, s), keys)
        return losses[-1]

    keys = jax.random.split(jax.random.key(1, impl="rbg"), iters)
    t0 = time.perf_counter()
    float(run(params, state, keys, batch))  # compile + warm
    print(f"  [compile+warm {time.perf_counter() - t0:.1f}s]",
          file=sys.stderr, flush=True)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, state, keys, batch))
        reps.append(time.perf_counter() - t0)
    best = min(reps)
    ms = best / iters * 1e3
    tps = B * NUM_NEG / (best / iters)
    print(f"B={B} gm={gm} batch_dtype={batch_dtype}: {ms:.3f} ms/step, "
          f"{tps:,.0f} triplets/s  (reps {[round(r, 4) for r in reps]})",
          flush=True)
    return ms, tps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs",
                   default="1024:8:float32,1024:8:bfloat16,"
                           "2048:16:float32,2048:16:bfloat16")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    for spec in args.configs.split(","):
        b, gm, dt = spec.split(":")
        measure(int(b), int(gm), dt, args.iters)


if __name__ == "__main__":
    main()
