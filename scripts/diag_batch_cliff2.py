"""Batch-cliff diagnosis, take 2: device-pure timing via lax.scan.

K full training steps run inside ONE XLA program (scan over step), so
tunnel dispatch noise (~1 ms per call here) cannot contaminate the
measurement: wall time / K = true device step time.

python scripts/diag_batch_cliff2.py [--dtype float32] [--k 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--variant", default="full",
                    choices=["full", "fwd_bwd", "fwd", "opt", "stale", "micro"])
    ap.add_argument("--dropout", type=float, default=0.9)
    ap.add_argument("--role_major", action="store_true")
    ap.add_argument("--barrier", action="store_true",
                    help="optimization_barrier between grads and update")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import (
        SolverConfig, init_solver_state, solver_update,
    )

    FEAT = EMBED = 4096
    NUM_NEG = 10
    cfg = VideoEmbeddingConfig(feature_dim=FEAT, embed_dim=EMBED,
                               num_negatives=NUM_NEG,
                               dropout_rate=args.dropout,
                               compute_dtype=args.dtype)
    model = VideoEmbeddingModel(cfg)
    params0 = model.init(jax.random.PRNGKey(0))
    scfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                        lr_policy="inv", gamma=0.001, power=0.75)

    def loss_fn(p, batch, rng):
        return model.loss(p, batch, rng=rng, train=True,
                          role_major=args.role_major)

    K = args.k
    results = []
    for b in (int(x) for x in args.batches.split(",")):
        shape = (cfg.num_roles, b, FEAT) if args.role_major else \
            (b, cfg.num_roles, FEAT)
        data = jax.jit(lambda k: jax.random.normal(
            k, shape, jnp.float32))(jax.random.PRNGKey(0))
        batch = {"data": data}

        def one_step_micro(carry, key):
            # Caffe iter_size semantics: accumulate grads over 128-row
            # microbatches, one solver update (identical math to the big
            # batch: per-micro losses average, ref solver.cpp iter_size)
            p, s = carry
            n_micro = max(b // 128, 1)
            mb = b // n_micro
            # role-major (R, B, F) → (R, n_micro, mb, F) → scan over micro
            d = batch["data"].reshape(
                cfg.num_roles, n_micro, mb, FEAT).transpose(1, 0, 2, 3)
            keys = jax.random.split(key, n_micro)

            def micro(g_acc, xs):
                data_i, key_i = xs
                (loss, aux), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, {"data": data_i}, key_i)
                return jax.tree.map(jnp.add, g_acc, g), loss

            g0 = jax.tree.map(jnp.zeros_like, p)
            g, losses = lax.scan(micro, g0, (d, keys))
            g = jax.tree.map(lambda x: x / n_micro, g)
            p2, s2 = solver_update(scfg, p, g, s)
            return (p2, s2), losses[-1]

        def one_step_stale(carry, key):
            # one-step-delayed optimizer: step k applies grads from step
            # k-1 while computing step k's grads — no data dependence
            # between the update and the fwd/bwd, so XLA can overlap the
            # HBM-bound optimizer under the MXU-bound GEMMs
            p, s, g_prev = carry
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, key)
            p2, s2 = solver_update(scfg, p, g_prev, s)
            return (p2, s2, g), loss

        def one_step(carry, key):
            p, s = carry
            if args.variant == "opt":
                # optimizer alone: params change every iter (not hoistable)
                g = jax.tree.map(jnp.ones_like, p)
                p2, s2 = solver_update(scfg, p, g, s)
                return (p2, s2), p2["tower"]["b"][0]
            if args.variant == "fwd":
                loss, _ = loss_fn(p, batch, key)
                return (p, s), loss
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, key)
            if args.variant == "fwd_bwd":
                # consume g without updating (keep params in carry)
                return (p, s), loss + g["tower"]["b"][0] * 0.0
            if args.barrier:
                g = lax.optimization_barrier(g)
            p2, s2 = solver_update(scfg, p, g, s)
            return (p2, s2), loss

        if args.variant == "micro":
            @jax.jit
            def run(p, s, keys):
                (p, s), losses = lax.scan(one_step_micro, (p, s), keys)
                return losses[-1]
        elif args.variant == "stale":
            @jax.jit
            def run(p, s, keys):
                g0 = jax.tree.map(jnp.zeros_like, p)
                (p, s, _), losses = lax.scan(one_step_stale, (p, s, g0),
                                             keys)
                return losses[-1]
        else:
            @jax.jit
            def run(p, s, keys):
                (p, s), losses = lax.scan(one_step, (p, s), keys)
                return losses[-1]

        keys = jax.random.split(jax.random.PRNGKey(1), K)
        params = jax.tree.map(jnp.array, params0)
        state = init_solver_state(scfg, params)
        float(run(params, state, keys))          # compile + warm
        t0 = time.perf_counter()
        float(run(params, state, keys))
        dt = (time.perf_counter() - t0) / K
        tput = b * NUM_NEG / dt
        results.append((b, dt, tput))
        print(f"B={b:4d} [{args.variant}, {args.dtype}]  "
              f"{dt*1e3:7.3f} ms/step  {tput:,.0f} triplets/s")

    b0 = results[0]
    for r in results[1:]:
        print(f"B={r[0]}: x{r[1]/b0[1]:.2f} time for x{r[0]//b0[0]} batch")


if __name__ == "__main__":
    main()
