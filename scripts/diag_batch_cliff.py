"""Diagnose the B>=256 throughput cliff (VERDICT r1 item 6).

Decomposes the flagship training step at each batch size into
  fwd        — loss only
  fwd+bwd    — value_and_grad
  full step  — value_and_grad + solver update (the bench.py program)
and additionally times the solver update alone (param-shaped, batch-free)
and a batch-shaped dummy elementwise program, to separate batch-dependent
compute from the fixed optimizer cost.

Run on the real chip:  python scripts/diag_batch_cliff.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEAT = EMBED = 4096
NUM_NEG = 10


def fence(x):
    return float(np.asarray(x).ravel()[0])


def bench(fn, args, iters):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--batches", default="128,256,512")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from functools import partial
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import (
        SolverConfig, init_solver_state, solver_update,
    )

    cfg = VideoEmbeddingConfig(feature_dim=FEAT, embed_dim=EMBED,
                               num_negatives=NUM_NEG,
                               compute_dtype=args.dtype)
    model = VideoEmbeddingModel(cfg)
    params0 = model.init(jax.random.PRNGKey(0))
    scfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                        lr_policy="inv", gamma=0.001, power=0.75)

    def loss_fn(p, batch, rng):
        return model.loss(p, batch, rng=rng, train=True)

    # fixed-cost reference: optimizer update alone on param-shaped grads
    @jax.jit
    def opt_only(p, s, g):
        p2, s2 = solver_update(scfg, p, g, s)
        return p2, s2, p2["tower"]["b"][0]

    params = jax.tree.map(jnp.array, params0)
    state = init_solver_state(scfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    t_opt = bench(lambda p, s, g: opt_only(p, s, g)[2:],
                  (params, state, grads), args.iters)
    print(f"optimizer update alone: {t_opt*1e3:.3f} ms")

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        key = jax.random.PRNGKey(1)
        data = jax.jit(lambda k: jax.random.normal(
            k, (b, cfg.num_roles, FEAT), jnp.float32))(jax.random.PRNGKey(0))
        batch = {"data": data}

        @jax.jit
        def fwd(p, batch, rng):
            loss, aux = loss_fn(p, batch, rng)
            return loss

        @jax.jit
        def fwd_bwd(p, batch, rng):
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, rng)
            return loss, g["tower"]["b"][0]

        @partial(jax.jit, donate_argnums=(0, 1))
        def full(p, s, batch, rng):
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, rng)
            p2, s2 = solver_update(scfg, p, g, s)
            return p2, s2, loss

        params = jax.tree.map(jnp.array, params0)
        state = init_solver_state(scfg, params)

        t_fwd = bench(fwd, (params, batch, key), args.iters)
        t_fb = bench(lambda p, bt, k: fwd_bwd(p, bt, k)[0],
                     (params, batch, key), args.iters)

        # full step benches with donation: rebind each call
        full(params, state, batch, key)  # compile+warm (donates params!)
        params = jax.tree.map(jnp.array, params0)
        state = init_solver_state(scfg, params)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, state, loss = full(params, state, batch, key)
        fence(loss)
        t_full = (time.perf_counter() - t0) / args.iters

        tput = b * NUM_NEG / t_full
        rows.append((b, t_fwd, t_fb, t_full, tput))
        print(f"B={b:4d}  fwd {t_fwd*1e3:7.3f} ms | fwd+bwd {t_fb*1e3:7.3f} "
              f"ms | full {t_full*1e3:7.3f} ms | {tput:,.0f} triplets/s")

    print("\nscaling vs B=128 (ideal = ratio of batch):")
    b0 = rows[0]
    for r in rows[1:]:
        print(f"B={r[0]}: fwd x{r[1]/b0[1]:.2f}, fwd+bwd x{r[2]/b0[2]:.2f}, "
              f"full x{r[3]/b0[3]:.2f} (batch x{r[0]/b0[0]:.0f})")


if __name__ == "__main__":
    main()
