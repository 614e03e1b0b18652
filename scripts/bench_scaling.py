"""Throughput matrix for the flagship step: batch sizes × precision variants.

Run on the TPU host; prints a markdown table (and the bench.py-style numbers
for each cell). Complements bench.py (which pins the reference workload).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from functools import partial
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import SolverConfig, init_solver_state, solver_update

    scfg = SolverConfig(base_lr=1e-3, momentum=0.9, weight_decay=5e-4,
                        lr_policy="inv", gamma=0.001, power=0.75)

    def measure(batch, act_dtype, iters=200):
        cfg = VideoEmbeddingConfig(compute_dtype="bfloat16",
                                   activation_dtype=act_dtype)
        model = VideoEmbeddingModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        state = init_solver_state(scfg, params)

        def loss_fn(p, b, r):
            return model.loss(p, b, rng=r, train=True)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, b, r):
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b, r)
            p2, s2 = solver_update(scfg, p, g, s)
            return p2, s2, l

        data = jnp.asarray(np.random.RandomState(0)
                           .randn(batch, cfg.num_roles, cfg.feature_dim)
                           .astype(np.float32))
        key = jax.random.PRNGKey(1)
        for _ in range(5):
            params, state, loss = step(params, state, {"data": data}, key)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, state, loss = step(params, state, {"data": data}, key)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        return 1.0 / dt

    print("| batch | act dtype | steps/s | triplets/s |")
    print("|---|---|---|---|")
    for batch in (64, 128, 256, 512):
        for act in ("float32", "bfloat16"):
            sps = measure(batch, act)
            print(f"| {batch} | {act} | {sps:.1f} | {sps * batch * 10:,.0f} |",
                  flush=True)


if __name__ == "__main__":
    main()
