"""Micro-diagnosis: raw tower GEMM fwd(+bwd) scaling inside a scan.

Params are perturbed every iteration (carry += grads·eps) so XLA cannot
hoist anything; measures the pure (15B,4096)x(4096,4096) matmul stack the
flagship step is built on, plus optional relu/dropout/scoring stages, to
find which stage scales superlinearly with B.

python scripts/diag_gemm_scaling.py --stage gemm|gemm_relu|tower|score
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
    ap.add_argument("--stage", default="gemm",
                    choices=["gemm", "gemm_relu", "tower", "score"])
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax

    D = E = 4096
    R = 15
    results = []
    for b in (int(x) for x in args.batches.split(",")):
        x = jax.jit(lambda k: jax.random.normal(
            k, (b * R, D), jnp.float32))(jax.random.PRNGKey(0))
        w0 = jax.jit(lambda k: jax.random.normal(
            k, (D, E), jnp.float32) * 0.001)(jax.random.PRNGKey(1))
        bias0 = jnp.zeros((E,), jnp.float32)

        def fwd(w, bias, key):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32) + bias
            if args.stage == "gemm":
                return jnp.sum(h * 1e-6)
            h = jax.nn.relu(h)
            if args.stage == "gemm_relu":
                return jnp.sum(h * 1e-6)
            # dropout like the model (rbg)
            keep = jax.random.bernoulli(key, 0.1, h.shape)
            h = jnp.where(keep, h / 0.1, 0.0)
            if args.stage == "tower":
                return jnp.sum(h * 1e-6)
            # scoring: cosine-form over roles
            hh = h.reshape(b, R, E)
            tgt, ctx, neg = hh[:, 0], hh[:, 1:5].mean(1), hh[:, 5:]
            def inv(sq):
                n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
                return jnp.where(sq > 0, 1.0 / (n + 1e-10), 0.0)
            s_true = jnp.sum(ctx * tgt, -1) * inv(jnp.sum(ctx * ctx, -1)) \
                * inv(jnp.sum(tgt * tgt, -1))
            s_neg = jnp.einsum("bnd,bd->bn", neg, ctx) \
                * inv(jnp.sum(neg * neg, -1)) \
                * inv(jnp.sum(ctx * ctx, -1))[:, None]
            hinge = jnp.maximum(2.0 - (s_true[:, None] - s_neg), 0.0)
            return jnp.sum(hinge * hinge) / hinge.size

        def one_step(carry, key):
            w, bias = carry
            if args.fwd_only:
                loss = fwd(w, bias, key)
                # perturb so nothing hoists; cheap elementwise
                return (w + loss * 1e-20, bias), loss
            loss, (gw, gb) = jax.value_and_grad(fwd, argnums=(0, 1))(
                w, bias, key)
            return (w - 1e-9 * gw, bias - 1e-9 * gb), loss

        @jax.jit
        def run(w, bias, keys):
            (w, bias), losses = lax.scan(one_step, (w, bias), keys)
            return losses[-1]

        keys = jax.random.split(jax.random.PRNGKey(2), args.k)
        float(run(w0, bias0, keys))
        t0 = time.perf_counter()
        float(run(w0, bias0, keys))
        dt = (time.perf_counter() - t0) / args.k
        gflop = 2 * (b * R) * D * E * (1 if args.fwd_only else 3) / 1e9
        results.append((b, dt))
        print(f"B={b:4d} [{args.stage}{' fwd' if args.fwd_only else ' f+b'}] "
              f"{dt*1e3:7.3f} ms  ({gflop/dt/1e3:,.0f} TFLOP/s effective)")
    b0 = results[0]
    for r in results[1:]:
        print(f"B={r[0]}: x{r[1]/b0[1]:.2f} time for x{r[0]//b0[0]} batch")


if __name__ == "__main__":
    main()
