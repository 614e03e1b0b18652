"""Prototype: role-major scoring layout vs current batch-major.

The B=512 trace (diag_trace.py) shows ~1.6 ms/step of pure layout
copies/reshapes on the (B, 15, 4096) activation: XLA picks {2,0,1} for the
context-mean/pad block and {2,1,0} for the GEMM side, so every crossing
transposes 126 MB. Role-major (R, B, E) makes target/context/negative
slices contiguous leading-axis blocks — no layout flips anywhere.

Measures the full step (fwd+bwd+SGD) both ways inside a scan.
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
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batches", default="128,512")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    from jax import lax

    D = E = 4096
    R, C, N = 15, 4, 10
    MARGIN = 2.0

    def inv(sq):
        n = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        return jnp.where(sq > 0, 1.0 / (n + 1e-10), 0.0)

    def loss_batch_major(w, b_, x, key):
        B = x.shape[0]
        h = jnp.dot(x.reshape(B * R, D), w,
                    preferred_element_type=jnp.float32) + b_
        h = jax.nn.relu(h)
        keep = jax.random.bernoulli(key, 0.1, h.shape)
        h = jnp.where(keep, h / 0.1, 0.0)
        hh = h.reshape(B, R, E)
        tgt, ctx, neg = hh[:, 0], hh[:, 1:1 + C].mean(1), hh[:, 1 + C:]
        s_true = jnp.sum(ctx * tgt, -1) * inv(jnp.sum(ctx * ctx, -1)) \
            * inv(jnp.sum(tgt * tgt, -1))
        s_neg = jnp.einsum("bnd,bd->bn", neg, ctx) \
            * inv(jnp.sum(neg * neg, -1)) \
            * inv(jnp.sum(ctx * ctx, -1))[:, None]
        hinge = jnp.maximum(MARGIN - (s_true[:, None] - s_neg), 0.0)
        return jnp.sum(hinge * hinge) / hinge.size

    def loss_role_major(w, b_, xr, key):
        # xr: (R, B, D) — roles are leading-axis blocks everywhere
        B = xr.shape[1]
        h = jnp.dot(xr.reshape(R * B, D), w,
                    preferred_element_type=jnp.float32) + b_
        h = jax.nn.relu(h)
        keep = jax.random.bernoulli(key, 0.1, h.shape)
        h = jnp.where(keep, h / 0.1, 0.0)
        hh = h.reshape(R, B, E)
        tgt = hh[0]
        ctx = hh[1:1 + C].mean(0)
        neg = hh[1 + C:]                      # (N, B, E)
        s_true = jnp.sum(ctx * tgt, -1) * inv(jnp.sum(ctx * ctx, -1)) \
            * inv(jnp.sum(tgt * tgt, -1))
        s_neg = jnp.einsum("nbd,bd->nb", neg, ctx) \
            * inv(jnp.sum(neg * neg, -1)) \
            * inv(jnp.sum(ctx * ctx, -1))[None, :]
        hinge = jnp.maximum(MARGIN - (s_true[None, :] - s_neg), 0.0)
        return jnp.sum(hinge * hinge) / hinge.size

    for b in (int(x) for x in args.batches.split(",")):
        x_bm = jax.jit(lambda k: jax.random.normal(
            k, (b, R, D), jnp.float32))(jax.random.PRNGKey(0))
        x_rm = jnp.transpose(x_bm, (1, 0, 2))

        for name, loss_fn, x in (("batch-major", loss_batch_major, x_bm),
                                 ("role-major ", loss_role_major, x_rm)):
            def one_step(carry, key, loss_fn=loss_fn, x=x):
                w, b_ = carry
                loss, (gw, gb) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(w, b_, x, key)
                return (w - 1e-3 * gw, b_ - 1e-3 * gb), loss

            @jax.jit
            def run(w, b_, keys, one_step=one_step):
                (w, b_), losses = lax.scan(one_step, (w, b_), keys)
                return losses[-1]

            w0 = jax.jit(lambda k: jax.random.normal(
                k, (D, E), jnp.float32) * 0.001)(jax.random.PRNGKey(1))
            b0 = jnp.zeros((E,), jnp.float32)
            keys = jax.random.split(jax.random.PRNGKey(2), args.k)
            l1 = float(run(w0, b0, keys))
            t0 = time.perf_counter()
            l2 = float(run(w0, b0, keys))
            dt = (time.perf_counter() - t0) / args.k
            print(f"B={b:4d} {name}  {dt*1e3:7.3f} ms/step  "
                  f"{b*N/dt:,.0f} triplets/s   loss={l2:.6f}")


if __name__ == "__main__":
    main()
