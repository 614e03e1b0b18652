"""Is XLA:TPU's int8 dot actually on the MXU fast path?

The int8 PTQ serving artifact measured SLOWER than f32 at batch 50
(2.02 vs 1.57 ms, chip session r4) even though v5e's int8 MXU peak is 2x
bf16. Two hypotheses:
  (a) the int8 dot doesn't lower to the native s8xs8->s32 MXU path;
  (b) batch 50 is too small to be MXU-bound, so the extra
      quantize/dequantize VPU work dominates.
This microbench separates them: square GEMMs at serving-relevant sizes in
bf16 / f32 / int8 (plus int8 with the full quant+dequant chain), timed on
chip. If the raw int8 GEMM beats bf16, (a) is false and the fix is
workload shape, not lowering.

python scripts/diag_int8_mxu.py [--sizes 1024,2048,4096] [--k 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048,4096")
    ap.add_argument("--m", type=int, default=0,
                    help="rows of the LHS (0 = square)")
    ap.add_argument("--k", type=int, default=200)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    def bench(fn, *xs, k=args.k):
        # scan k reps inside one program to amortize tunnel RTT. The LHS is
        # dynamically re-sliced from a doubled buffer each iteration so the
        # dot DEPENDS on the loop counter — without this, XLA hoists the
        # loop-invariant GEMM out of the scan and the "measurement" is an
        # empty loop (first version of this script reported 479 "TF/s" f32).
        a, rest = xs[0], xs[1:]
        m = a.shape[0]
        a2 = jnp.concatenate([a, a], axis=0)

        def loop(a2, rest):
            def body(c, t):
                lhs = jax.lax.dynamic_slice(
                    a2, (t % m, 0), (m, a2.shape[1]))
                out = fn(lhs, *rest)
                return c + jnp.sum(out.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(k, dtype=jnp.int32))
            return s
        lj = jax.jit(loop)
        float(lj(a2, rest))
        t0 = time.perf_counter()
        float(lj(a2, rest))
        return (time.perf_counter() - t0) / k

    rng = np.random.RandomState(0)
    for n in [int(s) for s in args.sizes.split(",")]:
        m = args.m or n
        a32 = jnp.asarray(rng.randn(m, n).astype(np.float32))
        b32 = jnp.asarray(rng.randn(n, n).astype(np.float32))
        a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)
        a8 = jnp.asarray(
            np.clip(rng.randn(m, n) * 40, -127, 127).astype(np.int8))
        b8 = jnp.asarray(
            np.clip(rng.randn(n, n) * 40, -127, 127).astype(np.int8))
        s_w = jnp.asarray(np.abs(rng.randn(n)).astype(np.float32))

        flops = 2.0 * m * n * n
        t_f32 = bench(lambda a, b: jnp.dot(a, b), a32, b32)
        t_bf16 = bench(
            lambda a, b: jnp.dot(a, b,
                                 preferred_element_type=jnp.float32),
            a16, b16)
        t_i8 = bench(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
            a8, b8)
        # the serving path's full chain: f32 in -> quantize -> int8 GEMM
        # -> dequantize + scale
        t_chain = bench(
            lambda a, b, s: (jnp.dot(
                jnp.clip(jnp.round(a / 0.05), -127, 127).astype(jnp.int8),
                b, preferred_element_type=jnp.int32)
                .astype(jnp.float32) * (0.05 * s)),
            a32, b8, s_w)
        print(f"N={n} M={m}: "
              f"f32 {t_f32*1e3:7.3f} ms ({flops/t_f32/1e12:6.1f} TF/s) | "
              f"bf16 {t_bf16*1e3:7.3f} ms ({flops/t_bf16/1e12:6.1f}) | "
              f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f}) | "
              f"int8+q/dq {t_chain*1e3:7.3f} ms "
              f"({flops/t_chain/1e12:6.1f})", flush=True)


if __name__ == "__main__":
    main()
