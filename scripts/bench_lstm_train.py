"""LSTM enc-dec TRAINING-step ledger: full fwd+bwd+update at workload
scale, batch sweep, vs the speed-of-light model for scan RNNs.

The round-2 number (41 TFLOP/s) was forward-only; this measures what
training actually costs (ref:src/caffe/layers/lstm_layer.cpp:151-527
Forward_cpu + Backward_cpu BPTT + solver update) with the same device-pure
methodology as bench.py: K steps inside one lax.scan program.

Speed-of-light model per step (enc T_e + dec T_d, batch B, hidden H=input I):
  input-projection GEMMs (batched over time, fwd):  2·B·(T_e+T_d)·I·4H
  recurrent GEMMs (sequential, fwd):                2·B·(T_e+T_d)·H·4H
  backward:  ~2x fwd FLOPs (dX + dW per GEMM)
  optimizer: ~3 reads + 2 writes of ~12·4H·H f32 params+state
  The recurrent chain is LATENCY-bound: 2·(T_e+T_d) sequential (B,4H)x(H,·)
  GEMMs each costing max(FLOPs/197e12, ~2-3 us issue+HBM latency) — at
  H=512 each GEMM is ~2.7 us of math, so the chain runs at 30-50% MXU and
  batch (not hidden) is the throughput lever.

python scripts/bench_lstm_train.py [--batches 64,256,1024] [--hidden 512]
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
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--t_enc", type=int, default=20)
    ap.add_argument("--t_dec", type=int, default=10)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--variants", default="base",
                    help="comma list: base, unroll2, unroll4, bf16rec, "
                         "bf16rec_unroll2 — the r3-VERDICT recurrence "
                         "ledger candidates")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.ops.recurrent import init_lstm_params, lstm
    from videovector_tpu.solver import (
        SolverConfig, init_solver_state, solver_update,
    )

    H = args.hidden
    I = H
    Te, Td = args.t_enc, args.t_dec
    scfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                        lr_policy="fixed")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params0 = {
        "enc": init_lstm_params(ks[0], I, H),
        "dec": init_lstm_params(ks[1], I, H),
        "readout": {"w": 0.01 * jax.random.normal(ks[2], (H, I)),
                    "b": jnp.zeros((I,), jnp.float32)},
    }

    peak = 197e12
    for b in (int(x) for x in args.batches.split(",")):
        enc_x = jax.jit(lambda k: jax.random.normal(
            k, (Te, b, I), jnp.float32))(jax.random.PRNGKey(1))
        dec_x = jax.jit(lambda k: jax.random.normal(
            k, (Td, b, I), jnp.float32))(jax.random.PRNGKey(2))
        tgt = jax.jit(lambda k: jax.random.normal(
            k, (Td, b, I), jnp.float32))(jax.random.PRNGKey(3))
        cont_e = jnp.ones((Te, b), jnp.float32).at[0].set(0.0)
        cont_d = jnp.ones((Td, b), jnp.float32)

        variants = {
            "base": dict(recurrent_dtype=None, unroll=1),
            "unroll2": dict(recurrent_dtype=None, unroll=2),
            "unroll4": dict(recurrent_dtype=None, unroll=4),
            "bf16rec": dict(recurrent_dtype=jnp.bfloat16, unroll=1),
            "bf16rec_unroll2": dict(recurrent_dtype=jnp.bfloat16,
                                    unroll=2),
        }
        for vname in args.variants.split(","):
            vkw = variants[vname]

            def loss_fn(p, vkw=vkw):
                # seq2seq: encoder final state seeds the decoder
                # (ref lstm_enc_dec_layer.cpp:135-139)
                _, enc_fin = lstm(p["enc"], enc_x, cont_e, **vkw)
                h, _ = lstm(p["dec"], dec_x, cont_d, state=enc_fin, **vkw)
                pred = jnp.einsum("tbh,hi->tbi", h, p["readout"]["w"]) \
                    + p["readout"]["b"]
                return jnp.mean((pred - tgt) ** 2)

            def one_step(carry, _):
                p, s = carry
                loss, g = jax.value_and_grad(loss_fn)(p)
                p2, s2 = solver_update(scfg, p, g, s)
                return (p2, s2), loss

            @jax.jit
            def run(p, s):
                (p, s), losses = lax.scan(one_step, (p, s), None,
                                          length=args.k)
                return losses[-1]

            params = jax.tree.map(jnp.array, params0)
            state = init_solver_state(scfg, params)
            float(run(params, state))          # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(params, state))
                best = min(best, time.perf_counter() - t0)
            dt = best / args.k
            _report(args, b, dt, params0, vname)


def _report(args, b, dt, params0, vname):
    import jax
    import numpy as np
    H = args.hidden
    I = H
    Te, Td = args.t_enc, args.t_dec
    peak = 197e12

    T = Te + Td
    fwd_flop = 2 * b * T * I * 4 * H + 2 * b * T * H * 4 * H
    train_flop = 3 * fwd_flop          # bwd ≈ 2x fwd
    tokens = b * T
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(params0))
    opt_bytes = 5 * 4 * n_params       # r W,H,G + w W,H, f32
    sol = max(train_flop / peak,
              2 * T * 3e-6,            # recurrent-chain latency floor
              opt_bytes / 819e9)
    print(f"B={b:5d} T={T} H={H} {vname:>15s}  {dt*1e3:8.3f} ms/step  "
          f"{tokens/dt:12,.0f} tokens/s  "
          f"{train_flop/dt/1e12:6.1f} TFLOP/s "
          f"({100*train_flop/dt/peak:4.1f}% peak)  "
          f"SOL {sol*1e3:.3f} ms ({dt/sol:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
