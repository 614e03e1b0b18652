"""Serving-artifact throughput: does the frozen StableHLO deployment path
(vvtpu-serve) run as fast as the live pipeline?

Exports the real-dimension extraction tower (fc7 4096, 227x227, batch 50 —
the reference extract_features config) into a .vvserve artifact, loads it
back with ONLY jax (no framework code), and measures steady-state
throughput device-pure (the artifact call is traceable, so K calls run
inside one lax.scan program).

python scripts/bench_serving.py [--batch 50] [--k 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--quantize", default="", choices=["", "int8"],
                    help="also export+measure the int8 PTQ artifact and "
                         "report the feature divergence vs f32")
    ap.add_argument("--compute", default="", choices=["", "bfloat16"],
                    help="freeze bf16 operand math into BOTH artifacts "
                         "(the live pipeline's throughput mode)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    from jax import lax
    from test_golden_fullscale import EXTRACTION_NET
    from videovector_tpu.tools.serving import export_serving, load_serving

    b = args.batch
    # the parity-test net has no fillers (its weights come from torch);
    # without them Caffe defaults to constant-0 weights and XLA folds the
    # whole tower away — inject gaussian fillers so the artifact carries
    # real dense weights
    filler = ('{ weight_filler { type: "gaussian" std: 0.01 } '
              'bias_filler { type: "constant" value: 0.1 } ')
    net_text = EXTRACTION_NET \
        .replace("convolution_param {", "convolution_param " + filler) \
        .replace("inner_product_param {", "inner_product_param " + filler)
    with tempfile.TemporaryDirectory() as td:
        net = os.path.join(td, "net.prototxt")
        with open(net, "w") as f:
            f.write(net_text)
        art = os.path.join(td, "extract.vvserve")
        t0 = time.perf_counter()
        export_serving(net, [], ["ip2"], art,
                       input_shapes={"data": (b, 3, 227, 227)},
                       compute_dtype=args.compute or None)
        t_export = time.perf_counter() - t0
        size_mb = os.path.getsize(art) / 1e6
        call, meta = load_serving(art)

        x = jax.jit(lambda k: jax.random.normal(
            k, (b, 3, 227, 227), jnp.float32))(jax.random.PRNGKey(0))

        @jax.jit
        def run(px):
            def one(carry, i):
                out = call({"data": px + i.astype(jnp.float32) * 1e-3})
                return carry + jnp.sum(out["ip2"]), i
            total, _ = lax.scan(one, jnp.float32(0.0),
                                jnp.arange(args.k))
            return total

        float(run(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        dt = best / args.k
        print(f"artifact: {size_mb:.1f} MB, export {t_export:.1f}s, "
              f"platforms={meta['platforms']}")
        print(f"serving batch {b}: {dt*1e3:.2f} ms/call = "
              f"{b/dt:,.0f} frames/s/chip (frozen-weights StableHLO, "
              f"no framework code at call time)")

        if args.quantize:
            art_q = os.path.join(td, "extract_int8.vvserve")
            calib = [{"data": np.random.RandomState(s)
                      .randn(b, 3, 227, 227).astype(np.float32)}
                     for s in range(3)]
            t0 = time.perf_counter()
            export_serving(net, [], ["ip2"], art_q,
                           input_shapes={"data": (b, 3, 227, 227)},
                           quantize=args.quantize, calib_data=calib,
                           compute_dtype=args.compute or None)
            t_export_q = time.perf_counter() - t0
            size_q = os.path.getsize(art_q) / 1e6
            call_q, meta_q = load_serving(art_q)

            @jax.jit
            def run_q(px):
                def one(carry, i):
                    out = call_q({"data": px + i.astype(jnp.float32) * 1e-3})
                    return carry + jnp.sum(out["ip2"]), i
                total, _ = lax.scan(one, jnp.float32(0.0),
                                    jnp.arange(args.k))
                return total

            float(run_q(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_q(x))
                best = min(best, time.perf_counter() - t0)
            dt_q = best / args.k
            yf = np.asarray(call({"data": x})["ip2"])
            yq = np.asarray(call_q({"data": x})["ip2"])
            rel = float(np.linalg.norm(yf - yq)
                        / (np.linalg.norm(yf) + 1e-9))
            print(f"int8 artifact: {size_q:.1f} MB, export "
                  f"{t_export_q:.1f}s")
            print(f"int8 serving batch {b}: {dt_q*1e3:.2f} ms/call = "
                  f"{b/dt_q:,.0f} frames/s/chip "
                  f"({dt/dt_q:.2f}x vs f32 artifact); "
                  f"feature rel-divergence {rel:.4f}")


if __name__ == "__main__":
    main()
