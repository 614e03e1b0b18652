"""Gallery-scale retrieval eval on chip: rank-by-counting vs sort engine.

The round-3 measurement: 20k x 4096, 50 classes, EXACT mAP/hit@1/hit@5
over all queries = 15.2 s with the sort engine (the argsort dominated).
Round-4 target (VERDICT item 2): <= 3 s with the counting engine, plus a
100k-gallery demonstration.

python scripts/bench_gallery_eval.py [--n 20000] [--d 4096] [--classes 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--classes", type=int, default=50)
    ap.add_argument("--engines", default="count,sort")
    ap.add_argument("--big_n", type=int, default=100000,
                    help="second run at this gallery size (count engine "
                         "only; 0 to skip)")
    ap.add_argument("--report", action="store_true",
                    help="time retrieval_stats_report (csv dump) at --n "
                         "instead of the aggregate engines")
    ap.add_argument("--shard_gallery", action="store_true",
                    help="also run the GALLERY-sharded count engine over "
                         "all devices (per-device memory N*D/ndev) and "
                         "check it equals the single-device result")
    ap.add_argument("--driver", default="auto",
                    choices=["auto", "scan", "host"],
                    help="chunk driver: one scanned program (fast) or "
                         "per-chunk dispatches (the big-gallery escape "
                         "hatch — bit-equal); auto picks host above 200k "
                         "rows on TPU (the scan program trips a runtime "
                         "fault there) and scan otherwise")
    ap.add_argument("--gallery_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compact gallery keys: bfloat16 halves the "
                         "gallery HBM (1M x 4096 fits ONE v5e at 8.4 GB; "
                         "f32 cannot) — ranks exact w.r.t. the quantized "
                         "distances (metrics.retrieval)")
    ap.add_argument("--repeat", type=int, default=2,
                    help="timed passes per engine (2 = warm-incl-compile "
                         "+ hot, with a determinism cross-check; 1 for "
                         "hour-scale galleries where a second pass is "
                         "unaffordable)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np
    from videovector_tpu.metrics.retrieval import retrieval_stats_chunked

    def gen_gallery(n, d, cls, centers):
        """Generate the (n, d) gallery ON DEVICE (tunnel H2D is a
        harness artifact), in row chunks written into a DONATED output
        buffer: the f32 intermediate stays ~2 GB and the gallery is
        never duplicated — a concatenate (2x peak), an eager [:n]
        slice, or a one-shot jax.random.normal((n, d)) OOMed the chip
        at 500k-1M rows (round-5 measurement). centers=None gives raw
        normal features (the report path); otherwise class-clustered
        normalized features."""
        out_dt = (jnp.bfloat16 if args.gallery_dtype == "bfloat16"
                  else jnp.float32)
        import math
        from functools import partial
        need = max(1, math.ceil(n * d * 4 / (2 << 30)))
        nchunks = next(k for k in range(need, n + 1) if n % k == 0)
        gen_rows = n // nchunks

        @jax.jit
        def gen_chunk(key, idx):
            noise = jax.random.normal(key, (gen_rows, d), jnp.float32)
            if centers is None:
                return noise.astype(out_dt)
            f = centers[idx] * 2.0 + noise
            f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
            return f.astype(out_dt)

        @partial(jax.jit, donate_argnums=(0,))
        def write_chunk(buf, chunk, i):
            return jax.lax.dynamic_update_slice_in_dim(
                buf, chunk, i * gen_rows, 0)

        feats = jnp.zeros((n, d), out_dt)
        for i in range(nchunks):
            chunk = gen_chunk(
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                jnp.asarray(cls[i * gen_rows:(i + 1) * gen_rows]))
            feats = write_chunk(feats, chunk, i)
        float(jnp.sum(feats[:64].astype(jnp.float32)))  # fence the setup
        return feats

    def run(n, d, n_cls, engines):
        rng = np.random.RandomState(0)
        cls = rng.randint(0, n_cls, size=(n,)).astype(np.int32)
        vids = rng.randint(0, n // 10, size=(n,)).astype(np.int32)
        centers = jnp.asarray(rng.randn(n_cls, d).astype(np.float32))
        gdt = args.gallery_dtype
        feats = gen_gallery(n, d, cls, centers)
        # per-chunk temps are O(q_chunk * N) int32/f32 rows — shrink the
        # chunk as the gallery grows so they stay ~1 GB
        qc = 512 if n < 150_000 else (256 if n < 600_000 else 128)
        results = {}
        for engine in engines:
            t0 = time.perf_counter()
            out = retrieval_stats_chunked(feats, vids, cls,
                                          query_chunk=qc, method=engine,
                                          gallery_dtype=gdt,
                                          chunk_driver=args.driver)
            vals = {k: float(v) for k, v in out.items()}
            warm = time.perf_counter() - t0
            hot = warm
            if args.repeat > 1:
                t0 = time.perf_counter()
                out = retrieval_stats_chunked(feats, vids, cls,
                                              query_chunk=qc, method=engine,
                                              gallery_dtype=gdt,
                                              chunk_driver=args.driver)
                vals2 = {k: float(v) for k, v in out.items()}
                hot = time.perf_counter() - t0
                assert vals == vals2
            results[engine] = (hot, warm, vals)
            label = ("warm" if args.repeat > 1
                     else "single pass incl. compile")
            print(f"N={n} D={d} C={n_cls} dtype={gdt} engine={engine}: "
                  f"{hot:.2f}s {label} ({warm:.2f}s incl. compile)  {vals}",
                  flush=True)
        if args.shard_gallery:
            from videovector_tpu.parallel import make_mesh
            mesh = make_mesh()
            t0 = time.perf_counter()
            out = retrieval_stats_chunked(feats, vids, cls,
                                          query_chunk=qc, mesh=mesh,
                                          shard_gallery=True)
            vals = {k: float(v) for k, v in out.items()}
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = retrieval_stats_chunked(feats, vids, cls,
                                          query_chunk=qc, mesh=mesh,
                                          shard_gallery=True)
            hot = time.perf_counter() - t0
            assert vals == {k: float(v) for k, v in out.items()}
            results["gshard"] = (hot, warm, vals)
            ndev = mesh.shape["data"]
            print(f"N={n} D={d} C={n_cls} engine=count/gallery-sharded "
                  f"x{ndev}dev: {hot:.2f}s warm ({warm:.2f}s incl. "
                  f"compile)  {vals}", flush=True)
        if len(results) > 1:
            vals_list = [results[e][2] for e in results]
            for other in vals_list[1:]:
                for k in vals_list[0]:
                    assert abs(vals_list[0][k] - other[k]) < 1e-5, \
                        (k, vals_list[0][k], other[k])
            print(f"{' == '.join(results)} on chip: OK", flush=True)

    if args.report:
        import tempfile
        from videovector_tpu.metrics.retrieval import retrieval_stats_report
        rng = np.random.RandomState(0)
        n, d = args.n, args.d
        cls = rng.randint(0, args.classes, size=(n,)).astype(np.int32)
        vids = rng.randint(0, n // 10, size=(n,)).astype(np.int32)
        feats = gen_gallery(n, d, cls, None)
        for trial in range(max(1, args.repeat)):
            with tempfile.NamedTemporaryFile(suffix=".csv") as f:
                t0 = time.perf_counter()
                agg = retrieval_stats_report(
                    feats, vids, cls, f.name,
                    gallery_dtype=args.gallery_dtype,
                    chunk_driver=args.driver)
                dt = time.perf_counter() - t0
                rows = sum(1 for _ in open(f.name)) - 1
            print(f"report N={n} D={d}: {dt:.2f}s ({rows} rows)  "
                  f"{ {k: round(v, 4) for k, v in agg.items()} }",
                  flush=True)
        return

    run(args.n, args.d, args.classes, args.engines.split(","))
    if args.big_n:
        run(args.big_n, args.d, args.classes, ["count"])


if __name__ == "__main__":
    main()
