"""Op-level trace of the feature-extraction pipeline (uint8 -> transform ->
CaffeNet conv stack -> fc -> embed -> normalize) at a given batch size:
where do the 2.33 ms/batch go vs the ~0.36 ms bf16 compute floor?

python scripts/diag_extraction_trace.py --batch 50 [--k 20] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_fn(run, args_tuple, out_dir, k, top):
    """Capture + parse one xspace trace of run(*args_tuple)."""
    import jax
    float(np.asarray(run(*args_tuple)).sum())  # compile + warm
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        float(np.asarray(run(*args_tuple)).sum())
    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane captured")
        return
    from jax.profiler import ProfileData
    with open(paths[-1], "rb") as f:
        pd = ProfileData.from_serialized_xspace(f.read())
    totals = defaultdict(float)
    count = defaultdict(int)
    for plane in pd.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = (ev.duration_ns or 0) / 1e6
                if dur <= 0:
                    continue
                totals[(line.name, ev.name)] += dur
                count[(line.name, ev.name)] += 1
    by_line = defaultdict(float)
    for (lname, _), v in totals.items():
        by_line[lname] += v
    busiest = max(by_line, key=by_line.get)
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    for (lname, name), v in totals.items():
        if lname == busiest:
            per_op[name] += v
            per_op_n[name] += count[(lname, name)]
    tot = sum(per_op.values())
    print(f"busiest line {busiest!r}: {tot:.2f} ms total, "
          f"{tot / k:.4f} ms/iter\n")
    for name, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / k:8.4f} ms/iter x{per_op_n[name] // k:<3d} {name[:110]}")
    return tot / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/vvtpu_extract_trace")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models.retrieval_pipeline import (
        RetrievalPipeline, RetrievalPipelineConfig,
    )

    mean = np.full((3, 256, 256), 110.0, np.float32)
    pipe = RetrievalPipeline(RetrievalPipelineConfig(), mean=mean)  # NHWC
    params = pipe.init(jax.random.PRNGKey(0))
    b = args.batch
    pix = jax.jit(lambda key: jax.random.randint(
        key, (b, 256, 256, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))
    # the reference extraction config: TEST phase → deterministic center
    # crop, mirror off (videovec_extraction.prototxt transform_param);
    # offsets are static so the crop is a fused slice. Pixels are XORed
    # with the step index so no iteration is loop-invariant.
    ho = wo = (256 - 227) // 2

    @jax.jit
    def run(p, px):
        def one(carry, i):
            varying = px ^ i.astype(jnp.uint8)
            emb = pipe.embed_frames(p, varying, ho, wo, False)
            return carry + jnp.sum(emb), i
        out, _ = lax.scan(one, jnp.float32(0.0), jnp.arange(args.k))
        return out

    ms = trace_fn(run, (params, pix), args.out, args.k, args.top)
    if ms:
        print(f"\n=> {b} frames in {ms:.4f} ms = {1000 * b / ms:,.0f} "
              f"frames/s/chip")


if __name__ == "__main__":
    main()
