"""Feature-extraction throughput: frames/sec/chip for the MedNet fc7 path
(BASELINE metric: decode+fc7+embed frames/sec; the reference's
feature_extraction_pretrained_mednet.sh runs batch 50 @ 227×227).

Measures the fused uint8→transform→conv1..fc7→embed→normalize pipeline
(models/retrieval_pipeline.py) — the only H2D traffic is uint8 pixels.

Device-pure methodology (same as bench.py): ITERS batches inside ONE XLA
program via lax.scan, so per-dispatch latency (ms-scale through this
harness's tunnel relay, ~10 us on a real TPU host) cannot contaminate the
number. Each scan step perturbs the pixel crop offsets so no iteration is
loop-invariant.

Reports the reference config (batch 50) plus a large-batch row — batch is
the throughput lever for bulk extraction, the reference's 50 is just its
shell-script default.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def bench_batch(batch: int) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models.retrieval_pipeline import (
        RetrievalPipeline, RetrievalPipelineConfig,
    )

    mean = np.full((3, 256, 256), 110.0, np.float32)
    pipe = RetrievalPipeline(RetrievalPipelineConfig(), mean=mean)
    params = pipe.init(jax.random.PRNGKey(0))

    # pixels generated on device (capture-free: closed-over constants would
    # be inlined into the HLO — hundreds of MB through the remote-compile
    # tunnel; a real host would simply device_put its decoded JPEGs).
    # NHWC: the decode order (cv2/PIL emit HWC rows) and the TPU conv
    # layout — zero layout copies into conv1.
    pix = jax.jit(lambda k: jax.random.randint(
        k, (batch, 256, 256, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))
    # the reference extraction transform is TEST phase: deterministic
    # CENTER crop, mirror off (videovec_extraction.prototxt
    # transform_param; ref:src/caffe/data_transformer.cpp:60-90) — static
    # offsets make the crop a fused slice
    ho = wo = (256 - 227) // 2

    @jax.jit
    def run(p, px):
        def one(carry, i):
            # XOR the step index into the pixels: no iteration is
            # loop-invariant, cost is one fused elementwise pass
            out = pipe.embed_frames(p, px ^ i.astype(jnp.uint8),
                                    ho, wo, False)
            return carry + jnp.sum(out), None
        total, _ = lax.scan(one, jnp.float32(0.0), jnp.arange(ITERS))
        return total

    float(run(params, pix))  # compile + warm
    t0 = time.perf_counter()
    float(run(params, pix))
    dt = (time.perf_counter() - t0) / ITERS
    return batch / dt, dt


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    for batch in (50, 512):
        fps, dt = bench_batch(batch)
        tag = "reference config" if batch == 50 else "large-batch"
        print(f"batch {batch:4d} ({tag}): {fps:,.1f} frames/s/chip "
              f"({dt*1e3:.2f} ms/batch)")


if __name__ == "__main__":
    main()
