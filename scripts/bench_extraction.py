"""Feature-extraction throughput: frames/sec/chip for the MedNet fc7 path
(BASELINE metric: decode+fc7+embed frames/sec; the reference's
feature_extraction_pretrained_mednet.sh runs batch 50 @ 227×227).

Measures the fused uint8→transform→conv1..fc7→embed→normalize pipeline
(models/retrieval_pipeline.py) — the only H2D traffic is uint8 pixels.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 50
ITERS = 100


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    import jax.numpy as jnp
    from videovector_tpu.data.transformer import (
        TransformConfig, sample_transform_params,
    )
    from videovector_tpu.models.retrieval_pipeline import (
        RetrievalPipeline, RetrievalPipelineConfig,
    )

    mean = np.full((3, 256, 256), 110.0, np.float32)
    pipe = RetrievalPipeline(RetrievalPipelineConfig(), mean=mean)
    params = pipe.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    pix = jnp.asarray(rng.randint(0, 256, (BATCH, 3, 256, 256))
                      .astype(np.uint8))
    h, w, m = sample_transform_params(BATCH, (256, 256),
                                      TransformConfig(crop_size=227),
                                      train=False, rng=rng)
    h, w, m = jnp.asarray(h), jnp.asarray(w), jnp.asarray(m)

    embed = jax.jit(pipe.embed_frames)
    out = embed(params, pix, h, w, m)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = embed(params, pix, h, w, m)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"frames/sec/chip: {BATCH / dt:,.1f}  ({dt*1e3:.2f} ms / "
          f"batch of {BATCH})")


if __name__ == "__main__":
    main()
