"""End-to-end retrieval pipeline test (small dims; uint8 in, top-k out,
single jitted program)."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.data.transformer import TransformConfig, sample_transform_params
from videovector_tpu.models.mednet import ConvSpec, MedNetConfig
from videovector_tpu.models.retrieval_pipeline import (
    RetrievalPipeline, RetrievalPipelineConfig,
)


def _tiny_pipeline():
    p = RetrievalPipeline(RetrievalPipelineConfig(
        image_hw=(36, 36), crop=32, embed_dim=16, top_k=3,
        compute_dtype="float32"))
    # shrink mednet for the test
    from videovector_tpu.models.mednet import MedNet
    p.mednet = MedNet(MedNetConfig(
        convs=(ConvSpec("conv1", 8, 5, stride=2, pool=True),),
        fc6=32, fc7=64, input_hw=(32, 32), compute_dtype="float32"))
    from videovector_tpu.models.embedding import (
        VideoEmbeddingConfig, VideoEmbeddingModel,
    )
    p.embedder = VideoEmbeddingModel(VideoEmbeddingConfig(
        feature_dim=64, embed_dim=16, dropout_rate=0.0,
        compute_dtype="float32"))
    return p


def test_pipeline_query(rng):
    pipe = _tiny_pipeline()
    params = pipe.init(jax.random.PRNGKey(0))
    cfg = TransformConfig(crop_size=32)

    pix = rng.randint(0, 256, (6, 3, 36, 36)).astype(np.uint8)
    h, w, m = sample_transform_params(6, (36, 36), cfg, train=False,
                                      rng=np.random.RandomState(0))
    emb = pipe.embed_frames(params, jnp.asarray(pix), jnp.asarray(h),
                            jnp.asarray(w), jnp.asarray(m))
    assert emb.shape == (6, 16)
    norms = np.linalg.norm(np.asarray(emb), axis=1)
    np.testing.assert_allclose(norms[norms > 1e-6], 1.0, rtol=1e-5)

    # gallery = those 6 frames labeled as 3 videos; querying with the same
    # frames must retrieve their own video first
    gallery, ids = pipe.build_gallery(
        params,
        [(jnp.asarray(pix), jnp.asarray(h), jnp.asarray(w), jnp.asarray(m))],
        [np.array([1, 1, 2, 2, 3, 3])])
    assert gallery.shape == (3, 16)

    query = jax.jit(pipe.query)
    top_ids, top_scores = query(params, jnp.asarray(pix), jnp.asarray(h),
                                jnp.asarray(w), jnp.asarray(m),
                                gallery, ids)
    assert top_ids.shape == (6, 3)
    # scores sorted descending
    ts = np.asarray(top_scores)
    assert np.all(np.diff(ts, axis=1) <= 1e-6)
