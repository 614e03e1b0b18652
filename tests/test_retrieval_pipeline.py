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


def _tiny_pipeline(layout="NCHW"):
    p = RetrievalPipeline(RetrievalPipelineConfig(
        image_hw=(36, 36), crop=32, embed_dim=16, top_k=3,
        compute_dtype="float32", pixels_layout=layout))
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


def test_pipeline_nhwc_layout_matches_nchw(rng):
    """The NHWC fast path (decode-order frames, zero layout copies into
    conv1) must produce identical embeddings to the NCHW/Caffe-blob path."""
    nchw = _tiny_pipeline("NCHW")
    nhwc = _tiny_pipeline("NHWC")
    params = nchw.init(jax.random.PRNGKey(0))
    cfg = TransformConfig(crop_size=32)
    pix = rng.randint(0, 256, (6, 3, 36, 36)).astype(np.uint8)
    h, w, m = sample_transform_params(6, (36, 36), cfg, train=True,
                                      rng=np.random.RandomState(0))
    a = nchw.embed_frames(params, jnp.asarray(pix), jnp.asarray(h),
                          jnp.asarray(w), jnp.asarray(m))
    b = nhwc.embed_frames(params, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                          jnp.asarray(h), jnp.asarray(w), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_nhwc_with_mean(rng):
    """NHWC transform also indexes a CHW mean correctly (transposed once
    at build time)."""
    from videovector_tpu.data.transformer import make_batch_transform
    mean = rng.rand(3, 8, 8).astype(np.float32)
    cfg = TransformConfig(crop_size=4, mirror=True, scale=2.0)
    f_nchw = jax.jit(make_batch_transform(cfg, mean, (8, 8), layout="NCHW"))
    f_nhwc = jax.jit(make_batch_transform(cfg, mean, (8, 8), layout="NHWC"))
    pix = rng.randint(0, 256, size=(5, 3, 8, 8)).astype(np.uint8)
    h, w, m = sample_transform_params(5, (8, 8), cfg, train=True,
                                      rng=np.random.RandomState(0))
    a = np.asarray(f_nchw(jnp.asarray(pix), jnp.asarray(h), jnp.asarray(w),
                          jnp.asarray(m)))
    b = np.asarray(f_nhwc(jnp.asarray(pix.transpose(0, 2, 3, 1)),
                          jnp.asarray(h), jnp.asarray(w), jnp.asarray(m)))
    np.testing.assert_allclose(a, b.transpose(0, 3, 1, 2), rtol=1e-5)


def test_bf16_extraction_preserves_retrieval_quality(rng):
    """The bf16 throughput mode diverges ~1-2% rms from f32 features
    (PARITY bf16-default) — this checks what users actually care about:
    retrieval RANKING is preserved. Strong class structure, f32 vs bf16
    pipelines, same weights; mAP/hit@1 must agree closely."""
    from videovector_tpu.metrics.retrieval import retrieval_stats
    import jax.numpy as jnp

    f32 = _tiny_pipeline("NHWC")
    bf16 = _tiny_pipeline("NHWC")
    from videovector_tpu.models.mednet import MedNet, MedNetConfig, ConvSpec
    for pipe, dt in ((f32, "float32"), (bf16, "bfloat16")):
        # lrn=True: the riskiest bf16-chain op (scale = 1 + eps-scale sums)
        # must be in the tested path, not just the conv
        pipe.mednet = MedNet(MedNetConfig(
            convs=(ConvSpec("conv1", 8, 5, stride=2, pool=True, lrn=True),
                   ConvSpec("conv2", 8, 3, pad=1)),
            fc6=32, fc7=64, input_hw=(32, 32), compute_dtype=dt))
    params = f32.init(jax.random.PRNGKey(0))

    # 24 frames in 6 classes: per-class pixel motifs + noise
    n, n_cls = 24, 6
    motifs = rng.randint(0, 256, (n_cls, 36, 36, 3))
    cls = np.arange(n) % n_cls
    pix = np.clip(motifs[cls] + rng.randint(-30, 30, (n, 36, 36, 3)),
                  0, 255).astype(np.uint8)
    h = np.full(n, 2); w = np.full(n, 2); m = np.zeros(n, bool)

    stats = {}
    for name, pipe in (("f32", f32), ("bf16", bf16)):
        emb = np.asarray(pipe.embed_frames(
            params, jnp.asarray(pix), jnp.asarray(h), jnp.asarray(w),
            jnp.asarray(m)), np.float32)
        out = retrieval_stats(jnp.asarray(emb), jnp.arange(n),
                              jnp.asarray(cls))
        stats[name] = {k: float(v) for k, v in out.items()}
    assert abs(stats["bf16"]["mean_ap"] - stats["f32"]["mean_ap"]) < 0.02, \
        stats
    assert abs(stats["bf16"]["hit_at_1"] - stats["f32"]["hit_at_1"]) <= 0.1
