"""bf16 activation-path validation: loss within tolerance of f32."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel


def test_bf16_activations_close_to_f32(rng, key):
    kw = dict(feature_dim=64, embed_dim=48, num_context=4, num_negatives=6,
              dropout_rate=0.0, compute_dtype="float32")
    m32 = VideoEmbeddingModel(VideoEmbeddingConfig(**kw))
    m16 = VideoEmbeddingModel(VideoEmbeddingConfig(
        **{**kw, "activation_dtype": "bfloat16"}))
    params = m32.init(key)
    data = jnp.asarray(rng.randn(8, 11, 64).astype(np.float32))
    l32, _ = m32.loss(params, {"data": data}, train=False)
    l16, _ = m16.loss(params, {"data": data}, train=False)
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
    # gradients stay close too
    g32 = jax.grad(lambda p: m32.loss(p, {"data": data}, train=False)[0])(params)
    g16 = jax.grad(lambda p: m16.loss(p, {"data": data}, train=False)[0])(params)
    a, b = np.asarray(g32["tower"]["w"]), np.asarray(g16["tower"]["w"])
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99
