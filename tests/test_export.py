"""Model export round-trip: serialize the embedding inference fn as
StableHLO, reload, same outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.tools.export_model import load_exported, save_exported


def test_export_roundtrip(tmp_path, rng, key):
    cfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16,
                               dropout_rate=0.0, compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    frames = jnp.asarray(rng.randn(4, 3, 32).astype(np.float32))

    def infer(params, frames):
        return model.extract(params, frames)

    path = str(tmp_path / "embed.stablehlo")
    save_exported(path, infer, params, frames)
    loaded = load_exported(path)
    out = loaded.call(params, frames)
    expect = infer(params, frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)
    # artifact is a real serialized blob
    import os
    assert os.path.getsize(path) > 1000
