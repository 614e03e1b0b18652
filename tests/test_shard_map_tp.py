"""Explicit-collective TP (shard_map + psum) matches the single-device model."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.parallel import make_mesh
from videovector_tpu.parallel.shard_map_tp import make_tp_loss_fn, place_tp_params
from videovector_tpu.parallel.train import shard_batch


def test_shard_map_tp_matches_reference_model(rng):
    cfg = VideoEmbeddingConfig(feature_dim=64, embed_dim=32, num_context=4,
                               num_negatives=6, margin=1.5, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    data = jnp.asarray(rng.randn(16, cfg.num_roles, 64).astype(np.float32))

    ref_loss, ref_aux = model.loss(params, {"data": data}, train=False)

    mesh = make_mesh(data=4, model=2)
    tp_loss_fn = make_tp_loss_fn(cfg, mesh)
    tp_params = place_tp_params(params, mesh)
    batch = shard_batch({"data": data}, mesh)
    loss, aux = jax.jit(tp_loss_fn)(tp_params, batch, None)

    # bf16 tower GEMM in the TP path vs f32 reference: loose tolerance
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-2)
    np.testing.assert_allclose(float(aux["violations"]),
                               float(ref_aux["violations"]), atol=2)


def test_shard_map_tp_grads_flow_and_are_sharded(rng):
    cfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_context=4,
                               num_negatives=4, dropout_rate=0.9,
                               compute_dtype="float32")
    mesh = make_mesh(data=4, model=2)
    tp_loss_fn = make_tp_loss_fn(cfg, mesh)
    model = VideoEmbeddingModel(cfg)
    tp_params = place_tp_params(model.init(jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(
        {"data": jnp.asarray(rng.randn(8, cfg.num_roles, 32)
                             .astype(np.float32))}, mesh)

    g = jax.jit(jax.grad(lambda p, b: tp_loss_fn(p, b,
                                                 jax.random.PRNGKey(1))[0]))(
        tp_params, batch)
    gw = g["tower"]["w"]
    assert float(jnp.sum(jnp.abs(gw))) > 0
    # gradient keeps the column-sharded layout
    from jax.sharding import PartitionSpec as P
    assert gw.sharding.spec == P(None, "model")
