"""On-device negative sampler tests: distribution, refresh semantics, use
inside a jitted train step."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.data.device_sampler import (
    DeviceReservoir, init_device_reservoir, sample_negatives,
    train_batch_with_device_negatives, update_reservoir,
)


def test_sample_negatives_distinct_within_item(rng, key):
    buf = np.arange(20, dtype=np.float32).repeat(4).reshape(20, 4)
    res = init_device_reservoir(buf, 20, 50)
    negs = np.asarray(sample_negatives(res, key, batch=6, n=10))
    assert negs.shape == (6, 10, 4)
    for b in range(6):
        rows = {tuple(r) for r in negs[b]}
        assert len(rows) == 10          # within-item distinct
    # across the batch, coverage is spread
    all_ids = negs[..., 0].astype(int)
    assert len(np.unique(all_ids)) > 10


def test_update_reservoir_swap_rate(rng, key):
    buf = np.zeros((1000, 2), np.float32)
    res = init_device_reservoir(buf, 1000, 50)
    new = jnp.ones((400, 2), jnp.float32)
    res2 = update_reservoir(res, key, new)
    changed = int((np.asarray(res2.buffer)[:, 0] != 0).sum())
    # ~400 * 0.5 = 200 swaps, minus collisions
    assert 120 < changed < 260


def test_update_reservoir_zero_swap(key):
    buf = np.zeros((50, 2), np.float32)
    res = init_device_reservoir(buf, 50, 0)
    res2 = update_reservoir(res, key, jnp.ones((50, 2)))
    np.testing.assert_allclose(np.asarray(res2.buffer), 0.0)


def test_jitted_train_step_with_device_negatives(rng):
    """Full flagship-style step: reservoir threaded through jit as carry."""
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel

    cfg = VideoEmbeddingConfig(feature_dim=16, embed_dim=8, num_context=4,
                               num_negatives=5, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    seed = rng.randn(30, 16).astype(np.float32)
    res = init_device_reservoir(seed, 30, 50)

    @jax.jit
    def step(params, res, host_part, key):
        batch, res = train_batch_with_device_negatives(res, key, host_part, 5)
        loss, aux = model.loss(params, {"data": batch}, train=False)
        g = jax.grad(lambda p: model.loss(p, {"data": batch},
                                          train=False)[0])(params)
        params = jax.tree.map(lambda w, gw: w - 0.05 * gw, params, g)
        return params, res, loss

    host_part = jnp.asarray(rng.randn(8, 5, 16).astype(np.float32))
    losses = []
    for i in range(15):
        params, res, loss = step(params, res, host_part,
                                 jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # reservoir evolved on device
    assert np.abs(np.asarray(res.buffer) - seed).sum() > 0
