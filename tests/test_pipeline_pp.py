"""Pipeline parallelism (parallel/pipeline.py): the 2-stage encoder/decoder
pipeline over the mesh "model" axis must reproduce the single-device
lstm_enc_dec math exactly — losses, gradients, and training — while
composing with data parallelism over "data"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.ops.recurrent import init_lstm_params
from videovector_tpu.parallel import make_mesh
from videovector_tpu.parallel.pipeline import (
    make_pp_loss_fn, reference_encdec_loss,
)


def _params(rng, feat=3, hidden=12):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 3)
    return {
        "enc": init_lstm_params(ks[0], feat, hidden),
        "dec": init_lstm_params(ks[1], feat, hidden),
        "readout": {
            "w": jnp.asarray(rng.randn(hidden, 2).astype(np.float32)) * 0.3,
            "b": jnp.zeros((2,), jnp.float32),
        },
    }


def _batch(rng, t_obs=6, t_pred=4, b=16, feat=3):
    obs = rng.randn(t_obs, b, feat).astype(np.float32)
    pred_in = rng.randn(t_pred, b, feat).astype(np.float32)
    gt = rng.randn(t_pred, b, 2).astype(np.float32)
    cont_obs = np.ones((t_obs, b), np.float32)
    cont_obs[0] = 0
    cont_pred = np.ones((t_pred, b), np.float32)
    return {k: jnp.asarray(v) for k, v in {
        "observed": obs, "cont_obs": cont_obs, "predicted": pred_in,
        "cont_pred": cont_pred, "gt": gt}.items()}


@pytest.mark.parametrize("num_mb", [1, 2, 4])
def test_pp_loss_matches_single_device(rng, num_mb):
    mesh = make_mesh(data=4, model=2)
    params = _params(rng)
    batch = _batch(rng)
    pp = jax.jit(make_pp_loss_fn(mesh, num_microbatches=num_mb))
    got = float(pp(params, batch))
    want = float(reference_encdec_loss(params, batch))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pp_grads_match_single_device(rng):
    mesh = make_mesh(data=2, model=2)
    params = _params(rng)
    batch = _batch(rng, b=8)
    pp = make_pp_loss_fn(mesh, num_microbatches=2)
    g_pp = jax.jit(jax.grad(pp))(params, batch)
    g_ref = jax.grad(reference_encdec_loss)(params, batch)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    g_ref_map = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    assert flat_pp
    for path, leaf in flat_pp:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(g_ref_map[path]),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=str(path))


def test_pp_gradient_clipping_threads_through(rng):
    """clip_threshold must reach the per-step grad_clip inside both stages
    (ref lstm_layer.cpp caffe_bound on gradients)."""
    mesh = make_mesh(data=2, model=2)
    params = _params(rng)
    batch = _batch(rng, b=8)
    # large readout to force big grads; clipped vs unclipped must differ
    params["readout"]["w"] = params["readout"]["w"] * 100.0
    pp_clip = make_pp_loss_fn(mesh, num_microbatches=2, clip_threshold=1e-4)
    pp_free = make_pp_loss_fn(mesh, num_microbatches=2)
    g_clip = jax.grad(pp_clip)(params, batch)
    g_free = jax.grad(pp_free)(params, batch)
    ref_clip = jax.grad(
        lambda p, b: reference_encdec_loss(p, b, clip_threshold=1e-4)
    )(params, batch)
    np.testing.assert_allclose(np.asarray(g_clip["enc"]["w_i"]),
                               np.asarray(ref_clip["enc"]["w_i"]),
                               rtol=2e-4, atol=1e-7)
    assert not np.allclose(np.asarray(g_clip["enc"]["w_i"]),
                           np.asarray(g_free["enc"]["w_i"]))


def test_pp_training_learns(rng):
    """PP+DP SGD on constant-velocity tracks: loss must drop."""
    mesh = make_mesh(data=4, model=2)
    params = _params(rng, feat=3, hidden=16)
    pp = make_pp_loss_fn(mesh, num_microbatches=2)

    @jax.jit
    def step(p, batch):
        loss, g = jax.value_and_grad(pp)(p, batch)
        p = jax.tree.map(lambda w, d: w - 0.05 * d, p, g)
        return p, loss

    def linear_batch(t_obs=6, t_pred=4, b=16):
        obs = np.zeros((t_obs, b, 3), np.float32)
        pred_in = np.zeros((t_pred, b, 3), np.float32)
        gt = np.zeros((t_pred, b, 2), np.float32)
        for i in range(b):
            vel = rng.randn(2) * 0.3
            ts = np.arange(-(t_obs - 1), t_pred + 1)
            xy = vel[None, :] * ts[:, None]
            obs[:, i, :2] = xy[:t_obs]
            gt[:, i] = xy[t_obs:]
        pred_in[:, :, 2] = 1.0
        cont_obs = np.ones((t_obs, b), np.float32)
        cont_obs[0] = 0
        return {k: jnp.asarray(v) for k, v in {
            "observed": obs, "cont_obs": cont_obs, "predicted": pred_in,
            "cont_pred": np.ones((t_pred, b), np.float32), "gt": gt}.items()}

    losses = []
    for _ in range(40):
        params, loss = step(params, linear_batch())
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])


def test_split_microbatches_honors_batch_axis(rng):
    """The batch_axis parameter drives the reshape, not just the
    divisibility check (it used to hardcode axis 1)."""
    from videovector_tpu.parallel.pipeline import _split_microbatches
    x = jnp.asarray(rng.randn(6, 4, 3).astype(np.float32))
    out1, t1 = _split_microbatches(x, 2, batch_axis=1)   # (2, 6, 2, 3)
    assert out1.shape == (2, 6, 2, 3) and t1 == 6
    np.testing.assert_array_equal(np.asarray(out1[0]),
                                  np.asarray(x[:, :2]))
    out0, t0 = _split_microbatches(x, 3, batch_axis=0)   # (3, 2, 4, 3)
    assert out0.shape == (3, 2, 4, 3) and t0 == 6
    np.testing.assert_array_equal(np.asarray(out0[1]),
                                  np.asarray(x[2:4]))
