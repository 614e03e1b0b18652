"""Explicit-collective DP (shard_map + controllable psum wire dtype):
f32 matches the single-device trajectory; bf16-wire stays within gradient
rounding of it."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.parallel import make_mesh
from videovector_tpu.parallel.shard_map_dp import make_dp_train_step, place_dp
from videovector_tpu.solver import (
    SolverConfig, init_solver_state, solver_update,
)


def _setup(rng, key, batch=16):
    cfg = VideoEmbeddingConfig(feature_dim=48, embed_dim=32, num_context=4,
                               num_negatives=6, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    scfg = SolverConfig(base_lr=0.05, momentum=0.9, weight_decay=1e-4,
                        lr_policy="fixed")
    data = rng.randn(batch, cfg.num_roles, cfg.feature_dim).astype(np.float32)
    return model, params, scfg, data


def test_dp_f32_matches_single_device(rng, key):
    model, params, scfg, data = _setup(rng, key)

    def loss_fn(p, b, r):
        return model.loss(p, b, rng=r, train=False)

    mesh = make_mesh(data=4, model=1)
    step = make_dp_train_step(loss_fn, scfg, mesh)
    p, s, batch = place_dp(jax.tree.map(jnp.array, params),
                           init_solver_state(scfg, params),
                           {"data": jnp.asarray(data)}, mesh)

    sp = jax.tree.map(jnp.array, params)
    ss = init_solver_state(scfg, sp)
    rngk = jax.random.PRNGKey(5)
    for _ in range(4):
        (l1, _), g = jax.value_and_grad(
            lambda pp: model.loss(pp, {"data": jnp.asarray(data)},
                                  rng=rngk, train=False),
            has_aux=True)(sp)
        sp, ss = solver_update(scfg, sp, g, ss)
        p, s, m = step(p, s, {"data": jnp.asarray(data)}, rngk)
        np.testing.assert_allclose(float(m["loss"]), float(l1), rtol=2e-5)
    for lname in sp:
        for pname in sp[lname]:
            np.testing.assert_allclose(np.asarray(p[lname][pname]),
                                       np.asarray(sp[lname][pname]),
                                       rtol=1e-4, atol=1e-6)


def test_dp_bf16_wire_close_to_f32(rng, key):
    """bf16 gradient psum (half the ICI bytes — PERF.md roofline): the
    trajectory stays within bf16-gradient rounding of the f32 path, and
    the loss still decreases."""
    model, params, scfg, data = _setup(rng, key)

    def loss_fn(p, b, r):
        return model.loss(p, b, rng=r, train=False)

    mesh = make_mesh(data=4, model=1)
    f32_step = make_dp_train_step(loss_fn, scfg, mesh)
    bf16_step = make_dp_train_step(loss_fn, scfg, mesh,
                                   psum_dtype=jnp.bfloat16)
    p1, s1, _ = place_dp(jax.tree.map(jnp.array, params),
                         init_solver_state(scfg, params),
                         {}, mesh)
    p2, s2, _ = place_dp(jax.tree.map(jnp.array, params),
                         init_solver_state(scfg, params),
                         {}, mesh)
    rngk = jax.random.PRNGKey(5)
    losses1, losses2 = [], []
    for _ in range(6):
        p1, s1, m1 = f32_step(p1, s1, {"data": jnp.asarray(data)}, rngk)
        p2, s2, m2 = bf16_step(p2, s2, {"data": jnp.asarray(data)}, rngk)
        losses1.append(float(m1["loss"]))
        losses2.append(float(m2["loss"]))
    np.testing.assert_allclose(losses2, losses1, rtol=2e-2)
    assert losses2[-1] < losses2[0]
    # params diverge only at bf16-gradient-rounding scale
    w1 = np.asarray(p1["tower"]["w"])
    w2 = np.asarray(p2["tower"]["w"])
    assert np.abs(w1 - w2).max() < 1e-2 * max(np.abs(w1).max(), 1e-6)
