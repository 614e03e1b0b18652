"""Flagship model tests: (1) math parity against the graph engine running the
actual reference prototxt, (2) sharded multi-device training on the virtual
8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse_file
from videovector_tpu.graph import Net
from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.parallel import make_mesh, make_train_step
from videovector_tpu.parallel.train import shard_batch, shard_params
from videovector_tpu.solver import SolverConfig, init_solver_state

REF_TRAIN = "/root/reference/projects/videovec_embedding/mednet_embedding_train.prototxt"


def _small_cfg(**kw):
    base = dict(feature_dim=64, embed_dim=32, num_context=4, num_negatives=10,
                margin=2.0, dropout_rate=0.0, compute_dtype="float32")
    base.update(kw)
    return VideoEmbeddingConfig(**base)


def test_loss_and_shapes(rng, key):
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    data = jnp.asarray(rng.randn(8, cfg.num_roles, cfg.feature_dim)
                       .astype(np.float32))
    loss, aux = model.loss(params, {"data": data}, train=False)
    assert loss.shape == ()
    assert float(loss) > 0
    s_true, s_neg, emb = model.scores(params, data, train=False)
    assert s_true.shape == (8,)
    assert s_neg.shape == (8, 10)
    # embeddings are unit rows
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb["context"]), axis=1), 1.0, rtol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="reference not mounted")
def test_parity_with_reference_prototxt(rng):
    """The idiomatic model computes the same loss as the graph engine running
    the unmodified reference prototxt with the same weights (f32, no
    dropout)."""
    feat = 4096
    # dropout off for a deterministic comparison: rewrite the prototxt's
    # ratio to 0 (the engine refuses silent no-dropout at TRAIN with
    # rng=None when the ratio is > 0)
    msg = parse_file(REF_TRAIN)
    for l in msg.get_list("layers"):
        if l.get("type") == "DROPOUT":
            l.get_msg("dropout_param").fields["dropout_ratio"] = [0.0]
    net = Net(msg, phase="TRAIN")
    spec = {"data": jax.ShapeDtypeStruct((2, 15, feat, 1), jnp.float32)}
    net_params, _ = net.init(jax.random.PRNGKey(0), spec)

    cfg = VideoEmbeddingConfig(feature_dim=feat, embed_dim=4096,
                               num_context=4, num_negatives=10, margin=2.0,
                               dropout_rate=0.0, compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = {"tower": {"w": net_params["fc7"]["w"],
                        "b": net_params["fc7"]["b"]}}

    data = rng.randn(2, 15, feat, 1).astype(np.float32)
    loss_engine, _ = net.apply(net_params, {"data": jnp.asarray(data)}, rng=None)
    loss_model, _ = model.loss(params, {"data": jnp.asarray(data[..., 0])},
                               train=False)
    np.testing.assert_allclose(float(loss_engine), float(loss_model), rtol=1e-4)


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="reference not mounted")
def test_extract_parity_with_reference_test_phase(rng):
    """TEST branch of the reference prototxt (4-context frame average → fc7 →
    normalize → ctxn) vs model.extract with the same weights."""
    feat = 4096
    # the unmodified reference prototxt points id_to_class_file at an AFS
    # path that exists only on the authors' cluster — pre-seed the table
    # (Net's documented opt-out; the reference itself would CHECK-fail here)
    from videovector_tpu.metrics.retrieval import IdToClassMap
    net = Net(parse_file(REF_TRAIN), phase="TEST",
              side={"retrieval_stats": IdToClassMap([0], [0])})
    spec = {"data": jax.ShapeDtypeStruct((3, 4, feat, 1), jnp.float32),
            "video_ids": jax.ShapeDtypeStruct((3,), jnp.float32)}
    net_params, _ = net.init(jax.random.PRNGKey(2), spec)

    cfg = VideoEmbeddingConfig(feature_dim=feat, embed_dim=4096,
                               dropout_rate=0.0, compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = {"tower": {"w": net_params["fc7"]["w"],
                        "b": net_params["fc7"]["b"]}}

    data = rng.randn(3, 4, feat, 1).astype(np.float32)
    _, blobs = net.apply(net_params,
                         {"data": jnp.asarray(data),
                          "video_ids": jnp.zeros((3,), jnp.float32)},
                         return_blobs=True)
    ours = np.asarray(model.extract(params, jnp.asarray(data[..., 0])))
    engine_out = np.asarray(blobs["ip2_norm"])
    np.testing.assert_allclose(engine_out, ours, rtol=2e-4, atol=2e-5)


def test_sharded_training_step_8_devices(rng):
    """DP×TP train step on the virtual 8-device mesh: loss decreases and
    matches the single-device step."""
    assert len(jax.devices()) == 8
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    solver_cfg = SolverConfig(base_lr=0.05, momentum=0.9)
    state = init_solver_state(solver_cfg, params)

    def loss_fn(p, batch, rng):
        return model.loss(p, batch, rng=rng, train=True)

    batch_np = rng.randn(16, cfg.num_roles, cfg.feature_dim).astype(np.float32)

    # single-device reference trajectory
    sp, ss = params, state
    plain_step = jax.jit(lambda p, s, b, r: make_plain(p, s, b, r))

    def make_plain(p, s, b, r):
        from videovector_tpu.solver import solver_update
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b, r)
        p2, s2 = solver_update(solver_cfg, p, g, s)
        return p2, s2, l

    mesh = make_mesh(data=4, model=2)
    step = make_train_step(loss_fn, solver_cfg, mesh)
    p = shard_params(params, mesh, model_axis=True)
    s = init_solver_state(solver_cfg, p)
    rngk = jax.random.PRNGKey(7)

    losses = []
    for i in range(5):
        batch = shard_batch({"data": jnp.asarray(batch_np)}, mesh)
        sp, ss, l_plain = plain_step(sp, ss, {"data": jnp.asarray(batch_np)}, rngk)
        p, s, metrics = step(p, s, batch, rngk)
        np.testing.assert_allclose(float(metrics["loss"]), float(l_plain),
                                   rtol=2e-4)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    # final params agree between sharded and single-device paths
    np.testing.assert_allclose(np.asarray(p["tower"]["w"]),
                               np.asarray(sp["tower"]["w"]), atol=2e-5)


def test_extract_is_normalized(rng, key):
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    frames = jnp.asarray(rng.randn(6, 3, cfg.feature_dim).astype(np.float32))
    out = model.extract(params, frames)
    assert out.shape == (6, cfg.embed_dim)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    # rows with non-zero embedding are unit; relu can zero entire rows
    nz = norms > 1e-6
    np.testing.assert_allclose(norms[nz], 1.0, rtol=1e-5)


def test_zero_embedding_rows_give_zero_gradient(rng, key):
    """With all-zero params every embedding row is zero; the reference's
    normalization backward returns exactly 0 there (normalization_layer.cpp
    zero-row case), so the score gradient must be 0 — not amplified ~1/eps
    as a bare eps-denominator cosine form would give."""
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = jax.tree.map(jnp.zeros_like, model.init(key))
    data = jnp.asarray(rng.randn(4, cfg.num_roles, cfg.feature_dim)
                       .astype(np.float32))

    def loss(p):
        l, _ = model.loss(p, {"data": data}, rng=None, train=False)
        return l

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # hinge at s_true==s_neg==0 contributes margin only; through zero rows
    # the score grad must vanish entirely
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total == 0.0


def test_cosine_form_matches_normalize_then_dot(rng, key):
    """The cosine-form scores must be value-identical to the reference's
    normalize-then-dot pipeline (NORMALIZATION -> ELTWISE PROD -> SUM)."""
    from videovector_tpu import ops
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    data = jnp.asarray(rng.randn(4, cfg.num_roles, cfg.feature_dim)
                       .astype(np.float32))
    s_true, s_neg, _ = model.scores(params, data, rng=None, train=False)

    h = model.embed(params, data, rng=None, train=False)
    target = np.asarray(h[:, 0], np.float32)
    ctx_avg = np.asarray(jnp.mean(h[:, 1:1 + cfg.num_context], axis=1),
                         np.float32)
    negs = np.asarray(h[:, 1 + cfg.num_context:], np.float32)
    eps = 1e-10

    def nrm(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + eps)

    np.testing.assert_allclose(np.asarray(s_true),
                               np.sum(nrm(ctx_avg) * nrm(target), -1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_neg),
        np.einsum("bnd,bd->bn", nrm(negs), nrm(ctx_avg)),
        rtol=1e-5, atol=1e-6)


def test_grad_microbatch_matches_bigbatch(rng, key):
    """grad_microbatch=k (the reference's iter_size accumulation,
    ref:src/caffe/solver.cpp) must produce the same updated params as the
    single big-batch step — losses average, grads average, one update.
    (It is also the large-batch throughput schedule on v5e; PERF.md r3.)"""

    cfg = _small_cfg()  # dropout 0 → rng split has no effect on the math
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    solver_cfg = SolverConfig(base_lr=0.05, momentum=0.9, weight_decay=1e-4,
                              lr_policy="fixed")
    batch_np = rng.randn(16, cfg.num_roles, cfg.feature_dim) \
        .astype(np.float32)

    def loss_fn(p, b, k):
        return model.loss(p, b, rng=k, train=False)

    mesh = make_mesh(data=4, model=1)
    big = make_train_step(loss_fn, solver_cfg, mesh)
    micro = make_train_step(loss_fn, solver_cfg, mesh, grad_microbatch=4,
                            batch_axes={"data": 0})

    # independent copies: the jitted steps donate their param buffers
    p1 = shard_params(jax.tree.map(jnp.array, params), mesh)
    s1 = init_solver_state(solver_cfg, p1)
    p2 = shard_params(jax.tree.map(jnp.array, params), mesh)
    s2 = init_solver_state(solver_cfg, p2)
    rngk = jax.random.PRNGKey(3)
    for _ in range(3):
        batch = shard_batch({"data": jnp.asarray(batch_np)}, mesh)
        p1, s1, m1 = big(p1, s1, batch, rngk)
        batch = shard_batch({"data": jnp.asarray(batch_np)}, mesh)
        p2, s2, m2 = micro(p2, s2, batch, rngk)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
    for k1, l1 in p1.items():
        for k2, a in l1.items():
            np.testing.assert_allclose(np.asarray(a), np.asarray(p2[k1][k2]),
                                       rtol=1e-5, atol=1e-6)


def test_grad_microbatch_role_major_batch_axes(rng, key):
    """Role-major batches (R, B, D) — the fast layout — must microbatch
    along axis 1 via batch_axes; a silent axis-0 split would slice ROLES.
    Parity with the big-batch role-major step proves the split axis."""
    cfg = _small_cfg()
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    solver_cfg = SolverConfig(base_lr=0.05, momentum=0.9, weight_decay=1e-4,
                              lr_policy="fixed")
    batch_np = rng.randn(cfg.num_roles, 16, cfg.feature_dim) \
        .astype(np.float32)

    def loss_fn(p, b, k):
        return model.loss(p, b, rng=k, train=False, role_major=True)

    mesh = make_mesh(data=1, model=1)
    big = make_train_step(loss_fn, solver_cfg, mesh, donate=False)
    micro = make_train_step(loss_fn, solver_cfg, mesh, grad_microbatch=4,
                            batch_axes={"data": 1}, donate=False)
    p1 = jax.tree.map(jnp.array, params)
    s1 = init_solver_state(solver_cfg, p1)
    p2 = jax.tree.map(jnp.array, params)
    s2 = init_solver_state(solver_cfg, p2)
    rngk = jax.random.PRNGKey(3)
    for _ in range(2):
        p1, s1, m1 = big(p1, s1, {"data": jnp.asarray(batch_np)}, rngk)
        p2, s2, m2 = micro(p2, s2, {"data": jnp.asarray(batch_np)}, rngk)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["tower"]["w"]),
                               np.asarray(p2["tower"]["w"]),
                               rtol=1e-5, atol=1e-6)
    # omitting batch_axes must be rejected outright — a default axis-0
    # split would slice ROLES whenever R is divisible (silent corruption)
    bad = make_train_step(loss_fn, solver_cfg, mesh, grad_microbatch=4,
                          donate=False)
    with pytest.raises(Exception, match="batch_axes"):
        bad(jax.tree.map(jnp.array, params),
            init_solver_state(solver_cfg, params),
            {"data": jnp.asarray(batch_np)}, rngk)


def test_per_sample_weights_align_with_batch_axis(rng, key):
    """Per-sample (B,) loss weights must weight each SAMPLE row, not
    broadcast along the negatives axis (a bare (B,) silently weighted
    each NEGATIVE column when B == num_negatives)."""
    cfg = VideoEmbeddingConfig(feature_dim=8, embed_dim=6, num_context=2,
                               num_negatives=3, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    data = jnp.asarray(rng.randn(3, 6, 8).astype(np.float32))  # B=3=N? no: N=3, B=3
    w = np.asarray([1.0, 0.0, 2.0], np.float32)
    loss_w, _ = model.loss(params, {"data": data, "weights": w},
                           train=False)
    # manual: per-sample hinge means weighted by w
    s_true, s_neg, _ = model.scores(params, data, train=False)
    h = np.maximum(0.0, cfg.margin - (np.asarray(s_true)[:, None]
                                      - np.asarray(s_neg)))
    expect = float(np.mean(h * h * w[:, None]))
    np.testing.assert_allclose(float(loss_w), expect, rtol=1e-5)
    # wrong-length weights are rejected
    import pytest
    with pytest.raises(ValueError, match="weights"):
        model.loss(params, {"data": data,
                            "weights": np.ones(5, np.float32)},
                   train=False)


def test_role_count_mismatch_rejected(rng, key):
    """Surplus roles must raise, not silently become phantom negatives."""
    import pytest
    cfg = VideoEmbeddingConfig(feature_dim=8, embed_dim=6, num_context=2,
                               num_negatives=3, dropout_rate=0.0,
                               compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = model.init(key)
    bad = jnp.asarray(rng.randn(2, 7, 8).astype(np.float32))  # 7 != 6 roles
    with pytest.raises(ValueError, match="roles"):
        model.loss(params, {"data": bad}, train=False)
