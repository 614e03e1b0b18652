"""Op unit tests: golden values against NumPy reimplementations of the
reference formulas, plus finite-difference gradient checks
(the JAX analogue of the reference's GradientChecker,
ref:include/caffe/test/test_gradient_check_util.hpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from videovector_tpu import ops


def test_relu_leaky(rng):
    x = jnp.asarray(rng.randn(4, 7).astype(np.float32))
    np.testing.assert_allclose(ops.relu(x), np.maximum(x, 0))
    leaky = ops.relu(x, negative_slope=0.1)
    np.testing.assert_allclose(
        leaky, np.maximum(x, 0) + 0.1 * np.minimum(x, 0), rtol=1e-6)


def test_bnll_matches_log1pexp(rng):
    x = jnp.asarray(rng.randn(20).astype(np.float32) * 10)
    np.testing.assert_allclose(
        ops.bnll(x), np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0),
        rtol=1e-4, atol=1e-6)


def test_power(rng):
    x = jnp.asarray(rng.rand(5, 3).astype(np.float32) + 0.5)
    y = ops.power(x, power=2.0, scale=0.5, shift=1.0)
    np.testing.assert_allclose(y, (1.0 + 0.5 * np.asarray(x)) ** 2, rtol=1e-6)


def test_threshold(rng):
    x = jnp.asarray(rng.randn(10).astype(np.float32))
    np.testing.assert_allclose(ops.threshold(x, threshold=0.2),
                               (np.asarray(x) > 0.2).astype(np.float32))


def test_dropout_train_and_test(key, rng):
    x = jnp.ones((1000,), jnp.float32)
    out = ops.dropout(x, rate=0.9, rng=key)
    kept = np.asarray(out) > 0
    # kept units scaled by 10x
    np.testing.assert_allclose(np.asarray(out)[kept], 10.0, rtol=1e-6)
    assert 0.05 < kept.mean() < 0.2
    np.testing.assert_allclose(
        ops.dropout(x, rate=0.9, rng=key, deterministic=True), x)


def test_inner_product(rng):
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    np.testing.assert_allclose(
        ops.inner_product(x, w, b), np.asarray(x) @ np.asarray(w) + np.asarray(b),
        rtol=1e-5)
    # 4D input flattens trailing dims like Caffe
    x4 = x.reshape(4, 3, 2, 1)
    np.testing.assert_allclose(ops.inner_product(x4, w, b),
                               ops.inner_product(x, w, b), rtol=1e-6)


def test_inner_product_regularization_grad_scale(rng):
    """ref quirk: weight grad scaled by (1 + r/2)
    (ref:src/caffe/layers/inner_product_layer.cpp:80-90)."""
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 3).astype(np.float32))

    def loss(w, reg):
        return jnp.sum(ops.inner_product(x, w, regularization=reg))

    g0 = jax.grad(lambda w: loss(w, 0.0))(w)
    g1 = jax.grad(lambda w: loss(w, 1.0))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0) * 1.5, rtol=1e-5)


def test_l2_normalize_zero_row_grad_is_zero(rng):
    """Regression: zero rows (ReLU+dropout make these common) must yield a
    zero gradient, not NaN — matching the reference backward
    (normalization_layer.cpp:63-112)."""
    x = jnp.asarray(np.vstack([np.zeros((1, 4), np.float32),
                               rng.randn(2, 4).astype(np.float32)]))
    y = ops.l2_normalize_rows(x)
    np.testing.assert_allclose(np.asarray(y)[0], 0.0)
    g = jax.grad(lambda x: jnp.sum(ops.l2_normalize_rows(x) * 3.0))(x)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g)[0], 0.0)


def test_l2_normalize_rows(rng):
    x = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    y = ops.l2_normalize_rows(x)
    norms = np.linalg.norm(np.asarray(x), axis=1)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) / (norms[:, None] + 1e-10), rtol=1e-6)
    check_grads(ops.l2_normalize_rows, (x,), order=1, modes=["rev"],
                atol=1e-2, rtol=1e-2)


def test_sum_reduce(rng):
    x = jnp.asarray(rng.randn(4, 3, 2, 1).astype(np.float32))
    np.testing.assert_allclose(
        ops.sum_reduce(x, 1)[:, 0], np.asarray(x).reshape(4, -1).sum(1), rtol=1e-5)
    out = ops.sum_reduce(x, num_output=10)
    assert out.shape == (4, 10)
    np.testing.assert_allclose(out[:, 3], out[:, 0])
    # backward of broadcast = sum over the broadcast axis
    g = jax.grad(lambda x: jnp.sum(ops.sum_reduce(x, 10) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), np.full(x.shape, 20.0), rtol=1e-6)


def test_eltwise(rng):
    a = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    np.testing.assert_allclose(ops.eltwise_prod(a, b), np.asarray(a) * np.asarray(b))
    np.testing.assert_allclose(
        ops.eltwise_sum(a, b, coeffs=[0.25, 0.75]),
        0.25 * np.asarray(a) + 0.75 * np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(ops.eltwise_max(a, b),
                               np.maximum(np.asarray(a), np.asarray(b)))


def test_id_to_weight_lookup_and_grad(rng):
    table = jnp.asarray(rng.randn(7, 4).astype(np.float32))
    ids = jnp.asarray([[2], [5], [2]], dtype=jnp.int32)
    out = ops.id_to_weight_lookup(ids, table)
    np.testing.assert_allclose(out, np.asarray(table)[[2, 5, 2]])
    # backward = scatter-add into rows (ref id_to_weight_mapping backward)
    g = jax.grad(lambda t: jnp.sum(ops.id_to_weight_lookup(ids, t)))(table)
    expect = np.zeros((7, 4), np.float32)
    expect[2] = 2.0
    expect[5] = 1.0
    np.testing.assert_allclose(np.asarray(g), expect)


def test_mvn(rng):
    x = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    y = ops.mvn(x)
    arr = np.asarray(y)
    np.testing.assert_allclose(arr.mean(axis=(2, 3)), 0.0, atol=1e-5)
    np.testing.assert_allclose(arr.std(axis=(2, 3)), 1.0, atol=1e-3)


def test_id_lookup_out_of_range_is_loud(rng):
    """Out-of-range ids fill with NaN (the loud analogue of the
    reference's bounds CHECK) instead of silently clamping to the last
    table row and corrupting its gradient."""
    from videovector_tpu.ops.embedding import id_to_weight_lookup
    table = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    good = id_to_weight_lookup(jnp.asarray([0, 3]), table)
    assert np.isfinite(np.asarray(good)).all()
    bad = id_to_weight_lookup(jnp.asarray([0, 9]), table)
    assert np.isnan(np.asarray(bad)[1]).all()
    np.testing.assert_array_equal(np.asarray(bad)[0], np.asarray(table)[0])


def test_inner_product_negative_regularization_inert(rng):
    """ref inner_product_layer.cpp:80-90 guards with regularization > 0 —
    a negative value must not scale the weight gradient."""
    from videovector_tpu.ops.linear import inner_product
    x = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 2).astype(np.float32))

    def loss(w_, r):
        return jnp.sum(inner_product(x, w_, regularization=r) ** 2)

    g_neg = jax.grad(lambda w_: loss(w_, -2.0))(w)
    g_off = jax.grad(lambda w_: loss(w_, 0.0))(w)
    np.testing.assert_array_equal(np.asarray(g_neg), np.asarray(g_off))


def test_dropout_rate_one_rejected(rng, key):
    """rate >= 1 would send 0/0 NaNs through the VJP; the reference
    DCHECKs threshold < 1."""
    import pytest
    from videovector_tpu.ops.activations import dropout
    x = jnp.asarray(rng.randn(3, 3).astype(np.float32))
    with pytest.raises(ValueError, match="dropout"):
        dropout(x, rate=1.0, rng=key, deterministic=False)


def test_eltwise_prod_stable_vs_division_grad(rng):
    """stable_prod_grad semantics (ref eltwise_layer.cpp:120-134,
    caffe.proto:728-731): the default stable backward computes each
    input's grad as the product of the OTHERS; stable_prod_grad=false
    reproduces the reference's top/bottom division — identical wherever
    no input is zero, NaN (0/0) exactly at zeros of the divided input."""
    from videovector_tpu import ops

    a = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(4, 3).astype(np.float32))

    def loss(fn):
        return lambda x, y: jnp.sum(fn(x, y) * 2.0)

    gs = jax.grad(loss(lambda x, y: ops.eltwise_prod(x, y)), argnums=(0, 1))
    gd = jax.grad(loss(lambda x, y: ops.eltwise_prod(
        x, y, stable_grad=False)), argnums=(0, 1))
    for s, d in zip(gs(a, b), gd(a, b)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=1e-6)
    # grads match the closed form: d/da sum(2ab) = 2b
    np.testing.assert_allclose(np.asarray(gs(a, b)[0]), 2 * np.asarray(b),
                               rtol=1e-6)

    a0 = a.at[0, 0].set(0.0)
    g_stable = gs(a0, b)[0]
    g_div = gd(a0, b)[0]
    assert np.isfinite(np.asarray(g_stable)).all()
    assert np.isnan(np.asarray(g_div)[0, 0])  # 0/0, the documented hazard
    # everywhere else the division form still agrees
    mask = np.ones_like(np.asarray(a0), bool)
    mask[0, 0] = False
    np.testing.assert_allclose(np.asarray(g_div)[mask],
                               np.asarray(g_stable)[mask], rtol=1e-6)
