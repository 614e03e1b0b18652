"""Loss golden tests. Forward values are checked against independent NumPy
loops transcribing the reference formulas; gradients via finite differences
with kink-avoidance (the reference GradientChecker's 'kink' mechanism,
ref:include/caffe/test/test_gradient_check_util.hpp:19-252, is emulated by
placing test points away from hinge corners)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from videovector_tpu import ops


# ---------------------------------------------------------------------------
# max_margin_loss — ref:src/caffe/layers/max_margin_loss_layer.cpp
# ---------------------------------------------------------------------------

def _np_max_margin(true_s, bogus_s, margin, norm, w=None):
    true_s, bogus_s = np.asarray(true_s), np.asarray(bogus_s)
    w = np.ones_like(true_s) if w is None else np.broadcast_to(w, true_s.shape)
    diff = true_s - bogus_s
    h = np.maximum(0.0, margin - diff)
    count = h.size
    if norm == "L1":
        loss = np.sum(w * h) / count
    else:
        loss = np.sum(w * h * h) / count
    return loss, float(np.sum(diff < 0))


@pytest.mark.parametrize("norm", ["L1", "L2"])
def test_max_margin_forward(rng, norm):
    t = rng.randn(6, 10).astype(np.float32)
    b = rng.randn(6, 10).astype(np.float32)
    loss, viol = ops.max_margin_loss(jnp.asarray(t), jnp.asarray(b),
                                     margin=2.0, norm=norm)
    el, ev = _np_max_margin(t, b, 2.0, norm)
    np.testing.assert_allclose(float(loss), el, rtol=1e-5)
    assert float(viol) == ev


def test_max_margin_weighted(rng):
    t = rng.randn(4, 5).astype(np.float32)
    b = rng.randn(4, 5).astype(np.float32)
    w = rng.rand(4, 5).astype(np.float32) + 0.1
    for norm in ("L1", "L2"):
        loss, _ = ops.max_margin_loss(jnp.asarray(t), jnp.asarray(b),
                                      margin=1.0, norm=norm, weights=jnp.asarray(w))
        el, _ = _np_max_margin(t, b, 1.0, norm, w)
        np.testing.assert_allclose(float(loss), el, rtol=1e-5)


@pytest.mark.parametrize("norm", ["L1", "L2"])
def test_max_margin_grad(rng, norm):
    # keep margins away from the hinge kink (|margin - diff| > 0.1)
    t = jnp.asarray(rng.randn(5, 4).astype(np.float32) * 3)
    b = jnp.asarray(rng.randn(5, 4).astype(np.float32) * 3)

    def f(t, b):
        return ops.max_margin_loss(t, b, margin=2.0, norm=norm)[0]

    check_grads(f, (t, b), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_max_margin_grad_matches_reference_formula(rng):
    """Analytic check of the reference backward
    (max_margin_loss_layer.cpp:130-214): dL/dbogus = w·2·h/count (L2)."""
    t = rng.randn(3, 7).astype(np.float32)
    b = rng.randn(3, 7).astype(np.float32)
    w = rng.rand(3, 7).astype(np.float32)
    margin = 1.5
    gt, gb = jax.grad(
        lambda t, b: ops.max_margin_loss(t, b, margin=margin, norm="L2",
                                         weights=jnp.asarray(w))[0],
        argnums=(0, 1))(jnp.asarray(t), jnp.asarray(b))
    h = np.maximum(0.0, margin - (t - b))
    expect_b = w * 2.0 * h / h.size
    np.testing.assert_allclose(np.asarray(gb), expect_b, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gt), -expect_b, rtol=1e-5)


# ---------------------------------------------------------------------------
# standard losses
# ---------------------------------------------------------------------------

def test_euclidean_loss(rng):
    a = rng.randn(4, 6).astype(np.float32)
    b = rng.randn(4, 6).astype(np.float32)
    np.testing.assert_allclose(
        float(ops.euclidean_loss(jnp.asarray(a), jnp.asarray(b))),
        np.sum((a - b) ** 2) / 4 / 2, rtol=1e-5)
    np.testing.assert_allclose(
        float(ops.euclidean_loss(jnp.asarray(a), jnp.asarray(b), l1=True)),
        np.sum(np.abs(a - b)) / 4, rtol=1e-5)


@pytest.mark.parametrize("norm", ["L1", "L2"])
def test_hinge_loss(rng, norm):
    s = rng.randn(5, 8).astype(np.float32)
    y = rng.randint(0, 8, size=(5,))
    signed = s.copy()
    signed[np.arange(5), y] *= -1
    h = np.maximum(0.0, 1.0 + signed)
    expect = (h.sum() if norm == "L1" else (h * h).sum()) / 5
    got = ops.hinge_loss(jnp.asarray(s), jnp.asarray(y), norm=norm)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_softmax_loss_vs_multinomial(rng):
    logits = rng.randn(6, 9).astype(np.float32)
    y = rng.randint(0, 9, size=(6,))
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    expect = -np.log(probs[np.arange(6), y]).sum() / 6
    np.testing.assert_allclose(
        float(ops.softmax_loss(jnp.asarray(logits), jnp.asarray(y))),
        expect, rtol=1e-5)
    np.testing.assert_allclose(
        float(ops.multinomial_logistic_loss(jnp.asarray(probs), jnp.asarray(y))),
        expect, rtol=1e-4)


def test_sigmoid_cross_entropy(rng):
    x = rng.randn(4, 5).astype(np.float32)
    t = rng.randint(0, 2, size=(4, 5)).astype(np.float32)
    p = 1 / (1 + np.exp(-x))
    expect = -np.sum(t * np.log(p) + (1 - t) * np.log(1 - p)) / 4
    np.testing.assert_allclose(
        float(ops.sigmoid_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t))),
        expect, rtol=1e-4)


def test_contrastive_loss(rng):
    a = rng.randn(6, 3).astype(np.float32)
    b = rng.randn(6, 3).astype(np.float32)
    y = rng.randint(0, 2, size=(6,))
    d2 = ((a - b) ** 2).sum(1)
    expect = np.sum(y * d2 + (1 - y) * np.maximum(2.5 - d2, 0)) / 6 / 2
    np.testing.assert_allclose(
        float(ops.contrastive_loss(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(y), margin=2.5)),
        expect, rtol=1e-5)


def test_infogain_loss(rng):
    p = rng.rand(4, 3).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    y = rng.randint(0, 3, size=(4,))
    H = rng.rand(3, 3).astype(np.float32)
    expect = -sum(H[y[i], j] * np.log(max(p[i, j], 1e-20))
                  for i in range(4) for j in range(3)) / 4
    np.testing.assert_allclose(
        float(ops.infogain_loss(jnp.asarray(p), jnp.asarray(y), jnp.asarray(H))),
        expect, rtol=1e-4)


def test_accuracy(rng):
    s = rng.randn(20, 6).astype(np.float32)
    y = rng.randint(0, 6, size=(20,))
    top1 = float((s.argmax(1) == y).mean())
    np.testing.assert_allclose(
        float(ops.accuracy(jnp.asarray(s), jnp.asarray(y))), top1)
    order = np.argsort(-s, axis=1)
    top3 = float(np.mean([(y[i] in order[i, :3]) for i in range(20)]))
    np.testing.assert_allclose(
        float(ops.accuracy(jnp.asarray(s), jnp.asarray(y), top_k=3)), top3)
