"""Dtype-matrix tests — the analogue of the reference's TestDtypesAndDevices
typed fixtures (ref:include/caffe/test/test_caffe_main.hpp:30-72): the same
op bodies exercised across float32/bfloat16 (XLA compiles one definition for
every backend, so the reference's CPU/GPU device axis is moot; dtype is the
axis that matters on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu import ops

DTYPES = [jnp.float32, jnp.bfloat16]


def _tol(dtype):
    return dict(rtol=1e-5, atol=1e-6) if dtype == jnp.float32 \
        else dict(rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("dtype", DTYPES)
def test_activations_dtype(rng, dtype):
    x = jnp.asarray(rng.randn(6, 8).astype(np.float32)).astype(dtype)
    for fn in (ops.relu, ops.sigmoid, ops.tanh, ops.bnll, ops.absval):
        out = fn(x)
        assert out.dtype == dtype
        assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize("dtype", DTYPES)
def test_inner_product_dtype(rng, dtype):
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(6, 3).astype(np.float32)).astype(dtype)
    out = ops.inner_product(x, w)
    expect = np.asarray(x, np.float32) @ np.asarray(w, np.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), expect, **_tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
def test_l2_normalize_dtype(rng, dtype):
    x = jnp.asarray(rng.randn(5, 8).astype(np.float32)).astype(dtype)
    out = np.asarray(ops.l2_normalize_rows(x), np.float32)
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms[norms > 0.5], 1.0, **_tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
def test_max_margin_dtype(rng, dtype):
    t = jnp.asarray(rng.randn(4, 5).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rng.randn(4, 5).astype(np.float32)).astype(dtype)
    loss, viol = ops.max_margin_loss(t, b, margin=1.0, norm="L2")
    lf, vf = ops.max_margin_loss(t.astype(jnp.float32),
                                 b.astype(jnp.float32), margin=1.0, norm="L2")
    np.testing.assert_allclose(float(loss), float(lf), **_tol(dtype))
    assert float(viol) == float(vf)


@pytest.mark.parametrize("dtype", DTYPES)
def test_lstm_dtype(rng, dtype):
    from videovector_tpu.ops.recurrent import init_lstm_params, lstm
    params = jax.tree.map(lambda a: a.astype(dtype),
                          init_lstm_params(jax.random.PRNGKey(0), 4, 6))
    x = jnp.asarray(rng.randn(3, 2, 4).astype(np.float32)).astype(dtype)
    h, state = lstm(params, x, jnp.ones((3, 2), dtype))
    assert np.isfinite(np.asarray(h, np.float32)).all()


def test_profiler_trace_smoke(tmp_path):
    from videovector_tpu.utils.timer import trace
    with trace(str(tmp_path / "trace")):
        x = jnp.ones((32, 32)) @ jnp.ones((32, 32))
        float(jnp.sum(x))
    import os
    assert any("plugins" in d or d for d in os.listdir(tmp_path / "trace"))
