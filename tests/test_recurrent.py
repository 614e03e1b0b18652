"""LSTM family tests: torch cross-check of the cell math, cont-bit masking,
cross-batch carry, enc-dec seeding, conditional self-feeding, grad clipping,
finite-difference gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from jax.test_util import check_grads

from videovector_tpu.ops.recurrent import (
    LstmState, grad_clip, init_lstm_params, lstm, lstm_conditional,
    lstm_enc_dec, lstm_single_step, zero_state,
)


def _params(rng, i_dim, hidden, forget_bias=0.0):
    return {
        "w_i": jnp.asarray(rng.randn(i_dim, 4 * hidden).astype(np.float32) * 0.3),
        "w_h": jnp.asarray(rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.3),
        "b": jnp.asarray(np.concatenate([
            rng.randn(hidden), np.full(hidden, forget_bias),
            rng.randn(hidden), rng.randn(hidden)]).astype(np.float32)),
    }


def _to_torch_lstm(params, i_dim, hidden):
    """Map our [i, f, o, g] column blocks to torch's [i, f, g, o] row order."""
    w_i = np.asarray(params["w_i"]).T   # (4H, I), rows [i,f,o,g]
    w_h = np.asarray(params["w_h"]).T
    b = np.asarray(params["b"])

    def reorder_rows(m):
        h = hidden
        return np.concatenate([m[:h], m[h:2*h], m[3*h:], m[2*h:3*h]])

    cell = torch.nn.LSTM(i_dim, hidden)
    with torch.no_grad():
        cell.weight_ih_l0.copy_(torch.from_numpy(reorder_rows(w_i)))
        cell.weight_hh_l0.copy_(torch.from_numpy(reorder_rows(w_h)))
        cell.bias_ih_l0.copy_(torch.from_numpy(reorder_rows(b)))
        cell.bias_hh_l0.zero_()
    return cell


def test_lstm_matches_torch(rng):
    t, b, i_dim, hidden = 5, 3, 4, 6
    params = _params(rng, i_dim, hidden)
    x = rng.randn(t, b, i_dim).astype(np.float32)
    cont = np.ones((t, b), np.float32)
    h_all, state = lstm(params, jnp.asarray(x), jnp.asarray(cont))
    cell = _to_torch_lstm(params, i_dim, hidden)
    with torch.no_grad():
        ref, (h_n, c_n) = cell(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(h_all), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.h), h_n[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.c), c_n[0].numpy(), atol=1e-5)


def test_cont_bits_reset_state(rng):
    """cont=0 at t starts a new sequence: output from t on must equal a fresh
    run of the suffix (ref lstm_layer.cpp:221-257)."""
    t, b, i_dim, hidden = 6, 2, 3, 4
    params = _params(rng, i_dim, hidden)
    x = rng.randn(t, b, i_dim).astype(np.float32)
    cont = np.ones((t, b), np.float32)
    cont[0] = 0.0
    cont[3] = 0.0  # restart at t=3
    h_all, _ = lstm(params, jnp.asarray(x), jnp.asarray(cont))
    h_suffix, _ = lstm(params, jnp.asarray(x[3:]),
                       jnp.asarray(np.concatenate(
                           [np.zeros((1, b), np.float32),
                            np.ones((2, b), np.float32)])))
    np.testing.assert_allclose(np.asarray(h_all[3:]), np.asarray(h_suffix),
                               atol=1e-6)


def test_cross_batch_state_carry(rng):
    """Splitting a sequence across two calls with carried state equals one
    call (the reference's next_cell_/prev_cell_ mechanism)."""
    t, b, i_dim, hidden = 8, 2, 3, 4
    params = _params(rng, i_dim, hidden)
    x = rng.randn(t, b, i_dim).astype(np.float32)
    cont = np.ones((t, b), np.float32)
    cont[0] = 0
    full, _ = lstm(params, jnp.asarray(x), jnp.asarray(cont))
    h1, s1 = lstm(params, jnp.asarray(x[:4]), jnp.asarray(cont[:4]))
    h2, _ = lstm(params, jnp.asarray(x[4:]),
                 jnp.asarray(np.ones((4, b), np.float32)), state=s1)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([h1, h2]), atol=1e-6)


def test_forget_bias_init(key):
    p = init_lstm_params(key, 3, 4)
    b = np.asarray(p["b"])
    np.testing.assert_allclose(b[4:8], 5.0)   # forget block
    np.testing.assert_allclose(b[:4], 0.0)


def test_single_step_equals_t1(rng):
    b, i_dim, hidden = 3, 4, 5
    params = _params(rng, i_dim, hidden)
    x = rng.randn(b, i_dim).astype(np.float32)
    c0 = rng.randn(b, hidden).astype(np.float32)
    h0 = rng.randn(b, hidden).astype(np.float32)
    h, c = lstm_single_step(params, jnp.asarray(x),
                            LstmState(jnp.asarray(c0), jnp.asarray(h0)))
    h_seq, state = lstm(params, jnp.asarray(x[None]),
                        jnp.ones((1, b), jnp.float32),
                        state=LstmState(jnp.asarray(c0), jnp.asarray(h0)))
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_seq[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(state.c), atol=1e-6)


def test_linear_variant(rng):
    """LSTM_LINEAR: no tanh on g or cell output
    (ref lstm_linear_layer.cpp:245,258-259)."""
    b, i_dim, hidden = 2, 3, 4
    params = _params(rng, i_dim, hidden)
    x = rng.randn(1, b, i_dim).astype(np.float32)
    h, state = lstm(params, jnp.asarray(x), jnp.ones((1, b), jnp.float32),
                    linear=True)
    pre = x[0] @ np.asarray(params["w_i"]) + np.asarray(params["b"])
    sig = lambda v: 1 / (1 + np.exp(-v))
    i = sig(pre[:, :4])
    f = sig(pre[:, 4:8])
    o = sig(pre[:, 8:12])
    g = pre[:, 12:]
    c = i * g   # c_prev = 0
    np.testing.assert_allclose(np.asarray(h[0]), o * c, atol=1e-5)


def test_enc_dec_seeding_and_grad_flow(rng):
    te, td, b, i_dim, hidden = 4, 3, 2, 3, 5
    enc_p = _params(rng, i_dim, hidden)
    dec_p = _params(np.random.RandomState(7), i_dim, hidden)
    ex = rng.randn(te, b, i_dim).astype(np.float32)
    dx = rng.randn(td, b, i_dim).astype(np.float32)
    econt = np.ones((te, b), np.float32)
    dcont = np.ones((td, b), np.float32)

    enc_h, dec_h = lstm_enc_dec(enc_p, dec_p, jnp.asarray(ex),
                                jnp.asarray(econt), jnp.asarray(dx),
                                jnp.asarray(dcont))
    assert enc_h.shape == (te, b, hidden)
    assert dec_h.shape == (td, b, hidden)

    # decoder loss gradient reaches the ENCODER weights through the cell seed
    def loss(enc_p):
        _, dh = lstm_enc_dec(enc_p, dec_p, jnp.asarray(ex), jnp.asarray(econt),
                             jnp.asarray(dx), jnp.asarray(dcont))
        return jnp.sum(dh ** 2)

    g = jax.grad(loss)(enc_p)
    assert float(jnp.abs(g["w_i"]).sum()) > 0


def test_conditional_self_feeding(rng):
    t, b, i_dim, hidden, o_dim = 4, 2, 3, 5, 3
    key = jax.random.PRNGKey(0)
    params = init_lstm_params(key, i_dim, hidden, output_dim=o_dim,
                              conditional=True)
    x = rng.randn(t, b, i_dim).astype(np.float32)
    first = rng.randn(b, o_dim).astype(np.float32)
    cont = np.ones((t, b), np.float32)
    out, state = lstm_conditional(params, jnp.asarray(x), jnp.asarray(first),
                                  jnp.asarray(cont))
    assert out.shape == (t, b, o_dim)
    # changing first_input changes ALL timesteps (it feeds the recurrence)
    out2, _ = lstm_conditional(params, jnp.asarray(x),
                               jnp.asarray(first + 1.0), jnp.asarray(cont))
    assert np.abs(np.asarray(out2[-1]) - np.asarray(out[-1])).max() > 1e-6


def test_grad_clip():
    g = jax.grad(lambda x: jnp.sum(grad_clip(x, 0.5) * 10.0))(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), 0.5)
    # forward is identity
    np.testing.assert_allclose(np.asarray(grad_clip(jnp.ones(3) * 7, 0.5)), 7.0)


def test_lstm_check_grads(rng):
    params = _params(rng, 3, 4)
    x = jnp.asarray(rng.randn(3, 2, 3).astype(np.float32))
    cont = jnp.ones((3, 2), jnp.float32)

    def f(p, x):
        h, _ = lstm(p, x, cont)
        return jnp.sum(h ** 2)

    check_grads(f, (params, x), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def test_lstm_graph_layer(rng):
    """LSTM via the prototxt graph engine."""
    from videovector_tpu.config import parse
    from videovector_tpu.graph import Net
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" top: "cont" }
    layers { name: "lstm1" type: LSTM bottom: "x" bottom: "cont" top: "h"
      inner_product_param { num_output: 6
        weight_filler { type: "gaussian" std: 0.1 } }
      lstm_param { clipping_threshold: 1.0 } }
    """), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((4, 2, 3, 1), jnp.float32),
            "cont": jax.ShapeDtypeStruct((4, 2), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batch = {"x": jnp.asarray(rng.randn(4, 2, 3, 1).astype(np.float32)),
             "cont": jnp.ones((4, 2), jnp.float32)}
    _, blobs = net.apply(params, batch, return_blobs=True)
    assert blobs["h"].shape == (4, 2, 6)


def test_lstm_unroll_is_exact(rng):
    """scan(unroll=k) is a scheduling knob — outputs and final state must
    be bit-identical to unroll=1."""
    from videovector_tpu.ops.recurrent import init_lstm_params, lstm
    p = init_lstm_params(jax.random.PRNGKey(0), 5, 7)
    x = jnp.asarray(rng.randn(8, 3, 5).astype(np.float32))
    cont = jnp.ones((8, 3), jnp.float32).at[0].set(0.0)
    h1, s1 = jax.jit(lambda: lstm(p, x, cont))()
    h4, s4 = jax.jit(lambda: lstm(p, x, cont, unroll=4))()
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h4))
    np.testing.assert_array_equal(np.asarray(s1.c), np.asarray(s4.c))


def test_lstm_bf16_recurrent_close_and_f32_carry(rng):
    """recurrent_dtype=bf16 casts only the recurrent GEMM operands: the
    c/h carries stay f32 and the trajectory stays close to full f32."""
    from videovector_tpu.ops.recurrent import init_lstm_params, lstm
    p = init_lstm_params(jax.random.PRNGKey(1), 6, 8)
    x = jnp.asarray(rng.randn(12, 4, 6).astype(np.float32))
    cont = jnp.ones((12, 4), jnp.float32).at[0].set(0.0)
    h32, s32 = lstm(p, x, cont)
    hbf, sbf = lstm(p, x, cont, recurrent_dtype=jnp.bfloat16)
    assert hbf.dtype == h32.dtype == jnp.float32
    assert sbf.c.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(h32), np.asarray(hbf),
                               atol=0.02, rtol=0.05)
