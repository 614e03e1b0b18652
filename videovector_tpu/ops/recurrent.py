"""LSTM family — `lax.scan` recurrences with the reference's exact cell math.

Reference implementations (all hand-written BPTT in C++/CUDA):
  ref:src/caffe/layers/lstm_layer.cpp            (587 LoC + .cu)
  ref:src/caffe/layers/lstm_enc_dec_layer.cpp    (seq2seq composition)
  ref:src/caffe/layers/lstm_conditional_layer.cpp (output fed back as input)
  ref:src/caffe/layers/lstm_linear_layer.cpp     (no tanh on g gate / cell out)
  ref:src/caffe/layers/lstm_single_step_layer.cpp

TPU-native design: the input projection x·Wᵢ for ALL timesteps is one big
(T·B, I)×(I, 4H) MXU matmul outside the scan (the reference does the same
with 4 GEMMs, lstm_layer.cpp:176-196); the scan body holds only the (B, H)×
(H, 4H) recurrent matmul and the elementwise cell. Backward is jax.grad of
the scan (checkpointed by XLA) instead of 260 lines of hand BPTT.

Semantics preserved:
- gate order [i, f, o, g]; i/f/o sigmoid, g tanh (lstm_layer.cpp:240-247)
- per-timestep continuation bits `cont` (T, B): h_{t-1} and c_{t-1} are
  multiplied by cont[t] — 0 starts a new sequence mid-batch (:221-257)
- cross-batch state carry: the final (c, h) is returned for the caller to
  thread into the next batch (the reference keeps next_cell_/next_out_
  inside the layer, :268-271)
- forget-gate bias initialized to 5.0 (:94-96)
- gradient clipping on pre-gate activations via `grad_clip`
  (caffe_bound in BPTT, :378-389)

Parameter layout: w_i (I, 4H), w_h (H, 4H), b (4H,), column blocks in gate
order — data/weights.py converts Caffe's (1, 4, H, I) blobs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LstmState(NamedTuple):
    c: jnp.ndarray   # (B, H)
    h: jnp.ndarray   # (B, H)


def zero_state(batch: int, hidden: int, dtype=jnp.float32) -> LstmState:
    return LstmState(jnp.zeros((batch, hidden), dtype),
                     jnp.zeros((batch, hidden), dtype))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_clip(x, threshold: float):
    """Identity forward; backward clamps to [−threshold, threshold]
    (ref caffe_bound on pre-gate diffs, lstm_layer.cpp:378-389)."""
    return x


def _grad_clip_fwd(x, threshold):
    return x, None


def _grad_clip_bwd(threshold, _, g):
    return (jnp.clip(g, -threshold, threshold),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


def init_lstm_params(key, input_dim: int, hidden: int, *,
                     weight_std: float = 0.1, forget_bias: float = 5.0,
                     output_dim: int | None = None,
                     conditional: bool = False):
    """Gaussian weights + forget-bias-5 init (ref lstm_layer.cpp:70-97).
    With `conditional`, adds h2o/o2h projections
    (ref lstm_conditional_layer.cpp:24-60)."""
    ks = jax.random.split(key, 6)
    p = {
        "w_i": weight_std * jax.random.normal(ks[0], (input_dim, 4 * hidden)),
        "w_h": weight_std * jax.random.normal(ks[1], (hidden, 4 * hidden)),
        "b": jnp.zeros((4 * hidden,)).at[hidden:2 * hidden].set(forget_bias),
    }
    if conditional:
        o = output_dim or input_dim
        p["w_h2o"] = weight_std * jax.random.normal(ks[2], (hidden, o))
        p["b_h2o"] = jnp.zeros((o,))
        p["w_o2h"] = weight_std * jax.random.normal(ks[3], (o, 4 * hidden))
        p["b_o2h"] = jnp.zeros((4 * hidden,))
    return p


def _cell(pre, c_prev_masked, hidden: int, *, linear: bool,
          clip_threshold: float):
    """pre: (B, 4H) pre-gate activations (already include all projections)."""
    if clip_threshold > 0:
        pre = grad_clip(pre, clip_threshold)
    i = jax.nn.sigmoid(pre[:, :hidden])
    f = jax.nn.sigmoid(pre[:, hidden:2 * hidden])
    o = jax.nn.sigmoid(pre[:, 2 * hidden:3 * hidden])
    g_pre = pre[:, 3 * hidden:]
    g = g_pre if linear else jnp.tanh(g_pre)
    c = f * c_prev_masked + i * g
    h = o * (c if linear else jnp.tanh(c))
    return c, h


def lstm(params, x, cont, state: LstmState | None = None, *,
         clip_threshold: float = 0.0, linear: bool = False,
         recurrent_dtype=None, unroll: int = 1):
    """x: (T, B, I); cont: (T, B) continuation bits.
    Returns (h_all (T, B, H), final LstmState).

    recurrent_dtype: optional dtype (e.g. bfloat16) for the RECURRENT GEMM
    operands only — W_h and the masked h carry are cast per step, the
    accumulation stays f32 (preferred_element_type) and the c/h carries
    stay f32. Measured on v5e (PERF.md r4 LSTM ledger); the default (None)
    keeps full-f32 reference numerics.
    unroll: lax.scan unroll factor (the "time-blocked recurrence"
    candidate — with the input projection already hoisted into one
    all-timestep GEMM, blocking k steps per scan iteration IS scan
    unrolling; measured and rejected on v5e, see PERF.md)."""
    t, b, i_dim = x.shape
    hidden = params["w_h"].shape[0]
    if state is None:
        state = zero_state(b, hidden)
    # cell/hidden state carries in f32 (the accumulation dtype) regardless of
    # input/param dtype — keeps the scan carry type stable under bf16 params
    state = LstmState(state.c.astype(jnp.float32),
                      state.h.astype(jnp.float32))

    # all-timestep input projection: one MXU GEMM
    pre_x = jnp.dot(x.reshape(t * b, i_dim), params["w_i"],
                    preferred_element_type=jnp.float32) + params["b"]
    pre_x = pre_x.reshape(t, b, 4 * hidden).astype(jnp.float32)
    w_h = (params["w_h"].astype(recurrent_dtype)
           if recurrent_dtype is not None else params["w_h"])

    def step(carry, inp):
        c_prev, h_prev = carry
        pre_t, cont_t = inp
        mask = cont_t[:, None]
        h_masked = h_prev * mask
        if recurrent_dtype is not None:
            h_masked = h_masked.astype(recurrent_dtype)
        pre = pre_t + jnp.dot(h_masked, w_h,
                              preferred_element_type=jnp.float32)
        c, h = _cell(pre, c_prev * mask, hidden, linear=linear,
                     clip_threshold=clip_threshold)
        return (c, h), h

    (c_fin, h_fin), h_all = lax.scan(step, (state.c, state.h),
                                     (pre_x, cont.astype(jnp.float32)),
                                     unroll=unroll)
    return h_all, LstmState(c_fin, h_fin)


def lstm_single_step(params, x, state: LstmState | None = None, *,
                     clip_threshold: float = 0.0, linear: bool = False):
    """One step (ref lstm_single_step_layer.cpp): x (B, I), optional state
    → (h (B, H), c (B, H))."""
    b = x.shape[0]
    hidden = params["w_h"].shape[0]
    if state is None:
        state = zero_state(b, hidden, x.dtype)
    pre = (jnp.dot(x, params["w_i"], preferred_element_type=jnp.float32)
           + params["b"]
           + jnp.dot(state.h, params["w_h"],
                     preferred_element_type=jnp.float32))
    c, h = _cell(pre, state.c, hidden, linear=linear,
                 clip_threshold=clip_threshold)
    return h, c


def lstm_enc_dec(enc_params, dec_params, enc_x, enc_cont, dec_x, dec_cont, *,
                 clip_threshold: float = 0.0):
    """Seq2seq (ref lstm_enc_dec_layer.cpp:21-207): run the encoder, seed the
    decoder's initial CELL with the encoder's final cell (hidden starts at
    zero), run the decoder. Returns (enc_h, dec_h). The reference manually
    copies the decoder's initial-cell gradient back into the encoder
    (:186-187); here the seeding is a functional data dependency, so autodiff
    propagates it exactly."""
    enc_h, enc_state = lstm(enc_params, enc_x, enc_cont,
                            clip_threshold=clip_threshold)
    b = dec_x.shape[1]
    hidden = dec_params["w_h"].shape[0]
    dec_state = LstmState(enc_state.c, jnp.zeros((b, hidden), dec_x.dtype))
    dec_h, _ = lstm(dec_params, dec_x, dec_cont,
                    state=dec_state, clip_threshold=clip_threshold)
    return enc_h, dec_h


def lstm_conditional(params, x, first_input, cont,
                     state: LstmState | None = None, *,
                     clip_threshold: float = 0.0):
    """Self-feeding decoder (ref lstm_conditional_layer.cpp:169-345):
    pre-gates = x·Wᵢ + b + prev_output·W_o2h + b_o2h + (cont·h)·W_h,
    where prev_output is `first_input` at t=0 and the PREVIOUS timestep's
    emitted output otherwise; output_t = h_t·W_h2o + b_h2o.

    x: (T, B, I); first_input: (B, O); cont: (T, B).
    Returns (outputs (T, B, O), final LstmState)."""
    t, b, i_dim = x.shape
    hidden = params["w_h"].shape[0]
    if state is None:
        state = zero_state(b, hidden)
    state = LstmState(state.c.astype(jnp.float32),
                      state.h.astype(jnp.float32))
    first_input = first_input.astype(jnp.float32)

    pre_x = jnp.dot(x.reshape(t * b, i_dim), params["w_i"],
                    preferred_element_type=jnp.float32) + params["b"]
    pre_x = pre_x.reshape(t, b, 4 * hidden).astype(jnp.float32)

    def step(carry, inp):
        c_prev, h_prev, out_prev = carry
        pre_t, cont_t = inp
        mask = cont_t[:, None]
        pre = (pre_t
               + jnp.dot(out_prev, params["w_o2h"],
                         preferred_element_type=jnp.float32) + params["b_o2h"]
               + jnp.dot(h_prev * mask, params["w_h"],
                         preferred_element_type=jnp.float32))
        c, h = _cell(pre, c_prev * mask, hidden, linear=False,
                     clip_threshold=clip_threshold)
        out = (jnp.dot(h, params["w_h2o"],
                       preferred_element_type=jnp.float32)
               + params["b_h2o"]).astype(jnp.float32)
        return (c, h, out), out

    (c_fin, h_fin, _), outputs = lax.scan(
        step, (state.c, state.h, first_input), (pre_x, cont.astype(jnp.float32)))
    return outputs, LstmState(c_fin, h_fin)
