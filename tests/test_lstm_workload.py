"""LSTM sequence workloads through the graph engine + trainer: an enc-dec
trajectory predictor wired entirely from a prototxt (the reference's
trajectory-forecasting configuration style), trained end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net
from videovector_tpu.solver import SolverConfig, init_solver_state, solver_update

ENC_DEC_NET = """
name: "traj_encdec"
layers { name: "d" type: TRACKING_WINDOWS_DATA
  top: "observed" top: "cont_obs" top: "predicted" top: "cont_pred" top: "gt" }
layers {
  name: "encdec" type: LSTM_ENC_DEC
  bottom: "observed" bottom: "cont_obs" bottom: "predicted" bottom: "cont_pred"
  top: "enc_h" top: "dec_h"
  inner_product_param { num_output: 24
    weight_filler { type: "gaussian" std: 0.15 } }
  lstm_param { clipping_threshold: 5.0 }
}
layers { name: "silence_enc" type: SILENCE bottom: "enc_h" }
layers { name: "fb" type: FLATTEN_BATCH bottom: "dec_h" top: "dec_flat" }
layers {
  name: "readout" type: INNER_PRODUCT bottom: "dec_flat" top: "pred"
  inner_product_param { num_output: 2 weight_filler { type: "xavier" } }
}
layers { name: "gt_fb" type: FLATTEN_BATCH bottom: "gt" top: "gt_flat" }
layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "pred" bottom: "gt_flat"
  top: "l" }
"""


def _linear_tracks(rng, t_obs, t_pred, b, feat=3):
    """Constant-velocity tracks recentered at the last observed point —
    the same statistics the tracking data layer emits."""
    obs = np.zeros((t_obs, b, feat), np.float32)
    pred_in = np.zeros((t_pred, b, feat), np.float32)
    gt = np.zeros((t_pred, b, 2), np.float32)
    for i in range(b):
        vel = rng.randn(2) * 0.3
        ts = np.arange(-(t_obs - 1), t_pred + 1)
        xy = vel[None, :] * ts[:, None]
        obs[:, i, :2] = xy[:t_obs]
        gt[:, i] = xy[t_obs:]
    pred_in[:, :, 2] = 1.0  # encoder bit
    cont_obs = np.ones((t_obs, b), np.float32)
    cont_obs[0] = 0
    cont_pred = np.ones((t_pred, b), np.float32)
    return {"observed": obs, "cont_obs": cont_obs, "predicted": pred_in,
            "cont_pred": cont_pred, "gt": gt}


def test_encdec_prototxt_workload_learns(rng):
    t_obs, t_pred, b = 6, 3, 16
    net = Net(parse(ENC_DEC_NET), phase="TRAIN")
    batch_np = _linear_tracks(rng, t_obs, t_pred, b)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batch.items()}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    assert "encdec" in params
    assert params["encdec"]["enc_w_i"].shape == (3, 4 * 24)

    cfg = SolverConfig(base_lr=0.05, momentum=0.9)
    state = init_solver_state(cfg, params)

    @jax.jit
    def step(p, s, batch):
        loss, grads = jax.value_and_grad(net.loss_fn)(p, batch)
        p2, s2 = solver_update(cfg, p, grads, s)
        return p2, s2, loss

    losses = []
    for i in range(60):
        batch_np = _linear_tracks(rng, t_obs, t_pred, b)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params, state, loss = step(params, state, batch)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5

    # gradient clipping wired through: encoder grads exist and are finite
    g = jax.grad(net.loss_fn)(params, batch)
    assert np.isfinite(np.asarray(g["encdec"]["enc_w_h"])).all()


def test_flatten_batch_semantics(rng):
    """(T, B, H) → (T·B, H) row-major by time (matches the reference's
    FlattenBatch moving the channel axis into batch,
    ref:src/caffe/layers/flatten_batch_layer.cpp:10-28)."""
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "fb" type: FLATTEN_BATCH bottom: "x" top: "y" }
    """), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((3, 2, 4), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.randn(3, 2, 4).astype(np.float32))
    _, blobs = net.apply(params, {"x": x}, return_blobs=True)
    np.testing.assert_allclose(np.asarray(blobs["y"]),
                               np.asarray(x).reshape(6, 4))


# ---------------------------------------------------------------------------
# Cross-batch state carry (ref lstm_layer.cpp:171-173,261-264: next_cell_/
# next_out_ persist across Forward calls; the engine threads LstmState
# explicitly through Net.apply / train()).
# ---------------------------------------------------------------------------

CARRY_NET = """
name: "carry"
layers { name: "d" type: MEMORY_DATA top: "x" top: "cont" top: "y" }
layers { name: "rnn" type: LSTM bottom: "x" bottom: "cont" top: "h"
  inner_product_param { num_output: 8
    weight_filler { type: "gaussian" std: 0.3 } } }
layers { name: "fb" type: FLATTEN_BATCH bottom: "h" top: "hf" }
layers { name: "yf" type: FLATTEN_BATCH bottom: "y" top: "yf" }
layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "hf" bottom: "yf" top: "l" }
"""


def _carry_batches(rng, t=4, b=3, i=5, h=8, n=2):
    out = []
    for j in range(n):
        cont = np.ones((t, b), np.float32)
        if j == 0:
            cont[0] = 0  # sequence starts only in the first batch
        out.append({"x": jnp.asarray(rng.randn(t, b, i).astype(np.float32)),
                    "cont": jnp.asarray(cont),
                    "y": jnp.asarray(rng.randn(t, b, h).astype(np.float32))})
    return out


def test_engine_lstm_carry_matches_functional(rng):
    """Two-batch forward through the prototxt engine with carry must equal
    the functional API run on the concatenated sequence."""
    from videovector_tpu.ops import recurrent
    net = Net(parse(CARRY_NET), phase="TRAIN")
    b1, b2 = _carry_batches(rng)
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in b1.items()}
    params, _ = net.init(jax.random.PRNGKey(3), spec)

    _, blobs1, st1 = net.apply(params, b1, return_blobs=True,
                               return_state=True)
    assert "rnn" in st1
    _, blobs2, st2 = net.apply(params, b2, state=st1, return_blobs=True,
                               return_state=True)

    # functional reference: one scan over the concatenated 8 timesteps
    x_cat = jnp.concatenate([b1["x"], b2["x"]], axis=0)
    cont_cat = jnp.concatenate([b1["cont"], b2["cont"]], axis=0)
    h_cat, fin = recurrent.lstm(params["rnn"], x_cat, cont_cat)
    np.testing.assert_allclose(np.asarray(blobs1["h"]),
                               np.asarray(h_cat[:4]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(blobs2["h"]),
                               np.asarray(h_cat[4:]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2["rnn"].c),
                               np.asarray(fin.c), rtol=1e-6)

    # without carry, batch 2 differs (regression for the silent-reset bug)
    _, blobs2_reset = net.apply(params, b2, return_blobs=True)
    assert not np.allclose(np.asarray(blobs2_reset["h"]),
                           np.asarray(h_cat[4:]), atol=1e-4)

    # cont=0 at batch-2 start neutralizes the carry (sequence restart)
    b2_restart = dict(b2)
    cont = np.asarray(b2["cont"]).copy()
    cont[0] = 0
    b2_restart["cont"] = jnp.asarray(cont)
    _, blobs_a = net.apply(params, b2_restart, return_blobs=True)
    _, blobs_b, _ = net.apply(params, b2_restart, state=st1,
                              return_state=True, return_blobs=True)
    np.testing.assert_allclose(np.asarray(blobs_a["h"]),
                               np.asarray(blobs_b["h"]), rtol=1e-6)


def test_train_loop_threads_lstm_carry(rng):
    """train() over a stateful prototxt net must reproduce a hand-written
    loop that threads the carry explicitly (grads treat carried state as
    constant — per-batch truncated BPTT, exactly the reference's backward
    which never crosses the batch boundary)."""
    import itertools
    from videovector_tpu.solver.train import train

    net = Net(parse(CARRY_NET), phase="TRAIN")
    batches = _carry_batches(rng, n=4)
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batches[0].items()}
    params, _ = net.init(jax.random.PRNGKey(5), spec)

    cfg = SolverConfig(base_lr=0.05, momentum=0.9, max_iter=4)

    def loss_fn(p, batch, key):
        carry_in = batch.get("__carry__")
        feed = {k: v for k, v in batch.items() if k != "__carry__"}
        loss, outputs, carry = net.apply(p, feed, rng=key, state=carry_in,
                                         return_state=True)
        return loss, {"__carry__": carry}

    result = train(loss_fn, params, iter(batches), cfg, jit=True)

    # hand loop with explicit carry
    p2 = jax.tree.map(jnp.array, params)
    st = init_solver_state(cfg, p2)
    carry = None

    def raw_loss(p, batch, carry):
        loss, _, new_carry = net.apply(p, batch, state=carry,
                                       return_state=True)
        return loss, new_carry

    for batch in batches:
        (loss, carry), g = jax.value_and_grad(raw_loss, has_aux=True)(
            p2, batch, carry)
        p2, st = solver_update(cfg, p2, g, st)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        result.params, p2)
