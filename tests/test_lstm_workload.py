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
