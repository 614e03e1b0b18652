"""Weighted max-margin through the engine: direct weights (bottom[2] +
use_direct_weight) and the id→weight csv path — the distance-weighted loss
configuration (ref VideoShotsData output_shot_distance + MaxMarginLoss
weights, max_margin_loss_param caffe.proto:858-868)."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net


def test_direct_weight_margin(rng):
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "ts" top: "ns" top: "w" }
    layers { name: "loss" type: MAX_MARGIN_LOSS
      bottom: "ts" bottom: "ns" bottom: "w" top: "l" top: "v"
      loss_weight: 1.0 loss_weight: 0.0
      max_margin_loss_param { margin: 1.0 norm: L2 use_direct_weight: true } }
    """), phase="TRAIN")
    spec = {k: jax.ShapeDtypeStruct((4, 3), jnp.float32)
            for k in ("ts", "ns", "w")}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    ts = rng.randn(4, 3).astype(np.float32)
    ns = rng.randn(4, 3).astype(np.float32)
    w = rng.rand(4, 3).astype(np.float32)
    loss, _ = net.apply(params, {"ts": jnp.asarray(ts), "ns": jnp.asarray(ns),
                                 "w": jnp.asarray(w)})
    h = np.maximum(0.0, 1.0 - (ts - ns))
    expect = np.sum(w * h * h) / h.size
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_id_to_weight_file_margin(rng, tmp_path):
    csv = tmp_path / "weights.csv"
    csv.write_text("1,0.5\n2,2.0\n3,1.0\n")
    net = Net(parse(f"""
    layers {{ name: "d" type: MEMORY_DATA top: "ts" top: "ns" top: "vid" }}
    layers {{ name: "loss" type: MAX_MARGIN_LOSS
      bottom: "ts" bottom: "ns" bottom: "vid" top: "l"
      max_margin_loss_param {{ margin: 1.0 norm: L1
        id_to_weight_file: "{csv}" }} }}
    """), phase="TRAIN")
    spec = {"ts": jax.ShapeDtypeStruct((2, 3), jnp.float32),
            "ns": jax.ShapeDtypeStruct((2, 3), jnp.float32),
            "vid": jax.ShapeDtypeStruct((2, 3), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    ts = rng.randn(2, 3).astype(np.float32)
    ns = rng.randn(2, 3).astype(np.float32)
    vid = np.array([[1, 2, 3], [2, 1, 3]], np.float32)
    loss, _ = net.apply(params, {"ts": jnp.asarray(ts), "ns": jnp.asarray(ns),
                                 "vid": jnp.asarray(vid)})
    wmap = {1: 0.5, 2: 2.0, 3: 1.0}
    w = np.vectorize(wmap.get)(vid.astype(int))
    h = np.maximum(0.0, 1.0 - (ts - ns))
    expect = np.sum(w * h) / h.size
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
