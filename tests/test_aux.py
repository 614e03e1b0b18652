"""Auxiliary subsystem tests: fillers, V0 upgrade, timer, debug_info,
vis_snapshot."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.config.upgrade import net_needs_upgrade, upgrade_net
from videovector_tpu.core import fillers
from videovector_tpu.graph import Net
from videovector_tpu.utils.timer import StepTimer, Timer


# -- fillers (ref include/caffe/filler.hpp; test strategy mirrors the
#    reference's RNG distribution tests) --------------------------------------

def test_constant_filler(key):
    f = fillers.get_filler({"type": "constant", "value": 3.5})
    np.testing.assert_allclose(np.asarray(f(key, (4, 5))), 3.5)


def test_uniform_filler(key):
    f = fillers.get_filler({"type": "uniform", "min": -2.0, "max": 2.0})
    x = np.asarray(f(key, (10000,)))
    assert x.min() >= -2.0 and x.max() <= 2.0
    assert abs(x.mean()) < 0.1


def test_gaussian_filler_stats(key):
    f = fillers.get_filler({"type": "gaussian", "mean": 1.0, "std": 0.5})
    x = np.asarray(f(key, (20000,)))
    assert abs(x.mean() - 1.0) < 0.02
    assert abs(x.std() - 0.5) < 0.02


def test_gaussian_sparse(key):
    f = fillers.get_filler({"type": "gaussian", "std": 1.0, "sparse": 3})
    x = np.asarray(f(key, (100, 50)))
    # expected ~3 nonzeros per fan_out bucket: p = 3/100
    frac = (x != 0).mean()
    assert 0.01 < frac < 0.06


def test_positive_unitball(key):
    f = fillers.get_filler({"type": "positive_unitball"})
    x = np.asarray(f(key, (7, 13)))
    assert (x >= 0).all()
    np.testing.assert_allclose(x.reshape(7, -1).sum(1), 1.0, rtol=1e-5)


def test_xavier(key):
    f = fillers.get_filler({"type": "xavier"})
    x = np.asarray(f(key, (10, 75)))
    scale = np.sqrt(3.0 / 75)
    assert x.min() >= -scale and x.max() <= scale


# -- V0 upgrade ---------------------------------------------------------------

V0_NET = """
name: "legacy"
layers {
  layer { name: "d" type: "data" source: "db" batchsize: 4 }
  top: "data" top: "label"
}
layers {
  layer { name: "pad1" type: "padding" pad: 2 }
  bottom: "data" top: "padded"
}
layers {
  layer { name: "conv1" type: "conv" num_output: 8 kernelsize: 5 stride: 1
          weight_filler { type: "gaussian" std: 0.01 } }
  bottom: "padded" top: "conv1"
}
layers {
  layer { name: "relu1" type: "relu" }
  bottom: "conv1" top: "conv1"
}
layers {
  layer { name: "pool1" type: "pool" pool: MAX kernelsize: 2 stride: 2 }
  bottom: "conv1" top: "pool1"
}
layers {
  layer { name: "ip1" type: "innerproduct" num_output: 10 }
  bottom: "pool1" top: "ip1"
}
layers {
  layer { name: "loss" type: "softmax_loss" }
  bottom: "ip1" bottom: "label" top: "loss"
}
"""


def test_v0_upgrade_and_run(rng):
    msg = parse(V0_NET)
    assert net_needs_upgrade(msg)
    v1 = upgrade_net(msg)
    layers = v1.get_list("layers")
    names = [l.get("name") for l in layers]
    assert "pad1" not in names  # padding folded away
    conv = next(l for l in layers if l.get("name") == "conv1")
    assert conv.get("type") == "CONVOLUTION"
    assert conv.get_msg("convolution_param").get("pad") == 2
    assert conv.get_msg("convolution_param").get("kernel_size") == 5
    assert [str(b) for b in conv.get_list("bottom")] == ["data"]
    ip = next(l for l in layers if l.get("name") == "ip1")
    assert ip.get_msg("inner_product_param").get("num_output") == 10

    # the upgraded net builds and runs through the engine (Net auto-upgrades)
    net = Net(parse(V0_NET), phase="TRAIN")
    spec = {"data": jax.ShapeDtypeStruct((2, 3, 8, 8), jnp.float32),
            "label": jax.ShapeDtypeStruct((2,), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batch = {"data": jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32)),
             "label": jnp.zeros((2,), jnp.float32)}
    loss, _ = net.apply(params, batch)
    assert np.isfinite(float(loss))


# -- timer / debug_info / vis ------------------------------------------------

def test_timer():
    t = Timer()
    t.start()
    x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    dt = t.stop(fence=x)
    assert dt >= 0
    assert t.calls == 1

    st = StepTimer(window=5)
    for _ in range(6):
        st.tick()
    assert st.steps_per_sec > 0


def test_debug_info_and_vis_snapshot(tmp_path, rng):
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" top: "y" }
    layers { name: "ip" type: INNER_PRODUCT bottom: "x" top: "p"
      inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
    layers { name: "l" type: EUCLIDEAN_LOSS bottom: "p" bottom: "y" top: "loss" }
    """), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((4, 6), jnp.float32),
            "y": jax.ShapeDtypeStruct((4, 3), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batch = {"x": jnp.asarray(rng.randn(4, 6).astype(np.float32)),
             "y": jnp.asarray(rng.randn(4, 3).astype(np.float32))}
    stats = net.debug_info(params, batch)
    assert "p" in stats and "param:ip/w" in stats
    assert all(v >= 0 for v in stats.values())

    from videovector_tpu.tools.vis_snapshot import vis_snapshot
    _, blobs = net.apply(params, batch, return_blobs=True)
    out = str(tmp_path / "vis.json")
    doc = vis_snapshot(net, params, blobs, out)
    loaded = json.load(open(out))
    assert loaded["name"] == doc["name"]
    assert any(l["name"] == "ip" for l in loaded["layers"])
    assert "p" in loaded["blobs"]
    assert loaded["blobs"]["loss"]["shape"] == []


@pytest.mark.skipif(not os.path.exists("/root/reference/src"),
                    reason="reference not mounted")
def test_proto_field_coverage_has_no_gaps():
    """Every caffe.proto field the reference implementation reads is read
    here too (scripts/audit_field_coverage.py; indirect reads and
    XLA-obviated engine switches are enumerated IN the script). A new GAP
    means a reference-visible config knob silently does nothing."""
    import subprocess
    import sys as _sys
    out = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "audit_field_coverage.py")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    first = out.stdout.splitlines()[0]
    assert "(0)" in first, out.stdout
