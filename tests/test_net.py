"""Graph-engine tests — inline prototxt strings, mirroring the reference's
NetTest pattern (ref:src/caffe/test/test_net.cpp:26-60), plus the real
flagship config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse, parse_file
from videovector_tpu.graph import Net

REF_TRAIN = "/root/reference/projects/videovec_embedding/mednet_embedding_train.prototxt"


SIMPLE_NET = """
name: "tiny"
layers { name: "data" type: MEMORY_DATA top: "x" top: "y" }
layers {
  name: "ip1" type: INNER_PRODUCT bottom: "x" top: "h"
  inner_product_param { num_output: 8 weight_filler { type: "gaussian" std: 0.1 } }
}
layers { name: "relu1" type: RELU bottom: "h" top: "h" }
layers {
  name: "ip2" type: INNER_PRODUCT bottom: "h" top: "pred"
  inner_product_param { num_output: 3 weight_filler { type: "xavier" } }
}
layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "pred" bottom: "y" top: "l" }
"""


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def test_simple_net_forward_and_grad(rng):
    net = Net(parse(SIMPLE_NET), phase="TRAIN")
    batch_spec = {"x": _spec((4, 5)), "y": _spec((4, 3))}
    params, meta = net.init(jax.random.PRNGKey(0), batch_spec)
    assert set(params.keys()) == {"ip1", "ip2"}
    assert params["ip1"]["w"].shape == (5, 8)

    batch = {"x": jnp.asarray(rng.randn(4, 5).astype(np.float32)),
             "y": jnp.asarray(rng.randn(4, 3).astype(np.float32))}
    loss, outputs = net.apply(params, batch)
    assert loss.shape == ()
    assert "l" in outputs

    # in-place relu rebinding worked: h exists and is post-relu
    _, blobs = net.apply(params, batch, return_blobs=True)
    assert np.all(np.asarray(blobs["h"]) >= 0)

    # a few SGD steps reduce the loss
    step = jax.jit(lambda p, b: (net.loss_fn(p, b),
                                 jax.grad(net.loss_fn)(p, b)))
    p = params
    l0, _ = step(p, batch)
    for _ in range(20):
        l, g = step(p, batch)
        p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
    l1, _ = step(p, batch)
    assert float(l1) < float(l0) * 0.5


def test_phase_filtering():
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "a" type: RELU bottom: "x" top: "x" include: { phase: TRAIN } }
    layers { name: "b" type: TANH bottom: "x" top: "x" include: { phase: TEST } }
    layers { name: "c" type: ABSVAL bottom: "x" top: "x" exclude: { phase: TEST } }
    """)
    train = Net(msg, phase="TRAIN")
    test = Net(msg, phase="TEST")
    assert [l.get("name") for l in train.layers] == ["d", "a", "c"]
    assert [l.get("name") for l in test.layers] == ["d", "b"]


def test_param_sharing(rng):
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x1" top: "x2" }
    layers { name: "ipA" type: INNER_PRODUCT bottom: "x1" top: "h1"
      param: "shared_w" param: "shared_b"
      inner_product_param { num_output: 4 weight_filler { type: "gaussian" } } }
    layers { name: "ipB" type: INNER_PRODUCT bottom: "x2" top: "h2"
      param: "shared_w" param: "shared_b"
      inner_product_param { num_output: 4 weight_filler { type: "gaussian" } } }
    """)
    net = Net(msg, phase="TRAIN")
    spec = {"x1": _spec((2, 6)), "x2": _spec((2, 6))}
    params, meta = net.init(jax.random.PRNGKey(1), spec)
    # ipB holds no arrays; it references ipA's
    assert "ipB" not in params or not params["ipB"]
    assert meta["ipB"]["w"].shared_owner == "ipA"

    x = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    _, blobs = net.apply(params, {"x1": x, "x2": x}, return_blobs=True)
    np.testing.assert_allclose(np.asarray(blobs["h1"]), np.asarray(blobs["h2"]))

    # gradient accumulates across both uses (ref Net::Update shared-diff
    # accumulation, net.cpp:804-839)
    def loss_single(p):
        l, b = net.apply(p, {"x1": x, "x2": jnp.zeros_like(x)}, return_blobs=True)
        return jnp.sum(b["h1"])

    def loss_double(p):
        l, b = net.apply(p, {"x1": x, "x2": x}, return_blobs=True)
        return jnp.sum(b["h1"]) + jnp.sum(b["h2"])

    g1 = jax.grad(loss_single)(params)["ipA"]["w"]
    g2 = jax.grad(loss_double)(params)["ipA"]["w"]
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(g1), rtol=1e-5)


def test_auto_top_blobs(rng):
    """Loss layers may omit `top:` — the engine auto-creates the implicit
    loss top (ref AutoTopBlobs, include/caffe/layer.hpp:258)."""
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "p" top: "y" }
    layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "p" bottom: "y" }
    """), phase="TRAIN")
    spec = {"p": _spec((3, 2)), "y": _spec((3, 2))}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    batch = {"p": jnp.asarray(rng.randn(3, 2).astype(np.float32)),
             "y": jnp.asarray(rng.randn(3, 2).astype(np.float32))}
    loss, outputs = net.apply(params, batch)
    assert "loss_auto_top_0" in outputs
    np.testing.assert_allclose(float(loss), float(outputs["loss_auto_top_0"]),
                               rtol=1e-6)


def test_loss_weight_override(rng):
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "p" top: "y" }
    layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "p" bottom: "y" top: "l"
             loss_weight: 2.5 }
    """)
    net = Net(msg, phase="TRAIN")
    spec = {"p": _spec((3, 2)), "y": _spec((3, 2))}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    p = jnp.asarray(rng.randn(3, 2).astype(np.float32))
    y = jnp.asarray(rng.randn(3, 2).astype(np.float32))
    loss, outs = net.apply(params, {"p": p, "y": y})
    np.testing.assert_allclose(float(loss), 2.5 * float(outs["l"]), rtol=1e-6)


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="reference not mounted")
class TestFlagshipPrototxt:
    """Run the real mednet_embedding_train.prototxt through the engine
    (feature dim 4096, roles 1+4+10; batch scaled down for test speed)."""

    def _build(self, batch=2, feat=4096):
        net = Net(parse_file(REF_TRAIN), phase="TRAIN")
        spec = {"data": _spec((batch, 15, feat, 1))}
        params, meta = net.init(jax.random.PRNGKey(0), spec)
        return net, params

    def test_train_graph_runs(self, rng):
        net, params = self._build()
        data = jnp.asarray(rng.randn(2, 15, 4096, 1).astype(np.float32))
        loss, outputs = net.apply(params, {"data": data},
                                  rng=jax.random.PRNGKey(1))
        # loss + margin-violations diagnostic top
        assert net.loss_weights["max_margin_loss"] == [1.0, 0.0]
        assert float(loss) > 0
        assert "train_violations" in outputs

    def test_train_graph_grads_flow(self, rng):
        net, params = self._build()
        data = jnp.asarray(rng.randn(2, 15, 4096, 1).astype(np.float32))
        g = jax.grad(net.loss_fn)(params, {"data": data},
                                  jax.random.PRNGKey(1))
        gw = np.asarray(g["fc7"]["w"]) if "fc7" in g else None
        assert gw is not None and np.abs(gw).sum() > 0


def test_permissive_share_reshapes(rng):
    """A count-matched, shape-mismatched PERMISSIVE share views the owner's
    data through the consumer's blob shape (ref AppendParam DimCheckMode,
    net.cpp:405-464): ipA is 6->4 (w: 4x6), ipB is 4->6 (w: 6x4) over the
    same 24 elements."""
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x1" top: "x2" }
    layers { name: "ipA" type: INNER_PRODUCT bottom: "x1" top: "h1"
      param: "shared_w" param: "biasA"
      inner_product_param { num_output: 4 weight_filler { type: "gaussian" } } }
    layers { name: "ipB" type: INNER_PRODUCT bottom: "x2" top: "h2"
      param: "shared_w" param: "biasB"
      blob_share_mode: PERMISSIVE blob_share_mode: PERMISSIVE
      inner_product_param { num_output: 6 weight_filler { type: "gaussian" } } }
    """)
    net = Net(msg, phase="TRAIN")
    spec = {"x1": _spec((2, 6)), "x2": _spec((2, 4))}
    params, meta = net.init(jax.random.PRNGKey(1), spec)
    assert meta["ipB"]["w"].shared_owner == "ipA"
    assert meta["ipB"]["w"].shared_shape is not None

    x1 = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    x2 = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    _, blobs = net.apply(params, {"x1": x1, "x2": x2}, return_blobs=True)
    assert blobs["h1"].shape == (2, 4)
    assert blobs["h2"].shape == (2, 6)

    # h2 must use ipA's storage viewed in ipB's layout
    w_owner = np.asarray(params["ipA"]["w"])
    w_viewed = w_owner.reshape(meta["ipB"]["w"].shared_shape)
    expect = x2 @ jnp.asarray(w_viewed) + params["ipB"]["b"] \
        if "b" in params.get("ipB", {}) else None
    if expect is not None:
        np.testing.assert_allclose(np.asarray(blobs["h2"]),
                                   np.asarray(expect), rtol=1e-5)

    # gradients flow back to the owner through the reshape
    def loss(p):
        _, b = net.apply(p, {"x1": x1, "x2": x2}, return_blobs=True)
        return jnp.sum(b["h2"] ** 2)
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["ipA"]["w"]).sum()) > 0


def test_strict_share_shape_mismatch_raises():
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x1" top: "x2" }
    layers { name: "ipA" type: INNER_PRODUCT bottom: "x1" top: "h1"
      param: "shared_w"
      inner_product_param { num_output: 4 weight_filler { type: "gaussian" } } }
    layers { name: "ipB" type: INNER_PRODUCT bottom: "x2" top: "h2"
      param: "shared_w"
      inner_product_param { num_output: 6 weight_filler { type: "gaussian" } } }
    """)
    net = Net(msg, phase="TRAIN")
    spec = {"x1": _spec((2, 6)), "x2": _spec((2, 4))}
    with pytest.raises(ValueError, match="shape mismatch"):
        net.init(jax.random.PRNGKey(1), spec)


def test_slice_non_divisible_raises(rng):
    """SLICE without slice_point on a non-divisible dim must fail loudly
    (ref slice_layer.cpp:60-66 CHECK_EQ), not silently shift shapes."""
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "s" type: SLICE bottom: "x" top: "a" top: "b" top: "c"
      slice_param { slice_dim: 1 } }
    """), phase="TRAIN")
    with pytest.raises(ValueError, match="not divisible"):
        net.init(jax.random.PRNGKey(0), {"x": _spec((2, 7))})


def test_infogain_matrix_loads_from_source_file(tmp_path, rng):
    """infogain_loss_param.source: the H matrix loads from a BlobProto
    binary at net build (ref infogain_loss_layer.cpp:18-24) — no manual
    side-channel injection needed."""
    import os
    from videovector_tpu.data.wire import BlobProto
    from videovector_tpu.ops import losses as ops_losses

    H = np.asarray([[1.0, 0.2], [0.3, 1.0]], np.float32)
    path = str(tmp_path / "H.binaryproto")
    with open(path, "wb") as f:
        f.write(BlobProto.from_array(H).encode())

    net = Net(parse(f"""
    input: "probs" input: "labels"
    layers {{ name: "ig" type: INFOGAIN_LOSS bottom: "probs" bottom: "labels"
      top: "loss" infogain_loss_param {{ source: "{path}" }} }}
    """), phase="TRAIN")
    probs = np.abs(rng.rand(4, 2).astype(np.float32)) + 0.1
    probs /= probs.sum(1, keepdims=True)
    labels = np.asarray([0, 1, 1, 0], np.float32)
    spec = {"probs": jax.ShapeDtypeStruct((4, 2), jnp.float32),
            "labels": jax.ShapeDtypeStruct((4,), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    loss, _ = net.apply(params, {"probs": jnp.asarray(probs),
                                 "labels": jnp.asarray(labels)})
    want = float(ops_losses.infogain_loss(jnp.asarray(probs),
                                          jnp.asarray(labels),
                                          jnp.asarray(H)))
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)


def test_id_to_weight_mapping_engine_layer(rng):
    """ID_TO_WEIGHT_MAPPING from a prototxt: the table is
    (max_ids, num_output) — the reference reads `max_ids` for K_
    (ref id_to_weight_mapping_layer.cpp:16-29; a `num_ids` name existed
    nowhere in caffe.proto). Forward gathers rows; backward scatter-adds
    only the touched rows (no grad to the ids)."""
    net = Net(parse("""
    input: "ids"
    layers { name: "emb" type: ID_TO_WEIGHT_MAPPING bottom: "ids" top: "w"
      id_to_weight_mapping_param { max_ids: 7 num_output: 3
        weight_filler { type: "gaussian" std: 1.0 } } }
    layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "w" bottom: "w0"
      top: "l" }
    input: "w0"
    """), phase="TRAIN")
    ids = jnp.asarray([[2], [5], [2]], jnp.float32)  # ref feeds float ids
    spec = {"ids": jax.ShapeDtypeStruct((3, 1), jnp.float32),
            "w0": jax.ShapeDtypeStruct((3, 3), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    assert params["emb"]["table"].shape == (7, 3)
    w0 = jnp.zeros((3, 3), jnp.float32)
    _, blobs = net.apply(params, {"ids": ids, "w0": w0}, return_blobs=True)
    table = np.asarray(params["emb"]["table"])
    np.testing.assert_array_equal(np.asarray(blobs["w"]),
                                  table[[2, 5, 2]])
    g = jax.grad(net.loss_fn)(params, {"ids": ids, "w0": w0})
    gt = np.asarray(g["emb"]["table"])
    # untouched rows get zero grad; row 2 accumulates two samples' grads
    assert np.all(gt[[0, 1, 3, 4, 6]] == 0)
    assert np.any(gt[2] != 0) and np.any(gt[5] != 0)


def test_memory_data_param_positivity_check():
    """A MEMORY_DATA layer that DECLARES memory_data_param must declare all
    four dims positive (ref memory_data_layer.cpp:18-20 CHECK_GT); a
    param-less MEMORY_DATA keeps taking shapes from the fed batch."""
    bad = """
    layers { name: "d" type: MEMORY_DATA top: "x" top: "y"
      memory_data_param { batch_size: 4 channels: 3 height: 2 } }
    """
    with pytest.raises(ValueError, match="memory_data_param"):
        Net(parse(bad), phase="TRAIN")
    ok = """
    layers { name: "d" type: MEMORY_DATA top: "x" top: "y"
      memory_data_param { batch_size: 4 channels: 3 height: 2 width: 1 } }
    layers { name: "s" type: SILENCE bottom: "x" bottom: "y" }
    """
    Net(parse(ok), phase="TRAIN")   # builds


def test_rectangular_geometry_and_exclusivity_checks():
    """pad_h/pad_w + stride_h/stride_w work end-to-end, and the reference's
    exclusivity CHECKs hold: the square and rectangular forms cannot mix,
    and a lone _h (or _w) is an error (ref conv_layer.cpp:14-29,
    pooling_layer.cpp:18-32)."""
    ok = Net(parse("""
    input: "x"
    layers { name: "c" type: CONVOLUTION bottom: "x" top: "y"
      convolution_param { num_output: 1 kernel_h: 2 kernel_w: 3
        stride_h: 2 stride_w: 1 pad_h: 1 pad_w: 0
        weight_filler { type: "constant" value: 1.0 } } }
    """), phase="TEST")
    spec = {"x": _spec((1, 1, 4, 4))}
    p, _ = ok.init(jax.random.PRNGKey(0), spec)
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
    _, blobs = ok.apply(p, {"x": x}, return_blobs=True)
    # H: (4 + 2*1 - 2)/2 + 1 = 3 ; W: (4 + 0 - 3)/1 + 1 = 2
    assert blobs["y"].shape == (1, 1, 3, 2)

    def build(param_body):
        net = Net(parse(f"""
        input: "x"
        layers {{ name: "c" type: CONVOLUTION bottom: "x" top: "y"
          convolution_param {{ num_output: 1 {param_body}
            weight_filler {{ type: "constant" value: 1.0 }} }} }}
        """), phase="TEST")
        net.init(jax.random.PRNGKey(0), spec)

    with pytest.raises(ValueError, match="BOTH"):
        build("kernel_h: 2")                       # lone _h
    with pytest.raises(ValueError, match="exclusive"):
        build("kernel_size: 2 kernel_h: 2 kernel_w: 2")
    with pytest.raises(ValueError, match="BOTH"):
        build("kernel_size: 2 stride_w: 2")        # lone stride_w
    with pytest.raises(ValueError, match="exclusive"):
        build("kernel_size: 2 pad: 1 pad_h: 1 pad_w: 1")
