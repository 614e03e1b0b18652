"""Additional Net semantics: deploy-style `input:` declarations, NetState
level/stage rules, inner-product regularization through the engine."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net


def test_deploy_style_inputs(rng):
    """NetParameter-level input/input_dim (deploy prototxts, ref
    caffe.proto NetParameter.input)."""
    net = Net(parse("""
    name: "deploy"
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 4 input_dim: 4
    layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
      inner_product_param { num_output: 2 weight_filler { type: "xavier" } } }
    """), phase="TEST")
    assert net.input_names == ["data"]
    spec = {"data": jax.ShapeDtypeStruct((1, 3, 4, 4), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    _, outs = net.apply(params, {"data": jnp.asarray(
        rng.randn(1, 3, 4, 4).astype(np.float32))})
    assert outs["out"].shape == (1, 2)


def test_level_and_stage_rules():
    """NetStateRule min_level/max_level/stage/not_stage
    (ref StateMeetsRule, net.cpp:271-329)."""
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "lvl1" type: RELU bottom: "x" top: "x"
      include: { min_level: 1 } }
    layers { name: "lvl0only" type: TANH bottom: "x" top: "x"
      include: { max_level: 0 } }
    layers { name: "deploy_only" type: ABSVAL bottom: "x" top: "x"
      include: { stage: "deploy" } }
    layers { name: "not_deploy" type: SIGMOID bottom: "x" top: "x"
      exclude: { stage: "deploy" } }
    """)
    names = lambda net: [l.get("name") for l in net.layers]
    assert names(Net(msg, "TRAIN", level=0)) == ["d", "lvl0only", "not_deploy"]
    assert names(Net(msg, "TRAIN", level=1)) == ["d", "lvl1", "not_deploy"]
    assert names(Net(msg, "TRAIN", level=0, stages=("deploy",))) == \
        ["d", "lvl0only", "deploy_only"]


def test_inner_product_regularization_through_engine(rng):
    """The nonstandard `regularization` grad shrink wired from prototxt
    (ref inner_product_layer.cpp:80-90)."""
    def build(reg):
        return Net(parse(f"""
        layers {{ name: "d" type: MEMORY_DATA top: "x" }}
        layers {{ name: "ip" type: INNER_PRODUCT bottom: "x" top: "y"
          inner_product_param {{ num_output: 3 regularization: {reg}
            weight_filler {{ type: "xavier" }} }} }}
        """), phase="TRAIN")

    spec = {"x": jax.ShapeDtypeStruct((2, 4), jnp.float32)}
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    net0, net1 = build(0.0), build(1.0)
    params, _ = net0.init(jax.random.PRNGKey(0), spec)
    net1.param_meta = net0.param_meta

    def loss(net):
        return jax.grad(
            lambda p: jnp.sum(net.apply(p, {"x": x},
                                        return_blobs=True)[1]["y"]))(params)

    g0 = loss(net0)["ip"]["w"]
    g1 = loss(net1)["ip"]["w"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0) * 1.5, rtol=1e-5)


def test_argmax_top_k_shapes_and_tie_rule(rng):
    """ref argmax_layer.cpp:12-58: top (N, 1, top_k, 1) (or (N, 2, top_k,
    1) with out_max_val, values on channel 1); the partial_sort uses
    std::greater over (value, index) pairs so EQUAL values rank the
    LARGER index first."""
    import jax
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net

    def run(net_txt, x):
        net = Net(parse(net_txt), phase="TEST")
        params, _ = net.init(jax.random.PRNGKey(0),
                             {"x": jax.ShapeDtypeStruct(x.shape,
                                                        jnp.float32)})
        _, outputs = net.apply(params, {"x": jnp.asarray(x)})
        return np.asarray(outputs["am"])

    x = np.asarray([[0.5, 2.0, 2.0, 1.0],
                    [3.0, 0.0, 3.0, 3.0]], np.float32)
    out = run("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "a" type: ARGMAX bottom: "x" top: "am"
      argmax_param { top_k: 3 } }
    """, x)
    assert out.shape == (2, 1, 3, 1)
    # row 0: 2.0 at idx 1 and 2 → larger index first; then 1.0 at idx 3
    assert out[0, 0, :, 0].tolist() == [2.0, 1.0, 3.0]
    # row 1: 3.0 at idx 0, 2, 3 → descending index among ties
    assert out[1, 0, :, 0].tolist() == [3.0, 2.0, 0.0]
    out = run("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "a" type: ARGMAX bottom: "x" top: "am"
      argmax_param { top_k: 2 out_max_val: true } }
    """, x)
    assert out.shape == (2, 2, 2, 1)
    assert out[0, 0, :, 0].tolist() == [2.0, 1.0]   # indices
    assert out[0, 1, :, 0].tolist() == [2.0, 2.0]   # values
    import pytest
    with pytest.raises(ValueError, match="top_k"):
        run("""
        layers { name: "d" type: MEMORY_DATA top: "x" }
        layers { name: "a" type: ARGMAX bottom: "x" top: "am"
          argmax_param { top_k: 9 } }
        """, x)


def test_slice_point_validation(rng):
    """ref slice_layer.cpp:32-44: #slice_point must be #tops-1 and points
    strictly increasing — a short list silently DROPPED trailing
    channels."""
    import jax
    import pytest
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net

    def run(points):
        pts = "\n".join(f"slice_point: {p}" for p in points)
        net = Net(parse(f"""
        layers {{ name: "d" type: MEMORY_DATA top: "x" }}
        layers {{ name: "s" type: SLICE bottom: "x" top: "a" top: "b"
          slice_param {{ slice_dim: 1 {pts} }} }}
        layers {{ name: "sa" type: SILENCE bottom: "a" }}
        layers {{ name: "sb" type: SILENCE bottom: "b" }}
        """), phase="TEST")
        x = jnp.asarray(rng.randn(2, 8).astype(np.float32))
        params, _ = net.init(jax.random.PRNGKey(0),
                             {"x": jax.ShapeDtypeStruct((2, 8),
                                                        jnp.float32)})
        net.apply(params, {"x": x})

    run([3])   # valid
    with pytest.raises(ValueError, match="slice_point"):
        run([2, 5])           # too many points for 2 tops
    with pytest.raises(ValueError, match="increasing"):
        run([9])              # outside (0, size)


def test_kernel_h_without_w_rejected(rng):
    """ref conv_layer.cpp:19-21: non-square filters need BOTH kernel_h and
    kernel_w — a lone kernel_h used to build a 0-width kernel."""
    import jax
    import pytest
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    net_txt = """
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "c" type: CONVOLUTION bottom: "x" top: "y"
      convolution_param { num_output: 2 kernel_h: 3
        weight_filler { type: "xavier" } } }
    """
    net = Net(parse(net_txt), phase="TEST")
    with pytest.raises(ValueError, match="kernel_w"):
        net.init(jax.random.PRNGKey(0),
                 {"x": jax.ShapeDtypeStruct((1, 1, 8, 8), jnp.float32)})


def test_dropout_train_requires_rng(rng):
    """TRAIN forward with a nonzero dropout_ratio and no rng must raise —
    the reference always drops at TRAIN; silently disabling dropout
    trains a different model than configured."""
    import jax
    import pytest
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "dr" type: DROPOUT bottom: "x" top: "y"
      dropout_param { dropout_ratio: 0.5 } }
    """), phase="TRAIN")
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    params, _ = net.init(jax.random.PRNGKey(0),
                         {"x": jax.ShapeDtypeStruct((2, 4), jnp.float32)})
    with pytest.raises(ValueError, match="rng"):
        net.apply(params, {"x": x})
    net.apply(params, {"x": x}, rng=jax.random.PRNGKey(1))  # fine with rng


def test_inplace_final_layer_is_net_output(rng):
    """A net ending in an in-place layer must report that blob as a net
    output — the reference re-inserts in-place tops into available_blobs
    (net.cpp:206-212)."""
    import jax
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "ip" type: INNER_PRODUCT bottom: "x" top: "h"
      inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
    layers { name: "rl" type: RELU bottom: "h" top: "h" }
    """), phase="TEST")
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    params, _ = net.init(jax.random.PRNGKey(0),
                         {"x": jax.ShapeDtypeStruct((2, 4), jnp.float32)})
    _, outputs = net.apply(params, {"x": x})
    assert "h" in outputs
    np.testing.assert_array_equal(np.asarray(outputs["h"]) >= 0, True)


def test_auto_top_does_not_mutate_caller_message(rng):
    """AutoTopBlobs must not append synthetic tops to the caller's
    NetParameter (serializing the config afterwards would emit tops the
    user never wrote)."""
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    msg = parse("""
    layers { name: "d" type: MEMORY_DATA top: "p" top: "l" }
    layers { name: "loss" type: SOFTMAX_LOSS bottom: "p" bottom: "l" }
    """)
    before = msg.dumps()
    net = Net(msg, phase="TRAIN")
    assert msg.dumps() == before
    # the Net itself still sees the auto top
    loss_layer = [l for l in net.layers if l.get("name") == "loss"][0]
    assert loss_layer.get_list("top")
