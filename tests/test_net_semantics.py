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
