"""V0 upgrade long tail (ref:src/caffe/util/upgrade_proto.cpp, full
field-by-field semantics): per-type conditional field routing, padding
folds into conv AND pool with last-top-index producer resolution, and the
reference's incompatible-field / unknown-blob aborts."""

import pytest

from videovector_tpu.config import parse
from videovector_tpu.config.upgrade import (
    net_needs_upgrade, upgrade_net,
)


def _up(text):
    msg = parse(text)
    assert net_needs_upgrade(msg)
    return upgrade_net(msg)


def _layer(net, name):
    for l in net.get_list("layers"):
        if str(l.get("name")) == name:
            return l
    raise KeyError(name)


def test_data_layer_field_routing():
    net = _up("""
    layers { layer { name: "d" type: "data" source: "/db" batchsize: 32
                     scale: 0.00390625 cropsize: 227 mirror: true
                     meanfile: "/mean.bp" rand_skip: 7 } top: "data" top: "label" }
    """)
    d = _layer(net, "d")
    assert str(d.get("type")) == "DATA"
    dp = d.get_msg("data_param")
    assert str(dp.get("source")) == "/db"
    assert int(dp.get("batch_size")) == 32
    assert int(dp.get("rand_skip")) == 7
    tp = d.get_msg("transform_param")
    assert float(tp.get("scale")) == pytest.approx(0.00390625)
    assert int(tp.get("crop_size")) == 227
    assert str(tp.get("mean_file")) == "/mean.bp"


def test_images_and_window_data_routing():
    net = _up("""
    layers { layer { name: "im" type: "images" source: "/list.txt"
                     batchsize: 8 shuffle_images: true new_height: 256
                     new_width: 256 rand_skip: 3 } top: "data" top: "label" }
    layers { layer { name: "w" type: "window_data" source: "/win.txt"
                     batchsize: 4 det_fg_threshold: 0.5
                     det_bg_threshold: 0.3 det_fg_fraction: 0.25
                     det_context_pad: 16 det_crop_mode: "warp" }
             top: "wdata" top: "wlabel" }
    """)
    im = _layer(net, "im").get_msg("image_data_param")
    assert str(im.get("source")) == "/list.txt"
    assert int(im.get("batch_size")) == 8
    assert im.get("shuffle")
    assert int(im.get("new_height")) == 256
    assert int(im.get("rand_skip")) == 3
    w = _layer(net, "w").get_msg("window_data_param")
    assert float(w.get("fg_threshold")) == 0.5
    assert float(w.get("bg_threshold")) == pytest.approx(0.3)
    assert float(w.get("fg_fraction")) == 0.25
    assert int(w.get("context_pad")) == 16
    assert str(w.get("crop_mode")) == "warp"


def test_pool_method_string_to_enum_and_concat_dim():
    net = _up("""
    input: "x" input_dim: 1 input_dim: 1 input_dim: 8 input_dim: 8
    layers { layer { name: "p" type: "pool" pool: "ave" kernelsize: 2
                     stride: 2 } bottom: "x" top: "p" }
    layers { layer { name: "c" type: "concat" concat_dim: 1 }
             bottom: "p" bottom: "p" top: "c" }
    """)
    pp = _layer(net, "p").get_msg("pooling_param")
    assert str(pp.get("pool")) == "AVE"
    assert int(pp.get("kernel_size")) == 2
    assert int(_layer(net, "c").get_msg("concat_param")
               .get("concat_dim")) == 1


def test_padding_folds_into_pool_too():
    """Padding consumers may be conv OR pool (ref upgrade_proto.cpp:86)."""
    net = _up("""
    input: "x" input_dim: 1 input_dim: 1 input_dim: 8 input_dim: 8
    layers { layer { name: "padder" type: "padding" pad: 2 }
             bottom: "x" top: "xp" }
    layers { layer { name: "p" type: "pool" pool: "max" kernelsize: 3 }
             bottom: "xp" top: "y" }
    """)
    names = [str(l.get("name")) for l in net.get_list("layers")]
    assert names == ["p"]  # padding layer dropped
    p = _layer(net, "p")
    assert [str(b) for b in p.get_list("bottom")] == ["x"]
    assert int(p.get_msg("pooling_param").get("pad")) == 2


def test_padding_into_relu_aborts():
    with pytest.raises(ValueError, match="non-conv/pool"):
        _up("""
        input: "x" input_dim: 1 input_dim: 1 input_dim: 8 input_dim: 8
        layers { layer { name: "padder" type: "padding" pad: 1 }
                 bottom: "x" top: "xp" }
        layers { layer { name: "r" type: "relu" } bottom: "xp" top: "y" }
        """)


def test_incompatible_field_aborts():
    with pytest.raises(ValueError, match="unknown parameter"):
        _up("""
        input: "x" input_dim: 1 input_dim: 4 input_dim: 1 input_dim: 1
        layers { layer { name: "r" type: "relu" num_output: 4 }
                 bottom: "x" top: "y" }
        """)


def test_unknown_blob_input_aborts():
    with pytest.raises(ValueError, match="unknown blob input"):
        _up("""
        layers { layer { name: "r" type: "relu" } bottom: "ghost" top: "y" }
        """)


def test_in_place_reuse_resolves_last_producer():
    """blob_name_to_last_top_idx semantics: a rebound blob name must
    resolve to its LATEST producer, so a pad applied to the re-produced
    name does not leak to the earlier one."""
    net = _up("""
    input: "x" input_dim: 1 input_dim: 1 input_dim: 8 input_dim: 8
    layers { layer { name: "c1" type: "conv" num_output: 2 kernelsize: 3 }
             bottom: "x" top: "h" }
    layers { layer { name: "padder" type: "padding" pad: 1 }
             bottom: "h" top: "h" }
    layers { layer { name: "c2" type: "conv" num_output: 2 kernelsize: 3 }
             bottom: "h" top: "y" }
    """)
    c1 = _layer(net, "c1")
    c2 = _layer(net, "c2")
    assert not c1.get_msg("convolution_param").has("pad")
    assert int(c2.get_msg("convolution_param").get("pad")) == 1
    # c2's bottom rewired to the padding layer's own bottom (the h that
    # c1 produced)
    assert [str(b) for b in c2.get_list("bottom")] == ["h"]


def test_upgraded_net_runs_through_engine(rng_seed=0):
    """End to end: a V0 net with conv+pad+pool+ip upgrades and trains."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videovector_tpu.graph import Net

    msg = parse("""
    layers { layer { name: "mem" type: "data" } top: "x" top: "t" }
    layers { layer { name: "padder" type: "padding" pad: 1 }
             bottom: "x" top: "xp" }
    layers { layer { name: "c1" type: "conv" num_output: 4 kernelsize: 3
                     weight_filler { type: "gaussian" std: 0.1 } }
             bottom: "xp" top: "h" }
    layers { layer { name: "p1" type: "pool" pool: "max" kernelsize: 2
                     stride: 2 } bottom: "h" top: "hp" }
    layers { layer { name: "ip" type: "innerproduct" num_output: 3
                     weight_filler { type: "xavier" } }
             bottom: "hp" top: "pred" }
    layers { layer { name: "l" type: "euclidean_loss" }
             bottom: "pred" bottom: "t" top: "loss" }
    """)
    # patch the data connection: V0 "data" has no memory variant — use
    # the upgraded form with MEMORY_DATA for the engine run
    up = upgrade_net(msg)
    for l in up.get_list("layers"):
        if str(l.get("name")) == "mem":
            l.fields["type"] = ["MEMORY_DATA"]
    net = Net(up, phase="TRAIN")
    rng = np.random.RandomState(rng_seed)
    spec = {"x": jax.ShapeDtypeStruct((2, 1, 6, 6), jnp.float32),
            "t": jax.ShapeDtypeStruct((2, 3), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    loss, _ = net.apply(params, {
        "x": jnp.asarray(rng.randn(2, 1, 6, 6).astype(np.float32)),
        "t": jnp.asarray(rng.randn(2, 3).astype(np.float32))})
    assert float(loss) > 0


def test_upgrade_does_not_mutate_input_and_drops_reshape_dims(rng):
    """The padding fold must not write through to the caller's message,
    and V0 new_num/new_channels (ReshapeLayer dims the reference upgrade
    never copies) are dropped — passing them through would put unknown
    top-level fields on the V1 layer that the schema rejects at write
    time."""
    from videovector_tpu.config.binproto import encode
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.config.upgrade import upgrade_net
    txt = """
    name: "v0"
    input: "data"
    layers { layer { name: "p" type: "padding" pad: 2 }
             bottom: "data" top: "pd" }
    layers { layer { name: "c" type: "conv" num_output: 4 kernelsize: 3
                     new_num: 7 new_channels: 3 }
             bottom: "pd" top: "co" }
    """
    msg = parse(txt)
    before = msg.dumps()
    up = upgrade_net(msg)
    assert msg.dumps() == before          # input untouched
    conv = [l for l in up.get_list("layers")
            if str(l.get("type")) == "CONVOLUTION"][0]
    assert int(conv.get_msg("convolution_param").get("pad")) == 2
    assert not conv.has("new_num") and not conv.has("new_channels")
    encode(up, "NetParameter")            # schema accepts the result
