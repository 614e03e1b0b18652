"""Independent torch oracle for the flagship graph: the full reference
training computation (fc7 tower → context average → normalize → dot scores →
margin-2 L2 loss) reimplemented in torch, compared against the graph engine
running the unmodified reference prototxt with identical weights.

Also: conv-weight .caffemodel round-trip through a conv net (regression for
the 4-D blob path in data/weights.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from videovector_tpu.config import parse, parse_file
from videovector_tpu.graph import Net

REF_TRAIN = "/root/reference/projects/videovec_embedding/mednet_embedding_train.prototxt"


@pytest.mark.skipif(not os.path.exists(REF_TRAIN), reason="no reference")
def test_flagship_loss_matches_torch_oracle(rng):
    feat, B, C, N = 4096, 3, 4, 10
    # dropout off for the deterministic oracle comparison (the engine
    # refuses silent no-dropout at TRAIN when the ratio is > 0)
    msg = parse_file(REF_TRAIN)
    for l in msg.get_list("layers"):
        if l.get("type") == "DROPOUT":
            l.get_msg("dropout_param").fields["dropout_ratio"] = [0.0]
    net = Net(msg, phase="TRAIN")
    spec = {"data": jax.ShapeDtypeStruct((B, 15, feat, 1), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(5), spec)
    data = rng.randn(B, 15, feat, 1).astype(np.float32)
    loss_engine, outs = net.apply(params, {"data": jnp.asarray(data)}, rng=None)

    # torch oracle of the same math
    W = torch.from_numpy(np.asarray(params["fc7"]["w"]))   # (K, N)
    bias = torch.from_numpy(np.asarray(params["fc7"]["b"]))
    x = torch.from_numpy(data[..., 0])                      # (B, 15, feat)
    h = torch.relu(x.reshape(B * 15, feat) @ W + bias).reshape(B, 15, -1)
    tgt, ctx, neg = h[:, 0], h[:, 1:5], h[:, 5:]
    ctx_avg = 0.25 * ctx.sum(dim=1)
    ctx_n = ctx_avg / (ctx_avg.norm(dim=1, keepdim=True) + 1e-10)
    tgt_n = tgt / (tgt.norm(dim=1, keepdim=True) + 1e-10)
    neg_n = neg / (neg.norm(dim=2, keepdim=True) + 1e-10)
    s_true = (ctx_n * tgt_n).sum(dim=1, keepdim=True)
    s_neg = torch.einsum("bnd,bd->bn", neg_n, ctx_n)
    hinge = torch.clamp(2.0 - (s_true - s_neg), min=0)
    loss_torch = float((hinge * hinge).sum() / hinge.numel())
    violations = float((s_true - s_neg < 0).sum())

    np.testing.assert_allclose(float(loss_engine), loss_torch, rtol=2e-4)
    np.testing.assert_allclose(float(outs["train_violations"]), violations)


def test_caffemodel_conv_weight_roundtrip(rng, tmp_path):
    from videovector_tpu.data.weights import (
        NetWeights, load_into_params, params_to_weights,
    )
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "conv1" type: CONVOLUTION bottom: "x" top: "c"
      convolution_param { num_output: 4 kernel_size: 3
        weight_filler { type: "gaussian" std: 0.1 } } }
    layers { name: "ip1" type: INNER_PRODUCT bottom: "c" top: "y"
      inner_product_param { num_output: 2 weight_filler { type: "xavier" } } }
    """), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((1, 2, 5, 5), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    path = str(tmp_path / "m.caffemodel")
    params_to_weights(params).save(path)
    zeros = jax.tree.map(jnp.zeros_like, params)
    loaded = load_into_params(NetWeights.load(path), zeros)
    for lname in params:
        for pname in params[lname]:
            np.testing.assert_allclose(
                np.asarray(loaded[lname][pname]),
                np.asarray(params[lname][pname]), rtol=1e-6,
                err_msg=f"{lname}/{pname}")
    # loaded weights produce identical outputs
    x = jnp.asarray(rng.randn(1, 2, 5, 5).astype(np.float32))
    _, b1 = net.apply(params, {"x": x}, return_blobs=True)
    _, b2 = net.apply(loaded, {"x": x}, return_blobs=True)
    np.testing.assert_allclose(np.asarray(b2["y"]), np.asarray(b1["y"]),
                               rtol=1e-6)
