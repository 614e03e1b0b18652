"""Scoring-head fusion (graph/fuse.py): the symbolic batched evaluation of
the SLICE/NORMALIZATION/ELTWISE/SUM/CONCAT score motif must reproduce the
per-layer interpretation exactly — loss bit-equal, gradients to float
determinism — on both the generated flagship family and the unmodified
reference prototxt (whose CONCAT→NORM→SLICE stack variant exercises the
stack-distribution rules)."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "videovec_embedding"))

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph.net import Net

REF_PROTOTXT = ("/root/reference/projects/videovec_embedding/"
                "mednet_embedding_train.prototxt")


def _pair(msg, phase, batch, side=None):
    """(unfused, fused) Nets sharing params/meta."""
    n0 = Net(msg, phase, fuse_scoring=False,
             side=dict(side) if side else None)
    n1 = Net(msg, phase, fuse_scoring=True,
             side=dict(side) if side else None)
    p, meta = n0.init(jax.random.PRNGKey(0), batch)
    n1.param_meta = meta
    n1._blob_shapes = n0._blob_shapes
    return n0, n1, p


def _generated_net(negatives=5, embed=48, batch=16):
    from generate_net import emit
    txt = emit("train.vvr", "test.vvr", batch=batch, test_batch=8,
               negatives=negatives, embed=embed, buffer_size=480,
               weight_std=0.01, dropout=0.9)
    return parse(txt)


def test_generated_net_fused_matches_unfused():
    msg = _generated_net()
    rng = np.random.RandomState(0)
    batch = {"data": jnp.asarray(rng.randn(16, 10, 48, 1), jnp.float32)}
    n0, n1, p = _pair(msg, "TRAIN", batch)
    key = jax.random.PRNGKey(7)
    l0, g0 = jax.value_and_grad(lambda p: n0.apply(p, batch, rng=key)[0])(p)
    l1, g1 = jax.value_and_grad(lambda p: n1.apply(p, batch, rng=key)[0])(p)
    assert float(l0) == float(l1)                       # bit-equal loss
    gmax = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert gmax <= 1e-7, gmax
    # outputs (loss tops) identical
    _, o0 = n0.apply(p, batch, rng=key)
    _, o1 = n1.apply(p, batch, rng=key)
    assert sorted(o0) == sorted(o1)
    for k in o0:
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o1[k]))
    # and the motif actually ran symbolically
    assert n1._last_absorbed >= 15
    assert n0._last_absorbed == 0


def test_return_blobs_materializes_all_intermediates():
    """debug_info / vvtpu-time style full-blob requests must still see
    every motif blob, equal to the unfused values."""
    msg = _generated_net(negatives=3)
    rng = np.random.RandomState(1)
    batch = {"data": jnp.asarray(rng.randn(8, 8, 48, 1), jnp.float32)}
    n0, n1, p = _pair(msg, "TRAIN", batch)
    key = jax.random.PRNGKey(0)
    _, b0 = n0.apply(p, batch, rng=key, return_blobs=True)
    _, b1 = n1.apply(p, batch, rng=key, return_blobs=True)
    assert set(b0) == set(b1)
    for k in b0:
        np.testing.assert_allclose(np.asarray(b0[k]), np.asarray(b1[k]),
                                   rtol=0, atol=1e-6, err_msg=k)


@pytest.mark.skipif(not os.path.exists(REF_PROTOTXT),
                    reason="reference checkout unavailable")
def test_reference_prototxt_fused_matches_unfused():
    """The unmodified reference flagship: TRAIN (stack variant: CONCAT of
    11 roles → one NORMALIZATION → SLICE back) and TEST phases."""
    msg = parse(open(REF_PROTOTXT).read())
    rng = np.random.RandomState(0)
    batch = {"data": jnp.asarray(rng.randn(4, 15, 256, 1), jnp.float32)}
    # shrink fc7 so CPU tests stay fast: patch num_output via init shapes —
    # the prototxt's INNER_PRODUCT num_output is fixed, so run at feat 4096
    # only for the forward/backward of the scoring head; use a narrow batch
    batch = {"data": jnp.asarray(rng.randn(3, 15, 4096, 1), jnp.float32)}
    n0, n1, p = _pair(msg, "TRAIN", batch)
    key = jax.random.PRNGKey(5)
    l0, g0 = jax.value_and_grad(lambda p: n0.apply(p, batch, rng=key)[0])(p)
    l1, g1 = jax.value_and_grad(lambda p: n1.apply(p, batch, rng=key)[0])(p)
    assert float(l0) == float(l1)
    gmax = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert gmax <= 1e-7, gmax
    assert n1._last_absorbed >= 29   # slice+stack+norms + 11 chains + concat

    # role-major feed on the UNMODIFIED reference config (its leading
    # SLICE dim1 → CONCAT dim0 → FLATTEN motif): bit-equal to normal feed
    assert n1.role_major_candidates(
        {"data": np.asarray(batch["data"])}) == ["data"]
    n1.role_major_inputs = ("data",)
    rm = {"data": jnp.moveaxis(batch["data"], 1, 0)}
    l2, g2 = jax.value_and_grad(lambda p: n1.apply(p, rm, rng=key)[0])(p)
    n1.role_major_inputs = ()
    assert float(l2) == float(l1)
    gmax2 = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)))
    assert gmax2 == 0.0, gmax2

    from videovector_tpu.metrics.retrieval import IdToClassMap
    side = {"retrieval_stats": IdToClassMap(np.arange(50), np.arange(50) % 5)}
    t0 = Net(msg, "TEST", fuse_scoring=False, side=dict(side))
    t1 = Net(msg, "TEST", fuse_scoring=True, side=dict(side))
    tb = {"data": jnp.asarray(rng.randn(8, 4, 4096, 1), jnp.float32),
          "video_ids": jnp.asarray(
              rng.randint(0, 50, (8, 1, 1, 1)).astype(np.float32))}
    p, meta = t0.init(jax.random.PRNGKey(0), tb)
    t1.param_meta = meta
    _, o0 = t0.apply(p, tb)
    _, o1 = t1.apply(p, tb)
    for k in o0:
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o1[k]))


def test_partial_motif_falls_back():
    """A net where a motif intermediate feeds a non-absorbable layer: the
    symbol must materialize there with unfused-identical values."""
    txt = """
name: "partial"
input: "data"
layers { name: "sl" type: SLICE bottom: "data" top: "a" top: "b"
         slice_param { slice_dim: 0 } }
layers { name: "na" type: NORMALIZATION bottom: "a" top: "an" }
layers { name: "nb" type: NORMALIZATION bottom: "b" top: "bn" }
layers { name: "pw" type: POWER bottom: "an" top: "an2"
         power_param { power: 2.0 } }
layers { name: "pr" type: ELTWISE bottom: "an" bottom: "bn" top: "p"
         eltwise_param { operation: PROD } }
layers { name: "sm" type: SUM bottom: "p" top: "s" }
layers { name: "el" type: EUCLIDEAN_LOSS bottom: "an2" bottom: "bn"
         top: "l" }
"""
    msg = parse(txt)
    rng = np.random.RandomState(2)
    batch = {"data": jnp.asarray(rng.randn(12, 6), jnp.float32)}
    n0 = Net(msg, "TRAIN", fuse_scoring=False)
    n1 = Net(msg, "TRAIN", fuse_scoring=True)
    p, meta = n0.init(jax.random.PRNGKey(0), batch)
    n1.param_meta = meta
    l0, o0 = n0.apply(p, batch)
    l1, o1 = n1.apply(p, batch)
    assert float(l0) == float(l1)
    assert sorted(o0) == sorted(o1)       # 's' is a net output both ways
    for k in o0:
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o1[k]))


def test_inplace_rewrite_between_same_name_slices():
    """A blob sliced (dim0), rewritten IN PLACE, then sliced again under
    the same name: the second slice must capture the post-rewrite value
    (root versions, fuse.ScoringFusion.note_rebind) while the first
    slice's symbols keep their pre-rewrite capture — fused == unfused
    exactly. Regression: the root/materialization cache used to key by
    bare blob name, so the second slice silently reused the stale
    pre-RELU root."""
    txt = """
name: "inplace_reslice"
input: "data"
layers { name: "s1" type: SLICE bottom: "data" top: "a" top: "b"
         slice_param { slice_dim: 0 } }
layers { name: "na" type: NORMALIZATION bottom: "a" top: "an" }
layers { name: "nb" type: NORMALIZATION bottom: "b" top: "bn" }
layers { name: "rl" type: RELU bottom: "data" top: "data" }
layers { name: "s2" type: SLICE bottom: "data" top: "c" top: "d"
         slice_param { slice_dim: 0 } }
layers { name: "nc" type: NORMALIZATION bottom: "c" top: "cn" }
layers { name: "nd" type: NORMALIZATION bottom: "d" top: "dn" }
layers { name: "p1" type: ELTWISE bottom: "an" bottom: "cn" top: "p"
         eltwise_param { operation: PROD } }
layers { name: "p2" type: ELTWISE bottom: "bn" bottom: "dn" top: "q"
         eltwise_param { operation: PROD } }
layers { name: "m1" type: SUM bottom: "p" top: "sp" }
layers { name: "m2" type: SUM bottom: "q" top: "sq" }
layers { name: "el" type: EUCLIDEAN_LOSS bottom: "sp" bottom: "sq"
         top: "l" }
"""
    msg = parse(txt)
    rng = np.random.RandomState(3)
    batch = {"data": jnp.asarray(rng.randn(12, 6), jnp.float32)}
    n0 = Net(msg, "TRAIN", fuse_scoring=False)
    n1 = Net(msg, "TRAIN", fuse_scoring=True)
    p, meta = n0.init(jax.random.PRNGKey(0), batch)
    n1.param_meta = meta
    l0, o0 = n0.apply(p, batch)
    l1, o1 = n1.apply(p, batch)
    assert float(l0) == float(l1)
    for k in o0:
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o1[k]))


def test_role_major_feed_bit_equal():
    """Feeding the data blob role-major ((R, B, D, 1)) with
    net.role_major_inputs set must be bit-equal to the normal feed — the
    leading SLICE(dim1)/CONCAT(dim0) absorbs to drole symbols and the
    tower input materializes as a reshape, so dropout masks, loss, and
    grads all match exactly."""
    msg = _generated_net()
    rng = np.random.RandomState(0)
    data = rng.randn(16, 10, 48, 1).astype(np.float32)
    batch = {"data": jnp.asarray(data)}
    rm = {"data": jnp.asarray(np.ascontiguousarray(
        data.transpose(1, 0, 2, 3)))}
    n0, n1, p = _pair(msg, "TRAIN", batch)
    key = jax.random.PRNGKey(7)
    l0, g0 = jax.value_and_grad(lambda p: n1.apply(p, batch, rng=key)[0])(p)
    base_absorbed = n1._last_absorbed
    n1.role_major_inputs = ("data",)
    l1, g1 = jax.value_and_grad(lambda p: n1.apply(p, rm, rng=key)[0])(p)
    assert float(l0) == float(l1)
    gmax = max(jtu.tree_leaves(jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)))
    assert gmax == 0.0, gmax
    # the leading SLICE + CONCAT absorbed on top of the scoring motif
    assert n1._last_absorbed >= base_absorbed + 2
    # unfused fallback: the moveaxis view keeps plain interpretation exact
    n0.role_major_inputs = ("data",)
    l2, _ = n0.apply(p, rm, rng=key)
    assert float(l2) == float(l0)


def test_role_major_candidates_and_driver_detection():
    msg = _generated_net()
    n = Net(msg, "TRAIN")
    batch = {"data": np.zeros((4, 10, 48, 1), np.float32)}
    assert n.role_major_candidates(batch) == ["data"]
    # wrong role count -> not eligible
    assert n.role_major_candidates(
        {"data": np.zeros((4, 9, 48, 1), np.float32)}) == []
    # fusion disabled -> never eligible
    n2 = Net(msg, "TRAIN", fuse_scoring=False)
    assert n2.role_major_candidates(batch) == []


def test_disable_env(monkeypatch):
    monkeypatch.setenv("VVTPU_DISABLE_FUSION", "1")
    msg = _generated_net(negatives=3)
    n1 = Net(msg, "TRAIN", fuse_scoring=True)
    assert not n1.fuse_scoring


def _gen_net_no_dropout(**kw):
    from generate_net import emit
    txt = emit("train.vvr", "test.vvr", batch=16, test_batch=8,
               negatives=5, embed=48, buffer_size=480,
               weight_std=0.01, dropout=0.0, **kw)
    return parse(txt)


def test_unstable_prod_grad_declines_fusion():
    """An ELTWISE PROD with stable_prod_grad: false selects the reference's
    DIVISION backward (eltwise_layer.cpp:132-134) — the fused batched-dot
    grad is the stable form, so the fusion pass must leave that layer (and
    whatever depended on it) per-layer. Outputs and grads must still match
    the unfused net exactly. The embedding tower's ReLU puts exact zeros
    into the normalized vectors, so the division backward faithfully
    produces 0/0 = NaN in the tower grads — precisely what the reference's
    caffe_div would do ("may be numerically unstable", caffe.proto:728-731);
    both nets must agree on the NaN pattern AND on every finite entry."""
    msg = _gen_net_no_dropout()
    flipped = 0
    for layer in msg.get_list("layers"):
        if layer.get("type") != "ELTWISE":
            continue
        ep = layer.get_msg("eltwise_param")
        if ep.get("operation") == "PROD":
            ep.add("stable_prod_grad", False)
            flipped += 1
    assert flipped > 0
    rng = np.random.RandomState(0)
    batch = {"data": jnp.asarray(rng.randn(16, 10, 48, 1), jnp.float32)}
    n0, n1, p = _pair(msg, "TRAIN", batch)
    key = jax.random.PRNGKey(7)
    l0, g0 = jax.value_and_grad(lambda p: n0.apply(p, batch, rng=key)[0])(p)
    l1, g1 = jax.value_and_grad(lambda p: n1.apply(p, batch, rng=key)[0])(p)
    assert float(l0) == float(l1)
    saw_nan = False
    for a, b in zip(jtu.tree_leaves(g0), jtu.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        saw_nan |= bool(np.isnan(a).any())
        fin = ~np.isnan(a)
        np.testing.assert_allclose(a[fin], b[fin], atol=1e-6)
    assert saw_nan  # the division rule actually fired (stable is NaN-free)
    # the PROD layers (and their downstream SUM/CONCAT consumers) fell out
    # of the motif: strictly fewer absorbed layers than the stable graph
    n1s = Net(_gen_net_no_dropout(), "TRAIN", fuse_scoring=True)
    n1s.init(jax.random.PRNGKey(0), batch)
    n1s.apply(p, batch, rng=key)
    assert n1._last_absorbed < n1s._last_absorbed
