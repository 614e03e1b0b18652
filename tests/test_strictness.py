"""Round-4 CHECK-strictness parity tests.

The reference hard-CHECKs side-table files and per-batch invariants that a
jitted graph (or a silently-soft os.path.exists guard) would otherwise let
slide:
- missing/empty id_to_class_file / id_to_weight_file / infogain source →
  abort at setup (ref:src/caffe/layers/retrieval_stats_layer.cpp:48,
  max_margin_loss_layer.cpp:26-34, infogain_loss_layer.cpp:17-24)
- video_level_retrieval distinct-id count must equal max_num_videos
  (ref:retrieval_stats_layer.cpp:188)
- DUMMY_DATA refills non-constant fillers every Forward
  (ref:src/caffe/layers/dummy_data_layer.cpp:31-55)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse
from videovector_tpu.graph import Net


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


RETRIEVAL_NET = """
name: "r"
layers {{ name: "data" type: MEMORY_DATA top: "x" top: "vid" }}
layers {{
  name: "stats" type: RETRIEVAL_STATS bottom: "x" bottom: "vid"
  top: "map" top: "h1" top: "h5"
  retrieval_stats_param {{ {param} }}
}}
"""


def test_missing_id_to_class_file_is_hard_error(tmp_path):
    msg = parse(RETRIEVAL_NET.format(
        param=f'id_to_class_file: "{tmp_path}/nope.csv"'))
    with pytest.raises(ValueError, match="id_to_class_file"):
        Net(msg, phase="TEST")


def test_empty_id_to_class_file_is_hard_error(tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("")
    msg = parse(RETRIEVAL_NET.format(param=f'id_to_class_file: "{p}"'))
    with pytest.raises(ValueError, match="no entries|id_to_class_file"):
        Net(msg, phase="TEST")


def test_present_id_to_class_file_loads(tmp_path, rng):
    p = tmp_path / "map.csv"
    p.write_text("1,0\n2,0\n3,1\n4,1\n")
    msg = parse(RETRIEVAL_NET.format(
        param=f'id_to_class_file: "{p}" exclude_same_video_shots: false'))
    net = Net(msg, phase="TEST")
    params, _ = net.init(jax.random.PRNGKey(0),
                         {"x": _spec((4, 8)), "vid": _spec((4,))})
    feats = rng.randn(4, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    _, outputs = net.apply(params, {
        "x": jnp.asarray(feats),
        "vid": jnp.asarray([1.0, 2.0, 3.0, 4.0])})
    assert 0.0 <= float(outputs["map"]) <= 1.0


def test_missing_id_to_weight_file_is_hard_error(tmp_path):
    net_str = f"""
name: "m"
layers {{ name: "data" type: MEMORY_DATA top: "s_true" top: "s_bogus" top: "vid" }}
layers {{
  name: "loss" type: MAX_MARGIN_LOSS
  bottom: "s_true" bottom: "s_bogus" bottom: "vid"
  top: "l" top: "viol"
  max_margin_loss_param {{ id_to_weight_file: "{tmp_path}/typo.csv" }}
}}
"""
    with pytest.raises(ValueError, match="id_to_weight_file"):
        Net(parse(net_str), phase="TRAIN")


def test_negative_weight_in_weight_file_is_hard_error(tmp_path):
    p = tmp_path / "w.csv"
    p.write_text("1,0.5\n2,-1.0\n")
    net_str = f"""
name: "m"
layers {{ name: "data" type: MEMORY_DATA top: "s_true" top: "s_bogus" top: "vid" }}
layers {{
  name: "loss" type: MAX_MARGIN_LOSS
  bottom: "s_true" bottom: "s_bogus" bottom: "vid"
  top: "l" top: "viol"
  max_margin_loss_param {{ id_to_weight_file: "{p}" }}
}}
"""
    with pytest.raises(ValueError, match="negative weight"):
        Net(parse(net_str), phase="TRAIN")


def test_infogain_missing_source_is_hard_error(tmp_path):
    net_str = """
name: "ig"
layers { name: "data" type: MEMORY_DATA top: "probs" top: "labels" }
layers { name: "ig" type: INFOGAIN_LOSS bottom: "probs" bottom: "labels"
  top: "loss" }
"""
    with pytest.raises(ValueError, match="source"):
        Net(parse(net_str), phase="TRAIN")


def test_infogain_missing_source_file_is_hard_error(tmp_path):
    net_str = f"""
name: "ig"
layers {{ name: "data" type: MEMORY_DATA top: "probs" top: "labels" }}
layers {{ name: "ig" type: INFOGAIN_LOSS bottom: "probs" bottom: "labels"
  top: "loss" infogain_loss_param {{ source: "{tmp_path}/absent.binaryproto" }} }}
"""
    with pytest.raises(ValueError, match="infogain source"):
        Net(parse(net_str), phase="TRAIN")


def test_side_preseed_is_the_opt_out(tmp_path, rng):
    """Pre-seeding Net(side=...) bypasses the file load — the explicit
    escape hatch for tests and programmatic tables."""
    from videovector_tpu.metrics.retrieval import IdToClassMap
    msg = parse(RETRIEVAL_NET.format(
        param=f'id_to_class_file: "{tmp_path}/never_written.csv" '
              'exclude_same_video_shots: false'))
    side = {"stats": IdToClassMap([1, 2, 3, 4], [0, 0, 1, 1])}
    net = Net(msg, phase="TEST", side=side)
    params, _ = net.init(jax.random.PRNGKey(0),
                         {"x": _spec((4, 8)), "vid": _spec((4,))})
    feats = rng.randn(4, 8).astype(np.float32)
    _, outputs = net.apply(params, {
        "x": jnp.asarray(feats), "vid": jnp.asarray([1.0, 2.0, 3.0, 4.0])})
    assert 0.0 <= float(outputs["map"]) <= 1.0


# ---------------------------------------------------------------------------
# video_level_retrieval host-side validator
# ---------------------------------------------------------------------------


def test_batch_validator_catches_video_count_mismatch(tmp_path):
    p = tmp_path / "map.csv"
    p.write_text("1,0\n2,1\n3,1\n")
    msg = parse(RETRIEVAL_NET.format(
        param=f'id_to_class_file: "{p}" video_level_retrieval: true '
              'max_num_videos: 3'))
    net = Net(msg, phase="TEST")
    validators = net.batch_validators()
    assert len(validators) == 1
    good = {"x": np.zeros((6, 8), np.float32),
            "vid": np.asarray([1, 1, 2, 2, 3, 3], np.float32)}
    for v in validators:
        v(good)  # 3 distinct ids == max_num_videos → fine
    bad = {"x": np.zeros((6, 8), np.float32),
           "vid": np.asarray([1, 1, 2, 2, 2, 2], np.float32)}
    with pytest.raises(ValueError, match="distinct video ids"):
        validators[0](bad)


def test_batch_validator_runs_through_data_iter(tmp_path):
    """A partial eval batch with fewer distinct videos than max_num_videos
    must fail loudly through the driver's prefetch pipeline (the exception
    crosses the DevicePrefetcher thread), not corrupt mAP."""
    from videovector_tpu.solver.driver import SolverDriver

    p = tmp_path / "map.csv"
    p.write_text("1,0\n2,1\n3,1\n4,0\n")
    msg = parse(RETRIEVAL_NET.format(
        param=f'id_to_class_file: "{p}" video_level_retrieval: true '
              'max_num_videos: 4'))
    net = Net(msg, phase="TEST")
    validators = net.batch_validators()

    class FakeSource:
        def __iter__(self):
            # only 2 distinct ids but max_num_videos = 4
            yield {"x": np.zeros((6, 4), np.float32),
                   "vid": np.asarray([1, 1, 1, 2, 2, 2], np.float32)}

    driver = SolverDriver.__new__(SolverDriver)  # bypass full build
    driver._prefetchers = []                     # the one attr _data_iter uses
    it = driver._data_iter(FakeSource(), validators=validators)
    with pytest.raises(ValueError, match="distinct video ids"):
        next(it)


# ---------------------------------------------------------------------------
# DUMMY_DATA refill semantics
# ---------------------------------------------------------------------------


DUMMY_NET = """
name: "d"
layers {{
  name: "dummy" type: DUMMY_DATA top: "x"
  dummy_data_param {{
    num: 2 channels: 3 height: 1 width: 1
    data_filler {{ type: "{ftype}" {extra} }}
  }}
}}
layers {{ name: "sil" type: SILENCE bottom: "x" }}
"""


def _dummy_forward(ftype, extra, rng_key):
    net = Net(parse(DUMMY_NET.format(ftype=ftype, extra=extra)),
              phase="TRAIN")
    params, _ = net.init(jax.random.PRNGKey(0), {})
    _, blobs = net.apply(params, {}, rng=rng_key, return_blobs=True)
    return np.asarray(blobs["x"])


def test_dummy_data_gaussian_refills_each_forward():
    a = _dummy_forward("gaussian", "std: 1.0", jax.random.PRNGKey(1))
    b = _dummy_forward("gaussian", "std: 1.0", jax.random.PRNGKey(2))
    assert not np.allclose(a, b)
    # same rng → reproducible (jit purity)
    c = _dummy_forward("gaussian", "std: 1.0", jax.random.PRNGKey(1))
    np.testing.assert_array_equal(a, c)


def test_dummy_data_constant_fills_once():
    a = _dummy_forward("constant", "value: 2.5", jax.random.PRNGKey(1))
    b = _dummy_forward("constant", "value: 2.5", jax.random.PRNGKey(2))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, 2.5)


def test_blobs_lr_count_and_sign_checks():
    """A non-empty blobs_lr / weight_decay list must cover every param
    blob exactly and be non-negative (ref Net::GetLearningRateAndWeightDecay
    CHECKs, net.cpp:467-499) — a short list used to silently default the
    missing blob's multiplier to 1 (leaving a blob the user froze
    trainable)."""
    import jax
    import numpy as np
    import pytest
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net

    def build(extra):
        txt = f"""
name: "m"
input: "data"
layers {{ name: "ip" type: INNER_PRODUCT bottom: "data" top: "ip"
         inner_product_param {{ num_output: 3 }} {extra} }}
"""
        net = Net(parse(txt), "TRAIN")
        batch = {"data": np.zeros((2, 4), np.float32)}
        return net.init(jax.random.PRNGKey(0), batch)

    build("blobs_lr: 1 blobs_lr: 2")                      # exact count ok
    with pytest.raises(ValueError, match="blobs_lr has 1 entries"):
        build("blobs_lr: 0")                              # short list
    with pytest.raises(ValueError, match="weight_decay has 3 entries"):
        build("weight_decay: 1 weight_decay: 0 weight_decay: 1")
    with pytest.raises(ValueError, match="negative blobs_lr"):
        build("blobs_lr: -1 blobs_lr: 1")
