"""End-to-end tests: prototxt-driven training through SolverDriver (the
`caffe train` path), CLI tools, extract_features, converters, log plotting."""

import json
import os

import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.data.wire import Datum, TestVideoShotWindows
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.solver.driver import SolverDriver

FEAT = 24


def _make_shot_records(tmp_path, rng, name, num_videos=10, shots=8):
    videos = []
    for v in range(num_videos):
        center = rng.randn(FEAT).astype(np.float32) * 2
        feats = center + 0.3 * rng.randn(shots, FEAT).astype(np.float32)
        videos.append(ShotVideo(v + 1, np.arange(shots, dtype=np.int32), feats))
    ds = ShotDataset(videos)
    path = str(tmp_path / name)
    ds.to_records(path)
    return path, ds


def _make_test_windows(tmp_path, rng, name, n=12, ctx=4):
    path = str(tmp_path / name)
    with RecordWriter(path) as w:
        for i in range(n):
            center = rng.randn(FEAT).astype(np.float32)
            mk = lambda: Datum(float_data=(center + 0.1 * rng.randn(FEAT))
                               .astype(np.float32))
            tw = TestVideoShotWindows(video_id=i % 4 + 1,
                                      context_shot_words=[mk() for _ in range(ctx)])
            w.append(str(i), tw.encode())
    return path


MINI_NET = """
name: "mini_embedding"
layers {{
  name: "shot_windows"
  type: VIDEO_SAMPLED_SHOTS_DATA
  top: "data"
  video_sampled_shots_data_param {{
    source: "{train_src}"
    batch_size: 8
    num_negative_samples: 3
    max_buffer_size: 20
    negative_swap_percentage: 50
    max_same_video_negs: 1
    context_type: WINDOW
    context_size: 5
  }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "shot_windows"
  type: VIDEO_SHOT_WINDOW_TEST_DATA
  top: "data"
  top: "video_ids"
  video_shot_window_test_data_param {{
    source: "{test_src}"
    batch_size: 12
  }}
  include: {{ phase: TEST }}
}}
layers {{
  name: "slice_input" type: SLICE bottom: "data"
  top: "t" top: "c1" top: "c2" top: "c3" top: "c4"
  top: "n1" top: "n2" top: "n3"
  slice_param {{ slice_dim: 1 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "slice_input" type: SLICE bottom: "data"
  top: "c1" top: "c2" top: "c3" top: "c4"
  slice_param {{ slice_dim: 1 }}
  include: {{ phase: TEST }}
}}
layers {{
  name: "concat_all" type: CONCAT
  bottom: "t" bottom: "c1" bottom: "c2" bottom: "c3" bottom: "c4"
  bottom: "n1" bottom: "n2" bottom: "n3"
  top: "tower_in" concat_param {{ concat_dim: 0 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "concat_all" type: CONCAT
  bottom: "c1" bottom: "c2" bottom: "c3" bottom: "c4"
  top: "tower_in" concat_param {{ concat_dim: 0 }}
  include: {{ phase: TEST }}
}}
layers {{
  name: "fc7" type: INNER_PRODUCT bottom: "tower_in" top: "emb"
  inner_product_param {{
    num_output: 16
    weight_filler {{ type: "gaussian" std: 0.05 }}
  }}
}}
layers {{ name: "relu7" type: RELU bottom: "emb" top: "emb" }}
layers {{
  name: "slice_emb" type: SLICE bottom: "emb"
  top: "et" top: "ec1" top: "ec2" top: "ec3" top: "ec4"
  top: "en1" top: "en2" top: "en3"
  slice_param {{ slice_dim: 0 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "slice_emb" type: SLICE bottom: "emb"
  top: "ec1" top: "ec2" top: "ec3" top: "ec4"
  slice_param {{ slice_dim: 0 }}
  include: {{ phase: TEST }}
}}
layers {{
  name: "ctx_avg" type: ELTWISE
  bottom: "ec1" bottom: "ec2" bottom: "ec3" bottom: "ec4" top: "ctx"
  eltwise_param {{ operation: SUM coeff: 0.25 coeff: 0.25 coeff: 0.25 coeff: 0.25 }}
}}
layers {{ name: "ctx_norm" type: NORMALIZATION bottom: "ctx" top: "ctxn" }}
layers {{
  name: "tgt_norm" type: NORMALIZATION bottom: "et" top: "etn"
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "true_prod" type: ELTWISE bottom: "ctxn" bottom: "etn" top: "tp"
  eltwise_param {{ operation: PROD }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "true_score" type: SUM bottom: "tp" top: "ts"
  sum_param {{ num_output: 3 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "n1_norm" type: NORMALIZATION bottom: "en1" top: "en1n"
  include: {{ phase: TRAIN }} }}
layers {{
  name: "n2_norm" type: NORMALIZATION bottom: "en2" top: "en2n"
  include: {{ phase: TRAIN }} }}
layers {{
  name: "n3_norm" type: NORMALIZATION bottom: "en3" top: "en3n"
  include: {{ phase: TRAIN }} }}
layers {{ name: "np1" type: ELTWISE bottom: "ctxn" bottom: "en1n" top: "np1"
  eltwise_param {{ operation: PROD }} include: {{ phase: TRAIN }} }}
layers {{ name: "ns1" type: SUM bottom: "np1" top: "ns1"
  include: {{ phase: TRAIN }} }}
layers {{ name: "np2" type: ELTWISE bottom: "ctxn" bottom: "en2n" top: "np2"
  eltwise_param {{ operation: PROD }} include: {{ phase: TRAIN }} }}
layers {{ name: "ns2" type: SUM bottom: "np2" top: "ns2"
  include: {{ phase: TRAIN }} }}
layers {{ name: "np3" type: ELTWISE bottom: "ctxn" bottom: "en3n" top: "np3"
  eltwise_param {{ operation: PROD }} include: {{ phase: TRAIN }} }}
layers {{ name: "ns3" type: SUM bottom: "np3" top: "ns3"
  include: {{ phase: TRAIN }} }}
layers {{ name: "neg_concat" type: CONCAT
  bottom: "ns1" bottom: "ns2" bottom: "ns3" top: "negs"
  concat_param {{ concat_dim: 1 }} include: {{ phase: TRAIN }} }}
layers {{
  name: "max_margin_loss" type: MAX_MARGIN_LOSS
  bottom: "ts" bottom: "negs" top: "loss" top: "violations"
  loss_weight: 1.0 loss_weight: 0.0
  max_margin_loss_param {{ margin: 1.0 norm: L2 }}
  include: {{ phase: TRAIN }}
}}
layers {{
  name: "retrieval" type: RETRIEVAL_STATS
  bottom: "ctxn" bottom: "video_ids"
  top: "map" top: "hit1" top: "hit5"
  retrieval_stats_param {{ exclude_same_video_shots: false }}
  include: {{ phase: TEST }}
}}
"""

MINI_SOLVER = """
net: "{net_path}"
base_lr: 0.05
momentum: 0.9
weight_decay: 0.0001
lr_policy: "inv"
gamma: 0.001
power: 0.75
display: 10
max_iter: 150
test_interval: 20
test_iter: 1
snapshot: 0
snapshot_prefix: "{snap_prefix}"
"""


@pytest.fixture
def mini_project(tmp_path, rng):
    train_src, _ = _make_shot_records(tmp_path, rng, "train.vvr")
    test_src = _make_test_windows(tmp_path, rng, "test.vvr")
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(MINI_NET.format(train_src=train_src,
                                        test_src=test_src))
    solver_path = tmp_path / "solver.prototxt"
    solver_path.write_text(MINI_SOLVER.format(
        net_path=str(net_path), snap_prefix=str(tmp_path / "snap")))
    return {"net": str(net_path), "solver": str(solver_path),
            "tmp": tmp_path}


def test_solver_driver_end_to_end(mini_project):
    driver = SolverDriver.from_prototxt(mini_project["solver"]).build()
    res = driver.train()
    losses = [m[1]["loss"] for m in res.metrics_history]
    first = sum(losses[:3]) / 3
    last = sum(losses[-3:]) / 3
    assert last < first
    # test metrics were computed (mAP etc. from RETRIEVAL_STATS tops)
    assert res.test_history
    test_metrics = res.test_history[-1][1]
    assert "map" in test_metrics
    # class == video id here and exclusion is off, so the retrieval task is
    # well-posed: a zero mAP would mean the eval path is broken
    assert 0.0 < test_metrics["map"] <= 1.0
    # violations diagnostic flowed through
    assert "violations" in res.metrics_history[0][1]


def test_multi_test_nets_and_compute_loss(mini_project, tmp_path):
    """Repeated test_net + per-net test_iter + test_compute_loss
    (ref caffe.proto:86-116)."""
    from videovector_tpu.config.textformat import parse_file
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [4]
    solver_msg.fields["test_interval"] = [2]
    solver_msg.fields["test_iter"] = [1, 1]
    solver_msg.add("test_net", mini_project["net"])
    solver_msg.add("test_net", mini_project["net"])
    solver_msg.add("test_compute_loss", True)
    driver = SolverDriver(solver_msg).build()
    assert len(driver.test_nets) == 2
    res = driver.train()
    metrics = res.test_history[0][1]
    assert "net0/map" in metrics and "net1/map" in metrics
    assert "net0/loss" in metrics


def test_test_initialization_flag(mini_project):
    from videovector_tpu.config.textformat import parse_file
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [4]
    solver_msg.fields["test_interval"] = [2]
    solver_msg.add("test_initialization", False)
    driver = SolverDriver(solver_msg).build()
    res = driver.train()
    its = [t[0] for t in res.test_history]
    assert 0 not in its          # skipped at iter 0
    assert 2 in its and 4 in its


def test_snapshot_vis_and_debug_info_hooks(mini_project, tmp_path):
    """snapshot_vis / debug_info solver knobs (ref solver.cpp:183-193)."""
    from videovector_tpu.config.textformat import parse_file
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [6]
    solver_msg.fields["test_interval"] = [0]
    solver_msg.fields.pop("test_iter", None)  # the reference CHECKs test_interval>0 when test nets exist
    solver_msg.add("snapshot_vis", 3)
    solver_msg.add("snapshot_vis_dir", str(tmp_path / "vis"))
    solver_msg.add("debug_info", True)
    driver = SolverDriver(solver_msg).build()
    driver.train()
    vis_files = sorted(os.listdir(tmp_path / "vis"))
    assert "vis_iter_0.json" in vis_files and "vis_iter_3.json" in vis_files
    doc = json.load(open(tmp_path / "vis" / "vis_iter_3.json"))
    assert any(l["name"] == "fc7" for l in doc["layers"])


def test_snapshot_vis_blob_selection_and_truncate(mini_project, tmp_path):
    """snapshot_vis_blobs csv + snapshot_vis_truncate_len (ref
    solver.cpp:352-405): only the named blobs dump; the net-structure
    section appears only when the FIRST name is "network"; truncate_len
    bounds the per-blob sample."""
    from videovector_tpu.config.textformat import parse_file
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [2]
    solver_msg.fields["test_interval"] = [0]
    solver_msg.fields.pop("test_iter", None)
    solver_msg.add("snapshot_vis", 2)
    solver_msg.add("snapshot_vis_dir", str(tmp_path / "vis"))
    solver_msg.add("snapshot_vis_blobs", "loss,ctxn")
    solver_msg.add("snapshot_vis_truncate_len", 5)
    driver = SolverDriver(solver_msg).build()
    driver.train()
    doc = json.load(open(tmp_path / "vis" / "vis_iter_0.json"))
    assert sorted(doc["blobs"]) == ["ctxn", "loss"]
    assert doc["layers"] == []          # first name is not "network"
    assert len(doc["blobs"]["ctxn"]["values"]) == 5

    # "network" as the first token re-enables the structure dump
    solver_msg.fields["snapshot_vis_blobs"] = ["network,loss"]
    driver2 = SolverDriver(solver_msg).build()
    driver2.train()
    doc2 = json.load(open(tmp_path / "vis" / "vis_iter_0.json"))
    assert any(l["name"] == "fc7" for l in doc2["layers"])
    assert sorted(doc2["blobs"]) == ["loss"]


def test_driver_training_is_deterministic(mini_project):
    """Same solver + same seeds → identical loss trajectory (guards stable
    dropout streams, sampler seeding, init seeding)."""
    from videovector_tpu.config.textformat import parse_file
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [8]
    solver_msg.fields["display"] = [2]
    solver_msg.fields["test_interval"] = [0]
    solver_msg.fields.pop("test_iter", None)  # the reference CHECKs test_interval>0 when test nets exist

    def run():
        driver = SolverDriver(solver_msg).build()
        res = driver.train()
        return [m[1]["loss"] for m in res.metrics_history]

    np.testing.assert_allclose(run(), run(), rtol=1e-6)


def test_solver_random_seed_reaches_fillers(mini_project, tmp_path):
    """SolverParameter.random_seed seeds param init and data sampling (ref
    Caffe::set_random_seed, solver.cpp:37-39): different seeds -> different
    initial params; same seed -> identical."""
    from videovector_tpu.config.textformat import parse_file

    def init_params(seed_line):
        msg = parse_file(mini_project["solver"])
        msg.fields.pop("random_seed", None)
        if seed_line is not None:
            msg.add("random_seed", seed_line)
        d = SolverDriver(msg, net_dir=".").build()
        return d.params

    a = init_params(7)
    b = init_params(7)
    c = init_params(8)
    fa = np.asarray(a["fc7"]["w"] if "fc7" in a else list(a.values())[0]["w"])
    fb = np.asarray(b["fc7"]["w"] if "fc7" in b else list(b.values())[0]["w"])
    fc = np.asarray(c["fc7"]["w"] if "fc7" in c else list(c.values())[0]["w"])
    np.testing.assert_array_equal(fa, fb)
    assert not np.array_equal(fa, fc)


def test_cli_train_and_test(mini_project, capsys):
    from videovector_tpu.tools.cli import main
    assert main(["train", "--solver", mini_project["solver"]]) == 0
    # snapshot_after_train wrote the final model
    snap = str(mini_project["tmp"] / "snap_iter_150.vvmodel")
    assert os.path.exists(snap)
    assert main(["test", "--model", mini_project["net"],
                 "--weights", snap, "--iterations", "2"]) == 0
    assert main(["device_query"]) == 0


STATEFUL_TEST_NET = """
name: "carry_cli"
layers { name: "d" type: DUMMY_DATA top: "x" top: "cont" top: "y"
  dummy_data_param {
    num: 4 num: 4 num: 4
    channels: 3 channels: 3 channels: 3
    height: 5 height: 1 height: 8
    width: 1 width: 1 width: 1
    data_filler { type: "uniform" min: -1 max: 1 }
    data_filler { type: "constant" value: 1 }
    data_filler { type: "constant" value: 0.5 }
  } }
layers { name: "rnn" type: LSTM bottom: "x" bottom: "cont" top: "h"
  inner_product_param { num_output: 8
    weight_filler { type: "gaussian" std: 0.3 } } }
layers { name: "fb" type: FLATTEN_BATCH bottom: "h" top: "hf" }
layers { name: "yf" type: FLATTEN_BATCH bottom: "y" top: "yf" }
layers { name: "loss" type: EUCLIDEAN_LOSS bottom: "hf" bottom: "yf"
  top: "l" }
"""


def test_cli_test_threads_lstm_state(tmp_path):
    """`vvtpu test` must carry LSTM cross-batch state between its forward
    iterations, exactly like the reference's `caffe test` which reuses one
    net whose prev_cell_/prev_out_ persist across Forward calls
    (ref lstm_layer.cpp:171-173,261-264). Regression: cmd_test used to
    rebuild state=None every batch, silently resetting the recurrence."""
    import logging

    import jax
    import jax.numpy as jnp

    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.cli import main

    model = tmp_path / "carry_cli.prototxt"
    model.write_text(STATEFUL_TEST_NET)

    class _Collect(logging.Handler):
        def __init__(self):
            super().__init__()
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    handler = _Collect()
    logger = logging.getLogger("videovector_tpu")
    logger.addHandler(handler)
    try:
        assert main(["test", "--model", str(model),
                     "--allow_random_weights",
                     "--iterations", "2"]) == 0
    finally:
        logger.removeHandler(handler)
    # per-batch per-element lines, reference format "Batch i, <name> = v"
    # (tools/caffe.cpp:156-169); this net's single output blob is "l"
    losses = [float(m.split(" = ")[1]) for m in handler.lines
              if m.startswith("Batch ") and ", l = " in m]
    assert len(losses) == 2

    # expected: hand-thread the carry through Net.apply with the same
    # PRNGKey(0) init cmd_test uses (DUMMY_DATA fills are rng-free in
    # eval, so batches are reproducible)
    net = Net(parse(STATEFUL_TEST_NET), phase="TEST")
    params, _ = net.init(jax.random.PRNGKey(0), {})
    loss0, _, st = net.apply(params, {}, return_state=True)
    loss1, _, _ = net.apply(params, {}, state=st, return_state=True)
    np.testing.assert_allclose(losses[0], float(loss0), rtol=1e-5)
    np.testing.assert_allclose(losses[1], float(loss1), rtol=1e-5)
    # and the carry must matter: a reset second forward differs
    loss1_reset, _ = net.apply(params, {})
    assert abs(float(loss1_reset) - float(loss1)) > 1e-6
    assert jnp is not None


def test_sink_files_written_during_test_phase(mini_project, tmp_path):
    """Reference sink layers write their files during TEST forwards
    (ref write_to_file_layer.cpp:36-64, retrieval_stats_layer.cpp:148-155):
    both the driver's test-interval eval and `vvtpu test` must produce
    them — a prototxt with stats_output_file / WRITE_TO_FILE silently
    writing nothing would be a parity break."""
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.solver.driver import SolverDriver
    from videovector_tpu.tools.cli import main

    stats_csv = tmp_path / "stats_out.csv"
    acts_csv = tmp_path / "acts_out.csv"
    net_text = open(mini_project["net"]).read()
    assert "exclude_same_video_shots: false }" in net_text
    net_text = net_text.replace(
        "retrieval_stats_param { exclude_same_video_shots: false }",
        'retrieval_stats_param { exclude_same_video_shots: false\n'
        f'    stats_output_file: "{stats_csv}" }}')
    net_text += f'''
layers {{ name: "dump_ctx" type: WRITE_TO_FILE bottom: "ctxn"
  write_to_file_param {{ output_file: "{acts_csv}" }}
  include: {{ phase: TEST }} }}
'''
    net_path = tmp_path / "net_sinks.prototxt"
    net_path.write_text(net_text)
    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["net"] = [str(net_path)]
    solver_msg.fields["max_iter"] = [4]
    solver_msg.fields["test_interval"] = [2]
    solver_msg.fields["display"] = [0]
    driver = SolverDriver(solver_msg).build()
    res = driver.train()
    assert res.test_history
    lines = stats_csv.read_text().strip().split("\n")
    assert lines[0].startswith("#video_id,class_id,ap,acc@1,acc@5")
    assert len(lines) > 1
    acts = acts_csv.read_text().strip().split("\n")
    assert acts[0].startswith("#batch_id,channel_id,features(1..")
    assert len(acts) > 1

    # the `vvtpu test` surface truncates + rewrites per forward (reference
    # ofstream semantics) — files reflect the LAST eval batch
    stats_csv.unlink()
    acts_csv.unlink()
    from videovector_tpu.solver.checkpoint import snapshot
    snap = snapshot(str(tmp_path / "sink_snap"), 0, res.params)[0]
    assert main(["test", "--model", str(net_path),
                 "--weights", snap, "--iterations", "2"]) == 0
    assert stats_csv.exists() and acts_csv.exists()
    assert acts_csv.read_text().startswith("#batch_id,channel_id,")
    baseline_stats = stats_csv.read_text()

    # gallery-sharded eval through the driver surface
    # (`vvtpu train --mesh --shard_gallery` plumb): same stats csv
    from videovector_tpu.parallel import make_mesh
    stats_csv.unlink()
    driver2 = SolverDriver(solver_msg).build()
    driver2.train(mesh=make_mesh(data=4, model=1), shard_gallery=True)
    sharded = stats_csv.read_text()
    assert sharded.splitlines()[0] == baseline_stats.splitlines()[0]
    assert len(sharded.splitlines()) == len(baseline_stats.splitlines())


def test_sink_files_written_during_train_phase(mini_project, tmp_path):
    """A WRITE_TO_FILE layer in the TRAIN net writes its csv on every
    training Forward in the reference (write_to_file_layer.cpp:36-64 runs
    in whatever phase holds the layer); the driver's fused train step must
    feed it too — previously TRAIN-phase sinks silently wrote nothing
    (STATUS.md known gap, now closed)."""
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.solver.driver import SolverDriver

    train_csv = tmp_path / "train_acts.csv"
    net_text = open(mini_project["net"]).read()
    net_text += f'''
layers {{ name: "dump_train" type: WRITE_TO_FILE bottom: "ctxn"
  write_to_file_param {{ output_file: "{train_csv}" }}
  include: {{ phase: TRAIN }} }}
'''
    net_path = tmp_path / "net_train_sink.prototxt"
    net_path.write_text(net_text)
    def run(max_iter):
        solver_msg = parse_file(mini_project["solver"])
        solver_msg.fields["net"] = [str(net_path)]
        solver_msg.fields["max_iter"] = [max_iter]
        solver_msg.fields["test_interval"] = [0]
        solver_msg.fields.pop("test_iter", None)  # the reference CHECKs test_interval>0 when test nets exist
        solver_msg.fields["display"] = [1]
        return SolverDriver(solver_msg).build().train()

    res = run(1)
    acts1 = train_csv.read_text().strip().split("\n")
    assert acts1[0].startswith("#batch_id,channel_id,features(1..")
    assert len(acts1) > 1

    res = run(3)
    assert res.metrics_history  # training ran and displayed
    # "__sinks__" never leaks into the displayed metrics
    assert all("__sinks__" not in m[1] for m in res.metrics_history)
    acts3 = train_csv.read_text().strip().split("\n")
    # truncate-per-forward: the file holds ONE forward's rows, not 3
    # iterations' accumulation
    assert len(acts3) == len(acts1)


def test_cli_finetune_from_caffemodel(mini_project, tmp_path):
    """--weights finetune: .caffemodel weights land in the train net
    (ref tools/caffe.cpp:110-117 CopyTrainedLayersFrom)."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.data.weights import params_to_weights
    from videovector_tpu.solver.driver import SolverDriver

    solver_msg = parse_file(mini_project["solver"])
    solver_msg.fields["max_iter"] = [1]
    solver_msg.fields["test_interval"] = [0]
    solver_msg.fields.pop("test_iter", None)  # the reference CHECKs test_interval>0 when test nets exist
    solver_msg.fields["display"] = [0]
    driver = SolverDriver(solver_msg).build()
    # craft recognizable fc7 weights and save as .caffemodel
    shaped = jax.tree.map(lambda a: jnp.full_like(a, 0.123), driver.params)
    cm = str(tmp_path / "pre.caffemodel")
    params_to_weights({"fc7": shaped["fc7"]}).save(cm)
    res = driver.train(weights_path=cm, max_iter=0)   # load only, no steps
    np.testing.assert_allclose(np.asarray(res.params["fc7"]["w"]), 0.123,
                               rtol=1e-6)


def test_cli_time(mini_project):
    from videovector_tpu.tools.cli import main
    # segmented (default): one compile, per-layer marginal costs
    assert main(["time", "--model", mini_project["net"],
                 "--iterations", "2"]) == 0
    # isolated: reference caffe.cpp semantics (jit per layer)
    assert main(["time", "--model", mini_project["net"],
                 "--iterations", "2", "--per_layer", "isolated"]) == 0
    assert main(["time", "--model", mini_project["net"],
                 "--iterations", "2", "--fused_only"]) == 0
    # per-layer backward timing, both modes
    assert main(["time", "--model", mini_project["net"], "--iterations", "1",
                 "--backward"]) == 0
    assert main(["time", "--model", mini_project["net"], "--iterations", "1",
                 "--backward", "--per_layer", "isolated"]) == 0


def test_cli_time_memory(mini_project):
    """`vvtpu time --memory` reports XLA buffer-assignment memory (peak +
    argument/output/temp components) for the forward and fwd+bwd programs."""
    import logging

    class _Collect(logging.Handler):
        def __init__(self):
            super().__init__()
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    handler = _Collect()
    logger = logging.getLogger("videovector_tpu")
    logger.addHandler(handler)
    try:
        from videovector_tpu.tools.cli import main
        assert main(["time", "--model", mini_project["net"],
                     "--iterations", "1", "--fused_only", "--memory"]) == 0
    finally:
        logger.removeHandler(handler)
    text = "\n".join(handler.lines)
    assert "Memory (fused forward-backward): peak " in text
    assert "Memory (forward only): peak " in text
    assert "arguments " in text and "temporaries " in text


def test_segmented_timing_covers_every_layer(mini_project):
    """The segmented mode must report a marginal line for every compute
    layer and a prefix-sum total."""
    import logging

    class _Collect(logging.Handler):
        def __init__(self):
            super().__init__()
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    handler = _Collect()
    logger = logging.getLogger("videovector_tpu")
    logger.addHandler(handler)
    try:
        from videovector_tpu.tools.cli import main
        main(["time", "--model", mini_project["net"], "--iterations", "1"])
    finally:
        logger.removeHandler(handler)
    text = "\n".join(handler.lines)
    assert "forward (marginal)" in text
    assert "Total forward (prefix sum)" in text
    assert "Fused forward-backward" in text


def test_extract_features_tool(mini_project, tmp_path):
    from videovector_tpu.tools.extract_features import extract
    from videovector_tpu.data.records import RecordReader
    from videovector_tpu.data.wire import Datum as D
    out_prefix = str(tmp_path / "feats")
    counts = extract(mini_project["net"], [], ["ctxn"], out_prefix, 2)
    assert counts["ctxn"] == 24  # 2 batches × 12 windows
    r = RecordReader(out_prefix + "_ctxn.vvr")
    assert len(r) == 24
    d = D.decode(bytes(r.value(0)))
    assert len(d.float_data) == 16
    # csv written too
    lines = open(out_prefix + "_ctxn.txt").read().strip().split("\n")
    assert len(lines) == 24


def test_extract_features_mesh_matches_single_device(mini_project, tmp_path):
    """Data-parallel extraction (batch sharded over the mesh "data" axis,
    params replicated) must produce the same rows as single-device."""
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.tools.extract_features import extract
    from videovector_tpu.data.records import RecordReader
    from videovector_tpu.data.wire import Datum as D

    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    extract(mini_project["net"], [], ["ctxn"], single, 2)
    extract(mini_project["net"], [], ["ctxn"], sharded, 2,
            mesh=make_mesh(data=4, model=1))
    a = RecordReader(single + "_ctxn.vvr")
    b = RecordReader(sharded + "_ctxn.vvr")
    assert len(a) == len(b) == 24
    for i in range(len(a)):
        ra = np.asarray(D.decode(bytes(a.value(i))).float_data)
        rb = np.asarray(D.decode(bytes(b.value(i))).float_data)
        np.testing.assert_allclose(ra, rb, atol=1e-5)


def test_cli_test_mesh(mini_project):
    from videovector_tpu.tools.cli import main
    assert main(["test", "--model", mini_project["net"],
                 "--allow_random_weights",
                 "--iterations", "2", "--mesh", "4"]) == 0


def test_extract_features_leveldb_backend(mini_project, tmp_path):
    """backend="leveldb" matches the reference's output format exactly
    (ref:tools/extract_features.cpp:152-188): plain "%d" decimal keys,
    Datum(height=dim, width=1, channels=1), "#features" text header."""
    from videovector_tpu.tools.extract_features import extract
    from videovector_tpu.data.leveldbio import LevelDbReader
    from videovector_tpu.data.wire import Datum as D
    out_prefix = str(tmp_path / "feats")
    counts = extract(mini_project["net"], [], ["ctxn"], out_prefix, 2,
                     backend="leveldb")
    assert counts["ctxn"] == 24
    r = LevelDbReader(out_prefix + "_ctxn_leveldb", verify_checksums=True)
    assert len(r) == 24
    # keys are str(index), lexicographically ordered by LevelDB:
    # "0" < "1" < "10" < ... — a consumer looking up "17" must find row 17
    assert set(r.key(i) for i in range(len(r))) == \
        {str(i).encode() for i in range(24)}
    d = D.decode(r.get(b"0"))
    assert (d.channels, d.height, d.width) == (1, 16, 1)
    assert len(d.float_data) == 16
    # text file lives INSIDE the db dir (ref :141-142) with ostream float
    # formatting (6 sig figs / %g) and trailing-comma rows (:179)
    lines = open(out_prefix + "_ctxn_leveldb/text_output.txt").read().split("\n")
    assert lines[0] == "#features"
    assert lines[1].endswith(",")
    vals = [v for v in lines[1].split(",") if v]
    assert len(vals) == 16
    for v in vals:  # %g: no fixed-point zero-padding like 0.000000
        assert v == f"{float(v):g}"


def test_dump_network_tool(mini_project, tmp_path):
    from videovector_tpu.tools.dump import dump_network
    out = str(tmp_path / "dump")
    blobs = dump_network(mini_project["net"], out)
    assert "ctxn" in blobs
    assert os.path.exists(os.path.join(out, "ctxn.blob"))
    assert os.path.exists(os.path.join(out, "activations.npz"))


def test_converters_and_mean(tmp_path, rng):
    from PIL import Image
    from videovector_tpu.tools.converters import (
        compute_image_mean, convert_flexible_list, convert_imageset,
        write_mean_to_binary_proto,
    )
    from videovector_tpu.data.wire import BlobProto
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (10, 10, 3)).astype(np.uint8)) \
            .save(img_dir / f"im{i}.png")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(f"im{i}.png {i}" for i in range(4)))
    out = str(tmp_path / "imgs.vvr")
    assert convert_imageset(str(img_dir), str(lst), out,
                            resize_h=8, resize_w=8) == 4

    mean_path = str(tmp_path / "mean.blob")
    mean = compute_image_mean(out, mean_path)
    assert mean.shape == (3, 8, 8)
    loaded = BlobProto.decode(open(mean_path, "rb").read()).to_array()
    np.testing.assert_allclose(loaded[0], mean, rtol=1e-6)

    const_path = str(tmp_path / "const_mean.blob")
    write_mean_to_binary_proto(const_path, (104, 117, 123), 8, 8)
    cm = BlobProto.decode(open(const_path, "rb").read()).to_array()
    np.testing.assert_allclose(cm[0, 1], 117.0)

    idx_out = str(tmp_path / "index.vvr")
    assert convert_flexible_list(str(lst), idx_out) == 4
    # reference byte format: "%08d_" + path minus its 4-char extension,
    # value = 4-digit label only (convert_flexible_list.cpp:125-140)
    from videovector_tpu.data.records import RecordReader
    ir = RecordReader(idx_out)
    assert ir.key(0) == b"00000000_im0"
    assert bytes(ir.value(0)) == b"0000"


def test_plot_training_stats_parse(tmp_path):
    from videovector_tpu.tools.plot_training_stats import parse_log
    log = tmp_path / "train.log"
    log.write_text(
        "I0816 10:00:00.000000 1 train.py:1] Iteration 0, lr = 0.05\n"
        "I0816 10:00:00.000000 1 train.py:1] Iteration 0, loss = 2.5\n"
        "I0816 10:00:01.000000 1 train.py:1] Iteration 10, loss = 1.5\n"
        "I0816 10:00:02.000000 1 train.py:1] Iteration 20, Testing net\n"
        "I0816 10:00:02.000000 1 train.py:1]     Test net output #0: map = 0.75\n")
    stats = parse_log(str(log))
    assert stats["train_loss"] == [(0, 2.5), (10, 1.5)]
    assert stats["lr"] == [(0, 0.05)]
    assert stats["test"]["map"] == [(20, 0.75)]


def test_cli_time_deploy_style_prototxt(tmp_path):
    """`vvtpu time` on a deploy prototxt (input/input_dim, no data layers) —
    the reference tool's canonical use (caffe time --model=deploy.prototxt)."""
    from videovector_tpu.tools.cli import main
    net = tmp_path / "deploy.prototxt"
    net.write_text("""
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 8 input_dim: 8
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layers { name: "relu" type: RELU bottom: "out" top: "out" }
""")
    assert main(["time", "--model", str(net), "--iterations", "2"]) == 0
    # loss-less net: the fused timing must NOT measure a constant-folded
    # zero-loss program — it reduces the net outputs to a scalar instead
    # (regression: a deploy net timed ~0 real work before)
    import logging

    class _Collect(logging.Handler):
        def __init__(self):
            super().__init__()
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    handler = _Collect()
    logger = logging.getLogger("videovector_tpu")
    logger.addHandler(handler)
    try:
        assert main(["time", "--model", str(net), "--iterations", "1",
                     "--fused_only", "--memory"]) == 0
    finally:
        logger.removeHandler(handler)
    text = "\n".join(handler.lines)
    assert "no loss layer" in text
    assert "Memory (fused forward-backward): peak " in text


def test_serving_export_roundtrip(mini_project, tmp_path):
    """Serving artifact: export the TEST-phase forward with weights bound as
    constants; the deserialized artifact must reproduce net.apply outputs
    with no model code."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.graph.data_factory import MergedSource, make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.serving import export_serving, load_serving

    out = str(tmp_path / "model.vvserve")
    meta = export_serving(mini_project["net"], [], ["ctxn"], out)
    assert meta["outputs"] == ["ctxn"]

    call, meta2 = load_serving(out)
    assert meta2["inputs"].keys() == meta["inputs"].keys()
    rng2 = np.random.RandomState(3)
    batch = {k: rng2.randn(*shape).astype(np.float32)
             for k, (shape, _dtype) in meta2["inputs"].items()}
    served = call(batch)

    # oracle: rebuild the net with the SAME init seed (no weights files in
    # this fixture, so params come from the seeded fillers)
    net = Net(parse_file(mini_project["net"]), phase="TEST")
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batch.items()}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    _, blobs = net.apply(params, {k: jnp.asarray(v)
                                  for k, v in batch.items()},
                         return_blobs=True)
    np.testing.assert_allclose(np.asarray(served["ctxn"]),
                               np.asarray(blobs["ctxn"]), atol=1e-5)


def test_serving_cli(mini_project, tmp_path):
    from videovector_tpu.tools.serving import main
    out = str(tmp_path / "m.vvserve")
    assert main(["export", mini_project["net"], out, "--blobs", "ctxn"]) == 0
    assert main(["run", out]) == 0
    # --iterations/--memory: timed smoke-bench + buffer-assignment report
    assert main(["run", out, "--iterations", "2", "--memory"]) == 0
    # info: metadata header without program deserialization
    assert main(["info", out]) == 0
    from videovector_tpu.tools.serving import read_meta
    meta = read_meta(out)
    assert meta["outputs"] == ["ctxn"]
    assert meta["payload_bytes"] > 0
    shape, dtype = meta["output_shapes"]["ctxn"]
    assert dtype == "float32" and len(shape) >= 2


def test_serving_symbolic_batch(tmp_path):
    """--symbolic_batch: one artifact serves any batch size."""
    from videovector_tpu.tools.serving import export_serving, load_serving
    net = tmp_path / "deploy.prototxt"
    net.write_text("""
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 16 input_dim: 1
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layers { name: "norm" type: NORMALIZATION bottom: "out" top: "outn" }
""")
    out = str(tmp_path / "m.vvserve")
    meta = export_serving(str(net), [], ["outn"], out, symbolic_batch=True)
    assert meta["inputs"]["data"][0][0] == -1
    call, _ = load_serving(out)
    for n in (2, 9):
        got = call({"data": np.random.RandomState(n)
                    .randn(n, 1, 16, 1).astype(np.float32)})
        assert got["outn"].shape == (n, 6)


def test_serving_sharded_matches_single_device(tmp_path):
    """shard_serving: data-parallel serving over the mesh "data" axis must
    reproduce the single-device artifact outputs exactly (shards are
    independent — no collectives) and reject non-divisible batches."""
    import pytest
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.tools.serving import (export_serving, load_serving,
                                               shard_serving)
    net = tmp_path / "deploy.prototxt"
    net.write_text("""
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 16 input_dim: 1
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 6 weight_filler { type: "xavier" } } }
layers { name: "norm" type: NORMALIZATION bottom: "out" top: "outn" }
""")
    out = str(tmp_path / "m.vvserve")
    export_serving(str(net), [], ["outn"], out, symbolic_batch=True)
    call, meta = load_serving(out)
    mesh = make_mesh(data=8)
    sharded = shard_serving(call, meta, mesh)
    batch = {"data": np.random.RandomState(0)
             .randn(16, 1, 16, 1).astype(np.float32)}
    got = sharded(batch)
    want = call(batch)
    np.testing.assert_allclose(np.asarray(got["outn"]),
                               np.asarray(want["outn"]), atol=1e-6)
    with pytest.raises(ValueError, match="not divisible"):
        sharded({"data": batch["data"][:6]})
    # the shard_map wrapper must be traced ONCE across repeated calls —
    # building it fresh per call would miss jit's identity-keyed cache and
    # recompile every invocation (regression: serving-path retrace bug)
    traces = {"n": 0}

    def counting(b):
        traces["n"] += 1
        return call(b)

    sharded2 = shard_serving(counting, meta, mesh)
    for _ in range(3):
        sharded2(batch)
    assert traces["n"] == 1


def test_serving_tensor_parallel_export(tmp_path):
    """export_serving(mesh=): a multi-device artifact with weights
    column-sharded over "model" (GSPMD collectives baked in) reproduces
    the single-device artifact's outputs; mesh_serving runs it."""
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.tools.serving import (export_serving, load_serving,
                                               mesh_serving)
    net = tmp_path / "deploy.prototxt"
    net.write_text("""
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 16 input_dim: 1
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 8 weight_filler { type: "xavier" } } }
layers { name: "norm" type: NORMALIZATION bottom: "out" top: "outn" }
""")
    single = str(tmp_path / "m1.vvserve")
    export_serving(str(net), [], ["outn"], single)
    tp = str(tmp_path / "m8.vvserve")
    meta_tp = export_serving(str(net), [], ["outn"], tp,
                             mesh=make_mesh(data=2, model=4))
    assert meta_tp["nr_devices"] == 8
    assert meta_tp["mesh"] == {"data": 2, "model": 4}

    call1, _ = load_serving(single)
    call8, meta8 = load_serving(tp)
    batch = {"data": np.random.RandomState(0)
             .randn(4, 1, 16, 1).astype(np.float32)}
    want = call1(batch)
    got = mesh_serving(call8, meta8)(batch)
    np.testing.assert_allclose(np.asarray(got["outn"]),
                               np.asarray(want["outn"]), atol=1e-5)
    # the run CLI composes mesh_serving with --iterations/--memory on the
    # baked 8-device program
    from videovector_tpu.tools.serving import main
    assert main(["run", tp, "--iterations", "2", "--memory"]) == 0


def test_serving_tp_composes_with_quantize_and_symbolic(tmp_path):
    """The multi-device export composes with the other knobs: int8×TP
    equals int8 single-device; bf16×TP×symbolic_batch serves any
    divisible batch."""
    from videovector_tpu.parallel import make_mesh
    from videovector_tpu.tools.serving import (export_serving, load_serving,
                                               mesh_serving)
    net = tmp_path / "deploy.prototxt"
    net.write_text("""
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 16 input_dim: 1
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 8 weight_filler { type: "xavier" } } }
layers { name: "norm" type: NORMALIZATION bottom: "out" top: "outn" }
""")
    mesh = make_mesh(data=2, model=4)
    calib = [{"data": np.random.RandomState(i)
              .randn(4, 1, 16, 1).astype(np.float32)} for i in range(3)]
    q1 = str(tmp_path / "q1.vvserve")
    export_serving(str(net), [], ["outn"], q1, quantize="int8",
                   calib_data=calib)
    qtp = str(tmp_path / "qtp.vvserve")
    export_serving(str(net), [], ["outn"], qtp, quantize="int8",
                   calib_data=calib, mesh=mesh)
    btp = str(tmp_path / "btp.vvserve")
    export_serving(str(net), [], ["outn"], btp, compute_dtype="bfloat16",
                   symbolic_batch=True, mesh=mesh)

    batch = {"data": np.random.RandomState(9)
             .randn(4, 1, 16, 1).astype(np.float32)}
    call1, _ = load_serving(q1)
    callq, metaq = load_serving(qtp)
    np.testing.assert_allclose(
        np.asarray(mesh_serving(callq, metaq)(batch)["outn"]),
        np.asarray(call1(batch)["outn"]), atol=1e-5)
    callb, metab = load_serving(btp)
    out = mesh_serving(callb, metab)(
        {"data": np.random.RandomState(2)
         .randn(16, 1, 16, 1).astype(np.float32)})
    assert np.asarray(out["outn"]).shape == (16, 8)


def test_serving_cli_run_mesh(mini_project, tmp_path):
    from videovector_tpu.tools.serving import main
    out = str(tmp_path / "m.vvserve")
    assert main(["export", mini_project["net"], out, "--blobs", "ctxn"]) == 0
    assert main(["run", out, "--mesh", "8"]) == 0
    # flag composition: shard-wrapped call + AOT memory report + timed loop
    assert main(["run", out, "--mesh", "8", "--iterations", "2",
                 "--memory"]) == 0


def test_resize_and_crop_images(tmp_path):
    """Reference dataset-prep utility: shorter side -> N, center square crop
    (ref tools/extra/resize_and_crop_images.py)."""
    from PIL import Image
    from videovector_tpu.tools.converters import resize_and_crop_images
    src = tmp_path / "in" / "synset1"
    src.mkdir(parents=True)
    Image.new("RGB", (100, 40), (200, 10, 10)).save(src / "wide.jpg")
    Image.new("RGB", (30, 90), (10, 200, 10)).save(src / "tall.png")
    (src / "notes.txt").write_text("skip me")
    out = tmp_path / "out"
    n = resize_and_crop_images(str(tmp_path / "in"), str(out), side=32)
    assert n == 2
    for name in ("synset1/wide.jpg", "synset1/tall.png"):
        img = Image.open(out / name)
        assert img.size == (32, 32)


def test_train_with_restarts_recovers_from_fault(mini_project, tmp_path):
    """Failure recovery (`vvtpu train --max_restarts`): a runtime fault
    mid-training reloads the newest snapshot and continues to max_iter;
    exhausting the budget re-raises. The reference's story is a human
    re-running `caffe train --snapshot=...` (ref solver.cpp:419-429)."""
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.solver.driver import SolverDriver
    from videovector_tpu.tools.cli import _train_with_restarts

    solver = parse(f"""
    net: "{mini_project['net']}"
    base_lr: 0.05 momentum: 0.9 lr_policy: "fixed"
    max_iter: 60 display: 10
    snapshot: 20 snapshot_prefix: "{tmp_path / 'wd'}"
    """)
    driver = SolverDriver(solver).build()

    calls = {"n": 0}
    orig_train = SolverDriver.train

    def flaky_train(self, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # run the first stretch for real (snapshots land), then fault
            orig_train(self, max_iter=45, **{k: v for k, v in kw.items()
                                             if k != "max_iter"})
            raise RuntimeError("injected device fault")
        return orig_train(self, **kw)

    import unittest.mock as mock
    with mock.patch.object(SolverDriver, "train", flaky_train):
        res = _train_with_restarts(driver, snapshot=None, weights=None,
                                   mesh=None, max_restarts=2)
    assert calls["n"] == 2
    # restart resumed from the iter-40 snapshot, not from scratch
    iters = [it for it, _ in res.metrics_history]
    assert min(iters) >= 40
    assert max(iters) >= 50

    # budget exhausted → the fault propagates
    calls["n"] = 0

    def always_fail(self, **kw):
        calls["n"] += 1
        raise RuntimeError("still broken")

    with mock.patch.object(SolverDriver, "train", always_fail):
        with pytest.raises(RuntimeError, match="still broken"):
            _train_with_restarts(driver.rebuild(), snapshot=None,
                                 weights=None, mesh=None, max_restarts=2)
    assert calls["n"] == 3  # initial + 2 restarts


def test_cli_strictness_checks(mini_project, tmp_path):
    """Reference CLI CHECKs: `caffe test` without --weights aborts
    (tools/caffe.cpp:129); `caffe train` with BOTH --snapshot and
    --weights aborts (tools/caffe.cpp:82-84)."""
    import pytest as _pytest

    from videovector_tpu.tools.cli import main

    with _pytest.raises(SystemExit, match="Need model weights"):
        main(["test", "--model", mini_project["net"], "--iterations", "1"])
    with _pytest.raises(SystemExit, match="not both"):
        main(["train", "--solver", mini_project["solver"],
              "--snapshot", str(tmp_path / "x.vvstate"),
              "--weights", str(tmp_path / "y.caffemodel")])


def test_solver_net_states_and_generic_test_instances(mini_project):
    """ref Solver::InitTrainNet/InitTestNets NetState assembly
    (solver.cpp:72-81, :141-152): solver train_state/test_state merge
    into the nets' states (stages concatenate), and extra test_iter
    entries spawn extra GENERIC-net test instances — two test_iter +
    two test_state over one `net:` builds two differently-staged nets."""
    from videovector_tpu.config.textformat import Message, parse_file

    # add stage-gated probe layers to the net
    with open(mini_project["net"], "a") as f:
        f.write("""
layers { name: "tr_probe" type: POWER bottom: "loss" top: "tr_probe"
  power_param { power: 2.0 } include: { phase: TRAIN stage: "trs" } }
layers { name: "te_probe" type: POWER bottom: "map" top: "te_probe"
  power_param { power: 2.0 } include: { phase: TEST stage: "deep" } }
""")
    msg = parse_file(mini_project["solver"])
    msg.fields["max_iter"] = [3]
    msg.fields["display"] = [1]
    msg.fields["test_interval"] = [3]
    msg.fields["test_iter"] = [1, 1]          # two generic instances
    st0, st1 = Message(), Message()
    st1.add("stage", "deep")
    msg.add("test_state", st0)
    msg.add("test_state", st1)
    ts = Message()
    ts.add("stage", "trs")
    msg.add("train_state", ts)

    driver = SolverDriver(msg).build()
    assert len(driver.test_nets) == 2
    res = driver.train()
    # the staged TRAIN probe became a train metric
    assert any("tr_probe" in k for k in res.metrics_history[0][1])
    merged = res.test_history[-1][1]
    assert "net0/map" in merged
    assert "net1/te_probe" in merged          # stage "deep" only on net1
    # net1's probe CONSUMES map, so map is net0-only (available_blobs)
    assert "net1/map" not in merged
    assert not any(k.startswith("net0/te_probe") for k in merged)


def test_solver_init_checks(mini_project):
    """ref Solver::Init CHECKs (solver.cpp:47-113): exactly one train-net
    field; test_iter covers every test net; test_state count matches;
    test_interval > 0 when test nets exist."""
    from videovector_tpu.config.textformat import Message, parse_file

    def fresh():
        return parse_file(mini_project["solver"])

    msg = fresh()
    msg.add("train_net", mini_project["net"])  # net AND train_net
    with pytest.raises(ValueError, match="more than"):
        SolverDriver(msg)

    msg = fresh()
    msg.fields.pop("net")
    with pytest.raises(ValueError, match="must specify a train net"):
        SolverDriver(msg)

    msg = fresh()
    msg.add("test_net", mini_project["net"])
    msg.fields.pop("test_iter")               # dedicated net, no test_iter
    with pytest.raises(ValueError, match="test_iter must be specified"):
        SolverDriver(msg)

    msg = fresh()
    st = Message()
    msg.add("test_state", st)
    msg.add("test_state", st)                 # 2 states, 1 instance
    with pytest.raises(ValueError, match="test_state"):
        SolverDriver(msg)

    msg = fresh()
    msg.fields["test_interval"] = [0]         # test nets but no interval
    with pytest.raises(ValueError, match="test_interval"):
        SolverDriver(msg)
