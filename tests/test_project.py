"""The shipped example project: prototxt generator + full training run at
reduced scale, plus the parity tool."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "projects", "videovec_embedding"))

from generate_net import emit  # noqa: E402

from videovector_tpu.config.textformat import parse, Message
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.data.wire import Datum, TestVideoShotWindows
from videovector_tpu.solver.driver import SolverDriver


def _mini_data(tmp_path, rng, dim=32):
    videos = []
    for v in range(12):
        center = rng.randn(dim).astype(np.float32)
        feats = np.abs(center + 0.3 * rng.randn(8, dim).astype(np.float32))
        videos.append(ShotVideo(v + 1, np.arange(8, dtype=np.int32), feats))
    train = str(tmp_path / "train.vvr")
    ShotDataset(videos).to_records(train)
    test = str(tmp_path / "test.vvr")
    with RecordWriter(test) as w:
        for i in range(10):
            video = videos[i % len(videos)]
            ids = rng.choice(8, size=4, replace=False)
            tw = TestVideoShotWindows(
                video_id=int(video.video_id),
                context_shot_words=[Datum(float_data=video.features[j])
                                    for j in ids])
            w.append(str(i), tw.encode())
    return train, test


def test_generated_net_parses_and_matches_reference_shape(tmp_path, rng):
    train, test = _mini_data(tmp_path, rng)
    text = emit(train, test, batch=8, test_batch=10, negatives=10, embed=16)
    msg = parse(text)
    layers = msg.get_list("layers")
    types = [l.get("type") for l in layers]
    # same layer-type census as the reference graph
    assert types.count("NORMALIZATION") == 13   # ctx + tgt + 10 negs + test
    assert types.count("SUM") == 11             # true + 10 neg scores
    assert types.count("ELTWISE") == 13         # ctx avg + test avg + 11 PRODs
    assert types.count("MAX_MARGIN_LOSS") == 1
    assert types.count("RETRIEVAL_STATS") == 1
    loss = next(l for l in layers if l.get("type") == "MAX_MARGIN_LOSS")
    assert loss.get_msg("max_margin_loss_param").get("margin") == 2.0


def test_generated_project_trains(tmp_path, rng):
    train, test = _mini_data(tmp_path, rng)
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(emit(train, test, batch=8, test_batch=10,
                             negatives=4, embed=16, buffer_size=20,
                             same_video_negs=2))
    solver = Message()
    solver.add("net", str(net_path))
    solver.add("base_lr", 0.01)
    solver.add("momentum", 0.9)
    solver.add("max_iter", 12)
    solver.add("display", 4)
    solver.add("test_interval", 6)
    solver.add("test_iter", 1)
    driver = SolverDriver(solver).build()
    res = driver.train()
    assert res.metrics_history
    assert "test_map" in res.test_history[0][1]


def test_parity_tool(tmp_path, rng):
    from videovector_tpu.tools.parity import compare, load_dump, main
    a = {"x": rng.randn(3, 4).astype(np.float32), "y": np.ones(5, np.float32)}
    b = {"x": a["x"].copy(), "y": np.ones(5, np.float32) * 1.5}
    np.savez(tmp_path / "a.npz", **a)
    np.savez(tmp_path / "b.npz", **b)
    rows, ok, missing = compare(load_dump(str(tmp_path / "a.npz")),
                                load_dump(str(tmp_path / "b.npz")))
    assert not ok
    by_name = {r[0]: r for r in rows}
    assert by_name["x"][5] is True
    assert by_name["y"][5] is False
    assert main([str(tmp_path / "a.npz"), str(tmp_path / "a.npz")]) == 0
    assert main([str(tmp_path / "a.npz"), str(tmp_path / "b.npz")]) == 1


def test_extraction_net_generator_builds():
    """projects/videovec_embedding/generate_extraction_net.py emits the
    reference extraction topology (conv1..pool5 -> fc6 -> fc7(ip1_nonorm)
    -> relu(ip2), ref videovec_extraction.prototxt) with reference layer
    names for .caffemodel name-matched loading."""
    import os
    import sys

    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "projects", "videovec_embedding"))
    from generate_extraction_net import emit

    txt = emit("list.txt", "mean.blob", batch=2)
    net = Net(parse(txt), phase="TEST")
    names = [l.get("name") for l in net.layers]
    for want in ("data", "conv1", "norm1", "conv5", "pool5", "fc6", "fc7",
                 "fc7_relu"):
        assert want in names
    # the conventional extraction blob exists as a top
    tops = [str(t) for l in net.layers for t in l.get_list("top")]
    assert "ip2" in tops and "ip1_nonorm" in tops
