"""Misc tool coverage: upgrade CLI, glog-format logging (downstream parsers
depend on the line shape)."""

import logging
import re
import os

import numpy as np

from videovector_tpu.tools.upgrade_net_proto import main as upgrade_main
from videovector_tpu.utils.logging import GlogFormatter


def test_upgrade_cli(tmp_path):
    src = tmp_path / "v0.prototxt"
    # "x" must be a declared net input — the reference's padding-upgrade
    # pass LOG(FATAL)s on undeclared blob inputs (upgrade_proto.cpp:74)
    src.write_text("""
    input: "x"
    input_dim: 1 input_dim: 4 input_dim: 1 input_dim: 1
    layers { layer { name: "ip" type: "innerproduct" num_output: 4 }
             bottom: "x" top: "y" }
    """)
    dst = tmp_path / "v1.prototxt"
    assert upgrade_main([str(src), str(dst)]) == 0
    out = dst.read_text()
    assert "INNER_PRODUCT" in out
    assert "inner_product_param" in out
    # V1 files pass through
    dst2 = tmp_path / "v1b.prototxt"
    assert upgrade_main([str(dst), str(dst2)]) == 0


def test_glog_line_format():
    fmt = GlogFormatter()
    rec = logging.LogRecord("vvtpu", logging.INFO, "/x/train.py", 42,
                            "Iteration %d, loss = %g", (10, 0.5), None)
    line = fmt.format(rec)
    # I<MMDD> <HH:MM:SS.uuuuuu> <pid> <file>:<line>] <msg>
    assert re.match(r"I\d{4} \d{2}:\d{2}:\d{2}\.\d{6}\s+\d+ train\.py:42\] "
                    r"Iteration 10, loss = 0\.5", line), line
    # the shape plot_training_stats parses
    from videovector_tpu.tools.plot_training_stats import ITER_LOSS_RE
    assert ITER_LOSS_RE.search(line)


# ------------------------------------------------------------- log extras
SAMPLE_LOG = """\
I0210 13:39:20.000000 1 train.py:1] Solving
I0210 13:39:22.500000 1 train.py:2] Iteration 0, lr = 0.01
I0210 13:39:22.500000 1 train.py:3] Iteration 0, loss = 2.5
I0210 13:39:25.000000 1 train.py:4] Iteration 0, Testing net (#0)
I0210 13:39:25.100000 1 train.py:5]     Test net output #0: map = 0.5
I0210 13:39:25.100000 1 train.py:5]     Test net output #1: hit1 = 0.7
I0210 13:40:22.000000 1 train.py:2] Iteration 10, lr = 0.009
I0210 13:40:22.000000 1 train.py:3] Iteration 10, loss = 1.25
"""


def test_extract_seconds(tmp_path):
    """Elapsed seconds since the Solving banner, per the reference's
    tools/extra/extract_seconds.py:21-37 semantics."""
    from videovector_tpu.tools.plot_training_stats import extract_seconds
    log_path = tmp_path / "train.log"
    log_path.write_text(SAMPLE_LOG)
    secs = extract_seconds(str(log_path), year=2026)
    assert abs(secs[0] - 2.5) < 1e-6
    assert abs(secs[10] - 62.0) < 1e-6


def test_parse_log_tables(tmp_path):
    """<log>.train/.test tables (ref tools/extra/parse_log.sh:2-36)."""
    from videovector_tpu.tools.plot_training_stats import main as plot_main
    log_path = tmp_path / "train.log"
    log_path.write_text(SAMPLE_LOG)
    assert plot_main([str(log_path), "--parse_log"]) == 0
    train = (tmp_path / "train.log.train").read_text().strip().split("\n")
    assert train[0] == "#Iters Seconds TrainingLoss LearningRate"
    assert train[1].split() == ["0", "2.500000", "2.5", "0.01"]
    assert train[2].split() == ["10", "62.000000", "1.25", "0.009"]
    test = (tmp_path / "train.log.test").read_text().strip().split("\n")
    assert test[0] == "#Iters Seconds hit1 map"
    assert test[1].split() == ["0", "2.500000", "0.7", "0.5"]


def test_device_watch_table():
    """gpustat-style watcher renders memory_stats rows (and n/a when the
    runtime does not expose stats, e.g. through the axon tunnel)."""
    import io
    from unittest import mock
    from videovector_tpu.tools.cli import _device_watch

    class FakeDev:
        def __init__(self, stats):
            self._stats = stats
        def __str__(self):
            return "TPU v5 fake0"
        def memory_stats(self):
            return self._stats

    buf = io.StringIO()
    devs = [FakeDev({"bytes_in_use": 512 << 20, "peak_bytes_in_use": 1 << 30,
                     "bytes_limit": 16 << 30, "num_allocs": 42}),
            FakeDev(None)]
    with mock.patch("jax.devices", return_value=devs):
        assert _device_watch(interval=0.01, count=2, out=buf) == 0
    lines = buf.getvalue().strip().split("\n")
    assert "used MB" in lines[0]
    assert len(lines) == 1 + 2 * 2  # header + 2 devices x 2 ticks
    assert "512.0" in lines[1] and "1024.0" in lines[1] and "42" in lines[1]
    assert " 3.1" in lines[1]  # 512MB/16GB use%
    assert "n/a" in lines[2]


def test_device_query_cli_watch_flag():
    from videovector_tpu.tools.cli import main
    assert main(["device_query", "--watch", "--interval", "0.01",
                 "--count", "1"]) == 0


def test_parity_disjoint_dumps_fail(rng):
    """Dumps with no common blobs (or any one-sided blob) must FAIL —
    comparing nothing used to print PARITY: PASS and exit 0."""
    from videovector_tpu.tools.parity import compare
    x = rng.randn(2, 3).astype(np.float32)
    rows, ok, missing = compare({"a": x}, {"b": x})
    assert not ok and missing == ["a", "b"] and rows == []
    rows, ok, missing = compare({"a": x, "c": x}, {"a": x})
    assert not ok and missing == ["c"]
    rows, ok, missing = compare({"a": x}, {"a": x.copy()})
    assert ok and not missing


def test_extract_features_includes_first_batch(tmp_path, rng):
    """The batch consumed for shape inference must be re-fed: output row 0
    is the dataset's record 0 (the old stream skipped the whole first
    batch, shifting every row vs the reference). Also: unknown blob names
    fail BEFORE any store is created."""
    import pytest
    from videovector_tpu.data.records import RecordReader, RecordWriter
    from videovector_tpu.data.wire import Datum
    from videovector_tpu.tools.extract_features import extract

    store = str(tmp_path / "in.vvr")
    with RecordWriter(store) as w:
        for i in range(8):
            pix = np.full((1, 4, 4), i * 7 % 250, np.uint8)
            w.append(str(i), Datum(channels=1, height=4, width=4,
                                   data=pix.tobytes(), label=i).encode())
    net = tmp_path / "net.prototxt"
    net.write_text(f"""
layers {{ name: "d" type: DATA top: "img" top: "lbl"
  data_param {{ source: "{store}" batch_size: 2 }} }}
layers {{ name: "sil" type: SILENCE bottom: "lbl" }}
layers {{ name: "fl" type: FLATTEN bottom: "img" top: "flat" }}
""")
    out = str(tmp_path / "feats")
    counts = extract(str(net), [], ["flat"], out, 2)
    assert counts["flat"] == 4
    r = RecordReader(out + "_flat.vvr")
    row0 = np.asarray(Datum.decode(bytes(r.value(0))).float_data)
    np.testing.assert_allclose(row0, 0.0)        # record 0, pixels all 0
    row2 = np.asarray(Datum.decode(bytes(r.value(2))).float_data)
    np.testing.assert_allclose(row2, 14.0)       # record 2, pixels 2*7

    with pytest.raises(ValueError, match="Unknown feature blob"):
        extract(str(net), [], ["nope"], str(tmp_path / "x"), 1)
    assert not os.path.exists(str(tmp_path / "x") + "_nope.vvr")
