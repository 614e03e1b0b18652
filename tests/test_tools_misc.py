"""Misc tool coverage: upgrade CLI, glog-format logging (downstream parsers
depend on the line shape)."""

import logging
import re

from videovector_tpu.tools.upgrade_net_proto import main as upgrade_main
from videovector_tpu.utils.logging import GlogFormatter


def test_upgrade_cli(tmp_path):
    src = tmp_path / "v0.prototxt"
    src.write_text("""
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
