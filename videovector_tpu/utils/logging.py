"""Logging for videovector_tpu.

The reference uses glog (`LOG(INFO) << ...`) everywhere; its offline tooling
parses those text lines (ref:caffe_utils/plot_training_stats.py:10-40). We keep a
glog-compatible line format (`I0816 12:00:00.000000 12345 file.py:10] msg`) so
equivalent log-scraping tools keep working, layered on Python logging.
"""

from __future__ import annotations

import logging
import os
import sys
import threading
import time

_LOCK = threading.Lock()
_CONFIGURED = False


class GlogFormatter(logging.Formatter):
    LEVEL_CHAR = {
        logging.DEBUG: "D",
        logging.INFO: "I",
        logging.WARNING: "W",
        logging.ERROR: "E",
        logging.CRITICAL: "F",
    }

    def format(self, record: logging.LogRecord) -> str:
        t = time.localtime(record.created)
        usec = int((record.created % 1.0) * 1e6)
        level = self.LEVEL_CHAR.get(record.levelno, "I")
        prefix = "%s%02d%02d %02d:%02d:%02d.%06d %5d %s:%d]" % (
            level, t.tm_mon, t.tm_mday, t.tm_hour, t.tm_min, t.tm_sec, usec,
            record.process, os.path.basename(record.pathname), record.lineno,
        )
        return f"{prefix} {record.getMessage()}"


def get_logger(name: str = "vvtpu") -> logging.Logger:
    global _CONFIGURED
    with _LOCK:
        if not _CONFIGURED:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(GlogFormatter())
            # callers pass __name__, so hang the handler on both hierarchy
            # roots ("vvtpu" and "videovector_tpu.*") — a handler on only
            # one silently swallows every module logger under the other
            for root_name in ("vvtpu", "videovector_tpu"):
                root = logging.getLogger(root_name)
                root.addHandler(handler)
                root.setLevel(os.environ.get("VVTPU_LOG_LEVEL", "INFO"))
                root.propagate = False
            _CONFIGURED = True
    # Names outside the configured hierarchies (notably "__main__" when a
    # tool runs via `python -m ...`) would otherwise fall through to the
    # handler-less root logger and every INFO line would vanish — route
    # them under "vvtpu" instead.
    if not (name == "vvtpu" or name.startswith("vvtpu.")
            or name == "videovector_tpu"
            or name.startswith("videovector_tpu.")):
        name = f"vvtpu.{name}"
    return logging.getLogger(name)
