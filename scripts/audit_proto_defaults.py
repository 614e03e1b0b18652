"""Audit inline `.get("field", default)` fallbacks against the reference
proto defaults (config/proto_schema.py, generated from ref caffe.proto).

The schema-free Message.get() takes a Python-side default, so every call
site encodes a proto default by hand — this sweep catches drift. Numeric
comparison only; cross-message field-name collisions (e.g. `batch_size`)
produce known false positives, so eyeball the output rather than gating
CI on it. Round-2 catch: clipping_threshold (proto 1, code had 0),
final_output_size (1 vs input_dim), exclude_same_video_shots (true vs
False), WINDOW_DATA mirror (false vs True), filler std (1 vs 0.1).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from videovector_tpu.config.proto_schema import MESSAGES


def main() -> int:
    defaults: dict[str, list] = {}
    for msg, fields in MESSAGES.items():
        for fname, (_num, _label, typ, _packed, defl) in fields.items():
            defaults.setdefault(fname, []).append((msg, typ, defl))

    pat = re.compile(r'\.get\(\s*"([a-z_0-9]+)"\s*,\s*([^)]+?)\)')
    hits = 0
    pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "videovector_tpu")
    for root, _, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            for i, line in enumerate(open(path), 1):
                for m in pat.finditer(line):
                    field, py_default = m.group(1), m.group(2).strip()
                    for msg, _typ, defl in defaults.get(field, []):
                        if defl is None:
                            continue
                        try:
                            proto_val = (1.0 if defl == "true" else
                                         0.0 if defl == "false" else
                                         float(defl))
                            py_val = (1.0 if py_default == "True" else
                                      0.0 if py_default == "False" else
                                      float(py_default))
                        except ValueError:
                            continue
                        if abs(proto_val - py_val) > 1e-9:
                            hits += 1
                            print(f"{path}:{i}: {field} code={py_default} "
                                  f"proto={defl} ({msg})")
    print(f"{hits} potential mismatches (check each against the message "
          "actually being read — same-name fields across messages alias)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
