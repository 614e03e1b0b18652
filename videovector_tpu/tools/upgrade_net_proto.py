"""upgrade_net_proto — V0→V1 prototxt migration CLI.

ref:tools/upgrade_net_proto_text.cpp / upgrade_net_proto_binary.cpp. Reads a
legacy V0 net prototxt (nested `layer { ... }` connections, string types,
padding layers) and writes the V1 form this framework consumes.

Usage: python -m videovector_tpu.tools.upgrade_net_proto in.prototxt out.prototxt
"""

from __future__ import annotations

import argparse
import sys

from videovector_tpu.config.textformat import parse_file
from videovector_tpu.config.upgrade import net_needs_upgrade, upgrade_net


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="upgrade_net_proto")
    parser.add_argument("input")
    parser.add_argument("output")
    args = parser.parse_args(argv)
    msg = parse_file(args.input)
    if not net_needs_upgrade(msg):
        print("File already in V1 format; copying through.")
        out = msg
    else:
        out = upgrade_net(msg)
    with open(args.output, "w") as f:
        f.write(out.dumps() + "\n")
    print(f"Wrote upgraded NetParameter to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
