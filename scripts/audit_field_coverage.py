"""Audit proto FIELD COVERAGE: which fields of each config message the
reference implementation reads vs which this codebase reads.

For every field of every message in config/proto_schema.py (generated from
the reference's caffe.proto), check:
  (a) does the reference C++ read it? (grep for accessor calls
      `field(` / `has_field(` / `field_size(` under /root/reference/src+include+tools)
  (b) does this package read it? (grep for the quoted field name under
      videovector_tpu/ — config access is dict-style `.get("field")` /
      `["field"]`)

Fields with (a) and not (b) are candidate parity gaps: config a reference
user can set that we silently ignore. The inverse ((b) not (a)) marks
extensions. Pure-schema fields nobody reads (proto carries them for other
tools) are listed separately.

Run: python scripts/audit_field_coverage.py [--all]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from videovector_tpu.config.proto_schema import MESSAGES

REF = "/root/reference"
PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "videovector_tpu")


# files that mention every field generically (schema tables, codecs) would
# make the "do we read it" check vacuous — excluded
_EXCLUDE = {"proto_schema.py"}


def _slurp(root: str, exts: tuple[str, ...]) -> str:
    chunks = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(exts) and f not in _EXCLUDE:
                try:
                    chunks.append(open(os.path.join(dirpath, f),
                                       errors="replace").read())
                except OSError:
                    pass
    return "\n".join(chunks)


def main() -> int:
    show_all = "--all" in sys.argv
    ref_src = "\n".join(_slurp(os.path.join(REF, d), (".cpp", ".cu", ".hpp", ".h"))
                        for d in ("src/caffe", "include", "tools"))
    # strip the generated pb.h/pb.cc if present (they mention every field)
    pkg_src = _slurp(PKG, (".py",))
    repo_root = os.path.dirname(PKG)
    pkg_src += _slurp(os.path.join(repo_root, "native"), (".cpp", ".c", ".h"))

    # the custom wire protos (data/wire.py) are dataclasses — their fields
    # are read as ATTRIBUTES, not quoted config keys
    wire_src = open(os.path.join(PKG, "data", "wire.py")).read()
    tests_src = _slurp(os.path.join(os.path.dirname(PKG), "tests"), (".py",))

    # fields the reference reads that are handled here through a mechanism
    # the quoted-name grep cannot see, or deliberately obviated — each with
    # its justification (audited 2026-08-18):
    ACCOUNTED = {
        # rectangular geometry: read via the f-string pair() helper
        # (graph/layers.py _kernel_geometry), engine-tested in
        # tests/test_net.py::test_rectangular_geometry_and_exclusivity_checks
        "ConvolutionParameter.pad_h", "ConvolutionParameter.pad_w",
        "ConvolutionParameter.stride_h", "ConvolutionParameter.stride_w",
        "ConvolutionParameter.kernel_h", "ConvolutionParameter.kernel_w",
        "PoolingParameter.pad_h", "PoolingParameter.pad_w",
        "PoolingParameter.stride_h", "PoolingParameter.stride_w",
        "PoolingParameter.kernel_h", "PoolingParameter.kernel_w",
        # engine selection (CAFFE vs CUDNN): obviated — XLA is the one
        # engine; both reference engines compute the same math
        "ConvolutionParameter.engine", "PoolingParameter.engine",
        "ReLUParameter.engine", "SigmoidParameter.engine",
        "SoftmaxParameter.engine", "TanHParameter.engine",
        # sub-messages that carry ONLY an engine field
        "LayerParameter.sigmoid_param", "LayerParameter.softmax_param",
        "LayerParameter.tanh_param",
        # read via the _SS_LEARNED_NET field-number constant
        # (data/netproto.py save/load_solverstate)
        "SolverState.learned_net",
    }

    gaps, exts, dead = [], [], []
    accounted_hits = []
    for msg, fields in sorted(MESSAGES.items()):
        for fname in sorted(fields):
            if f"{msg}.{fname}" in ACCOUNTED:
                accounted_hits.append(f"{msg}.{fname}")
                continue
            ref_reads = bool(
                re.search(rf"\b(?:has_)?{re.escape(fname)}(?:_size)?\s*\(",
                          ref_src))
            ours_reads = (f'"{fname}"' in pkg_src or f"'{fname}'" in pkg_src
                          or bool(re.search(rf"\bself\.{re.escape(fname)}\b|"
                                            rf"\b{re.escape(fname)}=",
                                            wire_src))
                          and bool(re.search(rf"\.{re.escape(fname)}\b",
                                             pkg_src + tests_src)))
            if ref_reads and not ours_reads:
                gaps.append(f"{msg}.{fname}")
            elif ours_reads and not ref_reads:
                exts.append(f"{msg}.{fname}")
            elif not ref_reads and not ours_reads:
                dead.append(f"{msg}.{fname}")

    print(f"== reference reads, we never mention ({len(gaps)}) ==")
    for g in gaps:
        print("  GAP", g)
    print(f"== accounted (indirect read / obviated, see script) "
          f"({len(accounted_hits)}) ==")
    if show_all:
        print(f"\n== we read, reference does not (extensions/indirect) "
              f"({len(exts)}) ==")
        for e in exts:
            print("  EXT", e)
        print(f"\n== neither reads (schema-only) ({len(dead)}) ==")
        for d in dead:
            print("  ---", d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
