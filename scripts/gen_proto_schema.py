"""Generate videovector_tpu/config/proto_schema.py from the reference's
.proto files.

The schema table (message → field name → (number, wire kind, label,
type name)) is INTERFACE DATA — the field numbers the reference's binary
files are encoded with (ref:src/caffe/proto/caffe.proto,
video_shot_sentences.proto, tracking_windows.proto). It powers the
schema-driven binary codec (config/binproto.py) that gives full
NetParameter-with-config round-trips (Net::ToProto parity,
ref:src/caffe/net.cpp:774-801) and binary prototxt reading.

Run (development-time only; the generated file is checked in):
    python scripts/gen_proto_schema.py /root/reference/src/caffe/proto
"""

from __future__ import annotations

import os
import re
import sys

SCALAR_KINDS = {
    "double": "d", "float": "f",
    "int32": "i", "int64": "i", "uint32": "u", "uint64": "u",
    "sint32": "si", "sint64": "si",
    "fixed32": "x32", "fixed64": "x64", "sfixed32": "x32", "sfixed64": "x64",
    "bool": "b", "string": "s", "bytes": "y",
}


def strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return text


def parse_proto(text: str):
    """Returns (messages, enums): messages[name][field] = dict, possibly
    nested message/enum names are flattened as Outer.Inner."""
    text = strip_comments(text)
    messages: dict[str, dict] = {}
    enums: dict[str, dict] = {}
    pos = 0
    stack: list[tuple[str, str]] = []  # (kind, name)

    field_re = re.compile(
        r"(optional|repeated|required)\s+([\w.]+)\s+(\w+)\s*=\s*(\d+)"
        r"\s*(\[[^\]]*\])?\s*;")
    enum_val_re = re.compile(r"(\w+)\s*=\s*(-?\d+)\s*;")
    open_re = re.compile(r"(message|enum)\s+(\w+)\s*\{")

    while pos < len(text):
        m_open = open_re.search(text, pos)
        m_close = text.find("}", pos)
        m_field = None
        if stack and stack[-1][0] == "message":
            m_field = field_re.search(text, pos)
        m_enumv = None
        if stack and stack[-1][0] == "enum":
            m_enumv = enum_val_re.search(text, pos)

        candidates = []
        if m_open:
            candidates.append((m_open.start(), "open", m_open))
        if m_close != -1:
            candidates.append((m_close, "close", None))
        if m_field:
            candidates.append((m_field.start(), "field", m_field))
        if m_enumv:
            candidates.append((m_enumv.start(), "enumv", m_enumv))
        if not candidates:
            break
        start, kind, m = min(candidates, key=lambda c: c[0])

        if kind == "open":
            name = m.group(2)
            scope = ".".join(n for _, n in stack if _ == "message")
            full = f"{scope}.{name}" if scope else name
            stack.append((m.group(1), full))
            if m.group(1) == "message":
                messages[full] = {}
            else:
                enums[full] = {}
            pos = m.end()
        elif kind == "close":
            if stack:
                stack.pop()
            pos = start + 1
        elif kind == "field":
            label, ftype, fname, num, opts = m.groups()
            scope = stack[-1][1]
            packed = bool(opts and "packed" in opts)
            default = None
            if opts:
                dm = re.search(r"default\s*=\s*([^,\]]+)", opts)
                if dm:
                    default = dm.group(1).strip().strip("'\"")
            messages[scope][fname] = {
                "num": int(num), "label": label, "type": ftype,
                "packed": packed, "default": default,
            }
            pos = m.end()
        else:  # enumv
            scope = stack[-1][1]
            enums[scope][m.group(1)] = int(m.group(2))
            pos = m.end()
    return messages, enums


def resolve(messages, enums):
    """Resolve field type names to ('msg', full) / ('enum', full) / scalar."""
    out = {}
    for mname, fields in messages.items():
        scope_parts = mname.split(".")
        rfields = {}
        for fname, f in fields.items():
            t = f["type"]
            kind = None
            if t.startswith("caffe."):  # cross-file package-qualified ref
                t = t[len("caffe."):]
            if t in SCALAR_KINDS:
                kind = ("scalar", SCALAR_KINDS[t])
            else:
                # resolve nested name: innermost scope outward
                for i in range(len(scope_parts), -1, -1):
                    cand = ".".join(scope_parts[:i] + [t])
                    if cand in messages:
                        kind = ("msg", cand)
                        break
                    if cand in enums:
                        kind = ("enum", cand)
                        break
                if kind is None:
                    raise ValueError(f"unresolved type {t} in {mname}.{fname}")
            rfields[fname] = (f["num"], f["label"], kind, f["packed"],
                              f["default"])
        out[mname] = rfields
    return out


# videovector_tpu EXTENSION fields (not in the reference protos).
# Field numbers live in a 3100+ range the reference never uses, so a
# reference binary parsing our .caffemodel/solver files skips them as
# legal proto2 unknown fields; our binproto can round-trip nets/solvers
# that carry the extensions (e.g. snapshot_format: caffe on a net with
# device_negatives). Keep in sync with the extension consumers:
# solver/solvers.py SolverConfig.from_message, graph/data_factory.py,
# graph/net.py (gallery_dtype), solver/driver.py (role_major_data).
EXTENSIONS = {
    "SolverParameter": {
        "grad_microbatch": (3100, "optional", ("scalar", "i"), False, "-1"),
        "snapshot_format": (3101, "optional", ("scalar", "s"), False, "vv"),
        "compute_dtype": (3102, "optional", ("scalar", "s"), False, None),
        "role_major_data": (3103, "optional", ("scalar", "b"), False,
                            "false"),
        "dropout_prng": (3104, "optional", ("scalar", "s"), False,
                         "threefry"),
    },
    "VideoSampledShotsDataParameter": {
        "device_negatives": (3100, "optional", ("scalar", "b"), False,
                             "false"),
    },
    "RetrievalStatsParameter": {
        "gallery_dtype": (3100, "optional", ("scalar", "s"), False,
                          "float32"),
    },
}


def main():
    proto_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/src/caffe/proto"
    all_msgs, all_enums = {}, {}
    for fn in sorted(os.listdir(proto_dir)):
        if not fn.endswith(".proto"):
            continue
        msgs, enums = parse_proto(open(os.path.join(proto_dir, fn)).read())
        all_msgs.update(msgs)
        all_enums.update(enums)
    resolved = resolve(all_msgs, all_enums)
    for mname, fields in EXTENSIONS.items():
        ref_nums = {num for num, *_ in resolved[mname].values()}
        for fname, entry in fields.items():
            assert fname not in resolved[mname], (mname, fname)
            assert entry[0] not in ref_nums, (mname, fname, entry[0])
            resolved[mname][fname] = entry

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "videovector_tpu", "config", "proto_schema.py")
    with open(out_path, "w") as f:
        f.write('"""GENERATED by scripts/gen_proto_schema.py — do not edit.\n'
                "\n"
                "Field-number/type tables for the reference protos\n"
                "(ref:src/caffe/proto/*.proto). Interface data only: each\n"
                "entry is (field_number, label, (kind, detail), packed,\n"
                "default) keyed by message and field name.\n"
                '"""\n\n')
        f.write("MESSAGES = ")
        f.write(repr(resolved).replace("}, '", "},\n '"))
        f.write("\n\nENUMS = ")
        f.write(repr(all_enums).replace("}, '", "},\n '"))
        f.write("\n")
    print(f"wrote {out_path}: {len(resolved)} messages, "
          f"{len(all_enums)} enums")


if __name__ == "__main__":
    main()
