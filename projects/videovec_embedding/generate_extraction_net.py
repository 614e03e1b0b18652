"""Emit the MedNet/CaffeNet feature-extraction prototxt — the net behind the
reference's feature_extraction_pretrained_mednet.sh workflow
(ref:projects/videovec_embedding/videovec_extraction.prototxt, 20 layers:
IMAGE_DATA -> conv1..pool5 -> fc6 -> fc7(top ip1_nonorm) -> relu(top ip2)).

The layer/blob NAMES match the reference so that (a) reference-trained
`.caffemodel` weights load by name (Net::CopyTrainedLayersFrom semantics)
and (b) the conventional extraction blob is called `ip2`. Everything else
is generated from the structural spec below.

Usage:
  python generate_extraction_net.py --source=list.txt --mean_file=mean.blob \
      [--batch=50] > videovec_extraction.prototxt
"""

from __future__ import annotations

import argparse

# (name, out_channels, kernel, stride, pad, group) per conv; pool/LRN
# placement per CaffeNet: pool+LRN after conv1/conv2, pool after conv5.
CONVS = [
    ("conv1", 96, 11, 4, 0, 1),
    ("conv2", 256, 5, 1, 2, 2),
    ("conv3", 384, 3, 1, 1, 1),
    ("conv4", 384, 3, 1, 1, 2),
    ("conv5", 256, 3, 1, 1, 2),
]


def _conv(name, bottom, top, cfg):
    _, out, k, s, pad, grp = cfg
    lines = [
        "layers {",
        f'  name: "{name}"',
        "  type: CONVOLUTION",
        f'  bottom: "{bottom}"',
        f'  top: "{top}"',
        "  convolution_param {",
        f"    num_output: {out}",
        f"    kernel_size: {k}",
    ]
    if s != 1:
        lines.append(f"    stride: {s}")
    if pad:
        lines.append(f"    pad: {pad}")
    if grp != 1:
        lines.append(f"    group: {grp}")
    lines += ["  }", "}"]
    return lines


def _simple(name, ltype, bottom, top, body=()):
    lines = ["layers {", f'  name: "{name}"', f"  type: {ltype}",
             f'  bottom: "{bottom}"', f'  top: "{top}"']
    lines += [f"  {b}" for b in body]
    lines.append("}")
    return lines


def emit(source: str, mean_file: str, *, batch: int = 50,
         crop_size: int = 227, new_dim: int = 256) -> str:
    out = [
        'name: "med_c5_euclid_d4096"',
        "layers {",
        '  name: "data"',
        "  type: IMAGE_DATA",
        '  top: "data"',
        '  top: "label"',
        "  image_data_param {",
        f'    source: "{source}"',
        f"    batch_size: {batch}",
        f"    new_height: {new_dim}",
        f"    new_width: {new_dim}",
        "  }",
        "  transform_param {",
        f"    crop_size: {crop_size}",
        f'    mean_file: "{mean_file}"',
        "    mirror: false",
        "  }",
        "}",
    ]
    bottom = "data"
    for i, cfg in enumerate(CONVS, start=1):
        name = cfg[0]
        out += _conv(name, bottom, name, cfg)
        out += _simple(f"relu{i}", "RELU", name, name)
        bottom = name
        if i in (1, 2):
            out += _simple(f"pool{i}", "POOLING", bottom, f"pool{i}", [
                "pooling_param { pool: MAX kernel_size: 3 stride: 2 }"])
            out += _simple(f"norm{i}", "LRN", f"pool{i}", f"norm{i}", [
                "lrn_param { local_size: 5 alpha: 0.0001 beta: 0.75 }"])
            bottom = f"norm{i}"
    out += _simple("pool5", "POOLING", bottom, "pool5", [
        "pooling_param { pool: MAX kernel_size: 3 stride: 2 }"])
    out += _simple("fc6", "INNER_PRODUCT", "pool5", "fc6", [
        "inner_product_param { num_output: 4096 }"])
    out += _simple("relu6", "RELU", "fc6", "fc6")
    # the embedding head: fc7 emits ip1_nonorm; its ReLU is the extraction
    # blob ip2 (the name extract_features dumps by convention)
    out += _simple("fc7", "INNER_PRODUCT", "fc6", "ip1_nonorm", [
        "inner_product_param { num_output: 4096 }"])
    out += _simple("fc7_relu", "RELU", "ip1_nonorm", "ip2")
    return "\n".join(out) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="image list file")
    ap.add_argument("--mean_file", required=True)
    ap.add_argument("--batch", type=int, default=50)
    args = ap.parse_args(argv)
    print(emit(args.source, args.mean_file, batch=args.batch), end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
