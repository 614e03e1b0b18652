"""Generate the golden parity fixtures in tests/golden/.

INDEPENDENCE: every number here is computed by TORCH ops only — no
videovector_tpu compute is involved. The fixtures stand in for the
reference binary's dump_network output (ref:tools/dump_network.cpp:27-77
writes one BlobProto per activation; the reference CPU path is the same
im2col/GEMM + elementwise math torch's CPU kernels implement), since the
reference cannot be built in this environment (no glog/gflags/leveldb).

Outputs (checked in):
  tests/golden/net.prototxt    — the mini CaffeNet-style net (conv stride/pad,
                                 cross-channel LRN, ceil-mode max pool, grouped
                                 conv, FC stack): the hard numerics of the
                                 BASELINE.md fc7 target
  tests/golden/weights.caffemodel — torch weights in Caffe blob layout
  tests/golden/input.blob      — the input BlobProto
  tests/golden/acts/<blob>.blob — per-activation BlobProtos (torch-computed)

Deterministic: torch.manual_seed(0); regenerate with
    python scripts/gen_golden_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np
import torch
import torch.nn.functional as F

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "golden")

NET = """\
name: "golden_mini_caffenet"
layers { name: "data" type: MEMORY_DATA top: "data" }
layers { name: "conv1" type: CONVOLUTION bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 5 stride: 2 pad: 2 } }
layers { name: "relu1" type: RELU bottom: "conv1" top: "relu1" }
layers { name: "norm1" type: LRN bottom: "relu1" top: "norm1"
  lrn_param { local_size: 5 alpha: 0.0001 beta: 0.75 } }
layers { name: "pool1" type: POOLING bottom: "norm1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layers { name: "conv2" type: CONVOLUTION bottom: "pool1" top: "conv2"
  convolution_param { num_output: 12 kernel_size: 3 stride: 1 pad: 1
    group: 2 } }
layers { name: "relu2" type: RELU bottom: "conv2" top: "relu2" }
layers { name: "pool2" type: POOLING bottom: "relu2" top: "pool2"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layers { name: "fc6" type: INNER_PRODUCT bottom: "pool2" top: "fc6"
  inner_product_param { num_output: 32 } }
layers { name: "relu6" type: RELU bottom: "fc6" top: "relu6" }
layers { name: "fc7" type: INNER_PRODUCT bottom: "relu6" top: "fc7"
  inner_product_param { num_output: 16 } }
"""


def torch_forward(x, w):
    """The net above in torch ops (Caffe semantics: ceil-mode pooling,
    cross-channel LRN with alpha/n scaling, grouped conv)."""
    acts = {}
    acts["conv1"] = F.conv2d(x, w["conv1.w"], w["conv1.b"], stride=2,
                             padding=2)
    acts["relu1"] = F.relu(acts["conv1"])
    acts["norm1"] = F.local_response_norm(acts["relu1"], size=5, alpha=1e-4,
                                          beta=0.75, k=1.0)
    acts["pool1"] = F.max_pool2d(acts["norm1"], 3, stride=2, ceil_mode=True)
    acts["conv2"] = F.conv2d(acts["pool1"], w["conv2.w"], w["conv2.b"],
                             stride=1, padding=1, groups=2)
    acts["relu2"] = F.relu(acts["conv2"])
    acts["pool2"] = F.max_pool2d(acts["relu2"], 3, stride=2, ceil_mode=True)
    flat = acts["pool2"].reshape(acts["pool2"].shape[0], -1)
    acts["fc6"] = flat @ w["fc6.w"].T + w["fc6.b"]
    acts["relu6"] = F.relu(acts["fc6"])
    acts["fc7"] = acts["relu6"] @ w["fc7.w"].T + w["fc7.b"]
    return acts


def main():
    torch.manual_seed(0)
    x = torch.rand(2, 3, 42, 42) * 2 - 1

    w = {
        "conv1.w": torch.randn(8, 3, 5, 5) * 0.1,
        "conv1.b": torch.randn(8) * 0.05,
        "conv2.w": torch.randn(12, 4, 3, 3) * 0.1,   # group 2: in = 8/2
        "conv2.b": torch.randn(12) * 0.05,
        "fc6.w": torch.randn(32, 12 * 5 * 5) * 0.05,  # Caffe layout (N, K)
        "fc6.b": torch.randn(32) * 0.05,
        "fc7.w": torch.randn(16, 32) * 0.1,
        "fc7.b": torch.randn(16) * 0.05,
    }
    acts = torch_forward(x, w)

    os.makedirs(os.path.join(OUT, "acts"), exist_ok=True)
    with open(os.path.join(OUT, "net.prototxt"), "w") as f:
        f.write(NET)

    # weights → .caffemodel (Caffe blob layout: conv OIHW == torch;
    # IP (num_output, K) == torch linear)
    from videovector_tpu.data.weights import LayerBlobs, NetWeights
    from videovector_tpu.data.wire import BlobProto
    layers = []
    for lname in ("conv1", "conv2", "fc6", "fc7"):
        wa = w[f"{lname}.w"].numpy()
        ba = w[f"{lname}.b"].numpy()
        blobs = [BlobProto.from_array(wa),
                 BlobProto(num=1, channels=1, height=1, width=ba.shape[0],
                           data=ba.astype(np.float32))]
        layers.append(LayerBlobs(name=lname, blobs=blobs))
    NetWeights(name="golden", layers=layers).save(
        os.path.join(OUT, "weights.caffemodel"))

    with open(os.path.join(OUT, "input.blob"), "wb") as f:
        f.write(BlobProto.from_array(x.numpy()).encode())
    for name, a in acts.items():
        arr = a.numpy()
        if arr.ndim == 2:  # FC blobs: Caffe shape (N, C, 1, 1)
            arr = arr[:, :, None, None]
        with open(os.path.join(OUT, "acts", f"{name}.blob"), "wb") as f:
            f.write(BlobProto.from_array(arr).encode())
    sizes = sum(os.path.getsize(os.path.join(OUT, "acts", p))
                for p in os.listdir(os.path.join(OUT, "acts")))
    print(f"wrote fixtures: {len(acts)} activations ({sizes/1024:.0f} KiB), "
          f"input {x.shape}, fc7 {acts['fc7'].shape}")


if __name__ == "__main__":
    main()
