"""Generate FULL-SCALE golden parity fixtures (tests/golden_fullscale.npz).

The toy fixtures (scripts/gen_golden_fixtures.py) certify the numerics on a
mini net; this generator certifies the REAL extraction tower at reference
dimensions — conv1 96x11x11/4, grouped conv2/4/5, LRN over 96/256 channels,
fc6/fc7 4096, 227x227 input (ref:projects/videovec_embedding/
videovec_extraction.prototxt:3-205) — where LRN accumulation order, group
splits and 4096-wide GEMM reduction order can diverge at f32.

INDEPENDENCE: every activation number is computed by TORCH CPU ops only —
no videovector_tpu compute is involved (stand-in for the reference binary's
dump_network output, ref:tools/dump_network.cpp:27-77; the reference CPU
path is the same im2col/GEMM + elementwise math).

Full blobs at this scale are ~240 MB, so the fixture stores per activation:
  shape, float64 sum + sum-of-squares, and 2048 values sampled at indices
  drawn by numpy RandomState(SAMPLE_SEED) over the flat array (the test
  regenerates the same indices from the shape). fc6/ip1_nonorm/ip2 are
  stored in full (2x4096 each). Weights are NOT stored: they regenerate
  from torch.manual_seed(WEIGHT_SEED) at test time; a weight checksum per
  layer guards against torch RNG drift.

Deterministic: regenerate with  python scripts/gen_golden_fullscale.py
"""

from __future__ import annotations

import os

import numpy as np
import torch
import torch.nn.functional as F

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "golden_fullscale.npz")

WEIGHT_SEED = 7
SAMPLE_SEED = 123
N_SAMPLES = 2048
BATCH = 2

# layers stored in full (small enough, headline blobs)
FULL_BLOBS = ("fc6", "ip1_nonorm", "ip2")


def make_weights():
    """Seed-derived weights at Caffe-like init scales (gaussian std 0.01
    convs / 0.005 FCs, bias 0.1 — the BVLC CaffeNet train_val fillers), in
    Caffe blob layout (conv OIHW with in/group, IP (num_output, K))."""
    torch.manual_seed(WEIGHT_SEED)
    def g(*shape, std):
        return torch.randn(*shape) * std
    w = {
        "conv1.w": g(96, 3, 11, 11, std=0.01),  "conv1.b": torch.full((96,), 0.0),
        "conv2.w": g(256, 48, 5, 5, std=0.01),  "conv2.b": torch.full((256,), 0.1),
        "conv3.w": g(384, 256, 3, 3, std=0.01), "conv3.b": torch.full((384,), 0.0),
        "conv4.w": g(384, 192, 3, 3, std=0.01), "conv4.b": torch.full((384,), 0.1),
        "conv5.w": g(256, 192, 3, 3, std=0.01), "conv5.b": torch.full((256,), 0.1),
        "fc6.w": g(4096, 9216, std=0.005),      "fc6.b": torch.full((4096,), 0.1),
        "fc7.w": g(4096, 4096, std=0.005),      "fc7.b": torch.full((4096,), 0.0),
    }
    return w


def make_input():
    """Mean-subtracted-pixel-scale input (the DataTransformer output range):
    uniform in [-120, 135), f32, NCHW (ref transform_param mean_file)."""
    torch.manual_seed(WEIGHT_SEED + 1)
    return (torch.rand(BATCH, 3, 227, 227) * 255.0 - 120.0).float()


def torch_forward(x, w):
    """The reference extraction tower in torch ops with exact Caffe
    semantics: ceil-mode max pool, cross-channel LRN (k=1, alpha/size
    scaling), grouped convs, in-place ReLUs. Blob names match the
    reference prototxt (post-ReLU values under conv names, fc7's linear
    output = ip1_nonorm, post-ReLU = ip2)."""
    acts = {}
    h = F.relu(F.conv2d(x, w["conv1.w"], w["conv1.b"], stride=4))
    acts["conv1"] = h
    h = F.max_pool2d(h, 3, stride=2, ceil_mode=True)
    acts["pool1"] = h
    h = F.local_response_norm(h, size=5, alpha=1e-4, beta=0.75, k=1.0)
    acts["norm1"] = h
    h = F.relu(F.conv2d(h, w["conv2.w"], w["conv2.b"], padding=2, groups=2))
    acts["conv2"] = h
    h = F.max_pool2d(h, 3, stride=2, ceil_mode=True)
    acts["pool2"] = h
    h = F.local_response_norm(h, size=5, alpha=1e-4, beta=0.75, k=1.0)
    acts["norm2"] = h
    h = F.relu(F.conv2d(h, w["conv3.w"], w["conv3.b"], padding=1))
    acts["conv3"] = h
    h = F.relu(F.conv2d(h, w["conv4.w"], w["conv4.b"], padding=1, groups=2))
    acts["conv4"] = h
    h = F.relu(F.conv2d(h, w["conv5.w"], w["conv5.b"], padding=1, groups=2))
    acts["conv5"] = h
    h = F.max_pool2d(h, 3, stride=2, ceil_mode=True)
    acts["pool5"] = h
    flat = h.reshape(h.shape[0], -1)
    h = F.relu(flat @ w["fc6.w"].T + w["fc6.b"])
    acts["fc6"] = h
    lin = h @ w["fc7.w"].T + w["fc7.b"]
    acts["ip1_nonorm"] = lin
    acts["ip2"] = F.relu(lin)
    return acts


def sample_indices(shape) -> np.ndarray:
    size = int(np.prod(shape))
    rs = np.random.RandomState(SAMPLE_SEED)
    return np.sort(rs.choice(size, size=min(N_SAMPLES, size), replace=False))


def main():
    w = make_weights()
    x = make_input()
    with torch.no_grad():
        acts = torch_forward(x, w)

    out = {"input": x.numpy()}
    for name, wt in w.items():
        # guard: fails loudly if a future torch's RNG drifts
        out[f"wsum:{name}"] = np.float64(wt.numpy().astype(np.float64).sum())
    for name, a in acts.items():
        arr = a.numpy()
        out[f"shape:{name}"] = np.asarray(arr.shape)
        out[f"sum:{name}"] = np.float64(arr.astype(np.float64).sum())
        out[f"sumsq:{name}"] = np.float64((arr.astype(np.float64) ** 2).sum())
        if name in FULL_BLOBS:
            out[f"full:{name}"] = arr
        else:
            out[f"samp:{name}"] = arr.reshape(-1)[sample_indices(arr.shape)]
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")
    for name in acts:
        print(f"  {name}: shape {tuple(acts[name].shape)}")


if __name__ == "__main__":
    main()
