"""Training-curve extraction from glog-format logs.

ref:caffe_utils/plot_training_stats.py:10-60 — parse `Iteration N, loss = X`
and `Test net output #k: name = v` lines from training logs (our
utils/logging.py emits the same shapes) and plot/export curves.
"""

from __future__ import annotations

import argparse
import re
import sys

ITER_LOSS_RE = re.compile(r"Iteration (\d+), loss = ([-\d.eE+]+)")
ITER_LR_RE = re.compile(r"Iteration (\d+), lr = ([-\d.eE+]+)")
TEST_OUT_RE = re.compile(r"Test net output #\d+: (\S+) = ([-\d.eE+]+)")
TEST_ITER_RE = re.compile(r"Iteration (\d+), Testing net")


def parse_log(path: str) -> dict:
    train = []      # (iter, loss)
    lrs = []        # (iter, lr)
    tests: dict[str, list] = {}
    current_test_iter = None
    with open(path) as f:
        for line in f:
            m = ITER_LOSS_RE.search(line)
            if m:
                train.append((int(m.group(1)), float(m.group(2))))
                continue
            m = ITER_LR_RE.search(line)
            if m:
                lrs.append((int(m.group(1)), float(m.group(2))))
                continue
            m = TEST_ITER_RE.search(line)
            if m:
                current_test_iter = int(m.group(1))
                continue
            m = TEST_OUT_RE.search(line)
            if m and current_test_iter is not None:
                tests.setdefault(m.group(1), []).append(
                    (current_test_iter, float(m.group(2))))
    return {"train_loss": train, "lr": lrs, "test": tests}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="plot_training_stats")
    parser.add_argument("log")
    parser.add_argument("--out", default="training_stats.png")
    parser.add_argument("--csv", default=None)
    args = parser.parse_args(argv)
    stats = parse_log(args.log)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("iter,loss\n")
            for it, loss in stats["train_loss"]:
                f.write(f"{it},{loss}\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 5))
    if stats["train_loss"]:
        xs, ys = zip(*stats["train_loss"])
        ax.plot(xs, ys, label="train loss")
    for name, pts in stats["test"].items():
        xs, ys = zip(*pts)
        ax.plot(xs, ys, marker="o", label=f"test {name}")
    ax.set_xlabel("iteration")
    ax.legend()
    fig.savefig(args.out, dpi=100)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
