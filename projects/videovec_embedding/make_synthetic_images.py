"""Synthetic images + list file + mean BlobProto for the extraction demo
(stand-ins for a real image collection + ImageNet mean binaryproto)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="sample_images")
    ap.add_argument("--count", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from PIL import Image
    from videovector_tpu.data.wire import BlobProto

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    lines = []
    for i in range(args.count):
        img = Image.fromarray(
            rng.randint(0, 255, (300, 260, 3)).astype(np.uint8))
        path = os.path.abspath(os.path.join(args.out_dir, f"img{i}.jpg"))
        img.save(path)
        lines.append(f"{path} 0")
    with open(os.path.join(args.out_dir, "list.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # constant mean at the resized geometry (a real run uses
    # compute_image_mean / write_mean_to_binary_proto output)
    mean = np.full((1, 3, 256, 256), 110.0, np.float32)
    with open(os.path.join(args.out_dir, "mean.blob"), "wb") as f:
        f.write(BlobProto.from_array(mean).encode())
    print(f"wrote {args.count} images + list.txt + mean.blob to "
          f"{args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
