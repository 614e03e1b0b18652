"""Host image-decode budget for the extraction pipeline (VERDICT r4
item 4).

The reference decodes JPEGs with OpenCV inside the prefetch thread
(ref:src/caffe/util/io.cpp:69-88, image_data_layer.cpp:33-49). Here
IMAGE_DATA decodes per image through PIL (data/generic.py
ImageDataSource._load) then transform_datum crops/mean-subtracts. The
extraction chip rate is ~62.5k frames/s (PERF.md) — this measures what
ONE host core contributes on the REAL product path, plus a cv2 variant
of the same pipeline and decode-only rates, to decide whether a native
decode path is warranted.

  python scripts/bench_image_decode.py [--seconds 2.0]

Prints one JSON line per measurement + a host-sizing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHIP_FRAMES_PER_SEC = 62500  # measured extraction rate, PERF.md


def _write_jpegs(td: str, w: int, h: int, n: int = 32) -> str:
    """n distinct JPEGs + a file list; low-frequency content compresses
    like real frames (pure noise inflates decode cost unrealistically)."""
    from PIL import Image
    rng = np.random.RandomState(0)
    listing = os.path.join(td, f"list_{w}x{h}.txt")
    with open(listing, "w") as f:
        for i in range(n):
            base = rng.randint(0, 255, size=(h // 8, w // 8, 3),
                               dtype=np.uint8)
            path = os.path.join(td, f"im_{w}x{h}_{i}.jpg")
            Image.fromarray(base).resize((w, h)).save(path, "JPEG",
                                                      quality=90)
            f.write(f"{path} {i}\n")
    return listing


def _rate(fn, per_call: int, seconds: float) -> float:
    fn()  # warm
    n, t0 = 0, time.perf_counter()
    while True:
        fn()
        n += per_call
        dt = time.perf_counter() - t0
        if dt >= seconds:
            return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=2.0)
    args = p.parse_args()

    from videovector_tpu.data.generic import ImageDataConfig, ImageDataSource
    from videovector_tpu.data.transformer import TransformConfig

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for w, h in [(256, 256), (480, 360), (1280, 720)]:
            listing = _write_jpegs(td, w, h)
            tc = TransformConfig(crop_size=227)
            mean = np.full((3, 256, 256), 110.0, np.float32)

            # the PRODUCT path: IMAGE_DATA source exactly as vvtpu builds
            # it — native libjpeg decode (decoder stack native→cv2→PIL,
            # data/generic.py), resize 256, BGR CHW Datum, transform
            from videovector_tpu.data import native as _native
            variants = [("product (native libjpeg)", "1")] \
                if _native.jpeg_available() else []
            variants.append(("product (VVTPU_NATIVE_DECODE=0 → cv2)", "0"))
            for label, toggle in variants:
                os.environ["VVTPU_NATIVE_DECODE"] = toggle
                try:
                    src = ImageDataSource(
                        ImageDataConfig(source=listing, batch_size=16,
                                        new_height=256, new_width=256),
                        transform=tc, mean=mean, train=False)
                    fps = _rate(src.next_batch, 16, args.seconds)
                finally:
                    os.environ.pop("VVTPU_NATIVE_DECODE", None)
                rows.append({"pipeline": label, "src": f"{w}x{h}",
                             "frames_per_sec_core": round(fps, 1)})
                print(json.dumps(rows[-1]), flush=True)

            # cv2 variant of the same pipeline (imdecode+resize beats
            # PIL when linked against libjpeg-turbo)
            paths = [l.split()[0] for l in open(listing)]
            blobs = [open(pp, "rb").read() for pp in paths]
            from videovector_tpu.data.transformer import transform_datum
            from videovector_tpu.data.wire import Datum

            def cv2_pipeline():
                import cv2
                rng2 = np.random.RandomState(0)
                for payload in blobs[:16]:
                    img = cv2.imdecode(np.frombuffer(payload, np.uint8), 1)
                    img = cv2.resize(img, (256, 256))
                    chw = np.ascontiguousarray(img.transpose(2, 0, 1))
                    d = Datum(channels=3, height=256, width=256,
                              data=chw.tobytes())
                    transform_datum(d, tc, mean=mean, train=False, rng=rng2)

            fps = _rate(cv2_pipeline, 16, args.seconds)
            rows.append({"pipeline": "cv2 decode+transform",
                         "src": f"{w}x{h}",
                         "frames_per_sec_core": round(fps, 1)})
            print(json.dumps(rows[-1]), flush=True)

            def cv2_decode_only():
                import cv2
                for payload in blobs[:16]:
                    cv2.imdecode(np.frombuffer(payload, np.uint8), 1)

            fps = _rate(cv2_decode_only, 16, args.seconds)
            rows.append({"pipeline": "cv2 decode only",
                         "src": f"{w}x{h}",
                         "frames_per_sec_core": round(fps, 1)})
            print(json.dumps(rows[-1]), flush=True)

    best = {}
    for r in rows:
        if "product" in r["pipeline"] or "transform" in r["pipeline"]:
            best.setdefault(r["src"], {})
            best[r["src"]][r["pipeline"]] = r["frames_per_sec_core"]
    print(json.dumps({
        "chip_frames_per_sec": CHIP_FRAMES_PER_SEC,
        "host_cores_to_feed_chip": {
            src: {k: round(CHIP_FRAMES_PER_SEC / v, 1)
                  for k, v in d.items()}
            for src, d in best.items()},
    }))


if __name__ == "__main__":
    main()
