"""Create a synthetic videovec-embedding dataset (train shots + test windows)
so the project runs end to end without the original MED LMDBs.

Videos are clusters around per-video directions (temporal context is
informative), mimicking the fc7-feature statistics the real pipeline feeds.
"""

from __future__ import annotations

import argparse

import numpy as np

from videovector_tpu.data.records import RecordWriter
from videovector_tpu.data.shots import ShotDataset, ShotVideo
from videovector_tpu.data.wire import Datum, TestVideoShotWindows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_train", default="train_shots.vvr")
    p.add_argument("--out_test", default="test_windows.vvr")
    p.add_argument("--num_videos", type=int, default=200)
    p.add_argument("--shots", type=int, default=12)
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--test_windows", type=int, default=673)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)

    videos = []
    for v in range(args.num_videos):
        center = rng.randn(args.dim).astype(np.float32)
        feats = np.abs(center + 0.4 * rng.randn(args.shots, args.dim)
                       .astype(np.float32))  # fc7 features are post-ReLU ≥ 0
        videos.append(ShotVideo(v + 1, np.arange(args.shots, dtype=np.int32),
                                feats))
    ShotDataset(videos).to_records(args.out_train)
    print(f"wrote {args.out_train}: {args.num_videos} videos")

    with RecordWriter(args.out_test) as w:
        for i in range(args.test_windows):
            video = videos[i % len(videos)]
            ids = rng.choice(video.num_shots, size=4, replace=False)
            tw = TestVideoShotWindows(
                video_id=int(video.video_id),
                context_shot_words=[
                    Datum(float_data=video.features[j]) for j in ids])
            w.append(str(i), tw.encode())
    print(f"wrote {args.out_test}: {args.test_windows} windows")


if __name__ == "__main__":
    main()
