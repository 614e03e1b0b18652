"""Edge-branch coverage: separate negative dataset, FLATTEN_BATCH regroup,
exhaustive PAST context, output_shot_distance in the exhaustive source."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.shots import (
    ExhaustiveShotsConfig, SampledShotsConfig, ShotDataset, ShotVideo,
    VideoSampledShotsSource, VideoShotsSource,
)
from videovector_tpu.graph import Net


def _ds(rng, n=6, shots=8, dim=8, base_vid=1, fill=None):
    videos = []
    for v in range(n):
        feats = (np.full((shots, dim), fill, np.float32) if fill is not None
                 else rng.randn(shots, dim).astype(np.float32))
        videos.append(ShotVideo(base_vid + v,
                                np.arange(shots, dtype=np.int32), feats))
    return ShotDataset(videos)


def test_separate_negative_dataset(rng):
    """negative_dataset fills the reservoir from a DIFFERENT store, walking
    every shot per record (ref video_sampled_shots_data_layer.cpp:321-341)."""
    main_ds = _ds(rng, fill=1.0)                 # all-ones features
    neg_ds = _ds(rng, base_vid=100, fill=7.0)    # recognizable negatives
    cfg = SampledShotsConfig(batch_size=4, num_negative_samples=3,
                             max_buffer_size=20, negative_swap_percentage=0,
                             context_type="WINDOW", context_size=5)
    src = VideoSampledShotsSource(main_ds, cfg, negative_dataset=neg_ds)
    batch = src.next_batch()
    negs = batch["data"][:, 5:]
    np.testing.assert_allclose(negs, 7.0)        # all from the negative store
    np.testing.assert_allclose(batch["data"][:, :5], 1.0)


def test_exhaustive_past_mode(rng):
    videos = [ShotVideo(3, np.arange(6, dtype=np.int32),
                        np.eye(6, 8, dtype=np.float32))]
    cfg = ExhaustiveShotsConfig(batch_size=6, context_type="PAST",
                                context_size=2)
    src = VideoShotsSource(ShotDataset(videos), cfg)
    b = src.next_batch()
    # item i: target = shot i, contexts = shots [i-2, i-1] (border-padded)
    np.testing.assert_allclose(b["data"][3, 0], videos[0].features[3])
    np.testing.assert_allclose(b["data"][3, 1], videos[0].features[1])
    np.testing.assert_allclose(b["data"][3, 2], videos[0].features[2])
    # border: item 0's contexts padded with flag in last feature
    assert b["data"][0, 1, -1] == 1.0 and np.all(b["data"][0, 1, :-1] == 0)


def test_exhaustive_pairwise_shot_distance_labels(rng):
    videos = [ShotVideo(9, np.arange(5, dtype=np.int32),
                        rng.randn(5, 4).astype(np.float32))]
    cfg = ExhaustiveShotsConfig(batch_size=20, context_type="PAIRWISE",
                                output_shot_distance=True, max_shot_distance=3)
    src = VideoShotsSource(ShotDataset(videos), cfg)
    b = src.next_batch()
    assert np.all(b["video_id"] >= 1)
    assert np.all(b["video_id"] <= 3)   # clamped at max_shot_distance


def test_flatten_batch_regroup(rng):
    """FLATTEN_BATCH with batch_size regroups to (batch_size, rest)
    (ref flatten_batch_layer.cpp + FlattenBatchParameter)."""
    net = Net(parse("""
    layers { name: "d" type: MEMORY_DATA top: "x" }
    layers { name: "fb" type: FLATTEN_BATCH bottom: "x" top: "y"
      flatten_batch_param { batch_size: 6 } }
    """), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((3, 4, 2), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.randn(3, 4, 2).astype(np.float32))
    _, blobs = net.apply(params, {"x": x}, return_blobs=True)
    assert blobs["y"].shape == (6, 4)
    np.testing.assert_allclose(np.asarray(blobs["y"]),
                               np.asarray(x).reshape(6, 4))
