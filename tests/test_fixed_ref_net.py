"""FIXED_VIDEO_SHOT_TEST_DATA + RETRIEVAL_RANK_STATS_FIXED_REF wired through
the engine — the fixed-gallery retrieval evaluation configuration."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.records import RecordWriter
from videovector_tpu.data.wire import Datum, TestVideoShotWindows
from videovector_tpu.graph import Net
from videovector_tpu.graph.data_factory import make_data_source


def test_fixed_gallery_net(tmp_path, rng):
    # gallery records: 3 windows × (2 positives + 1 negative)
    gal_path = str(tmp_path / "gal.vvr")
    dim = 8
    with RecordWriter(gal_path) as w:
        for i in range(3):
            mk = lambda: Datum(float_data=rng.randn(dim).astype(np.float32))
            tw = TestVideoShotWindows(video_id=i + 1,
                                      positive_shot_words=[mk(), mk()],
                                      negative_shot_words=[mk()])
            w.append(str(i), tw.encode())

    net = Net(parse(f"""
    layers {{ name: "q" type: MEMORY_DATA top: "feats" top: "vids" }}
    layers {{ name: "gallery" type: FIXED_VIDEO_SHOT_TEST_DATA
      top: "ref_feats" top: "ref_vids"
      fixed_video_shot_test_data_param {{ source: "{gal_path}" }} }}
    layers {{ name: "stats" type: RETRIEVAL_RANK_STATS_FIXED_REF
      bottom: "feats" bottom: "vids" bottom: "ref_feats" bottom: "ref_vids"
      top: "median_rank" top: "r1" top: "r5" top: "r10" top: "map" }}
    """), phase="TEST")

    # gallery source feeds constants
    gal_layer = next(l for l in net.layers
                     if l.get("type") == "FIXED_VIDEO_SHOT_TEST_DATA")
    gal = make_data_source(gal_layer, phase="TEST").next_batch()
    assert gal["ref_feats"].shape == (9, dim)
    np.testing.assert_array_equal(
        gal["ref_vids"], [1, 1, -1, 2, 2, -1, 3, 3, -1])

    feats = rng.randn(4, dim).astype(np.float32)
    vids = np.array([1, 2, 3, 1], np.float32)
    batch = {"feats": jnp.asarray(feats), "vids": jnp.asarray(vids),
             "ref_feats": jnp.asarray(gal["ref_feats"]),
             "ref_vids": jnp.asarray(gal["ref_vids"])}
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batch.items()}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    _, outputs = net.apply(params, batch)
    assert 0.0 <= float(outputs["map"]) <= 1.0
    assert float(outputs["median_rank"]) >= 1.0


def test_native_sampler_soak(tmp_path, rng):
    """500 batches through the C++ prefetch thread — stability smoke."""
    import os
    import subprocess
    from videovector_tpu.data import native
    from videovector_tpu.data.shots import ShotDataset, ShotVideo
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(repo, "native", "libvvdata.so")):
        subprocess.run(["make", "-C", os.path.join(repo, "native")], check=True)
    videos = [ShotVideo(v + 1, np.arange(10, dtype=np.int32),
                        rng.randn(10, 16).astype(np.float32))
              for v in range(15)]
    path = str(tmp_path / "s.vvr")
    ShotDataset(videos).to_records(path)
    src = native.NativeSampledShotsSource(
        path, batch_size=32, context_size=5, num_negative_samples=8,
        max_buffer_size=60, negative_swap_percentage=50,
        max_same_video_negs=4)
    for i in range(500):
        b = src.next_batch()
        assert np.isfinite(b["data"]).all()
    src.close()
