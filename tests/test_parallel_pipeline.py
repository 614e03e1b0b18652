"""Multi-device input pipeline + sharded eval: prefetcher places batches with
a NamedSharding, eval runs under the mesh, statistical equivalence between
the native and Python samplers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from videovector_tpu.data.prefetch import DevicePrefetcher
from videovector_tpu.parallel import make_mesh, make_eval_step
from videovector_tpu.parallel.train import shard_params


def test_prefetcher_with_named_sharding(rng):
    mesh = make_mesh(data=4, model=2)
    sharding = {"data": NamedSharding(mesh, P("data", None)),
                "label": NamedSharding(mesh, P("data"))}

    def gen():
        for i in range(4):
            yield {"data": rng.randn(8, 6).astype(np.float32),
                   "label": np.full((8,), i, np.float32)}

    pf = DevicePrefetcher(gen(), depth=2, sharding=sharding)
    batches = list(pf)
    assert len(batches) == 4
    b = batches[0]
    assert b["data"].sharding.spec == P("data", None)
    # each of the 4 data-axis groups holds 2 rows
    assert len(b["data"].addressable_shards) == 8


def test_sharded_eval_step(rng):
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    mesh = make_mesh(data=4, model=2)
    cfg = VideoEmbeddingConfig(feature_dim=32, embed_dim=16, num_negatives=4,
                               dropout_rate=0.0, compute_dtype="float32")
    model = VideoEmbeddingModel(cfg)
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh,
                          model_axis=True)

    def eval_fn(p, batch):
        loss, aux = model.loss(p, batch, train=False)
        return {"loss": loss, "violations": aux["violations"]}

    step = make_eval_step(eval_fn, mesh)
    batch = jax.device_put(
        {"data": jnp.asarray(rng.randn(8, cfg.num_roles, 32)
                             .astype(np.float32))},
        NamedSharding(mesh, P("data", None, None)))
    out = step(params, batch)
    assert np.isfinite(float(out["loss"]))


def test_native_sampler_statistics_match_python(tmp_path, rng):
    """Negative-sampling distributions agree between the C++ and Python
    samplers (statistical twins; same reservoir semantics)."""
    import os
    import subprocess
    from videovector_tpu.data import native
    from videovector_tpu.data.shots import (
        SampledShotsConfig, ShotDataset, ShotVideo, VideoSampledShotsSource,
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(repo, "native", "libvvdata.so")):
        subprocess.run(["make", "-C", os.path.join(repo, "native")], check=True)

    videos = [ShotVideo(v + 1, np.arange(8, dtype=np.int32),
                        np.full((8, 4), v + 1, np.float32))
              for v in range(20)]
    ds = ShotDataset(videos)
    path = str(tmp_path / "s.vvr")
    ds.to_records(path)

    pycfg = SampledShotsConfig(batch_size=16, num_negative_samples=6,
                               max_buffer_size=40,
                               negative_swap_percentage=50,
                               max_same_video_negs=0, context_type="WINDOW",
                               context_size=5, seed=3)
    pysrc = VideoSampledShotsSource(ds, pycfg)
    natsrc = native.NativeSampledShotsSource(
        path, batch_size=16, context_size=5, num_negative_samples=6,
        max_buffer_size=40, negative_swap_percentage=50,
        max_same_video_negs=0, seed=3)

    def neg_video_histogram(src, n_batches=30):
        counts = np.zeros(21)
        for _ in range(n_batches):
            b = src.next_batch()
            negs = b["data"][:, 5:, 0]  # feature value == video id
            for v in negs.reshape(-1):
                counts[int(round(v))] += 1
        return counts / counts.sum()

    h_py = neg_video_histogram(pysrc)
    h_nat = neg_video_histogram(natsrc)
    natsrc.close()
    # negatives cover most videos in both, with similar spread
    assert (h_py[1:] > 0).sum() >= 15
    assert (h_nat[1:] > 0).sum() >= 15
    assert np.abs(h_py - h_nat).sum() < 0.5   # total-variation distance
