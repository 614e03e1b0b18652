"""Host sink layers (WRITE_TO_FILE / HDF5_OUTPUT) through the engine."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net


def test_write_to_file_and_hdf5_sinks(tmp_path, rng):
    csv_path = tmp_path / "acts.csv"
    h5_path = tmp_path / "acts.h5"
    net = Net(parse(f"""
    layers {{ name: "d" type: MEMORY_DATA top: "x" }}
    layers {{ name: "ip" type: INNER_PRODUCT bottom: "x" top: "y"
      inner_product_param {{ num_output: 3 weight_filler {{ type: "xavier" }} }} }}
    layers {{ name: "wtf" type: WRITE_TO_FILE bottom: "y"
      write_to_file_param {{ output_file: "{csv_path}" }} }}
    layers {{ name: "h5" type: HDF5_OUTPUT bottom: "y" bottom: "x"
      hdf5_output_param {{ file_name: "{h5_path}" }} }}
    """), phase="TEST")
    assert len(net.host_sinks) == 2
    spec = {"x": jax.ShapeDtypeStruct((4, 5), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    _, blobs = net.apply(params, {"x": x}, return_blobs=True)
    net.process_host_sinks(blobs, append=False)

    # reference csv layout (write_to_file_layer.cpp:42-53): header, then
    # channel-major "c,b,features" rows — a (N, F) blob is the caffe
    # (N, F, 1, 1), so feat_size = 1 and there are F*N rows
    rows = open(csv_path).read().strip().split("\n")
    y = np.asarray(blobs["y"])
    assert rows[0] == "#batch_id,channel_id,features(1..1)"
    assert len(rows) == 1 + y.shape[0] * y.shape[1]
    c0, b0, v0 = rows[1].split(",")
    assert (int(c0), int(b0)) == (0, 0)
    np.testing.assert_allclose(float(v0), y[0, 0], atol=1e-5)
    cl, bl, vl = rows[-1].split(",")
    assert (int(cl), int(bl)) == (y.shape[1] - 1, y.shape[0] - 1)
    np.testing.assert_allclose(float(vl), y[-1, -1], atol=1e-5)

    # reference dataset names are fixed "data"/"label" from bottoms 0/1
    # (ref:src/caffe/layers/hdf5_output_layer.cpp:31-60) so HDF5_DATA can
    # read the file back
    import h5py
    with h5py.File(h5_path) as f:
        np.testing.assert_allclose(np.asarray(f["data"]),
                                   np.asarray(blobs["y"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f["label"]),
                                   np.asarray(blobs["x"]), atol=1e-6)

    # reference count contracts enforced at Net build: WriteToFile takes
    # exactly 1 bottom, HDF5Output exactly 2
    import pytest
    with pytest.raises(ValueError, match="bottom"):
        Net(parse("""
        layers { name: "d" type: MEMORY_DATA top: "x" top: "x2" }
        layers { name: "w" type: WRITE_TO_FILE bottom: "x" bottom: "x2"
          write_to_file_param { output_file: "t.csv" } }
        """), phase="TEST")
    with pytest.raises(ValueError, match="bottom"):
        Net(parse("""
        layers { name: "d" type: MEMORY_DATA top: "x" }
        layers { name: "h" type: HDF5_OUTPUT bottom: "x"
          hdf5_output_param { file_name: "t.h5" } }
        """), phase="TEST")


def test_retrieval_stats_output_file(tmp_path, rng):
    """RETRIEVAL_STATS with stats_output_file dumps the per-query csv
    (ref retrieval_stats_layer.cpp:148-155,310-340) via host sinks."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net

    out = tmp_path / "stats.csv"
    net = Net(parse(f"""
    input: "feats" input: "vids"
    layers {{ name: "r" type: RETRIEVAL_STATS bottom: "feats" bottom: "vids"
      top: "map" top: "h1" top: "h5"
      retrieval_stats_param {{ stats_output_file: "{out}"
        exclude_same_video_shots: false }} }}
    """), phase="TEST")
    feats = rng.randn(6, 4).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = np.asarray([1, 1, 2, 2, 3, 3], np.float32)
    spec = {"feats": jax.ShapeDtypeStruct((6, 4), jnp.float32),
            "vids": jax.ShapeDtypeStruct((6,), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    assert any(s["type"] == "RETRIEVAL_STATS" for s in net.host_sinks)
    _, blobs = net.apply(params, {"feats": jnp.asarray(feats),
                                  "vids": jnp.asarray(vids)},
                         return_blobs=True)
    net.process_host_sinks(blobs)
    lines = out.read_text().strip().split("\n")
    assert lines[0].startswith("#video_id,class_id,ap,acc@1,acc@5")
    assert len(lines) == 7  # header + 6 queries


def test_retrieval_stats_sink_gallery_sharded(tmp_path, rng):
    """The RETRIEVAL_STATS host sink with shard_gallery=True (the
    `vvtpu test --shard_gallery` path) writes the same csv bytes as a
    direct count-engine report — gallery rows sharded over the mesh's
    data axis."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    from videovector_tpu.metrics.retrieval import retrieval_stats_report
    from videovector_tpu.parallel import make_mesh

    out = tmp_path / "stats.csv"
    net = Net(parse(f"""
    input: "feats" input: "vids"
    layers {{ name: "r" type: RETRIEVAL_STATS bottom: "feats" bottom: "vids"
      top: "map" top: "h1" top: "h5"
      retrieval_stats_param {{ stats_output_file: "{out}"
        exclude_same_video_shots: false }} }}
    """), phase="TEST")
    n = 22   # not divisible by 8 devices → padded gallery shards
    feats = rng.randn(n, 4).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = (np.arange(n) % 5).astype(np.float32)
    spec = {"feats": jax.ShapeDtypeStruct((n, 4), jnp.float32),
            "vids": jax.ShapeDtypeStruct((n,), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    _, blobs = net.apply(params, {"feats": jnp.asarray(feats),
                                  "vids": jnp.asarray(vids)},
                         return_blobs=True)
    net.process_host_sinks(blobs, mesh=make_mesh(data=8),
                           shard_gallery=True)
    ref = tmp_path / "ref.csv"
    retrieval_stats_report(feats, vids.astype(np.int64),
                           vids.astype(np.int64), str(ref),
                           method="count")
    assert out.read_bytes() == ref.read_bytes()


def test_rank_stats_report_csv(tmp_path, rng):
    """RETRIEVAL_RANK_STATS stats_output_file: the reference per-item csv
    (ref retrieval_rank_stats_layer.cpp:188-268) — header names only
    item/rank/rec/ids, rows add 5 unnamed distance columns; rank prints
    as an integer; checked against a numpy oracle."""
    from videovector_tpu.metrics.retrieval import (
        retrieval_rank_stats, retrieval_rank_stats_report,
    )
    b = 8
    ctx = rng.randn(b, 6).astype(np.float32)
    tgt = rng.randn(b, 6).astype(np.float32)
    path = tmp_path / "rank.csv"
    agg = retrieval_rank_stats_report(ctx, tgt, str(path))
    ref = retrieval_rank_stats(jnp.asarray(ctx), jnp.asarray(tgt))
    for k in ref:
        np.testing.assert_allclose(float(agg[k]), float(ref[k]), rtol=1e-6)
    lines = path.read_text().strip().split("\n")
    assert lines[0] == ("#item_id,rank,rec@1,rec@5"
                       ",ret_id_1,ret_id_2,ret_id_3,ret_id_4,ret_id_5")
    assert len(lines) == b + 1
    dist = -2.0 * ctx @ tgt.T
    for i, line in enumerate(lines[1:]):
        cols = line.split(",")
        assert len(cols) == 14  # i,rank,rec1,rec5 + 5 ids + 5 distances
        order = np.argsort(dist[i], kind="stable")
        assert int(cols[0]) == i
        assert int(cols[1]) == int(np.where(order == i)[0][0]) + 1
        assert [int(c) for c in cols[4:9]] == [int(v) for v in order[:5]]
        np.testing.assert_allclose(
            [float(c) for c in cols[9:14]],
            dist[i, order[:5]], rtol=1e-4)


def test_rank_stats_report_small_batch_zero_slots(tmp_path, rng):
    """batch < 5: the reference caps the top-5 copy at num_samples
    (= batch size), so trailing id slots keep their initial 0 — quirk
    preserved."""
    from videovector_tpu.metrics.retrieval import retrieval_rank_stats_report
    ctx = rng.randn(3, 4).astype(np.float32)
    tgt = rng.randn(3, 4).astype(np.float32)
    path = tmp_path / "rank3.csv"
    retrieval_rank_stats_report(ctx, tgt, str(path))
    rows = [l.split(",") for l in path.read_text().strip().split("\n")[1:]]
    for r in rows:
        assert r[7] == "0" and r[8] == "0"  # slots 4-5 never written


def test_fixed_ref_rank_stats_report_and_sink(tmp_path, rng):
    """FIXED_REF report rows carry the extra video_id column, and the
    engine runs both rank-stats sinks from process_host_sinks."""
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    from videovector_tpu.metrics.retrieval import (
        retrieval_rank_stats_fixed_ref, retrieval_rank_stats_fixed_ref_report,
    )
    b, f = 6, 9
    feats = rng.randn(b, 5).astype(np.float32)
    refs = rng.randn(f, 5).astype(np.float32)
    vids = rng.randint(0, 3, size=(b,))
    rvids = rng.randint(0, 3, size=(f,))
    path = tmp_path / "fr.csv"
    agg = retrieval_rank_stats_fixed_ref_report(feats, vids, refs, rvids,
                                                str(path))
    ref = retrieval_rank_stats_fixed_ref(
        jnp.asarray(feats), jnp.asarray(vids), jnp.asarray(refs),
        jnp.asarray(rvids))
    for k in ref:
        np.testing.assert_allclose(float(agg[k]), float(ref[k]), rtol=1e-6)
    rows = [l.split(",") for l in path.read_text().strip().split("\n")[1:]]
    assert len(rows) == b
    for i, r in enumerate(rows):
        assert len(r) == 15  # i,video_id,rank,rec1,rec5 + 5 ids + 5 dists
        assert int(r[0]) == i and int(r[1]) == int(vids[i])

    out = tmp_path / "rank_sink.csv"
    net = Net(parse(f"""
    input: "c" input: "t"
    layers {{ name: "rr" type: RETRIEVAL_RANK_STATS bottom: "c" bottom: "t"
      top: "mr" top: "r1" top: "r5" top: "r10" top: "ap"
      retrieval_rank_stats_param {{ stats_output_file: "{out}" }} }}
    """), phase="TEST")
    assert any(s["type"] == "RETRIEVAL_RANK_STATS" for s in net.host_sinks)
    spec = {"c": jax.ShapeDtypeStruct((b, 5), jnp.float32),
            "t": jax.ShapeDtypeStruct((b, 5), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    _, blobs, sinks = net.apply(
        params, {"c": jnp.asarray(feats), "t": jnp.asarray(feats)},
        return_blobs=True, return_sink_blobs=True)
    net.process_host_sinks(sinks)
    assert out.read_text().startswith("#item_id,rank,rec@1,rec@5")
