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
    layers {{ name: "h5" type: HDF5_OUTPUT bottom: "y"
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

    import h5py
    with h5py.File(h5_path) as f:
        np.testing.assert_allclose(np.asarray(f["y"]),
                                   np.asarray(blobs["y"]), atol=1e-6)


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
