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

    rows = open(csv_path).read().strip().split("\n")
    assert len(rows) == 4
    np.testing.assert_allclose(
        [float(v) for v in rows[0].split(",")],
        np.asarray(blobs["y"])[0], atol=1e-5)

    import h5py
    with h5py.File(h5_path) as f:
        np.testing.assert_allclose(np.asarray(f["y"]),
                                   np.asarray(blobs["y"]), atol=1e-6)
