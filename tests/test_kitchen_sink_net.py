"""Kitchen-sink graph: every remaining glue/neuron layer type wired in one
net, verifying the engine's wrappers (the ops themselves are unit-tested)."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net

NET = """
name: "sink"
layers { name: "d" type: MEMORY_DATA top: "x" }
layers { name: "pow" type: POWER bottom: "x" top: "a"
  power_param { power: 2.0 scale: 0.5 shift: 1.0 } }
layers { name: "abs" type: ABSVAL bottom: "a" top: "b" }
layers { name: "bnll" type: BNLL bottom: "b" top: "c" }
layers { name: "sig" type: SIGMOID bottom: "c" top: "e" }
layers { name: "tanh" type: TANH bottom: "e" top: "f" }
layers { name: "thresh" type: THRESHOLD bottom: "f" top: "g"
  threshold_param { threshold: 0.4 } }
layers { name: "split" type: SPLIT bottom: "f" top: "s1" top: "s2" }
layers { name: "mvn" type: MVN bottom: "x4" top: "m" }
layers { name: "argmax" type: ARGMAX bottom: "f" top: "am" }
layers { name: "silence" type: SILENCE bottom: "g" }
layers { name: "d2" type: MEMORY_DATA top: "x4" }
"""


def test_kitchen_sink(rng):
    net = Net(parse(NET), phase="TRAIN")
    spec = {"x": jax.ShapeDtypeStruct((3, 6), jnp.float32),
            "x4": jax.ShapeDtypeStruct((2, 3, 4, 5), jnp.float32)}
    params, _ = net.init(jax.random.PRNGKey(0), spec)
    x = rng.randn(3, 6).astype(np.float32)
    x4 = rng.randn(2, 3, 4, 5).astype(np.float32)
    _, blobs = net.apply(params, {"x": jnp.asarray(x), "x4": jnp.asarray(x4)},
                         return_blobs=True)

    a = (1.0 + 0.5 * x) ** 2
    np.testing.assert_allclose(np.asarray(blobs["a"]), a, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(blobs["b"]), np.abs(a), rtol=1e-5)
    f = np.tanh(1 / (1 + np.exp(-np.log1p(np.exp(np.abs(a))))))
    np.testing.assert_allclose(np.asarray(blobs["f"]), f, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(blobs["g"]),
                               (f > 0.4).astype(np.float32))
    # split fans out identical arrays
    np.testing.assert_allclose(np.asarray(blobs["s1"]),
                               np.asarray(blobs["s2"]))
    # mvn zero-mean per channel plane
    np.testing.assert_allclose(
        np.asarray(blobs["m"]).mean(axis=(2, 3)), 0.0, atol=1e-5)
    # argmax indices
    np.testing.assert_array_equal(
        np.asarray(blobs["am"]).reshape(-1), f.argmax(1).astype(np.float32))
