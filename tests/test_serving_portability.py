"""Portability of .vvserve artifacts: a host with NO framework code.

The serving docstring claims any JAX runtime can load an artifact with
zero framework code (VERDICT r4 item 6 asked to prove or soften it).
Proof here: a subprocess that never imports videovector_tpu parses the
container with the stdlib (8-byte magic + u32 meta length + JSON meta +
jax.export payload) and runs the program through plain `jax.export` —
the outputs must match the in-process load_serving call bit-for-bit.

What this does NOT prove (and the docstring no longer claims): a C++
PJRT host compiling the embedded StableHLO itself — no such host exists
in this environment.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# The loader a framework-free host would write: stdlib + jax.export only.
_LOADER = r"""
import json, struct, sys
import numpy as np

assert all("videovector_tpu" not in m for m in sys.modules), \
    "loader must not touch framework code"

path, inp_npz, out_npz = sys.argv[1], sys.argv[2], sys.argv[3]
with open(path, "rb") as f:
    assert f.read(8) == b"VVSERVE1"
    (meta_len,) = struct.unpack("<I", f.read(4))
    meta = json.loads(f.read(meta_len).decode())
    payload = bytearray(f.read())

import jax
# this environment pins jax_platforms to "axon,cpu" regardless of the env
# var (see CLAUDE.md) — a real serving host would not need this line
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport
exp = jexport.deserialize(payload)
batch = {k: v for k, v in np.load(inp_npz).items()}
out = exp.call(batch)
np.savez(out_npz, **{k: np.asarray(v) for k, v in out.items()})
assert all("videovector_tpu" not in m for m in sys.modules), \
    "jax.export pulled in framework code"
"""

_NET = """
name: "deploy"
input: "data"
input_dim: 4 input_dim: 1 input_dim: 16 input_dim: 1
layers { name: "ip" type: INNER_PRODUCT bottom: "data" top: "out"
  inner_product_param { num_output: 8 weight_filler { type: "gaussian"
  std: 0.1 } } }
layers { name: "norm" type: NORMALIZATION bottom: "out" top: "outn" }
"""


def test_frameworkless_subprocess_load(tmp_path):
    from videovector_tpu.tools.serving import export_serving, load_serving

    net = tmp_path / "deploy.prototxt"
    net.write_text(_NET)
    art = tmp_path / "m.vvserve"
    export_serving(str(net), [], ["outn"], str(art))

    rng = np.random.RandomState(0)
    batch = {"data": rng.randn(4, 1, 16, 1).astype(np.float32)}
    inp = tmp_path / "in.npz"
    np.savez(inp, **batch)
    out_npz = tmp_path / "out.npz"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", _LOADER, str(art), str(inp), str(out_npz)],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, f"loader failed:\n{res.stdout}\n{res.stderr}"

    call, meta = load_serving(str(art))
    want = np.asarray(call(batch)["outn"])
    got = np.load(out_npz)["outn"]
    np.testing.assert_array_equal(got, want)


def test_meta_header_is_stdlib_parseable(tmp_path):
    """read_meta's container layout holds without any framework import —
    the JSON header carries everything a host needs to build inputs."""
    from videovector_tpu.tools.serving import export_serving

    net = tmp_path / "deploy.prototxt"
    net.write_text(_NET)
    art = tmp_path / "m.vvserve"
    export_serving(str(net), [], ["outn"], str(art))

    import struct
    with open(art, "rb") as f:
        assert f.read(8) == b"VVSERVE1"
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode())
    assert meta["inputs"]["data"][0] == [4, 1, 16, 1]
    assert "outn" in meta["outputs"]
    assert meta["platforms"]
