"""FULL-SCALE golden parity: the real extraction tower at reference
dimensions (conv1 96x11x11/4, grouped conv2/4/5, LRN over 96/256 channels,
fc6/fc7 4096, 227x227 input — ref:projects/videovec_embedding/
videovec_extraction.prototxt:3-205) vs torch-CPU-computed fixtures
(tests/golden_fullscale.npz, scripts/gen_golden_fullscale.py — NO
videovector_tpu compute involved in the fixture).

This is where f32 numerics can actually diverge: LRN accumulation order,
group splits, and 4096/9216-wide GEMM reduction order. The bounds asserted
here are the CERTIFIED tolerances replacing BASELINE.md's aspirational
"bit-comparable fc7" phrase; scripts/check_parity_fullscale.py runs the
same comparison on the real TPU chip.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "golden_fullscale.npz")

sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))

# CERTIFIED f32 bounds (measured CPU-XLA vs torch-CPU 2026-08-17; the TPU
# chip run is checked by scripts/check_parity_fullscale.py). Two metrics per
# blob over the 2048-sample (or full) comparison set:
#   nrm_err  = max|a-g| / rms(g)            (normalized worst absolute)
#   rel_big  = max|a-g|/|g| on |g| >= 1% rms (relative where it's meaningful)
# Measured worst case across all 13 blobs: nrm_err 4.8e-6 (ip2),
# rel_big 2.4e-4 (ip2); conv1/pool1 are BIT-EXACT vs torch. Bounds below
# carry ~4x headroom. This is the certified replacement for the
# "bit-comparable fc7" phrase: fc7/ip2 at reference scale agrees with the
# torch oracle to <=2e-5*rms absolute / <=1e-3 relative on significant
# entries — pure f32 accumulation-order divergence through 5 convs + 2 LRNs
# + 2 wide GEMMs (9216/4096-deep reductions).
BLOBS = ("conv1", "pool1", "norm1", "conv2", "pool2", "norm2",
         "conv3", "conv4", "conv5", "pool5", "fc6", "ip1_nonorm", "ip2")
NRM_BOUND = 2e-5
REL_BOUND = 1e-3

EXTRACTION_NET = """\
name: "med_c5_fullscale"
layers { name: "data" type: MEMORY_DATA top: "data" }
layers { name: "conv1" type: CONVOLUTION bottom: "data" top: "conv1"
  convolution_param { num_output: 96 kernel_size: 11 stride: 4 } }
layers { name: "relu1" type: RELU bottom: "conv1" top: "conv1" }
layers { name: "pool1" type: POOLING bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layers { name: "norm1" type: LRN bottom: "pool1" top: "norm1"
  lrn_param { local_size: 5 alpha: 0.0001 beta: 0.75 } }
layers { name: "conv2" type: CONVOLUTION bottom: "norm1" top: "conv2"
  convolution_param { num_output: 256 pad: 2 kernel_size: 5 group: 2 } }
layers { name: "relu2" type: RELU bottom: "conv2" top: "conv2" }
layers { name: "pool2" type: POOLING bottom: "conv2" top: "pool2"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layers { name: "norm2" type: LRN bottom: "pool2" top: "norm2"
  lrn_param { local_size: 5 alpha: 0.0001 beta: 0.75 } }
layers { name: "conv3" type: CONVOLUTION bottom: "norm2" top: "conv3"
  convolution_param { num_output: 384 pad: 1 kernel_size: 3 } }
layers { name: "relu3" type: RELU bottom: "conv3" top: "conv3" }
layers { name: "conv4" type: CONVOLUTION bottom: "conv3" top: "conv4"
  convolution_param { num_output: 384 pad: 1 kernel_size: 3 group: 2 } }
layers { name: "relu4" type: RELU bottom: "conv4" top: "conv4" }
layers { name: "conv5" type: CONVOLUTION bottom: "conv4" top: "conv5"
  convolution_param { num_output: 256 pad: 1 kernel_size: 3 group: 2 } }
layers { name: "relu5" type: RELU bottom: "conv5" top: "conv5" }
layers { name: "pool5" type: POOLING bottom: "conv5" top: "pool5"
  pooling_param { pool: MAX kernel_size: 3 stride: 2 } }
layers { name: "fc6" type: INNER_PRODUCT bottom: "pool5" top: "fc6"
  inner_product_param { num_output: 4096 } }
layers { name: "relu6" type: RELU bottom: "fc6" top: "fc6" }
layers { name: "fc7" type: INNER_PRODUCT bottom: "fc6" top: "ip1_nonorm"
  inner_product_param { num_output: 4096 } }
layers { name: "fc7_relu" type: RELU bottom: "ip1_nonorm" top: "ip2" }
"""


@pytest.fixture(scope="module")
def fixture():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def torch_weights(fixture):
    """Regenerate the seed-derived weights; checksum-guard against torch
    RNG drift (the fixture stores activations, not weights)."""
    from gen_golden_fullscale import make_weights
    w = {k: v.numpy() for k, v in make_weights().items()}
    for name, arr in w.items():
        got = float(arr.astype(np.float64).sum())
        want = float(fixture[f"wsum:{name}"])
        assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (
            f"torch RNG drift: weight {name} checksum {got} != fixture "
            f"{want}; regenerate fixtures with scripts/gen_golden_fullscale.py")
    return w


def engine_params_from_torch(net, w, x_shape):
    from videovector_tpu.data.weights import LayerBlobs, NetWeights, \
        load_into_params
    from videovector_tpu.data.wire import BlobProto
    params, _ = net.init(jax.random.PRNGKey(0), {
        "data": jax.ShapeDtypeStruct(x_shape, jnp.float32)})
    layers = []
    for lname in ("conv1", "conv2", "conv3", "conv4", "conv5", "fc6", "fc7"):
        wa = w[f"{lname}.w"]
        ba = w[f"{lname}.b"]
        layers.append(LayerBlobs(name=lname, blobs=[
            BlobProto.from_array(wa),
            BlobProto(num=1, channels=1, height=1, width=ba.shape[0],
                      data=ba.astype(np.float32))]))
    return load_into_params(NetWeights(name="fullscale", layers=layers),
                            params)


def compare_blobs(compute_blob, fixture, *,
                  nrm_bound=NRM_BOUND, rel_bound=REL_BOUND):
    """Compare activations against the fixture's sampled (or full) values.
    Returns {blob: (nrm_err, rel_big)}; asserts both bounds per blob."""
    from gen_golden_fullscale import FULL_BLOBS, sample_indices
    results = {}
    failures = []
    for name in BLOBS:
        arr = compute_blob(name)
        if arr is None:
            continue
        arr = np.asarray(arr, np.float32)
        shape = tuple(int(s) for s in fixture[f"shape:{name}"])
        assert arr.size == int(np.prod(shape)), (name, arr.shape, shape)
        flat = arr.reshape(-1)
        if name in FULL_BLOBS:
            golden = fixture[f"full:{name}"].reshape(-1)
            mine = flat
        else:
            golden = fixture[f"samp:{name}"]
            mine = flat[sample_indices(shape)]
        rms = float(np.sqrt(fixture[f"sumsq:{name}"] / np.prod(shape)))
        d = np.abs(mine - golden)
        nrm_err = float(d.max()) / max(rms, 1e-12)
        big = np.abs(golden) >= 0.01 * rms
        rel_big = float((d[big] / np.abs(golden[big])).max()) if big.any() \
            else 0.0
        results[name] = (nrm_err, rel_big)
        if nrm_err > nrm_bound:
            failures.append(f"{name}: nrm_err {nrm_err:.3g} > {nrm_bound:.3g}")
        if rel_big > rel_bound:
            failures.append(f"{name}: rel_big {rel_big:.3g} > {rel_bound:.3g}")
    assert not failures, "\n".join(failures)
    return results


def test_engine_fullscale_parity(fixture, torch_weights):
    """Graph engine (prototxt path) at real dimensions, every layer."""
    from videovector_tpu.config import parse
    from videovector_tpu.graph import Net
    x = fixture["input"]
    net = Net(parse(EXTRACTION_NET), phase="TEST")
    params = engine_params_from_torch(net, torch_weights, x.shape)
    blobs = jax.jit(
        lambda p, b: net.apply(p, b, return_blobs=True)[1]
    )(params, {"data": jnp.asarray(x)})
    stats = compare_blobs(lambda n: blobs.get(n), fixture)
    assert set(stats) == set(BLOBS)


def test_mednet_fullscale_parity(fixture, torch_weights):
    """The native NHWC fast path (models/mednet.py) against the same
    fixture — the extraction tower users actually run on TPU. Conv blobs are
    NHWC inside the model, so only the FC blobs (layout-free) compare; the
    conv stack's correctness is implied by fc6 agreeing (it consumes the
    whole pool5 volume)."""
    from videovector_tpu.config import parse
    from videovector_tpu.graph import Net
    from videovector_tpu.models.mednet import MedNet, MedNetConfig
    x = fixture["input"]
    net = Net(parse(EXTRACTION_NET), phase="TEST")
    params = engine_params_from_torch(net, torch_weights, x.shape)
    model = MedNet(MedNetConfig(compute_dtype="float32"))
    mp = model.params_from_graph_engine(params, fc6_chw=(256, 6, 6))
    nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    # f32 path: parity mode (the bf16 default is the throughput mode)
    fc7 = np.asarray(jax.jit(
        lambda p, v: model.forward(p, v, upto="fc7"))(mp, nhwc))
    golden = fixture["full:ip2"]
    rms = float(np.sqrt(fixture["sumsq:ip2"] / golden.size))
    d = np.abs(fc7 - golden)
    assert float(d.max()) / rms <= NRM_BOUND, float(d.max()) / rms
    big = np.abs(golden) >= 0.01 * rms
    rel_big = float((d[big] / np.abs(golden[big])).max())
    assert rel_big <= REL_BOUND, rel_big
