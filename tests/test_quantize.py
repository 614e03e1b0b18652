"""int8 PTQ serving path (tools/quantize.py + the ctx.quant layer
branches): numeric closeness to f32, retrieval-metric parity bound, and
the quantized StableHLO artifact round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config import parse
from videovector_tpu.graph import Net
from videovector_tpu.tools.quantize import calibrate, quantize_weights


IP_NET = """
layers { name: "d" type: MEMORY_DATA top: "x" }
layers { name: "fc" type: INNER_PRODUCT bottom: "x" top: "h"
  inner_product_param { num_output: 32 weight_filler { type: "gaussian" std: 0.2 } } }
layers { name: "r" type: RELU bottom: "h" top: "h" }
layers { name: "fc2" type: INNER_PRODUCT bottom: "h" top: "emb"
  inner_product_param { num_output: 16 weight_filler { type: "xavier" } } }
layers { name: "n" type: NORMALIZATION bottom: "emb" top: "out" }
"""

CONV_NET = """
layers { name: "d" type: MEMORY_DATA top: "x" }
layers { name: "c1" type: CONVOLUTION bottom: "x" top: "h"
  convolution_param { num_output: 8 kernel_size: 3 stride: 1
    weight_filler { type: "gaussian" std: 0.1 }
    bias_filler { type: "constant" value: 0.1 } } }
layers { name: "r" type: RELU bottom: "h" top: "h" }
layers { name: "c2" type: CONVOLUTION bottom: "h" top: "out"
  convolution_param { num_output: 4 kernel_size: 3 stride: 2 group: 2
    weight_filler { type: "xavier" } } }
"""


def _quantized_pair(net_str, batch, key=0):
    net = Net(parse(net_str), phase="TEST")
    spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batch.items()}
    params, _ = net.init(jax.random.PRNGKey(key), spec)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, f32_blobs = net.apply(params, jb, return_blobs=True)
    scales = calibrate(net, params, [batch])
    net.quant = quantize_weights(params, net, scales)
    assert net.quant, "no layers quantized"
    _, q_blobs = net.apply(params, jb, return_blobs=True)
    return net, f32_blobs, q_blobs


def test_ip_int8_close_to_f32(rng):
    batch = {"x": rng.randn(16, 24).astype(np.float32)}
    net, f32_b, q_b = _quantized_pair(IP_NET, batch)
    assert set(net.quant) == {"fc", "fc2"}
    a = np.asarray(f32_b["out"])
    b = np.asarray(q_b["out"])
    # L2-normalized embeddings: cosine similarity per row ≥ 0.99
    cos = np.sum(a * b, axis=1)
    assert np.all(cos > 0.99), cos.min()
    # and the int8 weights really are int8
    assert net.quant["fc"]["w_q"].dtype == np.int8


def test_conv_int8_close_to_f32(rng):
    batch = {"x": rng.rand(4, 4, 12, 12).astype(np.float32)}
    net, f32_b, q_b = _quantized_pair(CONV_NET, batch)
    assert set(net.quant) == {"c1", "c2"}
    a = np.asarray(f32_b["out"]).reshape(-1)
    b = np.asarray(q_b["out"]).reshape(-1)
    denom = np.linalg.norm(a) + 1e-9
    assert np.linalg.norm(a - b) / denom < 0.03


def test_retrieval_metric_parity_bound(rng):
    """The accuracy contract: mAP/hit@k on int8 features within 0.02 of
    f32 on a class-structured synthetic gallery."""
    from videovector_tpu.metrics.retrieval import retrieval_stats
    n, d, n_cls = 128, 24, 8
    centers = rng.randn(n_cls, d).astype(np.float32) * 2
    cls = rng.randint(0, n_cls, n)
    x = (centers[cls] + 0.6 * rng.randn(n, d)).astype(np.float32)
    batch = {"x": x}
    net, f32_b, q_b = _quantized_pair(IP_NET, batch)
    vids = jnp.asarray(np.arange(n) % 50)
    cj = jnp.asarray(cls)
    s_f = retrieval_stats(jnp.asarray(np.asarray(f32_b["out"])), vids, cj)
    s_q = retrieval_stats(jnp.asarray(np.asarray(q_b["out"])), vids, cj)
    for k in ("mean_ap", "hit_at_1", "hit_at_5"):
        assert abs(float(s_f[k]) - float(s_q[k])) <= 0.02, \
            (k, float(s_f[k]), float(s_q[k]))


def test_quantized_artifact_roundtrip(tmp_path, rng):
    """export_serving(quantize="int8") → artifact loads with jax alone,
    meta records the mode, outputs track the f32 artifact, and the int8
    artifact is materially smaller."""
    import os
    from videovector_tpu.tools.serving import export_serving, load_serving

    net_path = tmp_path / "net.prototxt"
    net_path.write_text("""
input: "x"
input_dim: 8 input_dim: 64 input_dim: 1 input_dim: 1
layers { name: "fc" type: INNER_PRODUCT bottom: "x" top: "h"
  inner_product_param { num_output: 256 weight_filler { type: "gaussian" std: 0.1 } } }
layers { name: "r" type: RELU bottom: "h" top: "h" }
layers { name: "fc2" type: INNER_PRODUCT bottom: "h" top: "out"
  inner_product_param { num_output: 64 weight_filler { type: "xavier" } } }
""")
    art_f32 = str(tmp_path / "f32.vvserve")
    art_q = str(tmp_path / "int8.vvserve")
    calib = [{"x": rng.randn(8, 64, 1, 1).astype(np.float32)}
             for _ in range(3)]
    export_serving(str(net_path), [], ["out"], art_f32)
    export_serving(str(net_path), [], ["out"], art_q, quantize="int8",
                   calib_data=calib)

    call_f, meta_f = load_serving(art_f32)
    call_q, meta_q = load_serving(art_q)
    assert meta_q["quantize"] == "int8"
    assert meta_f["quantize"] == "none"
    x = {"x": rng.randn(8, 64, 1, 1).astype(np.float32)}
    yf = np.asarray(call_f(x)["out"])
    yq = np.asarray(call_q(x)["out"])
    assert np.linalg.norm(yf - yq) / (np.linalg.norm(yf) + 1e-9) < 0.05
    # int8 constants: the quantized artifact is well under half the size
    assert os.path.getsize(art_q) < 0.6 * os.path.getsize(art_f32)


def test_conv_mode_is_weight_only(rng):
    """Per-layer math modes (chip ledger, PERF.md r4): convs carry int8
    storage but dequantize to bf16 operands at call time — the weight_only
    output must equal a bf16 conv over the dequantized weights, NOT the
    full int8 path (which also quantizes activations)."""
    batch = {"x": rng.randn(4, 3, 10, 10).astype(np.float32)}
    net, f32_b, q_b = _quantized_pair(CONV_NET, batch)
    assert all(net.quant[n]["mode"] == "weight_only" for n in net.quant)
    # oracle: bf16 conv with dequantized weights
    from videovector_tpu.ops import conv as conv_ops
    q = net.quant["c1"]
    params, _ = Net(parse(CONV_NET), phase="TEST").init(
        jax.random.PRNGKey(0), {"x": jax.ShapeDtypeStruct((4, 3, 10, 10),
                                                          jnp.float32)})
    w_deq = (jnp.asarray(q["w_q"]).astype(jnp.float32)
             * jnp.asarray(q["s_w"])[:, None, None, None])
    # bias rides the f32 accumulator inside conv2d, THEN the output casts
    # to bf16 (same discipline as the compute_dtype path — a post-cast f32
    # bias add would promote the whole downstream chain back to f32)
    y = conv_ops.conv2d(jnp.asarray(batch["x"]).astype(jnp.bfloat16),
                        w_deq.astype(jnp.bfloat16), params["c1"]["b"],
                        stride=(1, 1), pad=(0, 0),
                        preferred_dtype=jnp.float32)
    y = jnp.maximum(y, 0.0)   # blob "h" is post-ReLU (in-place rebinding)
    got = np.asarray(q_b["h"])
    np.testing.assert_allclose(got, np.asarray(y), rtol=0, atol=1e-5)


def test_ip_mode_is_int8(rng):
    batch = {"x": rng.randn(16, 24).astype(np.float32)}
    net, _, _ = _quantized_pair(IP_NET, batch)
    assert all(net.quant[n]["mode"] == "int8" for n in net.quant)


def test_bf16_compute_artifact_roundtrip(tmp_path, rng):
    """export_serving(compute_dtype="bfloat16") — the throughput artifact:
    loads with jax alone, meta records the dtype, features track f32
    within bf16 tolerance."""
    from videovector_tpu.tools.serving import export_serving, load_serving
    net_path = tmp_path / "net.prototxt"
    net_path.write_text("""
input: "x"
input_dim: 8 input_dim: 64 input_dim: 1 input_dim: 1
layers { name: "fc" type: INNER_PRODUCT bottom: "x" top: "out"
  inner_product_param { num_output: 32 weight_filler { type: "xavier" } } }
""")
    a32 = str(tmp_path / "f32.vvserve")
    a16 = str(tmp_path / "bf16.vvserve")
    export_serving(str(net_path), [], ["out"], a32)
    export_serving(str(net_path), [], ["out"], a16,
                   compute_dtype="bfloat16")
    call32, m32 = load_serving(a32)
    call16, m16 = load_serving(a16)
    assert m16["compute_dtype"] == "bfloat16"
    assert m32["compute_dtype"] == "float32"
    x = {"x": rng.randn(8, 64, 1, 1).astype(np.float32)}
    y32 = np.asarray(call32(x)["out"])
    y16 = np.asarray(call16(x)["out"])
    assert np.linalg.norm(y32 - y16) / (np.linalg.norm(y32) + 1e-9) < 0.02


def test_int8_calib_with_input_decls_and_data_layer(tmp_path, rng):
    """Calibration with calib_batches > 1 on a net mixing `input`
    declarations with a real data layer: the rebuild must apply the same
    skip filter as the export path and merge the static input blobs into
    every calibration batch (batches 2+ used to crash with 'batch missing
    graph input')."""
    from videovector_tpu.data.records import RecordWriter
    from videovector_tpu.data.wire import Datum
    from videovector_tpu.tools.serving import export_serving, load_serving

    store = str(tmp_path / "imgs.vvr")
    with RecordWriter(store) as w:
        for i in range(8):
            pix = rng.randint(0, 255, (1, 6, 6)).astype(np.uint8)
            w.append(str(i), Datum(channels=1, height=6, width=6,
                                   data=pix.tobytes(), label=0).encode())
    net_path = tmp_path / "net.prototxt"
    net_path.write_text(f"""
input: "q"
input_dim: 2 input_dim: 36 input_dim: 1 input_dim: 1
layers {{ name: "d" type: DATA top: "img" top: "lbl"
  data_param {{ source: "{store}" batch_size: 2 }} }}
layers {{ name: "sil" type: SILENCE bottom: "lbl" }}
layers {{ name: "fl" type: FLATTEN bottom: "img" top: "imgf" }}
layers {{ name: "fc" type: INNER_PRODUCT bottom: "imgf" top: "h"
  inner_product_param {{ num_output: 16
    weight_filler {{ type: "gaussian" std: 0.1 }} }} }}
layers {{ name: "fcq" type: INNER_PRODUCT bottom: "q" top: "hq"
  inner_product_param {{ num_output: 16
    weight_filler {{ type: "xavier" }} }} }}
layers {{ name: "el" type: ELTWISE bottom: "h" bottom: "hq" top: "out"
  eltwise_param {{ operation: SUM }} }}
""")
    art = str(tmp_path / "mix.vvserve")
    export_serving(str(net_path), [], ["out"], art, quantize="int8",
                   calib_batches=3)
    call, meta = load_serving(art)
    assert meta["quantize"] == "int8"
    out = call({"q": rng.randn(2, 36, 1, 1).astype(np.float32),
                "img": rng.rand(2, 1, 6, 6).astype(np.float32),
                "lbl": np.zeros(2, np.float32)})
    assert np.isfinite(np.asarray(out["out"])).all()
