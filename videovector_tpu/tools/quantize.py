"""Post-training int8 quantization for the frozen serving path.

TPU-first extension beyond the reference (which serves f32 only,
ref:tools/extract_features.cpp): v5e's MXU runs int8×int8→int32 at 2× the
bf16 peak (394 vs 197 TOPS), so a PTQ artifact can double serving
throughput IF the workload is MXU-bound. The scheme is the standard
symmetric one:

- weights: per-output-channel scales (conv OIHW → per-O; IP (K, N) →
  per-N column), `w_q = round(w / s_w)` clipped to ±127, stored int8 —
  the artifact shrinks 4× too.
- activations: per-tensor scales from a CALIBRATION pass — run the f32
  net on sample batches, record each quantized layer's input absmax
  (`s_x = absmax / 127`), quantize on the fly at serve time.
- GEMM/conv in int8 with int32 accumulation
  (`preferred_element_type=int32`), then dequantize:
  `y = y_i32 * (s_x * s_w) + b` in f32.

Accuracy contract: retrieval metrics (mAP / hit@k) on int8 features must
stay within an explicit tolerance of the f32 artifact — checked by
tests/test_quantize.py and scripts/bench_serving.py --quantize.
"""

from __future__ import annotations

import numpy as np

from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)

QUANT_LAYER_TYPES = ("INNER_PRODUCT", "CONVOLUTION")


def calibrate(net, params, batches, *, layer_names=None) -> dict:
    """Run the f32 net on `batches` (list of batch dicts) and return
    {layer_name: s_x} input scales for every quantizable layer.

    The input of a layer is its bottom[0] blob; absmax accumulates over
    all calibration batches (max calibration — simple and bias-free for
    the post-ReLU activations this workload feeds into conv/fc)."""
    import jax.numpy as jnp

    targets = {}
    for layer in net.layers:
        name = layer.get("name")
        if layer.get("type") not in QUANT_LAYER_TYPES:
            continue
        if layer_names is not None and name not in layer_names:
            continue
        bottoms = [str(b) for b in layer.get_list("bottom")]
        if bottoms:
            targets[name] = bottoms[0]

    absmax = {name: 0.0 for name in targets}
    for batch in batches:
        _, blobs = net.apply(params,
                             {k: jnp.asarray(v) for k, v in batch.items()},
                             return_blobs=True)
        for name, bottom in targets.items():
            if bottom not in blobs:
                raise ValueError(
                    f"calibration: layer {name!r} input blob {bottom!r} "
                    f"not among net blobs")
            absmax[name] = max(absmax[name],
                               float(jnp.max(jnp.abs(blobs[bottom]))))
    scales = {}
    for name, m in absmax.items():
        if m == 0.0:
            log.warning("calibration: layer %s saw all-zero inputs; "
                        "skipping quantization for it", name)
            continue
        scales[name] = m / 127.0
    return scales


def quantize_weights(params: dict, net, input_scales: dict) -> dict:
    """Build the quant side-table {layer_name: {"w_q" int8, "s_w" f32
    per-out-channel, "s_x" f32}} for every calibrated quantizable layer.

    Layers whose weights are all zero, or with the IP `regularization`
    quirk active, are left f32 (skipped)."""
    types = {l.get("name"): l.get("type") for l in net.layers}
    cfgs = {l.get("name"): l for l in net.layers}
    quant = {}
    for name, s_x in input_scales.items():
        ltype = types.get(name)
        lp = params.get(name)
        if lp is None or "w" not in lp:
            continue
        w = np.asarray(lp["w"], np.float32)
        if ltype == "INNER_PRODUCT":
            if float(cfgs[name].get_msg("inner_product_param")
                     .get("regularization", 0.0)) != 0.0:
                continue  # custom-vjp path — serving never needs it, but
                # stay out of its way
            s_w = np.max(np.abs(w), axis=0) / 127.0           # (N,)
        elif ltype == "CONVOLUTION":
            s_w = (np.max(np.abs(w.reshape(w.shape[0], -1)), axis=1)
                   / 127.0)                                   # (O,)
        else:
            continue
        if np.all(s_w == 0.0):
            continue
        s_w = np.where(s_w == 0.0, 1.0, s_w)
        if ltype == "INNER_PRODUCT":
            w_q = np.clip(np.rint(w / s_w[None, :]), -127, 127) \
                .astype(np.int8)
        else:
            w_q = np.clip(np.rint(w / s_w[:, None, None, None]),
                          -127, 127).astype(np.int8)
        # Mode choice is a chip measurement (PERF.md r4 "int8 serving"):
        # XLA:TPU lowers int8 DOTs to the fast MXU path (199 vs 132 TF/s
        # bf16 at 4096³) but int8 CONVs run at or below bf16 speed
        # (grouped conv 37% slower) — so convs keep int8 STORAGE (4×
        # smaller artifact) with weights dequantized to bf16 at call time
        # ("weight_only"), and only the fc layers run true int8 MXU math.
        mode = "int8" if ltype == "INNER_PRODUCT" else "weight_only"
        quant[name] = {"w_q": w_q, "s_w": s_w.astype(np.float32),
                       "s_x": np.float32(s_x), "mode": mode}
    return quant
