"""Layer registry: adapts the functional ops in `ops/` to prototxt-configured
graph nodes.

The reference dispatches via a switch factory over the LayerType enum
(ref:src/caffe/layer_factory.cpp:177-309) to C++ classes with SetUp/Forward/
Backward virtuals. Here a layer is a pair of pure functions:

  init(key, cfg, in_shapes) -> params          (dict name -> array; may be {})
  apply(params, inputs, ctx) -> outputs        (list of arrays)

`cfg` is the LayerParameter `Message`; `ctx` carries phase / rng / static
side-tables (e.g. id→class maps). Autodiff replaces every Backward. Data-layer
types are NOT here — the Net treats their tops as graph inputs fed by the data
pipeline (see graph/net.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from videovector_tpu import ops
from videovector_tpu.core import fillers
from videovector_tpu.metrics import retrieval as retrieval_metrics
from videovector_tpu.metrics.classification import classification_stats


@dataclass
class ApplyContext:
    phase: str = "TRAIN"            # TRAIN or TEST
    rng: Any = None                 # PRNGKey for stochastic layers (dropout)
    side: dict = field(default_factory=dict)   # layer_name -> host-loaded tables
    # GEMM/conv operand dtype (f32 accumulation either way). None = f32,
    # the reference's numerics; "bfloat16" is the TPU throughput extension
    # (solver prototxt `compute_dtype` field → Net(compute_dtype=...)) —
    # same cast discipline as models/embedding.py's compute_dtype
    compute_dtype: Any = None
    # int8 PTQ side-table {layer_name: {"w_q", "s_w", "s_x"}} from
    # tools/quantize.py — serving-path extension (v5e int8 MXU = 2× bf16
    # peak); None = no quantization
    quant: Any = None
    # cross-batch recurrent state (ref next_cell_/next_out_ carry,
    # lstm_layer.cpp:171-173,261-264): layer_name -> LstmState in/out.
    # A pure jit graph cannot hold hidden state, so the engine threads it
    # explicitly — stateful layers read state_in and write state_out, and
    # Net.apply(state=..., return_state=True) exposes both ends.
    state_in: Any = None
    state_out: dict = field(default_factory=dict)


@dataclass(frozen=True)
class LayerDef:
    init: Callable   # (key, cfg, in_shapes) -> params
    apply: Callable  # (params, inputs, cfg, ctx) -> list[outputs]
    # default loss weights per top; None => all zeros (not a loss layer)
    default_loss_weights: tuple | None = None


LAYERS: dict[str, LayerDef] = {}

# Types whose tops come from the host data pipeline (the reference's data
# layers, ref:include/caffe/data_layers.hpp) — the Net maps their tops to
# graph inputs.
DATA_LAYER_TYPES = {
    "DATA", "IMAGE_DATA", "WINDOW_DATA", "MEMORY_DATA", "HDF5_DATA",
    "VIDEO_SHOT_WINDOW_DATA", "VIDEO_SHOTS_DATA", "VIDEO_SAMPLED_SHOTS_DATA",
    "VIDEO_SHOT_WINDOW_TEST_DATA", "FIXED_VIDEO_SHOT_TEST_DATA",
    "FLEXIBLE_DATA", "TRACKING_WINDOWS_DATA", "TRACKING_WINDOWS_SOCIAL_DATA",
}


def register(name: str, *, loss_weights=None):
    def deco(builder):
        init_fn, apply_fn = builder()
        LAYERS[name] = LayerDef(init_fn, apply_fn, loss_weights)
        return builder
    return deco


def _no_params(key, cfg, in_shapes):
    return {}


def _shape_of(s):
    return tuple(int(d) for d in s)


def _flat_dim(shape):
    out = 1
    for d in shape[1:]:
        out *= int(d)
    return out


# ---------------------------------------------------------------------------
# Compute layers
# ---------------------------------------------------------------------------

@register("INNER_PRODUCT")
def _inner_product():
    def init(key, cfg, in_shapes):
        p = cfg.get_msg("inner_product_param")
        n = int(p.get("num_output"))
        k = _flat_dim(in_shapes[0])
        kw, kb = jax.random.split(key)
        wfill = fillers.get_filler(p.get_msg("weight_filler") if p.has("weight_filler") else None)
        # Caffe blob layout is (num_output, K); ours is (K, num_output) for
        # x @ W — fill in Caffe layout then transpose so RNG streams that
        # fill per-output-row stay comparable.
        w = wfill(kw, (n, k), jnp.float32).T
        params = {"w": w}
        if p.get("bias_term", True):
            bfill = fillers.get_filler(p.get_msg("bias_filler") if p.has("bias_filler") else None)
            params["b"] = bfill(kb, (n,), jnp.float32)
        return params

    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("inner_product_param")
        reg = float(p.get("regularization", 0.0))
        x, w = inputs[0], params["w"]
        q = (ctx.quant or {}).get(cfg.get("name"))
        if q is not None and reg == 0.0:
            # int8 PTQ serving path (tools/quantize.py): symmetric
            # per-tensor activation / per-column weight scales, int32
            # accumulation on the MXU, f32 dequantize + bias
            if x.ndim > 2:
                x = x.reshape(x.shape[0], -1)
            x_q = jnp.clip(jnp.round(x / q["s_x"]), -127, 127) \
                .astype(jnp.int8)
            y = jnp.dot(x_q, jnp.asarray(q["w_q"]),
                        preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (q["s_x"] * jnp.asarray(q["s_w"]))
            b = params.get("b")
            return [y + b if b is not None else y]
        cd = ctx.compute_dtype
        if cd is not None and reg == 0.0:
            # bf16 GEMM operands, f32 accumulation (preferred_element_type)
            x, w = x.astype(cd), w.astype(cd)
        return [ops.inner_product(x, w, params.get("b"),
                                  regularization=reg)]

    return init, apply


@register("ID_TO_WEIGHT_MAPPING")
def _id_to_weight():
    def init(key, cfg, in_shapes):
        p = cfg.get_msg("id_to_weight_mapping_param")
        # table rows = max_ids (K_), cols = num_output (N_)
        # (ref:src/caffe/layers/id_to_weight_mapping_layer.cpp:16-29)
        num_ids = int(p.get("max_ids"))
        dim = int(p.get("num_output"))
        wfill = fillers.get_filler(p.get_msg("weight_filler") if p.has("weight_filler") else None)
        return {"table": wfill(key, (num_ids, dim), jnp.float32)}

    def apply(params, inputs, cfg, ctx):
        return [ops.id_to_weight_lookup(inputs[0], params["table"])]

    return init, apply


# ---------------------------------------------------------------------------
# Vision layers (conv stack)
# ---------------------------------------------------------------------------

def _kernel_geometry(p):
    """kernel_size/kernel_h/kernel_w (+ stride/pad twins) per Caffe
    ConvolutionParameter/PoolingParameter conventions."""
    def pair(base, default):
        square_key = base if base != "kernel" else "kernel_size"
        if p.has(f"{base}_h") or p.has(f"{base}_w"):
            if not (p.has(f"{base}_h") and p.has(f"{base}_w")):
                # ref conv_layer.cpp:14-29: "X is X OR X_h and X_w are
                # required" — the missing one would silently take the
                # square default (0-width kernel / wrong stride)
                raise ValueError(f"non-square geometry needs BOTH {base}_h "
                                 f"and {base}_w (the reference CHECKs, "
                                 f"conv_layer.cpp:14-29)")
            if p.has(square_key):
                # ref CHECKs the square and rectangular forms exclusive
                raise ValueError(f"{square_key} cannot be combined with "
                                 f"{base}_h/{base}_w (ref conv_layer.cpp:"
                                 f"14-29 CHECKs them exclusive)")
            return (int(p.get(f"{base}_h", default)),
                    int(p.get(f"{base}_w", default)))
        v = int(p.get(square_key, default))
        return (v, v)
    kernel = pair("kernel", 0)
    if kernel[0] <= 0 or kernel[1] <= 0:
        raise ValueError(f"kernel size {kernel} must be positive "
                         f"(ref CHECK_GT(kernel_h_/kernel_w_, 0))")
    stride = pair("stride", 1)
    pad = pair("pad", 0)
    return kernel, stride, pad


@register("CONVOLUTION")
def _convolution():
    from videovector_tpu.ops import conv as conv_ops

    def init(key, cfg, in_shapes):
        p = cfg.get_msg("convolution_param")
        num_output = int(p.get("num_output"))
        groups = int(p.get("group", 1))
        (kh, kw), _, _ = _kernel_geometry(p)
        c_in = int(in_shapes[0][1])
        kw_, kb = jax.random.split(key)
        wfill = fillers.get_filler(p.get_msg("weight_filler") if p.has("weight_filler") else None)
        params = {"w": wfill(kw_, (num_output, c_in // groups, kh, kw), jnp.float32)}
        if p.get("bias_term", True):
            bfill = fillers.get_filler(p.get_msg("bias_filler") if p.has("bias_filler") else None)
            params["b"] = bfill(kb, (num_output,), jnp.float32)
        return params

    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("convolution_param")
        _, stride, pad = _kernel_geometry(p)
        x, w = inputs[0], params["w"]
        q = (ctx.quant or {}).get(cfg.get("name"))
        if q is not None and q.get("mode", "int8") == "weight_only":
            # int8 STORAGE, bf16 MATH: XLA:TPU int8 convs measured at or
            # below bf16 speed (PERF.md r4), so the artifact keeps the 4×
            # weight shrink and dequantizes to bf16 at call time (the
            # convert+scale constant-folds to a bf16 weight at compile)
            w_deq = (jnp.asarray(q["w_q"]).astype(jnp.float32)
                     * jnp.asarray(q["s_w"])[:, None, None, None])
            # bias goes through conv2d so it adds into the f32 accumulator
            # BEFORE the cast back to bf16 — adding it afterwards promotes
            # the output (and the whole downstream pool/LRN chain) to f32,
            # which cost the int8 artifact 27% at batch 512 (PERF.md r4)
            y = conv_ops.conv2d(x.astype(jnp.bfloat16),
                                w_deq.astype(jnp.bfloat16), params.get("b"),
                                stride=stride, pad=pad,
                                groups=int(p.get("group", 1)),
                                preferred_dtype=jnp.float32)
            return [y]
        if q is not None:
            # int8 PTQ: quantize the input per-tensor, convolve int8×int8
            # with int32 accumulation, dequantize per output channel
            x_q = jnp.clip(jnp.round(x / q["s_x"]), -127, 127) \
                .astype(jnp.int8)
            y = conv_ops.conv2d(x_q, jnp.asarray(q["w_q"]), None,
                                stride=stride, pad=pad,
                                groups=int(p.get("group", 1)),
                                preferred_dtype=jnp.int32)
            scale = (q["s_x"] * jnp.asarray(q["s_w"]))[None, :, None, None]
            y = y.astype(jnp.float32) * scale
            b = params.get("b")
            return [y + b[None, :, None, None] if b is not None else y]
        if ctx.compute_dtype is not None:
            x, w = x.astype(ctx.compute_dtype), w.astype(ctx.compute_dtype)
        return [conv_ops.conv2d(x, w, params.get("b"),
                                stride=stride, pad=pad,
                                groups=int(p.get("group", 1)))]

    return init, apply


@register("POOLING")
def _pooling():
    from videovector_tpu.ops import pooling as pool_ops

    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("pooling_param")
        kernel, stride, pad = _kernel_geometry(p)
        method = p.get("pool", "MAX")
        if method == "MAX":
            return [pool_ops.max_pool(inputs[0], kernel=kernel, stride=stride,
                                      pad=pad)]
        if method == "AVE":
            return [pool_ops.avg_pool(inputs[0], kernel=kernel, stride=stride,
                                      pad=pad)]
        if method == "STOCHASTIC":
            return [pool_ops.stochastic_pool(
                inputs[0], kernel=kernel, stride=stride, pad=pad,
                rng=ctx.rng, deterministic=ctx.phase != "TRAIN")]
        raise ValueError(f"Unknown pool method {method!r}")

    return _no_params, apply


@register("LRN")
def _lrn():
    from videovector_tpu.ops import lrn as lrn_ops

    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("lrn_param")
        kw = dict(local_size=int(p.get("local_size", 5)),
                  alpha=float(p.get("alpha", 1.0)),
                  beta=float(p.get("beta", 0.75)))
        region = p.get("norm_region", "ACROSS_CHANNELS")
        if region == "WITHIN_CHANNEL":
            return [lrn_ops.lrn_within_channel(inputs[0], **kw)]
        return [lrn_ops.lrn_cross_channel(inputs[0], **kw)]

    return _no_params, apply


@register("IM2COL")
def _im2col():
    from videovector_tpu.ops import conv as conv_ops

    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("convolution_param")
        kernel, stride, pad = _kernel_geometry(p)
        return [conv_ops.im2col(inputs[0], kernel=kernel, stride=stride,
                                pad=pad)]

    return _no_params, apply


# ---------------------------------------------------------------------------
# Neuron layers
# ---------------------------------------------------------------------------

def _simple(fn):
    def apply(params, inputs, cfg, ctx):
        return [fn(inputs[0], cfg, ctx)]
    return _no_params, apply


@register("RELU")
def _relu():
    return _simple(lambda x, cfg, ctx: ops.relu(
        x, float(cfg.get_msg("relu_param").get("negative_slope", 0.0))))


@register("SIGMOID")
def _sigmoid():
    return _simple(lambda x, cfg, ctx: ops.sigmoid(x))


@register("TANH")
def _tanh():
    return _simple(lambda x, cfg, ctx: ops.tanh(x))


@register("BNLL")
def _bnll():
    return _simple(lambda x, cfg, ctx: ops.bnll(x))


@register("ABSVAL")
def _absval():
    return _simple(lambda x, cfg, ctx: ops.absval(x))


@register("POWER")
def _power():
    def f(x, cfg, ctx):
        p = cfg.get_msg("power_param")
        return ops.power(x, power=float(p.get("power", 1.0)),
                         scale=float(p.get("scale", 1.0)),
                         shift=float(p.get("shift", 0.0)))
    return _simple(f)


@register("THRESHOLD")
def _threshold():
    return _simple(lambda x, cfg, ctx: ops.threshold(
        x, float(cfg.get_msg("threshold_param").get("threshold", 0.0))))


@register("DROPOUT")
def _dropout():
    def apply(params, inputs, cfg, ctx):
        rate = float(cfg.get_msg("dropout_param").get("dropout_ratio", 0.5))
        if ctx.phase == "TRAIN" and ctx.rng is None and rate > 0:
            # the reference ALWAYS drops at TRAIN (dropout_layer.cpp) —
            # silently disabling dropout because no rng was threaded would
            # train a different model than the prototxt describes
            raise ValueError(
                f"DROPOUT {cfg.get('name')!r}: TRAIN-phase forward needs "
                f"rng= (pass a PRNGKey to Net.apply/loss_fn)")
        deterministic = ctx.phase != "TRAIN" or ctx.rng is None
        rng = ctx.rng if ctx.rng is not None else jax.random.PRNGKey(0)
        # fold in a stable hash of the layer name so stacked dropouts
        # decorrelate (zlib.crc32: Python's hash() is per-process salted)
        import zlib
        rng = jax.random.fold_in(
            rng, zlib.crc32(str(cfg.get("name", "dropout")).encode()) & 0x7FFFFFFF)
        return [ops.dropout(inputs[0], rate=rate, rng=rng,
                            deterministic=deterministic)]
    return _no_params, apply


@register("SOFTMAX")
def _softmax():
    def apply(params, inputs, cfg, ctx):
        # Caffe softmax normalizes over channels per spatial position
        # (ref:src/caffe/layers/softmax_layer.cpp:24-60): axis 1.
        x = inputs[0]
        return [jax.nn.softmax(x, axis=1 if x.ndim > 1 else 0)]
    return _no_params, apply


# ---------------------------------------------------------------------------
# Shape / glue layers
# ---------------------------------------------------------------------------

@register("CONCAT")
def _concat():
    def apply(params, inputs, cfg, ctx):
        dim = int(cfg.get_msg("concat_param").get("concat_dim", 1))
        return [jnp.concatenate(inputs, axis=dim)]
    return _no_params, apply


@register("SLICE")
def _slice():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("slice_param")
        dim = int(p.get("slice_dim", 1))
        points = [int(v) for v in p.get_list("slice_point")]
        x = inputs[0]
        n_out = len(cfg.get_list("top"))
        if points:
            # ref slice_layer.cpp:32-44: CHECK_EQ(#points, #tops - 1) and
            # each point strictly increasing within (0, size) — a short
            # list would silently DROP trailing channels, a non-increasing
            # one would emit empty slices
            if len(points) != n_out - 1:
                raise ValueError(
                    f"SLICE {cfg.get('name')!r}: {len(points)} slice_point "
                    f"for {n_out} tops (the reference CHECK_EQs "
                    f"#slice_point == #tops - 1)")
            prev = 0
            for pt in points:
                if not prev < pt < x.shape[dim]:
                    raise ValueError(
                        f"SLICE {cfg.get('name')!r}: slice_point {pt} not "
                        f"strictly increasing within (0, {x.shape[dim]})")
                prev = pt
            bounds = [0] + points + [x.shape[dim]]
        else:
            if x.shape[dim] % n_out != 0:
                # ref slice_layer.cpp:60-66 CHECK_EQ-fails here; a silent
                # remainder would cause shape drift downstream.
                raise ValueError(
                    f"SLICE {cfg.get('name')!r}: dim {dim} size "
                    f"{x.shape[dim]} not divisible by {n_out} tops and no "
                    "slice_point given")
            step = x.shape[dim] // n_out
            bounds = [i * step for i in range(n_out)] + [x.shape[dim]]
        outs = []
        for i in range(n_out):
            idx = [slice(None)] * x.ndim
            idx[dim] = slice(bounds[i], bounds[i + 1])
            outs.append(x[tuple(idx)])
        return outs
    return _no_params, apply


@register("SPLIT")
def _split():
    def apply(params, inputs, cfg, ctx):
        n_out = len(cfg.get_list("top"))
        return [inputs[0]] * n_out
    return _no_params, apply


@register("FLATTEN")
def _flatten():
    def apply(params, inputs, cfg, ctx):
        x = inputs[0]
        return [x.reshape(x.shape[0], -1)]
    return _no_params, apply


@register("FLATTEN_BATCH")
def _flatten_batch():
    def apply(params, inputs, cfg, ctx):
        # ref:src/caffe/layers/flatten_batch_layer.cpp:10-28 — move channel
        # axis into batch: (N, C, H, W) -> (N·C, H·W, 1, 1); with a
        # batch_size param, regroup to (batch_size, (N·C·H·W)/batch_size).
        x = inputs[0]
        p = cfg.get_msg("flatten_batch_param")
        bs = p.get("batch_size")
        if bs:
            return [x.reshape(int(bs), -1)]
        n, c = x.shape[0], x.shape[1]
        return [x.reshape(n * c, -1)]
    return _no_params, apply


@register("ELTWISE")
def _eltwise():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("eltwise_param")
        op = p.get("operation", "SUM")
        if op == "PROD":
            return [ops.eltwise_prod(
                *inputs,
                stable_grad=bool(p.get("stable_prod_grad", True)))]
        if op == "MAX":
            return [ops.eltwise_max(*inputs)]
        coeffs = [float(c) for c in p.get_list("coeff")] or None
        return [ops.eltwise_sum(*inputs, coeffs=coeffs)]
    return _no_params, apply


@register("SILENCE")
def _silence():
    def apply(params, inputs, cfg, ctx):
        return []
    return _no_params, apply


@register("ARGMAX")
def _argmax():
    def apply(params, inputs, cfg, ctx):
        # ref:src/caffe/layers/argmax_layer.cpp:12-58 — top (N, 1, top_k, 1)
        # of indices, or (N, 2, top_k, 1) with values on channel 1 when
        # out_max_val; CHECK 1 <= top_k <= dim. The reference's
        # partial_sort uses std::greater over (value, index) PAIRS, so
        # equal values rank the LARGER index first — reproduced by
        # running the stable descending sort on the flipped axis.
        p = cfg.get_msg("argmax_param")
        x = inputs[0]
        n = x.shape[0]
        flat = x.reshape(n, -1)
        dim = flat.shape[1]
        k = int(p.get("top_k", 1))
        if not 1 <= k <= dim:
            raise ValueError(
                f"ARGMAX {cfg.get('name')!r}: top_k={k} outside [1, {dim}] "
                f"(ref argmax_layer.cpp:16-18 CHECKs)")
        flipped = flat[:, ::-1]
        order_f = jnp.argsort(-flipped, axis=1, stable=True)[:, :k]
        idx = (dim - 1 - order_f).astype(jnp.int32)
        idx_f = idx.astype(jnp.float32)
        if p.get("out_max_val", False):
            vals = jnp.take_along_axis(flat, idx, axis=1)
            return [jnp.stack([idx_f, vals], axis=1).reshape(n, 2, k, 1)]
        return [idx_f.reshape(n, 1, k, 1)]
    return _no_params, apply


@register("MVN")
def _mvn():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("mvn_param")
        return [ops.mvn(inputs[0],
                        normalize_variance=bool(p.get("normalize_variance", True)),
                        across_channels=bool(p.get("across_channels", False)))]
    return _no_params, apply


@register("NORMALIZATION")
def _normalization():
    return _simple(lambda x, cfg, ctx: ops.l2_normalize_rows(x))


@register("SUM")
def _sum():
    def apply(params, inputs, cfg, ctx):
        num_output = int(cfg.get_msg("sum_param").get("num_output", 1))
        return [ops.sum_reduce(inputs[0], num_output)]
    return _no_params, apply


# Sink layers: no tops inside the jitted graph; the Net records them in
# `host_sinks` and tools/drivers dump their bottoms host-side after the step.
SINK_LAYER_TYPES = {"WRITE_TO_FILE", "HDF5_OUTPUT"}


@register("WRITE_TO_FILE")
def _write_to_file():
    # ref:src/caffe/layers/write_to_file_layer.cpp — csv dump per forward.
    def apply(params, inputs, cfg, ctx):
        return []
    return _no_params, apply


@register("HDF5_OUTPUT")
def _hdf5_output():
    # ref:src/caffe/layers/hdf5_output_layer.cpp — h5 dump per forward.
    def apply(params, inputs, cfg, ctx):
        return []
    return _no_params, apply


# ---------------------------------------------------------------------------
# Loss layers
# ---------------------------------------------------------------------------

@register("MAX_MARGIN_LOSS", loss_weights=(1.0, 0.0))
def _max_margin():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("max_margin_loss_param")
        margin = float(p.get("margin", 1.0))
        norm = p.get("norm", "L1")  # proto default = L1 (caffe.proto:864)
        weights = None
        if len(inputs) == 3:
            third = inputs[2]
            if p.get("use_direct_weight", False):
                weights = third
            else:
                # id→weight csv loaded at net build into ctx.side
                table = ctx.side.get(cfg.get("name"))
                if table is not None:
                    ids_sorted, w_sorted = table
                    q = third.reshape(-1).astype(jnp.int32)
                    pos = jnp.clip(jnp.searchsorted(ids_sorted, q), 0,
                                   ids_sorted.shape[0] - 1)
                    w = jnp.where(ids_sorted[pos] == q, w_sorted[pos], 0.0)
                    weights = w.reshape(third.shape)
        loss, violations = ops.max_margin_loss(
            inputs[0], inputs[1], margin=margin, norm=norm, weights=weights)
        return [loss, violations]
    return _no_params, apply


@register("EUCLIDEAN_LOSS", loss_weights=(1.0,))
def _euclidean():
    def apply(params, inputs, cfg, ctx):
        l1 = bool(cfg.get_msg("euclidean_loss_param").get("l1", False))
        return [ops.euclidean_loss(inputs[0], inputs[1], l1=l1)]
    return _no_params, apply


@register("HINGE_LOSS", loss_weights=(1.0,))
def _hinge():
    def apply(params, inputs, cfg, ctx):
        norm = cfg.get_msg("hinge_loss_param").get("norm", "L1")
        x = inputs[0]
        return [ops.hinge_loss(x.reshape(x.shape[0], -1), inputs[1], norm=norm)]
    return _no_params, apply


@register("SOFTMAX_LOSS", loss_weights=(1.0,))
def _softmax_loss():
    def apply(params, inputs, cfg, ctx):
        x = inputs[0]
        return [ops.softmax_loss(x.reshape(x.shape[0], -1), inputs[1])]
    return _no_params, apply


@register("MULTINOMIAL_LOGISTIC_LOSS", loss_weights=(1.0,))
def _mll():
    def apply(params, inputs, cfg, ctx):
        x = inputs[0]
        return [ops.multinomial_logistic_loss(x.reshape(x.shape[0], -1), inputs[1])]
    return _no_params, apply


@register("SIGMOID_CROSS_ENTROPY_LOSS", loss_weights=(1.0,))
def _sce():
    def apply(params, inputs, cfg, ctx):
        return [ops.sigmoid_cross_entropy_loss(inputs[0], inputs[1])]
    return _no_params, apply


@register("INFOGAIN_LOSS", loss_weights=(1.0,))
def _infogain():
    def apply(params, inputs, cfg, ctx):
        H = ctx.side.get(cfg.get("name"))
        if H is None:
            raise ValueError("INFOGAIN_LOSS needs its infogain matrix in ctx.side")
        x = inputs[0]
        return [ops.infogain_loss(x.reshape(x.shape[0], -1), inputs[1], H)]
    return _no_params, apply


@register("CONTRASTIVE_LOSS", loss_weights=(1.0,))
def _contrastive():
    def apply(params, inputs, cfg, ctx):
        margin = float(cfg.get_msg("contrastive_loss_param").get("margin", 1.0))
        return [ops.contrastive_loss(inputs[0], inputs[1], inputs[2],
                                     margin=margin)]
    return _no_params, apply


@register("ACCURACY", loss_weights=(0.0,))
def _accuracy():
    def apply(params, inputs, cfg, ctx):
        top_k = int(cfg.get_msg("accuracy_param").get("top_k", 1))
        x = inputs[0]
        return [ops.accuracy(x.reshape(x.shape[0], -1), inputs[1], top_k=top_k)]
    return _no_params, apply


# ---------------------------------------------------------------------------
# Eval-stats layers (jit metrics; multiple scalar tops like the reference)
# ---------------------------------------------------------------------------

@register("RETRIEVAL_STATS", loss_weights=(0.0, 0.0, 0.0))
def _retrieval_stats():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("retrieval_stats_param")
        id_map = ctx.side.get(cfg.get("name"))
        feats = inputs[0].reshape(inputs[0].shape[0], -1)
        vids = inputs[1].reshape(-1).astype(jnp.int32)
        if bool(p.get("video_level_retrieval", False)):
            # average shots per video first, then rank the videos
            # (ref:src/caffe/layers/retrieval_stats_layer.cpp:165-208);
            # max_num_videos must equal the distinct-id count — the traced
            # graph cannot CHECK this, see metrics.retrieval.check_num_videos
            nv = int(p.get("max_num_videos", 0))
            if nv <= 0:  # static at trace time — reject the proto default
                raise ValueError(
                    "video_level_retrieval requires max_num_videos > 0 "
                    "(= the distinct video-id count; the reference CHECKs "
                    "equality, retrieval_stats_layer.cpp:188)")
            feats, vids = retrieval_metrics.video_level_average(
                feats, vids, nv)
        classes = id_map.lookup(vids) if id_map is not None else vids
        out = retrieval_metrics.retrieval_stats(
            feats, vids, classes,
            # proto default is TRUE (ref caffe.proto RetrievalStatsParameter
            # exclude_same_video_shots = 3 [default = true])
            exclude_same_video_shots=bool(p.get("exclude_same_video_shots",
                                                True)))
        return [out["mean_ap"], out["hit_at_1"], out["hit_at_5"]]
    return _no_params, apply


@register("RETRIEVAL_RANK_STATS", loss_weights=(0.0,) * 5)
def _retrieval_rank_stats():
    def apply(params, inputs, cfg, ctx):
        p = cfg.get_msg("retrieval_rank_stats_param")
        ctx_feats = inputs[0].reshape(inputs[0].shape[0], -1)
        tgt_feats = inputs[1].reshape(inputs[1].shape[0], -1)
        out = retrieval_metrics.retrieval_rank_stats(
            ctx_feats, tgt_feats,
            compute_ap=bool(p.get("compute_ap", False)),
            positive_size=int(p.get("positive_size", 0)),
            negative_size=int(p.get("negative_size", 0)))
        return [out["median_rank"], out["recall_at_1"], out["recall_at_5"],
                out["recall_at_10"], out["mean_ap"]]
    return _no_params, apply


@register("RETRIEVAL_RANK_STATS_FIXED_REF", loss_weights=(0.0,) * 5)
def _retrieval_rank_stats_fixed():
    def apply(params, inputs, cfg, ctx):
        feats = inputs[0].reshape(inputs[0].shape[0], -1)
        vids = inputs[1].reshape(-1).astype(jnp.int32)
        ref_feats = inputs[2].reshape(inputs[2].shape[0], -1)
        ref_vids = inputs[3].reshape(-1).astype(jnp.int32)
        out = retrieval_metrics.retrieval_rank_stats_fixed_ref(
            feats, vids, ref_feats, ref_vids)
        return [out["median_rank"], out["recall_at_1"], out["recall_at_5"],
                out["recall_at_10"], out["mean_ap"]]
    return _no_params, apply


@register("CLASSIFICATION_STATS", loss_weights=(0.0, 0.0, 0.0))
def _classification_stats():
    def apply(params, inputs, cfg, ctx):
        num_classes = int(cfg.get_msg("classification_stats_param")
                          .get("num_classes", inputs[0].shape[1]))
        x = inputs[0].reshape(inputs[0].shape[0], -1)
        out = classification_stats(x, inputs[1], num_classes=num_classes)
        return [out["per_class_accuracy"], out["per_class_ap"], out["accuracy"]]
    return _no_params, apply


@register("SOCIAL_POOLING")
def _social_pooling():
    from videovector_tpu.ops.social import social_pooling

    def init(key, cfg, in_shapes):
        f = int(cfg.get_msg("social_pooling_param").get("pool_feat_size", 32))
        k1, k2 = jax.random.split(key)
        # reference fills w/b with the inner_product fillers if given
        ip = cfg.get_msg("inner_product_param")
        wfill = fillers.get_filler(ip.get_msg("weight_filler")
                                   if ip.has("weight_filler") else
                                   {"type": "gaussian", "std": 0.1})
        bfill = fillers.get_filler(ip.get_msg("bias_filler")
                                   if ip.has("bias_filler") else None)
        return {"w": wfill(k1, (2, f), jnp.float32),
                "b": bfill(k2, (f,), jnp.float32)}

    def apply(params, inputs, cfg, ctx):
        # bottoms: features (1, B, D[, 1]), relations (1, B, B)[, mean (1, B, 2)]
        x = inputs[0]
        feats = x if x.ndim == 2 else x.reshape(x.shape[1], -1)
        b = feats.shape[0]
        rel = inputs[1].reshape(b, b)
        mean_pos = inputs[2].reshape(b, 2) if len(inputs) > 2 else None
        out = social_pooling(feats, rel, params["w"], params["b"], mean_pos)
        return [out.reshape(1, b, -1, 1)]

    return init, apply


# ---------------------------------------------------------------------------
# LSTM family
# ---------------------------------------------------------------------------
# The reference layers carry (cell, hidden) state across forward calls
# (next_cell_/next_out_, ref lstm_layer.cpp:171-173,261-264). The engine
# mirrors this as explicit carry: LSTM/LSTM_LINEAR read ctx.state_in[name]
# (zero state when absent — same as the reference's initial zero buffers)
# and write their final LstmState into ctx.state_out[name]. The train loop
# threads the dict across batches; cont bits still gate whether carried
# state is used at sequence starts.

STATEFUL_LAYER_TYPES = {"LSTM", "LSTM_LINEAR"}


def _lstm_init(key, cfg, in_shapes, *, conditional=False):
    from videovector_tpu.ops import recurrent
    ip = cfg.get_msg("inner_product_param")
    lstm_p = cfg.get_msg("lstm_param")
    hidden = int(ip.get("num_output"))
    t, b = int(in_shapes[0][0]), int(in_shapes[0][1])
    input_dim = 1
    for d in in_shapes[0][2:]:
        input_dim *= int(d)
    # FillerParameter std defaults to 1 (ref caffe.proto) when weight_filler
    # is given without std; with no filler at all the reference would
    # zero-init (constant filler) — unusable, so we keep a sane gaussian.
    std = float(ip.get_msg("weight_filler").get("std", 1.0)) \
        if ip.has("weight_filler") else 0.1
    out_dim = int(lstm_p.get("final_output_size", 1))  # ref default = 1
    return recurrent.init_lstm_params(
        key, input_dim, hidden, weight_std=std,
        output_dim=out_dim, conditional=conditional)


def _lstm_args(cfg):
    lstm_p = cfg.get_msg("lstm_param")
    # proto default is 1 (ref caffe.proto LstmParameter clipping_threshold
    # [default = 1]) — the reference clips by default
    return {"clip_threshold": float(lstm_p.get("clipping_threshold", 1.0))}


def _as_tbi(x):
    return x.reshape(x.shape[0], x.shape[1], -1)


def _as_tb(c):
    return c.reshape(c.shape[0], c.shape[1])


@register("LSTM")
def _lstm():
    from videovector_tpu.ops import recurrent

    def init(key, cfg, in_shapes):
        return _lstm_init(key, cfg, in_shapes)

    def apply(params, inputs, cfg, ctx):
        st = (ctx.state_in or {}).get(cfg.get("name"))
        h, fin = recurrent.lstm(params, _as_tbi(inputs[0]),
                                _as_tb(inputs[1]), state=st,
                                **_lstm_args(cfg))
        ctx.state_out[cfg.get("name")] = fin
        return [h]

    return init, apply


@register("LSTM_LINEAR")
def _lstm_linear():
    from videovector_tpu.ops import recurrent

    def init(key, cfg, in_shapes):
        return _lstm_init(key, cfg, in_shapes)

    def apply(params, inputs, cfg, ctx):
        st = (ctx.state_in or {}).get(cfg.get("name"))
        h, fin = recurrent.lstm(params, _as_tbi(inputs[0]),
                                _as_tb(inputs[1]), state=st, linear=True,
                                **_lstm_args(cfg))
        ctx.state_out[cfg.get("name")] = fin
        return [h]

    return init, apply


@register("LSTM_ENC_DEC")
def _lstm_enc_dec():
    from videovector_tpu.ops import recurrent

    def init(key, cfg, in_shapes):
        k1, k2 = jax.random.split(key)
        enc = _lstm_init(k1, cfg, [in_shapes[0]])
        dec = _lstm_init(k2, cfg, [in_shapes[2]])
        return {**{f"enc_{k}": v for k, v in enc.items()},
                **{f"dec_{k}": v for k, v in dec.items()}}

    def apply(params, inputs, cfg, ctx):
        enc = {k[4:]: v for k, v in params.items() if k.startswith("enc_")}
        dec = {k[4:]: v for k, v in params.items() if k.startswith("dec_")}
        enc_h, dec_h = recurrent.lstm_enc_dec(
            enc, dec, _as_tbi(inputs[0]), _as_tb(inputs[1]),
            _as_tbi(inputs[2]), _as_tb(inputs[3]), **_lstm_args(cfg))
        return [enc_h, dec_h]

    return init, apply


@register("LSTM_CONDITIONAL")
def _lstm_conditional():
    from videovector_tpu.ops import recurrent

    def init(key, cfg, in_shapes):
        return _lstm_init(key, cfg, in_shapes, conditional=True)

    def apply(params, inputs, cfg, ctx):
        # bottoms: data (T,B,I), cont (T,B), first_input (B,O)
        first = inputs[2].reshape(inputs[2].shape[0], -1)
        out, _ = recurrent.lstm_conditional(
            params, _as_tbi(inputs[0]), first, _as_tb(inputs[1]),
            **_lstm_args(cfg))
        return [out]

    return init, apply


@register("LSTM_SINGLE_STEP")
def _lstm_single_step():
    from videovector_tpu.ops import recurrent

    def init(key, cfg, in_shapes):
        # bottom[0] is (B, I)
        shape = (1,) + tuple(in_shapes[0])
        return _lstm_init(key, cfg, [shape])

    def apply(params, inputs, cfg, ctx):
        from videovector_tpu.ops.recurrent import LstmState
        x = inputs[0].reshape(inputs[0].shape[0], -1)
        state = None
        if len(inputs) >= 3:
            c_prev = inputs[1].reshape(inputs[1].shape[0], -1)
            h_prev = inputs[2].reshape(inputs[2].shape[0], -1)
            state = LstmState(c_prev, h_prev)
        h, c = recurrent.lstm_single_step(params, x, state, **_lstm_args(cfg))
        return [h, c]

    return init, apply


# DUMMY_DATA is an active layer (filler-driven), not a pipeline input
# (ref:include/caffe/data_layers.hpp DummyDataLayer). Refill semantics
# (ref:src/caffe/layers/dummy_data_layer.cpp:31-55): constant fillers fill
# once (same values every forward); every other filler type REFILLS with
# fresh randomness each Forward — so the per-call rng (ctx.rng, threaded by
# the train loop) is folded into the key. Without an rng (plain eval calls)
# the fill is deterministic per layer/top.
@register("DUMMY_DATA")
def _dummy_data():
    def apply(params, inputs, cfg, ctx):
        import zlib
        p = cfg.get_msg("dummy_data_param")
        nums = [int(v) for v in p.get_list("num")]
        chans = [int(v) for v in p.get_list("channels")]
        heights = [int(v) for v in p.get_list("height")]
        widths = [int(v) for v in p.get_list("width")]
        n_top = len(cfg.get_list("top"))
        fill_cfgs = p.get_list("data_filler")
        layer_salt = zlib.crc32(str(cfg.get("name")).encode())
        base = (jax.random.fold_in(ctx.rng, layer_salt)
                if ctx.rng is not None else jax.random.PRNGKey(layer_salt))
        outs = []
        for i in range(n_top):
            def dim(lst, i=i):
                return lst[i] if i < len(lst) else lst[0]
            shape = (dim(nums), dim(chans), dim(heights), dim(widths))
            fcfg = fill_cfgs[i] if i < len(fill_cfgs) else (
                fill_cfgs[0] if fill_cfgs else None)
            fill = fillers.get_filler(fcfg)
            ftype = fcfg.get("type", "constant") if fcfg is not None \
                else "constant"
            key = (jax.random.PRNGKey(layer_salt + i)
                   if ftype == "constant"  # fill-once: key is irrelevant
                   else jax.random.fold_in(base, i))
            outs.append(fill(key, shape, jnp.float32))
        return outs
    return _no_params, apply
