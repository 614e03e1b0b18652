"""Serving export: freeze a trained net into a portable StableHLO artifact.

The reference's deployment story is "ship the prototxt + .caffemodel and
run extract_features" (ref:tools/extract_features.cpp:26-211). The
TPU-native equivalent is ahead-of-time export: the TEST-phase forward with
the weights BOUND AS CONSTANTS serializes to one self-contained StableHLO
artifact (jax.export) that any JAX runtime can load and call with zero
framework code, no prototxt, no weight files — the container is 12 header
bytes + JSON meta + a standard jax.export payload, and a stdlib-only
loader is tested in tests/test_serving_portability.py (a subprocess that
never imports videovector_tpu reproduces load_serving bit-for-bit). The
payload's StableHLO module is what a C++ PJRT host would compile; no such
host exists in this environment, so that path is a design property, not a
tested one.

  vvtpu-serve export  net.prototxt w.caffemodel out.vvserve --blobs=ip2
  vvtpu-serve run     out.vvserve            # smoke-run on random inputs

Artifacts lower for multiple platforms at once (--platforms tpu,cpu), so
the same file serves on TPU hosts and CPU fallbacks.
"""

from __future__ import annotations

import argparse
import json
import struct
import sys

import numpy as np

from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)

_MAGIC = b"VVSERVE1"


def export_serving(model_path: str, weight_paths: list[str],
                   blob_names: list[str], out_path: str, *,
                   platforms: list[str] | None = None,
                   symbolic_batch: bool = False,
                   input_shapes: dict | None = None,
                   quantize: str | None = None,
                   calib_batches: int = 4,
                   calib_data: list | None = None,
                   compute_dtype: str | None = None,
                   mesh=None) -> dict:
    """Freeze phase=TEST forward(params, batch) → {blob: activation} with
    params as constants; write a self-contained artifact. Returns the
    input spec {name: (shape, dtype)}.

    symbolic_batch=True exports the leading dimension as a shape symbol so
    ONE artifact serves any batch size (fails loudly at export when a layer
    needs a static batch, e.g. FLATTEN_BATCH with an explicit batch_size).

    quantize="int8" runs a calibration pass (`calib_batches` batches from
    the net's data source) and freezes conv/fc weights as int8 with
    symmetric per-channel scales (tools/quantize.py) — int8×int8→int32 on
    the MXU (v5e: 2× bf16 peak) and a 4× smaller artifact. Accuracy is
    bounded by tests/test_quantize.py (retrieval-metric deltas).

    mesh (a jax Mesh with "data"/"model" axes) exports a MULTI-DEVICE
    artifact: 2-D weight matrices are column-sharded over "model"
    (tensor-parallel — GSPMD inserts the collectives; latency-critical
    serving splits the big GEMMs over ICI) and inputs batch-shard over
    "data". The artifact bakes in the device count; load it with
    `mesh_serving` on a host with that many devices. Requires that many
    devices at export time too."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.graph.data_factory import MergedSource, make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.cli import _load_weights

    net_msg = parse_file(model_path)
    # compute_dtype="bfloat16" freezes the throughput math the live
    # extraction pipeline uses (GEMM/conv operands bf16, f32 accumulation);
    # the default f32 artifact keeps reference numerics. Calibration for
    # --quantize runs on the same net, so scales match the served math.
    net = Net(net_msg, phase="TEST", compute_dtype=compute_dtype)

    # example shapes: data layers (batch 0), deploy input declarations, or
    # explicit input_shapes (required for push-fed layers like MEMORY_DATA,
    # whose shapes come from the caller at Reset time)
    batch0: dict = {k: np.zeros(tuple(shape), np.float32)
                    for k, shape in (input_shapes or {}).items()}
    sources = []
    for l in net.layers:
        if l.get("type") not in DATA_LAYER_TYPES:
            continue
        if all(str(t) in batch0 for t in l.get_list("top")):
            continue  # caller supplied this layer's shapes
        sources.append(make_data_source(l, phase="TEST"))
    merged0 = MergedSource(sources) if sources else None
    if merged0 is not None:
        batch0.update({k: np.asarray(v)
                       for k, v in merged0.next_batch().items()})
    input_names = list(net_msg.get_list("input"))
    input_dims = [int(d) for d in net_msg.get_list("input_dim")]
    for idx, name in enumerate(input_names):
        dims = input_dims[idx * 4:(idx + 1) * 4]
        batch0[str(name)] = np.zeros(dims, np.float32)
    if not batch0:
        raise ValueError("net has neither data layers nor input "
                         "declarations (pass input_shapes / --input_shape)")
    # per-input batch axis (the axis data-parallel sharding splits and
    # --symbolic_batch symbolizes): 0 for declared inputs; time-major
    # sources (tracking (T, B, ...)) declare theirs via batch_axes()
    in_axes = {k: 0 for k in batch0}
    if merged0 is not None:
        for k, a in merged0.batch_axes().items():
            if k in in_axes:
                in_axes[k] = int(a)

    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batch0.items()})
    for wp in weight_paths:
        params = _load_weights(wp, params)

    if quantize == "int8":
        from videovector_tpu.tools.quantize import calibrate, quantize_weights
        if calib_data is not None:
            calib = list(calib_data)
        elif sources:
            # a fresh source stream supplies the calibration batches —
            # with the SAME skip filter as the export path above (layers
            # covered by input_shapes, e.g. MEMORY_DATA, have no source
            # factory) and with the static input blobs merged into every
            # batch (batches 2+ would otherwise miss declared inputs)
            covered = set((input_shapes or {}).keys()) \
                | {str(n) for n in input_names}
            static = {k: batch0[k] for k in covered if k in batch0}
            src = MergedSource([make_data_source(l, phase="TEST")
                                for l in net.layers
                                if l.get("type") in DATA_LAYER_TYPES
                                and not all(str(t) in covered
                                            for t in l.get_list("top"))])
            calib = [batch0]
            for _ in range(max(0, calib_batches - 1)):
                b = dict(static)
                b.update({k: np.asarray(v)
                          for k, v in src.next_batch().items()})
                calib.append(b)
        else:
            raise ValueError(
                "int8 quantization needs calibration data: the net has no "
                "data layers, so pass calib_data=[{input: array}, ...]")
        scales = calibrate(net, params, calib)
        net.quant = quantize_weights(params, net, scales)
        log.info("int8 PTQ: quantized %d layers (%s)", len(net.quant),
                 ",".join(sorted(net.quant)))
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r}")

    # stateful (LSTM) nets: expose the cross-batch recurrent carry
    # (ref:src/caffe/layers/lstm_layer.cpp:171-173 next_cell_/next_out_) as
    # artifact inputs/outputs "state:<layer>:{c,h}" so a serving host
    # threads sequence state between calls with zero framework code
    stateful = list(net.stateful_layer_names)
    state0 = {}
    if stateful:
        from videovector_tpu.ops.recurrent import LstmState
        _, _, st0 = net.apply(
            params, {k: jnp.asarray(v) for k, v in batch0.items()},
            return_state=True)
        for ln in stateful:
            state0[f"state:{ln}:c"] = np.zeros(st0[ln].c.shape, np.float32)
            state0[f"state:{ln}:h"] = np.zeros(st0[ln].h.shape, np.float32)
        in_axes.update({k: 0 for k in state0})  # LstmState is (B, H)

    def _mesh_constrain(p, feed):
        # multi-device export: column-shard 2-D weights over "model"
        # (same layout as parallel/train.shard_params) and batch-shard the
        # feed over "data" at each input's batch axis; GSPMD propagates
        # shardings and inserts the collectives into the frozen program.
        from jax.sharding import NamedSharding, PartitionSpec as P
        tp = mesh.shape.get("model", 1) > 1

        def cp(leaf):
            spec = P(None, "model") if tp and getattr(leaf, "ndim", 0) == 2 \
                else P()
            return jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, spec))

        p = jax.tree.map(cp, p)
        if mesh.shape.get("data", 1) > 1:
            def cb(k, leaf):
                dims = [None] * leaf.ndim
                dims[in_axes.get(k, 0)] = "data"
                return jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, P(*dims)))
            feed = {k: cb(k, v) for k, v in feed.items()}
        return p, feed

    def serve(batch):
        feed = {k: v for k, v in batch.items() if not k.startswith("state:")}
        p = params
        if mesh is not None:
            p, feed = _mesh_constrain(p, feed)
        if stateful:
            from videovector_tpu.ops.recurrent import LstmState
            state = {ln: LstmState(batch[f"state:{ln}:c"],
                                   batch[f"state:{ln}:h"])
                     for ln in stateful}
            _, blobs, st = net.apply(p, feed, state=state,
                                     return_blobs=True, return_state=True)
        else:
            _, blobs = net.apply(p, feed, return_blobs=True)
            st = {}
        missing = [n for n in blob_names if n not in blobs]
        if missing:
            raise ValueError(f"blobs not in net: {missing}")
        out = {n: blobs[n] for n in blob_names}
        for ln in stateful:
            out[f"state:{ln}:c"] = st[ln].c
            out[f"state:{ln}:h"] = st[ln].h
        return out

    all_inputs = {**batch0, **state0}

    # infer each OUTPUT's batch axis abstractly: double every input at its
    # batch axis and see which output dims double (exact — only batch dims
    # vary). Nets with a static-batch constraint (e.g. FLATTEN_BATCH with
    # an explicit batch_size) refuse the doubled trace; their outputs fall
    # back to axis 0 in consumers, matching the pre-batch_axes behavior.
    def _mult_spec(m: int):
        return {k: jax.ShapeDtypeStruct(
            tuple(int(d) * m if i == in_axes[k] else int(d)
                  for i, d in enumerate(v.shape)), jnp.float32)
            for k, v in all_inputs.items()}

    out_axes: dict = {}
    out_shapes: dict = {}
    try:
        out1 = jax.eval_shape(serve, _mult_spec(1))
        out2 = jax.eval_shape(serve, _mult_spec(2))
        for name in out1:
            doubled = [i for i, (a, b) in enumerate(zip(out1[name].shape,
                                                        out2[name].shape))
                       if a != b and b == 2 * a]
            out_axes[name] = doubled[0] if doubled else None
            out_shapes[name] = [[int(d) for d in out1[name].shape],
                                str(out1[name].dtype)]
    except Exception as e:  # static-batch net: axes stay unrecorded
        log.info("output batch-axis inference skipped (static-batch "
                 "net?): %s", e)

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        spec = {k: jax.ShapeDtypeStruct(
            tuple(b if i == in_axes[k] else int(d)
                  for i, d in enumerate(v.shape)), jnp.float32)
            for k, v in all_inputs.items()}
    else:
        spec = {k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
                for k, v in all_inputs.items()}
    exp = jexport.export(jax.jit(serve), platforms=platforms)(spec)
    payload = exp.serialize()

    meta = {
        "inputs": {k: [[-1 if symbolic_batch and i == in_axes[k] else int(d)
                        for i, d in enumerate(v.shape)], "float32"]
                   for k, v in spec.items()},
        "batch_axes": {**in_axes, **out_axes},
        "outputs": blob_names + [k for k in sorted(state0)],
        # shapes at the EXAMPLE batch (the batch dim varies when
        # symbolic_batch; its axis per tensor is in batch_axes)
        "output_shapes": out_shapes,
        "state": sorted(state0),
        "platforms": list(exp.platforms),
        "mesh": ({ax: int(sz) for ax, sz in mesh.shape.items()}
                 if mesh is not None else None),
        "nr_devices": int(exp.nr_devices),
        "model": model_path,
        "quantize": quantize or "none",
        "compute_dtype": compute_dtype or "float32",
    }
    meta_bytes = json.dumps(meta).encode()
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_bytes)))
        f.write(meta_bytes)
        f.write(payload)
    log.info("Exported %s -> %s (%d bytes, platforms=%s)", model_path,
             out_path, len(payload), ",".join(exp.platforms))
    return meta


def read_meta(path: str) -> dict:
    """Read just the artifact's JSON metadata header (inputs/outputs/
    platforms/mesh/quantize + payload size) — no program deserialization,
    so it is instant on any host."""
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path}: not a vvserve artifact")
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode())
        f.seek(0, 2)
        meta["payload_bytes"] = f.tell() - 12 - meta_len
    return meta


def load_serving(path: str):
    """Returns (call_fn, meta): call_fn({name: array}) → {blob: array}.
    Needs only jax — no videovector_tpu code, prototxt, or weights."""
    from jax import export as jexport
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path}: not a vvserve artifact")
        (meta_len,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(meta_len).decode())
        exp = jexport.deserialize(bytearray(f.read()))
    return exp.call, meta


def mesh_serving(call, meta):
    """Load-side twin of `export_serving(mesh=...)`: returns a callable
    that runs a MULTI-DEVICE artifact (weights column-sharded over
    "model", inputs batch-sharded over "data" — the shardings are baked
    into the frozen program). Needs `meta["nr_devices"]` local devices;
    inputs are fed replicated and GSPMD reshards them on entry."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from videovector_tpu.parallel import make_mesh

    ndev = int(meta.get("nr_devices") or 1)
    if ndev == 1:
        return call
    if len(jax.devices()) < ndev:
        raise ValueError(
            f"artifact was exported for {ndev} devices; "
            f"{len(jax.devices())} available")
    m = meta.get("mesh") or {}
    mesh = make_mesh(data=int(m.get("data", 1)), model=int(m.get("model", 1)))
    rep = NamedSharding(mesh, P())
    return jax.jit(call, in_shardings=rep, out_shardings=rep)


def shard_serving(call, meta, mesh):
    """Data-parallel serving: returns a callable that shards input batches
    over the mesh's "data" axis and runs the frozen artifact once per
    device shard (shard_map — the shards are independent, so no
    collectives; throughput scales linearly over ICI-free devices).

    The artifact must accept the per-device batch: export with
    --symbolic_batch (any divisible global batch), or feed a global batch
    of artifact_batch × ndev. Tensors split on their recorded batch axis
    (meta["batch_axes"]: time-major LSTM blobs are (T, B, ...) → axis 1,
    state:* carries axis 0); artifacts exported before that field default
    to axis 0. Beyond the reference (single-GPU serving); the TPU-native
    deployment analogue of `extract_features --mesh`."""
    import jax
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    if int(meta.get("nr_devices") or 1) > 1:
        raise ValueError(
            f"artifact bakes a {meta['nr_devices']}-device program (export "
            "mesh=...); run it via mesh_serving — shard_serving is for "
            "single-device artifacts")
    ndev = mesh.shape["data"]
    axes = meta.get("batch_axes") or {}

    def _spec(name):
        ax = axes.get(name, 0)
        if ax is None:
            raise ValueError(
                f"output {name!r} has no batch axis (per-shard values "
                "would differ) — export without it for sharded serving")
        return ax, P(*([None] * ax + ["data"]))

    # the shard_map wrapper is built ONCE per input-key set and cached:
    # jit caches by function identity, so constructing a fresh shard_map
    # closure inside every call would miss the cache and retrace+recompile
    # each invocation (specs depend only on key names, not shapes — shape
    # changes hit the cached jit's own signature cache)
    fns: dict = {}

    def sharded_call(batch):
        for k, v in batch.items():
            ax, _ = _spec(k)
            if v.shape[ax] % ndev:
                raise ValueError(
                    f"input {k!r} batch {v.shape[ax]} (axis {ax}) not "
                    f"divisible by the mesh data axis ({ndev})")
        sig = tuple(sorted(batch))
        if sig not in fns:
            in_specs = {k: _spec(k)[1] for k in sig}
            out_specs = {n: _spec(n)[1] for n in meta["outputs"]}
            fns[sig] = jax.jit(shard_map(call, mesh=mesh,
                                         in_specs=(in_specs,),
                                         out_specs=out_specs,
                                         check_vma=False))
        return fns[sig](batch)

    return sharded_call


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vvtpu-serve")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("export", help="freeze net+weights into an artifact")
    p.add_argument("model")
    p.add_argument("out")
    p.add_argument("--weights", action="append", default=[])
    p.add_argument("--blobs", required=True,
                   help="comma-separated blob names to serve")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")

    p.add_argument("--symbolic_batch", action="store_true",
                   help="export the leading dim as a shape symbol: one "
                        "artifact serves any batch size")
    p.add_argument("--input_shape", action="append", default=[],
                   help="name=4,3,227,227 — explicit input shapes "
                        "(needed for MEMORY_DATA-fed nets)")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8 PTQ: calibrated symmetric per-channel "
                        "weights, int8 MXU math (v5e: 2x bf16 peak), "
                        "4x smaller artifact")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="calibration batches for --quantize")
    p.add_argument("--compute", default="", choices=["", "bfloat16"],
                   help="freeze bf16 GEMM/conv operands (f32 accumulation)"
                        " — the live pipeline's throughput math; default "
                        "keeps f32 reference numerics")
    p.add_argument("--mesh", default="",
                   help="DxM: bake a multi-device program (weights column-"
                        "sharded over the M model axis, batch over D) — "
                        "tensor-parallel serving; load with mesh_serving "
                        "on a DxM-device host")

    p = sub.add_parser("info", help="print an artifact's metadata (inputs/"
                                    "outputs/platforms/mesh/quantize) as "
                                    "JSON, without loading the program")
    p.add_argument("artifact")

    p = sub.add_parser("run", help="smoke-run an artifact on random inputs")
    p.add_argument("artifact")
    p.add_argument("--mesh", default="",
                   help="data-parallel serving over a device mesh, e.g. 8 "
                        "(batch shards over devices; artifact runs per "
                        "shard, no collectives)")
    p.add_argument("--iterations", type=int, default=0,
                   help="also time the artifact: N timed calls after a "
                        "warmup, reporting ms/call and items/s (the "
                        "deployment twin of `vvtpu time`)")
    p.add_argument("--memory", action="store_true",
                   help="report the compiled artifact's XLA buffer-"
                        "assignment memory (peak HBM + argument/output/"
                        "temp bytes) — sizes serving batches on a TPU host")

    args = parser.parse_args(argv)
    if args.command == "export":
        platforms = [s for s in args.platforms.split(",") if s] or None
        shapes = {}
        for spec in args.input_shape:
            name, _, dims = spec.partition("=")
            shapes[name] = tuple(int(d) for d in dims.split(","))
        from videovector_tpu.tools.cli import _parse_mesh
        export_serving(args.model, args.weights, args.blobs.split(","),
                       args.out, platforms=platforms,
                       symbolic_batch=args.symbolic_batch,
                       input_shapes=shapes or None,
                       quantize=args.quantize or None,
                       calib_batches=args.calib_batches,
                       compute_dtype=args.compute or None,
                       mesh=_parse_mesh(args.mesh))
    elif args.command == "info":
        print(json.dumps(read_meta(args.artifact), indent=2, sort_keys=True))
    elif args.command == "run":
        call, meta = load_serving(args.artifact)
        rng = np.random.RandomState(0)
        mult = 1
        if int(meta.get("nr_devices") or 1) > 1:
            if args.mesh:
                raise SystemExit("--mesh: this artifact already bakes a "
                                 f"{meta['nr_devices']}-device program; it "
                                 "runs on its export mesh via mesh_serving")
            call = mesh_serving(call, meta)
        elif args.mesh:
            from videovector_tpu.tools.cli import _parse_mesh
            mesh = _parse_mesh(args.mesh)
            call = shard_serving(call, meta, mesh)
            mult = mesh.shape["data"]
        elif args.iterations > 0 and not args.memory:
            # time the jitted path (what a serving host runs) — the bare
            # exported call pays per-invocation dispatch overhead
            import jax
            call = jax.jit(call)
        axes = meta.get("batch_axes") or {}
        batch = {k: rng.randn(*[8 * mult if d == -1 else
                                (d * mult if i == axes.get(k, 0) else d)
                                for i, d in enumerate(shape)]).astype(dtype)
                 for k, (shape, dtype) in meta["inputs"].items()}
        if args.memory:
            # AOT-compile the (possibly mesh-wrapped) artifact call so the
            # executable's buffer assignment is inspectable; reuse it below
            # so --memory adds no second compile
            import jax
            from videovector_tpu.tools.cli import (_log_memory_stats,
                                                   _safe_memory_analysis)
            compiled = jax.jit(lambda b: call(b)).lower(batch).compile()
            _log_memory_stats("serving artifact",
                              _safe_memory_analysis(compiled))
            call = compiled
        out = call(batch)
        for name, arr in out.items():
            log.info("%s: shape=%s mean=%.6f", name, tuple(arr.shape),
                     float(np.asarray(arr).mean()))
        if args.iterations > 0:
            # scalar fetch per rep: block_until_ready is unreliable on the
            # axon platform; fetching a value forces a full sync
            import time as _t
            first = next(iter(out))
            float(np.asarray(out[first]).ravel()[0])  # warm fence
            t0 = _t.perf_counter()
            for _ in range(args.iterations):
                out = call(batch)
            float(np.asarray(out[first]).ravel()[0])
            dt = (_t.perf_counter() - t0) / args.iterations
            axes = meta.get("batch_axes") or {}
            # items/s only when some input has a RECORDED batch axis — a
            # recorded-but-None axis means a static-batch net (no batch
            # dimension to count items over), and guessing axis 0 would
            # misreport time-major or side inputs (ADVICE r4)
            items_ax = next(((k, ax) for k, ax in axes.items()
                             if ax is not None and k in batch), None)
            if items_ax is not None:
                k0, ax0 = items_ax
                items = batch[k0].shape[ax0]
                log.info("Serving: %.3f ms/call (%.1f calls/s, %.0f items/s)",
                         dt * 1e3, 1.0 / dt, items / dt)
            else:
                log.info("Serving: %.3f ms/call (%.1f calls/s)",
                         dt * 1e3, 1.0 / dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
