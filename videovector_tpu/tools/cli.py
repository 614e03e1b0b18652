"""vvtpu — the multi-command CLI (the `caffe.bin` equivalent).

ref:tools/caffe.cpp — commands train / test / device_query / time, with
--solver/--model/--weights/--snapshot/--iterations flags. `time` reproduces
the per-layer forward timing benchmark (ref :194-266), reporting per-layer
and total milliseconds (backward is timed as the whole grad, since XLA fuses
the backward graph).

Usage:
  python -m videovector_tpu.tools.cli train --solver=solver.prototxt
  python -m videovector_tpu.tools.cli test --model=net.prototxt \
      --weights=model.vvmodel --iterations=50
  python -m videovector_tpu.tools.cli time --model=net.prototxt
  python -m videovector_tpu.tools.cli device_query
"""

from __future__ import annotations

import argparse
import sys
import time as _time

import numpy as np

from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _parse_mesh(spec: str):
    """"DxM" → jax.sharding.Mesh with (data=D, model=M) axes; "" → None."""
    if not spec:
        return None
    from videovector_tpu.parallel import make_mesh
    data_sz, _, model_sz = spec.partition("x")
    return make_mesh(data=int(data_sz), model=int(model_sz or 1))


def _apply_device_mode(args, solver_msg=None) -> None:
    """Reference device selection: SolverParameter.solver_mode CPU/GPU +
    the caffe.bin --gpu flag (ref:tools/caffe.cpp:97-104,
    ref:src/caffe/proto/caffe.proto solver_mode). Here: `--cpu` (or
    solver_mode: CPU) pins the XLA CPU backend; the default is the
    accelerator. device_id is moot on a single-chip host."""
    cpu = getattr(args, "cpu", False)
    gpu = getattr(args, "gpu", None)
    if gpu is not None and int(gpu) < 0:
        cpu = True  # --gpu=-1 == CPU mode (later-Caffe convention)
    if not cpu and solver_msg is not None:
        cpu = str(solver_msg.get("solver_mode", "GPU")).upper() == "CPU"
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        log.info("Running in CPU-only mode (solver_mode: CPU / --cpu)")
    elif gpu is not None:
        # accepted for drop-in compatibility with reference driver scripts
        # (train_mednet_embedding.sh passes --gpu=3); device selection is
        # the runtime's on a TPU host — there is one local accelerator
        log.info("--gpu=%s accepted (device selection is automatic on this "
                 "runtime)", gpu)


def cmd_train(args) -> int:
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.solver.driver import SolverDriver
    if args.snapshot and args.weights:
        # ref CHECK(!FLAGS_snapshot.size() || !FLAGS_weights.size()),
        # tools/caffe.cpp:82-84 — a snapshot already carries the weights
        raise SystemExit("Give a snapshot to resume training or weights "
                         "to finetune but not both.")
    _apply_device_mode(args, parse_file(args.solver))
    driver = SolverDriver.from_prototxt(args.solver).build()
    snapshot = args.snapshot or None
    if getattr(args, "auto_resume", False) and not snapshot:
        snapshot = _latest_snapshot(driver.cfg.snapshot_prefix)
        if snapshot:
            log.info("Auto-resuming from %s", snapshot)
    mesh = _parse_mesh(getattr(args, "mesh", ""))
    if mesh is not None:
        log.info("Training over mesh data=%d model=%d",
                 mesh.shape["data"], mesh.shape["model"])
    _train_with_restarts(driver, snapshot=snapshot,
                         weights=args.weights or None, mesh=mesh,
                         shard_gallery=bool(getattr(args, "shard_gallery",
                                                    False)),
                         max_restarts=getattr(args, "max_restarts", 0))
    log.info("Optimization Done.")
    return 0


def _train_with_restarts(driver, *, snapshot, weights, mesh,
                         shard_gallery: bool = False,
                         max_restarts: int = 0):
    """Failure recovery: on a runtime fault (device error, preemption —
    anything except Ctrl-C), reload the newest snapshot and continue, up to
    --max_restarts times. The reference's recovery story is a human
    re-running `caffe train --snapshot=...` (ref:src/caffe/solver.cpp:
    419-429 Restore); with periodic snapshots + async atomic writes this
    automates it in-process. Each restart rebuilds the data sources, so
    sampling streams restart from their seed — the same semantics a manual
    reference restart has."""
    restarts = 0
    while True:
        try:
            return driver.train(resume_state_path=snapshot,
                                weights_path=weights, mesh=mesh,
                                shard_gallery=shard_gallery)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — deliberate catch-all
            restarts += 1
            if restarts > max_restarts:
                raise
            latest = _latest_snapshot(driver.cfg.snapshot_prefix)
            log.error("Training failed (%s: %s); restart %d/%d from %s",
                      type(e).__name__, e, restarts, max_restarts,
                      latest or ("finetune weights" if weights else
                                 "scratch"))
            if latest is not None:
                # a snapshot carries the full state; --weights only seeds
                # the very first attempt
                snapshot = latest
                weights = None
            # else: no snapshot landed yet — keep the original
            # snapshot/weights so a finetune restart re-seeds correctly
            driver = driver.rebuild()


def _latest_snapshot(prefix: str):
    """Newest <prefix>_iter_N.vvstate, for crash-restart recovery (the
    reference's recovery story is manual --snapshot; this automates it)."""
    import glob
    import re
    if not prefix:
        return None
    best, best_iter = None, -1
    for path in glob.glob(f"{prefix}_iter_*.vvstate"):
        m = re.search(r"_iter_(\d+)\.vvstate$", path)
        if m and int(m.group(1)) > best_iter:
            best, best_iter = path, int(m.group(1))
    return best


def cmd_test(args) -> int:
    """Average net outputs over N forward iterations (ref caffe.cpp:127-190)."""
    if not args.weights and not getattr(args, "allow_random_weights", False):
        # ref CHECK_GT(FLAGS_weights.size(), 0) "Need model weights to
        # score." (tools/caffe.cpp:129) — scoring a randomly initialized
        # net is almost always a mistake; opt out explicitly for smoke runs
        raise SystemExit("Need model weights to score "
                         "(or pass --allow_random_weights).")
    _apply_device_mode(args)
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.graph.data_factory import MergedSource, make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net

    net_msg = parse_file(args.model)
    net = Net(net_msg, phase="TEST")
    sources = [make_data_source(l, phase="TEST")
               for l in net.layers if l.get("type") in DATA_LAYER_TYPES]
    source = MergedSource(sources)
    batch0_raw = source.next_batch()
    batch0 = {k: jnp.asarray(v) for k, v in batch0_raw.items()}
    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batch0.items()})
    if args.weights:
        params = _load_weights(args.weights, params)

    mesh = _parse_mesh(getattr(args, "mesh", ""))
    place_batch = lambda b: b  # noqa: E731
    if mesh is not None:
        # data-parallel eval: batch sharded over "data", params replicated;
        # GSPMD inserts the cross-chip reductions the metric layers need
        from videovector_tpu.parallel.train import shard_batch, shard_params
        params = shard_params(params, mesh)
        axes = source.batch_axes() if hasattr(source, "batch_axes") else None
        place_batch = lambda b: shard_batch(b, mesh, axes=axes)  # noqa: E731
        batch0 = place_batch(batch0)

    sinks = bool(net.host_sinks)
    stateful = bool(net.stateful_layer_names)
    apply_fn = jax.jit(lambda p, b, st: net.apply(
        p, b, state=st, return_state=stateful, return_sink_blobs=sinks))
    validators = net.batch_validators()  # host-side twins of jit-opaque
    # CHECKs (video_level_retrieval id-count, retrieval_stats_layer.cpp:188)
    sums: dict[str, np.ndarray] = {}
    loss_sum = 0.0
    carry = None  # LSTM cross-batch state carries across test forwards
    # exactly as in the reference (ref lstm_layer.cpp:171-173,261-264 —
    # `caffe test` reuses one net, so prev_cell_ persists between batches)
    for i in range(args.iterations):
        raw = batch0_raw if i == 0 else source.next_batch()
        # validators run on the HOST batch before device placement (their
        # contract): on a sharded mesh batch, np.asarray inside a check
        # would pay a D2H fetch per iteration — or raise outright on a
        # non-fully-addressable multi-host array
        for v in validators:
            v(raw)
        batch = batch0 if i == 0 else place_batch(
            {k: jnp.asarray(x) for k, x in raw.items()})
        res = apply_fn(params, batch, carry)
        loss, outputs = res[0], res[1]
        rest = list(res[2:])
        if stateful:
            carry = rest.pop(0)
        if sinks:
            # reference sink layers truncate + rewrite their files on
            # every TEST forward (write_to_file_layer.cpp:42,
            # retrieval_stats_layer.cpp:150)
            net.process_host_sinks(
                rest.pop(0), mesh=mesh,
                shard_gallery=bool(getattr(args, "shard_gallery", False)))
        loss_sum += float(loss)
        for k, v in outputs.items():
            arr = np.asarray(v).reshape(-1)
            sums[k] = (sums[k] + arr) if k in sums else arr.copy()
            # per-batch per-element lines, the reference's loop
            # (ref:tools/caffe.cpp:156-169)
            for x in arr:
                log.info("Batch %d, %s = %g", i, k, x)
    log.info("Loss: %g", loss_sum / args.iterations)
    # every ELEMENT of every output blob gets its per-iteration mean, one
    # line per element with the blob's name; loss-weighted outputs carry
    # the reference's '(* w = x loss)' suffix (ref:tools/caffe.cpp:173-185)
    out_w = net.output_loss_weights()
    for k, v in sorted(sums.items()):
        w = out_w.get(k, 0.0)
        for x in v / args.iterations:
            suffix = f" (* {w:g} = {w * x:g} loss)" if w else ""
            log.info("%s = %g%s", k, x, suffix)
    return 0


def _load_weights(path: str, params):
    if path.endswith(".vvmodel"):
        from videovector_tpu.solver.checkpoint import load_model
        loaded = load_model(path)
        for lname, lp in loaded.items():
            if lname in params:
                params[lname].update(lp)
        return params
    from videovector_tpu.data.weights import NetWeights, load_into_params
    return load_into_params(NetWeights.load(path), params)


def cmd_device_query(args) -> int:
    import jax
    if getattr(args, "watch", False):
        return _device_watch(interval=args.interval, count=args.count)
    for d in jax.devices():
        log.info("Device: %s", d)
        log.info("  platform: %s", d.platform)
        log.info("  device_kind: %s", d.device_kind)
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            log.info("  bytes_in_use: %s", stats.get("bytes_in_use"))
            log.info("  bytes_limit: %s", stats.get("bytes_limit"))
    return 0


def _device_watch(interval: float = 2.0, count: int = 0,
                  out=None) -> int:
    """Live device telemetry table — the TPU equivalent of the reference's
    gpustat.py nvidia-smi watcher (ref:caffe_utils/gpustat.py:1-40): one
    row per device per tick with HBM in-use/peak/limit and allocation
    count, sampled from the runtime's memory_stats. Ctrl-C (or `count`
    ticks) stops."""
    import jax
    write = (out.write if out is not None
             else lambda s: print(s, end="", flush=True))

    def mb(v):
        return f"{v / (1 << 20):8.1f}" if isinstance(v, (int, float)) \
            else "     n/a"

    devices = jax.devices()
    write(f"{'time':>8s}  {'dev':<22s} {'used MB':>8s} {'peak MB':>8s} "
          f"{'limit MB':>8s} {'use%':>5s} {'allocs':>7s}\n")
    tick = 0
    try:
        while True:
            ts = _time.strftime("%H:%M:%S")
            for d in devices:
                stats = getattr(d, "memory_stats", lambda: None)() or {}
                used = stats.get("bytes_in_use")
                peak = stats.get("peak_bytes_in_use")
                limit = stats.get("bytes_limit")
                pct = (f"{100.0 * used / limit:5.1f}"
                       if isinstance(used, (int, float))
                       and isinstance(limit, (int, float)) and limit
                       else "  n/a")
                allocs = stats.get("num_allocs", "n/a")
                write(f"{ts:>8s}  {str(d):<22.22s} {mb(used)} {mb(peak)} "
                      f"{mb(limit)} {pct} {allocs!s:>7s}\n")
            tick += 1
            if count and tick >= count:
                break
            _time.sleep(interval)
    except KeyboardInterrupt:
        pass
    return 0


def cmd_time(args) -> int:
    """Per-layer forward timing + whole-step forward/backward timing
    (ref caffe.cpp:194-266)."""
    _apply_device_mode(args)
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES, LAYERS, ApplyContext
    from videovector_tpu.graph.net import Net

    net_msg = parse_file(args.model)
    net = Net(net_msg, phase="TRAIN")
    # batch from the net's data layers, or — for deploy-style prototxts,
    # the reference `caffe time` staple — synthesized from input/input_dim
    # declarations (ref:tools/caffe.cpp:199-201 Net from model definition)
    rng = np.random.RandomState(0)
    batch = {}
    input_names = list(net_msg.get_list("input"))
    input_dims = [int(d) for d in net_msg.get_list("input_dim")]
    for idx, name in enumerate(input_names):
        dims = input_dims[idx * 4:(idx + 1) * 4]
        if not dims:
            raise ValueError(f"input {name!r} has no input_dim")
        batch[str(name)] = rng.randn(*dims).astype(np.float32)
    from videovector_tpu.graph.data_factory import make_data_source
    for layer in net.layers:
        if layer.get("type") in DATA_LAYER_TYPES:
            src = make_data_source(layer, phase="TRAIN")
            batch.update(src.next_batch())
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batch.items()})

    iters = args.iterations
    log.info("*** Benchmark begins ***")
    mode = getattr(args, "per_layer", "segmented")
    if getattr(args, "fused_only", False):
        mode = "off"
    memory = getattr(args, "memory", False)
    if mode == "off":
        return _time_fused(net, params, batch, iters, memory=memory)
    if mode == "segmented":
        _time_segmented(net, params, batch, iters,
                        backward=getattr(args, "backward", False))
        _time_fused(net, params, batch, iters, memory=memory)
        return 0

    # isolated mode: each layer jitted alone (one compile per layer — fine
    # on local hosts, slow over remote-compile tunnels; use segmented there)
    # materialize all blobs once
    _, blobs = net.apply(params, batch, rng=jax.random.PRNGKey(0),
                         return_blobs=True)
    ctx = ApplyContext(phase="TRAIN", rng=jax.random.PRNGKey(0), side=net.side)

    total = 0.0
    for layer in net.layers:
        ltype = layer.get("type")
        lname = layer.get("name")
        if ltype in DATA_LAYER_TYPES:
            continue
        ldef = LAYERS[ltype]
        bottoms = [blobs[str(b)] for b in layer.get_list("bottom")]
        lparams = net._resolve_params(params, net.param_meta, lname)
        fn = jax.jit(lambda p, xs, ldef=ldef, layer=layer:
                     ldef.apply(p, xs, layer, ctx))
        out = fn(lparams, bottoms)
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(iters):
            out = fn(lparams, bottoms)
        jax.block_until_ready(out)
        dt = (_time.perf_counter() - t0) / iters * 1e3
        total += dt
        log.info("%-24s forward: %.3f ms", lname, dt)
        if getattr(args, "backward", False):
            # per-layer Backward analogue (ref caffe.cpp:241-249): vjp wrt
            # params and bottoms with ones cotangents
            def scalar(p, xs, ldef=ldef, layer=layer):
                outs = ldef.apply(p, xs, layer, ctx)
                return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            bwd = jax.jit(jax.grad(scalar, argnums=(0, 1)))
            try:
                g = bwd(lparams, bottoms)
            except TypeError:
                continue  # int-only layer (e.g. ARGMAX): no backward
            jax.block_until_ready(g)
            t0 = _time.perf_counter()
            for _ in range(iters):
                g = bwd(lparams, bottoms)
            jax.block_until_ready(g)
            dt = (_time.perf_counter() - t0) / iters * 1e3
            log.info("%-24s backward: %.3f ms", lname, dt)
    log.info("Total per-layer forward: %.3f ms", total)

    _time_fused(net, params, batch, iters, memory=memory)
    return 0


def _time_segmented(net, params, batch, iters, backward=False):
    """Per-layer timing from ONE compiled program: every graph prefix is a
    branch of a single lax.switch, so the whole benchmark costs one XLA
    compile (the isolated mode's per-layer compiles are prohibitive over
    remote-compile tunnels). Layer cost is reported as the marginal time of
    adding that layer to the prefix — prefix L equals the full fused
    forward, so the column sums to what you actually pay, including XLA
    fusion across layer boundaries (unlike per-layer Forward loops,
    ref:tools/caffe.cpp:194-266, which can't see fusion).

    With backward=True each branch is value_and_grad of the prefix scalar
    wrt params, so marginals report forward+backward per layer (the
    reference prints both, caffe.cpp:232-249); compile cost roughly
    doubles."""
    import jax
    import jax.numpy as jnp
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES

    names = [str(l.get("name")) for l in net.layers
             if l.get("type") not in DATA_LAYER_TYPES]
    num = len(names)
    key = jax.random.PRNGKey(0)

    def make_branch(k):
        def branch(p, b, acc):
            # acc-dependence keeps every iteration live inside fori_loop
            # (a loop-invariant body would be hoisted and we'd time nothing)
            b = {n: v + (acc * 1e-37).astype(v.dtype) if
                 jnp.issubdtype(v.dtype, jnp.floating) else v
                 for n, v in b.items()}
            _, blobs = net.apply(p, b, rng=key, return_blobs=True,
                                 max_layers=k)
            tot = jnp.float32(0.0)
            for v in blobs.values():  # touch every blob: no DCE of branches
                tot = tot + jnp.sum(jnp.abs(v.astype(jnp.float32)))
            return tot
        return branch

    def with_grad(branch):
        def fb(p, b, acc):
            val, grads = jax.value_and_grad(branch)(p, b, acc)
            gsum = jnp.float32(0.0)
            for leaf in jax.tree.leaves(grads):
                gsum = gsum + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
            return val + 1e-30 * gsum  # keep the backward pass live
        return fb

    branches = [make_branch(k) for k in range(num + 1)]
    if backward:
        branches = [with_grad(b) for b in branches]

    # all reps run INSIDE the program: one dispatch per prefix, so per-call
    # overhead (milliseconds over a remote tunnel) divides by `iters`
    # instead of adding to every layer's marginal time
    def run(i, p, b):
        return jax.lax.fori_loop(
            0, iters,
            lambda _, acc: jax.lax.switch(i, branches, p, b, acc),
            jnp.float32(0.0))

    fn = jax.jit(run)
    float(fn(0, params, batch))  # one compile for all prefixes

    prefix_ms = []
    for k in range(num + 1):
        float(fn(k, params, batch))  # warm this branch's execution path
        t0 = _time.perf_counter()
        out = fn(k, params, batch)
        float(out)  # scalar fetch: reliable fence on axon
        prefix_ms.append((_time.perf_counter() - t0) / iters * 1e3)
    what = "forward-backward" if backward else "forward"
    total = 0.0
    for i, name in enumerate(names):
        dt = prefix_ms[i + 1] - prefix_ms[i]
        total += dt
        log.info("%-24s %s (marginal): %.3f ms", name, what, dt)
    log.info("Total %s (prefix sum): %.3f ms", what, total)
    return 0


def _fmt_bytes(n) -> str:
    n = float(n)
    for unit in ("B", "KiB", "MiB"):
        if n < 1024:
            return f"{n:.0f} {unit}" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.2f} GiB"


def _safe_memory_analysis(compiled):
    """`compiled.memory_analysis()`, or None when the backend has no
    buffer-assignment stats — some backends RAISE (NotImplementedError /
    XlaRuntimeError) instead of returning None, and --memory must degrade
    to the 'not reported' line rather than crash the whole invocation."""
    try:
        return compiled.memory_analysis()
    except Exception:
        return None


def _log_memory_stats(tag: str, ma) -> None:
    """One line of XLA buffer-assignment memory accounting for a compiled
    program (jax AOT `compiled.memory_analysis()`): peak device (HBM)
    footprint plus its argument/output/temp/code components. TPU-first
    extension beyond the reference's `caffe time` (which reports ms only,
    ref:tools/caffe.cpp:194-266) — peak HBM is what sizes batches and
    galleries on a TPU host."""
    if ma is None:  # backends without buffer-assignment stats
        log.info("Memory (%s): not reported by this backend", tag)
        return
    log.info(
        "Memory (%s): peak %s (arguments %s, outputs %s, temporaries %s, "
        "code %s)", tag,
        _fmt_bytes(getattr(ma, "peak_memory_in_bytes", 0)),
        _fmt_bytes(getattr(ma, "argument_size_in_bytes", 0)),
        _fmt_bytes(getattr(ma, "output_size_in_bytes", 0)),
        _fmt_bytes(getattr(ma, "temp_size_in_bytes", 0)),
        _fmt_bytes(getattr(ma, "generated_code_size_in_bytes", 0)))


def _time_fused(net, params, batch, iters, memory=False):
    import jax
    import jax.numpy as jnp
    has_loss = any(w != 0.0 for ws in net.loss_weights.values() for w in ws)
    if has_loss:
        def scalar(p):
            return net.loss_fn(p, batch, jax.random.PRNGKey(0))
    else:
        # loss-less (deploy) net: a constant-zero loss would constant-fold
        # the entire fwd+bwd program and the "timing" would measure
        # nothing. Reduce every net output to a scalar instead (ones
        # cotangents) — the same convention as the isolated per-layer
        # backward and the reference's Backward-on-whatever-diffs
        # (ref:tools/caffe.cpp:241-249)
        log.info("net has no loss layer: timing forward+backward of "
                 "sum(outputs)")

        def scalar(p):
            _, outputs = net.apply(p, batch, rng=jax.random.PRNGKey(0))
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in outputs.values())
    step = jax.jit(jax.value_and_grad(scalar))
    fn = step
    if memory:
        # AOT-compile so the executable's buffer assignment is inspectable;
        # reuse the same executable for the timing loop (no double compile)
        compiled = step.lower(params).compile()
        _log_memory_stats("fused forward-backward",
                          _safe_memory_analysis(compiled))
        fwd = jax.jit(scalar)
        _log_memory_stats("forward only", _safe_memory_analysis(
            fwd.lower(params).compile()))
        fn = compiled
    loss, g = fn(params)
    float(loss)  # scalar fetch: reliable fence (block_until_ready is not on axon)
    t0 = _time.perf_counter()
    for _ in range(iters):
        loss, g = fn(params)
    float(loss)
    dt = (_time.perf_counter() - t0) / iters * 1e3
    log.info("Fused forward-backward: %.3f ms (%.1f steps/s)", dt, 1e3 / dt)
    log.info("*** Benchmark ends ***")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vvtpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train a model from a solver prototxt")
    p.add_argument("--solver", required=True)
    p.add_argument("--snapshot", default="",
                   help="resume from a .vvstate snapshot, or a reference "
                        ".solverstate (momentum history restored; "
                        "ref solver.cpp:419-429)")
    p.add_argument("--weights", default="",
                   help="finetune from .vvmodel/.caffemodel weights")
    p.add_argument("--max_restarts", type=int, default=0,
                   help="failure recovery: on a runtime fault, reload the "
                        "newest snapshot and continue, up to N times "
                        "(0 = fail fast, the reference behavior)")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the newest snapshot matching the "
                        "solver's snapshot_prefix, if any")
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend (also honored from the "
                        "solver's solver_mode: CPU)")
    p.add_argument("--gpu", type=int, default=None,
                   help="reference-script compatibility: accepted; -1 means "
                        "CPU mode, otherwise device selection is automatic")
    p.add_argument("--mesh", default="",
                   help="multi-chip mesh as DATAxMODEL (e.g. 4x2): batch "
                        "sharded over data, tower column-sharded over model")
    p.add_argument("--shard_gallery", action="store_true",
                   help="with --mesh: shard test-interval RETRIEVAL_STATS "
                        "report galleries over the data axis (per-device "
                        "memory N*D/ndev)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("test", help="score a model")
    p.add_argument("--model", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="score with random init (the reference CHECK-fails "
                        "without --weights; this is the explicit opt-out)")
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend")
    p.add_argument("--gpu", type=int, default=None,
                   help="reference-script compatibility flag")
    p.add_argument("--mesh", default="",
                   help="data-parallel eval over a device mesh, e.g. 8 or "
                        "8x1 (batch sharded over the data axis)")
    p.add_argument("--shard_gallery", action="store_true",
                   help="with --mesh: shard RETRIEVAL_STATS report "
                        "galleries over the data axis (per-device memory "
                        "N*D/ndev — galleries beyond one chip's HBM)")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("device_query", help="show device info")
    p.add_argument("--watch", action="store_true",
                   help="live telemetry table (gpustat-style): HBM "
                        "used/peak/limit per device, sampled periodically")
    p.add_argument("--interval", type=float, default=2.0,
                   help="--watch sampling period in seconds")
    p.add_argument("--count", type=int, default=0,
                   help="--watch tick count (0 = until Ctrl-C)")
    p.set_defaults(fn=cmd_device_query)

    p = sub.add_parser("time", help="per-layer timing benchmark")
    p.add_argument("--model", required=True)
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--per_layer", default="segmented",
                   choices=["segmented", "isolated", "off"],
                   help="segmented (default): ONE compile, per-layer cost as "
                        "marginal prefix time (fusion-aware, tunnel-friendly); "
                        "isolated: jit each layer alone (reference caffe.cpp "
                        "semantics, one compile per layer); off: fused "
                        "forward-backward only")
    p.add_argument("--fused_only", action="store_true",
                   help="[deprecated] alias for --per_layer=off")
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend")
    p.add_argument("--gpu", type=int, default=None,
                   help="reference-script compatibility flag")
    p.add_argument("--memory", action="store_true",
                   help="report XLA buffer-assignment memory (peak HBM + "
                        "argument/output/temp/code bytes) for the forward "
                        "and fused fwd+bwd programs — sizes batches on a "
                        "TPU host (beyond the reference's ms-only output). "
                        "NOTE: the forward-only report is a SECOND compiled "
                        "program; over a remote-compile link that is an "
                        "extra multi-minute compile unless the persistent "
                        "cache (jax_compilation_cache_dir) is warm")
    p.add_argument("--backward", action="store_true",
                   help="also time backward per layer (reference "
                        "caffe time prints both; compile cost grows)")
    p.set_defaults(fn=cmd_time)

    # deprecated shims (ref:tools/train_net.cpp:3-6 etc. — thin aliases)
    p = sub.add_parser("train_net", help="[deprecated] use train")
    p.add_argument("solver")
    p.add_argument("snapshot", nargs="?", default="")
    p.set_defaults(fn=lambda a: cmd_train(argparse.Namespace(
        solver=a.solver, snapshot=a.snapshot, weights="")))
    p = sub.add_parser("finetune_net", help="[deprecated] use train --weights")
    p.add_argument("solver")
    p.add_argument("weights")
    p.set_defaults(fn=lambda a: cmd_train(argparse.Namespace(
        solver=a.solver, snapshot="", weights=a.weights)))
    p = sub.add_parser("test_net", help="[deprecated] use test")
    p.add_argument("model")
    p.add_argument("weights")
    p.add_argument("iterations", nargs="?", type=int, default=50)
    p.set_defaults(fn=cmd_test)
    p = sub.add_parser("net_speed_benchmark", help="[deprecated] use time")
    p.add_argument("model")
    p.add_argument("iterations", nargs="?", type=int, default=50)
    p.set_defaults(fn=cmd_time)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
