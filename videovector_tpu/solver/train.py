"""The training loop — Solver::Solve equivalent
(ref:src/caffe/solver.cpp:160-240).

Responsibilities preserved: per-iteration forward/backward/update (one jitted
XLA program), `display`-interval glog-style metric lines (so log-scraping
tools like ref:caffe_utils/plot_training_stats.py keep working),
`test_interval` evaluation averaging net outputs over `test_iter` batches
(ref Solver::Test :244-317), `snapshot`-interval checkpointing and
resume (ref Restore :419-429).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import jax
import numpy as np

from videovector_tpu.solver.checkpoint import (
    AsyncSnapshotter, restore,
)
from videovector_tpu.solver.solvers import (
    SolverConfig, init_solver_state, learning_rate, solver_update,
)
from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


@dataclass
class TrainResult:
    params: Any
    state: Any
    metrics_history: list = field(default_factory=list)
    test_history: list = field(default_factory=list)
    # cross-batch carry (LSTM state / device negative reservoir) after the
    # last step — hand back via train(initial_carry=...) to continue
    final_carry: Any = None


def accumulate_microbatches(vg_fn, params, batch, axes, n_micro, keys):
    """lax.scan `vg_fn(params, mb, key) -> ((loss, aux), grads)` over
    `n_micro` equal microbatches of `batch`, accumulating grads and loss —
    the shared core of build_fused_step and parallel.train.make_train_step
    (the reference's iter_size accumulation, ref:src/caffe/solver.cpp).

    `batch` is a dict of arrays (or any pytree, then split on axis 0);
    `axes` maps dict keys to their batch axis (default 0). When any axis
    is non-leading (role-major layouts) the scan runs over microbatch
    INDICES and dynamic-slices the original tensors: a reshape+moveaxis
    split would materialize a full transposed copy of the batch — the
    relayout the role-major feed exists to avoid (8.11 → 7.55 ms on the
    B=1024 engine step, PERF.md r4). Caveat: under a GSPMD mesh that
    shards the batch axis, the traced-index dynamic-slice (like the
    reshape split) cuts the GLOBAL batch, which the partitioner may
    implement with gathers/resharding — for real multi-chip microbatching
    prefer the shard_map DP step (parallel/shard_map_dp.py), which slices
    local shards; the GSPMD composition is numerics-certified in the
    driver dryrun but its collective layout is unmeasured on real
    hardware.

    Raises on non-divisible batch axes (dynamic_slice would silently
    CLAMP the last microbatch). Returns (grads_sum, loss_sum, aux_all) —
    divide by n_micro for means.
    """
    import jax.numpy as jnp
    from jax import lax

    def check_div(b, k=None):
        if b % n_micro:
            where = f" of {k!r}" if k is not None else ""
            raise ValueError(f"microbatch count {n_micro} does not divide "
                             f"batch axis {b}{where}")
        return b // n_micro

    g0 = jax.tree.map(jnp.zeros_like, params)
    is_dict = isinstance(batch, dict)
    if is_dict and any(axes.get(k, 0) != 0 for k in batch):
        sizes = {k: check_div(v.shape[axes.get(k, 0)], k)
                 for k, v in batch.items()}

        def micro(carry, xs):
            g_acc, loss_acc = carry
            i, kk = xs
            mb = {k: lax.dynamic_slice_in_dim(
                v, i * sizes[k], sizes[k], axis=axes.get(k, 0))
                for k, v in batch.items()}
            (loss, aux), g = vg_fn(params, mb, kk)
            return (jax.tree.map(jnp.add, g_acc, g),
                    loss_acc + loss), aux

        (grads, loss_sum), aux_all = lax.scan(
            micro, (g0, jnp.float32(0.0)),
            (jnp.arange(n_micro, dtype=jnp.int32), keys))
        return grads, loss_sum, aux_all

    def split(leaf, axis):
        if n_micro == 1:
            return leaf[None]
        b = check_div(leaf.shape[axis])
        return jnp.moveaxis(
            leaf.reshape(leaf.shape[:axis] + (n_micro, b)
                         + leaf.shape[axis + 1:]), axis, 0)

    if is_dict:
        stacked = {k: split(v, axes.get(k, 0)) for k, v in batch.items()}
    else:
        stacked = jax.tree.map(lambda l: split(l, 0), batch)

    def micro(carry, xs):
        g_acc, loss_acc = carry
        mb, kk = xs
        (loss, aux), g = vg_fn(params, mb, kk)
        return (jax.tree.map(jnp.add, g_acc, g),
                loss_acc + loss), aux

    (grads, loss_sum), aux_all = lax.scan(
        micro, (g0, jnp.float32(0.0)), (stacked, keys))
    return grads, loss_sum, aux_all


def build_fused_step(grad_fn, cfg: "SolverConfig", n_accum: int, gm: int, *,
                     lr_mults=None, decay_mults=None,
                     batch_axes: dict | None = None, jit: bool = True):
    """ONE jitted program: split/stack a step's batches into n_accum·gm
    microbatches, lax.scan the gradient accumulation, apply ONE solver
    update — the reference's iter_size semantics
    (ref:src/caffe/solver.cpp iter_size; losses average so the update
    equals the big-batch update up to f32 summation order) at the
    fused-schedule throughput measured in PERF.md (wgrad GEMMs stay in the
    good tiling regime, the optimizer runs once).

    Module-level so scripts/bench_engine_train.py times EXACTLY the
    program `vvtpu train` runs. Returns
    fstep(params, state, batches_tuple, key) -> (params, state, metrics)
    where batches_tuple holds n_accum batch dicts."""
    import jax.numpy as jnp
    n_total = n_accum * gm
    if gm > 1 and batch_axes is None:
        # same contract as parallel.train.make_train_step: a silent axis-0
        # split WITHIN a batch would scramble a role-major layout whose
        # role count happens to divide gm. (iter_size-only accumulation is
        # exempt: concat + equal split on the same axis is the identity —
        # the microbatches are exactly the original step batches.)
        raise ValueError(
            "grad_microbatch requires batch_axes (e.g. {'data': 0} "
            "for batch-leading or {'data': 1} for role-major layouts): "
            "the split axis must be declared, not guessed")
    axes = batch_axes or {}

    def vg_checked(p, mb, kk):
        (loss, aux), g = grad_fn(p, mb, kk)
        if "__carry__" in aux:  # structure known at trace time
            raise ValueError(
                "fused accumulation cannot thread cross-batch LSTM "
                "state — pass fused_accum=False for stateful nets")
        return (loss, aux), g

    def fstep(p, s, batches, key):
        keys = jax.random.split(key, n_total)
        # the n_accum step batches concatenate along each key's batch axis
        # (same shapes — one source), then split into n_total microbatches:
        # order is [step0 micro0..gm-1, step1 micro0..], the old per-batch
        # split order
        full = {k: (jnp.concatenate([b[k] for b in batches],
                                    axis=axes.get(k, 0))
                    if n_accum > 1 else batches[0][k])
                for k in batches[0]}
        grads, loss_sum, aux_all = accumulate_microbatches(
            vg_checked, p, full, axes, n_total, keys)
        grads = jax.tree.map(lambda g: g / n_total, grads)
        p2, s2 = solver_update(cfg, p, grads, s,
                               lr_mults=lr_mults, decay_mults=decay_mults)
        # displayed loss averages over microbatches (== the big-batch
        # mean for equal micro sizes); other net outputs report the
        # LAST microbatch (counts like `violations` must not average).
        # Dict-valued aux entries (the "__sinks__" blob map) take each
        # leaf's last microbatch — the reference's sink files truncate
        # per Forward, so the last sub-batch's write is the one that
        # survives an iter_size step (write_to_file_layer.cpp:42)
        metrics = {"loss": loss_sum / n_total,
                   **{k: (jax.tree.map(lambda a: a[-1], v)
                          if isinstance(v, dict) else v[-1])
                      for k, v in aux_all.items()}}
        if cfg.snapshot_diff:
            metrics["__diff__"] = grads
        return p2, s2, metrics

    return jax.jit(fstep, donate_argnums=(0, 1)) if jit else fstep


def auto_grad_microbatch(batch, batch_axes: dict | None = None) -> int:
    """Large-batch schedule: split so each microbatch carries ~128 batch
    rows (the v5e-measured good wgrad regime — B=256 dip gone, B=1024
    record, PERF.md r3; the round-5 frontier sweep showed 128-row micros
    keep winning through gm=64 at B=8192, so the old ≤8 cap — an artifact
    of B=1024 being the largest batch measured at the time — is gone).
    Power-of-two divisor of EVERY top's batch length; 1 (off) below B=256
    so small-batch runs keep bit-identical trajectories, and 1 when
    batch_axes is None (the split axis must be declared —
    build_fused_step refuses to guess it; see the grad_microbatch
    ValueError there). Measured on v5e — other TPU generations should
    re-run scripts/bench_engine_train.py and override via the solver
    prototxt's `grad_microbatch` extension field."""
    if batch_axes is None:
        return 1
    axes = batch_axes or {}
    # shapes only — no np.asarray: that would device_get every batch leaf
    # (a full D2H copy of the first batch just to read metadata)
    lens = {int(v.shape[axes.get(k, 0)])
            for k, v in batch.items()
            if getattr(v, "ndim", 0) > axes.get(k, 0)}
    if not lens or min(lens) < 256:
        return 1
    gm = 1
    while (all(n % (gm * 2) == 0 for n in lens)
           and min(lens) // (gm * 2) >= 128):
        gm *= 2
    return gm


def train(loss_fn: Callable, params, data: Iterator[dict], cfg: SolverConfig, *,
          lr_mults=None, decay_mults=None,
          eval_fn: Callable | None = None,
          test_data: Iterator[dict] | None = None,
          sink_fn: Callable | None = None,
          train_sink_fn: Callable | None = None,
          resume_state_path: str | None = None,
          hooks: list | None = None,
          param_layer_order: list | None = None,
          caffe_export: Callable | None = None,
          batch_axes: dict | None = None,
          fused_accum: bool = True,
          train_output_weights: dict | None = None,
          test_output_weights: list | None = None,
          initial_carry=None,
          rng=None, jit: bool = True) -> TrainResult:
    """loss_fn(params, batch, rng) -> (loss, aux_dict).
    eval_fn(params, batch) -> dict of scalars; averaged over cfg.test_iter[0]
    batches every cfg.test_interval iterations.
    sink_fn (or a per-test-net list): called with the "__sinks__" entry an
    eval_fn may return (host-sink bottom blobs) after every test batch —
    the engine's file-writing layers (WRITE_TO_FILE / HDF5_OUTPUT /
    RETRIEVAL_STATS stats_output_file) run during TEST forwards in the
    reference (write_to_file_layer.cpp:36-64).
    train_sink_fn: same for the TRAIN net — the reference writes sink
    files on EVERY Forward, train included; the loss_fn signals sink
    bottoms via a "__sinks__" aux entry. Under the fused accumulation
    schedule only the last microbatch's blobs reach it (= the file state
    the reference's truncate-per-Forward writes leave after an iter_size
    step); the host-loop (stateful) path fires per sub-batch.
    hooks: [(interval, fn(params, it))] — called every `interval` iterations
    (the mechanism behind snapshot_vis / debug_info, ref solver.cpp:183-193).
    param_layer_order: param-carrying layer names in NET order — required to
    resume from a reference `.solverstate` (its history blobs are nameless,
    ordered like net_->params()).
    caffe_export: optional fn(it, params_np, state_np) writing the
    reference-format snapshot pair; runs in the snapshot writer thread.
    batch_axes: {batch key → batch axis} for the grad_microbatch split.
    None means undeclared: the auto schedule stays off and an explicit
    grad_microbatch > 1 raises (the split axis is declared, not guessed —
    same contract as parallel.train.make_train_step). {} declares
    batch-leading (axis 0) for every key; time-major sources declare 1.
    iter_size-only accumulation needs no declaration (concat + equal
    split on the same axis is the identity).
    fused_accum: run iter_size / grad_microbatch accumulation as ONE jitted
    lax.scan step (the chip-record schedule, PERF.md) instead of a host loop
    of separate grad calls. Must be False for stateful (cross-batch LSTM
    carry) nets — the driver passes this automatically.
    train_output_weights / test_output_weights: {output blob: loss weight}
    maps (Net.output_loss_weights) — loss-weighted output lines carry the
    reference's ' (* w = x loss)' display suffix
    (ref:src/caffe/solver.cpp:204-214, :306-314)."""
    # private copies: the jitted step donates its param/state buffers, and the
    # caller's arrays must survive the call
    params = jax.tree.map(jax.numpy.array, params)
    state = init_solver_state(cfg, params)
    start_iter = 0
    if resume_state_path:
        if resume_state_path.endswith(".solverstate"):
            # foreign resume: reference snapshot with momentum intact
            # (ref:src/caffe/solver.cpp:419-429)
            from videovector_tpu.solver.checkpoint import restore_solverstate
            if param_layer_order is None:
                raise ValueError(
                    "resuming from a .solverstate needs param_layer_order "
                    "(history blobs are nameless; train through SolverDriver "
                    "or pass the net's param-layer order)")
            params, state = restore_solverstate(resume_state_path, params,
                                                param_layer_order)
        elif resume_state_path.rstrip("/").endswith(".orbax"):
            from videovector_tpu.solver.checkpoint import restore_orbax
            params, state = restore_orbax(resume_state_path)
        else:
            params, state = restore(resume_state_path)
        start_iter = int(state["iter"])
        log.info("Restoring previous solver status from %s (iter %d)",
                 resume_state_path, start_iter)
    if rng is None:
        seed = cfg.random_seed if cfg.random_seed >= 0 else 0
        if getattr(cfg, "dropout_prng", "threefry") != "threefry":
            # typed key with the configured impl (solver `dropout_prng:
            # "rbg"` = hardware-RNG dropout masks, the TPU throughput
            # mode) — fold_in/split preserve the impl, so the whole
            # stochastic-layer stream rides it without any global config
            rng = jax.random.key(seed, impl=cfg.dropout_prng)
        else:
            rng = jax.random.PRNGKey(seed)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def raw_step(p, s, batch, key):
        (loss, aux), grads = grad_fn(p, batch, key)
        from videovector_tpu.solver.solvers import maybe_grad_barrier
        grads = maybe_grad_barrier(grads, batch)
        p2, s2 = solver_update(cfg, p, grads, s,
                               lr_mults=lr_mults, decay_mults=decay_mults)
        metrics = {"loss": loss, **aux}
        if cfg.snapshot_diff:
            # snapshot_diff: expose the raw gradients so snapshots can
            # persist them (ref net ToProto(write_diff), solver.cpp:321-341)
            metrics["__diff__"] = grads
        return p2, s2, metrics

    def raw_accum(p, grads_acc, batch, key):
        # iter_size gradient accumulation: average grads over sub-batches
        (loss, aux), grads = grad_fn(p, batch, key)
        grads_acc = jax.tree.map(lambda a, g: a + g / cfg.iter_size,
                                 grads_acc, grads)
        return grads_acc, {"loss": loss, **aux}

    def raw_apply(p, s, grads_acc):
        return solver_update(cfg, p, grads_acc, s,
                             lr_mults=lr_mults, decay_mults=decay_mults)

    def make_fused_step(n_accum: int, gm: int):
        return build_fused_step(grad_fn, cfg, n_accum, gm,
                                lr_mults=lr_mults, decay_mults=decay_mults,
                                batch_axes=batch_axes, jit=jit)

    if jit:
        step = jax.jit(raw_step, donate_argnums=(0, 1))
        accum = jax.jit(raw_accum, donate_argnums=(1,))
        apply_update = jax.jit(raw_apply, donate_argnums=(0, 1, 2))
    else:
        step, accum, apply_update = raw_step, raw_accum, raw_apply

    result = TrainResult(params, state)

    # normalize to parallel lists (multi-test-net support, ref repeated
    # test_net + per-net test_iter, caffe.proto:86-112)
    eval_fns = eval_fn if isinstance(eval_fn, (list, tuple)) else \
        ([eval_fn] if eval_fn is not None else [])
    test_datas = test_data if isinstance(test_data, (list, tuple)) else \
        ([test_data] if test_data is not None else [])
    sink_fns = sink_fn if isinstance(sink_fn, (list, tuple)) else \
        ([sink_fn] * len(eval_fns))
    eval_steps = [jax.jit(f) if jit else f for f in eval_fns]

    def run_test(p, it):
        if not eval_steps or not test_datas:
            return
        merged: dict[str, float] = {}
        for net_id, (estep, tdata) in enumerate(zip(eval_steps, test_datas)):
            n = cfg.test_iter[net_id] if net_id < len(cfg.test_iter) else 1
            sums: dict[str, np.ndarray] = {}
            t_carry = None  # recurrent state carries across test batches too
            for _ in range(n):
                batch = next(tdata)
                if t_carry is not None:
                    batch = {**batch, "__carry__": t_carry}
                out = dict(estep(p, batch))
                t_carry = out.pop("__carry__", None)
                sblobs = out.pop("__sinks__", None)
                if sblobs is not None and sink_fns[net_id] is not None:
                    sink_fns[net_id](sblobs)
                for k, v in out.items():
                    # every ELEMENT of every output blob accumulates — the
                    # reference's test_score loop (solver.cpp:280-293)
                    arr = np.asarray(v, np.float64).reshape(-1)
                    sums[k] = sums[k] + arr if k in sums else arr
            avg = {k: v / n for k, v in sums.items()}
            log.info("Iteration %d, Testing net (#%d)", it, net_id)
            prefix = "" if len(eval_steps) == 1 else f"net{net_id}/"
            # test_compute_loss prints its own line, NOT an output row
            # (ref solver.cpp:297-300); the history keeps the "loss" key
            tl = avg.pop("loss", None)
            if tl is not None:
                log.info("Test loss: %g", tl[0])
                merged[prefix + "loss"] = float(tl[0])
            wmap = (test_output_weights[net_id]
                    if test_output_weights
                    and net_id < len(test_output_weights) else {}) or {}
            i = 0
            for k in sorted(avg):
                vec = avg[k]
                w = wmap.get(k, 0.0)
                for j, x in enumerate(vec):
                    # one line per element, the blob's name repeated, loss-
                    # weighted outputs suffixed — the reference's report
                    # format (solver.cpp:301-315)
                    suffix = f" (* {w:g} = {w * x:g} loss)" if w else ""
                    log.info("    Test net output #%d: %s = %g%s",
                             i, k, x, suffix)
                    key = k if vec.size == 1 else f"{k}[{j}]"
                    merged[prefix + key] = float(x)
                    i += 1
        result.test_history.append((it, merged))

    it = start_iter
    # cross-batch state: recurrent (LSTM) carry, or the device negative
    # reservoir buffer — whatever pytree the loss_fn threads through the
    # "__carry__" aux key. initial_carry seeds it (e.g. the reservoir's
    # reference-semantics initial fill)
    carry = initial_carry
    last_grads = None  # most recent gradients (kept when snapshot_diff)
    fused_plan = None   # (iter_size, grad_microbatch) once shapes are known
    fused_step = None
    # the reference's Solve() banner (ref:src/caffe/solver.cpp:161) — also
    # the elapsed-seconds anchor for log tooling (tools/extra/
    # extract_seconds.py looks for "Solving")
    log.info("Solving")

    # background writer: the loop pays only the D2H fetch; serialization +
    # disk IO overlap the following training steps
    snapshotter = AsyncSnapshotter()

    def _snap(at_iter):
        p_np, s_np = jax.device_get(params), jax.device_get(state)
        extra = ((lambda: caffe_export(at_iter, p_np, s_np))
                 if caffe_export is not None else None)
        snapshotter.submit(cfg.snapshot_prefix or "snapshot", at_iter,
                           p_np, s_np,
                           diffs=jax.device_get(last_grads)
                           if last_grads is not None else None,
                           extra=extra)
    try:
        while it < cfg.max_iter:
            if cfg.snapshot and it > start_iter and it % cfg.snapshot == 0:
                _snap(it)
            if cfg.test_interval and it % cfg.test_interval == 0 and (
                    it > start_iter or cfg.test_initialization):
                run_test(params, it)
            for interval, hook in (hooks or ()):
                if interval and it % interval == 0:
                    hook(params, it)

            key = jax.random.fold_in(rng, it)
            if cfg.iter_size > 1 and not fused_accum:
                # host-loop accumulation: one jitted grad call per
                # sub-batch. Kept ONLY for stateful nets (the LSTM carry
                # must thread between sub-batches); stateless nets take
                # the fused scan below
                grads_acc = jax.tree.map(jax.numpy.zeros_like, params)
                for sub in range(cfg.iter_size):
                    batch = next(data)
                    if carry is not None:
                        batch = {**batch, "__carry__": carry}
                    grads_acc, metrics = accum(
                        params, grads_acc, batch,
                        jax.random.fold_in(key, sub))
                    carry = metrics.pop("__carry__", None)
                    sblobs = metrics.pop("__sinks__", None)
                    if sblobs is not None and train_sink_fn is not None:
                        train_sink_fn(sblobs)  # per sub-batch Forward
                if cfg.snapshot_diff:
                    # host copy: apply_update donates the grads_acc buffers
                    last_grads = jax.device_get(grads_acc)
                params, state = apply_update(params, state, grads_acc)
            else:
                batch = next(data)
                if fused_accum and fused_plan is None:
                    n_accum = max(1, cfg.iter_size)
                    gm_cfg = getattr(cfg, "grad_microbatch", -1)
                    gm = (auto_grad_microbatch(batch, batch_axes)
                          if gm_cfg < 0 else max(1, gm_cfg))
                    fused_plan = (n_accum, gm)
                    if n_accum * gm > 1:
                        log.info(
                            "Fused accumulation schedule: iter_size=%d x "
                            "grad_microbatch=%d (one scanned XLA program)",
                            n_accum, gm)
                        fused_step = make_fused_step(n_accum, gm)
                if fused_step is not None:
                    batches = (batch,) + tuple(
                        next(data) for _ in range(fused_plan[0] - 1))
                    params, state, metrics = fused_step(
                        params, state, batches, key)
                else:
                    if carry is not None:
                        batch = {**batch, "__carry__": carry}
                    params, state, metrics = step(params, state, batch, key)
                # recurrent cross-batch state (ref lstm_layer.cpp:171-173):
                # stateful nets return the updated carry through aux
                carry = metrics.pop("__carry__", None)
                last_grads = metrics.pop("__diff__", last_grads)
                sblobs = metrics.pop("__sinks__", None)
                if sblobs is not None and train_sink_fn is not None:
                    train_sink_fn(sblobs)

            if cfg.display and it % cfg.display == 0:
                # an output blob named "loss" (shape (1,) after the ravel)
                # may shadow the scalar step loss under this key
                loss = float(np.asarray(metrics["loss"]).reshape(-1)[0])
                log.info("Iteration %d, loss = %g", it, loss)
                entry: dict[str, float] = {"loss": loss}
                i = 1
                for k in sorted(metrics):
                    if k == "loss":
                        continue
                    # one line per ELEMENT of each output blob, name
                    # repeated, loss-weighted outputs suffixed
                    # (ref solver.cpp:195-217 score_index loop)
                    w = (train_output_weights or {}).get(k, 0.0)
                    vec = np.asarray(metrics[k], np.float64).reshape(-1)
                    for j, x in enumerate(vec):
                        suffix = f" (* {w:g} = {w * x:g} loss)" if w else ""
                        log.info("    Train net output #%d: %s = %g%s",
                                 i, k, x, suffix)
                        entry[k if vec.size == 1 else f"{k}[{j}]"] = float(x)
                        i += 1
                # lr logs AFTER the output lines — the reference prints it
                # from ComputeUpdateValue (solver.cpp:491-494), which runs
                # after Solve's loss/output display
                log.info("Iteration %d, lr = %g",
                         it, float(learning_rate(cfg, it)))
                result.metrics_history.append((it, entry))
            it += 1
    except KeyboardInterrupt:
        # emergency snapshot on interrupt (the reference aborts and loses
        # progress since the last scheduled snapshot)
        if cfg.snapshot_prefix:
            log.info("Interrupted at iteration %d — writing snapshot", it)
            _snap(it)
        snapshotter.wait()
        raise

    if cfg.snapshot_after_train and cfg.snapshot_prefix:
        _snap(it)
    # the reference's post-loop passes (ref:src/caffe/solver.cpp:225-238):
    # a display-gated EXTRA train forward (params already updated max_iter
    # times — forward only, to print the final loss; it consumes one data
    # batch exactly like the reference's Net::Forward does) and a final
    # TestAll gated on max_iter % test_interval — NOT unconditional
    if cfg.display and it % cfg.display == 0:
        try:
            batch = next(data)
        except StopIteration:
            batch = None  # finite test iterator — the reference's data
            # layers are infinite, so this path has no reference twin
        if batch is not None:
            if carry is not None:
                batch = {**batch, "__carry__": carry}
            fwd = (lambda p, b, k: loss_fn(p, b, k)[0])
            if jit:
                fwd = jax.jit(fwd)
            final_loss = float(np.asarray(
                fwd(params, batch, jax.random.fold_in(rng, it))).reshape(-1)[0])
            log.info("Iteration %d, loss = %g", it, final_loss)
    if cfg.test_interval and it % cfg.test_interval == 0:
        run_test(params, it)
    snapshotter.wait()  # all writes durable before train() returns
    result.params = params
    result.state = state
    result.final_carry = carry
    return result
