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

from videovector_tpu.solver.checkpoint import (
    AsyncSnapshotter, restore, snapshot,
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


def train(loss_fn: Callable, params, data: Iterator[dict], cfg: SolverConfig, *,
          lr_mults=None, decay_mults=None,
          eval_fn: Callable | None = None,
          test_data: Iterator[dict] | None = None,
          resume_state_path: str | None = None,
          hooks: list | None = None,
          param_layer_order: list | None = None,
          caffe_export: Callable | None = None,
          rng=None, jit: bool = True) -> TrainResult:
    """loss_fn(params, batch, rng) -> (loss, aux_dict).
    eval_fn(params, batch) -> dict of scalars; averaged over cfg.test_iter[0]
    batches every cfg.test_interval iterations.
    hooks: [(interval, fn(params, it))] — called every `interval` iterations
    (the mechanism behind snapshot_vis / debug_info, ref solver.cpp:183-193).
    param_layer_order: param-carrying layer names in NET order — required to
    resume from a reference `.solverstate` (its history blobs are nameless,
    ordered like net_->params()).
    caffe_export: optional fn(it, params_np, state_np) writing the
    reference-format snapshot pair; runs in the snapshot writer thread."""
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
        else:
            params, state = restore(resume_state_path)
        start_iter = int(state["iter"])
        log.info("Restoring previous solver status from %s (iter %d)",
                 resume_state_path, start_iter)
    if rng is None:
        rng = jax.random.PRNGKey(cfg.random_seed if cfg.random_seed >= 0 else 0)

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
    eval_steps = [jax.jit(f) if jit else f for f in eval_fns]

    def run_test(p, it):
        if not eval_steps or not test_datas:
            return
        merged: dict[str, float] = {}
        for net_id, (estep, tdata) in enumerate(zip(eval_steps, test_datas)):
            n = cfg.test_iter[net_id] if net_id < len(cfg.test_iter) else 1
            sums: dict[str, float] = {}
            t_carry = None  # recurrent state carries across test batches too
            for _ in range(n):
                batch = next(tdata)
                if t_carry is not None:
                    batch = {**batch, "__carry__": t_carry}
                out = dict(estep(p, batch))
                t_carry = out.pop("__carry__", None)
                for k, v in out.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            avg = {k: v / n for k, v in sums.items()}
            log.info("Iteration %d, Testing net (#%d)", it, net_id)
            for i, (k, v) in enumerate(sorted(avg.items())):
                log.info("    Test net output #%d: %s = %g", i, k, v)
            prefix = "" if len(eval_steps) == 1 else f"net{net_id}/"
            merged.update({prefix + k: v for k, v in avg.items()})
        result.test_history.append((it, merged))

    it = start_iter
    carry = None  # cross-batch recurrent state (stateful nets only)
    last_grads = None  # most recent gradients (kept when snapshot_diff)
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
            if cfg.iter_size > 1:
                grads_acc = jax.tree.map(jax.numpy.zeros_like, params)
                for sub in range(cfg.iter_size):
                    batch = next(data)
                    if carry is not None:
                        batch = {**batch, "__carry__": carry}
                    grads_acc, metrics = accum(
                        params, grads_acc, batch,
                        jax.random.fold_in(key, sub))
                    carry = metrics.pop("__carry__", None)
                if cfg.snapshot_diff:
                    # host copy: apply_update donates the grads_acc buffers
                    last_grads = jax.device_get(grads_acc)
                params, state = apply_update(params, state, grads_acc)
            else:
                batch = next(data)
                if carry is not None:
                    batch = {**batch, "__carry__": carry}
                params, state, metrics = step(params, state, batch, key)
                # recurrent cross-batch state (ref lstm_layer.cpp:171-173):
                # stateful nets return the updated carry through aux
                carry = metrics.pop("__carry__", None)
                last_grads = metrics.pop("__diff__", last_grads)

            if cfg.display and it % cfg.display == 0:
                loss = float(metrics["loss"])
                lr = float(learning_rate(cfg, it))
                log.info("Iteration %d, lr = %g", it, lr)
                log.info("Iteration %d, loss = %g", it, loss)
                for i, (k, v) in enumerate(sorted(metrics.items())):
                    if k == "loss":
                        continue
                    log.info("    Train net output #%d: %s = %g",
                             i, k, float(v))
                result.metrics_history.append(
                    (it, {k: float(v) for k, v in metrics.items()}))
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
    if cfg.test_interval:
        run_test(params, it)
    snapshotter.wait()  # all writes durable before train() returns
    result.params = params
    result.state = state
    return result
