"""Optimizers with Caffe-exact semantics.

ref:src/caffe/solver.cpp — SGDSolver (:441-576), NesterovSolver (:599-711),
AdaGradSolver (:714-844). The reference mutates per-param diff/history blobs
in a host loop; here each update is a pure pytree transform jitted together
with the gradient computation, so the whole train step is one XLA program.

Update rules (per-leaf; d = grad + local_decay·reg(w), local_rate = rate·lr_mult,
local_decay = weight_decay·decay_mult; reg = identity for L2, sign for L1):

  SGD:       h ← momentum·h + local_rate·d ;  w ← w − h
  Nesterov:  h₀ = h ; h ← momentum·h + local_rate·d
             w ← w − ((1+momentum)·h − momentum·h₀)
  AdaGrad:   h ← h + d² ;  w ← w − local_rate·d / (√h + delta)

LR policies (ref GetLearningRate :441-460): fixed, step, exp, inv.

Note momentum multiplies the *lr-scaled* gradient (Caffe convention), not the
raw gradient — parity tests in tests/test_solver.py check closed-form
trajectories.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class SolverConfig:
    """Mirror of SolverParameter (ref:src/caffe/proto/caffe.proto:75-173),
    native defaults matching proto defaults."""
    solver_type: str = "SGD"            # SGD | NESTEROV | ADAGRAD
    base_lr: float = 0.01
    lr_policy: str = "fixed"            # fixed | step | exp | inv
    gamma: float = 0.0001
    power: float = 0.75
    stepsize: int = 100000
    momentum: float = 0.0
    weight_decay: float = 0.0
    regularization_type: str = "L2"     # L2 | L1
    delta: float = 1e-8                 # AdaGrad
    max_iter: int = 0
    iter_size: int = 1
    # extension: on-device microbatch split of each step's batch (the
    # fused large-batch schedule, PERF.md). -1 = auto (~128 batch rows per
    # microbatch for B >= 256, off below), 0/1 = off, N = explicit
    grad_microbatch: int = -1
    display: int = 0
    test_interval: int = 0
    test_iter: tuple = ()
    snapshot: int = 0
    snapshot_prefix: str = ""
    snapshot_after_train: bool = True
    snapshot_diff: bool = False      # persist gradients in snapshots (ref caffe.proto:134-167, solver.cpp:321-341)
    test_initialization: bool = True    # test at iter 0 (ref caffe.proto:119)
    test_compute_loss: bool = False     # include test-net loss (ref :116)
    random_seed: int = -1
    # extension: "vv" (native npz pair) or "caffe" (ALSO write the
    # reference-consumable .caffemodel/.solverstate pair each snapshot)
    snapshot_format: str = "vv"
    # extension: PRNG implementation for the per-iteration key that feeds
    # the stochastic layers (dropout masks, DummyData refills). "threefry"
    # = jax's default counter-based stream (reference-numerics default —
    # existing trajectories stay bit-identical); "rbg" = the hardware RNG,
    # ~4x cheaper mask generation on TPU (threefry masks measured at ~25%
    # of the flagship B=128 step, PERF.md). Scoped: the key is a TYPED key
    # (jax.random.key(impl=...)) built inside train(), never a process-wide
    # jax.config flip — importing/running a solver never changes other
    # code's PRNG streams. Dropout needs statistical quality only, not
    # counter-based reproducibility across jax versions.
    dropout_prng: str = "threefry"
    extras: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.solver_type == "ADAGRAD" and self.momentum:
            # the update rule has no momentum term — a nonzero value would
            # be silently ignored (ref AdaGradSolver constructor_sanity_
            # check, include/caffe/solver.hpp:120-123)
            raise ValueError("Momentum cannot be used with AdaGrad.")
        if self.dropout_prng not in ("threefry", "rbg"):
            raise ValueError(
                f"dropout_prng must be 'threefry' or 'rbg', "
                f"got {self.dropout_prng!r}")

    @classmethod
    def from_message(cls, msg) -> "SolverConfig":
        """Build from a parsed solver prototxt Message."""
        type_map = {0: "SGD", 1: "NESTEROV", 2: "ADAGRAD",
                    "SGD": "SGD", "NESTEROV": "NESTEROV", "ADAGRAD": "ADAGRAD"}
        kw: dict[str, Any] = {}
        for fname, key in [
            ("base_lr", "base_lr"), ("lr_policy", "lr_policy"),
            ("gamma", "gamma"), ("power", "power"), ("stepsize", "stepsize"),
            ("momentum", "momentum"), ("weight_decay", "weight_decay"),
            ("regularization_type", "regularization_type"), ("delta", "delta"),
            ("max_iter", "max_iter"), ("iter_size", "iter_size"),
            ("grad_microbatch", "grad_microbatch"),
            ("display", "display"), ("test_interval", "test_interval"),
            ("snapshot", "snapshot"), ("snapshot_prefix", "snapshot_prefix"),
            ("snapshot_after_train", "snapshot_after_train"),
            ("snapshot_diff", "snapshot_diff"),
            ("test_initialization", "test_initialization"),
            ("test_compute_loss", "test_compute_loss"),
            ("random_seed", "random_seed"),
            ("snapshot_format", "snapshot_format"),
            ("dropout_prng", "dropout_prng"),
        ]:
            if msg.has(fname):
                kw[key] = msg.get(fname)
        if msg.has("solver_type"):
            kw["solver_type"] = type_map[msg.get("solver_type")]
        if msg.has("test_iter"):
            kw["test_iter"] = tuple(int(v) for v in msg.get_list("test_iter"))
        cfg = cls(**kw)
        cfg.extras = {k: msg.get(k) for k in ("net", "train_net", "test_net",
                                              "solver_mode", "device_id")
                      if msg.has(k)}
        return cfg


def maybe_grad_barrier(grads, batch, opt_barrier="auto"):
    """Optionally split the backward from the optimizer update with
    lax.optimization_barrier.

    By default XLA output-fuses the weight-gradient GEMM with the momentum/
    decay update. Measured on v5e (PERF.md round 2): the fusion wins at
    small batch but mis-schedules at large batch — the fused wgrad runs at
    79 TFLOP/s vs 186 for the forward GEMM. Barrier'ing the grads forces a
    separate optimizer pass: B=512 f32 6.27 -> 5.01 ms/step (+25%), B=256
    2.87 -> 2.73 ms, while B=128 regresses 1.27 -> 1.97 ms. "auto" applies
    the barrier when any batch leaf carries >= 3840 rows (elements / last
    dim — layout-agnostic: B=256 x 15 roles in either batch- or role-major
    order crosses it, B=128 does not; static shapes, resolved at trace
    time).

    The 3840-row threshold encodes THIS chip's (v5e) fusion behavior.
    "auto" therefore only fires on TPU backends — CPU/GPU XLA schedules
    differently and the barrier would be an unvalidated guess there. On
    other TPU generations re-measure with scripts/diag_batch_cliff.py and
    pass opt_barrier=True/False explicitly if the threshold moved."""
    import numpy as np
    import jax
    from jax import lax
    if opt_barrier == "auto":
        if jax.default_backend() not in ("tpu", "axon"):
            opt_barrier = False
        else:
            def rows(leaf):
                shape = getattr(leaf, "shape", ())
                return int(np.prod(shape[:-1])) if len(shape) >= 2 else 0
            opt_barrier = any(rows(l) >= 3840
                              for l in jax.tree.leaves(batch))
    return lax.optimization_barrier(grads) if opt_barrier else grads


def learning_rate(cfg: SolverConfig, it):
    """ref:src/caffe/solver.cpp:441-460. `it` may be traced (jnp int)."""
    itf = jnp.asarray(it, jnp.float32)
    if cfg.lr_policy == "fixed":
        return jnp.float32(cfg.base_lr)
    if cfg.lr_policy == "step":
        current_step = jnp.floor(itf / cfg.stepsize)
        return cfg.base_lr * jnp.power(cfg.gamma, current_step)
    if cfg.lr_policy == "exp":
        return cfg.base_lr * jnp.power(cfg.gamma, itf)
    if cfg.lr_policy == "inv":
        return cfg.base_lr * jnp.power(1.0 + cfg.gamma * itf, -cfg.power)
    raise ValueError(f"Unknown lr policy {cfg.lr_policy!r}")


def init_solver_state(cfg: SolverConfig, params):
    """History pytree (momentum / accumulated square grads), zeros like params
    (ref PreSolve :464-482)."""
    return {"iter": jnp.int32(0),
            "history": jax.tree.map(jnp.zeros_like, params)}


def _decayed_grad(w, g, local_decay, reg_type):
    if reg_type == "L2":
        return g + local_decay * w
    if reg_type == "L1":
        return g + local_decay * jnp.sign(w)
    raise ValueError(f"Unknown regularization type {reg_type!r}")


def solver_update(cfg: SolverConfig, params, grads, state, *,
                  lr_mults=None, decay_mults=None):
    """One optimizer step. lr_mults/decay_mults: optional pytrees (same
    structure as params) of scalars; default 1.0 (ref blobs_lr/weight_decay
    multipliers). Returns (new_params, new_state)."""
    it = state["iter"]
    rate = learning_rate(cfg, it)
    momentum = cfg.momentum
    wd = cfg.weight_decay
    reg = cfg.regularization_type
    ones = jax.tree.map(lambda _: 1.0, params)
    lr_mults = lr_mults if lr_mults is not None else ones
    decay_mults = decay_mults if decay_mults is not None else ones

    def leaf_update(w, g, h, lrm, dm):
        local_rate = rate * lrm
        local_decay = wd * dm
        d = _decayed_grad(w, g, local_decay, reg)
        if cfg.solver_type == "SGD":
            h_new = momentum * h + local_rate * d
            return w - h_new, h_new
        if cfg.solver_type == "NESTEROV":
            h_new = momentum * h + local_rate * d
            step = (1.0 + momentum) * h_new - momentum * h
            return w - step, h_new
        if cfg.solver_type == "ADAGRAD":
            h_new = h + d * d
            step = local_rate * d / (jnp.sqrt(h_new) + cfg.delta)
            return w - step, h_new
        raise ValueError(f"Unknown solver type {cfg.solver_type!r}")

    flat_w, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_h = treedef.flatten_up_to(state["history"])
    flat_lr = treedef.flatten_up_to(lr_mults)
    flat_dm = treedef.flatten_up_to(decay_mults)
    new_w, new_h = [], []
    for w, g, h, lrm, dm in zip(flat_w, flat_g, flat_h, flat_lr, flat_dm):
        wn, hn = leaf_update(w, g, h, lrm, dm)
        new_w.append(wn)
        new_h.append(hn)
    return (jax.tree.unflatten(treedef, new_w),
            {"iter": it + 1, "history": jax.tree.unflatten(treedef, new_h)})
