"""Sharded train/eval steps.

One jitted XLA program per step: forward + backward + Caffe-exact optimizer
update, SPMD over the mesh. Sharding layout:

- batch `data` blob: P("data", None, ...) — each device computes its slice's
  gradients; XLA inserts the psum all-reduce over ICI (the new capability the
  reference never had, SURVEY.md §2.6).
- tower weight (D, E): P(None, "model") — column-parallel; each model shard
  computes E/m embedding columns; the L2-normalize triggers a psum over
  "model" which GSPMD derives from the annotations.
- solver history: sharded like its param.

The host never sees activations; only scalar loss/aux leave the device.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videovector_tpu.solver import SolverConfig, solver_update
from videovector_tpu.solver.solvers import maybe_grad_barrier


def _param_pspec(path_leaf_shape, model_axis: bool) -> P:
    """Default param layout: 2-D mats column-sharded on "model" when enabled,
    everything else replicated."""
    if model_axis and len(path_leaf_shape) == 2:
        return P(None, "model")
    return P()


def shard_params(params, mesh: Mesh, *, model_axis: bool = False):
    """Place params on the mesh (replicated over "data", optionally
    column-sharded over "model")."""
    def place(leaf):
        spec = _param_pspec(leaf.shape, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree.map(place, params)


def shard_batch(batch, mesh: Mesh, axes: dict | None = None):
    """Batch-shard every leaf along its batch axis (default: leading).
    `axes` maps top-level dict keys to the axis to split — time-major
    sources (tracking layers emit (T, B, ...)) declare axis 1 via their
    `batch_axes()`."""
    def place_at(leaf, axis):
        spec_dims = [None] * leaf.ndim
        spec_dims[axis] = "data"
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec_dims)))

    if axes and isinstance(batch, dict):
        return {k: jax.tree.map(
                    lambda leaf, a=axes.get(k, 0): place_at(leaf, a), v)
                for k, v in batch.items()}
    return jax.tree.map(lambda leaf: place_at(leaf, 0), batch)


def make_train_step(loss_fn: Callable, solver_cfg: SolverConfig, mesh: Mesh, *,
                    lr_mults=None, decay_mults=None, donate: bool = True,
                    opt_barrier="auto", grad_microbatch: int = 0,
                    batch_axes=None):
    """Build `step(params, state, batch, rng) -> (params, state, metrics)`.

    loss_fn(params, batch, rng) -> (loss, aux_dict). Gradient all-reduce over
    the "data" axis is implicit: the batch is sharded, params are replicated,
    so XLA emits the psum during backward.

    grad_microbatch > 0 splits the per-step batch into that many
    microbatches, accumulates gradients over a lax.scan, and applies ONE
    solver update — exactly the reference's iter_size accumulation
    (ref:src/caffe/solver.cpp iter_size; losses average so the update
    equals the big-batch update up to f32 summation order). This is also
    the large-batch throughput schedule on v5e: the per-microbatch wgrad
    GEMMs stay in the good tiling regime and the optimizer runs once —
    measured B=512 f32 5.00 → 4.17 ms/step (+20%), and the B=256 dip
    disappears (see PERF.md round 3). batch_axes maps batch dict keys to
    their batch axis for the split — REQUIRED for dict batches when
    grad_microbatch is set: a silent default of axis 0 would split a
    role-major (R, B, ...) batch on the role axis whenever R happens to be
    divisible, scrambling roles across microbatches with no error. Pass
    {key: 0} explicitly for batch-leading layouts.

    opt_barrier applies only on the NON-microbatched path (deliberate):
    the accumulation scan already separates the wgrad GEMMs from the
    single optimizer application — the exact mis-fusion the barrier
    exists to break (PERF.md round 3: grad_microbatch beat the barrier
    at every batch size, which is why it superseded it).
    """
    def step(params, state, batch, rng):
        n_micro = grad_microbatch
        if n_micro and n_micro > 1:
            if isinstance(batch, dict) and batch_axes is None:
                raise ValueError(
                    "grad_microbatch requires batch_axes (e.g. {'data': 0} "
                    "for batch-leading or {'data': 1} for role-major "
                    "layouts): the split axis must be declared, not guessed")

            # shared accumulation core (solver.train): reshape-stack split
            # for leading batch axes, index + dynamic-slice for role-major
            # layouts (no transposed batch copy) — see its docstring for
            # the GSPMD-mesh caveat on sliced sharded axes
            from videovector_tpu.solver.train import accumulate_microbatches
            keys = jax.random.split(rng, n_micro)
            grads, loss_sum, aux_all = accumulate_microbatches(
                jax.value_and_grad(loss_fn, has_aux=True), params, batch,
                (batch_axes or {}) if isinstance(batch, dict) else {},
                n_micro, keys)
            grads = jax.tree.map(lambda g: g / n_micro, grads)
            # displayed loss averages over microbatches (== the big-batch
            # mean for equal micro sizes); other net outputs report the
            # LAST microbatch, the reference's iter_size display semantics
            # (counts like `violations` must not be averaged)
            loss = loss_sum / n_micro
            aux = jax.tree.map(lambda a: a[-1], aux_all)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng)
            grads = maybe_grad_barrier(grads, batch, opt_barrier)
        params2, state2 = solver_update(solver_cfg, params, grads, state,
                                        lr_mults=lr_mults,
                                        decay_mults=decay_mults)
        metrics = {"loss": loss, **aux}
        return params2, state2, metrics

    donate_argnums = (0, 1) if donate else ()
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        donate_argnums=donate_argnums,
        out_shardings=(None, None, replicated),
    )


def make_eval_step(eval_fn: Callable, mesh: Mesh):
    """jit an eval function with replicated scalar outputs."""
    replicated = NamedSharding(mesh, P())
    return jax.jit(eval_fn, out_shardings=replicated)
