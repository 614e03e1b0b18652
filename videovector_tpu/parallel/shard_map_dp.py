"""Explicit-collective data parallelism via shard_map — with a
controllable gradient-allreduce wire format.

The default DP path (parallel/train.py) lets GSPMD insert the gradient
psum, which is always in the gradient's dtype (f32). At flagship scale the
f32 all-reduce moves 2·(n−1)/n × 67 MB/step — the ICI roofline in PERF.md
shows that dominating the 1.3 ms step on v5e-8. This module is the
hand-scheduled twin where the collective is explicit and can run in
bfloat16 (half the wire bytes): grads are cast bf16 → psum → f32 before
the update. Momentum and master weights stay f32, so the only change is
~8-bit-mantissa rounding of the per-step gradient — bounded and tested
against the f32 path.

ref context: the reference has no distributed training at all
(SURVEY §2.6); this is new TPU-native capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from videovector_tpu.solver import SolverConfig, solver_update


def make_dp_train_step(loss_fn, solver_cfg: SolverConfig, mesh: Mesh, *,
                       psum_dtype=None, lr_mults=None, decay_mults=None,
                       distinct_dropout_per_shard: bool = True):
    """Build step(params, state, batch, rng) -> (params, state, metrics)
    where the gradient all-reduce is an explicit lax.pmean over "data",
    optionally in `psum_dtype` (e.g. jnp.bfloat16) on the wire.

    params/state replicated; batch["data"] sharded on axis 0 over "data".
    loss_fn(params, batch, rng) -> (loss, aux_dict of scalars).
    """
    wire = jnp.dtype(psum_dtype) if psum_dtype is not None else None

    def local_step(params, state, data, rng):
        if distinct_dropout_per_shard:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def lf(p):
            return loss_fn(p, {"data": data}, rng)

        (loss, aux), g = jax.value_and_grad(lf, has_aux=True)(params)

        def allreduce(x):
            orig = x.dtype
            if wire is not None:
                x = x.astype(wire)
            return jax.lax.pmean(x, "data").astype(orig)

        g = jax.tree.map(allreduce, g)
        p2, s2 = solver_update(solver_cfg, params, g, state,
                               lr_mults=lr_mults, decay_mults=decay_mults)
        loss = jax.lax.pmean(loss, "data")
        aux = {k: jax.lax.pmean(jnp.asarray(v, jnp.float32), "data")
               for k, v in aux.items()}
        return p2, s2, loss, aux

    def step(params, state, batch, rng):
        p2, s2, loss, aux = shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P("data"), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)(params, state, batch["data"], rng)
        return p2, s2, {"loss": loss, **aux}

    return jax.jit(step, donate_argnums=(0, 1))


def place_dp(params, state, batch, mesh: Mesh):
    """Placement helper: params/state replicated, batch sharded on axis 0."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return (jax.device_put(params, rep), jax.device_put(state, rep),
            {k: jax.device_put(v, shard) for k, v in batch.items()})
