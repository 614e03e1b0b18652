"""Explicit-collective tensor parallelism via shard_map.

The default multi-chip path (parallel/train.py) annotates shardings and lets
GSPMD insert collectives. This module is the hand-scheduled alternative for
the flagship tower — useful when you want to SEE and control every collective
(and as the template for custom overlap schedules):

  tower weight (D, E) column-sharded over "model": each chip computes its
  E/m embedding columns locally — NO communication in the GEMM itself.
  The L2 normalize needs the full-row squared sum: one psum of the per-chip
  partial Σx² over "model" (8 bytes/row — the minimal possible collective).
  Scores s = Σ_e ctx·tgt likewise psum over "model".

Total per-step TP communication: 3 scalars per row (ctx/tgt/neg partial
sums) — rides ICI, overlaps with the next row block.

Data parallelism composes on the outer "data" axis: gradients are averaged
with one psum over "data" inside the same shard_map.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from videovector_tpu.ops.losses import max_margin_loss


def make_tp_loss_fn(cfg, mesh: Mesh):
    """Build loss(params, batch, rng) computed under shard_map with explicit
    psum collectives. params["tower"]["w"]: (D, E) sharded P(None, "model");
    b: (E,) sharded P("model"); batch["data"]: (B, R, D) sharded P("data").
    Returns (loss, aux) replicated."""
    n_ctx = cfg.num_context

    def local_loss(w, b, data, rng):
        # w: (D, E/m) local shard; data: (B/d, R, D) local shard
        bsz, roles, dim = data.shape
        h = jnp.dot(data.reshape(bsz * roles, dim).astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b
        h = jnp.maximum(h, 0.0)
        if cfg.dropout_rate > 0 and rng is not None:
            # same mask on every model shard row-block is NOT needed — the
            # shards hold disjoint embedding columns, so independent masks
            # are exactly elementwise dropout on the full matrix
            keep = 1.0 - cfg.dropout_rate
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, jax.lax.axis_index("model")),
                keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        h = h.reshape(bsz, roles, -1)
        tgt = h[:, 0]
        ctx = jnp.mean(h[:, 1:1 + n_ctx], axis=1)
        negs = h[:, 1 + n_ctx:]

        # --- explicit collectives: full-row norms & dots over "model" ---
        ctx_sq = jax.lax.psum(jnp.sum(ctx * ctx, -1), "model")
        tgt_sq = jax.lax.psum(jnp.sum(tgt * tgt, -1), "model")
        neg_sq = jax.lax.psum(jnp.sum(negs * negs, -1), "model")
        ctx_tgt = jax.lax.psum(jnp.sum(ctx * tgt, -1), "model")
        ctx_neg = jax.lax.psum(jnp.einsum("bnd,bd->bn", negs, ctx), "model")

        eps = 1e-10
        denom_t = (jnp.sqrt(jnp.where(ctx_sq > 0, ctx_sq, 1.0))
                   * jnp.sqrt(jnp.where(tgt_sq > 0, tgt_sq, 1.0)))
        s_true = jnp.where((ctx_sq > 0) & (tgt_sq > 0),
                           ctx_tgt / (denom_t + eps), 0.0)
        denom_n = (jnp.sqrt(jnp.where(ctx_sq > 0, ctx_sq, 1.0))[:, None]
                   * jnp.sqrt(jnp.where(neg_sq > 0, neg_sq, 1.0)))
        s_neg = jnp.where((ctx_sq[:, None] > 0) & (neg_sq > 0),
                          ctx_neg / (denom_n + eps), 0.0)

        loss, violations = max_margin_loss(
            jnp.broadcast_to(s_true[:, None], s_neg.shape), s_neg,
            margin=cfg.margin, norm=cfg.norm)
        # average loss over the data axis (each shard saw B/d items)
        loss = jax.lax.pmean(loss, "data")
        violations = jax.lax.psum(violations, "data")
        return loss, violations

    sharded = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(None, "model"), P("model"), P("data", None, None), P()),
        out_specs=(P(), P()))

    def loss_fn(params, batch, rng):
        loss, violations = sharded(params["tower"]["w"], params["tower"]["b"],
                                   batch["data"], rng)
        return loss, {"violations": violations}

    return loss_fn


def place_tp_params(params, mesh: Mesh):
    w = jax.device_put(params["tower"]["w"], NamedSharding(mesh, P(None, "model")))
    b = jax.device_put(params["tower"]["b"], NamedSharding(mesh, P("model")))
    return {"tower": {"w": w, "b": b}}
