"""Pipeline parallelism for the seq2seq (LstmEncDec) workload.

The reference's trajectory nets are encoder→decoder chains
(ref:src/caffe/layers/lstm_enc_dec_layer.cpp:21-207) — a natural 2-stage
pipeline: stage 0 (encoder) and stage 1 (decoder + readout + loss) live on
different devices along the mesh "model" axis. The batch splits into M
microbatches; while stage 1 decodes microbatch i, stage 0 is already
encoding microbatch i+1 (GPipe schedule, one bubble tick at each end). The
encoder's final cell — the only inter-stage tensor — crosses stages with
`lax.ppermute` over ICI.

Composes with data parallelism: shard_map over a (data, model) mesh, batch
sharded over "data", the 2-stage pipeline over "model". Everything is
differentiable (ppermute transposes to the reverse permute), so the same
schedule runs training.

This is a new capability — the reference is strictly single-device
(SURVEY §2.6); see parallel/train.py for the DP×TP path the flagship
embedding model uses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from videovector_tpu.ops.recurrent import LstmState, lstm

STAGE_AXIS = "model"   # pipeline stages ride the model axis of the 2D mesh
DATA_AXIS = "data"


def _pv(x):
    """Mark a body-created constant as varying over both mesh axes —
    shard_map's varying-manual-axes typing requires carries/branch outputs
    to agree (jax >= 0.9)."""
    return lax.pcast(x, (DATA_AXIS, STAGE_AXIS), to="varying")


def _split_microbatches(x, num_mb: int, batch_axis: int = 1):
    """(T, B, ...) → (M, T, B/M, ...): microbatch-major for lax.scan.
    `batch_axis` is honored by the split (not just the divisibility
    check): the (num_mb, chunk) factor expands in place at that axis,
    then moves to the front."""
    b = x.shape[batch_axis]
    if b % num_mb:
        raise ValueError(f"batch {b} not divisible by {num_mb} microbatches")
    parts = x.reshape(*x.shape[:batch_axis], num_mb, b // num_mb,
                      *x.shape[batch_axis + 1:])
    return jnp.moveaxis(parts, batch_axis, 0), x.shape[0]


def pp_encdec_loss(params, batch, *, num_microbatches: int,
                   clip_threshold: float = 0.0):
    """Per-shard pipeline loss; call inside shard_map with axis STAGE_AXIS
    of size 2. params = {"enc": lstm, "dec": lstm, "readout": {w, b}}.
    batch = {observed, cont_obs, predicted, cont_pred, gt}.

    Returns the Euclidean displacement loss (sum sq / (2·rows), the
    reference EuclideanLoss normalization after FLATTEN_BATCH).
    """
    stage = lax.axis_index(STAGE_AXIS)
    m = num_microbatches
    # Cast the replicated params to varying HERE, outside the stage cond:
    # the transpose of this broadcast is the cross-stage grad psum, and it
    # must execute uniformly on every device — left inside lax.cond, the
    # two stages would run different collectives and deadlock.
    params = jax.tree.map(_pv, params)
    enc_x, _ = _split_microbatches(batch["observed"], m)
    enc_c, _ = _split_microbatches(batch["cont_obs"], m)
    dec_x, _ = _split_microbatches(batch["predicted"], m)
    dec_c, _ = _split_microbatches(batch["cont_pred"], m)
    gt, t_pred = _split_microbatches(batch["gt"], m)

    bm = enc_x.shape[2]
    hidden = params["dec"]["w_h"].shape[0]

    def tick(carry, t):
        recv_cell, sq_sum = carry

        def enc_work(_):
            te = jnp.minimum(t, m - 1)
            x = lax.dynamic_index_in_dim(enc_x, te, 0, keepdims=False)
            cont = lax.dynamic_index_in_dim(enc_c, te, 0, keepdims=False)
            zero = _pv(jnp.zeros((bm, hidden), x.dtype))
            _, st = lstm(params["enc"], x, cont,
                         state=LstmState(zero, zero),
                         clip_threshold=clip_threshold)
            return st.c, _pv(jnp.float32(0.0))

        def dec_work(_):
            td = jnp.clip(t - 1, 0, m - 1)
            x = lax.dynamic_index_in_dim(dec_x, td, 0, keepdims=False)
            cont = lax.dynamic_index_in_dim(dec_c, td, 0, keepdims=False)
            y = lax.dynamic_index_in_dim(gt, td, 0, keepdims=False)
            state = LstmState(recv_cell,
                              _pv(jnp.zeros((bm, hidden), x.dtype)))
            h, _ = lstm(params["dec"], x, cont, state=state,
                        clip_threshold=clip_threshold)
            pred = h @ params["readout"]["w"] + params["readout"]["b"]
            valid = ((t >= 1) & (t <= m)).astype(jnp.float32)
            return (_pv(jnp.zeros((bm, hidden), x.dtype)),
                    valid * jnp.sum((pred - y) ** 2))

        payload, sq = lax.cond(stage == 0, enc_work, dec_work, operand=None)
        # mask the bubble tick: stage 0 has no microbatch left at t == m
        payload = jnp.where(t < m, payload, jnp.zeros_like(payload))
        received = lax.ppermute(payload, STAGE_AXIS, perm=[(0, 1)])
        return (received, sq_sum + sq), None

    init = (_pv(jnp.zeros((bm, hidden), enc_x.dtype)),
            _pv(jnp.float32(0.0)))
    (_, sq_sum), _ = lax.scan(tick, init, jnp.arange(m + 1))
    # the loss lives on stage 1 (stage 0 accumulated zeros): share it
    sq_sum = lax.psum(sq_sum, STAGE_AXIS)
    rows = t_pred * bm * m  # FLATTEN_BATCH row count of this data shard
    return sq_sum / (2.0 * rows)


def make_pp_loss_fn(mesh: Mesh, *, num_microbatches: int,
                    clip_threshold: float = 0.0):
    """jit-ready loss(params, batch) over a (data, model=2) mesh: batch
    sharded over "data", the encoder/decoder pipeline over "model".
    Differentiable — wrap in jax.value_and_grad for a PP(+DP) train step."""
    if mesh.shape[STAGE_AXIS] != 2:
        raise ValueError(
            f"pipeline has 2 stages; mesh {STAGE_AXIS}={mesh.shape[STAGE_AXIS]}")

    batch_specs = {
        "observed": P(None, DATA_AXIS, None),
        "cont_obs": P(None, DATA_AXIS),
        "predicted": P(None, DATA_AXIS, None),
        "cont_pred": P(None, DATA_AXIS),
        "gt": P(None, DATA_AXIS, None),
    }

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), batch_specs), out_specs=P())
    def loss_fn(params, batch):
        loss = pp_encdec_loss(params, batch,
                              num_microbatches=num_microbatches,
                              clip_threshold=clip_threshold)
        return lax.pmean(loss, DATA_AXIS)

    return loss_fn


def reference_encdec_loss(params, batch, *, clip_threshold: float = 0.0):
    """Single-device oracle for the pipeline: plain lstm_enc_dec + readout +
    Euclidean loss — pp_encdec_loss must match this bit-for-bit math."""
    from videovector_tpu.ops.recurrent import lstm_enc_dec
    _, dec_h = lstm_enc_dec(params["enc"], params["dec"],
                            batch["observed"], batch["cont_obs"],
                            batch["predicted"], batch["cont_pred"],
                            clip_threshold=clip_threshold)
    pred = dec_h @ params["readout"]["w"] + params["readout"]["b"]
    rows = pred.shape[0] * pred.shape[1]
    return jnp.sum((pred - batch["gt"]) ** 2) / (2.0 * rows)
