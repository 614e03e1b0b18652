"""Trajectory forecasting model — the social-pooling workload.

Composes the pieces the reference wires via prototxt for the tracking
project (ref layers: TRACKING_WINDOWS[_SOCIAL]_DATA → LSTM encoder/decoder +
SOCIAL_POOLING + EUCLIDEAN_LOSS): an encoder LSTM consumes the observed
track (optionally concatenated with a social-pooling summary of neighbor
offsets at the last observed step), seeds a decoder LSTM that rolls out the
prediction window, and a linear readout produces (dx, dy) per future step.
Euclidean loss against the ground-truth future positions, masked by track
validity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from videovector_tpu.ops.recurrent import LstmState, init_lstm_params, lstm
from videovector_tpu.ops.social import social_pooling


@dataclass(frozen=True)
class TrajectoryConfig:
    feature_size: int = 3            # dx, dy, encoder_bit
    hidden: int = 128
    pool_feat_size: int = 32
    use_social: bool = True
    clip_threshold: float = 0.0
    # conditional decoding (ref LSTM_CONDITIONAL): the decoder consumes its
    # own previous (dx, dy) prediction instead of a fixed zero/scene input
    conditional_decoder: bool = False


class TrajectoryModel:
    def __init__(self, cfg: TrajectoryConfig):
        self.cfg = cfg

    def init(self, key):
        cfg = self.cfg
        k_enc, k_dec, k_soc, k_out = jax.random.split(key, 4)
        params = {
            "encoder": init_lstm_params(k_enc, cfg.feature_size, cfg.hidden),
            "decoder": init_lstm_params(
                k_dec, cfg.feature_size, cfg.hidden,
                output_dim=2, conditional=cfg.conditional_decoder),
            "readout": {
                "w": 0.1 * jax.random.normal(k_out, (cfg.hidden, 2)),
                "b": jnp.zeros((2,)),
            },
        }
        if cfg.use_social:
            ks1, ks2 = jax.random.split(k_soc)
            params["social"] = {
                "w": 0.1 * jax.random.normal(ks1, (2, cfg.pool_feat_size)),
                "b": jnp.zeros((cfg.pool_feat_size,)),
            }
            params["social_proj"] = {
                "w": 0.1 * jax.random.normal(ks2, (cfg.pool_feat_size,
                                                   cfg.hidden)),
            }
        return params

    def forward(self, params, batch):
        """batch: observed (T_obs, B, F), cont_observed (T_obs, B),
        predicted (T_pred, B, F), cont_predicted (T_pred, B)
        [+ mean_pos (B, 2), relations (B, B) when social].
        Returns predictions (T_pred, B, 2)."""
        cfg = self.cfg
        obs = batch["observed"]
        enc_h, enc_state = lstm(params["encoder"], obs,
                                batch["cont_observed"],
                                clip_threshold=cfg.clip_threshold)
        h = enc_state.h
        if cfg.use_social and "relations" in batch:
            # social summary of the final observed offsets, injected into the
            # decoder's initial hidden state
            last = obs[-1]
            pooled = social_pooling(last, batch["relations"],
                                    params["social"]["w"],
                                    params["social"]["b"],
                                    batch.get("mean_pos"))
            h = h + jnp.dot(pooled, params["social_proj"]["w"],
                            preferred_element_type=jnp.float32)
        dec_state = LstmState(enc_state.c, h)
        if cfg.conditional_decoder:
            # self-feeding decoder: seed with the last observed offset (0, 0)
            # after recentering; each step's (dx, dy) output feeds the next
            # step (ref lstm_conditional_layer.cpp:169-345)
            from videovector_tpu.ops.recurrent import lstm_conditional
            first = obs[-1][:, :2] * 0.0
            out, _ = lstm_conditional(
                params["decoder"], batch["predicted"], first,
                batch["cont_predicted"], state=dec_state,
                clip_threshold=cfg.clip_threshold)
            return out
        dec_h, _ = lstm(params["decoder"], batch["predicted"],
                        batch["cont_predicted"], state=dec_state,
                        clip_threshold=cfg.clip_threshold)
        t, b, _ = dec_h.shape
        out = jnp.dot(dec_h.reshape(t * b, -1), params["readout"]["w"],
                      preferred_element_type=jnp.float32) + params["readout"]["b"]
        return out.reshape(t, b, 2)

    def loss(self, params, batch, rng=None, train=True):
        del rng, train
        pred = self.forward(params, batch)
        labels = batch["labels"]
        err = (pred - labels) ** 2
        if "is_valid" in batch:
            mask = batch["is_valid"].reshape(1, -1, 1)
            err = err * mask
            denom = jnp.maximum(jnp.sum(batch["is_valid"]), 1.0) * labels.shape[0]
        else:
            mask = None
            denom = labels.shape[0] * labels.shape[1]
        # Euclidean-loss normalization: Σ/(2·num) with num = T·B items
        loss = jnp.sum(err) / denom / 2.0
        # metric masked like the loss: padded is_valid=0 slots carry
        # garbage predictions vs zero labels and would inflate the ade
        dist = jnp.sqrt(jnp.sum((pred - labels) ** 2, axis=-1))  # (T, B)
        if mask is not None:
            m = mask.reshape(1, -1)
            ade = jnp.sum(dist * m) / jnp.maximum(jnp.sum(m) * dist.shape[0],
                                                  1.0)
        else:
            ade = dist.mean()
        return loss, {"ade": ade}
