"""On-device negative sampling — the TPU performance path.

The reference's negative reservoir lives on the host inside the data layer
(ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:24-44, :885-905);
every batch then ships (B, C+N, D) floats host→device — negatives are ~2/3 of
that traffic. This module keeps the reservoir AS A DEVICE ARRAY and samples /
updates it inside the jitted train step:

  * the host sends only (B, C, D) target+context features,
  * negatives are gathered from the device reservoir with jax.random,
  * the reservoir is refreshed by swapping in every batch row (target AND
    context channels — the host path offers all shots of each consumed
    video) with the reference's swap probability (statistical twin of
    AddToBuffer — key-dedup is dropped, a measure-zero difference at
    corpus scale; shots the sampler never put in a batch also never
    enter the reservoir, a second, small divergence).

H2D traffic for the flagship shape drops from 128·15·4096·4 = 31.5 MB to
128·5·4096·4 = 10.5 MB per step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceReservoir(NamedTuple):
    buffer: jnp.ndarray       # (max_size, D)
    swap_percentage: float    # 0..100


def init_device_reservoir(features, max_size: int,
                          swap_percentage: float) -> DeviceReservoir:
    """Seed from any (≥max_size, D) feature matrix (e.g. one pass over the
    dataset's shots, like the reference's initial fill)."""
    if features.shape[0] < max_size:
        raise ValueError("not enough seed features for the reservoir")
    return DeviceReservoir(jnp.asarray(features[:max_size], jnp.float32),
                           float(swap_percentage))


def sample_negatives(reservoir: DeviceReservoir, rng, batch: int, n: int):
    """(batch, n, D) rows drawn uniformly (with replacement across items,
    without within an item — matching RandomShuffleTopids semantics per
    item)."""
    max_size = reservoir.buffer.shape[0]

    def per_item(key):
        ids = jax.random.choice(key, max_size, shape=(n,), replace=False)
        return reservoir.buffer[ids]

    keys = jax.random.split(rng, batch)
    return jax.vmap(per_item)(keys)


def update_reservoir(reservoir: DeviceReservoir, rng, new_feats
                     ) -> DeviceReservoir:
    """Offer (M, D) new features; each replaces a random slot with prob
    swap%/100 (ref AddToBuffer :24-37, without the key dedup)."""
    m = new_feats.shape[0]
    max_size = reservoir.buffer.shape[0]
    k1, k2 = jax.random.split(rng)
    accept = jax.random.uniform(k1, (m,)) < (reservoir.swap_percentage / 100.0)
    slots = jax.random.randint(k2, (m,), 0, max_size)
    # losers scatter to a scratch row (max_size) that we then drop
    target = jnp.where(accept, slots, max_size)
    padded = jnp.concatenate(
        [reservoir.buffer, jnp.zeros((1,) + reservoir.buffer.shape[1:],
                                     reservoir.buffer.dtype)])
    padded = padded.at[target].set(new_feats.astype(reservoir.buffer.dtype))
    return reservoir._replace(buffer=padded[:max_size])


def train_batch_with_device_negatives(reservoir: DeviceReservoir, rng,
                                      host_part, num_negatives: int):
    """host_part: (B, C, D) target+contexts → ((B, C+N, D) batch,
    updated reservoir). Call inside the jitted step."""
    b = host_part.shape[0]
    k_sample, k_update = jax.random.split(rng)
    negs = sample_negatives(reservoir, k_sample, b, num_negatives)
    batch = jnp.concatenate([host_part, negs], axis=1)
    # offer EVERY host channel (target + contexts) back to the reservoir —
    # the host/reference path offers all shots of each consumed video
    # (ref :885-905); offering only channel 0 would bias the reservoir
    # toward target-position shots over training
    d = host_part.shape[-1]
    reservoir = update_reservoir(reservoir, k_update,
                                 host_part.reshape(-1, d))
    return batch, reservoir
