"""Social pooling — differentiable neighborhood pooling over agent positions.

ref:src/caffe/layers/social_pooling_layer.cpp:39-186 (+ .cu). Given agent
features whose first two dims are (x, y) positions, a B×B relation matrix R,
and an optional per-agent mean position to re-add:

  d_x[i,j] = x_i − x_j ;  d_y[i,j] = y_i − y_j
  e[i,j,:] = sigmoid(d_x[i,j]·w_x + d_y[i,j]·w_y + b)      (learned 2→F map)
  out[i,:] = Σ_j R[i,j] · e[i,j,:]                          (masked neighbor sum)

Learnable blobs: w (2, F), b (F,). JAX autodiff replaces the 100-line manual
backward (ref :188-286).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def social_pooling(feats, relations, w, b, mean_pos=None):
    """feats: (B, D) with x = feats[:, 0], y = feats[:, 1];
    relations: (B, B); w: (2, F); b: (F,); mean_pos: optional (B, 2) added to
    the (x, y) columns first (ref :99-104, f22 matrix trick).
    Returns (B, F)."""
    if mean_pos is not None:
        feats = feats.at[:, :2].add(mean_pos)
    x = feats[:, 0]
    y = feats[:, 1]
    dx = x[:, None] - x[None, :]          # (B, B)
    dy = y[:, None] - y[None, :]
    e = jax.nn.sigmoid(dx[..., None] * w[0] + dy[..., None] * w[1] + b)
    return jnp.einsum("bj,bjf->bf", relations, e)
