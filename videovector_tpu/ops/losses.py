"""Loss functions.

Each loss returns a scalar normalized exactly as the reference does (see the
per-function notes — normalization constants differ between losses and are
load-bearing for lr-schedule parity). Gradients come from JAX autodiff; golden
tests in tests/test_losses.py verify both values and grads against the
reference formulas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_THRESHOLD = 1e-20  # ref kLOG_THRESHOLD (multinomial_logistic_loss_layer.cpp:33)


# ---------------------------------------------------------------------------
# Max-margin ranking loss — the flagship training loss.
# ---------------------------------------------------------------------------

def max_margin_loss(true_scores, bogus_scores, *, margin: float = 1.0,
                    norm: str = "L2", weights=None):
    """Ranking hinge over (true, bogus) score pairs.

    ref:src/caffe/layers/max_margin_loss_layer.cpp:54-214. With
    h = max(0, margin − (s_true − s_bogus)) and per-element weight w (from
    `use_direct_weight` bottom[2] or an id→weight csv; 1 if absent):

      L1: loss = Σ w·h / count
      L2: loss = Σ w·h² / count   (the reference applies √w before squaring)

    Returns (loss, num_violations) where num_violations counts elements with
    s_true < s_bogus (the reference's diagnostic second top).
    """
    diff = true_scores - bogus_scores
    h = jnp.maximum(0.0, margin - diff)
    w = jnp.ones_like(h) if weights is None else jnp.broadcast_to(weights, h.shape)
    count = h.size
    if norm == "L1":
        loss = jnp.sum(w * h) / count
    elif norm == "L2":
        loss = jnp.sum(w * h * h) / count
    else:
        raise ValueError(f"Unknown norm {norm!r}")
    num_violations = jnp.sum((diff < 0).astype(jnp.float32))
    return loss, num_violations


# ---------------------------------------------------------------------------
# Standard Caffe losses.
# ---------------------------------------------------------------------------

def euclidean_loss(pred, target, *, l1: bool = False):
    """L2: Σ(a−b)² / (2·num); L1 option: Σ|a−b| / num
    (ref:src/caffe/layers/euclidean_loss_layer.cpp:30-50)."""
    diff = pred - target
    num = pred.shape[0]
    if l1:
        return jnp.sum(jnp.abs(diff)) / num
    return jnp.sum(diff * diff) / num / 2.0


def hinge_loss(scores, labels, *, norm: str = "L1"):
    """Multiclass hinge (ref:src/caffe/layers/hinge_loss_layer.cpp): flip the
    true-class score sign, h = max(0, 1 + s), L1: Σh/num, L2: Σh²/num."""
    num, dim = scores.shape
    labels = labels.reshape(-1).astype(jnp.int32)
    sign = jnp.ones_like(scores).at[jnp.arange(num), labels].set(-1.0)
    h = jnp.maximum(0.0, 1.0 + scores * sign)
    if norm == "L1":
        return jnp.sum(h) / num
    if norm == "L2":
        return jnp.sum(h * h) / num
    raise ValueError(f"Unknown norm {norm!r}")


def softmax_loss(logits, labels):
    """Softmax + NLL at label, averaged over num
    (ref:src/caffe/layers/softmax_loss_layer.cpp; prob floor 1e-20 is kept
    via clipping the log prob)."""
    num = logits.shape[0]
    labels = labels.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.reshape(num, -1), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    picked = jnp.maximum(picked, jnp.log(LOG_THRESHOLD))
    return -jnp.sum(picked) / num


def multinomial_logistic_loss(probs, labels):
    """NLL over already-normalized probabilities
    (ref:src/caffe/layers/multinomial_logistic_loss_layer.cpp:25-40)."""
    num = probs.shape[0]
    labels = labels.reshape(-1).astype(jnp.int32)
    p = jnp.take_along_axis(probs.reshape(num, -1), labels[:, None], axis=1)[:, 0]
    p = jnp.maximum(p, LOG_THRESHOLD)
    return -jnp.sum(jnp.log(p)) / num


def sigmoid_cross_entropy_loss(logits, targets):
    """Σ per-element logistic cross-entropy / num, computed in the
    overflow-safe form (ref:src/caffe/layers/sigmoid_cross_entropy_loss_layer.cpp)."""
    num = logits.shape[0]
    # log(1+exp(-|x|)) + max(x,0) − x·t  ==  −[t·log σ(x) + (1−t)·log(1−σ(x))]
    loss = jnp.sum(jax.nn.softplus(-jnp.abs(logits))
                   + jnp.maximum(logits, 0.0) - logits * targets)
    return loss / num


def infogain_loss(probs, labels, infogain):
    """−Σ_j H[label, j]·log(max(p_j, 1e-20)) / num
    (ref:src/caffe/layers/infogain_loss_layer.cpp:60-72)."""
    num = probs.shape[0]
    labels = labels.reshape(-1).astype(jnp.int32)
    p = jnp.maximum(probs.reshape(num, -1), LOG_THRESHOLD)
    h = jnp.take(infogain, labels, axis=0)
    return -jnp.sum(h * jnp.log(p)) / num


def contrastive_loss(a, b, similar, *, margin: float = 1.0):
    """Legacy-Caffe contrastive loss on *squared* distances
    (ref:src/caffe/layers/contrastive_loss_layer.cpp:33-57):
    mean over pairs of [ y·d² + (1−y)·max(margin − d², 0) ] / 2."""
    d2 = jnp.sum((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    y = similar.reshape(-1).astype(a.dtype)
    per_pair = y * d2 + (1.0 - y) * jnp.maximum(margin - d2, 0.0)
    return jnp.sum(per_pair) / a.shape[0] / 2.0


# ---------------------------------------------------------------------------
# Metrics that live in the loss zoo.
# ---------------------------------------------------------------------------

def accuracy(scores, labels, *, top_k: int = 1):
    """Top-k accuracy (ref:src/caffe/layers/accuracy_layer.cpp:33-60)."""
    num = scores.shape[0]
    labels = labels.reshape(-1).astype(jnp.int32)
    flat = scores.reshape(num, -1)
    _, top_idx = jax.lax.top_k(flat, top_k)
    hit = jnp.any(top_idx == labels[:, None], axis=1)
    return jnp.mean(hit.astype(jnp.float32))
