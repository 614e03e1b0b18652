"""Per-class classification statistics.

ref:src/caffe/layers/classification_stats_layer.cpp:35-95. Outputs per-class
accuracy, per-class AP, and overall accuracy.

Deliberate deviation: the reference initializes its per-class score list with
`num` dummy (0, false) entries that then participate in the AP sort
(classification_stats_layer.cpp:43-44) — a bug that mixes phantom zero-score
items into the ranking. We compute AP over the real items only; the values
match the reference whenever all real scores are positive and ranked above 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def classification_stats(scores, labels, *, num_classes: int):
    """scores: (N, C); labels: (N,) int.

    Returns dict(per_class_accuracy (C,), per_class_ap (C,), accuracy scalar).
    Classes with no samples report 0 (as the reference does).
    """
    n = scores.shape[0]
    labels = labels.reshape(-1).astype(jnp.int32)
    pred = jnp.argmax(scores, axis=1)
    correct = (pred == labels).astype(jnp.float32)

    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)   # (N, C)
    class_count = jnp.sum(onehot, axis=0)                             # (C,)
    per_class_correct = jnp.sum(onehot * correct[:, None], axis=0)
    per_class_acc = jnp.where(class_count > 0,
                              per_class_correct / jnp.maximum(class_count, 1.0), 0.0)

    # AP per class: rank all N items by class score descending; relevant =
    # items whose true label is that class; AP = mean of ret/val at relevant
    # positions, normalized by class count (ref :74-83).
    order = jnp.argsort(-scores, axis=0, stable=True)                 # (N, C)
    rel = jnp.take_along_axis(onehot, order, axis=0)                  # (N, C)
    val = jax.lax.broadcasted_iota(jnp.float32, (n, num_classes), 0) + 1.0
    ret = jnp.cumsum(rel, axis=0)
    ap = jnp.sum(rel * ret / val, axis=0)
    per_class_ap = jnp.where(class_count > 0, ap / jnp.maximum(class_count, 1.0), 0.0)

    return {
        "per_class_accuracy": per_class_acc,
        "per_class_ap": per_class_ap,
        "accuracy": jnp.mean(correct),
    }
