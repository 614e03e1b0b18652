"""Classification workload (the paper's second MED task): fc7 features →
classifier → SOFTMAX_LOSS, evaluated with ACCURACY + CLASSIFICATION_STATS —
all through the prototxt engine, trained end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph import Net
from videovector_tpu.solver import SolverConfig
from videovector_tpu.solver.train import train

CLS_NET = """
name: "med_classifier"
layers { name: "d" type: MEMORY_DATA top: "feats" top: "label" }
layers {
  name: "fc8" type: INNER_PRODUCT bottom: "feats" top: "logits"
  inner_product_param { num_output: 5
    weight_filler { type: "gaussian" std: 0.05 } }
}
layers {
  name: "loss" type: SOFTMAX_LOSS bottom: "logits" bottom: "label" top: "l"
  include: { phase: TRAIN }
}
layers {
  name: "acc" type: ACCURACY bottom: "logits" bottom: "label" top: "accuracy"
  include: { phase: TEST }
}
layers {
  name: "cls_stats" type: CLASSIFICATION_STATS
  bottom: "logits" bottom: "label"
  top: "per_class_acc" top: "per_class_ap" top: "overall_acc"
  classification_stats_param { num_classes: 5 }
  include: { phase: TEST }
}
"""


def _clustered(rng, n, dim=24, classes=5, centers=None):
    if centers is None:
        centers = rng.randn(classes, dim).astype(np.float32) * 2
    y = rng.randint(0, classes, n)
    X = centers[y] + 0.5 * rng.randn(n, dim).astype(np.float32)
    return X.astype(np.float32), y.astype(np.float32), centers


def test_classification_trains_and_evaluates(rng):
    Xtr, ytr, centers = _clustered(rng, 256)
    Xte, yte, _ = _clustered(rng, 128, centers=centers)

    train_net = Net(parse(CLS_NET), phase="TRAIN")
    test_net = Net(parse(CLS_NET), phase="TEST")
    spec = {"feats": jax.ShapeDtypeStruct((32, 24), jnp.float32),
            "label": jax.ShapeDtypeStruct((32,), jnp.float32)}
    params, _ = train_net.init(jax.random.PRNGKey(0), spec)
    test_net.param_meta = train_net.param_meta

    def batches():
        i = 0
        while True:
            idx = np.arange(i, i + 32) % len(Xtr)
            i += 32
            yield {"feats": jnp.asarray(Xtr[idx]),
                   "label": jnp.asarray(ytr[idx])}

    def loss_fn(p, batch, key):
        loss, _ = train_net.apply(p, batch)
        return loss, {}

    res = train(loss_fn, params, batches(),
                SolverConfig(base_lr=0.1, momentum=0.9, max_iter=100,
                             display=50))
    params = res.params

    _, outputs = test_net.apply(params, {"feats": jnp.asarray(Xte),
                                         "label": jnp.asarray(yte)})
    acc = float(outputs["accuracy"])
    overall = float(outputs["overall_acc"])
    assert acc > 0.85            # well-separated clusters
    np.testing.assert_allclose(acc, overall, atol=1e-6)
    per_class = np.asarray(outputs["per_class_acc"])
    assert per_class.shape == (5,)
    assert (np.asarray(outputs["per_class_ap"]) > 0.5).all()
