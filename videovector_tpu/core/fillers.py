"""Parameter initializers ("fillers").

Caffe-equivalent semantics (ref:include/caffe/filler.hpp:20-188):

- constant(value)
- uniform(min, max)
- gaussian(mean, std[, sparse]) — `sparse >= 0` keeps each weight with
  probability sparse/fan_out via a Bernoulli mask (non-zero expected count per
  output = sparse).
- positive_unitball — uniform [0,1), then each row (leading axis) scaled to
  sum to 1.
- xavier — uniform(-s, s) with s = sqrt(3 / fan_in), fan_in = count / shape[0]
  (Caffe's definition).

All fillers are pure: `fill(key, shape, dtype) -> jnp.ndarray`, built from a
config mapping (the `Message` view of a FillerParameter, or plain kwargs).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def constant_fill(key, shape, dtype=jnp.float32, *, value=0.0):
    del key
    return jnp.full(shape, value, dtype=dtype)


def uniform_fill(key, shape, dtype=jnp.float32, *, min=0.0, max=1.0):
    return jax.random.uniform(key, shape, dtype=dtype, minval=min, maxval=max)


def gaussian_fill(key, shape, dtype=jnp.float32, *, mean=0.0, std=1.0, sparse=-1):
    k1, k2 = jax.random.split(key)
    out = mean + std * jax.random.normal(k1, shape, dtype=dtype)
    if sparse >= 0:
        # ref:include/caffe/filler.hpp gaussian sparsity: non-zero probability
        # = sparse / fan_out, fan_out = shape[0] for a (num_output, fan_in) blob.
        fan_out = shape[0] if len(shape) else 1
        p = min(1.0, float(sparse) / float(max(fan_out, 1)))
        mask = jax.random.bernoulli(k2, p, shape)
        out = out * mask.astype(dtype)
    return out


def positive_unitball_fill(key, shape, dtype=jnp.float32):
    x = jax.random.uniform(key, shape, dtype=dtype)
    num = shape[0] if len(shape) else 1
    flat = x.reshape(num, -1)
    flat = flat / jnp.sum(flat, axis=1, keepdims=True)
    return flat.reshape(shape)


def xavier_fill(key, shape, dtype=jnp.float32):
    count = int(np.prod(shape)) if len(shape) else 1
    num = shape[0] if len(shape) else 1
    fan_in = count // max(num, 1)
    scale = float(np.sqrt(3.0 / max(fan_in, 1)))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-scale, maxval=scale)


_FILLERS = {
    "constant": constant_fill,
    "uniform": uniform_fill,
    "gaussian": gaussian_fill,
    "positive_unitball": positive_unitball_fill,
    "xavier": xavier_fill,
}


def get_filler(cfg: Any = None, **overrides):
    """Build `fill(key, shape, dtype)` from a FillerParameter-like config.

    `cfg` may be None (constant 0, Caffe's default), a `config.textformat.Message`,
    or a dict. ref:include/caffe/filler.hpp:175-188 (GetFiller factory).
    """
    kwargs: dict[str, Any] = {}
    if cfg is not None:
        for field in ("type", "value", "min", "max", "mean", "std", "sparse"):
            v = cfg.get(field, None)  # Message and dict share .get
            if v is not None:
                kwargs[field] = v
    kwargs.update(overrides)
    ftype = kwargs.pop("type", "constant")
    if ftype not in _FILLERS:
        raise ValueError(f"Unknown filler type: {ftype!r}")
    fn = _FILLERS[ftype]
    if ftype in ("positive_unitball", "xavier"):
        kwargs = {}
    return partial(fn, **kwargs)
