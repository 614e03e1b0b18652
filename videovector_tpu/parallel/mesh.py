"""Device-mesh helpers.

The reference has no multi-device support at all (SURVEY.md §2.6): one GPU,
one process. On TPU, parallelism is a first-class part of this framework:
a `jax.sharding.Mesh` with named axes

  "data"  — batch (DP): gradients all-reduced over ICI by XLA-inserted psum
  "model" — embedding dim (TP): the (D, E) tower weight column-sharded

and GSPMD propagates shardings / inserts collectives from the annotations in
parallel/train.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis.

    The mesh is laid out so that "model" maps to adjacent devices (fastest ICI
    hops for the per-step tensor-parallel collectives) and "data" spans the
    remaining dimension (gradient all-reduce happens once per step and
    overlaps with backward compute).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))
