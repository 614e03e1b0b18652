"""Model export for serving — StableHLO artifacts via jax.export.

The reference's deployment story is "ship the .caffemodel + prototxt and link
libcaffe". The TPU-native story: export the jitted inference function
(weights baked in or as arguments) as a serialized StableHLO artifact that
any PJRT runtime can load and run without Python model code.

API:
  save_exported(path, fn, *example_args)  — trace, export, serialize
  load_exported(path)                      — deserialize; returns a callable

Used for the extraction/embedding pipeline (models/retrieval_pipeline.py) and
any jitted forward. Batch size can be made symbolic by the caller via
jax.export.symbolic_args_specs.
"""

from __future__ import annotations

import jax
from jax import export as jax_export


def save_exported(path: str, fn, *example_args, platforms=None) -> None:
    """Trace fn on example_args and serialize the StableHLO artifact."""
    exported = jax_export.export(
        jax.jit(fn),
        platforms=platforms,
    )(*example_args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Returns the deserialized Exported; `.call(*args)` runs it under jit."""
    with open(path, "rb") as f:
        blob = f.read()
    return jax_export.deserialize(bytearray(blob))
