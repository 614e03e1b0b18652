"""Embedding-table lookup (IdToWeightMapping layer).

Reference: ref:src/caffe/layers/id_to_weight_mapping_layer.cpp — forward
gathers rows of a (num_ids, dim) table by integer id; backward scatter-adds
the output gradient into the table rows (no gradient to the ids). On TPU the
gather is `jnp.take` and JAX autodiff produces exactly the scatter-add.
"""

from __future__ import annotations

import jax.numpy as jnp


def id_to_weight_lookup(ids, table):
    """ids: int array (M,) or (M, 1); table: (num_ids, dim) → (M, dim).

    Out-of-range ids fill with NaN (mode="fill") so a corrupt id stream
    surfaces as a NaN loss — the loud analogue of the reference's bounds
    CHECK (Blob::offset aborts). jnp.take's default mode="clip" would
    silently return row num_ids-1 for every bad id AND scatter their
    gradients into that one row."""
    flat = ids.reshape(-1).astype(jnp.int32)
    return jnp.take(table, flat, axis=0, mode="fill",
                    fill_value=jnp.nan)
