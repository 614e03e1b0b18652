"""Multi-host input pipeline for the data-parallel axis.

On a multi-host TPU slice each process can address only its local chips, so
the host-side data pipeline must feed PER-HOST batch shards: every process
loads its own slice of the global batch and jax assembles a global array
without any host ever materializing (or transferring) the whole batch. This
is the scaling story the reference never had — its data layers fill one
prefetch buffer for one GPU (ref:src/caffe/layers/base_data_layer.cpp:52-95);
here the same sources run once per host on disjoint key ranges.

Two assembly paths:

- `global_batch_from_local(batch, mesh)` — the standard multi-host recipe:
  `jax.make_array_from_process_local_data` with the per-process slice of a
  P("data", ...) sharding. Works single-host too (the local slice is then
  the whole batch) — used by tests and by single-host runs transparently.
- `global_batch_from_device_shards(batch, mesh)` — assembles from explicit
  per-device shards via `jax.make_array_from_single_device_arrays`; this is
  what the per-host path lowers to and lets a single process EXERCISE the
  multi-host code shape: each device's shard is placed individually, no
  global host array ever exists.

`host_shard_range(n, mesh)` gives this process's [start, stop) slice of a
global leading dim of n — the contract for pointing each host's data source
at its own range (e.g. a per-host LMDB key range or VVR index slice).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def host_shard_range(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """[start, stop) of the global batch this process must produce.

    Device order along the "data" axis is mesh order; each process owns the
    contiguous run of its addressable devices (standard TPU slice layout)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n_proc}")
    per = global_batch // n_proc
    idx = jax.process_index()
    return idx * per, (idx + 1) * per


def global_batch_from_local(batch: dict, mesh: Mesh,
                            axes: dict | None = None) -> dict:
    """Per-host batch shards → global jax.Arrays sharded P("data", ...).

    `batch` holds THIS process's rows only (host_shard_range sized); the
    result behaves exactly like shard_batch() of the full global batch.
    `axes` maps batch keys to their BATCH axis (default 0) — time-major
    sources (tracking: (T, B, ...)) declare 1 via source.batch_axes(),
    same contract as parallel.train.shard_batch; hardcoding axis 0 would
    shard trajectories over TIME."""
    axes = axes or {}

    def place(leaf, ax):
        leaf = np.asarray(leaf)
        return jax.make_array_from_process_local_data(
            _data_sharding(mesh, leaf.ndim, ax), leaf)
    # per-top axis, nested pytrees under each top still supported
    return {k: jax.tree.map(lambda l, a=axes.get(k, 0): place(l, a), v)
            for k, v in batch.items()}


def global_batch_from_device_shards(batch: dict, mesh: Mesh) -> dict:
    """Assemble global arrays from explicit per-device shards.

    Feeds each data-axis device its own rows via device_put and stitches
    them with make_array_from_single_device_arrays — the primitive the
    per-process path reduces to. No host-global array is created."""
    axis_devices = mesh.devices.reshape(
        mesh.shape["data"], -1)  # rows: data index, cols: model replicas
    n_data = axis_devices.shape[0]

    def place(leaf):
        leaf = np.asarray(leaf)
        if leaf.shape[0] % n_data:
            raise ValueError(
                f"leading dim {leaf.shape[0]} not divisible by data axis "
                f"{n_data}")
        per = leaf.shape[0] // n_data
        sharding = _data_sharding(mesh, leaf.ndim)
        shards = []
        for i in range(n_data):
            rows = leaf[i * per:(i + 1) * per]
            for dev in axis_devices[i]:
                shards.append(jax.device_put(rows, dev))
        global_shape = leaf.shape
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards)
    return jax.tree.map(place, batch)


def replicate_global(tree, mesh: Mesh):
    """Host-local numpy pytree → fully-replicated global jax.Arrays.

    The multi-process-safe twin of `shard_params(model_axis=False)`:
    every process passes the SAME values (deterministic init from a shared
    seed) and `make_array_from_process_local_data` places each process's
    addressable replicas — no device_put to non-addressable devices."""
    rep = NamedSharding(mesh, P())

    def place(leaf):
        return jax.make_array_from_process_local_data(rep, np.asarray(leaf))
    return jax.tree.map(place, tree)


class HostShardedSource:
    """Wrap a batch source so each host emits only its slice of the global
    batch, assembled into global arrays.

    source.next_batch() must yield the GLOBAL batch layout on every host
    when `simulate=True` (single-process testing: the wrapper slices out
    this host's rows); in a real multi-host launch, point each host's
    source at its own data range (host_shard_range) and pass
    simulate=False."""

    def __init__(self, source, mesh: Mesh, *, simulate: bool = False):
        self.source = source
        self.mesh = mesh
        self.simulate = simulate
        # batch-axis declarations ride through from the wrapped source
        # (time-major tracking batches are (T, B, ...): slicing/sharding
        # axis 0 would cut TIME, not the batch)
        self.axes = dict(source.batch_axes())             if hasattr(source, "batch_axes") else {}

    def batch_axes(self) -> dict:
        return dict(self.axes)

    def next_batch(self) -> dict:
        batch = self.source.next_batch()
        if self.simulate:
            def cut(leaf, ax):
                leaf = np.asarray(leaf)
                lo, hi = host_shard_range(leaf.shape[ax], self.mesh)
                idx = [slice(None)] * leaf.ndim
                idx[ax] = slice(lo, hi)
                return leaf[tuple(idx)]
            batch = {k: jax.tree.map(
                lambda l, a=self.axes.get(k, 0): cut(l, a), v)
                for k, v in batch.items()}
        return global_batch_from_local(batch, self.mesh, self.axes)

    def __iter__(self):
        while True:
            yield self.next_batch()
