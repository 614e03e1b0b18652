"""extract_features — forward a net and dump named blobs.

ref:tools/extract_features.cpp:26-211: load a net prototxt, apply up to two
weight files in order (ImageNet then task, :104-107), forward N minibatches,
write each requested blob's rows to a record store (Datum values, like the
reference's LevelDB output) AND a csv text file (:141-198).

Usage:
  python -m videovector_tpu.tools.extract_features \
      --model=net.prototxt [--weights=a.caffemodel --weights=b.vvmodel] \
      --blobs=ip2 --out=features --num_batches=10
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


def extract(model_path: str, weight_paths: list[str], blob_names: list[str],
            out_prefix: str, num_batches: int,
            backend: str = "vvr", mesh=None) -> dict:
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.data.records import open_store_writer
    from videovector_tpu.data.wire import Datum
    from videovector_tpu.graph.data_factory import MergedSource, make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.cli import _load_weights

    net = Net(parse_file(model_path), phase="TEST")
    sources = [make_data_source(l, phase="TEST")
               for l in net.layers if l.get("type") in DATA_LAYER_TYPES]
    source = MergedSource(sources)
    batch0_raw = source.next_batch()
    batch0 = {k: jnp.asarray(v) for k, v in batch0_raw.items()}
    params, _ = net.init(jax.random.PRNGKey(0), {
        k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
        for k, v in batch0.items()})
    for wp in weight_paths:
        params = _load_weights(wp, params)

    # reference CHECK: every requested blob must exist BEFORE any output
    # store is created (extract_features.cpp:113-118) — a typo'd name
    # used to KeyError mid-run, leaving partial databases on disk
    known = set(batch0) | {str(t) for l in net.layers
                           for t in l.get_list("top")}
    missing = [n for n in blob_names if n not in known]
    if missing:
        raise ValueError(
            f"Unknown feature blob name(s) {missing} in the net "
            f"(ref CHECK has_blob, extract_features.cpp:113-118); "
            f"available: {sorted(known)}")

    batch_sharding = None
    if mesh is not None:
        # data-parallel extraction: batch sharded over "data", params
        # replicated — each chip forwards its shard, rows gather on fetch
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        from videovector_tpu.parallel.train import shard_params
        params = shard_params(params, mesh)
        axes = source.batch_axes() if hasattr(source, "batch_axes") else {}

        def _spec(v, k):
            dims = [None] * v.ndim
            dims[axes.get(k, 0)] = "data"
            return NamedSharding(mesh, P(*dims))

        batch_sharding = {k: _spec(v, k) for k, v in batch0.items()}

    fwd = jax.jit(lambda p, b: net.apply(p, b, return_blobs=True)[1])

    # background host batching + async H2D, overlapping the forward pass
    # (the reference's prefetch-thread pattern, base_data_layer.cpp:52-95)
    from videovector_tpu.data.prefetch import DevicePrefetcher
    import itertools
    # the batch consumed for shape inference is RE-FED as extraction
    # batch 0 — the source's cursor already advanced, so iterating it
    # fresh would skip the dataset's first batch and shift every output
    # row vs the reference
    stream = itertools.chain([batch0_raw], iter(source))
    prefetcher = DevicePrefetcher(stream, depth=2,
                                  sharding=batch_sharding,
                                  max_batches=num_batches)

    # backend "leveldb" matches the reference output format
    # (ref:tools/extract_features.cpp:125-188): plain "%d" decimal keys,
    # Datum(height=dim_features, width=1, channels=1), and the text file at
    # <db_dir>/text_output.txt with a "#features" header, trailing-comma
    # rows, and ostream default float formatting (6 significant digits,
    # scientific for small/large — Python's "%g"). "vvr" is the fast native
    # store and "lmdb" the other reference db; both use zero-padded keys so
    # iteration order == insertion order.
    ref_format = backend == "leveldb"
    suffix = {"vvr": "_{}.vvr", "leveldb": "_{}_leveldb",
              "lmdb": "_{}_lmdb"}[backend]
    writers = {name: open_store_writer(out_prefix + suffix.format(name),
                                       backend)
               for name in blob_names}
    if ref_format:
        # reference writes the csv INSIDE the db directory (:141-142)
        texts = {}
        for name in blob_names:
            db_dir = out_prefix + suffix.format(name)
            os.makedirs(db_dir, exist_ok=True)
            texts[name] = open(os.path.join(db_dir, "text_output.txt"), "w")
            texts[name].write("#features\n")
    else:
        texts = {name: open(f"{out_prefix}_{name}.txt", "w")
                 for name in blob_names}
    counts = {name: 0 for name in blob_names}
    try:
        for bi, batch in enumerate(prefetcher):
            blobs = fwd(params, batch)
            for name in blob_names:
                feats = np.asarray(blobs[name])
                feats = feats.reshape(feats.shape[0], -1)
                for row in feats:
                    if ref_format:
                        key = str(counts[name])
                        datum = Datum(channels=1, height=len(row), width=1,
                                      float_data=row)
                        # C++ `stream << float` default formatting == %g
                        # (6 sig figs, sci notation outside [1e-4, 1e6))
                        texts[name].write(
                            "".join(f"{float(v):g}," for v in row) + "\n")
                    else:
                        key = f"{counts[name]:010d}"
                        datum = Datum(channels=len(row), height=1, width=1,
                                      float_data=row)
                        texts[name].write(
                            ",".join(f"{v:.6f}" for v in row) + "\n")
                    writers[name].put(key, datum.encode())
                    counts[name] += 1
            log.info("Extracted features of %d query images for blobs %s",
                     counts[blob_names[0]], ",".join(blob_names))
    finally:
        for w in writers.values():
            w.close()
        for t in texts.values():
            t.close()
    log.info("Successfully extracted the features!")
    return counts


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="extract_features")
    parser.add_argument("--model", required=True)
    parser.add_argument("--weights", action="append", default=[])
    parser.add_argument("--blobs", required=True,
                        help="comma-separated blob names")
    parser.add_argument("--out", required=True, help="output path prefix")
    parser.add_argument("--num_batches", type=int, default=10)
    parser.add_argument("--backend", default="vvr",
                        choices=["vvr", "leveldb", "lmdb"],
                        help="feature store format (leveldb = reference "
                             "extract_features output format)")
    parser.add_argument("--mesh", default="",
                        help="data-parallel extraction over a device mesh, "
                             "e.g. 8 or 8x1")
    parser.add_argument("--cpu", action="store_true",
                        help="run on the XLA CPU backend")
    parser.add_argument("--gpu", default=None,
                        help="accelerator device id; -1 = CPU (the "
                             "reference binary's GPU/CPU + device-id args, "
                             "ref tools/extract_features.cpp:52-66)")
    args = parser.parse_args(argv)
    from videovector_tpu.tools.cli import _apply_device_mode, _parse_mesh
    _apply_device_mode(args)
    extract(args.model, args.weights, args.blobs.split(","), args.out,
            args.num_batches, backend=args.backend,
            mesh=_parse_mesh(args.mesh))
    return 0


if __name__ == "__main__":
    sys.exit(main())
