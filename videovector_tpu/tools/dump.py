"""dump_network / dump_learned_blobs — debugging dumps.

ref:tools/dump_network.cpp:27-77 (forward a net and dump every activation
blob) and ref:tools/dump_learned_blobs.cpp:27-62 (dump all learned weights).
Outputs BlobProto-format binary files (one per blob), readable by both this
framework and Caffe tooling, plus a npz bundle for convenience. These are the
parity-harness building blocks: diff our dumps against reference dumps to
check layer-level numerics.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from videovector_tpu.data.wire import BlobProto
from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _write_blob(path: str, arr: np.ndarray) -> None:
    arr = np.asarray(arr, np.float32)
    if arr.ndim > 4:
        # BlobProto is 4-D (the reference Blob); silently writing only
        # slice [0] would make parity diffs pass on data they never saw.
        # The full array is always in activations.npz — skip the .blob
        # loudly instead of truncating it.
        log.warning("%s: %d-D activation does not fit a 4-D BlobProto — "
                    "skipped (full array is in activations.npz)",
                    path, arr.ndim)
        return
    shaped = arr.reshape((1,) * (4 - arr.ndim) + arr.shape)
    with open(path, "wb") as f:
        f.write(BlobProto.from_array(shaped).encode())


def dump_network(model_path: str, out_dir: str, *,
                 weights: list[str] = (), batch: dict | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    from videovector_tpu.config.textformat import parse_file
    from videovector_tpu.graph.data_factory import MergedSource, make_data_source
    from videovector_tpu.graph.layers import DATA_LAYER_TYPES
    from videovector_tpu.graph.net import Net
    from videovector_tpu.tools.cli import _load_weights

    net = Net(parse_file(model_path), phase="TEST")
    if batch is None:
        sources = [make_data_source(l, phase="TEST")
                   for l in net.layers if l.get("type") in DATA_LAYER_TYPES]
        batch = MergedSource(sources).next_batch()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    # parity dumps must be numerically faithful: on TPU, f32 matmuls default
    # to fast bf16 passes (~1e-3 error) — force full f32 accumulation for
    # this net's trace (scoped: this tool is imported as a library, so a
    # process-global config flip would leak into the caller's numerics)
    with jax.default_matmul_precision("highest"):
        params, _ = net.init(jax.random.PRNGKey(0), {
            k: jax.ShapeDtypeStruct(v.shape, jnp.float32)
            for k, v in batch.items()})
        for wp in weights:
            params = _load_weights(wp, params)
        _, blobs = net.apply(params, batch, return_blobs=True)

    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for name, arr in blobs.items():
        arr = np.asarray(arr)
        _write_blob(os.path.join(out_dir, f"{name}.blob"), arr)
        out[name] = arr
    np.savez(os.path.join(out_dir, "activations.npz"), **out)
    log.info("Dumped %d activation blobs to %s", len(out), out_dir)
    return out


def dump_learned_blobs(params: dict, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    flat = {}
    for lname, lp in params.items():
        for pname, arr in lp.items():
            arr = np.asarray(arr)
            _write_blob(os.path.join(out_dir, f"{lname}.{pname}.blob"), arr)
            flat[f"{lname}/{pname}"] = arr
    np.savez(os.path.join(out_dir, "weights.npz"), **flat)
    log.info("Dumped %d learned blobs to %s", len(flat), out_dir)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vvtpu-dump")
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("network")
    p.add_argument("--model", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--weights", action="append", default=[])
    p.add_argument("--input", action="append", default=[],
                   help="name=path.blob — feed a fixed BlobProto as a graph "
                        "input instead of pulling from the net's data layers "
                        "(the dump_network parity workflow)")
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend (the reference binary "
                        "hardcodes GPU, dump_network.cpp:28)")
    p = sub.add_parser("learned_blobs")
    p.add_argument("--weights", required=True, help=".vvmodel file")
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true",
                   help="run on the XLA CPU backend")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.command == "network":
        batch = None
        if args.input:
            from videovector_tpu.data.wire import BlobProto
            batch = {}
            for spec in args.input:
                name, _, path = spec.partition("=")
                with open(path, "rb") as f:
                    batch[name] = BlobProto.decode(f.read()).to_array()
        dump_network(args.model, args.out, weights=args.weights, batch=batch)
    else:
        from videovector_tpu.solver.checkpoint import load_model
        dump_learned_blobs(load_model(args.weights), args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
