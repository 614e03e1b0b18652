"""Snapshot / restore.

The reference writes two files per snapshot (ref:src/caffe/solver.cpp:321-341):
`<prefix>_iter_N.caffemodel` (NetParameter with layer blobs) and
`<prefix>_iter_N.solverstate` (iter + momentum history + pointer to the model,
caffe.proto:176-180). We keep the same two-file shape:

  <prefix>_iter_N.vvmodel  — npz of the param pytree (flat "layer/name" keys)
  <prefix>_iter_N.vvstate  — npz of iter + history pytree + model filename

plus BOTH-ways reference interop: `restore_solverstate` resumes a foreign
`.solverstate` (momentum history + weights), and `export_caffe_snapshot`
(snapshot_format: "caffe" in the solver prototxt) writes the
`.caffemodel`/`.solverstate` pair the reference's
`caffe train --snapshot=...` consumes. Caveat: the reference sizes its
history by net_->params(), which double-counts cross-layer SHARED params;
our pytree stores shared arrays once, so solverstate interop covers nets
without cross-layer param sharing (all shipped configs qualify).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _esc(part: str) -> str:
    # "/" is the flat-key separator, so a literal "/" in a layer name
    # (GoogLeNet-style "inception_3a/1x1") must be escaped or _unflatten
    # would split the name into spurious nesting and restore() would
    # silently misload the layer
    return part.replace("%", "%25").replace("/", "%2F")


def _unesc(part: str) -> str:
    return part.replace("%2F", "/").replace("%25", "%")


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_esc(str(k))}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = [_unesc(p) for p in key.split("/")]
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


def _write_atomic(path: str, flat: dict) -> None:
    """savez to a temp file then rename: a crash mid-write never leaves a
    truncated snapshot where auto-resume would find it."""
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:  # file handle: keep our extension
        np.savez(f, **flat)
    os.replace(tmp, path)


def snapshot(prefix: str, it: int, params: dict, state: dict | None = None,
             diffs: dict | None = None):
    """Write model (+ solver state). Returns (model_path, state_path|None).

    `diffs` (a grads pytree matching params) is stored under "diff/" keys
    when the solver sets snapshot_diff — the reference's
    net_->ToProto(&net_param, param_.snapshot_diff())
    (ref:src/caffe/solver.cpp:321-341)."""
    os.makedirs(os.path.dirname(os.path.abspath(prefix)) or ".", exist_ok=True)
    model_path = f"{prefix}_iter_{it}.vvmodel"
    flat_model = _flatten(params)
    if diffs is not None:
        flat_model.update(_flatten({"diff": diffs}))
    _write_atomic(model_path, flat_model)
    state_path = None
    if state is not None:
        state_path = f"{prefix}_iter_{it}.vvstate"
        flat = _flatten({"history": state["history"]})
        flat["__iter__"] = np.asarray(int(state["iter"]))
        flat["__model__"] = np.asarray(os.path.basename(model_path))
        _write_atomic(state_path, flat)
    return model_path, state_path


class AsyncSnapshotter:
    """Background snapshot writer: the train loop pays only the D2H fetch
    (required — donated buffers are reused by the next step); serialization
    and disk IO overlap subsequent training steps. One write in flight at a
    time; `wait()` (or submitting the next snapshot) joins the previous
    write, re-raising any writer error."""

    def __init__(self):
        self._thread = None
        self._exc: BaseException | None = None

    def submit(self, prefix: str, it: int, params, state=None, diffs=None,
               extra=None):
        """`extra`: optional no-arg callable run in the writer thread after
        the native snapshot lands (e.g. the reference-format .caffemodel/
        .solverstate export when snapshot_format is "caffe")."""
        import threading
        self.wait()

        def _run():
            try:
                snapshot(prefix, it, params, state, diffs)
                if extra is not None:
                    extra()
            except BaseException as e:  # surfaced at next wait()
                self._exc = e

        self._thread = threading.Thread(target=_run, daemon=True,
                                        name="vvtpu-snapshot")
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def load_model(path: str) -> dict:
    with np.load(path) as z:
        tree = _unflatten({k: z[k] for k in z.files})
    tree.pop("diff", None)  # snapshot_diff payload is side data, not params
    return tree


def load_diffs(path: str) -> dict | None:
    """Gradients stored by a snapshot_diff snapshot, or None."""
    with np.load(path) as z:
        tree = _unflatten({k: z[k] for k in z.files})
    return tree.get("diff")


def restore(state_path: str):
    """Returns (params, state) — the reference's `--snapshot` resume
    (ref:src/caffe/solver.cpp:419-429)."""
    with np.load(state_path) as z:
        flat = {k: z[k] for k in z.files}
    it = int(flat.pop("__iter__"))
    model_name = str(flat.pop("__model__"))
    model_path = os.path.join(os.path.dirname(state_path), model_name)
    params = load_model(model_path)
    history = _unflatten(flat)["history"]
    return params, {"iter": jnp.int32(it), "history": history}


def restore_solverstate(state_path: str, params_template: dict,
                        layer_order: list):
    """Resume from a REFERENCE `.solverstate` binary: momentum history +
    iter + the pointed-to `.caffemodel` weights, mapped onto our param
    pytree (ref:src/caffe/solver.cpp:419-429 Solver::Restore →
    RestoreSolverState :578-596). Returns (params, state).

    `layer_order`: param-carrying layer names in NET order — the history
    blobs are nameless and ordered like net_->params(). The learned_net
    path is tried as written, then relative to the solverstate's directory
    (the reference stores whatever snapshot_prefix produced)."""
    from videovector_tpu.data.netproto import (
        history_from_blobs, load_solverstate,
    )
    from videovector_tpu.data.weights import NetWeights, load_into_params

    it, learned_net, blobs = load_solverstate(state_path)
    model_path = learned_net
    if model_path and not os.path.exists(model_path):
        cand = os.path.join(os.path.dirname(os.path.abspath(state_path)),
                            os.path.basename(model_path))
        if os.path.exists(cand):
            model_path = cand
    if not model_path or not os.path.exists(model_path):
        raise FileNotFoundError(
            f"solverstate {state_path!r} points at learned_net "
            f"{learned_net!r}, which does not exist (also tried next to the "
            f"solverstate)")
    params = load_into_params(NetWeights.load(model_path), params_template)
    params = {ln: {pn: jnp.asarray(a) for pn, a in lp.items()}
              for ln, lp in params.items()}
    history_np = history_from_blobs(blobs, params_template, layer_order)
    history = {ln: {pn: jnp.asarray(a) for pn, a in lp.items()}
               for ln, lp in history_np.items()}
    return params, {"iter": jnp.int32(it), "history": history}


def export_orbax_snapshot(prefix: str, it: int, params: dict, state: dict):
    """Write `<prefix>_iter_N.orbax` — an Orbax checkpoint directory
    (`{"params": ..., "history": ..., "iter": ...}`), the TPU-ecosystem
    production format: tensorstore-chunked, async-native, and the format
    multi-host sharded trainers restore shard-by-shard without a host
    gather. Written IN ADDITION to the native npz pair (snapshot_format:
    "orbax"), like the reference-interop "caffe" mode writes its
    .caffemodel/.solverstate pair. Returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(f"{prefix}_iter_{it}.orbax")
    tree = {"params": params, "history": state["history"],
            "iter": np.asarray(int(state["iter"]))}
    ck = ocp.StandardCheckpointer()
    ck.save(path, tree, force=True)  # same overwrite semantics as the npz
    ck.wait_until_finished()         # runs in the async snapshot thread
    return path


def restore_orbax(path: str):
    """Resume from an `.orbax` snapshot directory: returns (params, state)
    like `restore`."""
    import orbax.checkpoint as ocp

    got = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    params = jax.tree.map(jnp.asarray, got["params"])
    history = jax.tree.map(jnp.asarray, got["history"])
    return params, {"iter": jnp.int32(int(got["iter"])), "history": history}


def export_caffe_snapshot(prefix: str, it: int, params: dict, state: dict,
                          net_msg, layer_order: list):
    """Write a reference-consumable snapshot pair:
    `<prefix>_iter_N.caffemodel` (full NetParameter: configs + blobs,
    Net::ToProto) and `<prefix>_iter_N.solverstate` (iter + learned_net +
    ordered momentum history) — `caffe train --snapshot=<...>.solverstate`
    on the reference resumes our training run with momentum intact
    (ref:src/caffe/solver.cpp:321-341). Returns (model_path, state_path)."""
    from videovector_tpu.data.netproto import save_net, save_solverstate

    os.makedirs(os.path.dirname(os.path.abspath(prefix)) or ".",
                exist_ok=True)
    model_path = f"{prefix}_iter_{it}.caffemodel"
    save_net(model_path, net_msg, jax.tree.map(np.asarray, params))
    state_path = f"{prefix}_iter_{it}.solverstate"
    save_solverstate(state_path, int(state["iter"]),
                     jax.tree.map(np.asarray, state["history"]),
                     model_path, layer_order)
    return model_path, state_path
