"""Net — the graph engine.

Interprets a Caffe-style NetParameter (parsed by config/textformat) into a
single pure function `apply(params, batch, rng) -> (blobs, loss)`, the
TPU-native equivalent of `Net::Init` + `ForwardFromTo`
(ref:src/caffe/net.cpp:34-224, :502-543). Differences by design:

- No InsertSplits (ref:src/caffe/util/insert_splits.cpp): fan-out of an
  immutable array needs no copy layer.
- In-place layers (top == bottom) are name rebinding.
- Backward is `jax.grad` of the loss — the reference's loss-reachability
  pruning (net.cpp:154-186) corresponds to autodiff's dead-code elimination.
- Data-layer tops are *graph inputs* fed by the host data pipeline, mirroring
  the prefetch-thread boundary (ref:src/caffe/layers/base_data_layer.cpp:52-95)
  at the jit boundary instead.

Phase filtering (`include`/`exclude` NetStateRule, ref:src/caffe/net.cpp:226-329,
rules caffe.proto:193-209) is applied at construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import Message
from videovector_tpu.graph.layers import (
    LAYERS, DATA_LAYER_TYPES, ApplyContext,
)
from videovector_tpu.metrics.retrieval import IdToClassMap
from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _state_meets_rule(rule: Message, phase: str, level: int, stages: set) -> bool:
    """ref:src/caffe/net.cpp:271-329 (StateMeetsRule)."""
    if rule.has("phase") and rule.get("phase") != phase:
        return False
    if rule.has("min_level") and level < int(rule.get("min_level")):
        return False
    if rule.has("max_level") and level > int(rule.get("max_level")):
        return False
    for s in rule.get_list("stage"):
        if s not in stages:
            return False
    for s in rule.get_list("not_stage"):
        if s in stages:
            return False
    return True


def filter_layers(net_msg: Message, phase: str, level: int = 0,
                  stages: tuple = ()) -> list[Message]:
    """ref:src/caffe/net.cpp:226-268 (FilterNet): a layer with include rules
    is kept iff ANY include rule matches; otherwise it is dropped iff any
    exclude rule matches."""
    stages_set = set(stages)
    kept = []
    for layer in net_msg.get_list("layers") + net_msg.get_list("layer"):
        includes = layer.get_list("include")
        excludes = layer.get_list("exclude")
        if includes:
            keep = any(_state_meets_rule(r, phase, level, stages_set)
                       for r in includes)
        else:
            keep = not any(_state_meets_rule(r, phase, level, stages_set)
                           for r in excludes)
        if keep:
            kept.append(layer)
    return kept


@dataclass
class ParamMeta:
    """lr/decay multipliers per layer blob (ref blobs_lr / weight_decay
    repeated fields on V1 LayerParameter; net.cpp:467-499)."""
    lr_mult: float = 1.0
    decay_mult: float = 1.0
    shared_owner: str | None = None  # layer name that owns the array, if shared
    shared_shape: tuple | None = None  # consumer's own blob shape, when it
    # differs from the owner's (PERMISSIVE count-matched share; Caffe gives
    # each consumer its own Blob shape over the shared data, net.cpp:405-464)


class Net:
    """A compiled view of a NetParameter for one phase."""

    def __init__(self, net_msg: Message, phase: str = "TRAIN", *,
                 level: int = 0, stages: tuple = (), side: dict | None = None,
                 compute_dtype=None, fuse_scoring: bool = True):
        # compute_dtype: None = f32 (reference numerics). "bfloat16" casts
        # GEMM/conv operands (f32 accumulation stays) — the TPU throughput
        # extension, wired from the solver prototxt's `compute_dtype` field
        import jax.numpy as _jnp
        self.compute_dtype = (_jnp.dtype(compute_dtype)
                              if compute_dtype is not None else None)
        # scoring-head fusion (graph/fuse.py): batch the post-tower
        # SLICE/NORMALIZATION/PROD/SUM score motif into role-major ops —
        # same math, native-model HLO structure (PERF.md r4)
        from videovector_tpu.graph.fuse import fusion_enabled
        self.fuse_scoring = bool(fuse_scoring) and fusion_enabled()
        # int8 PTQ side-table (tools/quantize.py), set by the serving
        # exporter after calibration; None = f32/bf16 math
        self.quant = None
        # input blobs the caller feeds role-major: the batch carries
        # (R, B, feat...) for a blob whose logical shape is (B, R, feat...).
        # apply() binds the logical view (moveaxis — correct for any
        # consumer) and hands the raw array to the scoring fusion, which
        # absorbs the leading SLICE(dim1)/CONCAT(dim0) into a free reshape
        # (XLA DCEs the unused moveaxis). Set by SolverDriver
        # (role_major_data) or directly by benchmarks.
        self.role_major_inputs: tuple = ()
        # legacy V0 auto-upgrade on load (ref ReadNetParamsFromTextFileOrDie →
        # UpgradeV0Net, util/upgrade_proto.cpp)
        from videovector_tpu.config.upgrade import net_needs_upgrade, upgrade_net
        if net_needs_upgrade(net_msg):
            log.info("Upgrading legacy V0 NetParameter")
            net_msg = upgrade_net(net_msg)
        self.name = net_msg.get("name", "net")
        self.phase = phase
        self.layers = filter_layers(net_msg, phase, level, stages)
        self.side = dict(side or {})
        self._load_side_tables()

        # graph inputs: NetParameter-level `input`/`input_dim` plus all tops of
        # data layers
        self.input_names: list[str] = list(net_msg.get_list("input"))
        self.data_layer_tops: dict[str, list[str]] = {}
        for layer in self.layers:
            if layer.get("type") in DATA_LAYER_TYPES:
                tops = [str(t) for t in layer.get_list("top")]
                self.data_layer_tops[layer.get("name")] = tops
                self.input_names.extend(tops)
                if layer.get("type") == "MEMORY_DATA" \
                        and layer.has("memory_data_param"):
                    # ref memory_data_layer.cpp:18-20 CHECK_GT(batch_size *
                    # channels * height * width, 0). A param-less
                    # MEMORY_DATA stays the documented extension: shapes
                    # come from the fed batch (our Reset() equivalent).
                    mp = layer.get_msg("memory_data_param")
                    dims = [int(mp.get(k, 0) or 0) for k in
                            ("batch_size", "channels", "height", "width")]
                    if min(dims) <= 0:
                        raise ValueError(
                            f"layer {layer.get('name')!r}: batch_size, "
                            f"channels, height, and width must be specified "
                            f"and positive in memory_data_param (got "
                            f"{dims}; ref memory_data_layer.cpp:18-20)")

        # host sinks (WRITE_TO_FILE / HDF5_OUTPUT): dumped host-side from the
        # returned blobs (jit graphs cannot do file IO)
        from videovector_tpu.graph.layers import SINK_LAYER_TYPES
        self.host_sinks = [
            {"name": l.get("name"), "type": l.get("type"),
             "bottoms": [str(b) for b in l.get_list("bottom")], "cfg": l}
            for l in self.layers if l.get("type") in SINK_LAYER_TYPES
        ]
        for s in self.host_sinks:
            # reference count contracts: WriteToFile takes exactly one
            # bottom (ref:include/caffe/loss_layers.hpp:35), HDF5Output
            # exactly two, data + label (ref:include/caffe/
            # data_layers.hpp:700) — a different count would silently
            # write files the reference's format never produces
            want = 1 if s["type"] == "WRITE_TO_FILE" else 2
            if len(s["bottoms"]) != want:
                raise ValueError(
                    f"layer {s['name']!r} ({s['type']}): expected exactly "
                    f"{want} bottom blob(s), got {len(s['bottoms'])} "
                    f"(the reference CHECKs ExactNumBottomBlobs)")
        # stats layers with stats_output_file also dump a per-item csv
        # (ref:src/caffe/layers/retrieval_stats_layer.cpp:148-155,310-340,
        # retrieval_rank_stats_layer.cpp:188-268,
        # retrieval_rank_stats_fixed_ref_layer.cpp:120-221)
        _stats_param = {
            "RETRIEVAL_STATS": "retrieval_stats_param",
            "RETRIEVAL_RANK_STATS": "retrieval_rank_stats_param",
            "RETRIEVAL_RANK_STATS_FIXED_REF":
                "retrieval_rank_stats_fixed_ref_param",
        }
        self.host_sinks += [
            {"name": l.get("name"), "type": l.get("type"),
             "bottoms": [str(b) for b in l.get_list("bottom")], "cfg": l}
            for l in self.layers
            if l.get("type") in _stats_param
            and l.get_msg(_stats_param[l.get("type")]).get("stats_output_file")
        ]

        # AutoTopBlobs (ref:include/caffe/layer.hpp:258 + net.cpp AppendTop):
        # loss layers may omit `top:`; auto-name the implicit loss tops.
        # Copy-on-write: the caller's NetParameter Messages must not gain
        # synthetic tops (serializing/diffing the config afterwards would
        # emit tops the user never wrote)
        for li, layer in enumerate(self.layers):
            ldef = LAYERS.get(layer.get("type"))
            if (ldef is not None and ldef.default_loss_weights
                    and not layer.get_list("top")):
                from videovector_tpu.config.textformat import Message
                copy = Message()
                for k, vals in layer.fields.items():
                    for v in vals:
                        copy.add(k, v)
                for i in range(len(ldef.default_loss_weights)):
                    copy.add("top", f"{layer.get('name')}_auto_top_{i}")
                self.layers[li] = copy

        # loss weights per (layer, top index)
        self.loss_weights: dict[str, list[float]] = {}
        for layer in self.layers:
            ltype = layer.get("type")
            if ltype in DATA_LAYER_TYPES:
                continue
            n_top = len(layer.get_list("top"))
            given = [float(v) for v in layer.get_list("loss_weight")]
            ldef = LAYERS.get(ltype)
            defaults = list(ldef.default_loss_weights or ()) if ldef else []
            weights = []
            for i in range(n_top):
                if i < len(given):
                    weights.append(given[i])
                elif i < len(defaults):
                    weights.append(defaults[i])
                else:
                    weights.append(0.0)
            self.loss_weights[layer.get("name")] = weights

        self._check_types()

    def output_loss_weights(self) -> dict[str, float]:
        """blob name -> loss weight of its (latest) producing top — the
        reference's blob_loss_weights_ lookup behind the display suffix
        '(* w = x loss)' on loss-weighted output lines
        (ref:src/caffe/solver.cpp:204-214, tools/caffe.cpp:177-185)."""
        out: dict[str, float] = {}
        for layer in self.layers:
            if layer.get("type") in DATA_LAYER_TYPES:
                continue
            ws = self.loss_weights.get(layer.get("name"), [])
            for i, t in enumerate(str(x) for x in layer.get_list("top")):
                out[t] = ws[i] if i < len(ws) else 0.0
        return out

    # ------------------------------------------------------------------
    def _check_types(self):
        for layer in self.layers:
            ltype = layer.get("type")
            if ltype in DATA_LAYER_TYPES:
                continue
            if ltype not in LAYERS:
                raise NotImplementedError(
                    f"layer type {ltype!r} (layer {layer.get('name')!r}) is not "
                    f"registered")

    def _load_side_tables(self):
        """Load csv side tables referenced by layer configs (id→class maps for
        retrieval stats, id→weight for max-margin, infogain H matrices).

        A path that is DECLARED but missing/empty is a hard error, matching
        the reference's CHECK-fail semantics — a typo'd csv must not silently
        degrade retrieval classes to raw video ids or margin weights to None
        (ref:src/caffe/layers/retrieval_stats_layer.cpp:48
        CHECK_GE(video_id_to_class_.size(), 1);
        max_margin_loss_layer.cpp:26-33; infogain_loss_layer.cpp:17-24).
        An UNSET id_to_class_file keeps the documented identity-classes
        extension (the reference proto marks the field `required`, so such a
        net cannot exist there; see projects/videovec_embedding/
        generate_net.py). Pre-seeding self.side[name] (the `side=` ctor arg)
        is the explicit opt-out for tests."""
        import os

        def _require(path, layer_name, what):
            if not os.path.exists(path):
                raise ValueError(
                    f"layer {layer_name!r}: {what} {path!r} does not exist "
                    f"(the reference CHECK-fails on a missing/empty side "
                    f"table; fix the path or pre-seed Net(side=...))")

        for layer in self.layers:
            name = layer.get("name")
            if name in self.side:
                continue
            rs = layer.get_msg("retrieval_stats_param")
            path = rs.get("id_to_class_file")
            if path:
                _require(path, name, "id_to_class_file")
                id_map = IdToClassMap.from_csv(path)
                if id_map.ids.shape[0] < 1:
                    raise ValueError(
                        f"layer {name!r}: id_to_class_file {path!r} has no "
                        f"entries (ref CHECK_GE(video_id_to_class_.size(), 1),"
                        f" retrieval_stats_layer.cpp:48)")
                self.side[name] = id_map
                continue
            ig = layer.get_msg("infogain_loss_param")
            path = ig.get("source")
            if path:
                _require(path, name, "infogain source")
                # infogain H matrix from a BlobProto binary
                # (ref:src/caffe/layers/infogain_loss_layer.cpp:18-24)
                from videovector_tpu.data.wire import BlobProto
                with open(path, "rb") as f:
                    blob = BlobProto.decode(f.read())
                arr = blob.to_array()
                self.side[name] = jnp.asarray(arr.reshape(
                    arr.shape[-2], arr.shape[-1]))
                continue
            if (layer.get("type") == "INFOGAIN_LOSS"
                    and len(layer.get_list("bottom")) < 3):
                raise ValueError(
                    f"layer {name!r}: INFOGAIN_LOSS with 2 bottoms needs "
                    f"infogain_loss_param.source (ref CHECK(has_source()), "
                    f"infogain_loss_layer.cpp:17-19)")
            mm = layer.get_msg("max_margin_loss_param")
            path = mm.get("id_to_weight_file")
            if path:
                _require(path, name, "id_to_weight_file")
                ids, ws = [], []
                with open(path) as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        a, b = line.split(",")
                        ids.append(int(a))
                        w = float(b)
                        if w < 0:  # ref CHECK_GE(weight, 0)
                            raise ValueError(
                                f"layer {name!r}: negative weight {w} in "
                                f"{path!r} (ref max_margin_loss_layer.cpp:34)")
                        ws.append(w)
                order = np.argsort(ids)
                self.side[name] = (
                    jnp.asarray(np.asarray(ids)[order], dtype=jnp.int32),
                    jnp.asarray(np.asarray(ws)[order], dtype=jnp.float32))

    # ------------------------------------------------------------------
    def batch_validators(self):
        """Host-side per-batch checks that the traced graph cannot perform.

        Currently: RETRIEVAL_STATS with video_level_retrieval needs the
        batch's distinct-video-id count to EQUAL max_num_videos — under jit,
        extra ids are silently dropped by segment_sum and missing segments
        pad with zeros, corrupting video-level mAP with no error. The
        reference CHECKs this at forward
        (ref:src/caffe/layers/retrieval_stats_layer.cpp:188). Returns a list
        of callables(batch_dict) to run on each HOST batch before it is fed
        to a jitted eval; they raise ValueError on violation."""
        from videovector_tpu.metrics.retrieval import check_num_videos
        validators = []
        for layer in self.layers:
            if layer.get("type") != "RETRIEVAL_STATS":
                continue
            p = layer.get_msg("retrieval_stats_param")
            if not bool(p.get("video_level_retrieval", False)):
                continue
            nv = int(p.get("max_num_videos", 0))
            bottoms = [str(b) for b in layer.get_list("bottom")]
            if len(bottoms) < 2:
                continue
            vid_blob = bottoms[1]

            def _check(batch, vid_blob=vid_blob, nv=nv):
                if vid_blob in batch:  # only checkable for graph-input ids
                    check_num_videos(np.asarray(batch[vid_blob]), nv)
            validators.append(_check)
        return validators

    # ------------------------------------------------------------------
    def init(self, key, batch_spec: dict[str, Any]):
        """Create params. batch_spec maps every graph-input blob name to an
        array or ShapeDtypeStruct. Returns (params, param_meta) where params
        is {layer_name: {blob_name: array}} and param_meta carries lr/decay
        multipliers and sharing info (ref AppendParam net.cpp:405-464)."""
        blobs: dict[str, Any] = {}
        for name in self.input_names:
            if name not in batch_spec:
                raise ValueError(f"batch_spec missing graph input {name!r}")
            spec = batch_spec[name]
            blobs[name] = jax.ShapeDtypeStruct(tuple(spec.shape), spec.dtype)

        params: dict[str, dict[str, Any]] = {}
        meta: dict[str, dict[str, ParamMeta]] = {}
        shared_owner_by_name: dict[str, tuple[str, str]] = {}
        ctx = ApplyContext(phase=self.phase, rng=jax.random.PRNGKey(0),
                           side=self.side, compute_dtype=self.compute_dtype)

        for layer in self.layers:
            ltype = layer.get("type")
            lname = layer.get("name")
            if ltype in DATA_LAYER_TYPES:
                continue
            bottoms = [str(b) for b in layer.get_list("bottom")]
            in_shapes = []
            for b in bottoms:
                if b not in blobs:
                    raise ValueError(
                        f"layer {lname!r} bottom {b!r} not produced yet")
                in_shapes.append(blobs[b].shape)

            ldef = LAYERS[ltype]
            key, sub = jax.random.split(key)
            lparams = ldef.init(sub, layer, in_shapes)

            # named-param sharing (V1 `param:` strings on LayerParameter)
            share_names = [str(s) for s in layer.get_list("param")]
            lr_mults = [float(v) for v in layer.get_list("blobs_lr")]
            decay_mults = [float(v) for v in layer.get_list("weight_decay")]
            # a non-empty multiplier list must cover every param blob
            # exactly, and multipliers are non-negative — the reference
            # CHECK_EQs/CHECK_GEs (net.cpp:467-499); silently defaulting a
            # missing entry to 1 would leave a blob the user meant to
            # freeze trainable
            for fname, mults in (("blobs_lr", lr_mults),
                                 ("weight_decay", decay_mults)):
                if mults and len(mults) != len(lparams):
                    raise ValueError(
                        f"layer {lname!r}: {fname} has {len(mults)} entries "
                        f"for {len(lparams)} param blobs (the reference "
                        f"CHECK_EQs the counts, net.cpp:472-496)")
                if any(v < 0 for v in mults):
                    raise ValueError(
                        f"layer {lname!r}: negative {fname} multiplier "
                        f"(reference CHECK_GE, net.cpp:476,491)")
            lmeta: dict[str, ParamMeta] = {}
            for i, pname in enumerate(list(lparams.keys())):
                m = ParamMeta(
                    lr_mult=lr_mults[i] if i < len(lr_mults) else 1.0,
                    decay_mult=decay_mults[i] if i < len(decay_mults) else 1.0)
                if i < len(share_names) and share_names[i]:
                    sname = share_names[i]
                    if sname in shared_owner_by_name:
                        owner_layer, owner_blob = shared_owner_by_name[sname]
                        owned = params[owner_layer][owner_blob]
                        modes = layer.get_list("blob_share_mode")
                        mode = str(modes[i]) if i < len(modes) else "STRICT"
                        if owned.shape != lparams[pname].shape:
                            # PERMISSIVE: element-count match suffices
                            # (ref AppendParam net.cpp:405-464, DimCheckMode)
                            if mode != "PERMISSIVE" or \
                                    owned.size != lparams[pname].size:
                                raise ValueError(
                                    f"shared param {sname!r} shape mismatch: "
                                    f"{owned.shape} vs {lparams[pname].shape}")
                            m.shared_shape = tuple(lparams[pname].shape)
                        del lparams[pname]
                        m.shared_owner = owner_layer
                    else:
                        shared_owner_by_name[sname] = (lname, pname)
                lmeta[pname] = m
            if lparams:
                params[lname] = lparams
            if lmeta:
                meta[lname] = lmeta

            # shape inference via eval_shape of the layer apply
            resolved = self._resolve_params(params, meta, lname)
            outs = jax.eval_shape(
                lambda p, xs: ldef.apply(p, xs, layer, ctx),
                resolved, [blobs[b] for b in bottoms])
            tops = [str(t) for t in layer.get_list("top")]
            for t, o in zip(tops, outs):
                blobs[t] = o

        self._blob_shapes = blobs
        self.param_meta = meta
        return params, meta

    def _resolve_params(self, params, meta, lname):
        """Materialize a layer's param dict, following shared_owner links."""
        out = dict(params.get(lname, {}))
        for pname, m in meta.get(lname, {}).items():
            if m.shared_owner is not None:
                # owner stores it under the same blob name by construction
                arr = params[m.shared_owner][pname]
                if m.shared_shape is not None:
                    # PERMISSIVE count-matched share: view the owner's data
                    # through this consumer's blob shape (Caffe keeps a
                    # per-consumer Blob shape over shared storage)
                    arr = arr.reshape(m.shared_shape)
                out[pname] = arr
        return out

    # ------------------------------------------------------------------
    def apply(self, params, batch: dict[str, Any], *, rng=None,
              return_blobs: bool = False, state=None,
              return_state: bool = False, max_layers: int | None = None,
              return_sink_blobs: bool = False):
        """Forward pass. Returns (loss, outputs) where outputs maps every
        blob name that is not consumed downstream (net outputs,
        ref:src/caffe/net.cpp:206-212) — or all blobs if return_blobs.

        `state` is the cross-batch recurrent carry (layer_name → LstmState,
        the reference's next_cell_/next_out_ buffers,
        ref:src/caffe/layers/lstm_layer.cpp:171-173,261-264); with
        `return_state=True` the result gains a third element: the updated
        carry to feed into the next forward.

        `max_layers` stops after the first N compute layers (the engine
        analogue of Net::ForwardFromTo, ref:src/caffe/net.cpp:502-514) —
        used by the segmented `vvtpu time` benchmark.

        `return_sink_blobs` appends one more element: the host-sink
        bottom blobs ({name: array}), for feeding process_host_sinks
        from a jitted eval step."""
        blobs: dict[str, Any] = {}
        rm_raw: dict[str, Any] = {}
        for name in self.input_names:
            if name not in batch:
                raise ValueError(f"batch missing graph input {name!r}")
            arr = batch[name]
            if name in self.role_major_inputs and hasattr(arr, "ndim") \
                    and arr.ndim >= 2:
                # fed (R, B, feat...): bind the logical (B, R, feat...)
                # view; the fusion gets the raw array (see __init__ note)
                rm_raw[name] = arr
                arr = jnp.moveaxis(arr, 0, 1)
            blobs[name] = arr

        ctx = ApplyContext(phase=self.phase, rng=rng, side=self.side,
                           state_in=state, compute_dtype=self.compute_dtype,
                           quant=self.quant)
        loss = jnp.float32(0.0)
        consumed: set[str] = set()

        # scoring-head fusion (graph/fuse.py): absorbable motif layers run
        # symbolically; their blobs materialize batched on first real use.
        # Disabled for layer-prefix runs (`vvtpu time` marginals must see
        # the per-layer graph).
        fz = None
        if self.fuse_scoring and max_layers is None:
            from videovector_tpu.graph.fuse import ScoringFusion
            fz = ScoringFusion(role_major=rm_raw)

        applied = 0
        for layer in self.layers:
            ltype = layer.get("type")
            lname = layer.get("name")
            if ltype in DATA_LAYER_TYPES:
                continue
            if max_layers is not None and applied >= max_layers:
                break
            applied += 1
            bottoms = [str(b) for b in layer.get_list("bottom")]
            consumed.update(bottoms)
            # re-producing a blob (in-place top) makes it available again
            # — the reference erases bottoms from available_blobs and
            # re-inserts tops (net.cpp AppendBottom/AppendTop), so a net
            # ENDING in an in-place layer still reports that blob as a
            # net output (net.cpp:206-212)
            consumed.difference_update(str(t) for t in layer.get_list("top"))
            if fz is not None and fz.try_absorb(
                    layer, blobs,
                    self.loss_weights.get(lname, [])) is not None:
                continue
            if fz is not None:
                for b in bottoms:
                    if b not in blobs and b in fz.syms:
                        blobs[b] = fz.materialize(b)
            ldef = LAYERS[ltype]
            lparams = self._resolve_params(params, self.param_meta, lname) \
                if hasattr(self, "param_meta") else params.get(lname, {})
            outs = ldef.apply(lparams, [blobs[b] for b in bottoms], layer, ctx)
            tops = [str(t) for t in layer.get_list("top")]
            weights = self.loss_weights.get(lname, [])
            for i, (t, o) in enumerate(zip(tops, outs)):
                blobs[t] = o
                if fz is not None:
                    # real rebinding kills the symbol, invalidates a raw
                    # role-major input of the same name (an in-place layer
                    # before the SLICE(dim1) must make the slice run on
                    # ITS output, not absorb the stale pre-transform
                    # array), and bumps the root version so a later
                    # SLICE(dim0) of this name captures the new value
                    fz.note_rebind(t)
                w = weights[i] if i < len(weights) else 0.0
                if w != 0.0:
                    loss = loss + w * jnp.sum(o)

        if fz is not None:
            # any live symbol that nothing consumed is a net output (or,
            # with return_blobs, part of the requested full blob map)
            for name in list(fz.syms):
                if name not in blobs and (return_blobs or name not in consumed):
                    blobs[name] = fz.materialize(name)
        # introspection (tests/logs): how many layers ran symbolically
        self._last_absorbed = fz.absorbed_layers if fz is not None else 0

        # host-sink bottoms (e.g. RETRIEVAL_STATS consumes its features
        # in-graph, so they are absent from `outputs`): appended as a
        # final {blob: array} element so eval loops can run
        # process_host_sinks without fetching every intermediate blob
        tail = ()
        if return_sink_blobs:
            tail = ({b: blobs[b] for s in self.host_sinks
                     for b in s["bottoms"]},)
        if return_state:
            if return_blobs:
                return (loss, blobs, dict(ctx.state_out)) + tail
            outputs = {k: v for k, v in blobs.items() if k not in consumed}
            return (loss, outputs, dict(ctx.state_out)) + tail
        if return_blobs:
            return (loss, blobs) + tail
        outputs = {k: v for k, v in blobs.items() if k not in consumed}
        return (loss, outputs) + tail

    def role_major_candidates(self, batch) -> list[str]:
        """Input blobs eligible for the role-major feed: consumed by a
        SLICE(dim1) into all-width-1 slices that the scoring fusion can
        absorb (graph/fuse.py drole symbols). Used by SolverDriver's
        `role_major_data` option to pick which batch keys to transpose."""
        if not self.fuse_scoring:
            return []
        out = []
        for layer in self.layers:
            if layer.get("type") != "SLICE":
                continue
            p = layer.get_msg("slice_param")
            if int(p.get("slice_dim", 1)) != 1:
                continue
            src = str(layer.get_list("bottom")[0])
            tops = [str(t) for t in layer.get_list("top")]
            arr = batch.get(src)
            if src not in self.input_names or arr is None \
                    or getattr(arr, "ndim", 0) < 2 \
                    or arr.shape[1] != len(tops):
                continue
            points = [int(v) for v in p.get_list("slice_point")]
            if points and points != list(range(1, len(tops))):
                continue
            out.append(src)
        return out

    @property
    def stateful_layer_names(self) -> list:
        """Names of layers that carry recurrent state across batches."""
        from videovector_tpu.graph.layers import STATEFUL_LAYER_TYPES
        return [str(l.get("name")) for l in self.layers
                if l.get("type") in STATEFUL_LAYER_TYPES]

    def loss_fn(self, params, batch, rng=None):
        loss, _ = self.apply(params, batch, rng=rng)
        return loss

    def debug_info(self, params, batch, *, rng=None):
        """Per-blob mean-abs activation stats, the analogue of Caffe's
        `debug_info` forward printing (ref:src/caffe/net.cpp:581-636).
        Returns {blob_name: mean_abs} plus {layer/param: mean_abs}."""
        import jax
        import jax.numpy as jnp
        if rng is None and self.phase == "TRAIN":
            rng = jax.random.PRNGKey(0)  # dropout needs an rng at TRAIN
        _, blobs = self.apply(params, batch, rng=rng, return_blobs=True)
        stats = {name: float(jnp.mean(jnp.abs(v)))
                 for name, v in blobs.items()}
        for lname, lp in params.items():
            for pname, arr in lp.items():
                stats[f"param:{lname}/{pname}"] = float(jnp.mean(jnp.abs(arr)))
        for name, value in sorted(stats.items()):
            log.info("    [debug_info] %s: mean abs = %g", name, value)
        return stats

    def process_host_sinks(self, blobs: dict, *, append: bool = False,
                           mesh=None, shard_gallery: bool = False):
        """Dump sink-layer bottoms (call with `return_blobs=True` outputs).
        WRITE_TO_FILE → csv (ref write_to_file_layer.cpp:36-64);
        HDF5_OUTPUT → .h5 (ref hdf5_output_layer.cpp);
        RETRIEVAL_STATS stats_output_file → per-query report csv.

        The reference truncates each sink file on every Forward
        (default-mode ofstream::open, write_to_file_layer.cpp:42,
        retrieval_stats_layer.cpp:150) — so does append=False (the
        default); append=True accumulates WRITE_TO_FILE rows across
        calls instead (an extension for multi-batch eval loops).
        `mesh` shards the RETRIEVAL_STATS report's query chunks over the
        mesh's "data" axis (see metrics.retrieval._mesh_scan);
        `shard_gallery=True` shards its gallery rows instead (per-device
        memory N·D/ndev, metrics.retrieval._chunk_counts_gshard)."""
        import os
        import numpy as np
        for sink in self.host_sinks:
            cfg = sink["cfg"]
            if sink["type"] == "WRITE_TO_FILE":
                wp = cfg.get_msg("write_to_file_param")
                path = wp.get("output_file", f"{sink['name']}.csv")
                mode = "a" if append else "w"
                header = (not append or not os.path.exists(path)
                          or os.path.getsize(path) == 0)
                with open(path, mode) as f:
                    for bname in sink["bottoms"]:
                        arr = np.asarray(blobs[bname])
                        # reference blob view (N, C, H, W): a 2-D (N, F)
                        # blob is (N, F, 1, 1); feat = H·W unless the
                        # feat_size param caps it (write_to_file_layer.
                        # cpp:21-25)
                        n_ = arr.shape[0]
                        c_ = arr.shape[1] if arr.ndim > 1 else 1
                        flat = arr.reshape(n_, c_, -1)
                        feat = int(wp.get("feat_size", -1))
                        if feat <= 0:
                            feat = flat.shape[2]
                        if header:
                            f.write(f"#batch_id,channel_id,"
                                    f"features(1..{feat})\n")
                        lines = []
                        # channel-major rows starting "c,b" — yes, the
                        # reference's header names batch_id first but its
                        # loop writes channel first (:49-52); preserved
                        # byte-for-byte
                        for c in range(c_):
                            for b in range(n_):
                                lines.append(
                                    f"{c},{b}," + ",".join(
                                        f"{float(v):g}"
                                        for v in flat[b, c, :feat]) + "\n")
                        f.write("".join(lines))
            elif sink["type"] == "HDF5_OUTPUT":
                from videovector_tpu.data.generic import hdf5_output
                path = cfg.get_msg("hdf5_output_param").get(
                    "file_name", f"{sink['name']}.h5")
                # reference dataset names are FIXED — "data" from
                # bottom[0], "label" from bottom[1], equal batch size
                # (ref:src/caffe/layers/hdf5_output_layer.cpp:31-60) — so
                # an HDF5_DATA layer can read the file back
                data = np.asarray(blobs[sink["bottoms"][0]])
                label = np.asarray(blobs[sink["bottoms"][1]])
                if data.shape[0] != label.shape[0]:
                    raise ValueError(
                        f"HDF5_OUTPUT {sink['name']!r}: data and label "
                        f"batch sizes differ ({data.shape[0]} vs "
                        f"{label.shape[0]}; the reference CHECK_EQs them)")
                hdf5_output(path, {"data": data, "label": label})
            elif sink["type"] == "RETRIEVAL_STATS":
                from videovector_tpu.metrics.retrieval import (
                    retrieval_stats_report,
                )
                p = cfg.get_msg("retrieval_stats_param")
                # features stay ON DEVICE — the report's engines are
                # device programs; only ids come host-side
                feats = jnp.asarray(blobs[sink["bottoms"][0]])
                feats = feats.reshape(feats.shape[0], -1)
                vids = np.asarray(blobs[sink["bottoms"][1]]).reshape(-1)
                if bool(p.get("video_level_retrieval", False)):
                    from videovector_tpu.metrics.retrieval import (
                        check_num_videos, video_level_average,
                    )
                    nv = int(p.get("max_num_videos", 0))
                    # host-side twin of the reference's CHECK_EQ
                    # (retrieval_stats_layer.cpp:188)
                    check_num_videos(vids, nv)
                    vf, vv = video_level_average(feats, vids, nv)
                    feats = jnp.asarray(vf)
                    vids = np.asarray(vv).reshape(-1)
                id_map = self.side.get(sink["name"])
                classes = (np.asarray(id_map.lookup(
                    jnp.asarray(vids, jnp.int32)))
                    if id_map is not None else vids.astype(np.int64))
                retrieval_stats_report(
                    feats, vids, classes, p.get("stats_output_file"),
                    exclude_same_video_shots=bool(
                        p.get("exclude_same_video_shots", True)),
                    mesh=mesh, shard_gallery=shard_gallery,
                    # extension: `gallery_dtype: "bfloat16"` stores the
                    # gallery compact (half HBM — 250k-1M rows fit one
                    # chip); ranks exact w.r.t. the quantized distances
                    # (metrics.retrieval._cast_gallery_host)
                    gallery_dtype=str(p.get("gallery_dtype", "float32")
                                      or "float32"))
            elif sink["type"] == "RETRIEVAL_RANK_STATS":
                from videovector_tpu.metrics.retrieval import (
                    retrieval_rank_stats_report,
                )
                p = cfg.get_msg("retrieval_rank_stats_param")
                ctxf = jnp.asarray(blobs[sink["bottoms"][0]])
                tgtf = jnp.asarray(blobs[sink["bottoms"][1]])
                retrieval_rank_stats_report(
                    ctxf.reshape(ctxf.shape[0], -1),
                    tgtf.reshape(tgtf.shape[0], -1),
                    p.get("stats_output_file"),
                    compute_ap=bool(p.get("compute_ap", False)),
                    positive_size=int(p.get("positive_size", 0)),
                    negative_size=int(p.get("negative_size", 0)))
            elif sink["type"] == "RETRIEVAL_RANK_STATS_FIXED_REF":
                from videovector_tpu.metrics.retrieval import (
                    retrieval_rank_stats_fixed_ref_report,
                )
                p = cfg.get_msg("retrieval_rank_stats_fixed_ref_param")
                feats = jnp.asarray(blobs[sink["bottoms"][0]])
                reff = jnp.asarray(blobs[sink["bottoms"][2]])
                retrieval_rank_stats_fixed_ref_report(
                    feats.reshape(feats.shape[0], -1),
                    np.asarray(blobs[sink["bottoms"][1]]).reshape(-1),
                    reff.reshape(reff.shape[0], -1),
                    np.asarray(blobs[sink["bottoms"][3]]).reshape(-1),
                    p.get("stats_output_file"))

    # ------------------------------------------------------------------
    def flat_param_list(self, params):
        """(layer_name, blob_name, lr_mult, decay_mult) for every owned param,
        in deterministic order — the solver's view (ref net params vector)."""
        out = []
        for lname in sorted(params.keys()):
            for pname in sorted(params[lname].keys()):
                m = self.param_meta.get(lname, {}).get(pname, ParamMeta())
                out.append((lname, pname, m.lr_mult, m.decay_mult))
        return out
