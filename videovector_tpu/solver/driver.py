"""SolverDriver — end-to-end orchestration from prototxt files.

The `caffe train --solver=...` path (ref:tools/caffe.cpp:80-123 →
Solver::Init, src/caffe/solver.cpp:33-157): parse the solver prototxt, build
the TRAIN net and TEST net from the referenced net prototxt, construct host
data sources from the data-layer configs, and run the training loop with
test-interval evaluation, snapshots and resume/finetune.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.config.textformat import Message, parse_file
from videovector_tpu.graph.data_factory import MergedSource, make_data_source
from videovector_tpu.graph.layers import DATA_LAYER_TYPES
from videovector_tpu.graph.net import Net
from videovector_tpu.solver.solvers import SolverConfig
from videovector_tpu.solver.train import TrainResult, train
from videovector_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _spec_from_batch(batch):
    return {k: jax.ShapeDtypeStruct(v.shape, jnp.float32) for k, v in batch.items()}


_PHASE_NAMES = {"0": "TRAIN", "1": "TEST"}


def _merge_net_state(default_phase: str, *states):
    """(phase, level, stages) under proto MergeFrom semantics: each present
    scalar overwrites, repeated `stage` concatenates — the reference's
    NetState assembly (ref:src/caffe/solver.cpp:72-81, :141-152)."""
    phase, level, stages = default_phase, 0, []
    for st in states:
        if st is None:
            continue
        if st.has("phase"):
            p = str(st.get("phase"))
            phase = _PHASE_NAMES.get(p, p)
        if st.has("level"):
            level = int(st.get("level"))
        stages.extend(str(s) for s in st.get_list("stage"))
    return phase, level, tuple(stages)


class SolverDriver:
    def __init__(self, solver_msg: Message, *, net_dir: str = "."):
        self._solver_msg = solver_msg
        self._net_dir = net_dir
        self._prefetchers: list = []  # live DevicePrefetchers (closed per train())
        self.cfg = SolverConfig.from_message(solver_msg)
        # reference visualization/debug knobs (ref solver.cpp:183-193)
        self.snapshot_vis = int(solver_msg.get("snapshot_vis", 0) or 0)
        self.snapshot_vis_dir = solver_msg.get("snapshot_vis_dir", ".")
        # csv blob selection + sample truncation (ref solver.cpp:352-353,
        # 401-405: empty csv = all blobs; truncate_len 0 = the default)
        _vb = solver_msg.get("snapshot_vis_blobs", "") or ""
        self.snapshot_vis_blobs = [s for s in _vb.split(",") if s]
        self.snapshot_vis_truncate = int(
            solver_msg.get("snapshot_vis_truncate_len", 0) or 0)
        self.debug_info_every = (int(solver_msg.get("display", 0) or 0)
                                 if solver_msg.get("debug_info") else 0)

        def resolve(p):
            if p and not os.path.isabs(p):
                cand = os.path.join(net_dir, p)
                return cand if os.path.exists(cand) else p
            return p

        # exactly ONE of the four train-net fields (ref InitTrainNet
        # CHECK_GE/CHECK_LE, solver.cpp:47-55)
        fields = "net, net_param, train_net, train_net_param"
        n_train = sum(solver_msg.get(f) is not None
                      for f in ("net", "net_param", "train_net",
                                "train_net_param"))
        if n_train < 1:
            raise ValueError("SolverParameter must specify a train net "
                             f"using one of these fields: {fields}")
        if n_train > 1:
            raise ValueError("SolverParameter must not contain more than "
                             "one of these fields specifying a train_net: "
                             f"{fields}")
        inline = (solver_msg.get("net_param")
                  or solver_msg.get("train_net_param"))
        if inline is not None:
            self.net_msg = inline
        else:
            self.net_msg = parse_file(resolve(
                solver_msg.get("net") or solver_msg.get("train_net")))
        has_generic = (solver_msg.get("net") is not None
                       or solver_msg.get("net_param") is not None)
        # the train net's NetState: TRAIN, then the net's own `state`,
        # then solver `train_state` (highest precedence) — proto MergeFrom
        # semantics: scalars overwrite, repeated stages concatenate
        # (ref InitTrainNet, solver.cpp:72-81)
        self.train_state = _merge_net_state(
            "TRAIN", self.net_msg.get("state"),
            solver_msg.get("train_state"))

        # test-net instances (ref InitTestNets, solver.cpp:85-157):
        # dedicated test_net_param entries, then test_net files, then
        # (test_iter count − dedicated) instances of the GENERIC net; the
        # test_iter list must cover every instance
        inline_tests = list(solver_msg.get_list("test_net_param"))
        test_paths = [resolve(str(p)) for p in solver_msg.get_list("test_net")]
        n_dedicated = len(inline_tests) + len(test_paths)
        n_test_iter = len(solver_msg.get_list("test_iter"))
        if has_generic:
            if n_test_iter < n_dedicated:
                raise ValueError(
                    "test_iter must be specified for each test network.")
            n_instances = n_test_iter
        else:
            if n_test_iter != n_dedicated:
                raise ValueError(
                    "test_iter must be specified for each test network.")
            n_instances = n_dedicated
        self.test_net_msgs = (inline_tests
                              + [parse_file(p) for p in test_paths]
                              + [self.net_msg] * (n_instances - n_dedicated))
        test_states = list(solver_msg.get_list("test_state"))
        if test_states and len(test_states) != n_instances:
            raise ValueError("test_state must be unspecified or specified "
                             "once per test net.")
        self.test_net_states = [
            _merge_net_state("TEST", msg.get("state"),
                             test_states[i] if test_states else None)
            for i, msg in enumerate(self.test_net_msgs)]
        if n_instances and not solver_msg.get("test_interval"):
            # ref CHECK_GT(test_interval, 0) when test nets exist
            raise ValueError("test_interval must be > 0 when test nets "
                             "are specified")
        self.has_test = n_instances > 0

    @classmethod
    def from_prototxt(cls, solver_path: str) -> "SolverDriver":
        msg = parse_file(solver_path)
        return cls(msg, net_dir=os.getcwd())

    def rebuild(self) -> "SolverDriver":
        """Fresh driver over the same solver config — fresh nets, data
        sources, and params. Used by crash-restart recovery (`vvtpu train
        --max_restarts`): the restored snapshot supplies iter/params/
        momentum, everything else re-initializes like a process restart."""
        return type(self)(self._solver_msg,
                          net_dir=self._net_dir).build()

    # ------------------------------------------------------------------
    def build(self, *, seed: int | None = None):
        if seed is None:
            # SolverParameter.random_seed >= 0 seeds everything — fillers
            # and data-layer sampling, not just the train-loop rng
            # (ref:src/caffe/solver.cpp:37-39 Caffe::set_random_seed)
            rs = int(self.cfg.random_seed)
            seed = rs if rs >= 0 else 1234
        # extension: solver `compute_dtype: "bfloat16"` runs the TRAIN
        # net's GEMMs/convs on bf16 operands (f32 accumulation) — the TPU
        # throughput mode matching the hand model's compute_dtype. TEST
        # nets stay f32 so eval metrics keep reference numerics.
        cd = self._solver_msg.get("compute_dtype") or None
        tr_phase, tr_level, tr_stages = self.train_state
        self.train_net = Net(self.net_msg, phase=tr_phase, level=tr_level,
                             stages=tr_stages, compute_dtype=cd)
        self.train_source = self._build_sources(self.train_net, tr_phase,
                                                seed)
        batch0 = self.train_source.next_batch()
        self._first_batch = batch0
        # the batch consumed here for shape specs is RE-FED as training
        # iteration 0 (_data_iter first=). NOT redundant with
        # _first_batch: under role_major_data, _first_batch is rebound to
        # the TRANSPOSED view (for shape specs/vis) while the re-fed copy
        # must stay raw — the data iter's transform transposes it like
        # any other stream batch
        self._first_batch_raw = batch0
        # on-device negative sampler (data-layer `device_negatives: true`,
        # graph/data_factory.py): the host batch carries only (B, C, D)
        # target+context; the net sees (B, C+N, D) assembled inside the
        # jitted step from the device reservoir — widen its init spec
        self.device_negatives = getattr(self.train_source,
                                        "device_negatives", None)
        spec0 = _spec_from_batch(batch0)
        if self.device_negatives:
            dn = self.device_negatives
            s = spec0[dn["top"]].shape
            spec0[dn["top"]] = jax.ShapeDtypeStruct(
                (s[0], s[1] + dn["num_negatives"]) + tuple(s[2:]),
                jnp.float32)
            if self.snapshot_vis or self.debug_info_every:
                raise ValueError(
                    "device_negatives cannot combine with snapshot_vis/"
                    "debug_info (their hooks forward the raw host batch, "
                    "which has no negative channels)")
        params, meta = self.train_net.init(jax.random.PRNGKey(seed), spec0)
        self.params = params

        # extension: solver `role_major_data: true` feeds eligible data
        # blobs role-major ((R, B, feat...) instead of (B, R, feat...)) so
        # the leading SLICE/CONCAT absorbs to a reshape instead of a
        # per-step relayout (graph/fuse.py drole symbols) — the engine's
        # residual gap vs the native model (PERF.md r4). The host-side
        # transpose runs in the prefetch thread; loss/grads are bit-equal
        # (tested: tests/test_fuse.py role-major rows).
        self.role_major_keys: tuple = ()
        if self._solver_msg.get("role_major_data"):
            if self.device_negatives:
                raise ValueError(
                    "role_major_data cannot combine with device_negatives "
                    "(the device sampler assembles batch-major (B, C+N, D) "
                    "inside the step; role_major_data is a >=256-batch "
                    "relayout knob — drop one of the two)")
            cands = self.train_net.role_major_candidates(batch0)
            if cands:
                self.train_net.role_major_inputs = tuple(cands)
                self.role_major_keys = tuple(cands)
                self._first_batch = self._transpose_role_major(batch0)
            else:
                log.warning("role_major_data: no eligible SLICE(dim1) "
                            "data blob in the TRAIN net; feeding normally")

        self.test_nets = []
        self.test_sources = []
        self._test_first_batches: list = []
        if self.has_test:
            for i, msg in enumerate(self.test_net_msgs):
                te_phase, te_level, te_stages = self.test_net_states[i]
                test_net = Net(msg, phase=te_phase, level=te_level,
                               stages=te_stages)
                test_net.param_meta = {}
                source = self._build_sources(test_net, te_phase,
                                             seed + 1 + i)
                if getattr(source, "device_negatives", None):
                    raise ValueError(
                        "device_negatives is a TRAIN-net feature (the "
                        "reservoir rides the training carry channel); "
                        f"test net #{i} declares it — gate the layer "
                        "with include { phase: TRAIN } or drop the flag")
                # the test net reuses the train net's params (shared by layer
                # name — ref ShareTrainedLayersWith, net.cpp)
                tb = source.next_batch()
                test_net.init(jax.random.PRNGKey(0), _spec_from_batch(tb))
                self.test_nets.append(test_net)
                self.test_sources.append(source)
                self._test_first_batches.append(tb)

        # lr/decay multiplier pytrees
        self.lr_mults = {}
        self.decay_mults = {}
        for lname, lparams in params.items():
            self.lr_mults[lname] = {}
            self.decay_mults[lname] = {}
            for pname in lparams:
                m = self.train_net.param_meta.get(lname, {}).get(pname)
                self.lr_mults[lname][pname] = m.lr_mult if m else 1.0
                self.decay_mults[lname][pname] = m.decay_mult if m else 1.0
        return self

    def _build_sources(self, net: Net, phase: str, seed: int):
        sources = []
        for layer in net.layers:
            if layer.get("type") in DATA_LAYER_TYPES:
                sources.append(make_data_source(layer, phase=phase, seed=seed))
        if not sources:
            raise ValueError(f"no data layers in {phase} net")
        return MergedSource(sources)

    # ------------------------------------------------------------------
    def _transpose_role_major(self, batch):
        return {k: (np.ascontiguousarray(np.moveaxis(v, 1, 0))
                    if k in self.role_major_keys else v)
                for k, v in batch.items()}

    def _data_iter(self, source, sharding=None, validators=None,
                   transform=None, first=None):
        # background host batching + async H2D (double buffered), the
        # reference's prefetch-thread overlap at the jit boundary.
        # `validators`: host-side batch checks (Net.batch_validators) that
        # must run BEFORE the batch enters the jitted graph — e.g. the
        # video_level_retrieval distinct-id CHECK the traced layer cannot do
        from videovector_tpu.data.prefetch import DevicePrefetcher
        import itertools
        it = iter(source)
        if first is not None:
            # re-feed the batch build() consumed for shape specs (upstream
            # of validators/transform, which must see it like any other)
            it = itertools.chain([first], it)
        if validators:
            def _checked(inner):
                for b in inner:
                    for v in validators:
                        v(b)
                    yield b
            it = _checked(it)
        if transform:
            # after validators (they see the logical layout), before H2D —
            # runs in the prefetcher's background thread
            def _mapped(inner):
                for b in inner:
                    yield transform(b)
            it = _mapped(it)
        pf = DevicePrefetcher(it, depth=2, sharding=sharding)
        self._prefetchers.append(pf)
        return iter(pf)

    @staticmethod
    def _batch_shardings(probe_batch, axes, mesh):
        """Per-top NamedShardings honoring the batch axes dict.
        `probe_batch` supplies shapes (the first batch saved at build —
        consuming a fresh one here would desync the training stream)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def spec(v, k):
            dims = [None] * np.asarray(v).ndim
            dims[axes.get(k, 0)] = "data"
            return NamedSharding(mesh, P(*dims))

        return {k: spec(v, k) for k, v in probe_batch.items()}

    def train(self, *, resume_state_path: str | None = None,
              weights_path: str | None = None, max_iter: int | None = None,
              mesh=None, shard_gallery: bool = False) -> TrainResult:
        """With `mesh` (jax.sharding.Mesh with axes data/model), the batch is
        sharded over "data" and 2-D params column-sharded over "model" —
        prototxt training runs multi-chip with GSPMD collectives.
        `shard_gallery` shards the test-interval RETRIEVAL_STATS report's
        gallery rows over the mesh instead of its query chunks (per-device
        memory N·D/ndev — see metrics.retrieval)."""
        params = self.params
        if weights_path:  # finetune (ref tools/caffe.cpp:110-117)
            from videovector_tpu.data.weights import NetWeights, load_into_params
            from videovector_tpu.solver.checkpoint import load_model
            if weights_path.endswith(".vvmodel"):
                loaded = load_model(weights_path)
                # copy-not-mutate (a second train() on this driver must
                # start from the original init), and shape-check like the
                # NetWeights path — a stale .vvmodel would otherwise fail
                # later inside jit with an opaque shape error
                params = {ln: dict(lp) for ln, lp in params.items()}
                for lname, lp in loaded.items():
                    if lname not in params:
                        continue
                    for pname, arr in lp.items():
                        tgt = params[lname].get(pname)
                        if tgt is None:
                            # injecting a param init never produced would
                            # desync the pytree from lr_mults/decay_mults
                            # and fail later as a tree-structure error
                            raise ValueError(
                                f"finetune weights {weights_path!r}: layer "
                                f"{lname!r} has param {pname!r} the net "
                                f"does not (e.g. a bias for a "
                                f"bias_term:false layer)")
                        if tuple(arr.shape) != tuple(tgt.shape):
                            raise ValueError(
                                f"finetune weights {weights_path!r}: layer "
                                f"{lname!r} param {pname!r} has shape "
                                f"{tuple(arr.shape)}, net expects "
                                f"{tuple(tgt.shape)}")
                        params[lname][pname] = arr
            else:
                params = load_into_params(NetWeights.load(weights_path), params)
        cfg = self.cfg
        if max_iter is not None:
            from dataclasses import replace
            cfg = replace(cfg, max_iter=max_iter)

        net = self.train_net

        # sink layers in a TRAIN net write their files on every training
        # Forward in the reference (write_to_file_layer.cpp:36-64 runs in
        # whatever phase the net holds it) — feed their bottoms out of the
        # jitted step through the "__sinks__" aux channel
        train_sinks = bool(net.host_sinks)

        initial_carry = None
        if net.stateful_layer_names:
            if self.device_negatives:
                raise ValueError(
                    "device_negatives cannot combine with stateful "
                    "(cross-batch LSTM carry) nets — both need the carry "
                    "channel")

            # cross-batch LSTM state carry (ref lstm_layer.cpp:171-173):
            # carry rides the aux channel under a reserved key; train()
            # moves it from step output into the next step's batch
            def loss_fn(p, batch, key):
                carry_in = batch.get("__carry__")
                feed = {k: v for k, v in batch.items() if k != "__carry__"}
                loss, outputs, carry, *tail = net.apply(
                    p, feed, rng=key, state=carry_in, return_state=True,
                    return_sink_blobs=train_sinks)
                # every element of every output blob is a train metric
                # (ref solver.cpp:195-217 prints result[j]->count() lines)
                aux = {k: jnp.ravel(v) for k, v in outputs.items()}
                aux["__carry__"] = carry
                if train_sinks:
                    aux["__sinks__"] = tail[0]
                return loss, aux
        elif self.device_negatives:
            # on-device negative sampler: assemble the full (B, C+N, D)
            # batch inside the jitted step — negatives gathered from the
            # device reservoir, reservoir updated with this batch's
            # target+context rows, both riding the carry channel
            # (replaces the host reservoir ship,
            # ref:video_sampled_shots_data_layer.cpp:885-905)
            from videovector_tpu.data.device_sampler import (
                DeviceReservoir, train_batch_with_device_negatives,
            )
            dn = self.device_negatives
            dn_top, dn_n = dn["top"], int(dn["num_negatives"])
            dn_swap = float(dn["swap_percentage"])

            def loss_fn(p, batch, key):
                buf = batch["__carry__"]
                host = batch[dn_top]
                trailing1 = host.ndim == 4  # (B, C, D, 1) feed
                h3 = host[..., 0] if trailing1 else host
                k_neg, k_net = jax.random.split(key)
                full, res = train_batch_with_device_negatives(
                    DeviceReservoir(buf, dn_swap), k_neg, h3, dn_n)
                if trailing1:
                    full = full[..., None]
                feed = {k: v for k, v in batch.items() if k != "__carry__"}
                feed[dn_top] = full
                loss, aux = self._loss_with_outputs(net, p, feed, k_net,
                                                    sinks=train_sinks)
                aux["__carry__"] = res.buffer
                return loss, aux

            initial_carry = jnp.asarray(dn["buffer"])
            if resume_state_path:
                # the reservoir is NOT in the snapshot: resume restarts it
                # from the initial reference fill — the same semantics as
                # the reference's host reservoir, which lives in data-layer
                # memory and is rebuilt on every process restart
                # (ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:
                # 268-361 refills at LayerSetUp; SolverState carries only
                # iter/weights/history, caffe.proto:176-180). Say so loudly
                # rather than resetting silently mid-training.
                log.warning(
                    "resume with device_negatives: the device reservoir "
                    "restarts from the initial fill (not snapshotted — "
                    "matching the reference's host reservoir, rebuilt on "
                    "every restart); the negative distribution re-warms "
                    "over the next ~buffer_size/batch steps")
            if mesh is not None:
                # replicate the reservoir over the mesh — an uncommitted
                # single-device buffer entering a GSPMD step would pin it
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                initial_carry = jax.device_put(
                    initial_carry, NamedSharding(mesh, P()))
        else:
            def loss_fn(p, batch, key):
                return self._loss_with_outputs(net, p, batch, key,
                                               sinks=train_sinks)

        eval_fn = None
        test_iter = None
        if self.test_nets:
            include_loss = self.cfg.test_compute_loss

            def make_eval(test_net):
                stateful = bool(test_net.stateful_layer_names)
                sinks = bool(test_net.host_sinks)

                def eval_fn(p, batch):
                    carry_in = batch.get("__carry__")
                    feed = {k: v for k, v in batch.items()
                            if k != "__carry__"}
                    if stateful:
                        loss, outputs, carry, *tail = test_net.apply(
                            p, feed, state=carry_in, return_state=True,
                            return_sink_blobs=sinks)
                    else:
                        loss, outputs, *tail = test_net.apply(
                            p, feed, return_sink_blobs=sinks)
                    # every element of every output blob accumulates into
                    # the test report (ref Solver::Test solver.cpp:280-315;
                    # size-1 blobs behave exactly as before)
                    out = {k: jnp.ravel(v) for k, v in outputs.items()}
                    if include_loss:  # ref test_compute_loss, caffe.proto:116
                        out["loss"] = loss
                    if stateful:
                        out["__carry__"] = carry
                    if sinks:  # sink-layer bottoms for process_host_sinks
                        out["__sinks__"] = tail[0]
                    return out
                return eval_fn

            eval_fn = [make_eval(n) for n in self.test_nets]
            test_iter = [self._data_iter(s, validators=n.batch_validators(),
                                         first=fb)
                         for n, s, fb in zip(self.test_nets,
                                             self.test_sources,
                                             self._test_first_batches)]

        hooks = []
        if self.snapshot_vis:
            import os
            from videovector_tpu.tools.vis_snapshot import vis_snapshot

            def vis_hook(p, it):
                import jax
                os.makedirs(self.snapshot_vis_dir, exist_ok=True)
                # TRAIN-phase forward: dropout needs an rng (the engine
                # rejects silent no-dropout); seed by iteration so dumps
                # are reproducible
                _, blobs = net.apply(p, self._first_batch_jnp(),
                                     rng=jax.random.PRNGKey(it),
                                     return_blobs=True)
                vis_snapshot(net, p, blobs, os.path.join(
                    self.snapshot_vis_dir, f"vis_iter_{it}.json"),
                    vis_blobs=self.snapshot_vis_blobs,
                    max_elements=self.snapshot_vis_truncate or 64)

            hooks.append((self.snapshot_vis, vis_hook))
        if self.debug_info_every:
            hooks.append((self.debug_info_every,
                          lambda p, it: net.debug_info(
                              p, self._first_batch_jnp())))

        # batch-axis map for microbatch splitting + mesh sharding; the
        # role-major feed moves those keys' batch dim from 0 to 1
        src_axes = dict(self.train_source.batch_axes()
                        if hasattr(self.train_source, "batch_axes") else {})
        for k in self.role_major_keys:
            src_axes[k] = 1
        rm_transform = (self._transpose_role_major
                        if self.role_major_keys else None)

        train_validators = net.batch_validators()
        if mesh is None:
            data_iter = self._data_iter(self.train_source,
                                        transform=rm_transform,
                                        validators=train_validators,
                                        first=self._first_batch_raw)
        else:
            from videovector_tpu.parallel.train import shard_params
            params = shard_params(params, mesh,
                                  model_axis=mesh.shape.get("model", 1) > 1)
            # the prefetcher places batches DIRECTLY with the mesh sharding
            # — one async H2D per shard, no defaul-device detour
            data_iter = self._data_iter(
                self.train_source, transform=rm_transform,
                validators=train_validators, first=self._first_batch_raw,
                sharding=self._batch_shardings(
                    self._first_batch, src_axes, mesh))

        # param-carrying layers in NET order — the .solverstate history
        # blob order (ref net_->params(); src/caffe/solver.cpp:578-596)
        layer_order = [l.get("name") for l in net.layers
                       if l.get("name") in self.params]
        caffe_export = None
        fmt = str(cfg.snapshot_format).lower()
        if fmt == "caffe":
            from videovector_tpu.solver.checkpoint import export_caffe_snapshot
            net_msg = self.net_msg

            def caffe_export(it, p_np, s_np):
                export_caffe_snapshot(cfg.snapshot_prefix or "snapshot",
                                      it, p_np, s_np, net_msg, layer_order)
        elif fmt == "orbax":
            from videovector_tpu.solver.checkpoint import export_orbax_snapshot

            def caffe_export(it, p_np, s_np):
                export_orbax_snapshot(cfg.snapshot_prefix or "snapshot",
                                      it, p_np, s_np)
        elif fmt not in ("vv", ""):
            raise ValueError(
                f"unknown snapshot_format {cfg.snapshot_format!r} "
                "(expected vv, caffe, or orbax)")

        # fused iter_size/grad_microbatch accumulation (ONE scanned XLA
        # program per step) for stateless nets; stateful nets must thread
        # the LSTM carry between sub-batches on the host
        try:
            return train(loss_fn, params, data_iter, cfg,
                     lr_mults=self.lr_mults, decay_mults=self.decay_mults,
                     eval_fn=eval_fn, test_data=test_iter,
                     sink_fn=[(lambda blobs, n=tn: n.process_host_sinks(
                         blobs, mesh=mesh, shard_gallery=shard_gallery))
                         if tn.host_sinks else None
                         for tn in self.test_nets],
                     train_sink_fn=(
                         (lambda blobs: net.process_host_sinks(
                             blobs, mesh=mesh, shard_gallery=shard_gallery))
                         if train_sinks else None),
                     hooks=hooks,
                     resume_state_path=resume_state_path,
                     param_layer_order=layer_order,
                     caffe_export=caffe_export,
                     batch_axes=src_axes,
                     train_output_weights=net.output_loss_weights(),
                     test_output_weights=[tn.output_loss_weights()
                                          for tn in self.test_nets],
                     initial_carry=initial_carry,
                     # the carry (LSTM state / device reservoir) must
                     # thread between sub-batches on the host — the fused
                     # scan cannot carry it (build_fused_step rejects it)
                     fused_accum=not (net.stateful_layer_names
                                      or self.device_negatives))
        finally:
            # stop the prefetch threads and release their queued device
            # batches — over infinite sources they would otherwise live
            # (holding depth x device buffers + open DB readers) until
            # process exit, accumulating one per restart/rebuild
            for pf in self._prefetchers:
                pf.close()
            self._prefetchers.clear()

    def _first_batch_jnp(self):
        return {k: jnp.asarray(v) for k, v in self._first_batch.items()}

    @staticmethod
    def _loss_with_outputs(net, p, batch, key, sinks: bool = False):
        loss, outputs, *tail = net.apply(p, batch, rng=key,
                                         return_sink_blobs=sinks)
        # ref solver.cpp:195-217: every element of every output blob
        aux = {k: jnp.ravel(v) for k, v in outputs.items()}
        if sinks:
            aux["__sinks__"] = tail[0]
        return loss, aux
