"""Multi-process training worker: one process of a multi-host launch.

The reference is strictly single-process (SURVEY §2.6 — no MPI/NCCL
anywhere); this is the TPU-native multi-host story executed FOR REAL:
each process initializes `jax.distributed`, addresses only its local
devices, feeds its slice of the global batch through
`parallel.multihost.global_batch_from_local`
(jax.make_array_from_process_local_data with a strict addressable
subset), and runs the SPMD train step — XLA's collectives cross the
process boundary (ICI/DCN on TPU slices; gloo on the CPU test rig).

Run one worker per host:

  python -m videovector_tpu.parallel.multihost_worker \
      --solver solver.prototxt --coordinator host0:1234 \
      --num_processes 2 --process_id $I --iters 3 --out losses_$I.json

Each process must set its platform env BEFORE launch (the CPU test rig
sets JAX_PLATFORMS=cpu + xla_force_host_platform_device_count; real TPU
hosts need nothing). With --simulate (the test rig), every process runs
the identical data stream and slices out its host_shard_range rows — so
the multi-process trajectory must equal a --num_processes 1 run, which
tests/test_multihost_process.py and the driver dryrun assert.
"""

from __future__ import annotations

import argparse
import json
import sys


def run_worker(solver_path: str, *, process_id: int, num_processes: int,
               coordinator: str, iters: int = 3,
               simulate: bool = True) -> list[float]:
    """Train the solver's net `iters` steps over ALL processes' devices;
    returns the per-iteration loss list (identical on every process —
    metrics are replicated)."""
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # honor the launcher's platform choice: this environment pins
        # jax_platforms to "axon,cpu" regardless of the env var (see
        # CLAUDE.md / tests/conftest.py) — without this the CPU test rig
        # silently initializes the TPU tunnel backend
        jax.config.update("jax_platforms", "cpu")
    if num_processes > 1 or coordinator:
        # CPU cross-process collectives need an implementation (current
        # jax defaults to gloo; older builds default to none — fix that
        # up; TPU backends ignore this knob)
        try:
            if str(jax.config.jax_cpu_collectives_implementation
                   or "none").lower() == "none":
                jax.config.update("jax_cpu_collectives_implementation",
                                  "gloo")
        except Exception:
            pass
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    import numpy as np
    from jax.sharding import Mesh

    from videovector_tpu.parallel.multihost import (
        HostShardedSource, replicate_global,
    )
    from videovector_tpu.parallel.train import make_train_step
    from videovector_tpu.solver.driver import SolverDriver

    driver = SolverDriver.from_prototxt(solver_path)
    driver.build()
    net = driver.train_net
    cfg = driver.cfg

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def loss_fn(p, batch, key):
        return SolverDriver._loss_with_outputs(net, p, batch, key)

    # init_solver_state's structure, built from numpy so replication is
    # multi-process-safe (no device_put to non-addressable devices)
    params_np = jax.device_get(driver.params)
    params = replicate_global(params_np, mesh)
    state = replicate_global(
        {"iter": np.int32(0),
         "history": jax.tree.map(np.zeros_like, params_np)}, mesh)

    # every process runs the same deterministic sampler stream; with
    # simulate=True the wrapper slices this process's host_shard_range
    # rows before assembly (the single-host test rig). A real deployment
    # points each host's source at its own data range and passes
    # simulate=False.
    src = HostShardedSource(driver.train_source, mesh, simulate=simulate)
    it_src = iter(src)

    step = make_train_step(loss_fn, cfg, mesh, lr_mults=driver.lr_mults,
                           decay_mults=driver.decay_mults, donate=False)
    seed = cfg.random_seed if cfg.random_seed >= 0 else 0
    rng = jax.random.PRNGKey(seed)
    losses = []
    for it in range(iters):
        batch = next(it_src)
        params, state, metrics = step(params, state, batch,
                                      jax.random.fold_in(rng, it))
        losses.append(float(np.asarray(metrics["loss"]).reshape(-1)[0]))
    return losses


def launch_workers(solver_path: str, out_dir: str, num_processes: int,
                   devices_per_proc: int, *, iters: int = 3, cwd=None,
                   timeout: int = 900) -> list[list[float]]:
    """Subprocess-launch `num_processes` workers on the CPU test rig
    (one process each, `devices_per_proc` virtual devices) and return
    their JSON loss lists in process order.

    The single launch protocol shared by tests/test_multihost_process.py
    and __graft_entry__._dryrun_multiprocess: XLA_FLAGS is MERGED (any
    other flags the parent carries survive; only the device-count flag is
    replaced), a free coordinator port is picked per launch, and on a
    timeout every sibling worker is killed — no orphans holding the
    coordinator port."""
    import os
    import socket
    import subprocess

    port = 0
    if num_processes > 1:
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=" ".join(
        flags + [f"--xla_force_host_platform_device_count"
                 f"={devices_per_proc}"]))
    procs, outs = [], []
    try:
        for pid in range(num_processes):
            out = os.path.join(out_dir, f"losses_p{num_processes}_{pid}.json")
            outs.append(out)
            cmd = [sys.executable, "-m",
                   "videovector_tpu.parallel.multihost_worker",
                   "--solver", solver_path, "--iters", str(iters),
                   "--simulate", "--num_processes", str(num_processes),
                   "--process_id", str(pid), "--out", out]
            if num_processes > 1:
                cmd += ["--coordinator", f"localhost:{port}"]
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=cwd or os.getcwd(),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        for p in procs:
            stdout, stderr = p.communicate(timeout=timeout)
            if p.returncode != 0:
                raise AssertionError(
                    f"multihost worker failed:\n{stdout[-2000:]}\n"
                    f"{stderr[-2000:]}")
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--solver", required=True)
    p.add_argument("--coordinator", default="")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--simulate", action="store_true",
                   help="identical stream on every process, sliced by "
                        "host_shard_range (single-host test rig)")
    p.add_argument("--out", default="",
                   help="write the loss list as JSON to this path")
    args = p.parse_args(argv)
    losses = run_worker(args.solver, process_id=args.process_id,
                        num_processes=args.num_processes,
                        coordinator=args.coordinator, iters=args.iters,
                        simulate=args.simulate)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(losses, f)
    print(json.dumps({"process": args.process_id, "losses": losses}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
