"""Benchmark: flagship temporal-embedding training throughput on one chip.

Prints ONE JSON line:
  {"metric": "triplets/sec/chip", "value": N, "unit": "triplets/s", "vs_baseline": R}

Workload = the reference training config (BASELINE.md): batch 128 windows,
fc7 4096→4096 tower over 15 roles (target + 4 context + 10 negatives),
max-margin L2 ranking loss (margin 2), SGD momentum .9 + weight decay, i.e.
one full forward+backward+update step. A "triplet" is one
(context, target, negative) ranking comparison: batch × num_negatives per
step (the unit of the reference's ranking objective,
ref:src/caffe/layers/max_margin_loss_layer.cpp).

vs_baseline compares against the measured CPU baseline in
BASELINE_MEASURED.json (torch-CPU implementation of the identical step with
threads = all host cores — stand-in for CPU-mode Caffe, which uses the same
BLAS path; methodology in that file). This host exposes one core, so the
ratio reads "× one Caffe-class CPU core" (see the note field there); the
whole-host equivalent vs a 16-32-core threaded-BLAS Caffe box is ~10-30×
smaller (≈70-200×). Falls back to vs_baseline = null if absent.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 128
NUM_NEG = 10
FEAT = 4096
EMBED = 4096
WARMUP = 5
ITERS = 200


def measure_tpu() -> float:
    import jax
    # persistent compile cache: the axon tunnel's remote compile is slow and
    # flaky after hiccups; reuse executables across bench invocations.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import SolverConfig, init_solver_state, solver_update

    cfg = VideoEmbeddingConfig(feature_dim=FEAT, embed_dim=EMBED,
                               num_negatives=NUM_NEG, compute_dtype="bfloat16")
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    solver_cfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                              lr_policy="inv", gamma=0.001, power=0.75)
    state = init_solver_state(solver_cfg, params)

    def loss_fn(p, batch, rng):
        # role_major: batch fed as (R, B, D) so role slices are contiguous
        # leading-axis blocks — no layout flips, no in-step transpose
        # (PERF.md round 2: the B>=256 cliff was XLA layout copies)
        return model.loss(p, batch, rng=rng, train=True, role_major=True)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, s, batch, rng):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, batch, rng)
        p2, s2 = solver_update(solver_cfg, p, g, s)
        return p2, s2, loss

    # batch generated on device: the benchmark measures the training step;
    # host→device feeding is a separate pipeline concern (and this harness's
    # tunnel H2D is erratically slow — see PERF.md tunnel notes)
    data = jax.jit(lambda k: jax.random.normal(
        k, (cfg.num_roles, BATCH, FEAT), jnp.float32))(jax.random.PRNGKey(0))
    batch = {"data": data}
    # rbg PRNG for the dropout-mask keys: hardware-friendly mask generation —
    # threefry costs ~25% of the step on v5e (measured); dropout only needs
    # statistical quality, not cryptographic counter-based keys. Scoped to
    # these keys (typed key impl) rather than jax.config's process-wide
    # default so importing this module never changes other code's streams.
    key = jax.random.key(1, impl="rbg")

    for _ in range(WARMUP):
        params, state, loss = step(params, state, batch, key)
    float(loss)  # value fetch: block_until_ready is unreliable on the
    # experimental axon platform, a scalar fetch forces a full sync

    # device-pure measurement: ITERS steps inside ONE XLA program (scan over
    # the step), so the metric is chip throughput — the tunnel's per-dispatch
    # latency (~0.1-0.3 ms/step through this harness's relay, a pure harness
    # artifact; real TPU hosts dispatch in ~10 us) cannot contaminate it.
    # Params/state update every iteration, so nothing is loop-invariant.
    from jax import lax

    # batch is an ARGUMENT of the scanned program, never a closure: a
    # closed-over device array is embedded as an HLO constant, and the
    # axon tunnel ships the whole constant inside the remote-compile
    # request (31.5 MB here, 252 MB for the frontier program — measured
    # to dominate "compile" time at the relay's erratic 0.2-4 MB/s, and
    # at B=2048 it exceeds the relay's body limit outright: HTTP 413)
    def one_step(b, carry, k):
        p, s = carry
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, b, k)
        p2, s2 = solver_update(solver_cfg, p, g, s)
        return (p2, s2), loss

    @jax.jit
    def run(p, s, keys, b):
        (p, s), losses = lax.scan(lambda c, k: one_step(b, c, k), (p, s),
                                  keys)
        return losses[-1]

    keys = jax.random.split(key, ITERS)
    float(run(params, state, keys, batch))    # compile + warm
    # best-of-3: the tunnel adds erratic per-call latency around the
    # device-pure scan; the fastest rep is the chip's true throughput
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, state, keys, batch))
        reps.append(time.perf_counter() - t0)
    best = min(reps)
    # within-run variance, visible in the captured bench tail (the
    # spread is tunnel dispatch latency around a device-pure scan)
    print("bench reps (s for %d iters): %s -> best %.4f"
          % (ITERS, [round(r, 4) for r in reps], best), file=sys.stderr)
    steps_per_sec = ITERS / best
    return steps_per_sec * BATCH * NUM_NEG  # triplets/sec


def measure_frontier(iters: int = 50) -> tuple[float, float]:
    """The CHIP-RECORD schedule (not the headline): B=8192, role-major
    feed, fused grad_microbatch=64 scan (PERF.md round-5 frontier sweep
    — the B=128 reference config is at its ~877 steps/s measured
    ceiling, so round-over-round progress shows here; the record moved
    1024→8192 when the sweep showed optimizer-pass amortization keeps
    paying). Returns (ms/step, triplets/s). Logged to stderr only; the
    headline JSON keeps the reference config."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import SolverConfig, init_solver_state
    from videovector_tpu.solver.train import build_fused_step

    B, GM = 8192, 64
    cfg = VideoEmbeddingConfig(feature_dim=FEAT, embed_dim=EMBED,
                               num_negatives=NUM_NEG,
                               compute_dtype="bfloat16")
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    solver_cfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                              lr_policy="inv", gamma=0.001, power=0.75)
    state = init_solver_state(solver_cfg, params)

    def loss_fn(p, b, k):
        return model.loss(p, b, rng=k, train=True, role_major=True)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    fstep = build_fused_step(grad_fn, solver_cfg, 1, GM,
                             batch_axes={"data": 1}, jit=False)
    batch = {"data": jax.jit(lambda k: jax.random.normal(
        k, (cfg.num_roles, B, FEAT), jnp.float32))(jax.random.PRNGKey(0))}

    # batch as an argument, not a closure — see the HLO-constant note in
    # measure_tpu (here the embedded constant would be 252 MB)
    def one(b, carry, k):
        p, s = carry
        p2, s2, m = fstep(p, s, (b,), k)
        return (p2, s2), m["loss"]

    @jax.jit
    def run(p, s, keys, b):
        (p, s), losses = lax.scan(lambda c, k: one(b, c, k), (p, s), keys)
        return losses[-1]

    keys = jax.random.split(jax.random.key(1, impl="rbg"), iters)
    float(run(params, state, keys, batch))  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, state, keys, batch))
        reps.append(time.perf_counter() - t0)
    best = min(reps)
    print("frontier reps (s for %d iters): %s" % (iters,
          [round(r, 4) for r in reps]), file=sys.stderr)
    dt = best / iters
    return dt * 1e3, B * NUM_NEG / dt


def main():
    # Fail fast instead of hanging forever if the TPU tunnel is wedged
    # (the experimental axon platform can block indefinitely on execute).
    import signal

    def _alarm(signum, frame):
        print("bench: TPU execution did not complete within the time limit",
              file=sys.stderr)
        os._exit(1)

    signal.signal(signal.SIGALRM, _alarm)
    deadline = time.monotonic() + int(
        os.environ.get("VVTPU_BENCH_TIMEOUT", "540"))
    signal.alarm(int(os.environ.get("VVTPU_BENCH_TIMEOUT", "540")))
    triplets_per_sec = measure_tpu()
    signal.alarm(0)
    baseline = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            baseline = json.load(f).get("cpu_triplets_per_sec")
    vs = (triplets_per_sec / baseline) if baseline else None
    print(json.dumps({
        "metric": "triplets/sec/chip",
        "value": round(triplets_per_sec, 1),
        "unit": "triplets/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }), flush=True)

    # Frontier record to STDERR (the headline JSON above is final and
    # already flushed — this extra measurement may not survive a cold
    # compile through the tunnel, so any failure past here exits 0).
    def _soft_alarm(signum, frame):
        print("bench frontier: skipped (out of time budget)",
              file=sys.stderr)
        os._exit(0)

    remaining = int(deadline - time.monotonic()) - 10
    if remaining < 60:
        print("bench frontier: skipped (out of time budget)",
              file=sys.stderr)
        return
    signal.signal(signal.SIGALRM, _soft_alarm)
    signal.alarm(remaining)
    try:
        ms, tps = measure_frontier()
        print(f"bench frontier (stderr, not the headline): B=8192 gm=64 "
              f"role-major fused step = {ms:.3f} ms/step, "
              f"{tps:,.0f} triplets/s", file=sys.stderr)
    except Exception as e:  # the headline already printed — never fail now
        print(f"bench frontier: failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    finally:
        signal.alarm(0)


if __name__ == "__main__":
    sys.exit(main())
