"""Op-level trace of the full training step at a given batch size.

Captures a jax.profiler trace around K scanned steps, parses the xspace
with jax.profiler.ProfileData, and prints the top ops by total device
time — the ground-truth view of where the B>=256 cliff lives.

python scripts/diag_trace.py --batch 512 [--k 20] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--out", default="/tmp/vvtpu_trace")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp
    from jax import lax
    from videovector_tpu.models import VideoEmbeddingConfig, VideoEmbeddingModel
    from videovector_tpu.solver import (
        SolverConfig, init_solver_state, solver_update,
    )

    cfg = VideoEmbeddingConfig(feature_dim=4096, embed_dim=4096,
                               num_negatives=10, compute_dtype=args.dtype)
    model = VideoEmbeddingModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    scfg = SolverConfig(base_lr=0.001, momentum=0.9, weight_decay=5e-4,
                        lr_policy="inv", gamma=0.001, power=0.75)
    state = init_solver_state(scfg, params)
    b = args.batch
    data = jax.jit(lambda k: jax.random.normal(
        k, (b, cfg.num_roles, 4096), jnp.float32))(jax.random.PRNGKey(0))
    batch = {"data": data}

    def one_step(carry, key):
        p, s = carry
        (loss, aux), g = jax.value_and_grad(
            lambda pp: model.loss(pp, batch, rng=key, train=True),
            has_aux=True)(p)
        p2, s2 = solver_update(scfg, p, g, s)
        return (p2, s2), loss

    @jax.jit
    def run(p, s, keys):
        (p, s), losses = lax.scan(one_step, (p, s), keys)
        return losses[-1]

    keys = jax.random.split(jax.random.PRNGKey(1), args.k)
    float(run(params, state, keys))  # compile + warm

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        float(run(params, state, keys))

    # parse the newest xspace
    paths = sorted(glob.glob(os.path.join(
        args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no xplane captured"); return
    from jax.profiler import ProfileData
    with open(paths[-1], "rb") as f:
        data_pb = f.read()
    pd = ProfileData.from_serialized_xspace(data_pb)
    totals = defaultdict(float)
    count = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla op" in lname or "module" in lname:
                pass
            for ev in line.events:
                name = ev.name
                dur = (ev.duration_ns or 0) / 1e6
                if dur <= 0:
                    continue
                totals[(line.name, name)] += dur
                count[(line.name, name)] += 1
    # aggregate per op name on the busiest line type
    by_line = defaultdict(float)
    for (lname, _), v in totals.items():
        by_line[lname] += v
    print("device lines:", dict(sorted(by_line.items(),
                                       key=lambda kv: -kv[1])[:5]))
    busiest = max(by_line, key=by_line.get)
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    for (lname, name), v in totals.items():
        if lname == busiest:
            per_op[name] += v
            per_op_n[name] += count[(lname, name)]
    tot = sum(per_op.values())
    print(f"\nbusiest line: {busiest!r}, total {tot:.2f} ms over "
          f"{args.k} steps ({tot/args.k:.3f} ms/step)\n")
    for name, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v/args.k:8.4f} ms/step  x{per_op_n[name]//args.k:<3d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
