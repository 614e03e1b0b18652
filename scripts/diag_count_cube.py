"""Count-engine cube tuning sweep: kc / accumulation dtype / compare form.

The rank-by-counting retrieval engine spends its time in the (Q, M, kc)
compare cube (PERF.md r4: ~15% of VPU int-op peak at 20k×4096, C=50).
This sweep measures the cube kernel in isolation at gallery shape to pick
the fastest exact formulation:

  - kc: gallery chunk width of the scanned cube (512 shipped)
  - acc: int32 adds (shipped) vs f32 adds (VPU is float-native)
  - form: or-and lexicographic compare (shipped) vs select form
          select(gm==mr, gi<ri, gm<mr)

python scripts/diag_count_cube.py [--q 512] [--m 400] [--n 20480]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--m", type=int, default=400)
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--k", type=int, default=8,
                    help="chunks per timed program (amortize RTT)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    q, m, n = args.q, args.m, args.n

    @partial(jax.jit, static_argnums=(4, 5, 6, 7))
    def cube(gm_all, gi_all, mr, ri, kc, acc, form, layout):
        nk = gm_all.shape[1] // kc
        gm_ch = gm_all.reshape(q, nk, kc).transpose(1, 0, 2)
        gi_ch = gi_all.reshape(q, nk, kc).transpose(1, 0, 2)
        zero = jnp.zeros((q, m), jnp.float32 if acc == "f32" else jnp.int32)

        def body(cnt, xs):
            gm, gi = xs
            if layout == "nm":
                # cube (Q, kc, M): reduce over the SUBLANE axis, member
                # keys ride the lanes
                a = (gm[:, :, None], gi[:, :, None])
                b = (mr[:, None, :], ri[:, None, :])
                axis = 1
            else:
                # shipped layout (Q, M, kc): reduce over the lane axis
                a = (gm[:, None, :], gi[:, None, :])
                b = (mr[:, :, None], ri[:, :, None])
                axis = 2
            if form == "select":
                less = jnp.where(a[0] == b[0], a[1] < b[1], a[0] < b[0])
            else:
                less = (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))
            return cnt + jnp.sum(less.astype(cnt.dtype), axis=axis), None

        out, _ = jax.lax.scan(body, zero, (gm_ch, gi_ch))
        return out.astype(jnp.int32)

    rng = np.random.RandomState(0)
    gm = jnp.asarray(rng.randint(-2**30, 2**30, (q, n)).astype(np.int32))
    gi = jnp.asarray(np.broadcast_to(np.arange(n, dtype=np.int32), (q, n)))
    mr = jnp.asarray(rng.randint(-2**30, 2**30, (q, m)).astype(np.int32))
    ri = jnp.asarray(rng.randint(0, n, (q, m)).astype(np.int32))

    ref = None
    for kc in (512, 2048):
        if n % kc:
            continue
        for layout in ("mn", "nm"):
            for acc in ("i32", "f32"):
                for form in ("orand", "select"):
                    out = cube(gm, gi, mr, ri, kc, acc, form, layout)
                    s = int(jnp.sum(out))   # fence + compile
                    t0 = time.perf_counter()
                    for _ in range(args.k):
                        out = cube(gm, gi, mr, ri, kc, acc, form, layout)
                    s2 = int(jnp.sum(out))
                    dt = (time.perf_counter() - t0) / args.k
                    if ref is None:
                        ref = s
                    ok = "OK" if s == ref and s2 == ref else "MISMATCH"
                    gops = q * m * n / dt / 1e9
                    print(f"kc={kc:5d} layout={layout} acc={acc} "
                          f"form={form:6s}: {dt*1e3:8.2f} ms/chunk  "
                          f"{gops:7.1f} Gcmp/s  {ok}", flush=True)


if __name__ == "__main__":
    main()
