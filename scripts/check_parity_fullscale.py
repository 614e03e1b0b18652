"""Full-scale golden parity ON THE REAL TPU CHIP.

Runs the same comparison as tests/test_golden_fullscale.py (real-dimension
extraction tower vs torch-CPU fixtures) on the actual TPU through the axon
tunnel, in two modes:

  f32-highest  — jax_default_matmul_precision=highest: the parity-
                 certification mode (full f32 MXU passes, like the
                 reference's f32 GPU path). Checked against the certified
                 CPU bounds.
  bf16-default — default precision (single bf16 MXU pass): the throughput
                 mode bench_extraction.py measures. Reported informationally
                 (users trading exactness for 6x MXU throughput).

Prints one PARITY line per mode. Run:  python scripts/check_parity_fullscale.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "..", "tests"))
sys.path.insert(0, os.path.join(HERE, ".."))


def run(precision: str):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", precision)
    from gen_golden_fullscale import FULL_BLOBS, sample_indices, make_weights
    from test_golden_fullscale import (
        BLOBS, EXTRACTION_NET, engine_params_from_torch,
    )
    from videovector_tpu.config import parse
    from videovector_tpu.graph import Net

    fx = np.load(os.path.join(HERE, "..", "tests", "golden_fullscale.npz"))
    w = {k: v.numpy() for k, v in make_weights().items()}
    x = fx["input"]
    net = Net(parse(EXTRACTION_NET), phase="TEST")
    params = engine_params_from_torch(net, w, x.shape)
    fwd = jax.jit(lambda p, b: net.apply(p, b, return_blobs=True)[1])
    blobs = fwd(params, {"data": jnp.asarray(x)})
    # fence through a scalar fetch (block_until_ready unreliable on axon)
    float(jnp.sum(blobs["ip2"]))

    worst = {}
    for name in BLOBS:
        arr = np.asarray(blobs[name], np.float32).reshape(-1)
        shape = tuple(int(s) for s in fx[f"shape:{name}"])
        if name in FULL_BLOBS:
            golden = fx[f"full:{name}"].reshape(-1)
            mine = arr
        else:
            golden = fx[f"samp:{name}"]
            mine = arr[sample_indices(shape)]
        rms = float(np.sqrt(fx[f"sumsq:{name}"] / np.prod(shape)))
        d = np.abs(mine - golden)
        nrm = float(d.max()) / max(rms, 1e-12)
        big = np.abs(golden) >= 0.01 * rms
        rel = float((d[big] / np.abs(golden[big])).max()) if big.any() else 0.0
        worst[name] = (nrm, rel)
        print(f"  {name:12s} nrm_err {nrm:9.3g} rel_big {rel:9.3g}")
    nrm_max = max(v[0] for v in worst.values())
    rel_max = max(v[1] for v in worst.values())
    return nrm_max, rel_max, worst


def main() -> int:
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev}")

    print("mode f32-highest (parity certification):")
    nrm, rel, worst = run("highest")
    ok = nrm <= 2e-5 and rel <= 1e-3  # the certified CPU bounds
    print(f"PARITY fullscale f32-highest on {dev.platform}: "
          f"{'PASS' if ok else 'FAIL'} nrm_err<={nrm:.3g} rel_big<={rel:.3g} "
          f"(bounds 2e-5 / 1e-3) ip2 nrm {worst['ip2'][0]:.3g} "
          f"rel {worst['ip2'][1]:.3g}")

    print("mode bf16-default (throughput mode, informational):")
    nrm, rel, worst = run("default")
    print(f"PARITY fullscale bf16-default on {dev.platform}: "
          f"nrm_err<={nrm:.3g} rel_big<={rel:.3g} "
          f"ip2 nrm {worst['ip2'][0]:.3g} rel {worst['ip2'][1]:.3g}")
    return 0 if ok else 1  # certification gates on the f32-highest bounds


if __name__ == "__main__":
    sys.exit(main())
