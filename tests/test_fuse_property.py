"""Property test for the scoring-head fusion (graph/fuse.py): RANDOM graphs
over the motif algebra (SLICE / CONCAT / ELTWISE / NORMALIZATION / SUM /
SILENCE) interleaved with non-absorbable layers (POWER / ABSVAL /
EUCLIDEAN_LOSS, in-place rewrites included) must evaluate identically with
fusion on and off — loss and every output blob bit-equal, input gradients to
float determinism. The hand-written tests in test_fuse.py pin the flagship
motif; this sweeps the combinatorial space around it (partial absorption,
fallback materialization, root versioning, mixed-width stacks, score
slicing) so a fusion rule that silently mis-fires on an unusual-but-valid
prototxt shows up as a value diff, not a user bug report.

Each generated net is valid for the plain interpreter by construction; the
fusion pass may absorb any subset of it (including none) — equivalence must
hold regardless of how much fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.graph.net import Net


def _emit_layer(name, ltype, bottoms, tops, extra=""):
    b = "".join(f' bottom: "{x}"' for x in bottoms)
    t = "".join(f' top: "{x}"' for x in tops)
    return f'layers {{ name: "{name}" type: {ltype}{b}{t} {extra} }}\n'


class _Gen:
    """Random valid net over the motif algebra. Tracks blob shapes so every
    emitted layer satisfies the plain interpreter's contracts."""

    def __init__(self, seed, family):
        self.rng = np.random.RandomState(seed)
        self.family = family                      # "dim0" | "dim1"
        self.n = 0
        self.txt = 'name: "prop"\ninput: "data"\n'
        self.pool: dict[str, tuple] = {}          # blob -> shape
        self.loss_done = False

        B = int(self.rng.randint(2, 5))
        R = int(self.rng.randint(3, 6))
        F = int(self.rng.randint(3, 7))
        self.B, self.R, self.F = B, R, F
        if family == "dim0":
            self.data_shape = (R * B, 1, F, 1)
            tops = [self._name() for _ in range(R)]
            self.txt += _emit_layer("sl0", "SLICE", ["data"], tops,
                                    "slice_param { slice_dim: 0 }")
            for t in tops:
                self.pool[t] = (B, 1, F, 1)
        else:
            self.data_shape = (B, R, F, 1)
            tops = [self._name() for _ in range(R)]
            self.txt += _emit_layer("sl1", "SLICE", ["data"], tops,
                                    "slice_param { slice_dim: 1 }")
            for t in tops:
                self.pool[t] = (B, 1, F, 1)

    def _name(self):
        self.n += 1
        return f"b{self.n}"

    def _pick(self, pred, k=1):
        names = [n for n, s in self.pool.items() if pred(s)]
        if len(names) < k:
            return None
        idx = self.rng.choice(len(names), size=k, replace=False)
        return [names[i] for i in idx]

    def _same_shape_group(self, k):
        """k distinct blobs sharing one shape, or None."""
        by_shape: dict[tuple, list] = {}
        for n, s in self.pool.items():
            by_shape.setdefault(s, []).append(n)
        groups = [v for v in by_shape.values() if len(v) >= k]
        if not groups:
            return None
        g = groups[self.rng.randint(len(groups))]
        idx = self.rng.choice(len(g), size=k, replace=False)
        return [g[i] for i in idx]

    def step(self):
        op = self.rng.choice(
            ["norm", "esum", "eprod", "sum", "cat0", "cat1", "slice0",
             "power", "absval", "silence"],
            p=[.16, .14, .14, .12, .10, .08, .08, .10, .04, .04])
        lname = f"l{self.n}_{op}"
        if op == "norm":
            src = self._pick(lambda s: True)
            if not src:
                return
            inplace = self.rng.rand() < 0.25
            top = src[0] if inplace else self._name()
            self.txt += _emit_layer(lname, "NORMALIZATION", src, [top])
            self.pool[top] = self.pool[src[0]]
        elif op == "esum":
            k = int(self.rng.randint(2, 4))
            grp = self._same_shape_group(k)
            if not grp:
                return
            extra = "eltwise_param { operation: SUM"
            if self.rng.rand() < 0.6:
                for _ in grp:
                    extra += f" coeff: {self.rng.uniform(-1, 1):.4f}"
            extra += " }"
            top = self._name()
            self.txt += _emit_layer(lname, "ELTWISE", grp, [top], extra)
            self.pool[top] = self.pool[grp[0]]
        elif op == "eprod":
            k = 3 if self.rng.rand() < 0.2 else 2   # 3-way falls back
            grp = self._same_shape_group(k)
            if not grp:
                return
            top = self._name()
            self.txt += _emit_layer(lname, "ELTWISE", grp, [top],
                                    "eltwise_param { operation: PROD }")
            self.pool[top] = self.pool[grp[0]]
        elif op == "sum":
            src = self._pick(lambda s: len(s) >= 2)
            if not src:
                return
            m = int(self.rng.randint(1, 4))
            top = self._name()
            self.txt += _emit_layer(lname, "SUM", src, [top],
                                    f"sum_param {{ num_output: {m} }}")
            self.pool[top] = (self.pool[src[0]][0], m)
        elif op == "cat0":
            k = int(self.rng.randint(2, 4))
            # same trailing dims, any leading width
            by_tail: dict[tuple, list] = {}
            for n, s in self.pool.items():
                by_tail.setdefault(s[1:], []).append(n)
            groups = [v for v in by_tail.values() if len(v) >= k]
            if not groups:
                return
            g = groups[self.rng.randint(len(groups))]
            idx = self.rng.choice(len(g), size=k, replace=False)
            grp = [g[i] for i in idx]
            top = self._name()
            self.txt += _emit_layer(lname, "CONCAT", grp, [top],
                                    "concat_param { concat_dim: 0 }")
            tail = self.pool[grp[0]][1:]
            rows = sum(self.pool[x][0] for x in grp)
            self.pool[top] = (rows,) + tail
        elif op == "cat1":
            k = int(self.rng.randint(2, 4))
            by_rows: dict[int, list] = {}
            for n, s in self.pool.items():
                if len(s) == 2:                    # score blobs
                    by_rows.setdefault(s[0], []).append(n)
            groups = [v for v in by_rows.values() if len(v) >= k]
            if not groups:
                return
            g = groups[self.rng.randint(len(groups))]
            idx = self.rng.choice(len(g), size=k, replace=False)
            grp = [g[i] for i in idx]
            top = self._name()
            self.txt += _emit_layer(lname, "CONCAT", grp, [top],
                                    "concat_param { concat_dim: 1 }")
            self.pool[top] = (self.pool[grp[0]][0],
                              sum(self.pool[x][1] for x in grp))
        elif op == "slice0":
            cands = [(n, s) for n, s in self.pool.items()
                     if s[0] >= 4 and s[0] % 2 == 0]
            if not cands:
                return
            nme, s = cands[self.rng.randint(len(cands))]
            parts = 2
            tops = [self._name() for _ in range(parts)]
            self.txt += _emit_layer(lname, "SLICE", [nme], tops,
                                    "slice_param { slice_dim: 0 }")
            for t in tops:
                self.pool[t] = (s[0] // parts,) + s[1:]
        elif op in ("power", "absval"):
            src = self._pick(lambda s: True)
            if not src:
                return
            inplace = self.rng.rand() < 0.3
            top = src[0] if inplace else self._name()
            if op == "power":
                self.txt += _emit_layer(
                    lname, "POWER", src, [top],
                    "power_param { power: 2.0 shift: 0.1 }")
            else:
                self.txt += _emit_layer(lname, "ABSVAL", src, [top])
            self.pool[top] = self.pool[src[0]]
        elif op == "silence":
            src = self._pick(lambda s: True)
            if not src:
                return
            self.txt += _emit_layer(lname, "SILENCE", src, [])

    def maybe_loss(self):
        if self.loss_done or self.rng.rand() < 0.4:
            return
        grp = self._same_shape_group(2)
        if not grp:
            return
        self.txt += _emit_layer("eloss", "EUCLIDEAN_LOSS", grp, ["loss"])
        self.loss_done = True

    def build(self, n_ops=12):
        for _ in range(n_ops):
            self.step()
        self.maybe_loss()
        return self.txt


def _run_pair(txt, data_shape, seed):
    msg = parse(txt)
    rng = np.random.RandomState(seed + 1000)
    data = rng.randn(*data_shape).astype(np.float32)
    batch = {"data": jnp.asarray(data)}
    n0 = Net(msg, "TRAIN", fuse_scoring=False)
    n1 = Net(msg, "TRAIN", fuse_scoring=True)
    p, meta = n0.init(jax.random.PRNGKey(0), batch)
    n1.param_meta = meta
    n1._blob_shapes = n0._blob_shapes
    return n0, n1, p, batch, data


def _scalarize(loss, outputs):
    s = loss
    for k in sorted(outputs):
        s = s + jnp.sum(outputs[k].astype(jnp.float32))
    return s


@pytest.mark.parametrize("family", ["dim0", "dim1"])
@pytest.mark.parametrize("seed", range(12))
def test_random_motif_graph_fused_matches_unfused(family, seed):
    gen = _Gen(seed, family)
    txt = gen.build()
    n0, n1, p, batch, data = _run_pair(txt, gen.data_shape, seed)

    l0, o0 = n0.apply(p, batch)
    l1, o1 = n1.apply(p, batch)
    assert float(l0) == float(l1), txt
    assert sorted(o0) == sorted(o1), txt
    for k in o0:
        np.testing.assert_array_equal(
            np.asarray(o0[k]), np.asarray(o1[k]),
            err_msg=f"blob {k!r} diverged\n{txt}")

    # gradients w.r.t. the INPUT flow back through every materialization
    def f(net):
        def g(x):
            loss, outs = net.apply(p, {"data": x})
            return _scalarize(loss, outs)
        return g

    g0 = jax.grad(f(n0))(batch["data"])
    g1 = jax.grad(f(n1))(batch["data"])
    gmax = float(jnp.max(jnp.abs(g0 - g1)))
    # forward is bit-equal (asserted above); the backward may ACCUMULATE
    # cotangents in a different order (reshape-root vs concat-of-slices),
    # so grads match to f32 accumulation order — a relative bound
    gmag = float(jnp.max(jnp.abs(g0)))
    assert gmax <= 1e-6 * max(1.0, gmag), f"grad divergence {gmax}\n{txt}"


@pytest.mark.parametrize("seed", range(6))
def test_random_dim1_graph_role_major_feed(seed):
    """The dim1 family fed role-major ((R, B, F, 1) raw + role_major_inputs)
    must match the normal feed exactly — drole symbols, the stack fast
    path, and note_rebind interaction all exercised on random graphs."""
    gen = _Gen(seed, "dim1")
    txt = gen.build()
    n0, n1, p, batch, data = _run_pair(txt, gen.data_shape, seed)

    l0, o0 = n1.apply(p, batch)
    n1.role_major_inputs = ("data",)
    rm = {"data": jnp.asarray(np.ascontiguousarray(
        data.transpose(1, 0, 2, 3)))}
    l1, o1 = n1.apply(p, rm)
    assert float(l0) == float(l1), txt
    assert sorted(o0) == sorted(o1), txt
    for k in o0:
        np.testing.assert_array_equal(
            np.asarray(o0[k]), np.asarray(o1[k]),
            err_msg=f"blob {k!r} diverged under role-major feed\n{txt}")

    # the unfused interpreter accepts the role-major feed too (moveaxis
    # view) and must agree
    n0.role_major_inputs = ("data",)
    l2, o2 = n0.apply(p, rm)
    assert float(l2) == float(l0), txt
    for k in o0:
        np.testing.assert_array_equal(np.asarray(o0[k]), np.asarray(o2[k]))
