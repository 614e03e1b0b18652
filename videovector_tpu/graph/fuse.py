"""Scoring-head fusion — horizontal batching of the embedding score motif.

The flagship TRAIN graph (ref:projects/videovec_embedding/
mednet_embedding_train.prototxt:232-671 and our generated twin) slices the
shared tower output back into 1+C+K per-role blobs and runs K+2 separate
NORMALIZATION layers, K+1 ELTWISE-PROD + SUM score chains, and a CONCAT —
~35 small kernels whose worst cost is not their own time but what they do
to XLA's fusion choices around the tower's backward (the fc7 bias-grad
reduce measured 8× its roofline inside the unfused graph: 1.03 ms vs
0.13 ms/step at B=512 — PERF.md r4 "engine-vs-native gap").

The native model (models/embedding.py) proves the fix: keep the role axis
as a tensor axis — reshape the (R·B, D) tower output to (R, B, D) once,
batch the normalizations over it, and compute all scores as one masked
multiply-reduce. This pass gives the *prototxt engine* the same HLO
structure without changing the config surface: Net.apply interprets the
motif layers SYMBOLICALLY (no arrays computed) and materializes the
requested blobs (the loss bottoms) with batched role-major ops.

Covered layer algebra (everything else falls back to normal interpretation,
per-blob, automatically):

  SLICE(dim0, equal)  of a real blob         → Role(i) symbols
  SLICE(dim0, equal)  of a Stack             → its elements
  CONCAT(dim0)        of symbols             → Stack
  CONCAT(dim1)        of Score symbols       → the final score matrix
  ELTWISE SUM         of Role/Ctx symbols    → Ctx (linear combo)
  ELTWISE PROD        of two vector symbols  → Prod
  NORMALIZATION       of a vector symbol     → Norm (distributes over Stack)
  SUM                 of a Prod              → Score (row dot, broadcast)
  SILENCE             of symbols             → absorbed

The materialized math is element-for-element the same as the unfused
layers (same accumulation axes and order; l2 normalize batches row-wise),
so fused and unfused graphs agree to float determinism — asserted
bit-exact on CPU in tests/test_fuse.py.

Escape hatch: Net(fuse_scoring=False) or VVTPU_DISABLE_FUSION=1.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from videovector_tpu.ops.normalization import L2_NORM_EPS


def fusion_enabled() -> bool:
    return os.environ.get("VVTPU_DISABLE_FUSION", "") not in ("1", "true")


# Symbols are nested tuples (hashable → materialization cache keys):
#   ("role", root_name, i)
#   ("drole", root_name, i)               axis-1 slice of a role-major input
#   ("ctx", ((coeff, sym), ...))          linear combination, listed order
#   ("norm", sym)
#   ("stack", (sym, ...))                 dim0-concat of equal-width vectors
#   ("prod", a, b)
#   ("score", a, b, num_output)           rowwise dot, broadcast to m cols
#   ("cat1", ((sym, ...),))               dim1-concat of Score symbols


class ScoringFusion:
    """Per-apply symbolic state. Lives for one Net.apply call.

    `role_major` maps input blob names to their RAW (R, B, feat...) arrays
    when the caller feeds that blob role-major (Net.apply role_major
    inputs): the leading SLICE(dim1) of the flagship graph then absorbs to
    `drole` symbols over axis 0 of the raw array, and the CONCAT(dim0)
    stack that feeds the tower materializes as a free reshape instead of
    the (B, R, D) → (R, B, D) relayout — which was the engine's residual
    gap vs the native model (PERF.md r4)."""

    def __init__(self, role_major: dict | None = None):
        self.syms: dict[str, tuple] = {}      # blob name -> symbol
        # root (name, version) -> (arr3, b, feat): keys are VERSIONED so a
        # blob rebound in place between two same-name SLICEs yields two
        # distinct roots — symbols created before the rebinding keep
        # materializing their pre-rewrite capture (correct: that slice ran
        # first), later slices capture the new value (see note_rebind)
        self.roots: dict[tuple, tuple] = {}
        self.ver: dict[str, int] = {}
        self.rm: dict[str, object] = dict(role_major or {})
        # materialization snapshot of the role-major inputs: note_rebind
        # pops self.rm (gating future absorbs) but live drole symbols
        # still reference the ORIGINAL input array
        self.rm_all: dict[str, object] = dict(self.rm)
        self._cache: dict[tuple, object] = {}
        self.absorbed_layers = 0              # introspection for tests/logs

    def note_rebind(self, name: str) -> None:
        """A layer rebound `name` to a real array: kill its symbol, stop
        absorbing its role-major raw input, and bump its root version so
        any LATER SLICE of this name captures the new value instead of a
        stale pre-rewrite root."""
        self.syms.pop(name, None)
        self.rm.pop(name, None)
        self.ver[name] = self.ver.get(name, 0) + 1

    # -- absorption ----------------------------------------------------

    def try_absorb(self, layer, blobs, loss_weights) -> list[str] | None:
        """If this layer is expressible symbolically, record symbols for its
        tops and return the top names; else return None (normal path)."""
        ltype = layer.get("type")
        if ltype not in ("SLICE", "CONCAT", "ELTWISE", "NORMALIZATION",
                        "SUM", "SILENCE"):
            return None
        tops = [str(t) for t in layer.get_list("top")]
        bottoms = [str(b) for b in layer.get_list("bottom")]
        if any(w != 0.0 for w in loss_weights):
            return None
        # in-place on a symbolic name is fine (rebinding); in-place on a
        # real blob is handled by the normal path
        out = self._absorb(ltype, layer, tops, bottoms, blobs)
        if out is None:
            return None
        for t, s in zip(tops, out):
            self.syms[t] = s
            blobs.pop(t, None)   # symbol shadows any stale array binding
        self.absorbed_layers += 1
        return tops

    def _absorb(self, ltype, layer, tops, bottoms, blobs):
        bsyms = [self.syms.get(b) for b in bottoms]

        if ltype == "SILENCE":
            return [] if all(s is not None for s in bsyms) else None

        if ltype == "SLICE":
            p = layer.get_msg("slice_param")
            if int(p.get("slice_dim", 1)) == 1:
                # role-major-fed root: axis-1 slices of the logical
                # (B, R, feat...) blob are axis-0 slices of the raw array
                src = bottoms[0]
                if bsyms[0] is not None or src not in self.rm:
                    return None
                arr = self.rm[src]
                n = len(tops)
                if not hasattr(arr, "shape") or arr.ndim < 2 \
                        or arr.shape[0] != n:
                    return None   # only all-width-1 slices
                points = [int(v) for v in p.get_list("slice_point")]
                if points and points != list(range(1, n)):
                    return None
                return [("drole", src, i) for i in range(n)]
            if int(p.get("slice_dim", 1)) != 0:
                return None
            points = [int(v) for v in p.get_list("slice_point")]
            n = len(tops)
            src = bottoms[0]
            if bsyms[0] is None:
                if src not in blobs or not hasattr(blobs[src], "shape"):
                    return None
                shape = blobs[src].shape
                if len(shape) < 2 or shape[0] % n != 0:
                    return None
                w = shape[0] // n
                if points and points != [w * i for i in range(1, n)]:
                    return None
                key = (src, self.ver.get(src, 0))
                if key not in self.roots:
                    arr = blobs[src]
                    self.roots[key] = (arr.reshape((n, w) + tuple(shape[1:])),
                                       w, tuple(shape[1:]))
                elif self.roots[key][1] != w:
                    return None   # same root sliced at a different width
                return [("role", key, i) for i in range(n)]
            if bsyms[0][0] == "stack":
                elems = bsyms[0][1]
                if len(elems) != n or points:
                    # equal-width elements by construction; explicit
                    # slice_points would need width checks — verify the
                    # common case only
                    if points:
                        ws = self._sym_width(elems[0])
                        if ws is None or \
                                points != [ws * i for i in range(1, n)]:
                            return None
                    else:
                        return None
                return list(elems)
            return None

        if ltype == "CONCAT":
            dim = int(layer.get_msg("concat_param").get("concat_dim", 1))
            if any(s is None for s in bsyms):
                return None
            if dim == 0:
                ws = {self._sym_width(s) for s in bsyms}
                if None in ws or len(ws) != 1:
                    return None
                return [("stack", tuple(bsyms))]
            if dim == 1 and all(s[0] == "score" for s in bsyms):
                return [("cat1", tuple(bsyms))]
            return None

        if ltype == "ELTWISE":
            p = layer.get_msg("eltwise_param")
            op = p.get("operation", "SUM")
            if any(s is None for s in bsyms):
                return None
            if op == "SUM":
                coeffs = [float(c) for c in p.get_list("coeff")] \
                    or [1.0] * len(bsyms)
                if len(coeffs) != len(bsyms):
                    return None
                if not all(s[0] in ("role", "drole", "ctx", "norm")
                           for s in bsyms):
                    return None
                return [("ctx", tuple((c, s) for c, s in zip(coeffs, bsyms)))]
            if op == "PROD" and len(bsyms) == 2 \
                    and bool(p.get("stable_prod_grad", True)) \
                    and all(s[0] in ("role", "drole", "ctx", "norm")
                            for s in bsyms):
                # stable_prod_grad=false selects the reference's DIVISION
                # backward (ops.eltwise_prod) — the fused batched-dot grad
                # is the stable form, so such a layer must stay unfused
                return [("prod", bsyms[0], bsyms[1])]
            return None

        if ltype == "NORMALIZATION":
            s = bsyms[0]
            if s is None:
                return None
            if s[0] == "stack":
                return [("stack", tuple(("norm", e) for e in s[1]))]
            if s[0] in ("role", "drole", "ctx", "norm"):
                return [("norm", s)]
            return None

        if ltype == "SUM":
            s = bsyms[0]
            if s is None or s[0] != "prod":
                return None
            m = int(layer.get_msg("sum_param").get("num_output", 1))
            return [("score", s[1], s[2], m)]

        return None

    def _sym_width(self, sym):
        """Row count of a vector symbol, if statically known."""
        if sym[0] == "role":
            return self.roots[sym[1]][1]
        if sym[0] == "drole":
            return self.rm_all[sym[1]].shape[1]
        if sym[0] == "ctx":
            return self._sym_width(sym[1][0][1])
        if sym[0] == "norm":
            return self._sym_width(sym[1])
        return None

    # -- materialization ----------------------------------------------

    def materialize(self, name_or_sym):
        sym = self.syms[name_or_sym] if isinstance(name_or_sym, str) \
            else name_or_sym
        return self._mat(sym)

    def _mat(self, sym):
        hit = self._cache.get(sym)
        if hit is not None:
            return hit
        kind = sym[0]
        if kind == "role":
            out = self.roots[sym[1]][0][sym[2]]
        elif kind == "drole":
            # logical (B, 1, feat...) slice of the role-major (R, B, feat...)
            arr = self.rm_all[sym[1]]
            out = arr[sym[2]][:, None]
        elif kind == "ctx":
            # fold in listed order — ops.eltwise_sum's exact accumulation
            terms = sym[1]
            out = terms[0][0] * self._mat(terms[0][1])
            for c, s in terms[1:]:
                out = out + c * self._mat(s)
        elif kind == "norm":
            out = _l2n_feat(self._mat(sym[1]))
        elif kind == "stack":
            out = self._mat_stack(sym[1])
        elif kind == "prod":
            out = self._mat(sym[1]) * self._mat(sym[2])
        elif kind == "score":
            out = self._mat_score(sym)
        elif kind == "cat1":
            out = self._mat_cat1(sym[1])
        else:  # pragma: no cover
            raise AssertionError(f"unknown symbol {sym!r}")
        self._cache[sym] = out
        return out

    def _mat_stack(self, elems):
        """dim0-concat of the element symbols. Fast path: a full in-order
        drole cover of one role-major root is just a reshape of the raw
        (R, B, feat...) array — concat of its axis-0 slices IS that array
        laid out role-major, so no data moves (the whole point of the
        role-major feed)."""
        if all(e[0] == "drole" for e in elems) \
                and len({e[1] for e in elems}) == 1:
            arr = self.rm_all[elems[0][1]]
            if [e[2] for e in elems] == list(range(arr.shape[0])):
                r, b = arr.shape[0], arr.shape[1]
                return arr.reshape((r * b, 1) + tuple(arr.shape[2:]))
        return jnp.concatenate([self._mat(e) for e in elems], axis=0)

    def _mat_score(self, sym):
        _, a, b, m = sym
        prod = self._mat(("prod", a, b))
        s = jnp.sum(prod.reshape(prod.shape[0], -1), axis=1, keepdims=True)
        return s if m == 1 else jnp.broadcast_to(s, (prod.shape[0], m))

    def _mat_cat1(self, scores):
        """The payoff: all (K) negative scores sharing one left operand and
        norm-of-role right operands become ONE batched multiply-reduce over
        a (K, B, D) role block — the native model's structure."""
        left = scores[0][1]
        rights = [s[2] for s in scores]
        batched = (
            all(s[1] == left for s in scores)
            and all(r[0] == "norm" and r[1][0] == "role" for r in rights)
            and len({r[1][1] for r in rights}) == 1
        )
        if batched:
            root_name = rights[0][1][1]
            arr3 = self.roots[root_name][0]
            idx = [r[1][2] for r in rights]
            lo, hi = min(idx), max(idx) + 1
            if idx == list(range(lo, hi)):
                block = arr3[lo:hi]                       # contiguous slice
            else:
                block = arr3[jnp.asarray(idx)]
            rn = _l2n_feat(block, rows_ndim=2)            # (K, B, feat...)
            am = self._mat(left)                          # (B, feat...)
            k, b = rn.shape[0], rn.shape[1]
            dots = jnp.sum((am[None] * rn).reshape(k, b, -1), axis=2)  # (K,B)
            cols = dots.T                                 # (B, K)
            ms = [s[3] for s in scores]
            if all(m == 1 for m in ms):
                return cols
            return jnp.repeat(cols, np.asarray(ms), axis=1,
                              total_repeat_length=sum(ms))
        return jnp.concatenate([self._mat(s) for s in scores], axis=1)


def _l2n_feat(x, eps: float = L2_NORM_EPS, rows_ndim: int = 1):
    """l2_normalize_rows with the row prefix spanning `rows_ndim` leading
    axes — identical per-row math to ops.l2_normalize_rows (same eps,
    same zero-row guard), batched over the role axis."""
    feat_axes = tuple(range(rows_ndim, x.ndim))
    sq = jnp.sum(x * x, axis=feat_axes, keepdims=True)
    safe_norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, x / (safe_norm + eps), 0.0)
