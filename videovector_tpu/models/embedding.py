"""The flagship temporal video-embedding model, TPU-native.

This is the idiomatic re-design of the reference's
mednet_embedding_train.prototxt graph
(ref:projects/videovec_embedding/mednet_embedding_train.prototxt):

  reference graph                         this model
  ---------------                         ----------
  SLICE data into 15 role blobs           keep (B, R, D) tensor
  CONCAT roles into batch                 reshape (B·R, D)
  INNER_PRODUCT fc7 4096→4096             one (B·R, D)×(D, E) MXU matmul
  RELU + DROPOUT .9                       fused elementwise
  SLICE back into roles                   reshape (B, R, E)
  ELTWISE SUM coeff .25 over contexts     mean over context axis
  NORMALIZATION ×3                        l2_normalize_rows
  ELTWISE PROD + SUM(num_output=N) ×11    two batched dots (einsum)
  CONCAT scores                           —
  MAX_MARGIN_LOSS margin 2 L2             ops.max_margin_loss

Same math (verified against the graph engine running the actual prototxt in
tests/test_embedding_model.py), but the 15-way slice/concat dance collapses
into a single large GEMM — the shape the MXU wants.

Roles layout along axis 1 matches the data layer's emission order
(ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:371-765):
[target | context_1..C | negative_1..N].
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from videovector_tpu import ops
from videovector_tpu.core import fillers


@dataclass(frozen=True)
class VideoEmbeddingConfig:
    feature_dim: int = 4096
    embed_dim: int = 4096
    num_context: int = 4          # context_size 5 → 4 context shots (window minus target)
    num_negatives: int = 10
    margin: float = 2.0
    norm: str = "L2"              # margin-loss norm
    dropout_rate: float = 0.9
    weight_std: float = 0.001     # ref fc7 gaussian std .001
    # dtype for the tower matmul; params stay f32. bf16 halves HBM traffic
    # and doubles MXU throughput; f32 for parity testing.
    compute_dtype: str = "bfloat16"
    # dtype for the (B, R, E) tower activations between the GEMM and the
    # scoring block; bf16 halves the largest activation's HBM traffic in
    # fwd+bwd at ~1e-3 relative loss error (validated in tests).
    activation_dtype: str = "float32"
    # rematerialize the tower in backward (jax.checkpoint): trades one extra
    # fwd GEMM for not storing the (B, R, E) activations — useful at large
    # batch where the activation working set degrades throughput (PERF.md).
    remat_tower: bool = False

    @property
    def num_roles(self) -> int:
        return 1 + self.num_context + self.num_negatives


class VideoEmbeddingModel:
    """Functional model: params are a plain dict; all methods are pure and
    jit-friendly."""

    def __init__(self, cfg: VideoEmbeddingConfig):
        self.cfg = cfg

    # -- params ----------------------------------------------------------
    def init(self, key):
        cfg = self.cfg
        kw, _ = jax.random.split(key)
        w = fillers.gaussian_fill(kw, (cfg.embed_dim, cfg.feature_dim),
                                  std=cfg.weight_std).T  # (D, E)
        b = jnp.zeros((cfg.embed_dim,), jnp.float32)
        return {"tower": {"w": w, "b": b}}

    # -- embedding tower -------------------------------------------------
    def embed(self, params, x, *, rng=None, train: bool = False):
        """x: (..., D) → (..., E). fc7 + ReLU (+ dropout at train)."""
        if self.cfg.remat_tower:
            import functools
            fn = jax.checkpoint(functools.partial(
                self._embed_impl, rng=rng, train=train))
            return fn(params, x)
        return self._embed_impl(params, x, rng=rng, train=train)

    def _embed_impl(self, params, x, *, rng=None, train: bool = False):
        cfg = self.cfg
        t = params["tower"]
        lead = x.shape[:-1]
        flat = x.reshape(-1, cfg.feature_dim)
        cdt = jnp.dtype(cfg.compute_dtype)
        h = jnp.dot(flat.astype(cdt), t["w"].astype(cdt),
                    preferred_element_type=jnp.float32)
        h = h + t["b"]
        h = ops.relu(h)
        if train and cfg.dropout_rate > 0:
            if rng is None:
                # the reference ALWAYS drops at TRAIN — silently training
                # without dropout because no rng was threaded would train
                # a different model than configured
                raise ValueError("train=True with dropout_rate > 0 needs "
                                 "rng= (pass a PRNGKey)")
            h = ops.dropout(h, rate=cfg.dropout_rate, rng=rng)
        h = h.astype(jnp.dtype(cfg.activation_dtype))
        return h.reshape(*lead, cfg.embed_dim)

    # -- scoring ---------------------------------------------------------
    @staticmethod
    def _safe_inv_norm(sq, eps=1e-10):
        """1/(‖x‖+eps), but exactly 0 (value AND gradient) for zero rows —
        the reference backward returns 0 there (see ops.l2_normalize_rows).
        Multiplying dots by this reproduces normalize-then-dot without the
        ~1/eps gradient blow-up a bare eps denominator gives at zero rows."""
        norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        return jnp.where(sq > 0, 1.0 / (norm + eps), 0.0)

    def scores(self, params, data, *, rng=None, train: bool = False,
               role_major: bool = False):
        """data: (B, R, D) → (s_true (B,), s_neg (B, N), embeddings dict).

        Scores are computed in cosine form,
        s = (x·y) / ((‖x‖+eps)(‖y‖+eps)), which is EXACTLY the reference's
        normalize-then-dot (x/(‖x‖+eps))·(y/(‖y‖+eps)) — but never
        materializes normalized (B, N, E) tensors: the dominant cost of the
        scoring block at large batch (measured 6× superlinear growth with the
        naive formulation; PERF.md)."""
        cfg = self.cfg
        # Role-major layout: (B, R, D) → (R, B, D) so target/context/negative
        # slices are contiguous leading-axis BLOCKS. Batch-major slicing made
        # XLA pick conflicting layouts ({2,1,0} vs {2,0,1}) across the
        # context-mean block, transposing the full activation tensor 4× per
        # step (~1.6 ms at B=512, trace in PERF.md round 2); role-major
        # removes every flip: +42% at B=512, +8% at B=128 (measured on v5e).
        # Callers that can produce (R, B, D) natively pass role_major=True
        # and skip the in-step transpose too (~0.08 ms at B=128).
        x = data if role_major else jnp.transpose(data, (1, 0, 2))
        n_roles = 1 + cfg.num_context + cfg.num_negatives
        if x.shape[0] != n_roles:
            # a surplus role would silently become a phantom negative
            raise ValueError(
                f"data carries {x.shape[0]} roles but the config declares "
                f"{n_roles} (1 target + {cfg.num_context} context + "
                f"{cfg.num_negatives} negatives)")
        h = self.embed(params, x, rng=rng, train=train)       # (R, B, E)
        target = h[0].astype(jnp.float32)                     # (B, E)
        context = h[1:1 + cfg.num_context]                    # (C, B, E)
        negs = h[1 + cfg.num_context:]                        # (N, B, E)

        # ref eltwise SUM with coeff 0.25 over 4 contexts == mean over C
        ctx_avg = jnp.mean(context.astype(jnp.float32), axis=0)
        ctx_inv = self._safe_inv_norm(jnp.sum(ctx_avg * ctx_avg, -1))  # (B,)
        tgt_inv = self._safe_inv_norm(jnp.sum(target * target, -1))   # (B,)
        neg_inv = self._safe_inv_norm(
            jnp.sum((negs * negs).astype(jnp.float32), -1))           # (N, B)

        s_true = jnp.sum(ctx_avg * target, -1) * ctx_inv * tgt_inv    # (B,)
        ctx_dot_negs = jnp.einsum("nbd,bd->nb", negs.astype(jnp.float32),
                                  ctx_avg)
        s_neg_nb = ctx_dot_negs * neg_inv * ctx_inv[None, :]          # (N, B)
        s_neg = s_neg_nb.T                                            # (B, N)

        emb = {"target": target * tgt_inv[:, None],
               "context": ctx_avg * ctx_inv[:, None]}
        return s_true, s_neg, emb

    # -- losses ----------------------------------------------------------
    def loss(self, params, batch, *, rng=None, train: bool = True,
             weights=None, role_major: bool = False):
        """batch: dict with 'data' (B, R, D) — or (R, B, D) with
        role_major=True, skipping the internal layout transpose (single-chip
        perf path; DP sharding specs assume batch-major). Optional 'weights'.
        Returns (loss, aux dict)."""
        cfg = self.cfg
        s_true, s_neg, _ = self.scores(params, batch["data"], rng=rng,
                                       train=train, role_major=role_major)
        s_true_b = jnp.broadcast_to(s_true[:, None], s_neg.shape)
        w = weights if weights is not None else batch.get("weights")
        if w is not None:
            # per-SAMPLE weights: (B,) or (B, 1) → (B, 1) so the margin
            # loss broadcasts along the negatives axis (a bare (B,) would
            # align with the trailing N axis — silently weighting each
            # NEGATIVE column when B == N, an error otherwise)
            w = jnp.asarray(w)
            if w.ndim == 1 or (w.ndim == 2 and w.shape[1] == 1):
                if w.shape[0] != s_neg.shape[0]:
                    raise ValueError(
                        f"weights carry {w.shape[0]} entries for batch "
                        f"size {s_neg.shape[0]}")
                w = w.reshape(-1, 1)
        loss, violations = ops.max_margin_loss(
            s_true_b, s_neg, margin=cfg.margin, norm=cfg.norm, weights=w)
        return loss, {"violations": violations,
                      "mean_true_score": jnp.mean(s_true),
                      "mean_neg_score": jnp.mean(s_neg)}

    # -- eval ------------------------------------------------------------
    def extract(self, params, feats):
        """Test-time feature path matching the reference TEST branch
        (mednet_embedding_train.prototxt: slice_test → ELTWISE coeff .25 →
        fc7 → ReLU → NORMALIZATION — i.e. the RAW frames are averaged FIRST,
        then embedded): feats (B, F, D) frame features → (B, E) normalized
        embeddings."""
        avg = jnp.mean(feats, axis=1) if feats.ndim == 3 else feats
        h = self.embed(params, avg, train=False)
        return ops.l2_normalize_rows(h)
