"""End-to-end video retrieval pipeline — frames in, ranked videos out.

BASELINE.json config 5 ("end-to-end batched video retrieval eval:
decode+fc7+embedding inference over long videos"): the reference runs this as
three separate processes (extract_features.bin → LMDB → embedding net →
retrieval_stats layer). Here it is ONE jitted program per batch:

  uint8 frames (N, H, W, C)
    → fused crop/mean transform        (data/transformer.py, on device)
    → MedNet conv1..fc7                (models/mednet.py, NHWC bf16)
    → embedding tower + L2 normalize   (models/embedding.py)
    → scores vs a device-resident gallery, top-k

so frames stream H2D as uint8 and only (N, k) results leave the device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from videovector_tpu.data.transformer import TransformConfig, make_batch_transform
from videovector_tpu.models.embedding import VideoEmbeddingConfig, VideoEmbeddingModel
from videovector_tpu.models.mednet import MedNet, MedNetConfig
from videovector_tpu.ops.normalization import l2_normalize_rows


@dataclass
class RetrievalPipelineConfig:
    image_hw: tuple = (256, 256)
    crop: int = 227
    embed_dim: int = 4096
    top_k: int = 5
    compute_dtype: str = "bfloat16"
    # "NHWC" is the fast path: frames arrive in decode order (H, W, C) and
    # the crop gathers feed conv1 with no layout copy (traced: removes
    # ~0.26 ms/batch-50 of pure transposes). "NCHW" accepts Caffe blobs.
    pixels_layout: str = "NHWC"


class RetrievalPipeline:
    def __init__(self, cfg: RetrievalPipelineConfig = RetrievalPipelineConfig(),
                 *, mean: np.ndarray | None = None):
        self.cfg = cfg
        self.mednet = MedNet(MedNetConfig(
            input_hw=(cfg.crop, cfg.crop), fc7=4096,
            compute_dtype=cfg.compute_dtype))
        self.embedder = VideoEmbeddingModel(VideoEmbeddingConfig(
            feature_dim=4096, embed_dim=cfg.embed_dim,
            compute_dtype=cfg.compute_dtype, dropout_rate=0.0))
        self.transform = make_batch_transform(
            TransformConfig(crop_size=cfg.crop), mean, cfg.image_hw,
            layout=cfg.pixels_layout)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"mednet": self.mednet.init(k1),
                "tower": self.embedder.init(k2)["tower"]}

    # ------------------------------------------------------------------
    def embed_frames(self, params, pixels_u8, h_off, w_off, mirror):
        """uint8 frames ((N,H,W,C) for pixels_layout NHWC, (N,C,H,W) for
        NCHW) → (N, E) unit embeddings. Jittable."""
        x = self.transform(pixels_u8, h_off, w_off, mirror)
        if self.cfg.pixels_layout == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))                # → NHWC
        fc7 = self.mednet.forward(params["mednet"], x)        # (N, 4096)
        emb = self.embedder.embed({"tower": params["tower"]}, fc7)
        return l2_normalize_rows(emb)

    def query(self, params, pixels_u8, h_off, w_off, mirror, gallery,
              gallery_ids):
        """One fused program: frames → embeddings → scores vs the gallery →
        (top-k ids, top-k scores). gallery: (G, E) unit rows (device)."""
        emb = self.embed_frames(params, pixels_u8, h_off, w_off, mirror)
        scores = jnp.dot(emb, gallery.T, preferred_element_type=jnp.float32)
        top_scores, top_idx = jax.lax.top_k(scores, self.cfg.top_k)
        return gallery_ids[top_idx], top_scores

    # ------------------------------------------------------------------
    def build_gallery(self, params, frame_batches, video_ids_per_batch, *,
                      jit: bool = True):
        """Average frame embeddings per video → (num_videos, E) unit gallery.
        frame_batches: iterable of (pixels, h_off, w_off, mirror) tuples;
        video_ids_per_batch: the matching iterable of per-batch id arrays
        (zipped positionally with frame_batches)."""
        fn = jax.jit(self.embed_frames) if jit else self.embed_frames
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for (pix, h, w, m), vids in zip(frame_batches, video_ids_per_batch):
            emb = np.asarray(fn(params, pix, h, w, m))
            for e, v in zip(emb, np.asarray(vids)):
                v = int(v)
                if v in sums:
                    sums[v] += e
                    counts[v] += 1
                else:
                    sums[v] = e.copy()
                    counts[v] = 1
        ids = sorted(sums)
        mat = np.stack([sums[v] / counts[v] for v in ids])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-10
        return jnp.asarray(mat), jnp.asarray(ids, jnp.int32)
