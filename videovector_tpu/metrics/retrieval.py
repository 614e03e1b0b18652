"""Retrieval evaluation metrics — mAP / hit@k / median-rank / recall@k.

These replace the reference's per-row std::sort loops
(ref:src/caffe/layers/retrieval_stats_layer.cpp,
ref:src/caffe/layers/retrieval_rank_stats_layer.cpp) with fully vectorized,
jit-compatible computations: one argsort over the (B, N) "distance" matrix and
masked cumulative sums — no host loop, runs on TPU at batch scale.

Distance convention preserved from the reference: d(i, j) = −2·xᵢ·xⱼᵀ (GEMM
with alpha −2, no norm terms; rank-equivalent to Euclidean distance only when
rows are L2-normalized, which the shipped configs guarantee via NORMALIZATION
layers before the stats layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class IdToClassMap:
    """video_id → class_id lookup table usable inside jit.

    The reference reads a `video_id,class_id` csv
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:29-44) into a std::map;
    lookups of unknown ids default-insert class 0 — we reproduce that default.
    """

    def __init__(self, ids, classes):
        order = np.argsort(ids, kind="stable")
        self.ids = jnp.asarray(np.asarray(ids)[order], dtype=jnp.int32)
        self.classes = jnp.asarray(np.asarray(classes)[order], dtype=jnp.int32)

    @classmethod
    def from_csv(cls, path: str) -> "IdToClassMap":
        ids, classes = [], []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split(",")
                ids.append(int(a))
                classes.append(int(b))
        return cls(ids, classes)

    def lookup(self, query):
        """query: int array → class ids (0 for unknown ids, matching the
        reference's std::map::operator[] default-insert)."""
        q = query.astype(jnp.int32)
        pos = jnp.searchsorted(self.ids, q)
        pos = jnp.clip(pos, 0, self.ids.shape[0] - 1)
        found = self.ids[pos] == q
        return jnp.where(found, self.classes[pos], 0)


def video_level_average(features, video_ids, num_videos: int):
    """Average shot features per video (ref video_level_retrieval mode,
    ref:src/caffe/layers/retrieval_stats_layer.cpp:165-205). Returns
    (video_features (num_videos, D), unique_video_ids (num_videos,)),
    videos ordered by first occurrence (the reference's sequential scan).

    Fully jittable: group ids come from a first-occurrence scan
    (O(N²) equality matrix — trivial at gallery scale) and the averages
    from segment_sum, so the whole eval graph fuses on device.

    Contract: `num_videos` must be static (it sizes the output) and must
    EQUAL the number of distinct ids — the reference CHECKs this
    (CHECK_EQ(num_shots_per_video.size(), max_num_videos_),
    ref:src/caffe/layers/retrieval_stats_layer.cpp:188). Under jit the check
    cannot run: extra videos are silently dropped (segment ids ≥ num_videos
    are discarded by segment_sum) and missing segments pad with zero features
    and int32-min ids. Call `check_num_videos` host-side where num_videos is
    computed to get the reference's error instead of silently wrong mAP."""
    video_ids = jnp.asarray(video_ids).reshape(-1).astype(jnp.int32)
    feats = jnp.asarray(features)
    n = video_ids.shape[0]
    eq = video_ids[:, None] == video_ids[None, :]
    first_idx = jnp.argmax(eq, axis=1)            # first position of my id
    is_first = first_idx == jnp.arange(n)
    seg_of_first = jnp.cumsum(is_first) - 1       # 0-based, first-occurrence order
    seg = seg_of_first[first_idx]                 # every shot → its video's segment
    sums = jax.ops.segment_sum(feats, seg, num_segments=num_videos)
    counts = jax.ops.segment_sum(jnp.ones((n,), feats.dtype), seg,
                                 num_segments=num_videos)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    uniq = jax.ops.segment_max(video_ids, seg, num_segments=num_videos)
    return means, uniq


def check_num_videos(video_ids, num_videos: int) -> None:
    """Host-side twin of the reference's CHECK_EQ on max_num_videos
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:188): raise if the
    distinct-id count differs from the static segment count that
    video_level_average was (or will be) called with."""
    import numpy as np
    actual = len(np.unique(np.asarray(video_ids).reshape(-1)))
    if actual != num_videos:
        raise ValueError(
            f"video_level_retrieval: batch has {actual} distinct video ids "
            f"but max_num_videos = {num_videos} (the reference CHECKs these "
            f"equal; a mismatch silently corrupts video-level mAP)")


def retrieval_stats(features, video_ids, class_ids, *,
                    exclude_same_video_shots: bool = False):
    """Shot-to-shot retrieval mAP / hit@1 / hit@5.

    ref:src/caffe/layers/retrieval_stats_layer.cpp:104-141 (ComputeStats) and
    :143-355 (Forward_cpu). Per query row: rank all items by −2·x·xᵀ ascending
    with the self item forced first (diagonal −1e15) and skipped; optionally
    skip items from the same video; a retrieved item matches when its class
    equals the query's; ap = Σ_match (ret/val) / ret_total; hit@1 = match in
    first valid position; hit@5 = matches among first 5 valid / 5. Queries
    with class < 0 are excluded from all means.

    Args:
      features: (N, D) — should be L2-normalized rows.
      video_ids: (N,) int.
      class_ids: (N,) int — per-item class (use IdToClassMap.lookup).
    Returns dict(mean_ap, hit_at_1, hit_at_5) of f32 scalars.
    """
    n = features.shape[0]
    dist = -2.0 * jnp.dot(features, features.T, preferred_element_type=jnp.float32)
    dist = dist.at[jnp.arange(n), jnp.arange(n)].set(-1e15)
    order = jnp.argsort(dist, axis=1, stable=True)  # ascending; self first

    ranked_vid = video_ids[order]          # (N, N)
    ranked_cls = class_ids[order]          # (N, N)
    q_vid = video_ids[:, None]
    q_cls = class_ids[:, None]

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    valid = pos >= 1                        # skip the self item at rank 0
    if exclude_same_video_shots:
        valid = valid & (ranked_vid != q_vid)
    match = valid & (ranked_cls == q_cls)

    vf = valid.astype(jnp.float32)
    mf = match.astype(jnp.float32)
    val = jnp.cumsum(vf, axis=1)
    ret = jnp.cumsum(mf, axis=1)
    ret_total = ret[:, -1]

    ap = jnp.sum(mf * ret / jnp.maximum(val, 1.0), axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    acc1 = jnp.sum(mf * (val <= 1.0), axis=1)
    acc5 = jnp.sum(mf * (val <= 5.0), axis=1) / 5.0

    include = (class_ids >= 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(include), 1.0)
    return {
        "mean_ap": jnp.sum(ap * include) / denom,
        "hit_at_1": jnp.sum(acc1 * include) / denom,
        "hit_at_5": jnp.sum(acc5 * include) / denom,
    }


from functools import partial


@partial(jax.jit, static_argnums=(7,))
def _chunk_retrieval_stats(feats, vids, cls, q_feats, q_vid, q_cls, q_pos,
                           exclude_same_video_shots):
    """One query chunk of retrieval_stats_chunked: identical math to the
    dense retrieval_stats over (Q, N) rows; returns partial sums."""
    q = q_feats.shape[0]
    n = feats.shape[0]
    dist = -2.0 * jnp.dot(q_feats, feats.T,
                          preferred_element_type=jnp.float32)
    # self item forced first then skipped (diagonal −1e15 trick)
    dist = jnp.where(jnp.arange(n)[None, :] == q_pos[:, None], -1e15, dist)
    order = jnp.argsort(dist, axis=1, stable=True)
    ranked_vid = vids[order]
    ranked_cls = cls[order]
    pos = jax.lax.broadcasted_iota(jnp.int32, (q, n), 1)
    valid = pos >= 1
    if exclude_same_video_shots:
        valid = valid & (ranked_vid != q_vid[:, None])
    match = valid & (ranked_cls == q_cls[:, None])
    vf = valid.astype(jnp.float32)
    mf = match.astype(jnp.float32)
    val = jnp.cumsum(vf, axis=1)
    ret = jnp.cumsum(mf, axis=1)
    ret_total = ret[:, -1]
    ap = jnp.sum(mf * ret / jnp.maximum(val, 1.0), axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    acc1 = jnp.sum(mf * (val <= 1.0), axis=1)
    acc5 = jnp.sum(mf * (val <= 5.0), axis=1) / 5.0
    include = (q_cls >= 0).astype(jnp.float32)
    return (jnp.sum(ap * include), jnp.sum(acc1 * include),
            jnp.sum(acc5 * include), jnp.sum(include))


def retrieval_stats_chunked(features, video_ids, class_ids, *,
                            exclude_same_video_shots: bool = False,
                            query_chunk: int = 256):
    """Gallery-scale retrieval_stats: EXACT same math as retrieval_stats
    (mAP, hit@1, hit@5, stable tie-breaking included) with O(Q·N) device
    memory instead of O(N²).

    The dense path materializes the full (N, N) distance matrix plus its
    argsort — ~3.2 GB at N=20k — fine at the 673-window reference gallery
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:143-355 is O(N²) too)
    but not at corpus scale. This variant processes `query_chunk` query
    rows at a time: each chunk computes its (Q, N) distance rows by one
    GEMM, sorts them, and applies the identical cumsum formulas, so the
    result equals the dense path bit-for-bit per query (same reduction
    shapes, same stable sort). Memory: Q·N·(4 B dist + 4 B order + ~9 B
    masks/cumsums) ≈ 17·Q·N bytes — at N=1e5, Q=256 that's ~0.44 GB;
    compute is the same N²·D GEMM + N·(N log N) sort as dense.

    Returns dict(mean_ap, hit_at_1, hit_at_5) of f32 scalars.
    """
    feats = jnp.asarray(features)
    # device ids are int32 (x64 is off; the dense path truncates the same
    # way via jnp.asarray) — reject out-of-range ids instead of silently
    # aliasing distinct videos/classes mod 2^32
    for name, arr in (("video_ids", video_ids), ("class_ids", class_ids)):
        a = np.asarray(arr)
        if a.size and (a.max() > np.iinfo(np.int32).max
                       or a.min() < np.iinfo(np.int32).min):
            raise ValueError(f"{name} exceed int32 range — remap ids "
                             f"(e.g. np.unique(..., return_inverse=True)) "
                             f"before retrieval eval")
    vids = jnp.asarray(video_ids).reshape(-1).astype(jnp.int32)
    cls = jnp.asarray(class_ids).reshape(-1).astype(jnp.int32)
    n = feats.shape[0]
    q_chunk = min(query_chunk, n)

    sums = np.zeros(4, np.float64)
    for start in range(0, n, q_chunk):
        idx = np.arange(start, min(start + q_chunk, n))
        if len(idx) < q_chunk:  # pad; pads carry class −1 ⇒ include 0
            pad = np.full(q_chunk - len(idx), idx[-1])
            q_cls = jnp.concatenate([cls[idx],
                                     jnp.full(len(pad), -1, jnp.int32)])
            idx = np.concatenate([idx, pad])
        else:
            q_cls = cls[idx]
        # gallery passed as ARGUMENTS (not closed over): one compiled
        # program reused across chunks and calls, nothing inlined as HLO
        # constants
        part = _chunk_retrieval_stats(feats, vids, cls, feats[idx],
                                      vids[idx], q_cls, jnp.asarray(idx),
                                      exclude_same_video_shots)
        sums += np.asarray([float(v) for v in part])
    denom = max(sums[3], 1.0)
    return {
        "mean_ap": jnp.float32(sums[0] / denom),
        "hit_at_1": jnp.float32(sums[1] / denom),
        "hit_at_5": jnp.float32(sums[2] / denom),
    }


def retrieval_stats_report(features, video_ids, class_ids, path: str, *,
                           exclude_same_video_shots: bool = False) -> dict:
    """Host-side per-query csv dump matching the reference's
    `stats_output_file` (ref:src/caffe/layers/retrieval_stats_layer.cpp:
    148-155, 310-340): header `#video_id,class_id,ap,acc@1,acc@5,` + top-5
    retrieved indices and their classes. Returns the aggregate stats dict."""
    feats = np.asarray(features, np.float32)
    vids = np.asarray(video_ids).astype(np.int64)
    classes = np.asarray(class_ids).astype(np.int64)
    n = feats.shape[0]

    # aggregates: dense device math at small n, chunked (same values,
    # O(Q·N) memory) at gallery scale
    if n <= 4096:
        agg = retrieval_stats(
            jnp.asarray(feats), jnp.asarray(vids), jnp.asarray(classes),
            exclude_same_video_shots=exclude_same_video_shots)
    else:
        agg = retrieval_stats_chunked(
            feats, vids, classes,
            exclude_same_video_shots=exclude_same_video_shots)

    def order_rows():
        """Yield (i, order_row) with the csv loop's dense semantics but
        only a (chunk, N) block in memory at a time. Peak per chunk ≈
        12 B/element (4 B f32 dist + 8 B int64 argsort output) plus sort
        scratch — the 2^26-element cap bounds it at roughly 1 GB."""
        chunk = max(1, min(512, (1 << 26) // max(n, 1)))
        for start in range(0, n, chunk):
            idx = np.arange(start, min(start + chunk, n))
            dist = -2.0 * feats[idx] @ feats.T
            dist[np.arange(len(idx)), idx] = -1e15
            order = np.argsort(dist, axis=1, kind="stable")
            for k, i in enumerate(idx):
                yield int(i), order[k]

    with open(path, "w") as f:
        f.write("#video_id,class_id,ap,acc@1,acc@5"
                ",ret_id_1,ret_id_2,ret_id_3,ret_id_4,ret_id_5"
                ",class_id_1,class_id_2,class_id_3,class_id_4,class_id_5\n")
        for i, order_i in order_rows():
            if classes[i] < 0:
                continue
            ap = acc1 = acc5 = 0.0
            val = ret = 0.0
            for j in order_i[1:]:
                if exclude_same_video_shots and vids[j] == vids[i]:
                    continue
                val += 1
                if classes[j] == classes[i]:
                    if val <= 1:
                        acc1 += 1
                    if val <= 5:
                        acc5 += 1
                    ret += 1
                    ap += ret / val
            ap = ap / ret if ret > 0 else 0.0
            acc5 /= 5
            # top-5 retrieved from other videos (ref :315-321)
            top5 = [j for j in order_i if vids[j] != vids[i]][:5]
            top5 += [0] * (5 - len(top5))
            f.write(f"{vids[i]},{classes[i]},{ap},{acc1},{acc5},"
                    + ",".join(str(j) for j in top5) + ","
                    + ",".join(str(classes[j]) for j in top5) + "\n")
    return {k: float(v) for k, v in agg.items()}


def _bucket_video_id(item_idx, num_videos: int, positive_size: int):
    """ref GetVideoId (retrieval_rank_stats_layer.cpp:108-129): items are laid
    out in buckets of num_videos; the first positive_size buckets are
    positives (id = item % num_videos), the rest negatives
    (id = −(item % num_videos)). Note −0 == 0: video 0's negatives alias its
    positives — preserved deliberately for parity."""
    bucket = item_idx // num_videos
    vid = item_idx % num_videos
    return jnp.where(bucket >= positive_size, -vid, vid)


def retrieval_rank_stats(context, targets, *, compute_ap: bool = False,
                         positive_size: int = 0, negative_size: int = 0):
    """Context-vs-target retrieval: median rank, recall@1/5/10, mAP.

    ref:src/caffe/layers/retrieval_rank_stats_layer.cpp. Scores are
    −2·context·targetsᵀ, ranked ascending per query.

    Without compute_ap (identity mode, B == F): rank of target i for query i;
    recall@k = 1[rank ≤ k]; mean_ap output is 0.

    With compute_ap: relevance via the positive/negative bucket layout (see
    _bucket_video_id); ap = Σ ret/val over matches / ret_total; rank = first
    match position; rec@5 normalized by min(ret, 5), rec@10 by min(ret, 10)
    (ref ComputeApStats:131-182).

    Returns dict(median_rank, recall_at_1, recall_at_5, recall_at_10, mean_ap).
    """
    b = context.shape[0]
    f = targets.shape[0]
    dist = -2.0 * jnp.dot(context, targets.T, preferred_element_type=jnp.float32)
    order = jnp.argsort(dist, axis=1, stable=True)  # (B, F) ascending

    if not compute_ap:
        if b != f:
            raise ValueError("identity mode requires batch == num_frames")
        # rank of item i in row i (1-based)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, f), 1)
        rank = jnp.sum(jnp.where(order == jnp.arange(b)[:, None], pos, 0), axis=1) + 1
        ranks_f = rank.astype(jnp.float32)
        rec1 = (rank == 1).astype(jnp.float32)
        rec5 = (rank <= 5).astype(jnp.float32)
        rec10 = (rank <= 10).astype(jnp.float32)
        mean_ap = jnp.float32(0.0)
    else:
        num_videos = f // max(positive_size + negative_size, 1)
        gv = _bucket_video_id(order, num_videos, positive_size)  # (B, F)
        match = (gv == jnp.arange(b)[:, None]).astype(jnp.float32)
        val = jax.lax.broadcasted_iota(jnp.float32, (b, f), 1) + 1.0
        ret = jnp.cumsum(match, axis=1)
        ret_total = ret[:, -1]
        ap = jnp.sum(match * ret / val, axis=1)
        ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
        mean_ap = jnp.mean(ap)
        # best rank = first match position (10000 when no match, ref :139)
        first = jnp.min(jnp.where(match > 0, val, 1e4), axis=1)
        ranks_f = first
        rec1 = jnp.sum(match * (val <= 1.0), axis=1)
        rec5_cnt = jnp.sum(match * (val <= 5.0), axis=1)
        rec10_cnt = jnp.sum(match * (val <= 10.0), axis=1)
        rec5 = jnp.where(ret_total > 0,
                         rec5_cnt / jnp.minimum(jnp.maximum(ret_total, 1.0), 5.0), 0.0)
        rec10 = jnp.where(ret_total > 0,
                          rec10_cnt / jnp.minimum(jnp.maximum(ret_total, 1.0), 10.0), 0.0)

    sorted_ranks = jnp.sort(ranks_f)
    if b % 2 == 0:
        median = (sorted_ranks[b // 2 - 1] + sorted_ranks[b // 2]) / 2.0
    else:
        median = sorted_ranks[b // 2]
    return {
        "median_rank": median,
        "recall_at_1": jnp.mean(rec1),
        "recall_at_5": jnp.mean(rec5),
        "recall_at_10": jnp.mean(rec10),
        "mean_ap": mean_ap,
    }


def retrieval_rank_stats_fixed_ref(features, video_ids, ref_features, ref_video_ids):
    """Rank stats against a fixed reference gallery
    (ref:src/caffe/layers/retrieval_rank_stats_fixed_ref_layer.cpp:116-233).
    A gallery item is relevant for query i when its video id matches the
    query's; gallery ids < 0 are global negatives.

    Returns dict(median_rank, recall_at_1, recall_at_5, recall_at_10, mean_ap).
    """
    b = features.shape[0]
    f = ref_features.shape[0]
    dist = -2.0 * jnp.dot(features, ref_features.T, preferred_element_type=jnp.float32)
    order = jnp.argsort(dist, axis=1, stable=True)
    ranked_vid = ref_video_ids[order]                      # (B, F)
    match = (ranked_vid == video_ids[:, None]).astype(jnp.float32)
    val = jax.lax.broadcasted_iota(jnp.float32, (b, f), 1) + 1.0
    ret = jnp.cumsum(match, axis=1)
    ret_total = ret[:, -1]
    ap = jnp.sum(match * ret / val, axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    first = jnp.min(jnp.where(match > 0, val, 1e4), axis=1)
    rec1 = jnp.sum(match * (val <= 1.0), axis=1)
    rec5 = jnp.where(ret_total > 0,
                     jnp.sum(match * (val <= 5.0), axis=1)
                     / jnp.minimum(jnp.maximum(ret_total, 1.0), 5.0), 0.0)
    rec10 = jnp.where(ret_total > 0,
                      jnp.sum(match * (val <= 10.0), axis=1)
                      / jnp.minimum(jnp.maximum(ret_total, 1.0), 10.0), 0.0)
    sorted_ranks = jnp.sort(first)
    if b % 2 == 0:
        median = (sorted_ranks[b // 2 - 1] + sorted_ranks[b // 2]) / 2.0
    else:
        median = sorted_ranks[b // 2]
    return {
        "median_rank": median,
        "recall_at_1": jnp.mean(rec1),
        "recall_at_5": jnp.mean(rec5),
        "recall_at_10": jnp.mean(rec10),
        "mean_ap": jnp.mean(ap),
    }
