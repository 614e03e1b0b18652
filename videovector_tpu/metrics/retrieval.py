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
    """One query chunk of retrieval_stats_chunked (sort engine): identical
    math to the dense retrieval_stats over (Q, N) rows; returns per-query
    (ap, acc1, acc5, include) arrays."""
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
    return ap, acc1, acc5, include


@partial(jax.jit, static_argnums=(8,))
def _chunk_retrieval_counts(feats, vids, cls, q_feats, q_vid, q_cls, q_pos,
                            rel_idx, exclude_same_video_shots):
    """Rank-by-COUNTING query chunk: identical results to the sort-based
    chunk, no argsort.

    mAP/hit@1/hit@5 only need, for each RELEVANT candidate of each query,
    its rank among valid candidates and among relevant ones — both are
    `#(key < my key)` counts, where key = (distance, index) lexicographic
    (exactly the dense path's stable argsort order). Keys are pre-masked
    monotone int32 pairs (invalid → INT32_MAX, computed once per (Q, N)
    row — NOT per cube element), so the O(Q·M·N) valid-rank cube is 4
    integer VPU ops per element; the match-rank count only scans the
    query's own M class members — an (Q, M, M) cube, a factor N/M smaller
    than the full-gallery formulation (chip measurements in PERF.md r4).

    rel_idx: (Q, M) gallery positions of each query's class members
    (host-precomputed; -1 pads). Returns the same partial sums as
    _chunk_retrieval_stats.
    """
    q = q_feats.shape[0]
    n = feats.shape[0]
    m = rel_idx.shape[1]
    dist = -2.0 * jnp.dot(q_feats, feats.T,
                          preferred_element_type=jnp.float32)
    mono = _mono_i32(dist)                                    # (Q, N)
    gidx = jax.lax.broadcasted_iota(jnp.int32, mono.shape, 1)

    safe_rel = jnp.clip(rel_idx, 0, n - 1)
    mono_rel = jnp.take_along_axis(mono, safe_rel, axis=1)    # (Q, M)
    rel_vid = vids[safe_rel]                                  # (Q, M)
    # a relevant candidate must itself be valid: not the query item, not
    # a pad, and (optionally) not from the query's video
    rel_ok = (rel_idx >= 0) & (rel_idx != q_pos[:, None])
    if exclude_same_video_shots:
        rel_ok = rel_ok & (rel_vid != q_vid[:, None])

    # invalid gallery entries masked to (MAX, MAX) keys once per row —
    # finite-distance keys never collide with the masks, so the cube
    # needs no separate validity operand
    valid = gidx != q_pos[:, None]
    if exclude_same_video_shots:
        valid = valid & (vids[None, :] != q_vid[:, None])
    g_mono = jnp.where(valid, mono, _I32_MAX)
    g_idx = jnp.where(valid, gidx, _I32_MAX)

    # valid-candidate rank: scan the gallery in 512-column chunks, cube
    # bounded to (Q, M, kc)
    cnt_v = _chunked_rank_count(g_mono, g_idx, mono_rel, rel_idx)

    # match rank: only the query's class members can match, and rel_idx
    # already lists exactly those — compare the (Q, M) member keys
    # against themselves (masked to valid members) instead of re-scanning
    # the gallery for class equality. The (Q, M, M) cube is scanned in
    # mc-column chunks like the gallery cube: at corpus scale with few
    # classes M grows with N (250k rows / 50 classes → M ≈ 5.2k, a 13.8
    # G-element cube that crashed the chip worker in round 5) — chunking
    # bounds it to (Q, M, mc), bit-equal sums
    m_mono = jnp.where(rel_ok, mono_rel, _I32_MAX)
    m_idx = jnp.where(rel_ok, rel_idx, _I32_MAX)
    cnt_m = _chunked_rank_count(m_mono, m_idx, mono_rel, rel_idx)

    valrank = (cnt_v + 1).astype(jnp.float32)                 # 1-based
    matchrank = (cnt_m + 1).astype(jnp.float32)
    okf = rel_ok.astype(jnp.float32)
    ret_total = jnp.sum(okf, axis=1)
    ap = jnp.sum(okf * matchrank / valrank, axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    acc1 = jnp.sum(okf * (valrank <= 1.0), axis=1)
    acc5 = jnp.sum(okf * (valrank <= 5.0), axis=1) / 5.0
    include = (q_cls >= 0).astype(jnp.float32)
    # per-query arrays — the csv report consumes them; the aggregate
    # wrapper sums them host-side
    return ap, acc1, acc5, include


_I32_MAX = np.int32(np.iinfo(np.int32).max)


def _chunked_rank_count(c_mono, c_idx, q_mono, q_idx, chunk: int = 512):
    """#(candidate key < query key) per query member, the candidate keys
    scanned in `chunk`-column blocks so the (Q, M, chunk) compare cube
    bounds the working set (unbounded, the M≈5.2k member cube at
    250k/50cls crashed the chip worker — round 5).

    Candidates c_mono/c_idx: (Q, K) int32 (distance, index) key pairs with
    invalid/pad entries PRE-MASKED to _I32_MAX; queries q_mono/q_idx:
    (Q, M). `less` is the lexicographic stable-argsort order. Bit-equal to
    the unchunked count: int32 sums, and _I32_MAX pad columns compare
    False against every finite query key. The single implementation behind
    the valid-rank and match-rank cubes of BOTH the single-device and
    gallery-sharded count engines — their bit-equality is the module's
    central invariant."""
    q, k = c_mono.shape
    m = q_mono.shape[1]
    kc = min(chunk, k)
    pad = ((k + kc - 1) // kc) * kc - k
    cm = jnp.pad(c_mono, ((0, 0), (0, pad)), constant_values=_I32_MAX) \
        .reshape(q, -1, kc).transpose(1, 0, 2)                # (nk, Q, kc)
    ci = jnp.pad(c_idx, ((0, 0), (0, pad)), constant_values=_I32_MAX) \
        .reshape(q, -1, kc).transpose(1, 0, 2)

    def body(cnt, xs):
        gm, gi = xs                                           # (Q, kc)
        less = ((gm[:, None, :] < q_mono[:, :, None])
                | ((gm[:, None, :] == q_mono[:, :, None])
                   & (gi[:, None, :] < q_idx[:, :, None])))
        return cnt + jnp.sum(less.astype(jnp.int32), axis=2), None

    cnt, _ = jax.lax.scan(body, jnp.zeros((q, m), jnp.int32), (cm, ci))
    return cnt


def _run_chunk_engine(method, feats, vids, cls, q_feats, q_vid, qc, qp,
                      table_row, exclude):
    """Dispatch one query chunk to the selected engine — the single
    dispatch shared by the scanned driver and the host-loop driver (their
    bit-equality is certified by tests/test_gallery_bf16.py)."""
    if method == "search":
        return _chunk_retrieval_search(feats, vids, cls, q_feats, q_vid,
                                       qc, qp, table_row, exclude)
    if method == "count":
        return _chunk_retrieval_counts(feats, vids, cls, q_feats, q_vid,
                                       qc, qp, table_row, exclude)
    return _chunk_retrieval_stats(feats, vids, cls, q_feats, q_vid, qc, qp,
                                  exclude)


def _mono_i32(d):
    """f32 → int32 whose SIGNED order equals the float order (sign-flip
    trick). −0.0 is canonicalized to +0.0 first so ties match
    float-compare semantics exactly."""
    d = d + 0.0  # IEEE: -0.0 + 0.0 == +0.0 (not folded — XLA is strict)
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    return jnp.where(bits >= 0, bits, bits ^ jnp.int32(0x7FFFFFFF))


def _searchsorted_2key(s_mono, s_idx, q_mono, q_idx):
    """Count, per query, how many sorted keys are lexicographically below
    it: batched binary search over (mono, idx) int32 key pairs — the
    exact (distance, index) stable-argsort order without x64 packing.

    s_mono/s_idx: (..., K) sorted ascending by (mono, idx); q_mono/q_idx:
    query keys, same leading dims (broadcastable). Returns int32 counts,
    shape of the broadcast queries."""
    k = s_mono.shape[-1]
    q_mono, q_idx = jnp.broadcast_arrays(q_mono, q_idx)
    shape = jnp.broadcast_shapes(s_mono.shape[:-1] + (1,), q_mono.shape)
    lo = jnp.zeros(shape, jnp.int32)
    hi = jnp.full(shape, k, jnp.int32)
    for _ in range(max(int(k).bit_length(), 1)):
        proceed = lo < hi
        mid = jnp.clip((lo + hi) // 2, 0, k - 1)
        sm = jnp.take_along_axis(s_mono, mid, axis=-1)
        si = jnp.take_along_axis(s_idx, mid, axis=-1)
        less = (sm < q_mono) | ((sm == q_mono) & (si < q_idx))
        lo = jnp.where(proceed & less, mid + 1, lo)
        hi = jnp.where(proceed & ~less, mid, hi)
    return lo


@partial(jax.jit, static_argnums=(8, 9))
def _chunk_retrieval_search(feats, vids, cls, q_feats, q_vid, q_cls, q_pos,
                            rel_idx, exclude_same_video_shots,
                            sort_chunk=2048):
    """Rank-by-SEARCH query chunk: identical results to the count/sort
    engines, computed as sorted-key binary-search counts.

    Each query row's (distance, index) keys are packed into int32 pairs
    (invalid → MAX), VALUES-sorted in sort_chunk pieces (no index
    permutation, no vid/cls gathers), and every relevant candidate's rank
    is a lexicographic binary search: O(Q·N·log²(sort_chunk)) sort lanes
    + O(Q·M·log) search gathers. The match rank searches the (Q, M)
    candidate keys themselves.

    REJECTED as a default on chip measurement (PERF.md r4): despite the
    better asymptotics, XLA:TPU's sort lanes and take_along_axis bisection
    gathers make it 7× slower than the count engine at 20k×4096 (48.5s vs
    6.7s warm). Kept as an exactness cross-check engine.
    """
    n = feats.shape[0]
    dist = -2.0 * jnp.dot(q_feats, feats.T,
                          preferred_element_type=jnp.float32)
    mono = _mono_i32(dist)                                    # (Q, N)
    gidx = jax.lax.broadcasted_iota(jnp.int32, mono.shape, 1)

    safe_rel = jnp.clip(rel_idx, 0, n - 1)
    mono_rel = jnp.take_along_axis(mono, safe_rel, axis=1)    # (Q, M)
    rel_vid = vids[safe_rel]
    rel_ok = (rel_idx >= 0) & (rel_idx != q_pos[:, None])
    if exclude_same_video_shots:
        rel_ok = rel_ok & (rel_vid != q_vid[:, None])

    valid = gidx != q_pos[:, None]
    if exclude_same_video_shots:
        valid = valid & (vids[None, :] != q_vid[:, None])
    g_mono = jnp.where(valid, mono, _I32_MAX)
    g_idx = jnp.where(valid, gidx, _I32_MAX)

    kc = min(sort_chunk, n)
    npad = ((n + kc - 1) // kc) * kc
    pad = npad - n
    q = q_feats.shape[0]
    g_mono = jnp.pad(g_mono, ((0, 0), (0, pad)), constant_values=_I32_MAX) \
        .reshape(q, npad // kc, kc)
    g_idx = jnp.pad(g_idx, ((0, 0), (0, pad)), constant_values=_I32_MAX) \
        .reshape(q, npad // kc, kc)
    s_mono, s_idx = jax.lax.sort((g_mono, g_idx), dimension=2, num_keys=2)
    cnt_v = jnp.sum(_searchsorted_2key(
        s_mono, s_idx, mono_rel[:, None, :], rel_idx[:, None, :]), axis=1)

    m_mono = jnp.where(rel_ok, mono_rel, _I32_MAX)
    m_idx = jnp.where(rel_ok, rel_idx, _I32_MAX)
    sm_mono, sm_idx = jax.lax.sort((m_mono, m_idx), dimension=1, num_keys=2)
    cnt_m = _searchsorted_2key(sm_mono, sm_idx, mono_rel, rel_idx)

    valrank = (cnt_v + 1).astype(jnp.float32)
    matchrank = (cnt_m + 1).astype(jnp.float32)
    okf = rel_ok.astype(jnp.float32)
    ret_total = jnp.sum(okf, axis=1)
    ap = jnp.sum(okf * matchrank / valrank, axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    acc1 = jnp.sum(okf * (valrank <= 1.0), axis=1)
    acc5 = jnp.sum(okf * (valrank <= 5.0), axis=1) / 5.0
    include = (q_cls >= 0).astype(jnp.float32)
    return ap, acc1, acc5, include


def _class_member_table(cls_np: np.ndarray):
    """(member_table (C+1, M) int32 w/ -1 pads, row_of_query (N,)) — row C
    is all-pads, assigned to negative-class queries (they are excluded
    from the means but still flow through the chunk in padded slots)."""
    n = cls_np.shape[0]
    nonneg = cls_np >= 0
    uniq, inv = np.unique(cls_np[nonneg], return_inverse=True)
    c = len(uniq)
    counts = np.bincount(inv, minlength=c) if c else np.zeros(0, np.int64)
    m = int(counts.max()) if c else 1
    table = np.full((c + 1, m), -1, np.int32)
    order = np.argsort(inv, kind="stable")
    pos_nonneg = np.flatnonzero(nonneg).astype(np.int32)
    starts = np.zeros(c + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for ci in range(c):
        mem = pos_nonneg[order[starts[ci]:starts[ci + 1]]]
        table[ci, :len(mem)] = mem
    row_of_query = np.full(n, c, np.int32)
    row_of_query[nonneg] = inv
    return table, row_of_query


def _scan_partials_impl(feats, vids, cls, table_j, qpos, qcls, qrows,
                        method, exclude):
    """All query chunks of retrieval_stats_chunked in ONE program:
    lax.scan over (nk, q_chunk) query-position/class/member-row arrays,
    each step running the selected chunk engine and emitting its 4-way
    partial sums. Returns (nk, 4) f32 in chunk order — the caller reduces
    in f64 host-side, preserving the host-loop accumulation order."""

    def body(_, xs):
        qp, qc, qr = xs
        ap, acc1, acc5, inc = _run_chunk_engine(
            method, feats, vids, cls, feats[qp], vids[qp], qc, qp,
            table_j[qr], exclude)
        part = jnp.stack([jnp.sum(ap * inc), jnp.sum(acc1 * inc),
                          jnp.sum(acc5 * inc), jnp.sum(inc)])
        return None, part

    _, parts = jax.lax.scan(body, None, (qpos, qcls, qrows))
    return parts


_scan_retrieval_partials = partial(jax.jit, static_argnums=(7, 8))(
    _scan_partials_impl)


def _report_chunk_impl(feats, vids, cls, table_j, qp, qc, qr,
                       use_count, exclude):
    """One query chunk of retrieval_stats_report: per-query (ap, acc@1,
    acc@5, include) from the chunk engines plus the stable top-5
    retrieved from OTHER videos
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:315-321) — k=5
    iterated argmin+mask passes, whose first-occurrence tie rule
    reproduces the stable ascending (distance, index) order bit-for-bit
    (see the inline note: lax.top_k gave the same bytes but rides the
    slow sort lanes). Shared verbatim by the scan driver (lax.scan body)
    and the big-gallery host-loop driver, so the two are bit-equal by
    construction."""
    k5 = min(5, feats.shape[0])
    q_feats = feats[qp]
    q_vid = vids[qp]
    if use_count:
        ap, acc1, acc5, inc = _chunk_retrieval_counts(
            feats, vids, cls, q_feats, q_vid, qc, qp, table_j[qr],
            exclude)
    else:
        ap, acc1, acc5, inc = _chunk_retrieval_stats(
            feats, vids, cls, q_feats, q_vid, qc, qp, exclude)
    d = -2.0 * jnp.dot(q_feats, feats.T,
                       preferred_element_type=jnp.float32)
    d = jnp.where(vids[None, :] == q_vid[:, None], jnp.inf, d)
    # k=5 iterated argmin+mask instead of lax.top_k: XLA:TPU top_k
    # rides the (slow) sort lanes — ~95 ms per (256, 20k) chunk
    # measured, vs ~10 VPU passes here. argmin's first-occurrence
    # tie rule IS the stable ascending (distance, index) order.
    gidx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tops, valids = [], []
    for _ in range(k5):
        i = jnp.argmin(d, axis=1).astype(jnp.int32)
        v = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
        tops.append(i)
        valids.append(jnp.isfinite(v))
        d = jnp.where(gidx == i[:, None], jnp.inf, d)
    top = jnp.stack(tops, axis=1)
    valid = jnp.stack(valids, axis=1)
    return ap, acc1, acc5, inc, top, valid


def _scan_report_impl(feats, vids, cls, table_j, qpos, qcls, qrows,
                      use_count, exclude):
    """All per-query rows of retrieval_stats_report in ONE program:
    lax.scan over query chunks, each chunk = _report_chunk_impl."""
    def body(_, xs):
        qp, qc, qr = xs
        return None, _report_chunk_impl(feats, vids, cls, table_j,
                                        qp, qc, qr, use_count, exclude)

    _, rows = jax.lax.scan(body, None, (qpos, qcls, qrows))
    return rows


_scan_report_rows = partial(jax.jit, static_argnums=(7, 8))(
    _scan_report_impl)
_report_chunk_rows = partial(jax.jit, static_argnums=(7, 8))(
    _report_chunk_impl)


_MESH_SCAN_CACHE: dict = {}


def _mesh_scan(mesh, impl, static_arg, exclude, n_out: int):
    """jit(shard_map(...)) of a scanned chunk engine over the mesh's
    "data" axis: the (nk, q_chunk) query-chunk arrays shard on the chunk
    axis, gallery/table replicate, and each device runs its OWN
    sequential scan over nk/ndev chunks (sharding a lax.scan's input
    under GSPMD would not parallelize the sequential loop — shard_map
    does). No collectives: outputs are per-chunk rows assembled back on
    the chunk axis, so results are the same per-chunk f32 partials in
    the same chunk order as single-device — bit-equal after the caller's
    host f64 reduction."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    key = (mesh, impl, static_arg, exclude)
    fn = _MESH_SCAN_CACHE.get(key)
    if fn is None:
        body = partial(impl, method=static_arg, exclude=exclude) \
            if impl is _scan_partials_impl else \
            partial(impl, use_count=static_arg, exclude=exclude)
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P("data"), P("data")),
            out_specs=P("data") if n_out == 1 else tuple(
                P("data") for _ in range(n_out)),
            check_vma=False))
        _MESH_SCAN_CACHE[key] = fn
    return fn


def _chunk_counts_gshard(feats_l, vids_l, qp, qc, rel_idx, off, n_total,
                         exclude, axis="data"):
    """One query chunk of the GALLERY-SHARDED count engine.

    Runs inside shard_map with the gallery rows sharded over `axis`:
    `feats_l`/`vids_l` are this device's (ns, D)/(ns,) shard and `off` its
    global row offset. Rank-by-counting decomposes exactly over gallery
    shards — each device counts `#(local key < member key)` against its own
    rows and the counts psum — so no device ever holds the full gallery
    (the replicated-gallery mesh path needs N·D per chip; this path needs
    N·D/ndev, letting galleries exceed single-chip HBM). Per-chunk
    collectives are tiny: the (Q, D) query features (each query row owned
    by exactly one shard — psum of a one-hot contribution is exact), the
    (Q, M) member keys, and the (Q, M) int32 counts, all riding ICI.

    Returns the per-query (ap, acc1, acc5, include) plus (dist, gidx,
    q_vid) for the report's top-5 pass. Results are identical on every
    device (replicated epilogue after exact integer psums)."""
    ns = feats_l.shape[0]
    # assemble this chunk's query features/ids from the sharded gallery:
    # exactly one shard owns each query row, everyone else contributes 0
    sel_q = (qp >= off) & (qp < off + ns)
    lq = jnp.clip(qp - off, 0, ns - 1)
    q_feats = jax.lax.psum(
        jnp.where(sel_q[:, None], feats_l[lq], 0), axis)
    q_vid = jax.lax.psum(jnp.where(sel_q, vids_l[lq], 0), axis)

    dist = -2.0 * jnp.dot(q_feats, feats_l.T,
                          preferred_element_type=jnp.float32)   # (Q, ns)
    mono = _mono_i32(dist)
    gidx = off + jax.lax.broadcasted_iota(jnp.int32, mono.shape, 1)

    # member keys: the shard owning each class member extracts its
    # (distance, index) key from the LOCAL distance row; int32 psum of
    # single-owner contributions is exact
    sel_m = (rel_idx >= off) & (rel_idx < off + ns)
    lm = jnp.clip(rel_idx - off, 0, ns - 1)
    mono_rel = jax.lax.psum(
        jnp.where(sel_m, jnp.take_along_axis(mono, lm, axis=1), 0), axis)
    rel_vid = jax.lax.psum(jnp.where(sel_m, vids_l[lm], 0), axis)
    rel_ok = (rel_idx >= 0) & (rel_idx != qp[:, None])
    if exclude:
        rel_ok = rel_ok & (rel_vid != q_vid[:, None])

    # local gallery keys, pad rows (gidx >= n_total) always invalid
    valid = (gidx != qp[:, None]) & (gidx < n_total)
    if exclude:
        valid = valid & (vids_l[None, :] != q_vid[:, None])
    g_mono = jnp.where(valid, mono, _I32_MAX)
    g_idx = jnp.where(valid, gidx, _I32_MAX)

    # valid-candidate rank over the LOCAL shard (counts are additive over
    # gallery shards — exact integer psum)
    cnt_v = jax.lax.psum(
        _chunked_rank_count(g_mono, g_idx, mono_rel, rel_idx), axis)

    # match rank: member-vs-member keys are fully replicated now; same
    # chunked cube as the single-device engine (M grows with N/classes —
    # unbounded it crashed the chip worker at 250k/50cls)
    m_mono = jnp.where(rel_ok, mono_rel, _I32_MAX)
    m_idx = jnp.where(rel_ok, rel_idx, _I32_MAX)
    cnt_m = _chunked_rank_count(m_mono, m_idx, mono_rel, rel_idx)

    valrank = (cnt_v + 1).astype(jnp.float32)
    matchrank = (cnt_m + 1).astype(jnp.float32)
    okf = rel_ok.astype(jnp.float32)
    ret_total = jnp.sum(okf, axis=1)
    ap = jnp.sum(okf * matchrank / valrank, axis=1)
    ap = jnp.where(ret_total > 0, ap / jnp.maximum(ret_total, 1.0), 0.0)
    acc1 = jnp.sum(okf * (valrank <= 1.0), axis=1)
    acc5 = jnp.sum(okf * (valrank <= 5.0), axis=1) / 5.0
    include = (qc >= 0).astype(jnp.float32)
    return ap, acc1, acc5, include, dist, gidx, q_vid


def _scan_partials_gshard_impl(feats_l, vids_l, table_j, qpos, qcls, qrows,
                               n_total, exclude):
    """Gallery-sharded twin of _scan_partials_impl: every device scans ALL
    query chunks against its OWN gallery shard (so the per-chunk GEMM and
    count cube are each ndev× smaller) and the partials are replicated."""
    off = jax.lax.axis_index("data").astype(jnp.int32) * feats_l.shape[0]

    def body(_, xs):
        qp, qc, qr = xs
        ap, acc1, acc5, inc = _chunk_counts_gshard(
            feats_l, vids_l, qp, qc, table_j[qr], off, n_total, exclude)[:4]
        part = jnp.stack([jnp.sum(ap * inc), jnp.sum(acc1 * inc),
                          jnp.sum(acc5 * inc), jnp.sum(inc)])
        return None, part

    _, parts = jax.lax.scan(body, None, (qpos, qcls, qrows))
    return parts


def _scan_report_gshard_impl(feats_l, vids_l, table_j, qpos, qcls, qrows,
                             n_total, exclude):
    """Gallery-sharded twin of _scan_report_impl: per-query stats from the
    sharded count engine plus an exact distributed top-5 — each shard picks
    its local top-5 by iterated argmin, the (Q, ndev·5) candidate pool is
    all-gathered (tiny), and 5 more argmin passes merge it. Ties merge
    correctly because shard-major pool order IS ascending global index
    order for equal distances (shards own disjoint ascending index
    ranges), so argmin's first-occurrence rule reproduces the stable
    (distance, index) order bit-for-bit."""
    off = jax.lax.axis_index("data").astype(jnp.int32) * feats_l.shape[0]
    ns = feats_l.shape[0]
    k5l = min(5, ns)
    k5g = min(5, n_total)

    def body(_, xs):
        qp, qc, qr = xs
        ap, acc1, acc5, inc, dist, gidx, q_vid = _chunk_counts_gshard(
            feats_l, vids_l, qp, qc, table_j[qr], off, n_total, exclude)
        # top-5 retrieved from OTHER videos
        # (ref:src/caffe/layers/retrieval_stats_layer.cpp:315-321)
        d = jnp.where((vids_l[None, :] == q_vid[:, None])
                      | (gidx >= n_total), jnp.inf, dist)
        liota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        cds, cis = [], []
        for _i in range(k5l):
            i = jnp.argmin(d, axis=1).astype(jnp.int32)
            v = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
            cds.append(v)
            cis.append(off + i)
            d = jnp.where(liota == i[:, None], jnp.inf, d)
        cand_d = jnp.stack(cds, axis=1)                      # (Q, k5l)
        cand_i = jnp.stack(cis, axis=1)
        pool_d = jax.lax.all_gather(cand_d, "data")          # (ndev, Q, k5l)
        pool_i = jax.lax.all_gather(cand_i, "data")
        ndev = pool_d.shape[0]
        pool_d = jnp.moveaxis(pool_d, 0, 1).reshape(cand_d.shape[0],
                                                    ndev * k5l)
        pool_i = jnp.moveaxis(pool_i, 0, 1).reshape(cand_i.shape[0],
                                                    ndev * k5l)
        piota = jax.lax.broadcasted_iota(jnp.int32, pool_d.shape, 1)
        tops, valids = [], []
        for _i in range(k5g):
            i = jnp.argmin(pool_d, axis=1).astype(jnp.int32)
            v = jnp.take_along_axis(pool_d, i[:, None], axis=1)[:, 0]
            tops.append(jnp.take_along_axis(pool_i, i[:, None],
                                            axis=1)[:, 0])
            valids.append(jnp.isfinite(v))
            pool_d = jnp.where(piota == i[:, None], jnp.inf, pool_d)
        top = jnp.stack(tops, axis=1)
        valid = jnp.stack(valids, axis=1)
        return None, (ap, acc1, acc5, inc, top, valid)

    _, rows = jax.lax.scan(body, None, (qpos, qcls, qrows))
    return rows


_GSHARD_SCAN_CACHE: dict = {}


def _gshard_scan(mesh, impl, n_total, exclude, n_out: int):
    """jit(shard_map(...)) of a gallery-sharded scanned engine: gallery
    rows shard over the mesh's "data" axis, query-chunk arrays and the
    member table replicate, outputs are replicated (identical on every
    device after the exact integer psums)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    key = (mesh, impl, n_total, exclude)
    fn = _GSHARD_SCAN_CACHE.get(key)
    if fn is None:
        body = partial(impl, n_total=n_total, exclude=exclude)
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P("data"), P("data"), P(), P(), P(), P()),
            out_specs=P() if n_out == 1 else tuple(
                P() for _ in range(n_out)),
            check_vma=False))
        _GSHARD_SCAN_CACHE[key] = fn
    return fn


def _shard_gallery(mesh, feats, vids_np):
    """Pad the gallery to a multiple of the data axis and device_put it
    sharded on axis 0. A HOST (numpy) gallery is padded in host RAM and
    device_put directly with the sharding — the full array never lands on
    any single device, which is the whole point of shard_gallery (callers
    must NOT jnp.asarray the gallery first: that commits N·D to the
    default device before the sharded put). A device-resident input is
    resharded (its single-device footprint was the caller's choice)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    ndev = mesh.shape["data"]
    n = feats.shape[0]
    ns = -(-n // ndev)
    pad = ns * ndev - n
    if isinstance(feats, jax.Array):
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad,) + tuple(feats.shape[1:]),
                                  feats.dtype)])
    else:
        feats = np.asarray(feats)
        if pad:
            feats = np.concatenate(
                [feats, np.zeros((pad,) + tuple(feats.shape[1:]),
                                 feats.dtype)])
    if pad:
        vids_np = np.concatenate([vids_np, np.full(pad, -1, np.int32)])
    feats_sh = jax.device_put(
        feats, NamedSharding(mesh, P("data", *([None] * (feats.ndim - 1)))))
    vids_sh = jax.device_put(jnp.asarray(vids_np),
                             NamedSharding(mesh, P("data")))
    return feats_sh, vids_sh


def _cast_gallery_host(features, gallery_dtype: str):
    """Validate/cast the gallery for `gallery_dtype` BEFORE device
    placement. bf16 halves the gallery's HBM footprint (1M x 4096 = 8.4
    GB instead of 16.8 — single-chip evaluable); the cast happens in HOST
    RAM (ml_dtypes.bfloat16) for numpy inputs so no f32 copy ever lands
    on a device.

    Exactness semantics (documented, tested in test_gallery_bf16.py):
    features quantize to bf16 ONCE; distances are then computed from
    bf16 operands with f32 accumulation (MXU-native), and the rank
    engines are EXACT with respect to those distances — rank-by-counting
    over monotone int32 keys of the f32 products, stable (distance,
    index) tie order included (count == sort bit-for-bit at any dtype).
    The only deviation from the f32 engine is input rounding: ranks can
    migrate where an f32 distance gap is below bf16 input precision
    (~2^-8 relative). The reference's own eval math is the same
    -2 X Xᵀ GEMM (ref:src/caffe/layers/retrieval_stats_layer.cpp:208-210)
    in f32."""
    if gallery_dtype in ("float32", "f32", None):
        return features
    if gallery_dtype not in ("bfloat16", "bf16"):
        raise ValueError(f"gallery_dtype must be float32 or bfloat16, "
                         f"got {gallery_dtype!r}")
    import ml_dtypes
    if isinstance(features, jax.Array):
        # no-op when already bf16 — an eager astype would copy the full
        # gallery (8.4 GB at 1M x 4096)
        return (features if features.dtype == jnp.bfloat16
                else features.astype(jnp.bfloat16))
    arr = np.asarray(features)
    return (arr if arr.dtype == ml_dtypes.bfloat16
            else arr.astype(ml_dtypes.bfloat16))


# Above this many gallery rows the monolithic scanned program trips a
# TPU-runtime fault (worker crash at result fetch — observed on v5e at
# 250k and 500k rows, round 5; 100k ran clean at 47.4 s). The host-loop
# driver bounds each compiled program to one query chunk and is
# bit-equal; its per-chunk dispatch cost is negligible at these sizes
# (the 500k eval is ~21 min of device work). PERF.md "Driver note".
_SCAN_DRIVER_MAX_ROWS = 200_000


def _resolve_chunk_driver(chunk_driver: str, n: int, mesh) -> str:
    """'auto' → 'host' for big single-device galleries on TPU backends
    (see _SCAN_DRIVER_MAX_ROWS; the fault is TPU-runtime-specific, so
    CPU/GPU keep the scan), else 'scan'. Explicit values pass through —
    'scan' stays available for measurements, and the mesh engines are
    scan-only (sharding bounds per-device work instead). Raises on
    unknown drivers and on host+mesh, for every engine branch."""
    if chunk_driver == "auto":
        return ("host"
                if (mesh is None and n > _SCAN_DRIVER_MAX_ROWS
                    and jax.default_backend() in ("tpu", "axon"))
                else "scan")
    if chunk_driver not in ("scan", "host"):
        raise ValueError(f"chunk_driver must be auto, scan or host, got "
                         f"{chunk_driver!r}")
    if chunk_driver == "host" and mesh is not None:
        raise ValueError("chunk_driver='host' does not compose with mesh= "
                         "(the sharded engines are scan-driven); drop one")
    return chunk_driver


def retrieval_stats_chunked(features, video_ids, class_ids, *,
                            exclude_same_video_shots: bool = False,
                            query_chunk: int = 256, method: str = "auto",
                            mesh=None, shard_gallery: bool = False,
                            gallery_dtype: str = "float32",
                            chunk_driver: str = "auto"):
    """Gallery-scale retrieval_stats: EXACT same results as retrieval_stats
    (mAP, hit@1, hit@5, stable tie-breaking included) with O(Q·N) device
    memory instead of O(N²).

    The dense path materializes the full (N, N) distance matrix plus its
    argsort — ~3.2 GB at N=20k — fine at the 673-window reference gallery
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:143-355 is O(N²) too)
    but not at corpus scale. Three chunked engines, identical outputs:

    - "count" (the "auto" default on TPU): rank-by-counting — each
      relevant candidate's rank is a masked `#(key < mine)`
      compare-reduction over pre-masked monotone int32 keys (O(Q·M·N)
      cube for the valid rank, O(Q·M·M) member-vs-member for the match
      rank; M = max class size). No sort lanes at all — the fastest
      engine at every shape measured on chip (PERF.md r4).
    - "sort": the (Q, N) stable-argsort + cumsum formulation — the
      "auto" default on the CPU backend (XLA:CPU's native sort beats its
      compare cubes) and the fallback for degenerate class structure
      (one giant class drives the count cube to O(Q·N²)).
    - "search": sorted-key binary-search ranks (values-sort in pieces +
      lexicographic bisection) — O(Q·N·log²) asymptotics, but measured
      7× SLOWER than "count" on chip at 20k×4096 (48.5s vs 6.7s: XLA:TPU
      sort lanes and gather-based bisection are both slow paths); kept
      as a tested engine for exactness cross-checks, never auto-chosen.

    With `mesh=` (a (data, model) Mesh from parallel.make_mesh), the
    query-chunk axis shards over the mesh's "data" axis via shard_map —
    each device scans its own chunk subset against the replicated
    gallery, with no collectives (see _mesh_scan) — and results stay
    bit-equal to the single-device scan.

    With `shard_gallery=True` (requires mesh; count engine only) the
    GALLERY rows shard over the "data" axis instead: per-device memory
    drops to N·D/ndev — galleries larger than one chip's HBM become
    evaluable — and each device's GEMM + count cube shrink ndev× while
    tiny per-chunk psums (query rows, member keys, counts — all exact
    single-owner or integer reductions) ride ICI (see
    _chunk_counts_gshard). Results are identical to the single-device
    count engine.

    `chunk_driver` picks how chunks are dispatched: "scan" runs every
    chunk inside ONE jitted lax.scan program (fastest — the 0.67 s/20k
    path), "host" dispatches one jitted call per chunk (bit-equal; the
    big-gallery escape hatch — see _SCAN_DRIVER_MAX_ROWS), "auto"
    (default) picks host above 200k rows on TPU and scan otherwise.

    Returns dict(mean_ap, hit_at_1, hit_at_5) of f32 scalars.
    """
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
    vids_np = np.asarray(video_ids).reshape(-1).astype(np.int32)
    cls_np = np.asarray(class_ids).reshape(-1).astype(np.int32)
    # compact gallery keys: cast host-side so the full-precision array
    # never lands on a device (see _cast_gallery_host for the exactness
    # semantics — ranks are exact w.r.t. the quantized distances)
    features = _cast_gallery_host(features, gallery_dtype)
    n = features.shape[0]
    q_chunk = min(query_chunk, n)
    # resolve/validate up front so EVERY branch (incl. shard_gallery,
    # which is scan-driven) rejects bad or host+mesh drivers loudly
    chunk_driver = _resolve_chunk_driver(chunk_driver, n, mesh)

    if shard_gallery:
        # NOTE: no jnp.asarray(features) on this path — that would commit
        # the full N·D gallery to the default device before the sharded
        # put, defeating the memory claim (see _shard_gallery)
        if mesh is None:
            raise ValueError("shard_gallery=True requires mesh=")
        if method not in ("auto", "count"):
            raise ValueError("shard_gallery supports only the count "
                             "engine (rank counts are additive over "
                             f"gallery shards; sorts are not) — got "
                             f"method={method!r}")
        table, row_of_query = _class_member_table(cls_np)
        table_j = jnp.asarray(table)
        nk = (n + q_chunk - 1) // q_chunk
        npad = nk * q_chunk - n
        qpos_np = np.concatenate([np.arange(n, dtype=np.int32),
                                  np.full(npad, n - 1, np.int32)])
        qcls_np = np.concatenate([cls_np, np.full(npad, -1, np.int32)])
        rows_np = np.concatenate([row_of_query,
                                  np.full(npad, table.shape[0] - 1,
                                          np.int32)])
        feats_sh, vids_sh = _shard_gallery(mesh, features, vids_np)
        parts = _gshard_scan(mesh, _scan_partials_gshard_impl, n,
                             exclude_same_video_shots, 1)(
            feats_sh, vids_sh, table_j,
            jnp.asarray(qpos_np.reshape(nk, q_chunk)),
            jnp.asarray(qcls_np.reshape(nk, q_chunk)),
            jnp.asarray(rows_np.reshape(nk, q_chunk)))
        sums = np.zeros(4, np.float64)
        for row in np.asarray(parts):
            sums += row.astype(np.float64)
        denom = max(sums[3], 1.0)
        return {
            "mean_ap": jnp.float32(sums[0] / denom),
            "hit_at_1": jnp.float32(sums[1] / denom),
            "hit_at_5": jnp.float32(sums[2] / denom),
        }

    feats = jnp.asarray(features)
    vids = jnp.asarray(vids_np)
    cls = jnp.asarray(cls_np)
    if method == "auto":
        table, row_of_query = _class_member_table(cls_np)
        # count wins on TPU unless the class structure is degenerate
        # (huge M drives the cube to O(Q·N·M≈N²)); CPU favors its native
        # sort (PERF.md r4)
        method = ("count"
                  if jax.default_backend() not in ("cpu",)
                  and table.shape[1] <= max(256, n // 8)
                  else "sort")
    elif method in ("count", "search"):
        table, row_of_query = _class_member_table(cls_np)
    elif method != "sort":
        raise ValueError(f"unknown method {method!r}")
    if method in ("count", "search"):
        table_j = jnp.asarray(table)

    # one device-pure program: lax.scan over query chunks inside ONE jit,
    # returning per-chunk partial sums in chunk order. Per-chunk math is
    # identical to a host loop of chunk calls, and the host still reduces
    # the f32 partials in f64 in the same order — results are bit-equal.
    # What this removes is pure tunnel overhead: at 20k×4096 the host loop
    # paid ~40 dispatches + 160 scalar fetches of round-trip latency
    # around ~0.9 s of actual cube/GEMM device time (PERF.md r4).
    nk = (n + q_chunk - 1) // q_chunk
    if mesh is not None:  # whole pad chunks land on the last shards;
        ndev = mesh.shape["data"]  # class −1 ⇒ include 0, zero partials
        nk = ((nk + ndev - 1) // ndev) * ndev
    npad = nk * q_chunk - n
    qpos_np = np.concatenate([np.arange(n, dtype=np.int32),
                              np.full(npad, n - 1, np.int32)])
    qcls_np = np.concatenate([cls_np, np.full(npad, -1, np.int32)])
    if method in ("count", "search"):
        rows_np = np.concatenate([row_of_query,
                                  np.full(npad, table.shape[0] - 1,
                                          np.int32)])
    else:
        table_j = jnp.zeros((1, 1), jnp.int32)
        rows_np = np.zeros(n + npad, np.int32)
    def chunk_args():
        # built only by the scan/mesh drivers — the host loop transfers
        # one chunk of indices per dispatch instead (no point shipping
        # the full padded index arrays it would never read)
        return (feats, vids, cls, table_j,
                jnp.asarray(qpos_np.reshape(nk, q_chunk)),
                jnp.asarray(qcls_np.reshape(nk, q_chunk)),
                jnp.asarray(rows_np.reshape(nk, q_chunk)))

    if chunk_driver == "host":
        # host-loop driver: one jitted dispatch per chunk instead of one
        # giant scanned program. Pays per-chunk dispatch latency but
        # bounds each PROGRAM to a single chunk — the escape hatch for
        # very large galleries where the monolithic scan trips runtime
        # faults (observed on v5e at 250k+ rows, round 5). Partial sums
        # are computed on device with the scan body's exact expression,
        # so results stay bit-equal to the scan driver.
        qpos_r = qpos_np.reshape(nk, q_chunk)
        qcls_r = qcls_np.reshape(nk, q_chunk)
        rows_r = rows_np.reshape(nk, q_chunk)
        parts = []
        for ci in range(nk):
            qp = jnp.asarray(qpos_r[ci])
            qc = jnp.asarray(qcls_r[ci])
            ap, acc1, acc5, inc = _run_chunk_engine(
                method, feats, vids, cls, feats[qp], vids[qp], qc, qp,
                table_j[jnp.asarray(rows_r[ci])], exclude_same_video_shots)
            parts.append(np.asarray(jnp.stack(
                [jnp.sum(ap * inc), jnp.sum(acc1 * inc),
                 jnp.sum(acc5 * inc), jnp.sum(inc)])))
    elif mesh is not None:
        parts = _mesh_scan(mesh, _scan_partials_impl, method,
                           exclude_same_video_shots, 1)(*chunk_args())
    else:
        parts = _scan_retrieval_partials(
            *chunk_args(), method, exclude_same_video_shots)
    sums = np.zeros(4, np.float64)
    for row in np.asarray(parts):
        sums += row.astype(np.float64)
    denom = max(sums[3], 1.0)
    return {
        "mean_ap": jnp.float32(sums[0] / denom),
        "hit_at_1": jnp.float32(sums[1] / denom),
        "hit_at_5": jnp.float32(sums[2] / denom),
    }


def retrieval_stats_report(features, video_ids, class_ids, path: str, *,
                           exclude_same_video_shots: bool = False,
                           mesh=None, shard_gallery: bool = False,
                           method: str = "auto",
                           gallery_dtype: str = "float32",
                           chunk_driver: str = "auto") -> dict:
    """Host-side per-query csv dump matching the reference's
    `stats_output_file` (ref:src/caffe/layers/retrieval_stats_layer.cpp:
    148-155, 310-340): header `#video_id,class_id,ap,acc@1,acc@5,` + top-5
    retrieved (from OTHER videos, ref :315-321) indices and their classes.
    Returns the aggregate stats dict.

    Fully vectorized: ONE scanned device program (the same dispatch
    collapse as retrieval_stats_chunked) computes per-query ap/acc via
    the chunked engines (rank-by-counting on TPU, sort on CPU — same
    backend-aware choice as retrieval_stats_chunked) and the stable
    top-5 picks (k iterated argmin+mask passes; argmin's
    first-occurrence tie rule IS the stable (distance, index) order) —
    no per-row Python ranking loops, no host GEMM, and device features
    stay on device (no D2H roundtrip), so a 100k-row dump takes seconds,
    not hours. Float fields print with %g (6 significant digits), the
    reference's ostream formatting. `mesh=` shards the query-chunk axis
    over the mesh's "data" axis (same bit-equal shard_map driver as
    retrieval_stats_chunked); `shard_gallery=True` (requires mesh)
    shards the GALLERY rows instead so per-device memory is N·D/ndev,
    with an exact distributed top-5 merge (see
    _scan_report_gshard_impl) — identical csv bytes. `chunk_driver` is
    the same knob as retrieval_stats_chunked's: "auto" (default) routes
    big single-device TPU galleries to a per-chunk host loop — the
    monolithic scan trips a runtime fault above _SCAN_DRIVER_MAX_ROWS —
    with identical csv bytes (the chunk body is shared verbatim)."""
    compact = gallery_dtype not in ("float32", "f32", None)
    if shard_gallery and not isinstance(features, jax.Array):
        # host gallery: cast in host RAM and let _shard_gallery device_put
        # it SHARDED — jnp.asarray here would commit the full N·D array to
        # the default device first, defeating shard_gallery's memory claim
        feats_j = np.asarray(features, np.float32)
        if compact:
            feats_j = _cast_gallery_host(feats_j, gallery_dtype)
    elif compact:
        # compact keys halve HBM; cast host inputs in host RAM (see
        # _cast_gallery_host for the exactness semantics)
        feats_j = _cast_gallery_host(features, gallery_dtype)
        if not isinstance(feats_j, jax.Array):
            feats_j = jnp.asarray(feats_j)
    else:
        feats_j = jnp.asarray(features)
        if feats_j.dtype != jnp.float32:
            feats_j = feats_j.astype(jnp.float32)
    vids64 = np.asarray(video_ids).astype(np.int64).reshape(-1)
    cls64 = np.asarray(class_ids).astype(np.int64).reshape(-1)
    n = feats_j.shape[0]
    for name, a in (("video_ids", vids64), ("class_ids", cls64)):
        if a.size and (a.max() > np.iinfo(np.int32).max
                       or a.min() < np.iinfo(np.int32).min):
            raise ValueError(f"{name} exceed int32 range — remap ids "
                             f"before retrieval eval")
    vids_np = vids64.astype(np.int32)
    cls_np = cls64.astype(np.int32)
    vids_j = jnp.asarray(vids_np)
    cls_j = jnp.asarray(cls_np)
    table, row_of_query = _class_member_table(cls_np)
    table_j = jnp.asarray(table)
    if method == "auto":
        use_count = (jax.default_backend() not in ("cpu",)
                     and table.shape[1] <= max(256, n // 8))
    elif method in ("count", "sort"):
        use_count = method == "count"
    else:
        raise ValueError(f"unknown method {method!r} (report engines: "
                         f"auto/count/sort)")

    # one scanned device program for ALL per-query rows (same dispatch
    # collapse as retrieval_stats_chunked — the host loop paid one relay
    # round-trip per chunk); only csv string formatting stays host-side
    q_chunk = max(1, min(256, (1 << 25) // max(n, 1)))
    nk = (n + q_chunk - 1) // q_chunk
    chunk_driver = _resolve_chunk_driver(chunk_driver, n, mesh)
    if shard_gallery and mesh is None:
        raise ValueError("shard_gallery=True requires mesh=")
    if shard_gallery and method == "sort":
        raise ValueError("shard_gallery supports only the count engine "
                         "(rank counts are additive over gallery shards; "
                         "sorts are not)")
    if mesh is not None and not shard_gallery:
        # pad chunks → include 0 rows, skipped in the csv
        ndev = mesh.shape["data"]
        nk = ((nk + ndev - 1) // ndev) * ndev
    npad = nk * q_chunk - n
    qpos_np = np.concatenate([np.arange(n, dtype=np.int32),
                              np.full(npad, n - 1, np.int32)])
    qcls_np = np.concatenate([cls_np, np.full(npad, -1, np.int32)])
    rows_np = np.concatenate([row_of_query,
                              np.full(npad, table.shape[0] - 1, np.int32)])
    def chunk_args():
        # built only by the scan/mesh drivers — the host loop transfers
        # one chunk of indices per dispatch instead (no point shipping
        # the full padded index arrays it would never read)
        return (feats_j, vids_j, cls_j, table_j,
                jnp.asarray(qpos_np.reshape(nk, q_chunk)),
                jnp.asarray(qcls_np.reshape(nk, q_chunk)),
                jnp.asarray(rows_np.reshape(nk, q_chunk)))

    if shard_gallery:
        feats_sh, vids_sh = _shard_gallery(mesh, feats_j, vids_np)
        ap_c, acc1_c, acc5_c, inc_c, top5_c, valid5_c = _gshard_scan(
            mesh, _scan_report_gshard_impl, n,
            exclude_same_video_shots, 6)(
            feats_sh, vids_sh, *chunk_args()[3:])
    elif mesh is not None:
        ap_c, acc1_c, acc5_c, inc_c, top5_c, valid5_c = _mesh_scan(
            mesh, _scan_report_impl, use_count,
            exclude_same_video_shots, 6)(*chunk_args())
    elif chunk_driver == "host":
        # host-loop driver: one jitted dispatch per chunk — bounds each
        # PROGRAM to a single chunk (see _SCAN_DRIVER_MAX_ROWS); the
        # chunk body is _report_chunk_impl, the scan body's exact code,
        # so csv bytes are identical to the scan driver
        qpos_r = qpos_np.reshape(nk, q_chunk)
        qcls_r = qcls_np.reshape(nk, q_chunk)
        rows_r = rows_np.reshape(nk, q_chunk)
        parts = []
        for ci in range(nk):
            out = _report_chunk_rows(
                feats_j, vids_j, cls_j, table_j,
                jnp.asarray(qpos_r[ci]), jnp.asarray(qcls_r[ci]),
                jnp.asarray(rows_r[ci]), use_count,
                exclude_same_video_shots)
            parts.append(tuple(np.asarray(x) for x in out))
        ap_c, acc1_c, acc5_c, inc_c, top5_c, valid5_c = (
            np.stack([p[i] for p in parts]) for i in range(6))
    else:
        ap_c, acc1_c, acc5_c, inc_c, top5_c, valid5_c = _scan_report_rows(
            *chunk_args(), use_count, exclude_same_video_shots)
    # per-chunk f32 partials accumulated in f64 in chunk order (the
    # host-loop accumulation semantics, preserved)
    ap_c, acc1_c, acc5_c, inc_c = (np.asarray(ap_c), np.asarray(acc1_c),
                                   np.asarray(acc5_c), np.asarray(inc_c))
    sums = np.zeros(4, np.float64)
    for ci in range(nk):
        sums += [float(np.sum(ap_c[ci] * inc_c[ci])),
                 float(np.sum(acc1_c[ci] * inc_c[ci])),
                 float(np.sum(acc5_c[ci] * inc_c[ci])),
                 float(np.sum(inc_c[ci]))]

    ap = ap_c.reshape(-1)[:n]
    acc1 = acc1_c.reshape(-1)[:n]
    acc5 = acc5_c.reshape(-1)[:n]
    k5 = top5_c.shape[-1]
    top5 = np.asarray(top5_c).reshape(-1, k5)[:n].astype(np.int64)
    valid5 = np.asarray(valid5_c).reshape(-1, k5)[:n]
    if k5 < 5:
        top5 = np.pad(top5, ((0, 0), (0, 5 - k5)))
        valid5 = np.pad(valid5, ((0, 0), (0, 5 - k5)))

    with open(path, "w") as f:
        f.write("#video_id,class_id,ap,acc@1,acc@5"
                ",ret_id_1,ret_id_2,ret_id_3,ret_id_4,ret_id_5"
                ",class_id_1,class_id_2,class_id_3,class_id_4,class_id_5\n")
        lines = []
        # the reference's top_5_ids vector lives OUTSIDE the query loop
        # (retrieval_stats_layer.cpp:216, filled :310-317): a query with
        # fewer than 5 other-video retrievals leaves its unfilled slots
        # holding the PREVIOUS written row's ids (0 before any fill), and
        # the class columns print those carried ids' classes — preserved
        # byte-for-byte. Fills are a rank prefix, so valid5 masks exactly
        # the slots the reference overwrites.
        carry = np.zeros(5, np.int64)
        for i in range(n):  # formatting only — no ranking math
            if cls_np[i] < 0:
                continue
            carry = np.where(valid5[i], top5[i], carry)
            lines.append(
                f"{vids64[i]},{cls64[i]},{ap[i]:g},{acc1[i]:g},"
                f"{acc5[i]:g},"
                + ",".join(str(j) for j in carry) + ","
                + ",".join(str(c) for c in cls64[carry]) + "\n")
        f.write("".join(lines))

    denom = max(sums[3], 1.0)
    return {"mean_ap": sums[0] / denom, "hit_at_1": sums[1] / denom,
            "hit_at_5": sums[2] / denom}


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
    (dist, order, ranks_f, rec1, rec5, rec10,
     mean_ap) = _rank_stats_peritem(context, targets, compute_ap,
                                    positive_size, negative_size)
    return {
        "median_rank": _median_rank(ranks_f),
        "recall_at_1": jnp.mean(rec1),
        "recall_at_5": jnp.mean(rec5),
        "recall_at_10": jnp.mean(rec10),
        "mean_ap": mean_ap,
    }


def _rank_stats_peritem(context, targets, compute_ap, positive_size,
                        negative_size):
    """Per-item pieces shared by retrieval_rank_stats and its csv report:
    (dist (B, F), stable ascending order (B, F), rank, rec@1/5/10 arrays
    (B,), mean_ap scalar)."""
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
    return dist, order, ranks_f, rec1, rec5, rec10, mean_ap


def _median_rank(ranks_f):
    """ref median: sort, exact middle (mean of the two central elements
    for even counts), retrieval_rank_stats_layer.cpp:287-295."""
    b = ranks_f.shape[0]
    sorted_ranks = jnp.sort(ranks_f)
    if b % 2 == 0:
        return (sorted_ranks[b // 2 - 1] + sorted_ranks[b // 2]) / 2.0
    return sorted_ranks[b // 2]


def _write_rank_stats_csv(path, dist, order, ranks_f, rec1, rec5,
                          video_ids=None):
    """The reference rank-stats csv (retrieval_rank_stats_layer.cpp:
    188-268, retrieval_rank_stats_fixed_ref_layer.cpp:120-221): header
    `#item_id,rank,rec@1,rec@5,ret_id_1..5`, rows
    `i[,video_id],rank,rec1,rec5,id1..id5,d1..d5` — the header names
    neither the fixed-ref video_id column nor the five distance columns,
    and the top-5 id slots beyond min(batch, 5) keep their initial 0
    (the reference's `jj < num_samples` cap with num_samples = batch
    size) — all preserved byte-for-byte. Truncates per call (default
    ofstream::open)."""
    dist = np.asarray(dist)
    order = np.asarray(order)
    b = order.shape[0]
    k = min(b, 5, order.shape[1])
    top5 = np.zeros((b, 5), np.int64)
    top5[:, :k] = order[:, :k]
    d5 = np.take_along_axis(dist, top5, axis=1)
    ranks = np.asarray(ranks_f)
    rec1 = np.asarray(rec1)
    rec5 = np.asarray(rec5)
    with open(path, "w") as f:
        f.write("#item_id,rank,rec@1,rec@5"
                ",ret_id_1,ret_id_2,ret_id_3,ret_id_4,ret_id_5\n")
        lines = []
        for i in range(b):
            vid = f"{int(video_ids[i])}," if video_ids is not None else ""
            lines.append(
                f"{i},{vid}{int(ranks[i])},{rec1[i]:g},{rec5[i]:g},"
                + ",".join(str(int(j)) for j in top5[i]) + ","
                + ",".join(f"{float(v):g}" for v in d5[i]) + "\n")
        f.write("".join(lines))


def retrieval_rank_stats_report(context, targets, path: str, *,
                                compute_ap: bool = False,
                                positive_size: int = 0,
                                negative_size: int = 0) -> dict:
    """retrieval_rank_stats + the reference's per-item csv dump
    (ref:src/caffe/layers/retrieval_rank_stats_layer.cpp:188-268).
    Returns the same aggregate dict."""
    (dist, order, ranks_f, rec1, rec5, rec10,
     mean_ap) = _rank_stats_peritem(jnp.asarray(context),
                                    jnp.asarray(targets), compute_ap,
                                    positive_size, negative_size)
    _write_rank_stats_csv(path, dist, order, ranks_f, rec1, rec5)
    return {
        "median_rank": _median_rank(ranks_f),
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
    (dist, order, first, rec1, rec5, rec10,
     ap) = _fixed_ref_peritem(features, video_ids, ref_features,
                              ref_video_ids)
    return {
        "median_rank": _median_rank(first),
        "recall_at_1": jnp.mean(rec1),
        "recall_at_5": jnp.mean(rec5),
        "recall_at_10": jnp.mean(rec10),
        "mean_ap": jnp.mean(ap),
    }


def _fixed_ref_peritem(features, video_ids, ref_features, ref_video_ids):
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
    return dist, order, first, rec1, rec5, rec10, ap


def retrieval_rank_stats_fixed_ref_report(features, video_ids, ref_features,
                                          ref_video_ids, path: str) -> dict:
    """retrieval_rank_stats_fixed_ref + the reference's per-item csv
    (ref:src/caffe/layers/retrieval_rank_stats_fixed_ref_layer.cpp:
    120-221; rows carry an extra video_id column the header does not
    name). Returns the same aggregate dict."""
    features = jnp.asarray(features)
    video_ids = jnp.asarray(video_ids).reshape(-1).astype(jnp.int32)
    ref_features = jnp.asarray(ref_features)
    ref_video_ids = jnp.asarray(ref_video_ids).reshape(-1).astype(jnp.int32)
    (dist, order, first, rec1, rec5, rec10,
     ap) = _fixed_ref_peritem(features, video_ids, ref_features,
                              ref_video_ids)
    _write_rank_stats_csv(path, dist, order, first, rec1, rec5,
                          video_ids=np.asarray(video_ids))
    return {
        "median_rank": _median_rank(first),
        "recall_at_1": jnp.mean(rec1),
        "recall_at_5": jnp.mean(rec5),
        "recall_at_10": jnp.mean(rec10),
        "mean_ap": jnp.mean(ap),
    }
