"""Metric golden tests against NumPy loop transcriptions of the reference's
per-row sort algorithms (ref:src/caffe/layers/retrieval_stats_layer.cpp,
retrieval_rank_stats_layer.cpp, classification_stats_layer.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from videovector_tpu.metrics import (
    IdToClassMap, retrieval_rank_stats, retrieval_stats, video_level_average,
)
from videovector_tpu.metrics.classification import classification_stats
from videovector_tpu.metrics.retrieval import retrieval_rank_stats_fixed_ref


# -- NumPy oracle transcribing the reference loop ---------------------------

def _oracle_retrieval_stats(feats, vids, classes, exclude_same_video):
    # Use the exact same XLA dot as the implementation so near-tie orderings
    # don't flip on f32 accumulation-order differences vs NumPy BLAS.
    n = feats.shape[0]
    dist = np.array(-2.0 * jnp.dot(jnp.asarray(feats), jnp.asarray(feats).T,
                                   preferred_element_type=jnp.float32))
    np.fill_diagonal(dist, -1e15)
    maps, a1s, a5s = [], [], []
    for i in range(n):
        if classes[i] < 0:
            continue
        order = np.argsort(dist[i], kind="stable")
        assert order[0] == i
        ap = acc1 = acc5 = 0.0
        val = ret = 0.0
        for j in order[1:]:
            if exclude_same_video and vids[j] == vids[i]:
                continue
            val += 1
            if classes[j] == classes[i]:
                if val <= 1:
                    acc1 += 1
                if val <= 5:
                    acc5 += 1
                ret += 1
                ap += ret / val
        if ret > 0:
            ap /= ret
        maps.append(ap)
        a1s.append(acc1)
        a5s.append(acc5 / 5)
    return np.mean(maps), np.mean(a1s), np.mean(a5s)


@pytest.mark.parametrize("exclude", [False, True])
def test_retrieval_stats_matches_oracle(rng, exclude):
    n, d = 24, 8
    feats = rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 8, size=(n,))
    id2cls = {v: v % 3 for v in range(8)}
    classes = np.array([id2cls[v] for v in vids])

    out = retrieval_stats(jnp.asarray(feats), jnp.asarray(vids),
                          jnp.asarray(classes), exclude_same_video_shots=exclude)
    e_map, e_a1, e_a5 = _oracle_retrieval_stats(feats, vids, classes, exclude)
    np.testing.assert_allclose(float(out["mean_ap"]), e_map, rtol=1e-5)
    np.testing.assert_allclose(float(out["hit_at_1"]), e_a1, rtol=1e-5)
    np.testing.assert_allclose(float(out["hit_at_5"]), e_a5, rtol=1e-5)


def test_retrieval_stats_negative_class_excluded(rng):
    n, d = 10, 4
    feats = rng.randn(n, d).astype(np.float32)
    vids = np.arange(n)
    classes = np.array([-1] * 5 + [1] * 5)
    out = retrieval_stats(jnp.asarray(feats), jnp.asarray(vids), jnp.asarray(classes))
    e_map, _, _ = _oracle_retrieval_stats(feats, vids, classes, False)
    np.testing.assert_allclose(float(out["mean_ap"]), e_map, rtol=1e-5)


def test_id_to_class_map():
    m = IdToClassMap([30, 10, 20], [3, 1, 2])
    out = np.asarray(m.lookup(jnp.asarray([10, 20, 30, 99])))
    # unknown id -> 0 (std::map default-insert semantics)
    np.testing.assert_array_equal(out, [1, 2, 3, 0])


def test_video_level_average(rng):
    feats = rng.randn(6, 4).astype(np.float32)
    vids = np.array([5, 5, 7, 7, 7, 9])
    vf, uids = video_level_average(feats, vids, 3)
    np.testing.assert_array_equal(np.asarray(uids), [5, 7, 9])
    np.testing.assert_allclose(np.asarray(vf)[1], feats[2:5].mean(0), rtol=1e-6)


def test_video_level_average_jits_and_orders_by_first_occurrence(rng):
    """The eval graph must fuse on device: video_level_average under jit,
    videos in first-occurrence order (the reference's sequential scan,
    ref:src/caffe/layers/retrieval_stats_layer.cpp:165-205), interleaved
    video ids handled."""
    import jax
    feats = rng.randn(8, 5).astype(np.float32)
    vids = np.array([9, 3, 9, 3, 1, 9, 1, 3])  # interleaved, not sorted
    fn = jax.jit(lambda f, v: video_level_average(f, v, 3))
    vf, uids = fn(feats, vids)
    np.testing.assert_array_equal(np.asarray(uids), [9, 3, 1])
    np.testing.assert_allclose(np.asarray(vf)[0], feats[[0, 2, 5]].mean(0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vf)[1], feats[[1, 3, 7]].mean(0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vf)[2], feats[[4, 6]].mean(0),
                               rtol=1e-5)


def test_check_num_videos(rng):
    """Host-side twin of the reference's CHECK_EQ(num_shots_per_video.size(),
    max_num_videos_) (ref:src/caffe/layers/retrieval_stats_layer.cpp:188)."""
    from videovector_tpu.metrics.retrieval import check_num_videos
    check_num_videos(np.array([5, 5, 7, 9]), 3)
    with pytest.raises(ValueError, match="distinct video ids"):
        check_num_videos(np.array([5, 5, 7, 9]), 2)
    with pytest.raises(ValueError, match="distinct video ids"):
        check_num_videos(np.array([5, 5, 7, 9]), 4)


def test_video_level_retrieval_mode(rng):
    """video_level_retrieval averages shots per video before ranking
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:165-208): perfect
    video-level stats when each video's shots are noisy copies of a
    class-distinct direction."""
    from videovector_tpu.metrics.retrieval import (
        retrieval_stats, video_level_average,
    )
    # 4 videos, 2 classes: videos 0,1 -> class 0 direction e0; 2,3 -> e1
    dirs = np.eye(2, 8, dtype=np.float32)
    feats, vids = [], []
    for v in range(4):
        for s in range(3):
            noise = rng.randn(8).astype(np.float32) * 0.05
            feats.append(dirs[v // 2] + noise)
            vids.append(v)
    vf, uids = video_level_average(np.stack(feats), np.array(vids), 4)
    classes = np.asarray(uids) // 2
    out = retrieval_stats(vf, uids, jnp.asarray(classes))
    assert float(out["mean_ap"]) > 0.99
    assert float(out["hit_at_1"]) == 1.0


@pytest.mark.parametrize("method", ["sort", "count", "search"])
@pytest.mark.parametrize("exclude", [False, True])
def test_retrieval_stats_chunked_matches_dense(rng, exclude, method):
    """All three chunked engines — the (Q, N) stable-sort path, the
    rank-by-counting path (masked #(key < mine) compare-reductions), and
    the sorted-key binary-search path — must reproduce the dense path
    exactly, incl.
    stable (distance, index) tie-breaking, ragged last chunk, excluded
    (class<0) queries, and duplicate features (distance ties)."""
    from videovector_tpu.metrics.retrieval import (
        retrieval_stats, retrieval_stats_chunked,
    )
    n, d = 531, 24  # not a multiple of the chunk → exercises padding
    feats = rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feats[100] = feats[7]
    feats[101] = feats[7]  # exact duplicates → sort-order ties
    vids = rng.randint(0, 40, size=(n,))
    cls = vids % 7
    cls[::50] = -1  # excluded queries
    dense = retrieval_stats(jnp.asarray(feats), jnp.asarray(vids),
                            jnp.asarray(cls),
                            exclude_same_video_shots=exclude)
    chunked = retrieval_stats_chunked(feats, vids, cls,
                                      exclude_same_video_shots=exclude,
                                      query_chunk=128, method=method)
    for k in ("mean_ap", "hit_at_1", "hit_at_5"):
        np.testing.assert_allclose(float(chunked[k]), float(dense[k]),
                                   rtol=1e-6, atol=1e-7)


def test_retrieval_report_top5_stable_ties(rng, tmp_path):
    """The csv report's device top-5 (lax.top_k on −distance) must
    reproduce the stable ascending (distance, index) order — checked
    against a numpy stable-argsort oracle on data with exact duplicate
    features (distance ties) and same-video exclusions."""
    from videovector_tpu.metrics.retrieval import retrieval_stats_report
    n, d = 37, 8
    feats = rng.randn(n, d).astype(np.float32)
    feats[9] = feats[3]
    feats[21] = feats[3]   # duplicates → top-5 order decided by index
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 6, size=(n,))
    cls = vids % 3
    path = str(tmp_path / "r.csv")
    retrieval_stats_report(feats, vids, cls, path)
    rows = [l.split(",") for l in
            open(path).read().strip().split("\n")[1:]]
    assert len(rows) == n
    for q, row in enumerate(rows):
        dist = (-2.0 * feats @ feats[q]).astype(np.float32)
        dist[vids == vids[q]] = np.inf
        order = np.argsort(dist, kind="stable")[:5]
        expect = [int(i) for i in order if np.isfinite(dist[i])]
        expect += [0] * (5 - len(expect))
        assert [int(x) for x in row[5:10]] == expect, (q, row)


def test_retrieval_stats_report_underfilled_top5_carry(rng, tmp_path):
    """A query with fewer than 5 other-video retrievals: the reference's
    top_5_ids vector lives OUTSIDE the query loop
    (ref:src/caffe/layers/retrieval_stats_layer.cpp:216,310-330), so
    unfilled slots print the PREVIOUS written row's ids (0 before any
    fill) and the class columns print those carried ids' classes —
    checked against a direct simulation of the reference loop."""
    from videovector_tpu.metrics.retrieval import retrieval_stats_report
    n, d = 8, 6
    feats = rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    cls = np.asarray([2, 3, -1, 2, 3, 2, 3, 2])  # one skipped row
    path = str(tmp_path / "r.csv")
    retrieval_stats_report(feats, vids, cls, path)
    rows = [l.split(",") for l in
            open(path).read().strip().split("\n")[1:]]
    assert len(rows) == 7    # the class<0 row is not written
    carry = [0] * 5
    ri = 0
    for q in range(n):
        if cls[q] < 0:
            continue           # skipped rows do NOT advance the carry
        dist = (-2.0 * feats @ feats[q]).astype(np.float32)
        dist[vids == vids[q]] = np.inf
        fills = [int(i) for i in np.argsort(dist, kind="stable")
                 if np.isfinite(dist[i])][:5]
        assert len(fills) == 4  # every row underfills slot 5
        for j, idx in enumerate(fills):
            carry[j] = idx
        assert [int(x) for x in rows[ri][5:10]] == carry, (q, rows[ri])
        assert [int(x) for x in rows[ri][10:15]] == \
            [int(cls[i]) for i in carry], (q, rows[ri])
        ri += 1


def test_retrieval_stats_chunked_gallery_scale(rng):
    """N=20k gallery — the scale the dense path cannot hold (its (N,N)
    f32 distance matrix alone is 1.6 GB). Checks exact hit@1 against a
    numpy per-query oracle on a query subsample."""
    from videovector_tpu.metrics.retrieval import retrieval_stats_chunked
    n, d, n_cls = 20_000, 16, 50
    centers = rng.randn(n_cls, d).astype(np.float32) * 2.0
    cls = rng.randint(0, n_cls, size=(n,))
    feats = centers[cls] + rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 2000, size=(n,))
    out = retrieval_stats_chunked(feats, vids, cls, query_chunk=512)
    # class structure is strong → stats far above the 1/n_cls chance floor
    assert float(out["mean_ap"]) > 0.3
    assert float(out["hit_at_1"]) > 0.5
    # exact-spot-check hit@1 for 50 queries against numpy
    hits = []
    for q in rng.choice(n, size=50, replace=False):
        dist = -2.0 * feats @ feats[q]
        dist[q] = np.inf
        hits.append(float(cls[np.argmin(dist)] == cls[q]))
    # the sampled estimate and the exact mean agree loosely (50 samples)
    assert abs(np.mean(hits) - float(out["hit_at_1"])) < 0.25


def test_rank_stats_identity_mode(rng):
    b, d = 12, 6
    ctx = rng.randn(b, d).astype(np.float32)
    tgt = ctx + 0.01 * rng.randn(b, d).astype(np.float32)
    out = retrieval_rank_stats(jnp.asarray(ctx), jnp.asarray(tgt))
    # oracle
    dist = np.asarray(-2.0 * jnp.dot(jnp.asarray(ctx), jnp.asarray(tgt).T, preferred_element_type=jnp.float32))
    ranks = []
    for i in range(b):
        order = np.argsort(dist[i], kind="stable")
        ranks.append(int(np.where(order == i)[0][0]) + 1)
    ranks = sorted(ranks)
    med = (ranks[b // 2 - 1] + ranks[b // 2]) / 2
    np.testing.assert_allclose(float(out["median_rank"]), med)
    np.testing.assert_allclose(float(out["recall_at_1"]),
                               np.mean([r == 1 for r in ranks]))
    np.testing.assert_allclose(float(out["recall_at_5"]),
                               np.mean([r <= 5 for r in ranks]))


def test_rank_stats_ap_mode_bucket_layout(rng):
    """positive/negative bucket decode (ref GetVideoId:108-129)."""
    num_videos, pos, neg, d = 6, 2, 3, 5
    f = num_videos * (pos + neg)
    ctx = rng.randn(num_videos, d).astype(np.float32)
    tgt = rng.randn(f, d).astype(np.float32)
    out = retrieval_rank_stats(jnp.asarray(ctx), jnp.asarray(tgt),
                               compute_ap=True, positive_size=pos,
                               negative_size=neg)

    def get_video_id(item):
        bucket = item // num_videos
        return (item % num_videos) if bucket < pos else -(item % num_videos)

    dist = np.asarray(-2.0 * jnp.dot(jnp.asarray(ctx), jnp.asarray(tgt).T, preferred_element_type=jnp.float32))
    aps, r1, r5, r10, ranks = [], [], [], [], []
    for i in range(num_videos):
        order = np.argsort(dist[i], kind="stable")
        ap = a1 = a5 = a10 = 0.0
        val = ret = 0.0
        best = 10000
        for j in order:
            val += 1
            if get_video_id(j) == i:
                best = min(best, val)
                if val <= 1:
                    a1 += 1
                if val <= 5:
                    a5 += 1
                if val <= 10:
                    a10 += 1
                ret += 1
                ap += ret / val
        if ret > 0:
            ap /= ret
            a5 /= min(ret, 5)
            a10 /= min(ret, 10)
        aps.append(ap)
        r1.append(a1)
        r5.append(a5)
        r10.append(a10)
        ranks.append(best)
    ranks = sorted(ranks)
    med = (ranks[len(ranks) // 2 - 1] + ranks[len(ranks) // 2]) / 2
    np.testing.assert_allclose(float(out["mean_ap"]), np.mean(aps), rtol=1e-5)
    np.testing.assert_allclose(float(out["recall_at_1"]), np.mean(r1), rtol=1e-5)
    np.testing.assert_allclose(float(out["recall_at_5"]), np.mean(r5), rtol=1e-5)
    np.testing.assert_allclose(float(out["recall_at_10"]), np.mean(r10), rtol=1e-5)
    np.testing.assert_allclose(float(out["median_rank"]), med)


def test_rank_stats_fixed_ref(rng):
    b, f, d = 8, 20, 4
    feats = rng.randn(b, d).astype(np.float32)
    gallery = rng.randn(f, d).astype(np.float32)
    vids = rng.randint(0, 4, size=(b,))
    ref_vids = np.concatenate([rng.randint(0, 4, size=(10,)),
                               -np.ones(10, dtype=int)])
    out = retrieval_rank_stats_fixed_ref(
        jnp.asarray(feats), jnp.asarray(vids),
        jnp.asarray(gallery), jnp.asarray(ref_vids))
    dist = np.asarray(-2.0 * jnp.dot(jnp.asarray(feats), jnp.asarray(gallery).T, preferred_element_type=jnp.float32))
    aps = []
    for i in range(b):
        order = np.argsort(dist[i], kind="stable")
        ap = 0.0
        val = ret = 0.0
        for j in order:
            val += 1
            if ref_vids[j] == vids[i]:
                ret += 1
                ap += ret / val
        aps.append(ap / ret if ret > 0 else 0.0)
    np.testing.assert_allclose(float(out["mean_ap"]), np.mean(aps), rtol=1e-5)


def test_classification_stats(rng):
    n, c = 30, 5
    scores = rng.rand(n, c).astype(np.float32) + 0.01  # all positive scores
    labels = rng.randint(0, c, size=(n,))
    out = classification_stats(jnp.asarray(scores), jnp.asarray(labels),
                               num_classes=c)
    pred = scores.argmax(1)
    np.testing.assert_allclose(float(out["accuracy"]), (pred == labels).mean())
    for k in range(c):
        cnt = (labels == k).sum()
        if cnt == 0:
            assert float(out["per_class_accuracy"][k]) == 0.0
            continue
        acc = ((pred == k) & (labels == k)).sum() / cnt
        np.testing.assert_allclose(float(out["per_class_accuracy"][k]), acc,
                                   rtol=1e-6)
        order = np.argsort(-scores[:, k], kind="stable")
        ret = 0.0
        ap = 0.0
        for rank, j in enumerate(order, 1):
            if labels[j] == k:
                ret += 1
                ap += ret / rank
        np.testing.assert_allclose(float(out["per_class_ap"][k]), ap / cnt,
                                   rtol=1e-5)
