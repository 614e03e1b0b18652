"""Compact (bf16) gallery keys for beyond-HBM retrieval eval
(VERDICT r4 item 5).

Exactness semantics under test: features quantize to bf16 ONCE;
distances are bf16 x bf16 with f32 accumulation; the rank engines are
EXACT w.r.t. those distances — count == sort bit-for-bit at bf16, the
same property the f32 engines certify. The only deviation from f32 is
input rounding, bounded here on normalized features.
"""

import numpy as np
import pytest

from videovector_tpu.metrics.retrieval import (
    retrieval_stats, retrieval_stats_chunked, retrieval_stats_report,
)


def _gallery(n=600, d=32, classes=12, seed=0):
    rng = np.random.RandomState(seed)
    cls = rng.randint(0, classes, size=n)
    centers = rng.randn(classes, d).astype(np.float32)
    feats = centers[cls] + 0.6 * rng.randn(n, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    vids = rng.randint(0, 80, size=n)
    return feats, vids, cls


def test_count_equals_sort_at_bf16():
    """Rank-by-counting is exact over the QUANTIZED distances: the count
    and sort engines agree bit-for-bit on bf16 galleries, just as they
    do at f32 — the engine itself introduces no approximation."""
    feats, vids, cls = _gallery()
    a = retrieval_stats_chunked(feats, vids, cls, query_chunk=128,
                                method="count", gallery_dtype="bfloat16")
    b = retrieval_stats_chunked(feats, vids, cls, query_chunk=128,
                                method="sort", gallery_dtype="bfloat16")
    for k in a:
        assert float(a[k]) == float(b[k]), k


def test_bf16_close_to_f32_on_normalized_features():
    feats, vids, cls = _gallery()
    f32 = retrieval_stats_chunked(feats, vids, cls, query_chunk=128)
    bf16 = retrieval_stats_chunked(feats, vids, cls, query_chunk=128,
                                   gallery_dtype="bfloat16")
    for k in f32:
        assert abs(float(f32[k]) - float(bf16[k])) < 0.01, (
            k, float(f32[k]), float(bf16[k]))
    # and f32 chunked equals the dense reference engine exactly
    dense = retrieval_stats(feats, vids, cls)
    for k in f32:
        assert float(f32[k]) == pytest.approx(float(dense[k]), abs=1e-6)


def test_bf16_gallery_is_stored_compact():
    """The device gallery really is bf16 — the memory claim, not just
    the math. (Host cast via ml_dtypes; no f32 copy lands on device.)"""
    import jax.numpy as jnp
    from videovector_tpu.metrics.retrieval import _cast_gallery_host
    feats = np.random.RandomState(0).randn(64, 16).astype(np.float32)
    cast = _cast_gallery_host(feats, "bfloat16")
    assert cast.dtype.name == "bfloat16"
    assert cast.nbytes == feats.nbytes // 2
    j = jnp.asarray(cast)
    assert j.dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="gallery_dtype"):
        _cast_gallery_host(feats, "int4")


def test_host_driver_equals_scan_driver():
    """chunk_driver='host' (per-chunk dispatch — the big-gallery escape
    hatch for monolithic-scan runtime faults) is bit-equal to the scan
    driver, every engine, both dtypes."""
    feats, vids, cls = _gallery(n=300)
    for dt in ("float32", "bfloat16"):
        for method in ("count", "sort"):
            a = retrieval_stats_chunked(feats, vids, cls, query_chunk=64,
                                        method=method, gallery_dtype=dt)
            b = retrieval_stats_chunked(feats, vids, cls, query_chunk=64,
                                        method=method, gallery_dtype=dt,
                                        chunk_driver="host")
            for k in a:
                assert float(a[k]) == float(b[k]), (dt, method, k)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="chunk_driver"):
        retrieval_stats_chunked(feats, vids, cls, chunk_driver="turbo")
    # host + mesh must refuse loudly, not silently run the mesh scan
    # (the exact program the escape hatch exists to avoid)
    import jax
    from videovector_tpu.parallel import make_mesh
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with _pytest.raises(ValueError, match="mesh"):
        retrieval_stats_chunked(feats, vids, cls, mesh=mesh,
                                chunk_driver="host")
    # the shard_gallery branch must validate drivers too (it used to
    # return before resolution ran — round-5 review finding)
    with _pytest.raises(ValueError, match="chunk_driver"):
        retrieval_stats_chunked(feats, vids, cls, mesh=mesh,
                                shard_gallery=True, chunk_driver="turbo")
    with _pytest.raises(ValueError, match="mesh"):
        retrieval_stats_chunked(feats, vids, cls, mesh=mesh,
                                shard_gallery=True, chunk_driver="host")


def test_report_host_driver_equals_scan(tmp_path):
    """retrieval_stats_report's host-loop driver (the same big-gallery
    escape hatch as the aggregate path — the chunk body is shared
    verbatim) must produce identical csv BYTES and aggregates."""
    from videovector_tpu.metrics.retrieval import retrieval_stats_report
    feats, vids, cls = _gallery(n=300)
    for dt in ("float32", "bfloat16"):
        a = retrieval_stats_report(feats, vids, cls,
                                   str(tmp_path / "scan.csv"),
                                   gallery_dtype=dt, chunk_driver="scan")
        b = retrieval_stats_report(feats, vids, cls,
                                   str(tmp_path / "host.csv"),
                                   gallery_dtype=dt, chunk_driver="host")
        assert (tmp_path / "scan.csv").read_bytes() == \
               (tmp_path / "host.csv").read_bytes(), dt
        for k in a:
            assert float(a[k]) == float(b[k]), (dt, k)
    import jax
    from videovector_tpu.parallel import make_mesh
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="mesh"):
        retrieval_stats_report(feats, vids, cls,
                               str(tmp_path / "x.csv"),
                               mesh=mesh, chunk_driver="host")


def test_auto_driver_resolution():
    """'auto' (the default) must route big single-device TPU galleries
    to the host driver — the monolithic scan crashed the v5e worker at
    250k+ rows (round 5) — and leave everything else on scan. Backend
    here is CPU, so resolution is unit-tested via monkeypatched
    backend; the end-to-end default path is covered by every other
    test in this file (auto → scan at small n)."""
    from unittest import mock
    from videovector_tpu.metrics import retrieval as R
    big = R._SCAN_DRIVER_MAX_ROWS + 1
    with mock.patch.object(R.jax, "default_backend", return_value="tpu"):
        assert R._resolve_chunk_driver("auto", big, None) == "host"
        assert R._resolve_chunk_driver("auto", 20_000, None) == "scan"
        # mesh engines are scan-only — sharding bounds per-device work
        assert R._resolve_chunk_driver("auto", big, object()) == "scan"
    assert R._resolve_chunk_driver("auto", big, None) == "scan"  # cpu
    # explicit choices pass through untouched at any size/backend
    assert R._resolve_chunk_driver("scan", big, None) == "scan"
    assert R._resolve_chunk_driver("host", 10, None) == "host"
    with pytest.raises(ValueError, match="chunk_driver"):
        R._resolve_chunk_driver("turbo", 10, None)
    with pytest.raises(ValueError, match="mesh"):
        R._resolve_chunk_driver("host", 10, object())


def test_bf16_composes_with_gallery_sharding():
    import jax
    from videovector_tpu.parallel import make_mesh
    feats, vids, cls = _gallery(n=320)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    single = retrieval_stats_chunked(feats, vids, cls, query_chunk=64,
                                     method="count",
                                     gallery_dtype="bfloat16")
    sharded = retrieval_stats_chunked(feats, vids, cls, query_chunk=64,
                                      mesh=mesh, shard_gallery=True,
                                      gallery_dtype="bfloat16")
    for k in single:
        assert float(single[k]) == float(sharded[k]), k


def test_report_csv_bf16(tmp_path):
    feats, vids, cls = _gallery(n=120)
    out32 = tmp_path / "r32.csv"
    out16 = tmp_path / "r16.csv"
    a = retrieval_stats_report(feats, vids, cls, str(out32))
    b = retrieval_stats_report(feats, vids, cls, str(out16),
                               gallery_dtype="bfloat16")
    assert out16.exists()
    assert abs(float(a["mean_ap"]) - float(b["mean_ap"])) < 0.02
    # same row count / header shape
    assert len(out16.read_text().splitlines()) == \
        len(out32.read_text().splitlines())


def test_sink_layer_extension(tmp_path):
    """`gallery_dtype: "bfloat16"` inside retrieval_stats_param reaches
    the report through Net.process_host_sinks."""
    from videovector_tpu.config.textformat import parse
    from videovector_tpu.graph.net import Net
    import jax
    import jax.numpy as jnp
    out = tmp_path / "stats.csv"
    net = Net(parse(f"""
name: "eval"
input: "feats" input_dim: 40 input_dim: 8 input_dim: 1 input_dim: 1
input: "vids" input_dim: 40 input_dim: 1 input_dim: 1 input_dim: 1
layers {{ name: "stats" type: RETRIEVAL_STATS
  bottom: "feats" bottom: "vids"
  retrieval_stats_param {{ stats_output_file: "{out}"
    exclude_same_video_shots: false gallery_dtype: "bfloat16" }} }}
"""), phase="TEST")
    rng = np.random.RandomState(0)
    feats = rng.randn(40, 8, 1, 1).astype(np.float32)
    vids = (np.arange(40) % 5).astype(np.float32).reshape(40, 1, 1, 1)
    params, _ = net.init(jax.random.PRNGKey(0), {
        "feats": jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        "vids": jax.ShapeDtypeStruct(vids.shape, jnp.float32)})
    _, outputs, sinks = net.apply(params, {"feats": feats, "vids": vids},
                                  return_sink_blobs=True)
    net.process_host_sinks(sinks)
    assert out.exists() and out.read_text().startswith("#")
