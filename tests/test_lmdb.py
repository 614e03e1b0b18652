"""LMDB interop: the pure-Python reader/writer (data/lmdbio.py) against the
liblmdb 0.9 on-disk format, plus end-to-end ingestion of LMDB datasets by the
reference-facing data sources — the reference stores everything in LMDB
(ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:122-135) and its
prototxts point `source:` at LMDB directories."""

import os
import random
import struct

import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.lmdbio import (
    DEFAULT_PSIZE, MDB_MAGIC, LmdbReader, LmdbWriter, resolve_lmdb_path,
)
from videovector_tpu.data.records import RecordWriter, open_store
from videovector_tpu.data.wire import Datum, VideoShots
from videovector_tpu.graph.data_factory import make_data_source


def _layer(text):
    return parse(text).get_list("layers")[0]


# ---------------------------------------------------------------- format
def test_small_roundtrip(tmp_path):
    env = str(tmp_path / "db")
    with LmdbWriter(env) as w:
        for i in [3, 1, 2]:  # out of order: writer must sort (memcmp order)
            w.put(f"k{i}", f"value-{i}".encode())
    r = LmdbReader(env)
    assert len(r) == 3
    assert [r.key(i) for i in range(3)] == [b"k1", b"k2", b"k3"]
    assert r.get("k2") == b"value-2"
    assert r.index_of(b"k3") == 2
    with pytest.raises(KeyError):
        r.index_of(b"missing")


def test_branch_tree_key_order(tmp_path):
    """10k entries force multiple leaf pages and ≥1 branch level; iteration
    must follow global key order (the reference's MDB_NEXT cursor)."""
    env = str(tmp_path / "db")
    with LmdbWriter(env) as w:
        for i in range(10000):
            w.put(f"{i:08d}", (f"payload-{i}-" * 5).encode())
    r = LmdbReader(env)
    assert len(r) == 10000
    keys = [r.key(i) for i in range(len(r))]
    assert keys == sorted(keys)
    assert r.get("00004567") == ("payload-4567-" * 5).encode()
    assert r.index_of("00000000") == 0
    assert r.index_of("00009999") == 9999


def test_overflow_values(tmp_path):
    """Values past the node max land on F_BIGDATA overflow chains."""
    env = str(tmp_path / "db")
    vals = {f"ov{i}": bytes([i]) * (100_000 + i) for i in range(5)}
    vals["tiny"] = b"x"
    with LmdbWriter(env) as w:
        for k, v in vals.items():
            w.put(k, v)
    r = LmdbReader(env)
    for k, v in vals.items():
        assert r.get(k) == v


def test_mixed_fuzz(tmp_path):
    rng = random.Random(7)
    items = {}
    for _ in range(1500):
        key = bytes(rng.randrange(33, 127) for _ in range(rng.randint(1, 60)))
        vlen = rng.choice([0, 5, 100, 1990, 2100, 5000])
        items[key] = bytes(rng.randrange(256) for _ in range(vlen))
    env = str(tmp_path / "db")
    with LmdbWriter(env) as w:
        for k, v in items.items():
            w.put(k, v)
    r = LmdbReader(env)
    assert len(r) == len(items)
    assert [r.key(i) for i in range(len(r))] == sorted(items)
    for k, v in items.items():
        assert r.get(k) == v


def test_empty_db(tmp_path):
    env = str(tmp_path / "db")
    LmdbWriter(env).close()
    assert len(LmdbReader(env)) == 0


def test_meta_layout_constants(tmp_path):
    """Pin the wire layout facts a real liblmdb depends on: magic at page
    offset 16, psize in dbs[0].md_pad, live meta = larger txnid on page 1."""
    env = str(tmp_path / "db")
    with LmdbWriter(env) as w:
        w.put("a", b"1")
    raw = open(os.path.join(env, "data.mdb"), "rb").read()
    assert struct.unpack_from("<I", raw, 16)[0] == MDB_MAGIC
    assert struct.unpack_from("<I", raw, DEFAULT_PSIZE + 16)[0] == MDB_MAGIC
    assert struct.unpack_from("<I", raw, 16 + 24)[0] == DEFAULT_PSIZE
    txn0 = struct.unpack_from("<Q", raw, 16 + 24 + 96 + 8)[0]
    txn1 = struct.unpack_from("<Q", raw, DEFAULT_PSIZE + 16 + 24 + 96 + 8)[0]
    assert txn1 > txn0
    # version 1 == liblmdb MDB_DATA_VERSION
    assert struct.unpack_from("<I", raw, 20)[0] == 1


def test_resolve_and_sniff(tmp_path):
    env = str(tmp_path / "db")
    with LmdbWriter(env) as w:
        w.put("k", b"v")
    assert resolve_lmdb_path(env) == os.path.join(env, "data.mdb")
    assert resolve_lmdb_path(os.path.join(env, "data.mdb"))
    assert resolve_lmdb_path(str(tmp_path)) is None

    vvr = str(tmp_path / "x.vvr")
    with RecordWriter(vvr) as w:
        w.append("k", b"v")
    assert type(open_store(vvr)).__name__ == "RecordReader"
    assert type(open_store(env)).__name__ == "LmdbReader"
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="neither"):
        open_store(str(junk))


def test_corrupt_rejected(tmp_path):
    bad = tmp_path / "db"
    bad.mkdir()
    (bad / "data.mdb").write_bytes(b"\x00" * 8192)
    with pytest.raises(ValueError, match="magic"):
        LmdbReader(str(bad))


# ------------------------------------------------------- source ingestion
def _write_shots_lmdb(env, rng, num_videos=6, shots=8, feat=16):
    with LmdbWriter(env) as w:
        for v in range(num_videos):
            center = rng.randn(feat).astype(np.float32)
            words = [Datum(channels=1, height=feat, width=1,
                           float_data=(center + 0.1 * rng.randn(feat))
                           .astype(np.float32)) for _ in range(shots)]
            msg = VideoShots(video_id=v + 1,
                             shot_ids=list(range(shots)),
                             shot_words=words, video_name=f"v{v}.mp4")
            w.put(f"{v:08d}", msg.encode())


def test_sampled_shots_layer_reads_lmdb(tmp_path, rng):
    """A reference prototxt whose source: points at an LMDB directory feeds
    the sampled-shots layer with zero config changes."""
    env = str(tmp_path / "shots_lmdb")
    _write_shots_lmdb(env, rng)
    layer = _layer(f"""
    layers {{ name: "d" type: VIDEO_SAMPLED_SHOTS_DATA top: "data" top: "vid"
      video_sampled_shots_data_param {{
        source: "{env}" batch_size: 4 num_negative_samples: 3
        max_buffer_size: 20 negative_swap_percentage: 50
        max_same_video_negs: 1 context_type: WINDOW context_size: 5 }} }}
    """)
    src = make_data_source(layer, phase="TRAIN")
    b = src.next_batch()
    # roles = 1 target + 4 context + 3 negatives
    assert b["data"].shape == (4, 8, 16)
    assert b["vid"].shape[0] == 4


def test_datum_layer_reads_lmdb_identically(tmp_path, rng):
    """DATA layer over LMDB == DATA layer over VVR of the same records
    (same key order, same batches)."""
    items = []
    for i in range(6):
        pix = rng.randint(0, 256, (1, 6, 6)).astype(np.uint8)
        items.append((f"{i:08d}", Datum(channels=1, height=6, width=6,
                                        data=pix.tobytes(), label=i).encode()))
    env = str(tmp_path / "lmdb")
    with LmdbWriter(env) as w:
        for k, v in items:
            w.put(k, v)
    vvr = str(tmp_path / "d.vvr")
    with RecordWriter(vvr) as w:
        for k, v in items:
            w.append(k, v)

    def batches(source_path):
        layer = _layer(f"""
        layers {{ name: "d" type: DATA top: "imgs" top: "lbls"
          data_param {{ source: "{source_path}" batch_size: 3 }} }}
        """)
        src = make_data_source(layer, phase="TEST")
        return [src.next_batch() for _ in range(2)]

    for a, b in zip(batches(env), batches(vvr)):
        np.testing.assert_array_equal(a["imgs"], b["imgs"])
        np.testing.assert_array_equal(a["lbls"], b["lbls"])


def test_flexible_data_seek_over_lmdb(tmp_path):
    """FlexibleDataLayer's MDB_SET + neighbor-walk cursor semantics
    (ref:src/caffe/layers/flexible_data_layer.cpp:230-329) over real LMDB
    stores for both the index and the frame db."""
    from videovector_tpu.data.generic import (
        FlexibleDataConfig, FlexibleDataSource,
    )
    from videovector_tpu.data.transformer import TransformConfig
    h = w = 6
    frames_env = str(tmp_path / "frames_lmdb")
    with LmdbWriter(frames_env) as wtr:
        for i in range(9):
            pix = np.full((1, h, w), i * 10, np.uint8)
            wtr.put(f"frame{i:04d}.png", Datum(
                channels=1, height=h, width=w, data=pix.tobytes()).encode())
    index_env = str(tmp_path / "index_lmdb")
    with LmdbWriter(index_env) as wtr:
        wtr.put("123456789frame0004", b"0007rest")
    cfg = FlexibleDataConfig(source=index_env, flexible_source=frames_env,
                             flexible_key_suffix=".png", forward_len=1,
                             backward_len=2, use_center_datum=True,
                             batch_size=1)
    src = FlexibleDataSource(cfg, transform=TransformConfig(crop_size=4))
    b = src.next_batch()
    assert b["data"].shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(b["label"], [7])
    np.testing.assert_allclose(b["data"][0, 0], 20.0)
    np.testing.assert_allclose(b["data"][0, 3], 50.0)


# ------------------------------------------------------------- converters
def test_import_export_cli(tmp_path, rng, capsys):
    from videovector_tpu.tools.converters import main
    env = str(tmp_path / "src_lmdb")
    _write_shots_lmdb(env, rng, num_videos=4)

    out_vvr = str(tmp_path / "out.vvr")
    assert main(["import_lmdb", env, out_vvr]) == 0
    assert "imported 4 entries" in capsys.readouterr().out
    a, b = open_store(env), open_store(out_vvr)
    assert len(a) == len(b)
    for (ka, va), (kb, vb) in zip(a, b):
        assert ka == kb and bytes(va) == bytes(vb)

    back_env = str(tmp_path / "back_lmdb")
    assert main(["export_lmdb", out_vvr, back_env]) == 0
    c = open_store(back_env)
    assert [k for k, _ in c] == [k for k, _ in a]
    for (ka, va), (kc, vc) in zip(a, c):
        assert bytes(va) == bytes(vc)
