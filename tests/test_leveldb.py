"""LevelDB interop: the pure-Python reader/writer (data/leveldbio.py)
against the LevelDB 1.x on-disk format (log files, SSTables, MANIFEST,
snappy, CRC32C), plus end-to-end ingestion by the reference-facing data
sources — the reference reads either LMDB or LevelDB
(ref:src/caffe/layers/data_layer.cpp:35-75) and `extract_features` writes
LevelDB (ref:tools/extract_features.cpp:127-146)."""

import io
import os
import random
import struct

import numpy as np
import pytest

from videovector_tpu.config.textformat import parse
from videovector_tpu.data.leveldbio import (
    LevelDbReader, LevelDbWriter, LogWriter, TableFile, VersionEdit,
    crc32c, crc32c_mask, crc32c_unmask, decode_write_batch,
    encode_write_batch, read_log_records, resolve_leveldb_path,
    snappy_compress, snappy_decompress,
)
from videovector_tpu.data.records import RecordWriter, open_store
from videovector_tpu.data.wire import Datum, VideoShots
from videovector_tpu.graph.data_factory import make_data_source


def _layer(text):
    return parse(text).get_list("layers")[0]


# ---------------------------------------------------------------- crc32c
def test_crc32c_standard_vectors():
    # iSCSI CRC check value + leveldb's own util/crc32c_test.cc vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(range(31, -1, -1))) == 0x113FDB5C


def test_crc32c_extend_and_mask():
    data = b"hello world" * 7
    for split in (0, 1, 5, 11, len(data)):
        assert crc32c(data[split:], crc32c(data[:split])) == crc32c(data)
    crc = crc32c(b"foo")
    assert crc32c_mask(crc) != crc
    assert crc32c_unmask(crc32c_mask(crc)) == crc


# ---------------------------------------------------------------- snappy
def test_snappy_handcrafted_streams():
    def enc(ulen, body):
        out = bytearray()
        v = ulen
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out) + body

    # literal only: tag (len-1)<<2, kind 0
    assert snappy_decompress(enc(3, bytes([2 << 2]) + b"abc")) == b"abc"
    # literal "abcd" + copy1 (offset 4, len 8): overlapping run extension
    # (copy1 lengths span 4..11: 3 bits + 4)
    body = bytes([3 << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    assert snappy_decompress(enc(12, body)) == b"abcd" * 3
    # copy2: literal "xy" + copy(offset 2, len 6)
    body = bytes([1 << 2]) + b"xy" + bytes([(5 << 2) | 2]) + (2).to_bytes(2, "little")
    assert snappy_decompress(enc(8, body)) == b"xyxyxyxy"
    # copy4 form of the same copy
    body = bytes([1 << 2]) + b"xy" + bytes([(5 << 2) | 3]) + (2).to_bytes(4, "little")
    assert snappy_decompress(enc(8, body)) == b"xyxyxyxy"
    # 61-byte literal needs the 1-byte extended length form
    lit = bytes(range(61))
    body = bytes([60 << 2, 60]) + lit
    assert snappy_decompress(enc(61, body)) == lit


def test_snappy_roundtrip():
    rng = random.Random(3)
    cases = [
        b"",
        b"a",
        b"abcabcabcabcabcabcabc" * 100,
        bytes(rng.randrange(256) for _ in range(10000)),
        (b"\x00" * 5000) + bytes(rng.randrange(256) for _ in range(100)),
        b"the quick brown fox jumps over the lazy dog " * 64,
    ]
    for data in cases:
        assert snappy_decompress(snappy_compress(data)) == data
    repetitive = b"0123456789abcdef" * 4096
    comp = snappy_compress(repetitive)
    assert len(comp) < len(repetitive) // 4  # actually compresses


def test_snappy_rejects_corrupt():
    with pytest.raises(ValueError):
        # declared length 4 but copy offset points before start
        snappy_decompress(bytes([4, (3 << 2) | 1, 9]))


def test_native_twins_match_python():
    """libvvdata's C crc32c / snappy decoder must agree byte-for-byte with
    the pure-Python implementations (which own the correctness vectors)."""
    from videovector_tpu.data import leveldbio as L
    lib = L._native_lib()
    if lib is False:
        pytest.skip("libvvdata not built")
    rng = random.Random(11)
    for size in (256, 4096, 70000):
        data = bytes(rng.randrange(256) for _ in range(size))
        assert lib.vv_crc32c(data, len(data), 0) == L._crc32c_py(data)
        assert lib.vv_crc32c(data, len(data), 12345) == \
            L._crc32c_py(data, 12345)
        comp = snappy_compress(data + data[: size // 2])  # has matches
        assert L._snappy_decompress_py(comp) == data + data[: size // 2]
        assert snappy_decompress(comp) == data + data[: size // 2]
    # corrupt input must fail loudly through the native path too
    big = snappy_compress(b"x" * 1000)
    with pytest.raises(ValueError):
        snappy_decompress(big[:-3] + b"\xff\xff\xff")


# ---------------------------------------------------------------- log format
def test_log_roundtrip_with_fragmentation():
    records = [b"", b"short", b"x" * 30000, b"y" * 100000, b"tail"]
    f = io.BytesIO()
    w = LogWriter(f)
    for r in records:
        w.add_record(r)
    got = list(read_log_records(f.getvalue(), verify_checksums=True))
    assert got == records


def test_write_batch_roundtrip():
    ops = [(b"k1", b"v1"), (b"k2", None), (b"k3", b"" )]
    rec = encode_write_batch(100, ops)
    got = list(decode_write_batch(rec))
    assert got == [(b"k1", 100, 1, b"v1"), (b"k2", 101, 0, b""),
                   (b"k3", 102, 1, b"")]


def test_version_edit_roundtrip():
    e = VersionEdit()
    e.comparator = "leveldb.BytewiseComparator"
    e.log_number = 7
    e.prev_log_number = 0
    e.next_file_number = 12
    e.last_sequence = 999
    e.new_files = [(0, 5, 4096, b"aaa\x01\x00\x00\x00\x00\x00\x00\x00",
                    b"zzz\x01\x00\x00\x00\x00\x00\x00\x00")]
    e.deleted_files = [(1, 3)]
    d = VersionEdit.decode(e.encode())
    assert d.comparator == e.comparator
    assert d.log_number == 7 and d.prev_log_number == 0
    assert d.next_file_number == 12 and d.last_sequence == 999
    assert d.new_files == e.new_files
    assert d.deleted_files == e.deleted_files


# ---------------------------------------------------------------- full DB
@pytest.mark.parametrize("compression", ["none", "snappy"])
def test_db_roundtrip(tmp_path, compression):
    db = str(tmp_path / "db")
    items = {f"{i:08d}".encode(): (f"payload-{i}-" * 11).encode()
             for i in range(5000)}
    with LevelDbWriter(db, compression=compression) as w:
        for k in sorted(items, reverse=True):  # out of order: writer sorts
            w.put(k, items[k])
    # verify_checksums=True cross-checks every block CRC we wrote
    r = LevelDbReader(db, verify_checksums=True)
    assert len(r) == len(items)
    keys = [r.key(i) for i in range(len(r))]
    assert keys == sorted(items)
    assert r.get("00004567") == items[b"00004567"]
    assert r.index_of("00000000") == 0
    assert r.index_of("00004999") == 4999
    with pytest.raises(KeyError):
        r.index_of(b"missing")
    for i in (0, 1, 2499, 4998, 4999):
        k, v = r[i]
        assert v == items[k]


def test_db_multiple_tables(tmp_path):
    """Small max_table_bytes forces several level-0 tables; the merged view
    must still be one sorted sequence."""
    db = str(tmp_path / "db")
    items = {f"k{i:05d}".encode(): bytes([i % 256]) * 50 for i in range(2000)}
    with LevelDbWriter(db, max_table_bytes=16 << 10) as w:
        for k, v in items.items():
            w.put(k, v)
    ldb_files = [f for f in os.listdir(db) if f.endswith(".ldb")]
    assert len(ldb_files) > 1
    r = LevelDbReader(db)
    assert len(r) == 2000
    assert [r.key(i) for i in range(len(r))] == sorted(items)
    assert r.get("k01234") == items[b"k01234"]


def test_empty_db(tmp_path):
    db = str(tmp_path / "db")
    LevelDbWriter(db).close()
    assert len(LevelDbReader(db)) == 0


def test_writer_streams_sorted_input(tmp_path):
    """Ascending puts stream straight to table files (O(1) writer memory):
    with a small table cap, files appear on disk before close()."""
    db = str(tmp_path / "db")
    w = LevelDbWriter(db, max_table_bytes=4 << 10)
    for i in range(1000):
        w.put(f"{i:06d}", b"v" * 40)
    assert len(w._stray) == 0  # nothing buffered
    n_before_close = len([f for f in os.listdir(db) if f.endswith(".ldb")])
    assert n_before_close > 1  # streamed out during put()
    w.close()
    r = LevelDbReader(db, verify_checksums=True)
    assert len(r) == 1000
    assert r.get("000777") == b"v" * 40


def test_writer_overwrite_semantics_across_tables(tmp_path):
    """Duplicates and out-of-order keys land in an overlapping level-0
    table; sequence numbers (assigned at put time) keep last-put-wins."""
    db = str(tmp_path / "db")
    with LevelDbWriter(db) as w:
        w.put("a", b"a1")
        w.put("m", b"m1")
        w.put("z", b"z1")
        w.put("m", b"m2-late")   # duplicate after stream moved past "m"
        w.put("b", b"b-late")    # out-of-order insert
        w.put("m", b"m3-final")  # twice-strayed: latest wins
    r = LevelDbReader(db, verify_checksums=True)
    assert [(k, v) for k, v in r] == [
        (b"a", b"a1"), (b"b", b"b-late"), (b"m", b"m3-final"),
        (b"z", b"z1")]


def test_unflushed_log_shadows_tables(tmp_path):
    """A .log written after the tables (higher sequences) must win: newest
    value visible, deletions hide table entries — leveldb recovery
    semantics for a DB that crashed before compaction."""
    db = str(tmp_path / "db")
    with LevelDbWriter(db) as w:
        for i in range(10):
            w.put(f"key{i}", f"old{i}".encode())
    # manifest written by LevelDbWriter has log_number=0 → every log replays
    with open(os.path.join(db, "000099.log"), "wb") as f:
        lw = LogWriter(f)
        lw.add_record(encode_write_batch(1000, [(b"key3", b"NEW")]))
        lw.add_record(encode_write_batch(1001, [(b"key7", None)]))  # delete
        lw.add_record(encode_write_batch(1002, [(b"zz-extra", b"appended")]))
    r = LevelDbReader(db, verify_checksums=True)
    assert r.get("key3") == b"NEW"
    assert r.get("key2") == b"old2"
    assert r.get("zz-extra") == b"appended"
    with pytest.raises(KeyError):
        r.get("key7")
    assert len(r) == 10  # 10 - 1 deleted + 1 appended
    keys = [r.key(i) for i in range(len(r))]
    assert keys == sorted(keys)


def test_log_only_db(tmp_path):
    """A DB whose data lives entirely in the write-ahead log (no tables) —
    what a fresh leveldb looks like before the first compaction."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    e = VersionEdit()
    e.comparator = "leveldb.BytewiseComparator"
    e.log_number = 3
    e.next_file_number = 4
    e.last_sequence = 0
    with open(os.path.join(db, "MANIFEST-000001"), "wb") as f:
        LogWriter(f).add_record(e.encode())
    with open(os.path.join(db, "CURRENT"), "wb") as f:
        f.write(b"MANIFEST-000001\n")
    with open(os.path.join(db, "000003.log"), "wb") as f:
        lw = LogWriter(f)
        lw.add_record(encode_write_batch(
            1, [(b"b", b"2"), (b"a", b"1"), (b"c", b"3")]))
        lw.add_record(encode_write_batch(4, [(b"b", b"2-new")]))
    r = LevelDbReader(db, verify_checksums=True)
    assert [(k, v) for k, v in r] == [(b"a", b"1"), (b"b", b"2-new"),
                                      (b"c", b"3")]


def test_table_file_layout_constants(tmp_path):
    """Pin wire facts C++ leveldb depends on: footer magic at EOF-8,
    48-byte footer, block trailer = type byte + masked crc32c(data+type)."""
    db = str(tmp_path / "db")
    with LevelDbWriter(db) as w:
        w.put("a", b"1")
    raw = open(os.path.join(db, "000002.ldb"), "rb").read()
    assert struct.unpack_from("<Q", raw, len(raw) - 8)[0] == 0xDB4775248B80FB57
    t = TableFile(os.path.join(db, "000002.ldb"), verify_checksums=True)
    entries = t.block(0)
    assert len(entries) == 1
    ikey, value = entries[0]
    assert ikey[:-8] == b"a" and value == b"1"
    packed = struct.unpack("<Q", ikey[-8:])[0]
    assert packed & 0xFF == 1  # kTypeValue
    # CURRENT names the manifest; manifest log records carry valid CRCs
    cur = open(os.path.join(db, "CURRENT"), "rb").read()
    assert cur == b"MANIFEST-000001\n"
    man = open(os.path.join(db, "MANIFEST-000001"), "rb").read()
    recs = list(read_log_records(man, verify_checksums=True))
    assert len(recs) == 1
    edit = VersionEdit.decode(recs[0])
    assert edit.comparator == "leveldb.BytewiseComparator"
    assert edit.new_files[0][0] == 0  # level 0


def test_resolve_and_open_store(tmp_path):
    db = str(tmp_path / "db")
    with LevelDbWriter(db) as w:
        w.put("k", b"v")
    assert resolve_leveldb_path(db) == db
    assert resolve_leveldb_path(str(tmp_path)) is None
    store = open_store(db)
    assert type(store).__name__ == "LevelDbReader"
    assert store.get("k") == b"v"
    empty = tmp_path / "not_a_db"
    empty.mkdir()
    with pytest.raises(ValueError, match="not a LevelDB"):
        open_store(str(empty))


# ------------------------------------------------------- source ingestion
def test_sampled_shots_layer_reads_leveldb(tmp_path, rng):
    """A reference prototxt whose source: points at a LevelDB directory
    feeds the sampled-shots layer with zero config changes."""
    db = str(tmp_path / "shots_leveldb")
    with LevelDbWriter(db) as w:
        for v in range(6):
            center = rng.randn(16).astype(np.float32)
            words = [Datum(channels=1, height=16, width=1,
                           float_data=(center + 0.1 * rng.randn(16))
                           .astype(np.float32)) for _ in range(8)]
            msg = VideoShots(video_id=v + 1, shot_ids=list(range(8)),
                             shot_words=words, video_name=f"v{v}.mp4")
            w.put(f"{v:08d}", msg.encode())
    layer = _layer(f"""
    layers {{ name: "d" type: VIDEO_SAMPLED_SHOTS_DATA top: "data" top: "vid"
      video_sampled_shots_data_param {{
        source: "{db}" batch_size: 4 num_negative_samples: 3
        max_buffer_size: 20 negative_swap_percentage: 50
        max_same_video_negs: 1 context_type: WINDOW context_size: 5 }} }}
    """)
    src = make_data_source(layer, phase="TRAIN")
    b = src.next_batch()
    assert b["data"].shape == (4, 8, 16)
    assert b["vid"].shape[0] == 4


def test_datum_layer_leveldb_matches_vvr(tmp_path, rng):
    """DATA layer over LevelDB == DATA layer over VVR of the same records."""
    items = []
    for i in range(6):
        pix = rng.randint(0, 256, (1, 6, 6)).astype(np.uint8)
        items.append((f"{i:08d}", Datum(channels=1, height=6, width=6,
                                        data=pix.tobytes(), label=i).encode()))
    db = str(tmp_path / "leveldb")
    with LevelDbWriter(db) as w:
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

    for a, b in zip(batches(db), batches(vvr)):
        np.testing.assert_array_equal(a["imgs"], b["imgs"])
        np.testing.assert_array_equal(a["lbls"], b["lbls"])


def test_converters_leveldb(tmp_path):
    from videovector_tpu.tools.converters import export_leveldb, import_leveldb
    vvr = str(tmp_path / "src.vvr")
    with RecordWriter(vvr) as w:
        for i in range(50):
            w.append(f"{i:04d}", f"value-{i}".encode())
    db = str(tmp_path / "out_db")
    assert export_leveldb(vvr, db) == 50
    back = str(tmp_path / "back.vvr")
    assert import_leveldb(db, back) == 50
    a, b = open_store(vvr), open_store(back)
    assert [(k, bytes(v)) for k, v in a] == [(k, bytes(v)) for k, v in b]


def test_reader_follows_compaction_history(tmp_path):
    """Real DBs carry a MANIFEST with many VersionEdits: files added at
    several levels, files deleted by compactions, compact pointers. The
    reader must apply the full edit sequence, not just the first record."""
    import struct as _struct
    from videovector_tpu.data.leveldbio import (
        TableWriter, _internal_key,
    )
    db = tmp_path / "db"
    db.mkdir()

    def write_table(number, items, seq_start):
        tw = TableWriter(str(db / f"{number:06d}.ldb"))
        seq = seq_start
        for k, v in items:
            seq += 1
            tw.add(_internal_key(k, seq), v)
        size = tw.finish()
        first = _internal_key(items[0][0], seq_start + 1)
        last = _internal_key(items[-1][0], seq)
        return size, first, last

    # table 2: obsolete (later deleted by "compaction"); table 3: level 1;
    # table 4: level 0 overwriting one key of table 3 at a higher seq
    s2 = write_table(2, [(b"a", b"OLD-a"), (b"b", b"OLD-b")], 0)
    s3 = write_table(3, [(b"a", b"a1"), (b"b", b"b1"), (b"c", b"c1")], 10)
    s4 = write_table(4, [(b"b", b"b2-new")], 20)

    edits = []
    e1 = VersionEdit()
    e1.comparator = "leveldb.BytewiseComparator"
    e1.log_number = 0
    e1.next_file_number = 3
    e1.last_sequence = 2
    e1.new_files = [(0, 2, s2[0], s2[1], s2[2])]
    edits.append(e1)
    e2 = VersionEdit()  # compaction: table 2 out, table 3 in at level 1
    e2.log_number = 0
    e2.next_file_number = 4
    e2.last_sequence = 13
    e2.deleted_files = [(0, 2)]
    e2.new_files = [(1, 3, s3[0], s3[1], s3[2])]
    edits.append(e2)
    e3 = VersionEdit()  # fresh level-0 table shadows "b"
    e3.log_number = 0
    e3.next_file_number = 5
    e3.last_sequence = 21
    e3.new_files = [(0, 4, s4[0], s4[1], s4[2])]
    edits.append(e3)

    with open(db / "MANIFEST-000001", "wb") as f:
        w = LogWriter(f)
        for e in edits:
            w.add_record(e.encode())
    (db / "CURRENT").write_bytes(b"MANIFEST-000001\n")
    # table 2 deleted by the compaction record — remove like leveldb would
    (db / "000002.ldb").unlink()

    r = LevelDbReader(str(db), verify_checksums=True)
    assert [(k, v) for k, v in r] == [
        (b"a", b"a1"), (b"b", b"b2-new"), (b"c", b"c1")]


def test_reader_rejects_corruption_cleanly(tmp_path):
    """Bit flips and truncation raise ValueError/FileNotFoundError — never
    silent wrong data, never a crash."""
    db = str(tmp_path / "db")
    with LevelDbWriter(db) as w:
        for i in range(200):
            w.put(f"{i:05d}", (f"val{i}" * 9).encode())
    ldb = os.path.join(db, "000002.ldb")
    raw = bytearray(open(ldb, "rb").read())

    # corrupt the table magic
    bad = raw.copy()
    bad[-1] ^= 0xFF
    open(ldb, "wb").write(bad)
    with pytest.raises(ValueError, match="magic"):
        LevelDbReader(db)

    # flip a data byte: checksum verification must catch it
    bad = raw.copy()
    bad[50] ^= 0xFF
    open(ldb, "wb").write(bad)
    with pytest.raises(ValueError, match="checksum"):
        LevelDbReader(db, verify_checksums=True)

    # missing live table
    os.unlink(ldb)
    with pytest.raises(FileNotFoundError):
        LevelDbReader(db)


def test_writer_bounded_stray_spill(tmp_path):
    """Fully-unsorted keys (decimal "10" < "9" — the reference
    extract_features key scheme) spill to sorted level-0 tables at the
    max_stray_bytes bound instead of buffering the dataset; the merged
    view stays correct incl. overwrites across spills."""
    db = str(tmp_path / "db")
    n = 400
    w = LevelDbWriter(db, max_stray_bytes=4096)  # tiny bound → many spills
    for i in range(n):
        w.put(str(i), f"v{i}".encode() * 5)
    w.put("7", b"overwritten")  # duplicate after its spill epoch
    w.close()
    import glob
    tables = glob.glob(os.path.join(db, "*.ldb"))
    assert len(tables) > 3  # the bound actually forced spills
    r = LevelDbReader(db, verify_checksums=True)
    assert len(r) == n
    got = {bytes(k).decode(): bytes(v) for k, v in r}
    assert got["7"] == b"overwritten"  # last-put-wins across spills
    for i in (0, 9, 10, 99, 100, 399):
        if i != 7:
            assert got[str(i)] == f"v{i}".encode() * 5
    # bytewise cursor order preserved
    keys = [r.key(j) for j in range(len(r))]
    assert keys == sorted(keys)


def test_writer_replaces_stale_db_files(tmp_path):
    """Re-exporting into a directory that already holds a leveldb must
    delete ALL old DB files first: a stale .log would be replayed by
    every reader (log filter is num >= log_number == 0, here and in C++
    leveldb) and its high sequence numbers would shadow the fresh values
    — leveldb::DestroyDB semantics."""
    db = str(tmp_path / "db")
    w = LevelDbWriter(db)
    w.put("k", b"FIRST")
    w.close()
    # plant a stale log + junk that a previous DB generation could leave
    open(os.path.join(db, "000005.log"), "wb").write(b"\0" * 64)
    open(os.path.join(db, "000007.tmp"), "wb").write(b"junk")
    w = LevelDbWriter(db)
    w.put("k", b"SECOND")
    w.close()
    names = set(os.listdir(db))
    assert "000005.log" not in names and "000007.tmp" not in names
    r = LevelDbReader(db, verify_checksums=True)
    assert bytes(r.get(b"k")) == b"SECOND"
    assert len(r) == 1


def test_writer_stray_accounting_tracks_replacements(tmp_path):
    """Re-putting an out-of-order key with a larger value must advance the
    spill accounting by the REPLACEMENT size (the bound is on actual
    buffered bytes, not first-put sizes)."""
    db = str(tmp_path / "db")
    w = LevelDbWriter(db, max_stray_bytes=1 << 20)
    w.put("z", b"")          # make every later key out-of-order
    w.put("a", b"x")
    base = w._stray_bytes
    w.put("a", b"y" * 1000)  # replacement grows the buffer
    assert w._stray_bytes >= base + 999
    w.put("a", b"y")         # shrinking replacement is re-accounted too
    assert w._stray_bytes <= base + 1
    w.close()
    r = LevelDbReader(db)
    assert bytes(r.get(b"a")) == b"y"
