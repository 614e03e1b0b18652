"""ctypes bindings for the C++ data plane (native/vvdata.cpp).

The reference's data path is C++ (LMDB cursor + proto parse + sampling in a
prefetch thread — ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:768-909,
ref:src/caffe/layers/base_data_layer.cpp:52-95); `libvvdata.so` is our native twin: mmap'd VVR reads,
zero-copy wire decode, and the flagship WINDOW sampler with its negative
reservoir running in a C++ prefetch thread. Every entry point has a pure-
Python fallback (records.py / shots.py), selected automatically when the
shared library isn't built — functionality is identical, the native path is
the fast one.

Build: `make -C native` at the repo root.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_BUILD_TRIED = False


def _find_lib():
    # Only a successful load is cached: an import that races ahead of the
    # on-demand build must not latch "missing" for the rest of the process.
    global _LIB, _BUILD_TRIED
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.environ.get("VVDATA_LIB", ""),
        os.path.join(here, "..", "..", "native", "libvvdata.so"),
    ]
    native_dir = os.path.join(here, "..", "..", "native")
    repo_so = os.path.join(native_dir, "libvvdata.so")
    src = os.path.join(native_dir, "vvdata.cpp")

    def _stale(path):  # source newer than the built lib → rebuild
        return (os.path.abspath(path) == os.path.abspath(repo_so)
                and os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(path))

    for cand in candidates:
        if cand and os.path.exists(cand) and not _stale(cand):
            lib = ctypes.CDLL(cand)
            _configure(lib)
            _LIB = lib
            return lib
    if not _BUILD_TRIED:
        _BUILD_TRIED = True
        import subprocess
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            # Serialize concurrent builders (pytest-xdist workers) with an
            # exclusive lock; the Makefile renames a temp .so into place so
            # readers never load a half-written library.
            lock_path = os.path.join(native_dir, ".build.lock")
            try:
                import fcntl
                with open(lock_path, "w") as lock:
                    fcntl.flock(lock, fcntl.LOCK_EX)
                    # another process may have finished the build while we
                    # waited — only build if still missing/stale
                    if not os.path.exists(repo_so) or _stale(repo_so):
                        subprocess.run(["make", "-C", native_dir],
                                       capture_output=True, timeout=120)
            except Exception:
                pass
            return _find_lib()
    # last resort: a stale lib beats none (rebuild failed or unavailable)
    for cand in candidates:
        if cand and os.path.exists(cand):
            from videovector_tpu.utils.logging import get_logger
            get_logger(__name__).warning(
                "native rebuild failed; falling back to stale %s", cand)
            lib = ctypes.CDLL(cand)
            _configure(lib)
            _LIB = lib
            return lib
    return None


def _configure(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vvr_open.restype = ctypes.c_void_p
    lib.vvr_open.argtypes = [ctypes.c_char_p]
    lib.vvr_close.argtypes = [ctypes.c_void_p]
    lib.vvr_count.restype = ctypes.c_int64
    lib.vvr_count.argtypes = [ctypes.c_void_p]
    lib.vvr_value.restype = u8p
    lib.vvr_value.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p]
    lib.vvr_key.restype = ctypes.c_char_p
    lib.vvr_key.argtypes = [ctypes.c_void_p, ctypes.c_int64, i64p]
    lib.vv_datum_floats.restype = ctypes.c_int64
    lib.vv_datum_floats.argtypes = [u8p, ctypes.c_int64, f32p, ctypes.c_int64]
    lib.vv_video_shots.restype = ctypes.c_int64
    lib.vv_video_shots.argtypes = [u8p, ctypes.c_int64, i32p, i32p, f32p,
                                   ctypes.c_int64, ctypes.c_int64]
    lib.vv_sampler_create.restype = ctypes.c_void_p
    lib.vv_sampler_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int]
    lib.vv_sampler_feature_dim.restype = ctypes.c_int
    lib.vv_sampler_feature_dim.argtypes = [ctypes.c_void_p]
    lib.vv_sampler_channels.restype = ctypes.c_int
    lib.vv_sampler_channels.argtypes = [ctypes.c_void_p]
    lib.vv_sampler_next.restype = ctypes.c_int
    lib.vv_sampler_next.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.vv_sampler_destroy.argtypes = [ctypes.c_void_p]
    lib.vvr_writer_open.restype = ctypes.c_void_p
    lib.vvr_writer_open.argtypes = [ctypes.c_char_p]
    lib.vvr_writer_append.restype = ctypes.c_int
    lib.vvr_writer_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int64, u8p, ctypes.c_int64]
    lib.vvr_writer_close.restype = ctypes.c_int
    lib.vvr_writer_close.argtypes = [ctypes.c_void_p]
    # JPEG decode entry points exist since round 5; older prebuilt .so
    # files lack them (the _stale mtime check rebuilds, but an externally
    # supplied VVDATA_LIB may be old) — degrade to unavailable
    try:
        lib.vv_jpeg_available.restype = ctypes.c_int
        lib.vv_jpeg_available.argtypes = []
        lib.vv_jpeg_dims.restype = ctypes.c_int
        lib.vv_jpeg_dims.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
        lib.vv_decode_jpeg_bgr.restype = ctypes.c_int
        lib.vv_decode_jpeg_bgr.argtypes = [u8p, ctypes.c_int64,
                                           ctypes.c_int, ctypes.c_int, u8p]
    except AttributeError:
        pass


def available() -> bool:
    return _find_lib() is not None


def jpeg_available() -> bool:
    """True when libvvdata was built against libjpeg(-turbo)."""
    lib = _find_lib()
    return bool(lib is not None and hasattr(lib, "vv_jpeg_available")
                and lib.vv_jpeg_available())


def decode_jpeg_bgr(payload: bytes, out_w: int = 0,
                    out_h: int = 0) -> np.ndarray | None:
    """Decode a JPEG to (out_h, out_w, 3) uint8 BGR HWC — the reference's
    cv::imread layout (ref:src/caffe/util/io.cpp:69-88) — with libjpeg
    DCT prescaling + cv2-convention bilinear (native/vvdata.cpp). out_w/
    out_h 0 decodes at natural size. None when the native path is
    unavailable or the stream is corrupt (callers fall back to cv2/PIL)."""
    lib = _find_lib()
    if lib is None or not hasattr(lib, "vv_jpeg_available") \
            or not lib.vv_jpeg_available():
        return None
    buf = np.frombuffer(payload, np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if out_w <= 0 or out_h <= 0:
        w = ctypes.c_int32(0)
        h = ctypes.c_int32(0)
        if lib.vv_jpeg_dims(bp, len(payload), ctypes.byref(w),
                            ctypes.byref(h)) != 0:
            return None
        out_w, out_h = int(w.value), int(h.value)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.vv_decode_jpeg_bgr(
        bp, len(payload), out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


class NativeRecordReader:
    """mmap VVR reader via libvvdata; API-compatible subset of
    records.RecordReader."""

    def __init__(self, path: str):
        lib = _find_lib()
        if lib is None:
            raise RuntimeError("libvvdata.so not built (make -C native)")
        self._lib = lib
        self._h = lib.vvr_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")

    def __len__(self) -> int:
        return int(self._lib.vvr_count(self._h))

    def value(self, i: int) -> bytes:
        ln = ctypes.c_int64()
        ptr = self._lib.vvr_value(self._h, i, ctypes.byref(ln))
        if not ptr:  # out-of-range index (i is untrusted: index stores)
            raise IndexError(f"record index {i} out of range [0, {len(self)})")
        return ctypes.string_at(ptr, ln.value)

    def datum_floats(self, i: int, dim: int) -> np.ndarray:
        """Decode record i's Datum.float_data straight into a numpy buffer
        (no Python-side wire parsing)."""
        ln = ctypes.c_int64()
        ptr = self._lib.vvr_value(self._h, i, ctypes.byref(ln))
        if not ptr:
            raise IndexError(f"record index {i} out of range [0, {len(self)})")
        out = np.empty(dim, np.float32)
        n = self._lib.vv_datum_floats(
            ptr, ln.value, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dim)
        if n < 0:
            raise ValueError("bad Datum record")
        return out[:n]

    def close(self):
        if self._h:
            self._lib.vvr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeRecordWriter:
    """Native VVR writer; byte-identical files to records.RecordWriter."""

    def __init__(self, path: str):
        lib = _find_lib()
        if lib is None:
            raise RuntimeError("libvvdata.so not built (make -C native)")
        self._lib = lib
        self._h = lib.vvr_writer_open(path.encode())
        if not self._h:
            raise IOError(f"cannot create {path}")

    def append(self, key, value: bytes) -> None:
        if isinstance(key, str):
            key = key.encode()
        buf = (ctypes.c_uint8 * len(value)).from_buffer_copy(value)
        rc = self._lib.vvr_writer_append(self._h, key, len(key), buf,
                                         len(value))
        if rc != 0:
            raise IOError("native append failed")

    def close(self) -> None:
        if self._h:
            self._lib.vvr_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeSampledShotsSource:
    """Native flagship WINDOW sampler with C++ prefetch thread. Drop-in for
    VideoSampledShotsSource (WINDOW mode) batches."""

    def __init__(self, path: str, *, batch_size: int = 128,
                 context_size: int = 5, num_negative_samples: int = 10,
                 max_buffer_size: int = 5000, negative_swap_percentage: int = 50,
                 max_same_video_negs: int = 6, seed: int = 1234,
                 prefetch_depth: int = 2):
        lib = _find_lib()
        if lib is None:
            raise RuntimeError("libvvdata.so not built (make -C native)")
        self._lib = lib
        self._h = lib.vv_sampler_create(
            path.encode(), batch_size, context_size, num_negative_samples,
            max_buffer_size, negative_swap_percentage, max_same_video_negs,
            seed, prefetch_depth)
        if not self._h:
            raise IOError(
                f"cannot open shot dataset {path} (or too few distinct "
                "shots to fill the negative reservoir of "
                f"{max_buffer_size} — the reference CHECK-fails too, "
                "video_shot_window_data_layer.cpp:338)")
        self.batch_size = batch_size
        self.feature_dim = int(lib.vv_sampler_feature_dim(self._h))
        self.channels = int(lib.vv_sampler_channels(self._h))

    def next_batch(self) -> dict:
        data = np.empty((self.batch_size, self.channels, self.feature_dim),
                        np.float32)
        vids = np.empty((self.batch_size,), np.float32)
        rc = self._lib.vv_sampler_next(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vids.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("native sampler stopped")
        return {"data": data, "video_id": vids}

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        if self._h:
            self._lib.vv_sampler_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
