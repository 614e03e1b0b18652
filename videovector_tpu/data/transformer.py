"""DataTransformer — image Datum preprocessing.

ref:src/caffe/data_transformer.cpp:9-152. Per-datum: decode uint8 pixels,
random crop (TRAIN) / center crop (TEST), random mirror, mean-subtract
(mean image or per-channel datum min/max/mean rescale `use_datum_scales`),
multiply by `scale`.

Two paths:
- `transform_datum` — host NumPy, exact per-item reference semantics.
- `batch_transform` — the TPU-native fused path: a jittable function over a
  uint8 batch (N, C, H, W) with crop offsets / mirror flags as arrays, so
  crop+mirror+mean+scale fuse into the first conv's XLA program and the only
  H2D traffic is uint8 pixels (4× smaller than f32).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from videovector_tpu.data.wire import Datum


@dataclass
class TransformConfig:
    """Mirror of TransformationParameter (ref caffe.proto:393-404)."""
    crop_size: int = 0
    mirror: bool = False
    scale: float = 1.0
    use_datum_scales: bool = False

    @classmethod
    def from_message(cls, msg) -> "TransformConfig":
        kw = {}
        for f in ("crop_size", "mirror", "scale", "use_datum_scales"):
            if msg.has(f):
                kw[f] = msg.get(f)
        return cls(**kw)


def datum_to_array(datum: Datum) -> np.ndarray:
    """uint8 `data` preferred, else float_data (ref :118-140)."""
    c, h, w = datum.channels, datum.height, datum.width
    if datum.data:
        return np.frombuffer(datum.data, np.uint8).reshape(c, h, w)
    return np.asarray(datum.float_data, np.float32).reshape(c, h, w)


def transform_datum(datum: Datum, cfg: TransformConfig, *,
                    mean: np.ndarray | None = None,
                    train: bool = False,
                    rng: np.random.RandomState | None = None,
                    preset: tuple | None = None) -> np.ndarray:
    """Exact reference semantics, one datum → (C, crop, crop) f32.

    `preset=(h_off, w_off, do_mirror)` is the reference's
    preset_channel/preset-transform path (ref data_transformer.cpp:53-55):
    the flexible multi-frame assembly draws ONE crop/mirror and applies it
    to every frame of the item (see data/generic.py)."""
    arr = datum_to_array(datum)
    c, h, w = arr.shape
    if cfg.crop_size:
        cs = cfg.crop_size
        if preset is not None:
            h_off, w_off, do_mirror = preset
        elif not datum.data:
            raise ValueError("cropping requires uint8 data (ref :52)")
        elif train:
            rng = rng or np.random.RandomState()
            h_off = rng.randint(h - cs)
            w_off = rng.randint(w - cs)
            do_mirror = bool(cfg.mirror and rng.randint(2))
        else:
            h_off = (h - cs) // 2
            w_off = (w - cs) // 2
            do_mirror = False
        patch = arr[:, h_off:h_off + cs, w_off:w_off + cs].astype(np.float32)
        if cfg.use_datum_scales:
            mins = np.asarray(datum.min, np.float32)[:, None, None]
            maxs = np.asarray(datum.max, np.float32)[:, None, None]
            means = np.asarray(datum.mean, np.float32)[:, None, None]
            out = mins + patch * (maxs - mins) / 255.0 - means
        else:
            m = (mean[:, h_off:h_off + cs, w_off:w_off + cs]
                 if mean is not None else 0.0)
            out = (patch - m) * cfg.scale
        if do_mirror:
            out = out[:, :, ::-1]
        return np.ascontiguousarray(out)
    # no crop
    if cfg.use_datum_scales:
        raise ValueError("use_datum_scales requires crop (ref :115)")
    if cfg.mirror:
        # ref data_transformer.cpp:43-45: LOG(FATAL) "Current
        # implementation requires mirror and crop_size to be set at the
        # same time" — silently training without the augmentation the
        # config asks for is worse than the error
        raise ValueError("mirror requires crop_size (ref "
                         "data_transformer.cpp:43-45 LOG(FATAL))")
    out = arr.astype(np.float32)
    if mean is not None:
        out = out - mean
    return out * cfg.scale


def make_batch_transform(cfg: TransformConfig, mean: np.ndarray | None,
                         image_hw: tuple[int, int], *,
                         layout: str = "NCHW"):
    """Build the fused on-device transform:
    f(pixels_u8, h_off (N,), w_off (N,), mirror (N,)) → f32 batch.
    Jit it (or let it inline into the extraction net's program).

    layout "NCHW" (Caffe blob order) or "NHWC" (the natural image-decode
    order AND the TPU conv layout — the NHWC path feeds MedNet with zero
    layout copies between the crop gathers and conv1)."""
    cs = cfg.crop_size
    h, w = image_hw
    if cfg.use_datum_scales:
        # per-item min/max/mean rescale needs the datum's own scale
        # vectors, which the fused (pixels, offsets, mirror) signature
        # does not carry — the host path (transform_datum /
        # FlexibleDataSource) implements it; applying mean/scale here
        # instead would be silently wrong preprocessing (the reference
        # LOG(FATAL)s on unsupported transform combos)
        raise ValueError("use_datum_scales is not supported by the fused "
                         "batch transform — use the host transform_datum "
                         "path")
    if cfg.mirror and not cs:
        raise ValueError("mirror requires crop_size (ref "
                         "data_transformer.cpp:43-45 LOG(FATAL))")
    mean_arr = jnp.asarray(mean, jnp.float32) if mean is not None else None
    if mean_arr is not None and layout == "NHWC" and mean_arr.ndim == 3:
        mean_arr = jnp.transpose(mean_arr, (1, 2, 0))  # CHW → HWC
    h_axis, w_axis = (2, 3) if layout == "NCHW" else (1, 2)

    def f(pixels, h_off, w_off, mirror):
        n = pixels.shape[0]
        # static layout guard: NHWC vs NCHW mixups would otherwise clip
        # gather indices silently (3-channel axis read as 256-row H)
        if pixels.ndim == 4 and (pixels.shape[h_axis], pixels.shape[w_axis]) \
                != (h, w):
            raise ValueError(
                f"pixels shape {pixels.shape} does not place image_hw "
                f"({h}, {w}) at the {layout} spatial axes — wrong "
                f"pixels_layout?")
        x = pixels.astype(jnp.float32)
        if cs:
            if _static_offsets(h_off, w_off, mirror):
                # TEST-phase center crop (the extraction config:
                # ref:src/caffe/data_transformer.cpp:60-90 deterministic
                # branch): offsets are compile-time constants, so the crop
                # is a static slice that fuses into the mean-subtract —
                # zero gather cost
                ho, wo = int(h_off), int(w_off)
                sl = (slice(None),) * h_axis
                x = x[sl + (slice(ho, ho + cs),)]
                sl = (slice(None),) * w_axis
                x = x[sl + (slice(wo, wo + cs),)]
                if mean_arr is not None:
                    msl = mean_arr[(slice(None),) * (h_axis - 1)
                                   + (slice(ho, ho + cs),)]
                    msl = msl[(slice(None),) * (w_axis - 1)
                              + (slice(wo, wo + cs),)]
                    x = x - msl[None]
                return x * cfg.scale
            # Batched crop as two axis gathers (a vmapped dynamic_slice
            # lowers worse on TPU). Mirroring flips the column INDICES,
            # which flips (patch − mean) jointly — the reference's
            # semantics (ref:src/caffe/data_transformer.cpp:60-152: mean
            # indexed at the source position, output written mirrored).
            rows = h_off[:, None] + jnp.arange(cs)            # (N, cs)
            cols = w_off[:, None] + jnp.arange(cs)            # (N, cs)
            cols = jnp.where(mirror[:, None], cols[:, ::-1], cols)
            if mean_arr is not None:
                x = x - mean_arr[None]
            rshape = [1] * x.ndim
            rshape[0], rshape[h_axis] = rows.shape
            cshape = [1] * x.ndim
            cshape[0], cshape[w_axis] = cols.shape
            x = jnp.take_along_axis(x, rows.reshape(rshape), axis=h_axis)
            x = jnp.take_along_axis(x, cols.reshape(cshape), axis=w_axis)
            return x * cfg.scale
        out = x - mean_arr if mean_arr is not None else x
        del n
        return out * cfg.scale

    return f


def _static_offsets(h_off, w_off, mirror) -> bool:
    """True when crop offsets are python/0-d constants and mirroring is
    off — the deterministic TEST-phase transform."""
    import numpy as _np

    def scalar(v):
        return isinstance(v, (int, _np.integer)) or (
            hasattr(v, "shape") and getattr(v, "shape", None) == ()
            and isinstance(v, _np.ndarray))

    if not (scalar(h_off) and scalar(w_off)):
        return False
    if mirror is None or mirror is False:
        return True
    arr = _np.asarray(mirror) if isinstance(
        mirror, (_np.ndarray, list, tuple, bool, int)) else None
    return arr is not None and not arr.any()


def sample_transform_params(n: int, image_hw, cfg: TransformConfig, *,
                            train: bool, rng: np.random.RandomState):
    """Host-side RNG for the fused path: per-item crop offsets + mirror."""
    h, w = image_hw
    cs = cfg.crop_size
    if train:
        h_off = rng.randint(0, h - cs, size=n)
        w_off = rng.randint(0, w - cs, size=n)
        mirror = (rng.randint(0, 2, size=n) > 0) if cfg.mirror \
            else np.zeros(n, bool)
    else:
        h_off = np.full(n, (h - cs) // 2)
        w_off = np.full(n, (w - cs) // 2)
        mirror = np.zeros(n, bool)
    return (h_off.astype(np.int32), w_off.astype(np.int32), mirror)
