"""MedNet / CaffeNet feature-extraction tower — the idiomatic fast path.

The graph engine runs the unmodified reference prototxt
(ref:projects/videovec_embedding/videovec_extraction.prototxt, NCHW) for
parity; this module is the TPU-first rebuild of the same conv1..fc7 tower:

- NHWC layout (TPU conv native; XLA avoids transposes),
- bf16 conv/matmul with f32 accumulation,
- the fused uint8→crop→mirror→mean-sub transform (data/transformer.py)
  inlined into the same jit program, so H2D traffic is uint8 pixels,
- weight import from the graph engine's params or `.caffemodel` blobs
  (OIHW → HWIO).

Architecture constants are CaffeNet's (conv1 96×11×11/4 … fc7 4096), matching
the reference's extraction net layer-for-layer so fc7/ip2 features agree with
the graph-engine path (tested in tests/test_mednet.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from videovector_tpu.core import fillers
from videovector_tpu.ops.pooling import _pool_geometry


@dataclass(frozen=True)
class ConvSpec:
    name: str
    num_output: int
    kernel: int
    stride: int = 1
    pad: int = 0
    group: int = 1
    lrn: bool = False          # LRN after pool (CaffeNet norm1/norm2)
    pool: bool = False         # 3x3/2 max pool


CAFFENET_CONVS = (
    ConvSpec("conv1", 96, 11, stride=4, pool=True, lrn=True),
    ConvSpec("conv2", 256, 5, pad=2, group=2, pool=True, lrn=True),
    ConvSpec("conv3", 384, 3, pad=1),
    ConvSpec("conv4", 384, 3, pad=1, group=2),
    ConvSpec("conv5", 256, 3, pad=1, group=2, pool=True),
)


@dataclass(frozen=True)
class MedNetConfig:
    convs: tuple = CAFFENET_CONVS
    fc6: int = 4096
    fc7: int = 4096
    input_hw: tuple = (227, 227)
    compute_dtype: str = "bfloat16"
    # lower stride-4 no-pad conv1 as a stride-1 conv over space-to-depth
    # blocks (3 → 48 input channels). Exact math, but measured a net LOSS
    # on v5e at batch 50 (conv 0.207→0.221 ms and +0.30 ms of layout
    # copies for the block transpose): conv1 is im2col-bandwidth-bound
    # (the 11x11/s4 window re-reads each pixel ~7.6x; ~110 MB of expanded
    # patches either way), so better lane packing doesn't help. Kept as an
    # option + test; off by default. See PERF.md.
    conv1_space_to_depth: bool = False


class MedNet:
    def __init__(self, cfg: MedNetConfig = MedNetConfig()):
        self.cfg = cfg

    def init(self, key, in_channels: int = 3):
        params = {}
        c_in = in_channels
        keys = jax.random.split(key, len(self.cfg.convs) + 2)
        for spec, k in zip(self.cfg.convs, keys):
            kw, kb = jax.random.split(k)
            # HWIO layout
            w = fillers.gaussian_fill(
                kw, (spec.kernel, spec.kernel, c_in // spec.group,
                     spec.num_output), std=0.01)
            params[spec.name] = {"w": w,
                                 "b": jnp.zeros((spec.num_output,))}
            c_in = spec.num_output
        # spatial size after the conv stack (6x6x256 for CaffeNet @227)
        h = w_sz = self._spatial_out()
        flat = h * w_sz * c_in
        for name, n_in, n_out, k in (("fc6", flat, self.cfg.fc6, keys[-2]),
                                     ("fc7", self.cfg.fc6, self.cfg.fc7,
                                      keys[-1])):
            params[name] = {
                "w": fillers.gaussian_fill(k, (n_out, n_in), std=0.005).T,
                "b": jnp.zeros((n_out,)),
            }
        return params

    def _spatial_out(self) -> int:
        size = self.cfg.input_hw[0]
        for spec in self.cfg.convs:
            size = (size + 2 * spec.pad - spec.kernel) // spec.stride + 1
            if spec.pool:
                oh, _, _, _ = _pool_geometry(size, size, (3, 3), (2, 2), (0, 0))
                size = oh
        return size

    # ------------------------------------------------------------------
    @staticmethod
    def _conv_space_to_depth(x, w, stride: int, cdt, conv_out=None):
        """Strided no-pad conv as a stride-1 conv on space-to-depth blocks:
        k11/s4 over 3 channels (3/128 MXU lane utilization, traced at ~51
        TFLOP/s) becomes k3/s1 over 48 channels. Exact same math — the
        kernel pads with zeros to a stride multiple, so the extra input
        row/col contributes nothing.

        x: (N, H, W, C) with (H - k) % stride == 0; w: (k, k, C, O)."""
        n, h, wd, c = x.shape
        k = w.shape[0]
        kb = -(-k // stride)               # ceil(k / stride)
        kpad = kb * stride
        hp = h + (kpad - k)                # pad input to match padded kernel
        x = jnp.pad(x, ((0, 0), (0, kpad - k), (0, kpad - k), (0, 0)))
        hb = hp // stride
        # (n, i, a, j, b, c) → (n, i, j, a, b, c) → blocks on the lane dim
        xs = x.reshape(n, hb, stride, hb, stride, c) \
            .transpose(0, 1, 3, 2, 4, 5) \
            .reshape(n, hb, hb, stride * stride * c)
        wp = jnp.pad(w, ((0, kpad - k), (0, kpad - k), (0, 0), (0, 0)))
        ws = wp.reshape(kb, stride, kb, stride, c, w.shape[3]) \
            .transpose(0, 2, 1, 3, 4, 5) \
            .reshape(kb, kb, stride * stride * c, w.shape[3])
        return lax.conv_general_dilated(
            xs.astype(cdt), ws.astype(cdt), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=conv_out or jnp.float32)

    def forward(self, params, images, *, upto: str = "fc7"):
        """images: (N, H, W, C) f32 (preprocessed) → features.
        `upto`: fc6 | fc7 (fc7 output == the reference's ip2 blob after ReLU).
        """
        cdt = jnp.dtype(self.cfg.compute_dtype)
        # throughput mode: convs EMIT the compute dtype (MXU still
        # accumulates f32 internally; rounding happens at the conv output
        # either way) so the bf16 cast cannot detach from the conv epilogue
        # — traced at batch 512, a detached cast forced a 1.16 ms f32
        # layout copy of conv2's output. f32 parity mode is unchanged.
        conv_out = jnp.float32 if cdt == jnp.float32 else cdt
        x = images
        for spec in self.cfg.convs:
            p = params[spec.name]
            if (spec.pad == 0 and spec.group == 1 and spec.stride > 1
                    and (x.shape[1] - spec.kernel) % spec.stride == 0
                    and self.cfg.conv1_space_to_depth):
                x = self._conv_space_to_depth(x, p["w"], spec.stride, cdt,
                                              conv_out)
            else:
                x = lax.conv_general_dilated(
                    x.astype(cdt), p["w"].astype(cdt),
                    window_strides=(spec.stride, spec.stride),
                    padding=[(spec.pad, spec.pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=spec.group,
                    preferred_element_type=conv_out)
            x = jnp.maximum(x + p["b"].astype(conv_out), 0.0)
            # inter-conv elementwise chain (pool/LRN) also runs in the
            # compute dtype — halves its HBM traffic
            x = x.astype(cdt)
            if spec.pool:
                n, h, w, c = x.shape
                oh, ow, ph, pw = _pool_geometry(h, w, (3, 3), (2, 2), (0, 0))
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    ((0, 0), ph, pw, (0, 0)))
            if spec.lrn:
                from videovector_tpu.ops.lrn import channel_window_sum
                summed = channel_window_sum(x * x, 3, 5)
                x = x * jnp.power(1.0 + (1e-4 / 5) * summed, -0.75)
        x = x.reshape(x.shape[0], -1)
        for name in ("fc6", "fc7"):
            p = params[name]
            x = jnp.dot(x.astype(cdt), p["w"].astype(cdt),
                        preferred_element_type=jnp.float32) + p["b"]
            x = jnp.maximum(x, 0.0)
            if upto == name:
                return x
        return x

    # ------------------------------------------------------------------
    @staticmethod
    def params_from_graph_engine(net_params: dict, *,
                                 fc6_chw: tuple = (256, 6, 6),
                                 name_map: dict | None = None) -> dict:
        """Convert graph-engine (NCHW/OIHW) CaffeNet params to this model's
        NHWC/HWIO layout. fc6's input dim is flattened CHW in the engine but
        HWC here, so its weight rows are permuted accordingly. `name_map`
        maps graph layer names to ours."""
        name_map = name_map or {}
        out = {}
        for name, lp in net_params.items():
            tgt = name_map.get(name, name)
            if "w" not in lp:
                continue
            def bias(width):
                # bias_term: false layers carry no "b" — forward() always
                # adds one, so substitute zeros (identical math) instead
                # of a None that crashes at the first call
                b = lp.get("b")
                return b if b is not None else jnp.zeros((width,),
                                                         jnp.float32)
            if lp["w"].ndim == 4:  # conv: OIHW → HWIO
                out[tgt] = {"w": jnp.transpose(lp["w"], (2, 3, 1, 0)),
                            "b": bias(lp["w"].shape[0])}
            else:
                w = lp["w"]
                if tgt == "fc6":
                    c, h, wd = fc6_chw
                    w = w.reshape(c, h, wd, -1).transpose(1, 2, 0, 3) \
                         .reshape(c * h * wd, -1)
                out[tgt] = {"w": w, "b": bias(w.shape[1])}
        return out
