"""Device-resident candidate-image state.

TPU redesign of the reference's OutputImage (guetzli/output_image.{h,cc}):
instead of mutating one block at a time with incremental IDCT updates, the
whole coefficient tensor lives on device and pixels are recomputed in one
batched pass per candidate — the shape a TPU wants (all integer semantics
preserved bit-for-bit: integer IDCT, x16 fixed-point pixel mirror,
positional dither, fancy chroma upsampling, YCbCr->sRGB LUT arithmetic).

Layouts:
  coeffs:  (nby, nbx, 64) int32, dequantized (coeff * quant), natural order
  pixels16: (H, W) int32, x16 fixed-point (reference pixels_ uint16)

Coefficients are mirrored on the HOST (numpy): the optimizer mutates and
serializes them there (no device round-trip per iteration — the tunnel
round-trip latency dominates per-op cost), and uploads them in one batched
transfer whenever a device computation (pixel mirror / metric) needs them.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.jpeg.data import JPEGData, Component, QuantTable
from guetzli_tpu.jpeg import data as jdata
from guetzli_tpu.ops import color, dct, quantize
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast as srgb8_to_linear


def blocks_to_plane(blocks: jax.Array) -> jax.Array:
    """(nby, nbx, 8, 8) -> (nby*8, nbx*8)."""
    nby, nbx = blocks.shape[0], blocks.shape[1]
    return blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def plane_to_blocks(plane: jax.Array) -> jax.Array:
    """(nby*8, nbx*8) -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def idct_pixels16(coeffs: jax.Array) -> jax.Array:
    """(nby, nbx, 64) dequantized coeffs -> (nby*8, nbx*8) int32 x16 pixels
    (reference SetCoeffBlock + UpdatePixelsForBlock 1x1 path)."""
    px = dct.idct_exact(coeffs.reshape(*coeffs.shape[:2], 8, 8))
    return blocks_to_plane(px) << 4


def fancy_upsample_16(sub: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """2x2 fancy upsampling of a x16 fixed-point subsampled plane, with
    edge replication; bit-exact to the reference's incremental form
    (guetzli/output_image.cc:146-203).

    sub: (sh, sw) int32 where sh >= ceil(out_h/2), sw >= ceil(out_w/2) —
    extra rows/cols beyond the valid ceil() grid are ignored.
    """
    sh, sw = -(-out_h // 2), -(-out_w // 2)
    s = sub[:sh, :sw]
    p = jnp.pad(s, 1, mode="edge")

    c = p[1:-1, 1:-1]
    up, down = p[:-2, 1:-1], p[2:, 1:-1]
    left, right = p[1:-1, :-2], p[1:-1, 2:]
    ul, ur = p[:-2, :-2], p[:-2, 2:]
    dl, dr = p[2:, :-2], p[2:, 2:]

    q00 = (9 * c + 3 * up + 3 * left + ul) >> 4      # even y, even x
    q01 = (9 * c + 3 * up + 3 * right + ur) >> 4     # even y, odd x
    q10 = (9 * c + 3 * down + 3 * left + dl) >> 4    # odd y, even x
    q11 = (9 * c + 3 * down + 3 * right + dr) >> 4   # odd y, odd x

    out = jnp.zeros((sh * 2, sw * 2), dtype=s.dtype)
    out = out.at[0::2, 0::2].set(q00)
    out = out.at[0::2, 1::2].set(q01)
    out = out.at[1::2, 0::2].set(q10)
    out = out.at[1::2, 1::2].set(q11)
    return out[:out_h, :out_w]


def fancy_upsample_16_dyn(sub: jax.Array, h, w, out_h: int,
                          out_w: int) -> jax.Array:
    """Bucketed-canvas variant of fancy_upsample_16: sub is the full
    padded subsampled plane (out_h/2, out_w/2); (h, w) are the TRUE image
    dims (traced). The reference's edge replication must happen at the
    true subsampled edge (ceil(h/2)-1, ceil(w/2)-1), so the one ring of
    subsampled samples beyond it is overwritten with copies of the edge
    row/column before the (static) upsample math runs; pixels outside
    (h, w) are garbage and masked by the metric."""
    sh_t = (h + 1) // 2        # ceil-div, works traced

    sw_t = (w + 1) // 2
    row = jax.lax.dynamic_slice_in_dim(sub, sh_t - 1, 1, axis=0)
    sub = jax.lax.dynamic_update_slice_in_dim(sub, row, sh_t, axis=0)
    col = jax.lax.dynamic_slice_in_dim(sub, sw_t - 1, 1, axis=1)
    sub = jax.lax.dynamic_update_slice_in_dim(sub, col, sw_t, axis=1)
    return fancy_upsample_16(sub, out_h, out_w)


def dither_to_u8(pixels16: jax.Array) -> jax.Array:
    """x16 fixed point -> uint8-valued int32 with the reference's positional
    dither (guetzli/output_image.cc:82: (p + 8 - (x & 1)) >> 4)."""
    w = pixels16.shape[-1]
    xpar = (jnp.arange(w, dtype=jnp.int32) & 1)
    return (pixels16 + 8 - xpar[None, :]) >> 4


def ycbcr_planes_to_srgb(y: jax.Array, cb: jax.Array,
                         cr: jax.Array) -> jax.Array:
    """Dithered YCbCr planes (x16 fixed point, (H, W)) -> (3, H, W) sRGB."""
    yd = dither_to_u8(y)
    cbd = dither_to_u8(cb)
    crd = dither_to_u8(cr)
    rgb = color.ycbcr_to_rgb(yd, cbd, crd)          # (H, W, 3)
    return jnp.transpose(rgb, (2, 0, 1))


def srgb_to_linear_planes(srgb: jax.Array, dtype=jnp.float32) -> jax.Array:
    return srgb8_to_linear(srgb, dtype=dtype)


@dataclasses.dataclass
class ComponentState:
    """One component's state (coefficients host-resident)."""
    factor_x: int
    factor_y: int
    width: int              # full-res image width
    height: int
    coeffs: np.ndarray      # (nby, nbx, 64) int32 dequantized (HOST)
    quant: np.ndarray       # (64,) int32

    @property
    def width_in_blocks(self) -> int:
        return self.coeffs.shape[1]

    @property
    def height_in_blocks(self) -> int:
        return self.coeffs.shape[0]

    def is_all_zero(self) -> bool:
        return not bool(np.any(self.coeffs))

    def pixels16(self) -> jax.Array:
        """(H, W) int32 x16 fixed-point pixel mirror (device)."""
        sub = idct_pixels16(jnp.asarray(self.coeffs))
        if self.factor_x == 1 and self.factor_y == 1:
            return sub[:self.height, :self.width]
        if self.factor_x == 2 and self.factor_y == 2:
            return fancy_upsample_16(sub, self.height, self.width)
        raise ValueError(
            f"unsupported sampling {self.factor_x}x{self.factor_y}")


class OutputImage:
    """Candidate image: 3 components (or grayscale-as-YUV with zero chroma).

    Mirrors the reference OutputImage API surface; heavy paths are jitted
    free functions over the coefficient arrays.
    """

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.components: List[ComponentState] = []
        for _ in range(3):
            nbx = -(-width // 8)
            nby = -(-height // 8)
            self.components.append(ComponentState(
                1, 1, width, height,
                np.zeros((nby, nbx, 64), dtype=np.int32),
                np.ones(64, dtype=np.int32)))

    def copy(self) -> "OutputImage":
        out = OutputImage.__new__(OutputImage)
        out.width, out.height = self.width, self.height
        out.components = [dataclasses.replace(c) for c in self.components]
        return out

    def copy_from_jpeg_data(self, jpg: JPEGData) -> None:
        """Dequantize parsed coefficients into device state
        (reference guetzli/output_image.cc:211-261)."""
        comps = []
        for comp in jpg.components:
            fx = jpg.max_h_samp_factor // comp.h_samp_factor
            fy = jpg.max_v_samp_factor // comp.v_samp_factor
            nbx = -(-self.width // (8 * fx))
            nby = -(-self.height // (8 * fy))
            q = np.asarray(jpg.quant[comp.quant_idx].values, dtype=np.int32)
            src = comp.coeffs.reshape(comp.height_in_blocks,
                                      comp.width_in_blocks, 64)
            deq = src[:nby, :nbx].astype(np.int32) * q[None, None, :]
            comps.append(ComponentState(fx, fy, self.width, self.height,
                                        deq, q.copy()))
        while len(comps) < 3:
            # grayscale: chroma = all zero at 1x1 (reference keeps 3 comps)
            nbx = -(-self.width // 8)
            nby = -(-self.height // 8)
            comps.append(ComponentState(
                1, 1, self.width, self.height,
                np.zeros((nby, nbx, 64), dtype=np.int32),
                np.ones(64, dtype=np.int32)))
        self.components = comps

    def apply_global_quantization(self, q: np.ndarray) -> None:
        """Re-quantize every block's dequantized coefficients to multiples
        of q (reference guetzli/output_image.cc:232-243)."""
        for c, comp in enumerate(self.components):
            comp.coeffs = quantize.quantize_nearest_np(comp.coeffs, q[c])
            comp.quant = np.asarray(q[c], dtype=np.int32).copy()

    # --- pixel views ---

    def pixels16(self) -> List[jax.Array]:
        return [c.pixels16() for c in self.components]

    def to_srgb(self) -> jax.Array:
        """(3, H, W) int32 sRGB in [0,255]."""
        y, cb, cr = self.pixels16()
        return ycbcr_planes_to_srgb(y, cb, cr)

    def to_linear_rgb(self, dtype=jnp.float32) -> jax.Array:
        return srgb_to_linear_planes(self.to_srgb(), dtype=dtype)

    def to_float_pixels(self, c: int) -> jax.Array:
        """(H, W) float pixels of one component via the float IDCT
        (+128 offset), reference guetzli/output_image.cc:99-121."""
        comp = self.components[c]
        assert comp.factor_x == 1 and comp.factor_y == 1
        from guetzli_tpu.ops import dct as _dct
        blocks = comp.coeffs.reshape(*comp.coeffs.shape[:2], 8, 8)
        px = _dct.idct_f(blocks.astype(jnp.float32)) + 128.0
        return blocks_to_plane(px)[:self.height, :self.width]

    def downsample(self, use_silver_screen: bool = False) -> None:
        """Move chroma to 2x2 subsampling (reference
        guetzli/output_image.cc:304-340): optional gamma-aware iterative
        YUV420 ("silver screen"), else chroma pre-sharpen/blur + averaging,
        then float-DCT back to coefficients."""
        from guetzli_tpu.image import downsample as ds

        if (self.components[1].is_all_zero()
                and self.components[2].is_all_zero()):
            return
        h, w = self.height, self.width
        if use_silver_screen:
            srgb = self.to_srgb().astype(jnp.float32)
            y_full, u_sub, v_sub = ds.rgb_to_yuv420(srgb, w, h)
            planes = {0: y_full,
                      1: ds._upsample2x2(u_sub, w, h),
                      2: ds._upsample2x2(v_sub, w, h)}
        else:
            yuv = jnp.stack([self.to_float_pixels(c) for c in range(3)])
            yuv = ds.preprocess_channel(yuv, channel=2)
            yuv = ds.preprocess_channel(yuv, channel=1)
            planes = {1: yuv[1], 2: yuv[2]}
        for c, plane in planes.items():
            fx, fy = (1, 1) if c == 0 else (2, 2)
            coeffs = np.asarray(
                ds.set_downsampled_coefficients(plane, fx, fy, w, h))
            self.components[c] = ComponentState(
                fx, fy, w, h, coeffs, self.components[c].quant.copy())

    # --- serialization ---

    def save_to_jpeg_data(self) -> JPEGData:
        """Divide by quant and build a JPEGData (host), incl. 4:2:0 padding
        blocks (reference guetzli/output_image.cc:348-409)."""
        jpg = JPEGData(width=self.width, height=self.height)
        y = self.components[0]
        assert y.factor_x == 1 and y.factor_y == 1
        ncomp = 1 if (self.components[1].is_all_zero()
                      and self.components[2].is_all_zero()) else 3
        max_h = max((c.factor_x for c in self.components[1:ncomp]),
                    default=1)
        max_v = max((c.factor_y for c in self.components[1:ncomp]),
                    default=1)
        jpg.max_h_samp_factor = max_h
        jpg.max_v_samp_factor = max_v
        mcu_cols = min(c.width_in_blocks for c in self.components[:ncomp])
        mcu_rows = min(c.height_in_blocks for c in self.components[:ncomp])
        jpg.MCU_cols, jpg.MCU_rows = mcu_cols, mcu_rows

        q = np.stack([c.quant for c in self.components])
        for ci in range(ncomp):
            comp = self.components[ci]
            out = Component(
                id=ci,
                h_samp_factor=max_h // comp.factor_x,
                v_samp_factor=max_v // comp.factor_y,
            )
            out.width_in_blocks = mcu_cols * out.h_samp_factor
            out.height_in_blocks = mcu_rows * out.v_samp_factor
            src = comp.coeffs              # (nby, nbx, 64) host array
            qc = comp.quant[None, None, :]
            assert np.all(src % qc == 0), "coeffs not divisible by quant"
            div = (src // qc).astype(np.int16)
            nby, nbx = out.height_in_blocks, out.width_in_blocks
            dst = np.zeros((nby, nbx, 64), dtype=np.int16)
            dst[:src.shape[0], :src.shape[1]] = div
            # Padding blocks (beyond the component grid) carry last_dc so
            # the DC prediction stays cheap — replicate reference scan-order
            # behavior.
            if nbx > src.shape[1] or nby > src.shape[0]:
                dc = dst[:, :, 0].copy()
                for by in range(nby):
                    for bx in range(nbx):
                        if by >= src.shape[0] or bx >= src.shape[1]:
                            prev = dc[by, bx - 1] if bx > 0 else (
                                dc[by - 1, nbx - 1] if by > 0 else 0)
                            dc[by, bx] = prev
                            dst[by, bx, 0] = prev
            out.coeffs = dst.reshape(-1, 64)
            jpg.components.append(out)
        jdata.save_quant_tables(q, jpg)
        return jpg

    def frame_type_str(self) -> str:
        c = self.components
        return "f" + "".join(f"{x.factor_x}{x.factor_y}" for x in c)
