"""4:2:0 chroma preprocessing + downsampling.

Reference: guetzli/preprocess_downsample.cc. Two pieces:

- preprocess_channel: selective chroma sharpen/blur before subsampling
  (dark/red area maps via erosion/dilation, edge-gated blur map, 5-tap
  sigma-1.3 separable filters). All maps are elementwise + tiny stencils —
  one fused XLA pass instead of the reference's eight full-image loops.
- rgb_to_yuv420 ("silver screen"): gamma-aware iterative refinement of the
  downsampled YUV against linear-light targets (20 fixed-point iterations,
  fancy-upsample-aware), used when Params.use_silver_screen is set.

And set_downsampled_coefficients: average + float DCT back to coefficient
space (reference guetzli/output_image.cc:265-300).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.ops import dct


def _conv2x_skip_edges(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Separable 1-D convolution in x then y; border rows/cols where the
    kernel does not fit keep the *input of that pass* (reference
    Convolve2X, preprocess_downsample.cc:53-83)."""
    k = np.asarray(kernel, dtype=np.float64)
    mul = 1.0 / k.sum()
    kn = jnp.asarray(k * mul, dtype=img.dtype)
    size2 = len(k) // 2

    def pass1d(x):  # along last axis
        out = jnp.zeros_like(x)
        for j in range(len(k)):
            out = out + kn[j] * jnp.roll(x, size2 - j, axis=-1)
        # keep borders from input
        idx = jnp.arange(x.shape[-1])
        interior = (idx >= size2) & (idx < x.shape[-1] - size2)
        return jnp.where(interior, out, x)

    tmp = pass1d(img)
    return jnp.swapaxes(pass1d(jnp.swapaxes(tmp, -1, -2)), -1, -2)


def _normal_kernel(sigma: float, size: int = 5) -> np.ndarray:
    i = np.arange(size) - size // 2
    return (np.exp(-i * i / (2 * sigma * sigma))
            * 0.3989422804014327 / sigma)


def _edge_detect(plane: jax.Array) -> jax.Array:
    """3x3 Laplacian, borders keep original values (reference Convolve2D
    edge-skip behavior feeds |edge| >= threshold only in the interior —
    border pixels keep the raw plane value there)."""
    up = jnp.roll(plane, 1, axis=0)
    down = jnp.roll(plane, -1, axis=0)
    left = jnp.roll(plane, 1, axis=1)
    right = jnp.roll(plane, -1, axis=1)
    out = 4 * plane - up - down - left - right
    h, w = plane.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    return jnp.where(interior, out, plane)


def _erode(m: jax.Array) -> jax.Array:
    """4-neighborhood erosion, borders unchanged (reference Erode)."""
    up = jnp.roll(m, 1, axis=0)
    down = jnp.roll(m, -1, axis=0)
    left = jnp.roll(m, 1, axis=1)
    right = jnp.roll(m, -1, axis=1)
    eroded = m & up & down & left & right
    h, w = m.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    return jnp.where(interior, eroded, m)


def _dilate(m: jax.Array) -> jax.Array:
    up = jnp.roll(m, 1, axis=0)
    down = jnp.roll(m, -1, axis=0)
    left = jnp.roll(m, 1, axis=1)
    right = jnp.roll(m, -1, axis=1)
    dil = m | up | down | left | right
    h, w = m.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    return jnp.where(interior, dil, m)


def preprocess_channel(yuv: jax.Array, channel: int, sigma: float = 1.3,
                       amount: float = 0.5, blur: bool = True,
                       sharpen: bool = True) -> jax.Array:
    """(3, H, W) float YUV (0..255 scale) -> same, with the chroma channel
    selectively sharpened/blurred (reference PreProcessChannel)."""
    if not blur and not sharpen:
        return yuv
    y = yuv[0] / 255.0
    u = yuv[1] / 255.0 - 0.5
    v = yuv[2] / 255.0 - 0.5
    planes = [y, u, v]

    r = y + 1.402 * v
    g = y - 0.34414 * u - 0.71414 * v
    b = y + 1.772 * u

    if channel == 2:
        darkmap = (g < 0.85) & (b < 0.85) & (r < 0.9)
        redmap = (2.116 * v > -0.34414 * u + 0.2) \
            & (1.402 * v > 1.772 * u + 0.2)
    else:
        darkmap = (r < 0.85) & (g < 0.85) & (b < 0.9)
        redmap = (v < 1.263 * u - 0.1) & (u > -0.33741 * v)
    for _ in range(3):
        darkmap = _erode(darkmap)
    for _ in range(3):
        redmap = _dilate(redmap)
    sharpenmap = redmap & darkmap

    threshold = (0.02 if channel == 2 else 1.0) * 127.5
    edge = _edge_detect(planes[channel])
    blurmap = (~sharpenmap) & darkmap & (jnp.abs(edge) < threshold) \
        & (v < -0.162 * u)
    for _ in range(2):
        blurmap = _erode(blurmap)

    kernel = _normal_kernel(sigma)
    smoothed = _conv2x_skip_edges(planes[channel], kernel)
    sharpened = planes[channel] + (planes[channel] - smoothed) * amount
    blurred = _conv2x_skip_edges(planes[channel], _normal_kernel(1.3))

    out_c = planes[channel]
    if sharpen:
        out_c = jnp.where(sharpenmap, sharpened, out_c)
    if blur:
        out_c = jnp.where(blurmap & ~sharpenmap, blurred, out_c)
    planes[channel] = out_c

    return jnp.stack([planes[0] * 255.0, (planes[1] + 0.5) * 255.0,
                      (planes[2] + 0.5) * 255.0])


# ---------------------------------------------------------------------------
# Silver-screen gamma-aware 4:2:0 (reference RGBToYUV420).
# ---------------------------------------------------------------------------

def _gamma_to_linear(x):
    return jnp.power(jnp.maximum(x, 0.0) / 255.0, 2.2)


def _linear_to_gamma(x):
    return 255.0 * jnp.power(jnp.maximum(x, 0.0), 1.0 / 2.2)


def _rgb_to_yuv_f(rgb):   # (3, H, W) float, JFIF full-range BT.601
    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.16874 * r - 0.33126 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.41869 * g - 0.08131 * b + 128.0
    return jnp.stack([y, u, v])


def _yuv_to_rgb_f(yuv):
    y, u, v = yuv
    r = y + 1.402 * (v - 128.0)
    g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
    b = y + 1.772 * (u - 128.0)
    return jnp.clip(jnp.stack([r, g, b]), 0.0, 255.0)


def _lin_avg_luma(rgb):
    lin = _gamma_to_linear(rgb)
    return _linear_to_gamma(
        0.299 * lin[0] + 0.587 * lin[1] + 0.114 * lin[2])


def _downsample2x2_linear(rgb, width, height):
    lin = _gamma_to_linear(rgb)
    w2, h2 = (width + 1) // 2, (height + 1) // 2
    padded = jnp.pad(lin, ((0, 0), (0, 2 * h2 - height),
                           (0, 2 * w2 - width)), mode="edge")
    avg = padded.reshape(3, h2, 2, w2, 2).mean(axis=(2, 4))
    return _linear_to_gamma(avg)


def _upsample2x2(img, width, height):
    up = jnp.repeat(jnp.repeat(img, 2, axis=-2), 2, axis=-1)
    return up[..., :height, :width]


def _fancy_blur(img, width, height):
    """libjpeg fancy-upsample filter applied at full resolution
    (reference preprocess_downsample.cc:405-426)."""
    # For pixel (y0+iy, x0+ix) on the 2x2-aligned grid: mix of the
    # quadrant anchor and clamped +-2 neighbors.
    h, w = height, width
    yy = jnp.arange(h)
    xx = jnp.arange(w)
    y0 = (yy // 2 * 2)
    x0 = (xx // 2 * 2)
    dy = jnp.where(yy % 2 == 0, -2, 2)
    dx = jnp.where(xx % 2 == 0, -2, 2)
    y1 = jnp.clip(y0 + dy, 0, h - 1)
    x1 = jnp.clip(x0 + dx, 0, w - 1)
    a = img[y0][:, x0]
    bx = img[y0][:, x1]
    by = img[y1][:, x0]
    c = img[y1][:, x1]
    return (9.0 * a + 3.0 * bx + 3.0 * by + c) / 16.0


def _yuv420_to_rgb(y_full, u_sub, v_sub, width, height):
    u = _fancy_blur(_upsample2x2(u_sub, width, height), width, height)
    v = _fancy_blur(_upsample2x2(v_sub, width, height), width, height)
    return _yuv_to_rgb_f(jnp.stack([y_full, u, v]))


def rgb_to_yuv420(rgb_u8: jax.Array, width: int, height: int):
    """(3, H, W) float RGB (0..255) -> (y_full (H,W), u_sub, v_sub) after
    20 gamma-aware refinement iterations (reference RGBToYUV420)."""
    rgb = rgb_u8.astype(jnp.float32)
    y_target = _lin_avg_luma(rgb)
    yuv_target = _rgb_to_yuv_f(_downsample2x2_linear(rgb, width, height))
    y_guess = _upsample2x2(yuv_target[0], width, height)
    u_guess = yuv_target[1]
    v_guess = yuv_target[2]

    def body(_, state):
        y_g, u_g, v_g = state
        rgb_rec = _yuv420_to_rgb(y_g, u_g, v_g, width, height)
        y_rec = _lin_avg_luma(rgb_rec)
        yuv_rec = _rgb_to_yuv_f(
            _downsample2x2_linear(rgb_rec, width, height))
        y_g = jnp.clip(y_g - (y_rec - y_target), 0.0, 255.0)
        u_g = jnp.clip(u_g - (yuv_rec[1] - yuv_target[1]), 0.0, 255.0)
        v_g = jnp.clip(v_g - (yuv_rec[2] - yuv_target[2]), 0.0, 255.0)
        return y_g, u_g, v_g

    y_guess, u_guess, v_guess = jax.lax.fori_loop(
        0, 20, body, (y_guess, u_guess, v_guess))
    return y_guess, u_guess, v_guess


def set_downsampled_coefficients(pixels: jax.Array, factor_x: int,
                                 factor_y: int, width: int,
                                 height: int) -> jax.Array:
    """Float pixel plane -> (nby, nbx, 64) int32 coefficients at the given
    subsampling (average + float DCT - 1024 DC, rounded; reference
    guetzli/output_image.cc:265-300)."""
    nbx = -(-width // (8 * factor_x))
    nby = -(-height // (8 * factor_y))
    # Edge-replicate to the sampled grid, then average factor_y x factor_x
    # cells (min-clamped coordinates in the reference == edge replication).
    sw, sh = nbx * 8 * factor_x, nby * 8 * factor_y
    p = jnp.pad(pixels, ((0, sh - height), (0, sw - width)), mode="edge")
    if factor_x > 1 or factor_y > 1:
        p = p.reshape(nby * 8, factor_y, nbx * 8, factor_x).mean(
            axis=(1, 3))
    blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    co = dct.dct_f(blocks.astype(jnp.float32))
    co = co.at[..., 0, 0].add(-1024.0)
    return jnp.round(co).astype(jnp.int32).reshape(nby, nbx, 64)
