"""Sharded batched pipelines: the multi-chip execution path.

The optimizer's hot device step — requantize coefficients, decode to
pixels, run butteraugli against the precomputed original psycho-image,
estimate entropy size — expressed over a batch of images with
(dp = images, sp = image rows) sharding. XLA GSPMD inserts the halo
exchanges for every blur/stencil and the cross-shard max/sum collectives
for the distance and histograms; nothing here is hand-scheduled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from guetzli_tpu.image import output_image as oi
from guetzli_tpu.metric.diffmap import diffmap_psycho_image
from guetzli_tpu.metric.frequencies import separate_frequencies
from guetzli_tpu.metric.opsin import opsin_dynamics_image
from guetzli_tpu.ops.gamma import srgb8_to_linear_fast as srgb8_to_linear
from guetzli_tpu.ops.quantize import quantize_nearest


def _decode_to_linear(coeffs, height, width):
    """(3, nby, nbx, 64) dequantized 444 coeffs -> (3, H, W) linear RGB."""
    planes = [oi.idct_pixels16(coeffs[c])[:height, :width]
              for c in range(3)]
    srgb = oi.ycbcr_planes_to_srgb(*planes)
    return srgb8_to_linear(srgb)


def eval_candidate_batch(coeffs, quant, pi0, height: int, width: int):
    """One optimizer evaluation step for a batch of images.

    coeffs: (B, 3, nby, nbx, 64) int32 dequantized candidates
    quant:  (B, 3, 64) int32 quantization matrices to impose
    pi0:    PsychoImage of the originals, batched (leaves (B, ...))
    Returns (distances (B,), diffmaps (B, H, W), requantized coeffs).
    """
    q = quantize_nearest(coeffs, quant[:, :, None, None, :])

    def per_image(qc, pi0_one):
        lin = _decode_to_linear(qc, height, width)
        pi1 = separate_frequencies(opsin_dynamics_image(lin))
        dmap = diffmap_psycho_image(pi0_one, pi1)
        return dmap, jnp.max(dmap)

    dmaps, dists = jax.vmap(per_image)(q, pi0)
    return dists, dmaps, q


def make_sharded_eval(mesh, height: int, width: int):
    """jit-compiled eval_candidate_batch with dp/sp shardings bound."""
    coeff_s = NamedSharding(mesh, P("dp", None, "sp", None, None))
    quant_s = NamedSharding(mesh, P("dp", None, None))
    img_s = NamedSharding(mesh, P("dp", None, "sp", None))
    dist_s = NamedSharding(mesh, P("dp"))
    plane_s = NamedSharding(mesh, P("dp", "sp", None))

    fn = functools.partial(eval_candidate_batch, height=height, width=width)
    return jax.jit(fn,
                   in_shardings=(coeff_s, quant_s, img_s),
                   out_shardings=(dist_s, plane_s, coeff_s))


def precompute_pi0_batch(rgb_linear):
    """(B, 3, H, W) linear originals -> batched PsychoImage."""
    return jax.vmap(
        lambda lin: separate_frequencies(opsin_dynamics_image(lin))
    )(rgb_linear)
