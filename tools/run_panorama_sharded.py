"""Panorama-scale sp-sharding validation (BASELINE.md scaling config).

Runs the optimizer's hot device step (requantize -> decode -> butteraugli
vs precomputed original psycho-image) on a ~16.8 MPix panorama, twice:
unsharded on one device, and row-sharded over sp=8 on an 8-device mesh
(virtual CPU devices here; the same code path serves real chips). GSPMD
inserts the blur/Malta halo exchanges and the cross-shard max — this run
proves they are value-preserving AND that the memory footprint of the
16+ MPix config is handled (reference caps inputs at 2^21 blocks,
jpeg_data_reader.cc:149-158; the panorama is ~0.26M blocks/component).

Writes benchmarks/PANORAMA_SP.json. CPU-only; needs no TPU window.
"""

import json
import os
import pathlib
import resource
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

H, W = 2048, 8192  # 16.78 MPix, extreme aspect ("panorama")


def build_panorama(bees_rgb: np.ndarray) -> np.ndarray:
    """Tile noised/rolled crops of a real photo into (H, W, 3) uint8 —
    keeps photographic statistics without shipping a 16 MPix fixture."""
    rng = np.random.default_rng(42)
    bh, bw = bees_rgb.shape[:2]
    out = np.empty((H, W, 3), np.uint8)
    for y in range(0, H, bh):
        for x in range(0, W, bw):
            tile = np.roll(bees_rgb,
                           (int(rng.integers(0, bh)),
                            int(rng.integers(0, bw))), (0, 1))
            noise = rng.integers(-5, 6, tile.shape, np.int16)
            t = np.clip(tile.astype(np.int16) + noise, 0, 255)
            out[y:y + bh, x:x + bw] = t[:H - y, :W - x]
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from guetzli_tpu.jpeg.encoder import encode_rgb_to_jpeg_data
    from guetzli_tpu.ops.gamma import srgb8_to_linear_fast
    from guetzli_tpu.parallel import mesh as pmesh
    from guetzli_tpu.parallel.sharded import (eval_candidate_batch,
                                              make_sharded_eval,
                                              precompute_pi0_batch)
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8, jax.devices()

    bees = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    rgb = build_panorama(bees)

    # Realistic optimizer-step inputs: the bootstrap's raw (quant=1)
    # coefficients and a mid-search global quant matrix.
    jpg = encode_rgb_to_jpeg_data(rgb)
    nby, nbx = H // 8, W // 8
    coeffs = np.stack([
        np.asarray(c.coeffs, np.int32).reshape(nby, nbx, 64)
        for c in jpg.components])[None]                  # (1, 3, nby, nbx, 64)
    quant = np.broadcast_to(
        np.asarray([17, 14, 14, 17, 20, 24, 31, 37] * 8, np.int32),
        (1, 3, 64)).copy()

    lin = np.asarray(srgb8_to_linear_fast(
        jnp.asarray(rgb.transpose(2, 0, 1)[None], jnp.int32)))

    t0 = time.time()
    pi0 = precompute_pi0_batch(jnp.asarray(lin))
    jax.block_until_ready(pi0)
    t_pi0 = time.time() - t0

    # --- unsharded (single device) ---
    un = jax.jit(lambda c, q, p: eval_candidate_batch(c, q, p, H, W))
    t0 = time.time()
    d_ref, m_ref, q_ref = un(jnp.asarray(coeffs), jnp.asarray(quant), pi0)
    jax.block_until_ready(d_ref)
    t_un_total = time.time() - t0
    t0 = time.time()
    d_ref, m_ref, q_ref = un(jnp.asarray(coeffs), jnp.asarray(quant), pi0)
    jax.block_until_ready(d_ref)
    t_un = time.time() - t0

    # --- sp=8 row-sharded ---
    mesh = pmesh.make_mesh(dp=1, sp=8)
    step = make_sharded_eval(mesh, H, W)
    c_sh = jax.device_put(jnp.asarray(coeffs),
                          pmesh.batch_coeff_sharding(mesh))
    q_in = jax.device_put(jnp.asarray(quant),
                          NamedSharding(mesh, P("dp", None, None)))
    pi0_sh = jax.device_put(pi0, pmesh.batch_image_sharding(mesh))
    t0 = time.time()
    d_sh, m_sh, q_sh = step(c_sh, q_in, pi0_sh)
    jax.block_until_ready(d_sh)
    t_sh_total = time.time() - t0
    t0 = time.time()
    d_sh, m_sh, q_sh = step(c_sh, q_in, pi0_sh)
    jax.block_until_ready(d_sh)
    t_sh = time.time() - t0

    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_sh))
    dmax = float(np.max(np.abs(np.asarray(m_ref) - np.asarray(m_sh))))
    ddist = float(abs(float(d_ref[0]) - float(d_sh[0])))
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

    result = {
        "config": "panorama_sp8",
        "mpix": round(H * W / 1e6, 2),
        "h": H, "w": W,
        "mesh": {"dp": 1, "sp": 8, "platform": "cpu-virtual"},
        "distance_unsharded": float(d_ref[0]),
        "distance_sharded": float(d_sh[0]),
        "abs_distance_delta": ddist,
        "diffmap_max_abs_delta": dmax,
        "requant_coeffs_identical": True,
        "pi0_seconds": round(t_pi0, 1),
        "eval_seconds": {"unsharded_warm": round(t_un, 1),
                         "sharded_warm": round(t_sh, 1),
                         "unsharded_cold": round(t_un_total, 1),
                         "sharded_cold": round(t_sh_total, 1)},
        "peak_rss_gb": round(rss_gb, 1),
        "ts": time.time(),
    }
    out = REPO / "benchmarks" / "PANORAMA_SP.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))
    assert ddist <= 2e-4 * max(1.0, float(d_ref[0])), ddist
    assert dmax <= 5e-4 * max(1.0, float(np.max(np.asarray(m_ref)))), dmax
    print("PANORAMA SP-SHARDING PARITY OK")


if __name__ == "__main__":
    main()
