#!/usr/bin/env python3
"""Multi-host (multi-process) execution of the sharded optimizer eval.

The deployment shape this proves (SURVEY.md §2 parallelism inventory,
"Mesh/runtime layer" / "Collectives"): a global ('dp', 'sp') mesh
spanning processes — images data-parallel ACROSS hosts, each image's
metric pipeline row-sharded over the host's local devices, with the
cross-host collectives (the global max-distance reduce) riding the
inter-process fabric (gloo/TCP here, DCN on real pods).

Driver mode (default) spawns N worker processes on this machine, each
with its own set of CPU devices (`--xla_force_host_platform_device_count`),
wired together with `jax.distributed.initialize` — the exact API a real
multi-host TPU pod uses. Each worker:

  1. joins the cluster and builds the GLOBAL mesh (dp=processes,
     sp=local devices);
  2. contributes its own image's coefficients/quant/psycho-image as its
     process-local shard of the global batch
     (`jax.make_array_from_process_local_data`);
  3. runs the jitted sharded eval (parallel/sharded.py) — GSPMD inserts
     intra-host halo exchanges for the blur/Malta stencils and the
     cross-host collectives;
  4. checks its image's sharded distance/diffmap bit-match a purely
     local single-device evaluation (the parity contract of
     tests/test_sharding.py, now across processes);
  5. verifies the replicated global max distance equals the max of the
     per-host values (a true cross-host reduction).

Writes benchmarks/MULTIHOST.json from the driver.

Usage:
  python tools/multihost_demo.py [--nproc 2] [--sp 4]
  (worker mode is internal: --worker --process-id K)
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

PORT = 29517


def worker(process_id: int, nproc: int, sp: int, port: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}",
                               num_processes=nproc,
                               process_id=process_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from guetzli_tpu.parallel import mesh as pmesh
    from guetzli_tpu.parallel.sharded import (eval_candidate_batch,
                                              make_sharded_eval)
    from guetzli_tpu.metric.frequencies import separate_frequencies
    from guetzli_tpu.metric.opsin import opsin_dynamics_image
    from guetzli_tpu.ops.gamma import srgb8_to_linear_fast

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, nproc, n_local)
    assert sp <= n_local and n_local % sp == 0
    # dp spans processes: device order from jax.devices() groups each
    # process's devices contiguously.
    mesh = pmesh.make_mesh(dp=n_global // sp, sp=sp)

    # --- this host's image: deterministic per-process crop/noise ---
    from PIL import Image
    rgb_full = np.asarray(
        Image.open(REPO / "tests" / "data" / "bees.png").convert("RGB"))
    h = w = 64
    y0, x0 = 24 * process_id, 40 * process_id
    crop = rgb_full[y0:y0 + h, x0:x0 + w].transpose(2, 0, 1)
    rng = np.random.default_rng(100 + process_id)
    lin = np.asarray(srgb8_to_linear_fast(
        jnp.asarray(crop[None], jnp.int32))).astype(np.float32)
    coeffs = rng.integers(-64, 64, (1, 3, h // 8, w // 8, 64)).astype(
        np.int32)
    quant = rng.integers(1, 16, (1, 3, 64)).astype(np.int32)
    pi0_local = jax.vmap(
        lambda l: separate_frequencies(opsin_dynamics_image(l))
    )(jnp.asarray(lin))

    # --- local single-device reference (no mesh, no collectives) ---
    d_ref, m_ref, q_ref = jax.jit(
        lambda c, q, p: eval_candidate_batch(c, q, p, h, w))(
        jnp.asarray(coeffs), jnp.asarray(quant), pi0_local)
    d_ref = np.asarray(d_ref)
    m_ref = np.asarray(m_ref)

    # --- global batch: each process contributes its (1, ...) slice ---
    def globalize(local_np, spec):
        sharding = NamedSharding(mesh, spec)
        gshape = (nproc * local_np.shape[0],) + local_np.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(local_np), gshape)

    g_coeffs = globalize(coeffs, P("dp", None, "sp", None, None))
    g_quant = globalize(quant, P("dp", None, None))
    g_pi0 = jax.tree.map(
        lambda leaf: globalize(np.asarray(leaf), P("dp", None, "sp", None)),
        pi0_local)

    step = make_sharded_eval(mesh, h, w)
    t0 = time.time()
    with mesh:
        dists, dmaps, _ = step(g_coeffs, g_quant, g_pi0)
        # cross-host reduction: replicated global max distance
        gmax = jax.jit(jnp.max,
                       out_shardings=NamedSharding(mesh, P()))(dists)
        gmax = float(np.asarray(gmax.addressable_data(0)))
    dt = time.time() - t0

    # own image's sharded results (addressable dp shard of this host)
    my_d = float(np.concatenate(
        [np.asarray(s.data).ravel() for s in dists.addressable_shards]).max())
    # diffmap rows of this host's image live across its sp devices
    my_rows = sorted(dmaps.addressable_shards, key=lambda s: s.index[1].start)
    my_map = np.concatenate([np.asarray(s.data)[0] for s in my_rows], axis=0)

    d_err = abs(my_d - float(d_ref[0]))
    m_err = float(np.max(np.abs(my_map - m_ref[0])))
    ok = d_err == 0.0 and m_err == 0.0 and gmax >= my_d
    print(json.dumps({
        "worker": process_id, "ok": bool(ok),
        "global_devices": n_global, "local_devices": n_local,
        "mesh": f"dp={n_global // sp} sp={sp}",
        "distance": my_d, "distance_vs_local_err": d_err,
        "diffmap_vs_local_maxerr": m_err,
        "global_max_distance": gmax, "eval_seconds": round(dt, 2),
    }), flush=True)
    if not ok:
        sys.exit(3)


def driver(nproc: int, sp: int, port: int) -> int:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in workers
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={sp}")
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker",
             "--process-id", str(pid), "--nproc", str(nproc),
             "--sp", str(sp), "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(REPO)))
    results, ok = [], True
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        for line in out.splitlines():
            # gloo/XLA sometimes write unterminated log fragments to
            # stdout that land on the same line — parse the leading
            # JSON object and ignore trailing bytes.
            if line.startswith("{"):
                try:
                    obj, _ = json.JSONDecoder().raw_decode(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(obj, dict) and "worker" in obj:
                    results.append(obj)
        if p.returncode != 0:
            ok = False
            sys.stderr.write(f"worker {pid} rc={p.returncode}\n"
                             + err[-2000:] + "\n")
    ok = ok and len(results) == nproc and all(r["ok"] for r in results)
    summary = {"ok": ok, "nproc": nproc, "sp": sp, "workers": results}
    (REPO / "benchmarks").mkdir(exist_ok=True)
    (REPO / "benchmarks" / "MULTIHOST.json").write_text(
        json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--port", type=int, default=PORT)
    args = ap.parse_args()
    if args.worker:
        worker(args.process_id, args.nproc, args.sp, args.port)
    else:
        sys.exit(driver(args.nproc, args.sp, args.port))


if __name__ == "__main__":
    main()
