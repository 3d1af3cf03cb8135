"""Multi-process (multi-host analog) mesh execution.

Spawns 2 real OS processes wired with `jax.distributed.initialize` (the
same API a multi-host TPU pod uses), each owning 4 CPU devices of a
global ('dp', 'sp') mesh, and runs the sharded optimizer eval with
images data-parallel ACROSS processes and rows sharded within each
process (tools/multihost_demo.py). The cross-process collectives ride
gloo/TCP here, DCN on real pods.

Contract (SURVEY.md §2 parallelism inventory): per-image results are
bit-identical to a purely local single-device evaluation, and the
replicated cross-host max-distance reduction is correct.
"""
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_multihost_sharded_eval_parity():
    env = dict(os.environ)
    # workers configure their own device counts / platform
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
         "--nproc", "2", "--sp", "4", "--port", "29519"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"]
    assert len(summary["workers"]) == 2
    for rec in summary["workers"]:
        assert rec["global_devices"] == 8
        assert rec["local_devices"] == 4
        assert rec["distance_vs_local_err"] == 0.0
        assert rec["diffmap_vs_local_maxerr"] == 0.0
    gmax = max(r["distance"] for r in summary["workers"])
    assert all(r["global_max_distance"] == gmax
               for r in summary["workers"])
