"""Persistent-compile-cache hygiene.

XLA:CPU caches AOT-compiled machine code keyed only by the HLO, not the
host CPU's feature set; restoring a cache populated on a different
machine logs `cpu_aot_loader` feature-mismatch errors and can SIGILL
(observed when the harness host changed between rounds — ROADMAP.md
round-2 note). `ensure_cache_dir` stamps the cache directory with a
fingerprint of the host CPU and wipes the cache when the fingerprint
changes, so every consumer (tests, tools, bench) gets a safe cache with
one call.

The TPU cache (.jax_cache) stores device executables for the tunneled
chip, not host code — host CPU changes don't poison it.
"""

from __future__ import annotations

import hashlib
import pathlib
import platform
import shutil


def _host_fingerprint() -> str:
    bits = [platform.machine(), platform.system()]
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
        bits.append(hashlib.sha256(flags.encode()).hexdigest()[:16])
    except OSError:
        pass
    return "-".join(bits)


def ensure_cache_dir(path: pathlib.Path, host_code: bool = True
                     ) -> pathlib.Path:
    """Create `path` if needed; if host_code, purge it when the host CPU
    fingerprint differs from the one it was populated under."""
    path = pathlib.Path(path)
    path.mkdir(exist_ok=True)
    if host_code:
        stamp = path / "HOST_FINGERPRINT"
        fp = _host_fingerprint()
        old = stamp.read_text().strip() if stamp.exists() else None
        if old is not None and old != fp:
            shutil.rmtree(path)
            path.mkdir()
        if old != fp:
            stamp.write_text(fp + "\n")
    return path
