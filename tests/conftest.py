"""Test config: force CPU JAX with 8 virtual devices so multi-chip sharding
tests run anywhere, per SURVEY.md section 4."""

import os

# Force CPU with 8 virtual devices. The environment's sitecustomize already
# imported jax and pinned JAX_PLATFORMS=axon (the real-TPU tunnel), so env
# vars are too late — use the config API.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: repeat suite runs skip the jit compiles
# (untracked — first run after a fresh checkout pays them once). The
# guard purges it when the host CPU changed (stale AOT code can SIGILL).
import pathlib as _pathlib
import sys as _sys
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))
from guetzli_tpu.cache_guard import ensure_cache_dir as _ensure_cache
_cache = ensure_cache = _ensure_cache(
    _pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE = REPO / "tools" / "ref_oracle" / "build" / "oracle"
DATA = pathlib.Path(__file__).resolve().parent / "data"


@pytest.fixture(scope="session")
def oracle():
    """Path to the reference-oracle binary; builds it on first use."""
    if not ORACLE.exists():
        subprocess.run([str(REPO / "tools" / "ref_oracle" / "build.sh")],
                       check=True)
    return str(ORACLE)


@pytest.fixture(scope="session")
def bees_rgb():
    from PIL import Image
    im = Image.open(DATA / "bees.png").convert("RGB")
    return np.asarray(im)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
