"""Device mesh setup.

The framework's parallel axes (the DP/SP analogs of an ML framework — the
reference is single-threaded, SURVEY.md section 2 'Parallelism inventory'):

  dp  — data parallel over independent images (the on-mesh analog of the
        reference test-suite's `xargs -P nproc` fan-out)
  sp  — spatial ("sequence") parallel inside one image: rows of the pixel /
        coefficient planes are sharded; XLA GSPMD inserts the halo
        exchanges the blur cascade and Malta stencils need, and the final
        max-reduce becomes a cross-shard collective.

Multi-host: `initialize_distributed()` wires jax.distributed so the same
mesh spans hosts (ICI within a slice, DCN across).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(dp: Optional[int] = None, sp: Optional[int] = None,
              devices=None) -> Mesh:
    """2-D ('dp', 'sp') mesh. Defaults: all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"{dp}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, 3, H, W) images: batch over dp, rows over sp."""
    return NamedSharding(mesh, P("dp", None, "sp", None))


def batch_plane_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W) planes."""
    return NamedSharding(mesh, P("dp", "sp", None))


def batch_coeff_sharding(mesh: Mesh) -> NamedSharding:
    """(B, 3, nby, nbx, 64) coefficient tensors: block rows over sp."""
    return NamedSharding(mesh, P("dp", None, "sp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
