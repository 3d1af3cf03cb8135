"""Per-image device/mesh assignment for the optimizer's device calls.

Two parallel axes (SURVEY.md §2 parallelism inventory):

  dp — independent images on disjoint device groups. Batch mode assigns
       each image worker one row of the global ('dp', 'sp') mesh.
  sp — rows of ONE image's planes sharded over the worker's submesh.
       The comparator/engine place the psycho-image and coefficient
       grids with a row sharding; XLA GSPMD partitions the diffmap
       pipeline (halo exchanges for the blur cascade and Malta stencils,
       a cross-shard max for the distance) and replicates the small
       block-bookkeeping compute. Results are bitwise-identical to the
       unsharded run: spatial partitioning preserves per-pixel op order,
       f32 max is exact, and the entropy model sums are int32.

Usage:
    mesh = make_mesh(dp=4, sp=2)                 # global 2-D mesh
    with runtime.use_mesh(mesh): ...             # process/batch calls

Single-image calls under a ('dp', 'sp') mesh use its first row; a 1-D
('sp',) mesh is used directly. No mesh set -> default device, no
sharding (single-chip behavior, unchanged).
"""

from __future__ import annotations

import contextlib
import threading
from typing import List, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_tls = threading.local()
_global_mesh: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _global_mesh
    _global_mesh = mesh


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    global _global_mesh
    prev = _global_mesh
    _global_mesh = mesh
    try:
        yield
    finally:
        _global_mesh = prev


def global_mesh() -> Optional[Mesh]:
    return _global_mesh


def set_worker_mesh(mesh: Optional[Mesh]) -> None:
    """Thread-local override (batch-mode workers)."""
    _tls.mesh = mesh


def sp_submeshes(mesh: Mesh) -> List[Mesh]:
    """Rows of a ('dp', 'sp') mesh as 1-D ('sp',) submeshes."""
    if mesh.axis_names == ("sp",):
        return [mesh]
    assert mesh.axis_names == ("dp", "sp"), mesh.axis_names
    return [Mesh(row, ("sp",)) for row in mesh.devices]


def current_sp_mesh() -> Optional[Mesh]:
    """The ('sp',) mesh for THIS worker/thread, or None (no sharding)."""
    m = getattr(_tls, "mesh", None)
    if m is None:
        m = _global_mesh
    if m is None:
        return None
    if m.axis_names == ("sp",):
        return m
    return sp_submeshes(m)[0]


def shard_rows(x, mesh: Mesh, row_axis: int):
    """device_put with the given array axis sharded over ('sp',)."""
    spec = [None] * x.ndim
    spec[row_axis] = "sp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: replicate(x, mesh), tree)
