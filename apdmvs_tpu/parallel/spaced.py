"""Space-sharded (row-slab) plane-sweep volumes — trace-time mesh registry.

The volume fast path stores per-shard HALOED row slabs of every volume
(leading [S] axis sharded over the mesh's 'space' axis; halos are baked
at build time, so no runtime exchange is needed for the static volume
data). Each Pallas grid kernel then runs per-slab inside a shard_map
island while the rest of the pass stays under XLA's automatic SPMD
partitioner — pallas_call has no SPMD partitioning rule, so without the
islands XLA would have to replicate every kernel (defeating the memory
scaling that motivates spatial sharding: one view's volumes larger than
one chip's HBM, the reference's arbitrary-image-size-per-GPU capability,
APD.cpp:596-602).

The mesh is trace-static and cannot ride through jit arguments (a Mesh is
not a pytree leaf), so callers register it here before tracing:

    spaced.set_space_mesh(mesh)   # mesh with a 'space' axis
    vols = ncc.build_volume_set_spaced(...)
    out = jitted_pass(..., volumes=vols)
"""

from __future__ import annotations

import contextlib
from typing import Optional

_MESH = None
_INSIDE = False


def set_space_mesh(mesh) -> None:
    global _MESH
    _MESH = mesh


def space_mesh():
    if _MESH is None:
        raise RuntimeError(
            "spaced volumes require parallel.spaced.set_space_mesh(mesh) "
            "before tracing"
        )
    return _MESH


def maybe_space_mesh() -> Optional[object]:
    return _MESH


def space_size() -> int:
    return dict(zip(space_mesh().axis_names, space_mesh().devices.shape))["space"]


def inside_space_context() -> bool:
    """True while tracing INSIDE a shard_map whose manual axes include
    'space' (the combined view x space batched pass): the spaced helpers
    then run their bodies directly — jax.lax.axis_index('space') and the
    'space' collectives resolve against the enclosing manual context —
    instead of entering their own shard_map (nesting shard_maps over
    disjoint axis subsets segfaults on this JAX version; round 5)."""
    return _INSIDE


@contextlib.contextmanager
def space_manual_context():
    global _INSIDE
    prev = _INSIDE
    _INSIDE = True
    try:
        yield
    finally:
        _INSIDE = prev
