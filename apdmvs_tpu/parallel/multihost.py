"""Multi-host (multi-process) execution: jax.distributed + host-level
problem assignment.

The reference scales across GPUs by hand-launching N processes with
different ``gpu_index`` argv values and NO coordination (SURVEY.md §2.8,
reference main.cpp:148-153) — each process must be given a disjoint scene.
Here multi-host is first-class (VERDICT round-1 item 5):

- ``maybe_initialize()`` wires ``jax.distributed.initialize`` from either
  explicit env vars (``APD_COORDINATOR``, ``APD_NUM_PROCESSES``,
  ``APD_PROCESS_ID``) or JAX's cluster auto-detection (TPU pods, SLURM).
  After it runs, ``jax.devices()`` is the GLOBAL device list and the
  (view, space) mesh built by ``parallel.make_mesh`` spans all hosts, so
  XLA places the cross-view depth all-gather on ICI within a slice and
  DCN across slices automatically — no code change in the pass itself.

- ``global_batch()`` turns per-host numpy inputs into global jax.Arrays
  via ``jax.make_array_from_callback``: every host materializes only the
  shards it owns (host-level problem assignment). The scene folder lives
  on a shared filesystem (the reference's own deployment assumption), so
  any host *can* read any image; this just avoids redundant IO + HBM.

- ``addressable_problems()`` tells the runner which problem rows this
  host must persist, keeping the checkpoint/resume file contract intact
  with each file written by exactly one host.

Single-process runs hit none of this machinery: ``maybe_initialize`` is a
no-op and ``global_batch`` degenerates to ``jax.device_put``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if multi-process execution is requested.

    Priority: explicit args > APD_* env vars > JAX auto-detection (only
    when JAX_COORDINATOR_ADDRESS is set, so plain single-host runs never
    block on a rendezvous). Returns True iff running multi-process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coord = coordinator_address or os.environ.get("APD_COORDINATOR")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["APD_NUM_PROCESSES"])
        if "APD_NUM_PROCESSES" in os.environ
        else None
    )
    pid = process_id if process_id is not None else (
        int(os.environ["APD_PROCESS_ID"])
        if "APD_PROCESS_ID" in os.environ
        else None
    )
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        _INITIALIZED = True
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()  # cluster auto-detection
        _INITIALIZED = True
    return _INITIALIZED and jax.process_count() > 1


def global_batch(mesh: Mesh, spec: P, host_array: np.ndarray) -> jax.Array:
    """A global array sharded per ``spec``, fed from per-host data.

    ``host_array`` is the FULL global-shape numpy array (scene folders are
    on a shared FS, so every host can build it); only the slices owned by
    this host's devices are actually uploaded. For single-process meshes
    this is exactly ``jax.device_put``.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx]
    )


def addressable_problems(mesh: Mesh, num_padded: int) -> np.ndarray:
    """Indices of problem rows whose 'view'-axis shards live on THIS host.

    The batched runner persists the checkpoint files (depths.dmb etc.)
    only for these rows, so each file is written by exactly one host.
    """
    sharding = NamedSharding(mesh, P("view"))
    dummy = jax.ShapeDtypeStruct((num_padded,), np.int32)
    rows: set[int] = set()
    for dev, idx in sharding.devices_indices_map(dummy.shape).items():
        if dev.process_index == jax.process_index():
            sl = idx[0]
            rows.update(range(*sl.indices(num_padded)))
    return np.array(sorted(rows), np.int64)


def fetch_rows(global_array: jax.Array, rows: Sequence[int]) -> dict:
    """Host copies of the given problem rows (leading-axis indices) from a
    'view'-sharded global array — only addressable shards are touched (no
    cross-host pulls). Rows may additionally be space-sharded; the pieces
    are reassembled here, which requires every space shard of an owned row
    to live on this host (make_mesh lays devices out row-major, so
    consecutive — same-host — devices fill the space axis and this holds
    whenever n_space divides the per-host device count)."""
    want = {int(r) for r in rows}
    out: dict = {}
    row_shape = global_array.shape[1:]
    for shard in global_array.addressable_shards:
        vsl = shard.index[0]
        rest = tuple(shard.index[1:])
        data = None
        for local_i, global_i in enumerate(
            range(*vsl.indices(global_array.shape[0]))
        ):
            if global_i in want:
                if data is None:
                    data = np.asarray(shard.data)
                buf = out.setdefault(
                    global_i, np.empty(row_shape, global_array.dtype)
                )
                buf[rest] = data[local_i]
    return out
