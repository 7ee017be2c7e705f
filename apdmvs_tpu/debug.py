"""Debug probe persistence — the reference's compiled-out DEBUG_NEIGHBOUR /
DEBUG_COST_LINE probes (reference: main.h:42-43) as runtime-selectable
dumps.

The reference, when recompiled with the defines on, writes
``neighbour_map.bin`` + ``neighbour.bin`` (the weak worklist and its anchor
coordinates, APD.cu:2421-2438) and fills a per-pixel 61-step disparity cost
buffer (APD.cu:2084-2091) that is dumped for the DEBUG_POINT row. Here the
same artifacts come out of a normal pass run with ``debug=True``
(pipeline.DebugProbes) — no recompile, same file formats, so existing
reference tooling can read them.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

from apdmvs_tpu.io import formats
from apdmvs_tpu.params import NEIGHBOUR_NUM

#: Reference probe pixel (main.h:40-41); override per call.
DEBUG_POINT_X = 753
DEBUG_POINT_Y = 259


def dump_probes(
    result_folder: str,
    probes,
    height: int,
    width: int,
    line_y: Optional[int] = None,
) -> None:
    """Persist a pass's DebugProbes next to its checkpoint files.

    - ``neighbour_map.bin``: int32 [H, W], worklist index per weak pixel,
      -1 elsewhere (the reference's ``neighbours_map``, APD.cpp:526-538).
    - ``neighbour.bin``: the reference's exact binary layout
      (int32 weak_count, int32 NEIGHBOUR_NUM, int16 (x, y) pairs;
      APD.cu:2427-2435).
    - ``weak_cost_line.dmb``: [61, W] float sweep at row ``line_y``
      (clamped DEBUG_POINT_Y default) — the DEBUG_COST_LINE curve for
      every pixel of that row.
    """
    os.makedirs(result_folder, exist_ok=True)
    sweep = np.asarray(probes.sweep)  # [61, H, W]
    y = min(DEBUG_POINT_Y if line_y is None else line_y, height - 1)
    formats.write_bin_mat(
        os.path.join(result_folder, "weak_cost_line.dmb"),
        sweep[:, y, :].astype(np.float32),
    )

    if probes.weak_xy is None or probes.anchor_coords is None:
        return
    weak_xy = np.asarray(probes.weak_xy)  # [N, 2], -1 padded
    coords = np.asarray(probes.anchor_coords)  # [N, 9, 2]
    alive = weak_xy[:, 0] >= 0
    weak_count = int(alive.sum())

    nb_map = np.full((height, width), -1, np.int32)
    live_idx = np.nonzero(alive)[0]
    nb_map[weak_xy[live_idx, 1], weak_xy[live_idx, 0]] = np.arange(
        weak_count, dtype=np.int32
    )
    formats.write_bin_mat(os.path.join(result_folder, "neighbour_map.bin"), nb_map)

    pairs = coords[live_idx].astype(np.int16)  # [weak_count, 9, 2] (x, y)
    with open(os.path.join(result_folder, "neighbour.bin"), "wb") as f:
        f.write(struct.pack("<ii", weak_count, NEIGHBOUR_NUM))
        f.write(pairs.tobytes())


def read_neighbours(path: str):
    """Read a ``neighbour.bin`` (ours or the reference's): returns
    int16 array [weak_count, NEIGHBOUR_NUM, 2] of (x, y) anchor coords."""
    with open(path, "rb") as f:
        weak_count, num = struct.unpack("<ii", f.read(8))
        data = np.frombuffer(f.read(weak_count * num * 4), np.int16)
    return data.reshape(weak_count, num, 2)
