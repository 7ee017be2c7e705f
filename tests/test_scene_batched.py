"""Batched/sharded scene runner: one jitted program per pass over the
device mesh, with device-resident inter-pass state (scene.run_scene_batched).
Runs over the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

from apdmvs_tpu import scene
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.io import formats


def test_run_scene_batched(tmp_path):
    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(num_views=4, width=128, height=96)
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))

    ply = scene.run_scene_batched(
        folder, seed=0, n_view_shards=4, n_space_shards=2, verbose=False
    )
    assert os.path.exists(ply)
    coords, colors = formats.read_point_cloud(ply)
    assert coords.shape[0] > 2000, coords.shape
    d = np.full(coords.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((coords.astype(np.float64) - pl.p0) @ pl.n))
    assert np.median(d) < 0.04, np.median(d)
    assert np.mean(d < 0.1) > 0.8
    # checkpoint contract persisted
    dm = formats.read_bin_mat(os.path.join(folder, "APD", "00000000", "depths.dmb"))
    assert dm.shape == (96, 128)
