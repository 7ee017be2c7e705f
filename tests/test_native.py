"""Native C++ fusion core vs the NumPy fallback (apdmvs_tpu/native).

The native path implements the reference's exact sequential greedy
source-marking (APD.cpp:955-959); the NumPy path approximates the
order-dependence, so counts may differ slightly — both must be dense and
metrically accurate on oracle inputs.
"""

import numpy as np
import pytest

from apdmvs_tpu import fusion, native
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PixelState


@pytest.fixture(scope="module")
def oracle_views():
    cams, planes = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    images, depths, normals = synthetic.render_scene(cams, planes)
    views = []
    for i, cam in enumerate(cams):
        bgr = np.repeat(
            np.clip(images[i], 0, 255).astype(np.uint8)[..., None], 3, axis=-1
        )
        views.append(
            fusion.FusionView(
                K=cam.K.astype(np.float64),
                R=cam.R.astype(np.float64),
                t=cam.t.astype(np.float64),
                image_bgr=bgr,
                depth=depths[i],
                normal=normals[i],
                weak=np.full(depths[i].shape, PixelState.STRONG, np.uint8),
            )
        )
    n = len(views)
    src_ids = [[j for j in range(n) if j != i] for i in range(n)]
    return views, src_ids, planes


def _plane_dist(points, planes):
    d = np.full(points.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((points.astype(np.float64) - pl.p0) @ pl.n))
    return d


def test_native_builds():
    assert native.available(), "g++ build of apd_native.cpp failed"


def test_native_eth_matches_numpy(oracle_views):
    views, src_ids, planes = oracle_views
    cn, coln = fusion.fuse_eth(views, src_ids, backend="native")
    cp, colp = fusion.fuse_eth(views, src_ids, backend="numpy")
    assert cn.shape[0] > 10000 and cp.shape[0] > 10000
    # greedy-order semantics differ slightly; counts must agree closely
    assert abs(cn.shape[0] - cp.shape[0]) / cp.shape[0] < 0.05
    assert np.median(_plane_dist(cn, planes)) < 0.01
    assert coln.dtype == np.uint8 and coln.shape == cn.shape


def test_native_tat_matches_numpy(oracle_views):
    views, src_ids, planes = oracle_views
    for advanced in (False, True):
        cn, _ = fusion.fuse_tat(views, src_ids, advanced=advanced, backend="native")
        cp, _ = fusion.fuse_tat(views, src_ids, advanced=advanced, backend="numpy")
        assert cn.shape[0] > 10000
        assert abs(cn.shape[0] - cp.shape[0]) / cp.shape[0] < 0.05
        assert np.median(_plane_dist(cn, planes)) < 0.01


def test_collision_heavy_backend_parity():
    """Numpy-vs-native parity where it is hardest: two source views at
    2.5x distance see the scene ~6x smaller, so many near-view reference
    pixels claim the SAME far-view source pixel and the greedy consumed-
    mask order actually matters. The numpy path's single acceptance
    recomputation must stay within 0.3% of the native sequential counts
    (measured 0.10%; divergence mechanism documented in fuse_eth)."""
    import dataclasses

    cams, planes = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    moved = []
    for i, c in enumerate(cams):
        if i >= 2:  # push back along the view direction
            center = -c.R.T @ c.t + c.R.T @ np.array([0.0, 0.0, -6.0])
            c = dataclasses.replace(c, t=(-c.R @ center).astype(c.t.dtype))
        moved.append(c)
    images, depths, normals = synthetic.render_scene(moved, planes)
    views = []
    for i, cam in enumerate(moved):
        bgr = np.repeat(
            np.clip(images[i], 0, 255).astype(np.uint8)[..., None], 3, -1
        )
        views.append(
            fusion.FusionView(
                K=cam.K.astype(np.float64), R=cam.R.astype(np.float64),
                t=cam.t.astype(np.float64), image_bgr=bgr, depth=depths[i],
                normal=normals[i],
                weak=np.full(depths[i].shape, PixelState.STRONG, np.uint8),
            )
        )
    n = len(views)
    src_ids = [[j for j in range(n) if j != i] for i in range(n)]
    cn, _ = fusion.fuse_eth(views, src_ids, backend="native")
    cp, _ = fusion.fuse_eth(views, src_ids, backend="numpy")
    assert cn.shape[0] > 20000
    assert abs(cn.shape[0] - cp.shape[0]) / cn.shape[0] < 0.003, (
        cn.shape[0], cp.shape[0])
