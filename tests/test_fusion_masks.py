"""ROI block masks in fusion (reference: APD.cpp:848-852 loads optional
blocks/mask_<id>.jpg per view; pixels with mask value < 128 are skipped as
reference pixels).

Covers both backends (native C++ core and the NumPy fallback): an all-keep
mask is a no-op, a fully-masked view contributes no points, and a
half-masked view only emits points from its kept region.
"""

import numpy as np
import pytest

from apdmvs_tpu import fusion
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PixelState

BACKENDS = ["numpy", "native"]


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
    return views, src_ids


def _with_blocks(views, blocks):
    return [
        fusion.FusionView(
            K=v.K, R=v.R, t=v.t, image_bgr=v.image_bgr, depth=v.depth,
            normal=v.normal, weak=v.weak, block=b,
        )
        for v, b in zip(views, blocks)
    ]


def _project_x(view, X):
    xc = X @ view.R.T + view.t
    return (xc @ view.K[0]) / (xc @ view.K[2])


@pytest.mark.parametrize("backend", BACKENDS)
def test_allkeep_mask_is_noop(oracle_views, backend):
    views, src_ids = oracle_views
    if backend == "native":
        from apdmvs_tpu import native

        if not native.available():
            pytest.skip("native core unavailable")
    H, W = views[0].depth.shape
    keep = [np.full((H, W), 255, np.uint8) for _ in views]
    c0, col0 = fusion.fuse_eth(views, src_ids, backend=backend)
    c1, col1 = fusion.fuse_eth(_with_blocks(views, keep), src_ids, backend=backend)
    assert c0.shape == c1.shape
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(col0, col1)


@pytest.mark.parametrize("backend", BACKENDS)
def test_half_mask_restricts_ref_pixels(oracle_views, backend):
    views, src_ids = oracle_views
    if backend == "native":
        from apdmvs_tpu import native

        if not native.available():
            pytest.skip("native core unavailable")
    H, W = views[0].depth.shape
    # only view 0 may emit points, and only from its left half
    blocks = [np.zeros((H, W), np.uint8) for _ in views]
    blocks[0][:, : W // 2] = 255
    coords, _ = fusion.fuse_eth(_with_blocks(views, blocks), src_ids, backend=backend)
    assert coords.shape[0] > 500  # the kept half still fuses densely
    px = _project_x(views[0], coords.astype(np.float64))
    # every accepted point backprojects from view 0's kept (left) half;
    # trunc(x+0.5) pixel convention => allow the half-pixel boundary
    assert np.all(px < W // 2 - 0.5 + 1.0)


@pytest.mark.parametrize("backend", BACKENDS)
def test_fully_masked_scene_is_empty(oracle_views, backend):
    views, src_ids = oracle_views
    if backend == "native":
        from apdmvs_tpu import native

        if not native.available():
            pytest.skip("native core unavailable")
    H, W = views[0].depth.shape
    blocks = [np.zeros((H, W), np.uint8) for _ in views]
    coords, colors = fusion.fuse_eth(_with_blocks(views, blocks), src_ids, backend=backend)
    assert coords.shape[0] == 0 and colors.shape[0] == 0
