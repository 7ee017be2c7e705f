"""Oracle tests for the NCC cost path (SURVEY.md §4 item 3).

- Ground-truth planes on consistent synthetic views must cost ~0.
- Wrong depths must cost clearly more.
- Grid mode and point mode must agree.
- The vectorized evaluator must match a direct NumPy replica of the
  reference NCC formula (APD.cu:530-614) on sample pixels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.datasets import synthetic


def _context(ring_scene, depth_maps=None):
    cams, planes, images, depths, normals = ring_scene
    K = np.stack([c.K for c in cams])
    R = np.stack([c.R for c in cams])
    t = np.stack([c.t for c in cams])
    gc = geometry.make_cameras(K, R, t, [2.0] * len(cams), [8.0] * len(cams))
    src_valid = np.zeros(len(cams), bool)
    src_valid[1:] = True
    return ncc.make_context(jnp.asarray(images), gc, src_valid, depth_maps), gc


def _gt_planes(ring_scene, gc):
    _, _, images, depths, normals = ring_scene
    H, W = depths.shape[1:]
    return geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0]), jnp.asarray(normals[0]), H, W
    )


def test_gt_plane_costs_low(ring_scene):
    ctx, gc = _context(ring_scene)
    planes = _gt_planes(ring_scene, gc)
    cost = ncc.ncc_cost_view(ctx, jnp.asarray(1), planes, radius=5, increment=2)
    cost = np.asarray(cost)
    _, _, _, depths, _ = ring_scene
    interior = np.zeros_like(cost, bool)
    interior[8:-8, 8:-8] = depths[0][8:-8, 8:-8] > 0
    assert np.median(cost[interior]) < 0.05
    assert np.mean(cost[interior] < 0.3) > 0.9


def test_wrong_depth_costs_high(ring_scene):
    ctx, gc = _context(ring_scene)
    _, _, _, depths, normals = ring_scene
    H, W = depths.shape[1:]
    wrong = geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0] * 1.25), jnp.asarray(normals[0]), H, W
    )
    cost = np.asarray(ncc.ncc_cost_view(ctx, jnp.asarray(1), wrong, radius=5, increment=2))
    gt_cost = np.asarray(
        ncc.ncc_cost_view(ctx, jnp.asarray(1), _gt_planes(ring_scene, gc), radius=5, increment=2)
    )
    interior = np.zeros_like(cost, bool)
    interior[8:-8, 8:-8] = depths[0][8:-8, 8:-8] > 0
    assert np.median(cost[interior]) > np.median(gt_cost[interior]) + 0.2


def test_point_mode_matches_grid_mode(ring_scene):
    ctx, gc = _context(ring_scene)
    planes = _gt_planes(ring_scene, gc)
    ys = jnp.asarray([20.0, 60.0, 90.0, 40.0])
    xs = jnp.asarray([30.0, 80.0, 120.0, 100.0])
    pl = planes[ys.astype(int), xs.astype(int)]
    c_pt = ncc.ncc_cost_view(ctx, jnp.asarray(2), pl, 5, 2, xs=xs, ys=ys)
    c_grid = ncc.ncc_cost_view(ctx, jnp.asarray(2), planes, 5, 2)
    c_grid_sel = np.asarray(c_grid)[np.asarray(ys, int), np.asarray(xs, int)]
    np.testing.assert_allclose(np.asarray(c_pt), c_grid_sel, atol=2e-3)


def _numpy_reference_ncc(images, Hm, px, py, radius, increment):
    """Direct NumPy replica of the reference NCC loop (APD.cu:552-611)."""

    def bilin(img, x, y):
        H, W = img.shape
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        wx, wy = x - x0, y - y0
        x0c, x1c = np.clip(x0, 0, W - 1), np.clip(x0 + 1, 0, W - 1)
        y0c, y1c = np.clip(y0, 0, H - 1), np.clip(y0 + 1, 0, H - 1)
        return (
            img[y0c, x0c] * (1 - wx) * (1 - wy)
            + img[y0c, x1c] * wx * (1 - wy)
            + img[y1c, x0c] * (1 - wx) * wy
            + img[y1c, x1c] * wx * wy
        )

    s = dict(r=0.0, rr=0.0, ss=0.0, s2=0.0, rs=0.0, n=0)
    for i in range(-radius, radius + 1, increment):
        for j in range(-radius, radius + 1, increment):
            q = Hm @ np.array([px + i, py + j, 1.0])
            sx, sy = q[0] / q[2], q[1] / q[2]
            ref_pix = float(images[0][np.clip(py + j, 0, images[0].shape[0] - 1),
                                      np.clip(px + i, 0, images[0].shape[1] - 1)])
            src_pix = float(bilin(images[1], sx, sy))
            s["r"] += ref_pix
            s["rr"] += ref_pix * ref_pix
            s["s2"] += src_pix
            s["ss"] += src_pix * src_pix
            s["rs"] += ref_pix * src_pix
            s["n"] += 1
    n = s["n"]
    mr, ms = s["r"] / n, s["s2"] / n
    var_r = s["rr"] / n - mr * mr
    var_s = s["ss"] / n - ms * ms
    if var_r < 1e-5 or var_s < 1e-5:
        return 2.0
    cov = s["rs"] / n - mr * ms
    return float(np.clip(1.0 - cov / np.sqrt(var_r * var_s), 0.0, 2.0))


def test_matches_numpy_reference_formula(ring_scene):
    ctx, gc = _context(ring_scene)
    planes = _gt_planes(ring_scene, gc)
    cost_grid = np.asarray(ncc.ncc_cost_view(ctx, jnp.asarray(1), planes, 5, 2))
    _, _, images, depths, _ = ring_scene
    for (py, px) in [(30, 40), (60, 80), (85, 110)]:
        if depths[0][py, px] <= 0:
            continue
        pl = planes[py, px]
        Hm = np.asarray(geometry.homography(gc, 1, pl))
        q = Hm @ np.array([px, py, 1.0])
        if not (0 <= q[0] / q[2] < 160 and 0 <= q[1] / q[2] < 120):
            continue
        expected = _numpy_reference_ncc(images, Hm, px, py, 5, 2)
        assert abs(cost_grid[py, px] - expected) < 5e-3, (py, px)


def test_initial_cost_and_views(ring_scene):
    ctx, gc = _context(ring_scene)
    planes = _gt_planes(ring_scene, gc)
    cost, selected = ncc.initial_cost_and_views(ctx, planes, 5, 2, top_k=4)
    cost = np.asarray(cost)
    selected = np.asarray(selected)
    _, _, _, depths, _ = ring_scene
    interior = np.zeros(cost.shape, bool)
    interior[8:-8, 8:-8] = depths[0][8:-8, 8:-8] > 0
    assert np.median(cost[interior]) < 0.1
    # view 0 (the ref itself) is never selected
    assert not selected[0].any()
    # most interior pixels select at least 2 views
    assert np.mean(np.sum(selected, axis=0)[interior] >= 2) > 0.9


def test_recost_selected_views(ring_scene):
    ctx, gc = _context(ring_scene)
    planes = _gt_planes(ring_scene, gc)
    _, sel = ncc.initial_cost_and_views(ctx, planes, 5, 2, top_k=4)
    cost, sel2 = ncc.recost_selected_views(ctx, planes, sel, 5, 2)
    assert np.asarray(sel2).sum() <= np.asarray(sel).sum()
    _, _, _, depths, _ = ring_scene
    interior = np.zeros(np.asarray(cost).shape, bool)
    interior[8:-8, 8:-8] = depths[0][8:-8, 8:-8] > 0
    assert np.median(np.asarray(cost)[interior]) < 0.1


def test_geom_cost_zero_for_consistent_depths(ring_scene):
    cams, planes_w, images, depths, normals = ring_scene
    ctx, gc = _context(ring_scene, depth_maps=jnp.asarray(depths))
    planes = _gt_planes(ring_scene, gc)
    g = np.asarray(ncc.geom_cost_view(ctx, jnp.asarray(1), planes))
    interior = np.zeros(g.shape, bool)
    interior[8:-8, 8:-8] = depths[0][8:-8, 8:-8] > 0
    # consistent GT depths reproject onto themselves (within a pixel)
    assert np.median(g[interior]) < 0.5
    # inconsistent (scaled) depths blow up
    _, _, _, d, n = ring_scene
    H, W = d.shape[1:]
    wrong = geometry.depth_normal_to_planes(gc, jnp.asarray(d[0] * 1.3), jnp.asarray(n[0]), H, W)
    g2 = np.asarray(ncc.geom_cost_view(ctx, jnp.asarray(1), wrong))
    assert np.median(g2[interior]) > np.median(g[interior]) + 0.5
