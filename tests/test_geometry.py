"""Unit tests for the geometry core against closed-form multi-view identities.

Strategy per SURVEY.md §4 item 1: validate homography/projection/plane math
on synthetic cameras where the expected values are derivable independently.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry
from apdmvs_tpu.datasets import synthetic


def _cams_from_synth(cams):
    K = np.stack([c.K for c in cams])
    R = np.stack([c.R for c in cams])
    t = np.stack([c.t for c in cams])
    return geometry.make_cameras(K, R, t, [2.0] * len(cams), [8.0] * len(cams))


def test_camera_center_roundtrip(ring_scene):
    cams, _, _, _, _ = ring_scene
    gc = _cams_from_synth(cams)
    for i, c in enumerate(cams):
        np.testing.assert_allclose(np.asarray(gc.c[i]), c.c, rtol=1e-5, atol=1e-5)


def test_plane_depth_roundtrip():
    """depth -> plane w -> depth is identity (APD.cu:187-209 pair)."""
    K = jnp.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    x = jnp.array([37.0, 80.0, 10.0])
    y = jnp.array([12.0, 60.0, 100.0])
    depth = jnp.array([3.0, 4.5, 6.1])
    n = jnp.array([[0.1, -0.2, -0.97], [0.0, 0.0, -1.0], [0.3, 0.3, -0.9]])
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    w = geometry.dist_to_origin(K, x, y, depth, n)
    plane = jnp.concatenate([n, w[:, None]], axis=-1)
    depth2 = geometry.depth_from_plane(K, plane, x, y)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth), rtol=1e-5)


def test_backproject_project_roundtrip(ring_scene):
    cams, _, _, depths, _ = ring_scene
    gc = _cams_from_synth(cams)
    H, W = depths.shape[1:]
    x, y = geometry.pixel_grid(H, W)
    X = geometry.backproject_world(x, y, jnp.asarray(depths[0]), gc.K[0], gc.R[0], gc.c[0])
    px, py, d = geometry.project_camera(X, gc.K[0], gc.R[0], gc.t[0])
    valid = depths[0] > 0
    np.testing.assert_allclose(np.asarray(px)[valid], np.asarray(x)[valid], atol=1e-2)
    np.testing.assert_allclose(np.asarray(py)[valid], np.asarray(y)[valid], atol=1e-2)
    np.testing.assert_allclose(np.asarray(d)[valid], depths[0][valid], rtol=1e-4)


def test_homography_maps_plane_points(ring_scene):
    """For a pixel on a known world plane, the plane-induced homography must
    agree with explicit backproject->project through the source camera
    (APD.cu:303-372)."""
    cams, planes, _, depths, normals = ring_scene
    gc = _cams_from_synth(cams)
    H_img, W_img = depths.shape[1:]
    # pick pixels with valid depth on the first plane
    ys, xs = np.nonzero(depths[0] > 0)
    pick = slice(0, len(xs), max(1, len(xs) // 50))
    x = jnp.asarray(xs[pick], jnp.float32)
    y = jnp.asarray(ys[pick], jnp.float32)
    depth = jnp.asarray(depths[0][ys[pick], xs[pick]])
    n_world = jnp.asarray(normals[0][ys[pick], xs[pick]])
    n_cam = geometry.normal_world_to_cam(gc.R[0], n_world)
    w = geometry.dist_to_origin(gc.K[0], x, y, depth, n_cam)
    plane = jnp.concatenate([n_cam, w[:, None]], axis=-1)

    for src in range(1, 3):
        Hm = geometry.homography(gc, src, plane)
        hx, hy = geometry.apply_homography(Hm, x, y)
        # explicit reprojection
        X = geometry.backproject_world(x, y, depth, gc.K[0], gc.R[0], gc.c[0])
        px, py, _ = geometry.project_camera(X, gc.K[src], gc.R[src], gc.t[src])
        np.testing.assert_allclose(np.asarray(hx), np.asarray(px), atol=0.05)
        np.testing.assert_allclose(np.asarray(hy), np.asarray(py), atol=0.05)


def test_warp_constants_match_full_homography(ring_scene):
    """A/b decomposition must reproduce the full H (geometry docstring)."""
    cams, _, _, depths, normals = ring_scene
    gc = _cams_from_synth(cams)
    wc = geometry.warp_constants(gc)
    x = jnp.array([40.0, 100.0])
    y = jnp.array([30.0, 80.0])
    depth = jnp.array([3.5, 4.2])
    n_cam = jnp.array([[0.1, 0.1, -0.98], [-0.2, 0.0, -0.97]])
    n_cam = n_cam / jnp.linalg.norm(n_cam, axis=-1, keepdims=True)
    w = geometry.dist_to_origin(gc.K[0], x, y, depth, n_cam)
    plane = jnp.concatenate([n_cam, w[:, None]], axis=-1)
    src = 2
    Hm = geometry.homography(gc, src, plane)
    dirs = geometry.pixel_dirs(gc.K[0], x, y)
    n_dot_dir = jnp.sum(n_cam * dirs, axis=-1)
    Hp = geometry.mat3_vec(wc.M[src], dirs) - wc.b[src][None, :] * (
        n_dot_dir / w
    )[:, None]
    hx, hy = geometry.apply_homography(Hm, x, y)
    np.testing.assert_allclose(np.asarray(Hp[:, 0] / Hp[:, 2]), np.asarray(hx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Hp[:, 1] / Hp[:, 2]), np.asarray(hy), rtol=1e-4)

    # and the column-increment identities H@e0, H@e1
    plane_b = plane[0]
    Hm_b = geometry.homography(gc, src, plane_b)
    he0 = (wc.M[src][:, 0] - wc.b[src] * plane_b[0] / plane_b[3]) * wc.inv_fx
    he1 = (wc.M[src][:, 1] - wc.b[src] * plane_b[1] / plane_b[3]) * wc.inv_fy
    np.testing.assert_allclose(np.asarray(he0), np.asarray(Hm_b[:, 0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(he1), np.asarray(Hm_b[:, 1]), rtol=1e-4)


def test_normal_transforms_inverse():
    R = np.linalg.qr(np.random.RandomState(0).randn(3, 3))[0].astype(np.float32)
    n = jnp.array([0.3, -0.5, 0.8])
    n = n / jnp.linalg.norm(n)
    back = geometry.normal_world_to_cam(jnp.asarray(R), geometry.normal_cam_to_world(jnp.asarray(R), n))
    np.testing.assert_allclose(np.asarray(back), np.asarray(n), atol=1e-6)


def test_depth_normal_plane_roundtrip(ring_scene):
    cams, _, _, depths, normals = ring_scene
    gc = _cams_from_synth(cams)
    H, W = depths.shape[1:]
    planes = geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0]), jnp.asarray(normals[0]), H, W
    )
    d2, n2 = geometry.planes_to_depth_normal(gc, planes, H, W)
    valid = depths[0] > 0
    np.testing.assert_allclose(np.asarray(d2)[valid], depths[0][valid], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(n2)[valid], normals[0][valid], atol=1e-4)
