"""Epipolar plane-sweep volume: exactness of the depth-only warp identity
and the Pallas K-select sampler (ops/volume.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, ncc, sampling
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.ops import volume


def _setup():
    cams, planes = synthetic.make_ring_scene(num_views=2, width=256, height=192)
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(2, 1.2, np.float32), np.full(2, 9.6, np.float32)
    )
    return gc, images, depths, normals


def test_warp_depends_only_on_depth():
    """H(plane) p == F(p, depth_plane(p)): the warp of a pixel under any
    plane equals the warp under the fronto-parallel plane with the same
    depth along the ray (the identity the volume architecture rests on)."""
    gc, images, depths, normals = _setup()
    H, W = images.shape[1:]
    x, y = geometry.pixel_grid(H, W)
    rng = np.random.RandomState(0)
    # random tilted planes per pixel
    n = rng.randn(H, W, 3).astype(np.float32)
    n[..., 2] = -np.abs(n[..., 2]) - 0.5
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    depth = rng.uniform(2.0, 8.0, (H, W)).astype(np.float32)
    w = geometry.dist_to_origin(gc.K[0], x, y, jnp.asarray(depth), jnp.asarray(n))
    plane = jnp.concatenate([jnp.asarray(n), w[..., None]], axis=-1)

    Hm = geometry.homography(gc, 1, plane)
    hx, hy = geometry.apply_homography(Hm, x, y)

    wc = geometry.warp_constants(gc)
    dirs = geometry.pixel_dirs(gc.K[0], x, y)
    q = geometry.mat3_vec(wc.M[1], dirs) + wc.b[1] * (1.0 / jnp.asarray(depth))[..., None]
    fx = q[..., 0] / q[..., 2]
    fy = q[..., 1] / q[..., 2]
    np.testing.assert_allclose(np.asarray(hx), np.asarray(fx), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hy), np.asarray(fy), rtol=1e-4, atol=1e-3)


def test_volume_matches_direct_warp():
    """Sampling the volume at k(depth) approximates the direct warp sample
    to interpolation accuracy on a smooth image."""
    gc, images, depths, normals = _setup()
    H, W = images.shape[1:]
    K_slices = 192
    u_min, du = volume.inv_depth_grid(1.2, 9.6, K_slices)
    wc = geometry.warp_constants(gc)
    x, y = geometry.pixel_grid(H, W)
    dirs = geometry.pixel_dirs(gc.K[0], x, y)
    E = volume.build_volume(
        jnp.asarray(images[1]), wc.M[1], wc.b[1], dirs, u_min, du, K_slices
    )
    assert E.shape == (K_slices, H, W)

    depth = jnp.asarray(depths[0])
    safe = np.asarray(depths[0]) > 0
    k = volume.depth_to_slice(jnp.where(depth > 0, depth, 4.0), u_min, du)
    via_volume = np.asarray(volume.volume_sample_ref(E, k))

    q = geometry.mat3_vec(wc.M[1], dirs) + wc.b[1] * (
        1.0 / jnp.where(depth > 0, depth, 4.0)
    )[..., None]
    sx = q[..., 0] / q[..., 2]
    sy = q[..., 1] / q[..., 2]
    direct = np.asarray(sampling.bilinear_sample(jnp.asarray(images[1]), sx, sy))
    inb = (
        safe
        & (np.asarray(sx) > 1)
        & (np.asarray(sx) < W - 2)
        & (np.asarray(sy) > 1)
        & (np.asarray(sy) < H - 2)
    )
    err = np.abs(via_volume - direct)[inb]
    # intensities are 0..255; k-interpolation error stays small
    assert np.median(err) < 2.0, np.median(err)
    assert np.mean(err < 8.0) > 0.95, np.mean(err < 8.0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_sampler_matches_ref(dtype):
    rng = np.random.RandomState(1)
    K, H, W = 64, 16, 256
    E = jnp.asarray(rng.rand(K, H, W).astype(np.float32) * 255).astype(dtype)
    k = jnp.asarray(rng.uniform(-2, K + 2, (H, W)).astype(np.float32))
    got = np.asarray(volume.volume_sample(E, k, interpret=True))
    want = np.asarray(volume.volume_sample_ref(E, k))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-1)


@pytest.mark.parametrize("trunc", [False, True])
def test_pallas_builder_matches_xla(trunc):
    """build_volume_pallas (interpret) == build_volume_padded: the window-DMA
    kernel reproduces the XLA build exactly away from window-miss clamps,
    in both bilinear (image volumes) and trunc/nearest (depth volumes,
    APD.cu:770-772) modes."""
    gc, images, depths, normals = _setup()
    u_min, du = volume.inv_depth_grid(1.2, 9.6, 8)
    wc = geometry.warp_constants(gc)
    src = jnp.asarray(images[1][:64, :96])  # small: interpret mode is slow
    got = np.asarray(
        volume.build_volume_pallas(
            src, wc.M[1], wc.b[1], gc.K[0], 48, 128, u_min, du, 8,
            pad_y=8, pad_x=0, dtype=jnp.float32, trunc=trunc, interpret=True,
        ),
        np.float32,
    )
    want = np.asarray(
        volume.build_volume_padded(
            src, wc.M[1], wc.b[1], gc.K[0], 48, 128, u_min, du, 8,
            pad_y=8, pad_x=0, dtype=jnp.float32, trunc=trunc,
        ),
        np.float32,
    )
    # window-miss clamp divergence is confined to warps outside the DMA
    # window; on this geometry the interior matches to fp tolerance
    match = np.isclose(got, want, rtol=1e-3, atol=1e-2)
    assert np.mean(match) > 0.97, np.mean(match)
    assert np.mean(match[:, 8:56, 16:112]) > 0.995, np.mean(match[:, 8:56, 16:112])
