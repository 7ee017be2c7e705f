"""Fused NCC-over-volume kernel (ops/ncc_volume.py): the Pallas kernel
must match its XLA mirror, and both must match the direct-warp NCC
evaluator (ncc.cost_vector) to interpolation accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.ops import ncc_volume, volume


@pytest.fixture(scope="module")
def setup():
    H, W = 96, 256  # multiples of (8, 128)
    cams, planes = synthetic.make_ring_scene(num_views=3, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(3, 1.2, np.float32), np.full(3, 9.6, np.float32)
    )
    wc = geometry.warp_constants(gc)
    K_slices = 160
    u_min, du = volume.inv_depth_grid(1.2, 9.6, K_slices)
    v = 1  # source view under test
    E = volume.build_volume_padded(
        jnp.asarray(images[v]), wc.M[v], wc.b[v], gc.K[0], H, W, u_min, du,
        K_slices, ncc_volume.PAD_Y, ncc_volume.PAD_X, dtype=jnp.float32,
    )
    ref_pad = jnp.pad(
        jnp.asarray(images[0]),
        ((ncc_volume.PAD_Y, ncc_volume.PAD_Y), (ncc_volume.PAD_X, ncc_volume.PAD_X)),
        mode="edge",
    )
    consts = ncc_volume.pack_consts(gc.K[0], wc.M[v], wc.b[v], u_min, du, W, H)

    # candidate plane fields: the oracle planes + two perturbations
    x, y = geometry.pixel_grid(H, W)
    n_cam = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    depth = jnp.asarray(np.where(depths[0] > 0, depths[0], 4.0))
    w0 = geometry.dist_to_origin(gc.K[0], x, y, depth, n_cam)
    p0 = jnp.concatenate([n_cam, w0[..., None]], -1)
    w1 = geometry.dist_to_origin(gc.K[0], x, y, depth * 1.06, n_cam)
    p1 = jnp.concatenate([n_cam, w1[..., None]], -1)
    w2 = geometry.dist_to_origin(gc.K[0], x, y, depth * 0.9, n_cam)
    p2 = jnp.concatenate([n_cam, w2[..., None]], -1)
    planes_b = jnp.stack([p0, p1, p2])  # [3, H, W, 4]
    planes_cf = jnp.moveaxis(planes_b, -1, 1)  # [3, 4, H, W]
    return gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v


def test_xla_mirror_matches_direct_ncc(setup):
    """Volume-based NCC (XLA mirror) vs direct-warp NCC: interpolation-level
    agreement, and the oracle plane must win."""
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    got = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, planes_cf, consts, K_slices)
    )
    ctx = ncc.make_context(
        jnp.asarray(images), gc, jnp.asarray([False, True, True])
    )
    want = np.stack(
        [np.asarray(ncc.ncc_cost_view(ctx, v, planes_b[c], 5, 2)) for c in range(3)]
    )
    inner = np.zeros(got.shape[1:], bool)
    inner[10:-10, 10:-10] = True
    valid = inner & (want[0] < 1.9) & (got[0] < 1.9)
    diff = np.abs(got - want)[:, valid].ravel() if valid.ndim == 2 else None
    diff = np.abs(got[:, valid] - want[:, valid])
    assert np.median(diff) < 0.02, np.median(diff)
    assert np.mean(diff < 0.1) > 0.95, np.mean(diff < 0.1)
    # ranking: oracle plane must beat the perturbed ones almost everywhere
    frac_best = np.mean(
        (got[0][valid] <= got[1][valid] + 0.02) & (got[0][valid] <= got[2][valid] + 0.02)
    )
    assert frac_best > 0.9, frac_best


def test_pallas_matches_xla_mirror(setup):
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    got = np.asarray(
        ncc_volume.ncc_volume_cost_view(
            E, ref_pad, planes_cf, consts, K_slices, interpret=True
        )
    )
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, planes_cf, consts, K_slices)
    )
    # sub-band clamping can differ for extreme-tilt pixels; almost all match
    diff = np.abs(got - want)
    assert np.mean(diff < 0.01) > 0.97, np.mean(diff < 0.01)
    assert np.median(diff) < 1e-3
