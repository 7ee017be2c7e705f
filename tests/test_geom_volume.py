"""Depth-volume geometric-consistency kernel vs the XLA direct evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.datasets import synthetic


def test_geom_volume_matches_direct():
    H, W = 96, 256
    cams, planes = synthetic.make_ring_scene(num_views=3, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(3, 1.2, np.float32), np.full(3, 9.6, np.float32)
    )
    src_valid = jnp.asarray([False, True, True])
    dm = jnp.asarray(depths)

    vols = ncc.build_volume_set(
        jnp.asarray(images), gc, 1.2, 9.6, num_slices=160, depth_maps=dm
    )
    ctx_fast = ncc.make_context(jnp.asarray(images), gc, src_valid, dm, volumes=vols)
    ctx_slow = ncc.make_context(jnp.asarray(images), gc, src_valid, dm)

    x, y = geometry.pixel_grid(H, W)
    n_cam = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    depth = jnp.asarray(np.where(depths[0] > 0, depths[0], 4.0))
    w0 = geometry.dist_to_origin(gc.K[0], x, y, depth, n_cam)
    p0 = jnp.concatenate([n_cam, w0[..., None]], -1)
    w1 = geometry.dist_to_origin(gc.K[0], x, y, depth * 1.4, n_cam)
    p1 = jnp.concatenate([n_cam, w1[..., None]], -1)
    planes_b = jnp.stack([p0, p1])

    got = np.asarray(ncc.geom_cost_vector(ctx_fast, planes_b))  # [V, 2, H, W]
    want = np.asarray(ncc.geom_cost_vector(ctx_slow, planes_b))

    inner = np.zeros((H, W), bool)
    inner[10:-10, 10:-10] = True
    # oracle plane: both paths must report near-zero geometric error
    assert np.median(got[1, 0][inner]) < 0.2, np.median(got[1, 0][inner])
    assert np.median(want[1, 0][inner]) < 0.2
    # heavily perturbed plane: both paths must penalize it and agree
    assert np.median(want[1, 1][inner]) > 0.5, np.median(want[1, 1][inner])
    assert np.median(got[1, 1][inner]) > 0.5 * np.median(want[1, 1][inner])
    # agreement on the oracle plane (k-quantization adds <~1px)
    valid = inner & (want[1, 0] < 2.9) & (got[1, 0] < 2.9)
    diff = np.abs(got[1, 0][valid] - want[1, 0][valid])
    assert np.median(diff) < 0.3, np.median(diff)
