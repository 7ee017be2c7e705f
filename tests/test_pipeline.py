"""End-to-end single-pass tests: PatchMatch must recover oracle depth.

The algorithm is stochastic (SURVEY.md §7 item 5), so these assert metric
accuracy (median relative depth error), not bitwise values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, pipeline
from apdmvs_tpu.params import PassConfig, PixelState, RunState


def _setup(ring_scene):
    cams, planes, images, depths, normals = ring_scene
    K = np.stack([c.K for c in cams])
    R = np.stack([c.R for c in cams])
    t = np.stack([c.t for c in cams])
    V = len(cams)
    # reference applies 0.6/1.2 to the ref view's range (APD.cpp:454-455)
    dmin = np.full(V, 2.0 * 0.6, np.float32)
    dmax = np.full(V, 8.0 * 1.2, np.float32)
    gc = geometry.make_cameras(K, R, t, dmin, dmax)
    src_valid = np.zeros(V, bool)
    src_valid[1:] = True
    return gc, jnp.asarray(images), jnp.asarray(src_valid)


def _empty_prior(V, H, W):
    return pipeline.PassState(
        depth=jnp.zeros((H, W)),
        normal_world=jnp.zeros((H, W, 3)),
        pixel_state=jnp.full((H, W), PixelState.STRONG, jnp.uint8),
        selected=jnp.zeros((V, H, W), bool),
    )


def test_first_init_recovers_depth(ring_scene):
    cams, planes, images, depths, normals = ring_scene
    gc, imgs, src_valid = _setup(ring_scene)
    V, H, W = imgs.shape
    cfg = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=3, weak_peak_radius=6,
    )
    out = pipeline.patchmatch_pass(
        imgs, gc, src_valid, _empty_prior(V, H, W),
        jax.random.PRNGKey(0), cfg, jnp.asarray(0.005),
    )
    depth = np.asarray(out.depth)
    gt = depths[0]
    interior = np.zeros_like(gt, bool)
    interior[10:-10, 10:-10] = gt[10:-10, 10:-10] > 0
    rel_err = np.abs(depth - gt)[interior] / gt[interior]
    # PatchMatch on well-textured planes converges tightly in one pass
    assert np.median(rel_err) < 0.01, np.median(rel_err)
    assert np.mean(rel_err < 0.02) > 0.75, np.mean(rel_err < 0.02)
    # most interior pixels classify STRONG on this strongly-textured scene
    ps = np.asarray(out.pixel_state)
    assert np.mean(ps[interior] == PixelState.STRONG) > 0.5
    # border margin is UNKNOWN (APD.cu:1998-2004)
    assert (ps[:6, :] == PixelState.UNKNOWN).all()


def test_refine_iter_geom_improves(ring_scene):
    cams, planes, images, depths, normals = ring_scene
    gc, imgs, src_valid = _setup(ring_scene)
    V, H, W = imgs.shape
    cfg0 = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=3, weak_peak_radius=6,
    )
    out0 = pipeline.patchmatch_pass(
        imgs, gc, src_valid, _empty_prior(V, H, W),
        jax.random.PRNGKey(1), cfg0, jnp.asarray(0.005),
    )
    prior = pipeline.PassState(
        depth=out0.depth,
        normal_world=out0.normal_world,
        pixel_state=out0.pixel_state,
        selected=out0.selected,
    )
    # geom pass with oracle src depths (stand-in for other views' estimates)
    cfg1 = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=False,
        max_iterations=3, weak_peak_radius=4,
    )
    out1 = pipeline.patchmatch_pass(
        imgs, gc, src_valid, prior,
        jax.random.PRNGKey(2), cfg1, jnp.asarray(0.005),
        depth_maps=jnp.asarray(depths),
    )
    gt = depths[0]
    interior = np.zeros_like(gt, bool)
    interior[10:-10, 10:-10] = gt[10:-10, 10:-10] > 0
    e0 = np.abs(np.asarray(out0.depth) - gt)[interior] / gt[interior]
    e1 = np.abs(np.asarray(out1.depth) - gt)[interior] / gt[interior]
    assert np.median(e1) <= np.median(e0) * 1.5  # no degradation
    assert np.median(e1) < 0.01


def test_clamp_outputs():
    V, H, W = 2, 8, 8
    out = pipeline.PassOutputs(
        depth=jnp.full((H, W), 10.0),
        normal_world=jnp.zeros((H, W, 3)),
        pixel_state=jnp.full((H, W), PixelState.STRONG, jnp.uint8),
        selected=jnp.zeros((V, H, W), bool),
        costs=jnp.zeros((H, W)),
    )
    clamped = pipeline.clamp_outputs(out, 1.0, 5.0)
    assert (np.asarray(clamped.depth) == 0).all()
    assert (np.asarray(clamped.pixel_state) == PixelState.UNKNOWN).all()


def test_selected_bitmask_roundtrip():
    rng = np.random.RandomState(0)
    sel = rng.rand(5, 4, 6) > 0.5
    sel[0] = False
    mask = pipeline.selected_to_bitmask(sel)
    back = pipeline.bitmask_to_selected(mask, 5)
    np.testing.assert_array_equal(back, sel)
