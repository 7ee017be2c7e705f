"""APD weak-texture path: classifier finds the textureless region, anchor
machinery recovers its depth (the paper's core claim; reference weak flow:
APD.cu:1750-1969, 1323-1508, 2272-2384)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, pipeline
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PassConfig, PixelState, RunState


@pytest.fixture(scope="module")
def flat_scene():
    cams, planes = synthetic.make_ring_scene(
        num_views=4, width=160, height=120, include_flat_region=True
    )
    images, depths, normals = synthetic.render_scene(cams, planes)
    return cams, planes, images, depths, normals


def _erode(mask, r):
    out = mask.copy()
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out &= np.roll(np.roll(mask, dy, 0), dx, 1)
    return out


def test_weak_classification_and_apd_recovery(flat_scene):
    cams, planes, images, depths, normals = flat_scene
    V = len(cams)
    H, W = images.shape[1:]
    K = np.stack([c.K for c in cams])
    R = np.stack([c.R for c in cams])
    t = np.stack([c.t for c in cams])
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 2.0 * 0.6, np.float32), np.full(V, 8.0 * 1.2, np.float32)
    )
    src_valid = np.zeros(V, bool)
    src_valid[1:] = True

    flat_mask = np.abs(images[0] - 128.0) < 1e-3
    flat_core = _erode(flat_mask, 8)
    assert flat_core.sum() > 200, flat_core.sum()  # sizeable weak region

    prior0 = pipeline.PassState(
        depth=jnp.zeros((H, W), jnp.float32),
        normal_world=jnp.zeros((H, W, 3), jnp.float32),
        pixel_state=jnp.full((H, W), PixelState.STRONG, jnp.uint8),
        selected=jnp.zeros((V, H, W), bool),
    )
    cfg0 = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=3, weak_peak_radius=6,
    )
    out0 = pipeline.patchmatch_pass(
        jnp.asarray(images), gc, jnp.asarray(src_valid), prior0,
        jax.random.PRNGKey(3), cfg0, jnp.asarray(0.005),
    )
    ps0 = np.asarray(out0.pixel_state)
    # the classifier must call (most of) the flat core WEAK/UNKNOWN
    non_strong = ps0[flat_core] != PixelState.STRONG
    assert non_strong.mean() > 0.6, non_strong.mean()
    # and mark a dominant fraction of the well-textured area STRONG
    tex = _erode(~flat_mask, 10)
    tex[:10] = tex[-10:] = False
    tex[:, :10] = tex[:, -10:] = False
    assert (ps0[tex] == PixelState.STRONG).mean() > 0.6

    # --- REFINE_INIT with the APD machinery on ---
    weak_count = int((ps0 == PixelState.WEAK).sum())
    assert weak_count > 100
    capacity = 1 << int(np.ceil(np.log2(weak_count)))
    prior1 = pipeline.PassState(
        depth=out0.depth, normal_world=out0.normal_world,
        pixel_state=out0.pixel_state, selected=out0.selected,
    )
    cfg1 = PassConfig(
        state=RunState.REFINE_INIT, geom_consistency=False, use_APD=True,
        max_iterations=3, weak_peak_radius=6, rotate_time=2,
    )
    out1 = pipeline.patchmatch_pass(
        jnp.asarray(images), gc, jnp.asarray(src_valid), prior1,
        jax.random.PRNGKey(4), cfg1, jnp.asarray(0.00875),
        weak_capacity=capacity,
    )

    gt = depths[0]
    weak_eval = flat_core & (gt > 0)
    e0 = np.abs(np.asarray(out0.depth) - gt)[weak_eval] / gt[weak_eval]
    e1 = np.abs(np.asarray(out1.depth) - gt)[weak_eval] / gt[weak_eval]
    # the APD pass must substantially fix the textureless region. 0.02:
    # with nearest-strong snapping active (APD.cu:1822-1828; a round-1
    # int32-overflow bug silently disabled it), near-radius probes snap to
    # weak-region *boundary* strong pixels exactly as the reference's do,
    # so single-pass anchors include boundary pixels whose FIRST_INIT
    # depths are less precise than far interior texture — the reference's
    # own regime; later geom passes refine further (test_scene end-to-end).
    assert np.median(e1) < 0.02, (np.median(e0), np.median(e1))
    assert np.median(e1) <= np.median(e0)
    # and not damage the strong areas
    strong_eval = tex & (gt > 0)
    es = np.abs(np.asarray(out1.depth) - gt)[strong_eval] / gt[strong_eval]
    assert np.median(es) < 0.01
