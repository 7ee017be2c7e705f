"""Volume-backed deformed NCC (cost-volume approximation) vs the exact
per-sample path: values must agree to approximation tolerance and the
oracle plane must keep winning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, ncc, weak
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PassConfig, PixelState, RunState


def test_deformed_volume_matches_exact():
    H, W = 96, 256
    cams, planes = synthetic.make_ring_scene(
        num_views=3, width=W, height=H, include_flat_region=True
    )
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(3, 1.2, np.float32), np.full(3, 9.6, np.float32)
    )
    src_valid = jnp.asarray([False, True, True])
    cfg = PassConfig(
        state=RunState.REFINE_INIT, geom_consistency=False, use_APD=True,
        max_iterations=1, weak_peak_radius=6,
    )

    vols = ncc.build_volume_set(jnp.asarray(images), gc, 1.2, 9.6, num_slices=128)
    assert vols.C36 is not None and vols.C9 is not None
    ctx_fast = ncc.make_context(jnp.asarray(images), gc, src_valid, volumes=vols)
    ctx_exact = ncc.make_context(jnp.asarray(images), gc, src_valid)

    # worklist: a grid of interior pixels with synthetic anchors around them
    rng = np.random.RandomState(0)
    N = 128
    wx = rng.randint(30, W - 30, N)
    wy = rng.randint(30, H - 30, N)
    weak_xy = jnp.asarray(np.stack([wx, wy], -1).astype(np.int32))
    # anchors: 8 ring points at radius ~12 around each pixel
    ang = np.linspace(0, 2 * np.pi, 9)[:8]
    ax = np.clip((wx[:, None] + 12 * np.cos(ang)[None]).astype(np.int32), 6, W - 7)
    ay = np.clip((wy[:, None] + 12 * np.sin(ang)[None]).astype(np.int32), 6, H - 7)
    coords = np.concatenate(
        [np.stack([wx, wy], -1)[:, None], np.stack([ax, ay], -1)], axis=1
    ).astype(np.int32)
    anchors = weak.AnchorData(coords=jnp.asarray(coords))
    selected_grid = jnp.asarray(
        np.broadcast_to(np.asarray(src_valid)[:, None, None], (3, H, W))
    )

    # candidates: oracle plane + perturbed
    x = jnp.asarray(wx.astype(np.float32))
    y = jnp.asarray(wy.astype(np.float32))
    n_grid = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    from apdmvs_tpu import sampling

    n_at = sampling.gather_grid(n_grid, jnp.asarray(wx), jnp.asarray(wy))
    d_at = jnp.asarray(
        np.where(depths[0][wy, wx] > 0, depths[0][wy, wx], 4.0).astype(np.float32)
    )
    w0 = geometry.dist_to_origin(gc.K[0], x, y, d_at, n_at)
    p0 = jnp.concatenate([n_at, w0[..., None]], -1)
    w1 = geometry.dist_to_origin(gc.K[0], x, y, d_at * 1.15, n_at)
    p1 = jnp.concatenate([n_at, w1[..., None]], -1)
    planes_b = jnp.stack([p0, p1])  # [2, N, 4]

    fast = np.asarray(
        weak.deformed_cost_vector(ctx_fast, weak_xy, planes_b, anchors, selected_grid, cfg)
    )  # [V, 2, N]
    exact = np.asarray(
        weak.deformed_cost_vector(ctx_exact, weak_xy, planes_b, anchors, selected_grid, cfg)
    )
    ok = (exact[1:] < 1.9) & (fast[1:] < 1.9)
    diff = np.abs(fast[1:] - exact[1:])[ok]
    assert np.median(diff) < 0.05, np.median(diff)
    assert np.mean(diff < 0.2) > 0.9, np.mean(diff < 0.2)
    # ranking: oracle beats the 15%-perturbed plane for most pixels
    for v in (1, 2):
        better = fast[v, 0] <= fast[v, 1] + 0.02
        assert better.mean() > 0.85, better.mean()


def test_weak_cost_rewrite_is_exact_plain_ncc():
    """The final weak-pixel cost rewrite (APD.cu:1499-1507) must be the
    *exact* plain NCC of the adopted plane — not the C36 cost-volume
    approximation — so strong and weak costs stay comparable in later
    sweeps (both sides evaluated by the same kernel)."""
    from apdmvs_tpu import sampling
    from apdmvs_tpu.propagation import StrongState

    H, W = 96, 256
    cams, scene_planes = synthetic.make_ring_scene(
        num_views=3, width=W, height=H, include_flat_region=True
    )
    images, depths, normals = synthetic.render_scene(cams, scene_planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(3, 1.2, np.float32), np.full(3, 9.6, np.float32)
    )
    src_valid = jnp.asarray([False, True, True])
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=False, use_APD=True,
        max_iterations=1, weak_peak_radius=2,
    )
    vols = ncc.build_volume_set(jnp.asarray(images), gc, 1.2, 9.6, num_slices=128)
    ctx_fast = ncc.make_context(jnp.asarray(images), gc, src_valid, volumes=vols)
    ctx_exact = ncc.make_context(jnp.asarray(images), gc, src_valid)

    rng = np.random.RandomState(1)
    N = 64
    wx = rng.randint(30, W - 30, N)
    wy = rng.randint(30, H - 30, N)
    weak_xy = jnp.asarray(np.stack([wx, wy], -1).astype(np.int32))
    ang = np.linspace(0, 2 * np.pi, 9)[:8]
    ax = np.clip((wx[:, None] + 14 * np.cos(ang)[None]).astype(np.int32), 6, W - 7)
    ay = np.clip((wy[:, None] + 14 * np.sin(ang)[None]).astype(np.int32), 6, H - 7)
    coords = np.concatenate(
        [np.stack([wx, wy], -1)[:, None], np.stack([ax, ay], -1)], axis=1
    ).astype(np.int32)
    anchors = weak.AnchorData(coords=jnp.asarray(coords))

    pixel_state = np.full((H, W), PixelState.STRONG, np.uint8)
    pixel_state[wy, wx] = PixelState.WEAK
    n_cam = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    d0 = jnp.asarray(np.where(depths[0] > 0, depths[0], 4.0).astype(np.float32))
    x, y = geometry.pixel_grid(H, W)
    w_grid = geometry.dist_to_origin(gc.K[0], x, y, d0, n_cam)
    planes_grid = jnp.concatenate([n_cam, w_grid[..., None]], -1)
    sel = jnp.asarray(np.broadcast_to(np.asarray(src_valid)[:, None, None], (3, H, W)))
    st = StrongState(
        planes=planes_grid,
        costs=jnp.full((H, W), 0.5, jnp.float32),
        selected=sel,
        view_weights=jnp.zeros((3, H, W), jnp.float32),
    )
    out = weak.propagate_weak(
        ctx_fast, st, jnp.asarray(pixel_state), weak_xy, anchors,
        jnp.asarray(0), jax.random.PRNGKey(3), cfg,
    )
    # recompute the exact weighted plain NCC of the adopted planes
    cv = np.asarray(ncc.cost_vector(ctx_exact, out.planes, 5, 2))  # [V, H, W]
    wts = np.asarray(out.view_weights)
    wsum = wts.sum(axis=0)
    expect = (wts * cv).sum(axis=0) / np.maximum(wsum, 1e-30)
    got = np.asarray(out.costs)
    updated = wsum[wy, wx] > 0
    assert updated.sum() > N // 2
    diff = np.abs(got[wy, wx] - expect[wy, wx])[updated]
    # only bf16 volume storage + slice interpolation separate the two
    assert np.median(diff) < 0.02, np.median(diff)
    assert np.mean(diff < 0.1) > 0.9, np.mean(diff < 0.1)
