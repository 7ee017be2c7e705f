"""Resident-column weak path (ops/cols.py): the gather kernel must match
its XLA reference, and the cols-based deformed/geom evaluators must match
the round-1 cost-volume fetch path (same volumes, same interpolation)."""

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, ncc, weak
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.ops import cols as colsmod
from apdmvs_tpu.params import PassConfig, RunState


def test_gather_rows_matches_ref():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.rand(500, 256).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 500, 200).astype(np.int32))
    got = np.asarray(colsmod.gather_rows(table, idx, interpret=True))
    want = np.asarray(colsmod.gather_rows_ref(table, idx))
    np.testing.assert_allclose(got, want)


def test_gather_rows_sorted_matches_ref():
    """Sorted-worklist variant: same outputs, dedup'd same-group DMAs.
    Covers dense runs (adjacent duplicates/neighbors in one 8-row group),
    jumps across groups, and — since sortedness is perf-only — an
    unsorted input too."""
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.rand(512, 256).astype(np.float32))
    dense = np.repeat(np.arange(40, 80), 4)  # heavy same-group sharing
    jumps = np.sort(rng.randint(0, 512, 100))
    unsorted = rng.randint(0, 512, 70)
    for idx_np in (dense, jumps, unsorted):
        idx = jnp.asarray(idx_np.astype(np.int32))
        got = np.asarray(colsmod.gather_rows_sorted(table, idx, interpret=True))
        want = np.asarray(colsmod.gather_rows_ref(table, idx))
        np.testing.assert_allclose(got, want)


def test_tent_and_nearest_lookup():
    rng = np.random.RandomState(1)
    cols = jnp.asarray(rng.rand(7, 16).astype(np.float32))
    k = jnp.asarray(rng.rand(7).astype(np.float32) * 20.0 - 2.0)  # incl. OOR
    got = np.asarray(colsmod.tent_lookup(cols, k))
    kc = np.clip(np.asarray(k), 0.0, 15.0)
    k0 = np.floor(kc).astype(int)
    k1 = np.minimum(k0 + 1, 15)
    f = kc - k0
    want = np.asarray(cols)[np.arange(7), k0] * (1 - f) + np.asarray(cols)[
        np.arange(7), k1
    ] * f
    np.testing.assert_allclose(got, want, rtol=1e-5)
    gotn = np.asarray(colsmod.nearest_lookup(cols, k))
    wantn = np.asarray(cols)[np.arange(7), np.round(kc).astype(int)]
    np.testing.assert_allclose(gotn, wantn)


def test_contract_lookup_kernel_matches_mirror():
    """The read-once multi-candidate contraction kernel (interpret mode)
    must match the tent/nearest mirrors on the transposed layout to
    <= 1 ulp (the tent's two products may fuse into an FMA differently
    between the lowerings; the sum itself has <= 2 nonzero terms, so
    order cannot change it). Nearest (one-hot, a single product) must be
    exact (round-5 ROADMAP perf #3 kernel)."""
    rng = np.random.RandomState(5)
    Vs, K, R, B = 3, 24, 640, 5
    cols_t = jnp.asarray(rng.rand(Vs, K, R).astype(np.float32))
    k = jnp.asarray((rng.rand(B, R) * 30.0 - 3.0).astype(np.float32))
    mirror = colsmod.tent_lookup(
        jnp.moveaxis(cols_t, 1, -1)[None], k[:, None, :]
    )
    got = np.asarray(colsmod.contract_lookup(cols_t, k, interpret=True))
    np.testing.assert_allclose(got, np.asarray(mirror), rtol=0, atol=1.2e-7)
    mirror_n = colsmod.nearest_lookup(
        jnp.moveaxis(cols_t, 1, -1)[None], k[:, None, :]
    )
    got_n = np.asarray(
        colsmod.contract_lookup(cols_t, k, nearest=True, interpret=True)
    )
    np.testing.assert_array_equal(got_n, np.asarray(mirror_n))
    # bf16 table (the production c36/c9 dtype)
    cols_b = cols_t.astype(jnp.bfloat16)
    mirror_b = colsmod.tent_lookup(
        jnp.moveaxis(cols_b, 1, -1)[None], k[:, None, :]
    )
    got_b = np.asarray(colsmod.contract_lookup(cols_b, k, interpret=True))
    np.testing.assert_allclose(
        got_b, np.asarray(mirror_b), rtol=0, atol=1.2e-7
    )


def _scene(H=96, W=256, V=3):
    cams, planes = synthetic.make_ring_scene(
        num_views=V, width=W, height=H, include_flat_region=True
    )
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    src_valid = jnp.asarray(np.arange(V) > 0)
    return gc, src_valid, images, depths, normals


def test_cols_deformed_matches_volume_fetch():
    H, W, V = 96, 256, 3
    gc, src_valid, images, depths, normals = _scene(H, W, V)
    cfg = PassConfig(
        state=RunState.REFINE_INIT, geom_consistency=False, use_APD=True,
        max_iterations=1, weak_peak_radius=6,
    )
    vols = ncc.build_volume_set(
        jnp.asarray(images), gc, 1.2, 9.6, num_slices=128,
        depth_maps=jnp.asarray(np.stack(depths)),
    )
    ctx = ncc.make_context(
        jnp.asarray(images), gc, src_valid,
        jnp.asarray(np.stack(depths)), volumes=vols,
    )

    rng = np.random.RandomState(0)
    N = 128
    wx = rng.randint(30, W - 30, N)
    wy = rng.randint(30, H - 30, N)
    weak_xy = jnp.asarray(np.stack([wx, wy], -1).astype(np.int32))
    ang = np.linspace(0, 2 * np.pi, 9)[:8]
    ax = np.clip((wx[:, None] + 12 * np.cos(ang)[None]).astype(np.int32), 6, W - 7)
    ay = np.clip((wy[:, None] + 12 * np.sin(ang)[None]).astype(np.int32), 6, H - 7)
    coords = np.concatenate(
        [np.stack([wx, wy], -1)[:, None], np.stack([ax, ay], -1)], axis=1
    ).astype(np.int32)
    # drop a few anchors to exercise the missing-anchor policy
    coords[: N // 4, 3:5] = -1
    anchors = weak.AnchorData(coords=jnp.asarray(coords))
    selected_grid = jnp.asarray(
        np.broadcast_to(np.asarray(src_valid)[:, None, None], (V, H, W))
    )

    n_grid = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    from apdmvs_tpu import sampling

    n_at = sampling.gather_grid(n_grid, jnp.asarray(wx), jnp.asarray(wy))
    d_at = jnp.asarray(
        np.where(depths[0][wy, wx] > 0, depths[0][wy, wx], 4.0).astype(np.float32)
    )
    x = jnp.asarray(wx.astype(np.float32))
    y = jnp.asarray(wy.astype(np.float32))
    w0 = geometry.dist_to_origin(gc.K[0], x, y, d_at, n_at)
    p0 = jnp.concatenate([n_at, w0[..., None]], -1)
    w1 = geometry.dist_to_origin(gc.K[0], x, y, d_at * 1.15, n_at)
    p1 = jnp.concatenate([n_at, w1[..., None]], -1)
    planes_b = jnp.stack([p0, p1])  # [2, N, 4]

    wcols = weak.build_weak_cols(ctx, weak_xy, anchors)
    got = np.asarray(
        weak.deformed_cost_vector(
            ctx, weak_xy, planes_b, anchors, selected_grid, cfg, wcols=wcols
        )
    )
    want = np.asarray(
        weak.deformed_cost_vector(
            ctx, weak_xy, planes_b, anchors, selected_grid, cfg
        )
    )
    # same volumes, same clamped 2-point interpolation -> near-identical
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert np.median(np.abs(got - want)) < 1e-3

    # single-plane (no batch dims) shape path
    got1 = np.asarray(
        weak.deformed_cost_vector(
            ctx, weak_xy, p0, anchors, selected_grid, cfg, wcols=wcols
        )
    )
    want1 = np.asarray(
        weak.deformed_cost_vector(ctx, weak_xy, p0, anchors, selected_grid, cfg)
    )
    np.testing.assert_allclose(got1, want1, atol=2e-2)

    # geometric costs: cols (nearest-slice depth-volume semantics) vs the
    # exact point evaluation — loose agreement where depths are valid
    geom_cols = np.asarray(
        weak._geom_cost_vector_cols(ctx, weak_xy, planes_b, wcols)
    )
    geom_exact = np.asarray(ncc.geom_cost_vector(ctx, planes_b, xs=x, ys=y))
    ok = (geom_exact[1:] < 2.9) & (geom_cols[1:] < 2.9)
    assert ok.mean() > 0.5
    diff = np.abs(geom_cols[1:] - geom_exact[1:])[ok]
    assert np.median(diff) < 0.25, np.median(diff)
