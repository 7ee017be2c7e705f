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

def test_pallas_now_exact(setup):
    """The direct kernel is exact by construction: escaped (tile,
    candidate)s are sentinel-marked by L1 and recomputed by the cond-gated
    full-K L2 fixup, so the result matches the mirror to fp tolerance
    everywhere (any-hypothesis exactness)."""
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    got = np.asarray(
        ncc_volume.ncc_volume_cost_view(
            E, ref_pad, planes_cf, consts, K_slices, interpret=True
        )
    )
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, planes_cf, consts, K_slices)
    )
    assert np.max(np.abs(got - want)) < 1e-4, np.max(np.abs(got - want))


def test_fullk_and_l2_exact_on_random_depths(setup):
    """Random-depth hypotheses (the refinement combos 0/2) have per-pixel
    uniform slice indices — the worst case for any fetch band. Both the
    standalone full-K kernel and the direct kernel's L1+L2 scheme must
    match the mirror on them."""
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    H, W = planes_cf.shape[2], planes_cf.shape[3]
    rng = np.random.default_rng(7)
    x, y = geometry.pixel_grid(H, W)
    n_cam = planes_b[0, ..., :3]
    d_rand = jnp.asarray(rng.uniform(1.3, 9.5, (H, W)).astype(np.float32))
    w_r = geometry.dist_to_origin(gc.K[0], x, y, d_rand, n_cam)
    p_r = jnp.concatenate([n_cam, w_r[..., None]], -1)
    pcf = jnp.moveaxis(jnp.stack([p_r, planes_b[0]]), -1, 1)  # [2, 4, H, W]
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, pcf, consts, K_slices)
    )
    got_fullk = np.asarray(
        ncc_volume.ncc_volume_cost_view_fullk(
            E, ref_pad, pcf, consts, K_slices, interpret=True
        )
    )
    assert np.max(np.abs(got_fullk - want)) < 1e-4, np.max(np.abs(got_fullk - want))
    got_l12 = np.asarray(
        ncc_volume.ncc_volume_cost_view(
            E, ref_pad, pcf, consts, K_slices, interpret=True
        )
    )
    assert np.max(np.abs(got_l12 - want)) < 1e-4, np.max(np.abs(got_l12 - want))


def test_band2_fixup_partial_and_escalation(setup):
    """The L2a two-band kernel in isolation: with all-sentinel input it
    must exactly fix every sample covered by the two dynamic bands and
    leave the inter-band misses sentinel with the tile flagged for the
    full-K escalation (non-vacuous: a random-depth candidate spans nearly
    the whole K range per tile, so its middle slices MUST miss)."""
    import functools

    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    H, W = planes_cf.shape[2], planes_cf.shape[3]
    rng = np.random.default_rng(3)
    x, y = geometry.pixel_grid(H, W)
    n_cam = planes_b[0, ..., :3]
    d_rand = jnp.asarray(rng.uniform(1.3, 9.5, (H, W)).astype(np.float32))
    w_r = geometry.dist_to_origin(gc.K[0], x, y, d_rand, n_cam)
    p_r = jnp.concatenate([n_cam, w_r[..., None]], -1)
    pcf = jnp.moveaxis(jnp.stack([planes_b[0], p_r]), -1, 1)  # [2, 4, H, W]

    flags = jnp.ones(
        (H // ncc_volume.NCC_TILE_H, W // ncc_volume.TILE_W), jnp.int32
    )
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, pcf, consts, K_slices)
    )

    def band2(pcf_):
        C = pcf_.shape[0]
        kernel = functools.partial(
            ncc_volume._band2_kernel, num_slices=K_slices, num_cands=C,
            radius=5, increment=2,
        )
        cost1 = jnp.full((C, H, W), -1.0, jnp.float32)
        c2, f2 = ncc_volume._fixup_pallas(
            kernel, 2, flags, consts, pcf_, cost1, E, ref_pad, interpret=True
        )
        return np.asarray(c2), np.asarray(f2)

    # smooth oracle candidate alone: its group range fits the two bands
    # everywhere -> fully fixed, exact, no escalation
    c2s, f2s = band2(pcf[:1])
    assert np.all(c2s[0] >= 0.0)
    assert np.max(np.abs(c2s[0] - want[0])) < 1e-4
    assert not np.any(f2s)
    # mixed group with a random-depth candidate: the group range spans
    # nearly all of K, so inter-band samples must miss and escalate
    c2m, f2m = band2(pcf)
    assert np.any(c2m[1] < 0.0)
    assert np.any(f2m != 0)
    # every pixel band2 DID fix is exact (both candidates)
    for c in range(2):
        ok = c2m[c] >= 0.0
        assert np.max(np.abs(c2m[c][ok] - want[c][ok])) < 1e-4


def test_rebased_builder_matches_formula(setup):
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    PH, PW = E.shape[1], E.shape[2]
    rng = np.random.default_rng(0)
    base_k = jnp.asarray(rng.uniform(0, K_slices - 1, (PH, PW)).astype(np.float32))
    R, bf = ncc_volume.build_rebased_view(E, base_k, K_slices, interpret=True)
    J = (ncc_volume.J2_REBASE - 1) // 2
    b = np.clip(np.round(np.asarray(base_k)), J, K_slices - 1 - J).astype(np.int32)
    assert np.array_equal(np.asarray(bf), b.astype(np.float32))
    E_np = np.asarray(E)
    for j in [0, J, ncc_volume.J2_REBASE - 1]:
        want = np.take_along_axis(E_np, (b + j - J)[None], axis=0)[0]
        np.testing.assert_allclose(np.asarray(R[j]), want, rtol=1e-6)


def test_rebased_kernel_exact(setup):
    """The rebased fast path must produce byte-identical costs to the
    direct kernel / mirror — for bases near the hypotheses (fast path)
    AND for bases far away (exact per-tile fallback)."""
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    PH, PW = E.shape[1], E.shape[2]
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, planes_cf, consts, K_slices)
    )
    # base = the first candidate's own k field (the production choice):
    # candidate 0 fits R everywhere, candidates 1-2 partially escalate
    H, W = planes_cf.shape[2], planes_cf.shape[3]
    x, y = geometry.pixel_grid(H, W)
    d0 = geometry.depth_from_plane(gc.K[0], planes_b[0], x, y)
    u_min = consts[0, 4]
    du = consts[0, 5]
    k0 = jnp.clip((1.0 / d0 - u_min) / du, 0, K_slices - 1)
    base_k = jnp.pad(
        k0, ((ncc_volume.PAD_Y, PH - H - ncc_volume.PAD_Y),
             (ncc_volume.PAD_X, PW - W - ncc_volume.PAD_X)), mode="edge",
    )
    R, bf = ncc_volume.build_rebased_view(E, base_k, K_slices, interpret=True)
    got = np.asarray(
        ncc_volume.ncc_rebased_cost_view(
            R, bf, E, ref_pad, planes_cf, consts, K_slices, interpret=True
        )
    )
    assert np.max(np.abs(got - want)) < 1e-4, np.max(np.abs(got - want))
    # adversarial base: uniform mid-grid, far from most hypotheses ->
    # exercises the fallback heavily; must still be exact
    base_far = jnp.full((PH, PW), K_slices / 2.0, jnp.float32)
    R2, bf2 = ncc_volume.build_rebased_view(E, base_far, K_slices, interpret=True)
    got2 = np.asarray(
        ncc_volume.ncc_rebased_cost_view(
            R2, bf2, E, ref_pad, planes_cf, consts, K_slices, interpret=True
        )
    )
    assert np.max(np.abs(got2 - want)) < 1e-4, np.max(np.abs(got2 - want))


def test_sweep_kernel_exact(setup):
    """The sweep evaluator (rebased L1 at per-candidate band offsets,
    ops/ncc_volume "Sweep evaluator") must match the XLA mirror exactly:
    in-band candidates through the offset bands, out-of-band ones through
    the cond-gated L2 fixup. Candidates emulate a classify chunk: same
    normal field, depths at arithmetic disparity steps around a mid
    base."""
    gc, images, depths, E, ref_pad, consts, planes_b, planes_cf, K_slices, v = setup
    H, W = depths[0].shape
    from apdmvs_tpu import geometry as geo

    x, y = geo.pixel_grid(H, W)
    n_cam = planes_b[0, ..., :3]
    base_depth = jnp.asarray(np.where(depths[0] > 0, depths[0], 4.0))
    # arithmetic disparity steps (the classify sweep structure)
    fx = gc.K[0][0, 0]
    B = 1.0  # synthetic baseline scalar
    disp = fx * B / base_depth
    steps = jnp.asarray([-3.0, -1.0, 0.0, 2.0])
    d_s = fx * B / (disp[None] + steps[:, None, None])  # [C, H, W]
    ws = geo.dist_to_origin(gc.K[0], x, y, d_s, n_cam[None])
    pl_sweep = jnp.concatenate(
        [jnp.broadcast_to(n_cam[None], d_s.shape + (3,)), ws[..., None]], -1
    )
    pl_cf = jnp.moveaxis(pl_sweep, -1, 1)  # [C, 4, H, W]

    u_min, du = volume.inv_depth_grid(1.2, 9.6, K_slices)
    k = jnp.clip((1.0 / base_depth - u_min) / du, 0.0, K_slices - 1.0)
    base_k = jnp.pad(
        k, ((ncc_volume.PAD_Y,) * 2, (ncc_volume.PAD_X,) * 2), mode="edge"
    )
    R, bf = ncc_volume.build_rebased_view(
        E, base_k, K_slices, j2=ncc_volume.SWEEP_J2, interpret=True
    )
    got = np.asarray(
        ncc_volume.ncc_rebased_sweep_cost_view(
            R, bf, E, ref_pad, pl_cf, consts, K_slices, interpret=True
        )
    )
    want = np.asarray(
        ncc_volume.ncc_volume_cost_view_ref(E, ref_pad, pl_cf, consts, K_slices)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)
