"""Space-sharded (row-slab) volume path vs the unsharded volume path.

The spaced layout stores per-shard HALOED row slabs (leading [S] axis)
and runs every volume kernel per-slab inside shard_map islands
(parallel/spaced.py rationale). On the CPU mesh the kernels route
through the XLA mirrors, so this validates the slab decomposition
itself: global-row warp consts (row0), exact baked halos, the
ownership-masked cols gather + psum, and the stitch-back — against the
unsharded path on identical inputs (round-3 VERDICT next-round item 4).
"""

import numpy as np
import pytest

from apdmvs_tpu.datasets import synthetic


def _scene(num_views=4, width=128, height=96):
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry

    cams, planes = synthetic.make_ring_scene(
        num_views=num_views, width=width, height=height,
        include_flat_region=True,
    )
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    V = num_views
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 2.0 * 0.6, np.float32), np.full(V, 8.0 * 1.2, np.float32)
    )
    src_valid = np.zeros(V, bool)
    src_valid[1:] = True
    return images, depths, normals, gc, jnp.asarray(src_valid)


def test_spaced_pass_matches_unsharded():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from apdmvs_tpu import ncc, pipeline
    from apdmvs_tpu.parallel import spaced
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    images, depths, normals, gc, src_valid = _scene()
    V, H, W = images.shape
    dmin, dmax = 2.0 * 0.6, 8.0 * 1.2
    imgs = jnp.asarray(images)
    dm = jnp.asarray(depths)
    ps = np.full((H, W), PixelState.STRONG, np.uint8)
    ps[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = PixelState.WEAK
    prior = pipeline.PassState(
        depth=jnp.asarray(depths[0]),
        normal_world=jnp.asarray(normals[0]),
        pixel_state=jnp.asarray(ps),
        selected=jnp.asarray(
            np.broadcast_to(np.asarray(src_valid)[:, None, None], (V, H, W))
        ),
    )
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=True,
        max_iterations=1, weak_peak_radius=4,
    )
    key = jax.random.PRNGKey(3)
    rth = jnp.asarray(0.00875, jnp.float32)
    cap = 2048

    vols_u = ncc.build_volume_set(
        imgs, gc, dmin, dmax, num_slices=48, depth_maps=dm
    )
    out_u = pipeline.patchmatch_pass(
        imgs, gc, src_valid, prior, key, cfg, rth,
        depth_maps=dm, weak_capacity=cap, volumes=vols_u,
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4), ("view", "space"))
    spaced.set_space_mesh(mesh)
    vols_s = ncc.build_volume_set_spaced(
        imgs, gc, dmin, dmax, mesh, num_slices=48, depth_maps=dm
    )
    assert vols_s.spaced and not vols_u.spaced
    with mesh:
        out_s = pipeline.patchmatch_pass(
            imgs, gc, src_valid, prior, key, cfg, rth,
            depth_maps=dm, weak_capacity=cap, volumes=vols_s,
        )

    # near-identical: the slab build's traced row offset reorders a few
    # f32 ops vs the constant-folded global grid, flipping ~0.003% of bf16
    # volume samples by one quantum — decision-level parity, like the
    # batched-vs-sequential bound
    ps_u = np.asarray(out_u.pixel_state)
    ps_s = np.asarray(out_s.pixel_state)
    assert np.mean(ps_u == ps_s) > 0.999, np.mean(ps_u == ps_s)
    du = np.asarray(out_u.depth)
    ds = np.asarray(out_s.depth)
    same = np.isclose(du, ds, rtol=2e-3, atol=2e-3)
    assert same.mean() > 0.995, same.mean()  # measured 0.9987: 16 candidate flips
    sel_u = np.asarray(out_u.selected)
    sel_s = np.asarray(out_s.selected)
    assert np.mean(sel_u == sel_s) > 0.995, np.mean(sel_u == sel_s)  # 0.9986 measured


def test_spaced_volumes_slabs_match_global():
    """The spaced builder's slabs are exactly the corresponding rows of the
    unsharded build (same warps at global coordinates, exact baked halos)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from apdmvs_tpu import ncc
    from apdmvs_tpu.ops import ncc_volume
    from apdmvs_tpu.parallel import spaced

    images, depths, normals, gc, src_valid = _scene(width=128, height=64)
    imgs = jnp.asarray(images)
    dmin, dmax = 2.0 * 0.6, 8.0 * 1.2
    S = 4
    mesh = Mesh(np.asarray(jax.devices()[:S]).reshape(1, S), ("view", "space"))
    spaced.set_space_mesh(mesh)
    vs_s = ncc.build_volume_set_spaced(
        imgs, gc, dmin, dmax, mesh, num_slices=32, weak_cost_volumes=False
    )
    vs_u = ncc.build_volume_set(
        imgs, gc, dmin, dmax, num_slices=32, weak_cost_volumes=False
    )
    Es = np.asarray(vs_s.E.astype(jnp.float32))  # [S, V, K, Hs+16, PW]
    Eu = np.asarray(vs_u.E.astype(jnp.float32))  # [V, K, Hp+16, PW]
    Hs = Es.shape[-2] - 2 * ncc_volume.PAD_Y
    for s in range(S):
        # global padded rows [s*Hs, s*Hs + Hs + 16) == slab rows
        if (s + 1) * Hs + 2 * ncc_volume.PAD_Y > Eu.shape[-2]:
            continue  # unsharded build padded to fewer rows
        d = np.abs(
            Es[s, 1:] - Eu[1:, :, s * Hs : s * Hs + Hs + 2 * ncc_volume.PAD_Y]
        )
        # traced-vs-folded f32 op order flips ~0.003% of bf16 samples by
        # one quantum; everything else must be bit-equal
        assert (d > 1.0).mean() == 0.0, d.max()
        assert (d > 0).mean() < 1e-4, (d > 0).mean()


def test_spaced_batched_pass_matches_unsharded_volumes():
    """sharded_batch_pass with use_volumes on a (view=1, space=4) mesh —
    the big-single-image regime — matches the (view=1, space=1) unsharded
    volume path at the decision level (same bf16-quantum caveat as the
    direct pass test)."""
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import parallel, pipeline
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    images, depths, normals, gc, src_valid = _scene(num_views=4)
    V, H, W = images.shape
    imgs_b = jnp.asarray(images)[None]  # [1, V, H, W]
    cams_b = jax.tree.map(lambda x: x[None], gc)
    sv_b = jnp.asarray(src_valid)[None]
    ps = np.full((H, W), PixelState.STRONG, np.uint8)
    ps[H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = PixelState.WEAK
    prior = pipeline.PassState(
        depth=jnp.asarray(depths[0])[None],
        normal_world=jnp.asarray(normals[0])[None],
        pixel_state=jnp.asarray(ps)[None],
        selected=jnp.asarray(
            np.broadcast_to(np.asarray(src_valid)[:, None, None], (V, H, W))
        )[None],
    )
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=False, use_APD=True,
        max_iterations=1, weak_peak_radius=4,
    )
    keys = jnp.stack([jax.random.PRNGKey(7)])
    rth = jnp.full((1,), 0.00875, jnp.float32)

    outs = {}
    for n_space in (1, 4):
        mesh = parallel.make_mesh(n_view=1, n_space=n_space)
        outs[n_space] = jax.block_until_ready(parallel.sharded_batch_pass(
            mesh, imgs_b, cams_b, sv_b, prior, keys, rth, cfg,
            weak_capacity=2048, use_volumes=True, num_slices=48,
        ))

    ps1 = np.asarray(outs[1].pixel_state[0])
    ps4 = np.asarray(outs[4].pixel_state[0])
    assert np.mean(ps1 == ps4) > 0.999, np.mean(ps1 == ps4)
    d1 = np.asarray(outs[1].depth[0])
    d4 = np.asarray(outs[4].depth[0])
    same = np.isclose(d1, d4, rtol=2e-3, atol=2e-3)
    assert same.mean() > 0.995, same.mean()


def test_composed_view_space_volumes_match_unsharded():
    """sharded_batch_pass with use_volumes on a COMBINED (view=2, space=2)
    mesh — problems sharded over 'view', each problem's volumes spaced
    row slabs over 'space' (round-5: the two regimes compose inside one
    shard_map; VERDICT r4 item 4) — matches the (view=1, space=1)
    unsharded volume path at the decision level (same bf16-quantum caveat
    as the other spaced tests)."""
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, parallel, pipeline
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    images, depths, normals, gc, src_valid = _scene(num_views=4)
    V, H, W = images.shape
    N = 2
    # two problems: ref views 0 and 1 (view sets rotated)
    orders = [[0, 1, 2, 3], [1, 2, 3, 0]]
    imgs_b = jnp.asarray(np.stack([images[o] for o in orders]))
    cams_b = jax.tree.map(
        lambda x: jnp.stack([jnp.asarray(np.asarray(x)[o]) for o in orders]),
        gc,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    sv_b = jnp.broadcast_to(jnp.asarray(src_valid), (N, V))
    ps = np.full((N, H, W), PixelState.STRONG, np.uint8)
    ps[:, H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = PixelState.WEAK
    prior = pipeline.PassState(
        depth=jnp.asarray(depths[:N]),
        normal_world=jnp.asarray(normals[:N]),
        pixel_state=jnp.asarray(ps),
        selected=jnp.broadcast_to(
            jnp.asarray(np.asarray(src_valid))[None, :, None, None],
            (N, V, H, W),
        ),
    )
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=True,
        max_iterations=1, weak_peak_radius=4,
    )
    keys = jnp.stack([jax.random.PRNGKey(11), jax.random.PRNGKey(12)])
    rth = jnp.full((N,), 0.00875, jnp.float32)
    all_depths = jnp.asarray(depths[:N])
    src_index = jnp.asarray(np.asarray(orders, np.int32) % N)

    outs = {}
    for n_view, n_space in ((1, 1), (2, 2)):
        mesh = parallel.make_mesh(n_view=n_view, n_space=n_space)
        outs[(n_view, n_space)] = jax.block_until_ready(
            parallel.sharded_batch_pass(
                mesh, imgs_b, cams_b, sv_b, prior, keys, rth, cfg,
                weak_capacity=2048, all_depths=all_depths,
                src_index=src_index, use_volumes=True, num_slices=48,
            )
        )

    ref = outs[(1, 1)]
    got = outs[(2, 2)]
    for i in range(N):
        ps1 = np.asarray(ref.pixel_state[i])
        ps2 = np.asarray(got.pixel_state[i])
        assert np.mean(ps1 == ps2) > 0.999, (i, np.mean(ps1 == ps2))
        d1 = np.asarray(ref.depth[i])
        d2 = np.asarray(got.depth[i])
        same = np.isclose(d1, d2, rtol=2e-3, atol=2e-3)
        assert same.mean() > 0.995, (i, same.mean())
