"""Batched/sharded scene runner: one jitted program per pass over the
device mesh, with device-resident inter-pass state (scene.run_scene_batched).
Runs over the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

from apdmvs_tpu import scene
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.io import formats

pytestmark = pytest.mark.slow  # scene-level end-to-end (fast tier: -m 'not slow')


def test_run_scene_batched(tmp_path):
    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(num_views=4, width=128, height=96)
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))

    ply = scene.run_scene_batched(
        folder, seed=0, n_view_shards=4, n_space_shards=2, verbose=False
    )
    assert os.path.exists(ply)
    coords, colors = formats.read_point_cloud(ply)
    assert coords.shape[0] > 2000, coords.shape
    d = np.full(coords.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((coords.astype(np.float64) - pl.p0) @ pl.n))
    assert np.median(d) < 0.04, np.median(d)
    assert np.mean(d < 0.1) > 0.8
    # checkpoint contract persisted
    dm = formats.read_bin_mat(os.path.join(folder, "APD", "00000000", "depths.dmb"))
    assert dm.shape == (96, 128)


def test_run_scene_batched_volumes(tmp_path):
    """The Pallas volume fast path in the batched runner (VERDICT item 4):
    view-only mesh, per-problem volume staging inside the sharded scan
    (parallel.sharded._volume_batched_pass). Interpret-mode Pallas on the
    CPU mesh; small scene to keep it fast."""
    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(num_views=4, width=128, height=96)
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))

    ply = scene.run_scene_batched(
        folder, seed=0, n_view_shards=4, n_space_shards=1, verbose=False,
        use_volumes=True, num_slices=64,
    )
    assert os.path.exists(ply)
    coords, colors = formats.read_point_cloud(ply)
    assert coords.shape[0] > 2000, coords.shape
    d = np.full(coords.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((coords.astype(np.float64) - pl.p0) @ pl.n))
    assert np.median(d) < 0.04, np.median(d)
    assert np.mean(d < 0.1) > 0.8


def test_run_scene_batched_multi_round(tmp_path):
    """Batched runner across a scale boundary (min_rounds=2): the prior
    state is resampled to the new pyramid level inside the runner
    (APD.cpp:552-581) and the APD weak machinery runs from round 1."""
    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(
        num_views=4, width=96, height=72, include_flat_region=True
    )
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))

    ply = scene.run_scene_batched(
        folder, seed=0, n_view_shards=4, n_space_shards=1, verbose=False,
        min_rounds=2,
    )
    assert os.path.exists(ply)
    coords, colors = formats.read_point_cloud(ply)
    assert coords.shape[0] > 1200, coords.shape
    d = np.full(coords.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((coords.astype(np.float64) - pl.p0) @ pl.n))
    assert np.median(d) < 0.05, np.median(d)


def test_volume_batched_matches_sequential_volumes(tmp_path):
    """Depth maps from the batched volume path match the sequential runner's
    volume path on the first (photometric) pass: same per-problem kernels,
    same keys, only the orchestration differs. XLA reassociates float
    accumulations differently under shard_map+scan than under plain jit, so
    the match is tolerance-level (<=2e-3 on ~5-unit depths), with the
    discrete decision fields required to agree almost everywhere."""
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, ncc, parallel, pipeline
    from apdmvs_tpu.params import PassConfig, RunState

    cams, planes = synthetic.make_ring_scene(num_views=4, width=128, height=96)
    images, depths, normals = synthetic.render_scene(cams, planes)
    V, H, W = images.shape
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)

    cfg = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=1,
    )
    N = 4  # one problem per view, each using the other 3 as sources
    imgs_b = np.zeros((N, V, H, W), np.float32)
    src_valid = np.zeros((N, V), bool)
    src_valid[:, 1:] = True
    Kb = np.zeros((N, V, 3, 3), np.float32)
    Rb = np.zeros((N, V, 3, 3), np.float32)
    tb = np.zeros((N, V, 3), np.float32)
    for i in range(N):
        order = [i] + [j for j in range(V) if j != i]
        imgs_b[i] = images[order]
        Kb[i], Rb[i], tb[i] = K[order], R[order], t[order]
    dmin = np.full((N, V), 2.0 * 0.6, np.float32)
    dmax = np.full((N, V), 8.0 * 1.2, np.float32)
    cams_b = geometry.make_cameras(
        Kb.reshape(-1, 3, 3), Rb.reshape(-1, 3, 3), tb.reshape(-1, 3),
        dmin.ravel(), dmax.ravel(),
    )
    cams_b = jax.tree.map(lambda x: x.reshape((N, V) + x.shape[1:]), cams_b)

    prior = pipeline.PassState(
        depth=jnp.zeros((N, H, W), jnp.float32),
        normal_world=jnp.zeros((N, H, W, 3), jnp.float32),
        pixel_state=jnp.zeros((N, H, W), jnp.uint8),
        selected=jnp.zeros((N, V, H, W), bool),
    )
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(N)])
    rth = jnp.full((N,), 0.01, jnp.float32)

    mesh = parallel.make_mesh(n_view=4, n_space=1)
    out_b = parallel.sharded_batch_pass(
        mesh, jnp.asarray(imgs_b), cams_b, jnp.asarray(src_valid), prior,
        keys, rth, cfg, weak_capacity=0, use_volumes=True, num_slices=64,
    )
    out_b = jax.block_until_ready(out_b)

    # sequential per-problem reference on the same volume fast path
    for i in range(N):
        cams_i = jax.tree.map(lambda x: x[i], cams_b)
        vols = ncc.build_volume_set(
            jnp.asarray(imgs_b[i]), cams_i, dmin[i, 0], dmax[i, 0],
            num_slices=64, weak_cost_volumes=False,
        )
        out_i = pipeline.patchmatch_pass_impl(
            jnp.asarray(imgs_b[i]), cams_i, jnp.asarray(src_valid[i]),
            jax.tree.map(lambda x: x[i], prior), keys[i], cfg, rth[i],
            weak_capacity=0, volumes=vols,
        )
        d_b = np.asarray(out_b.depth[i])
        d_i = np.asarray(out_i.depth)
        close = np.abs(d_b - d_i) <= 2e-3 + 1e-3 * np.abs(d_i)
        # a handful of near-tie argmin decisions may flip under the
        # reassociated accumulation; everything else must agree tightly
        assert np.mean(close) > 0.999, np.mean(close)
        assert np.max(np.abs(d_b - d_i)) < 0.5, np.max(np.abs(d_b - d_i))
        ps_b = np.asarray(out_b.pixel_state[i])
        ps_i = np.asarray(out_i.pixel_state)
        assert np.mean(ps_b == ps_i) > 0.999, np.mean(ps_b == ps_i)


def test_prebuilt_volumes_match_in_scan(tmp_path):
    """The once-per-scale stacked volume cache (build_batch_image_volumes +
    sharded_batch_pass(prebuilt=...)) produces bit-identical pass outputs to
    the in-scan per-problem rebuild: the volumes are the same arrays, only
    WHEN they are built differs (round-3 VERDICT next-round item 3)."""
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, parallel, pipeline
    from apdmvs_tpu.params import PassConfig, RunState

    cams, planes = synthetic.make_ring_scene(num_views=4, width=128, height=96)
    images, depths, normals = synthetic.render_scene(cams, planes)
    V, H, W = images.shape
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)

    cfg = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=1,
    )
    N = 4
    imgs_b = np.zeros((N, V, H, W), np.float32)
    src_valid = np.zeros((N, V), bool)
    src_valid[:, 1:] = True
    Kb = np.zeros((N, V, 3, 3), np.float32)
    Rb = np.zeros((N, V, 3, 3), np.float32)
    tb = np.zeros((N, V, 3), np.float32)
    for i in range(N):
        order = [i] + [j for j in range(V) if j != i]
        imgs_b[i] = images[order]
        Kb[i], Rb[i], tb[i] = K[order], R[order], t[order]
    dmin = np.full((N, V), 2.0 * 0.6, np.float32)
    dmax = np.full((N, V), 8.0 * 1.2, np.float32)
    cams_b = geometry.make_cameras(
        Kb.reshape(-1, 3, 3), Rb.reshape(-1, 3, 3), tb.reshape(-1, 3),
        dmin.ravel(), dmax.ravel(),
    )
    cams_b = jax.tree.map(lambda x: x.reshape((N, V) + x.shape[1:]), cams_b)
    prior = pipeline.PassState(
        depth=jnp.zeros((N, H, W), jnp.float32),
        normal_world=jnp.zeros((N, H, W, 3), jnp.float32),
        pixel_state=jnp.zeros((N, H, W), jnp.uint8),
        selected=jnp.zeros((N, V, H, W), bool),
    )
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(N)])
    rth = jnp.full((N,), 0.01, jnp.float32)
    mesh = parallel.make_mesh(n_view=4, n_space=1)

    from apdmvs_tpu.parallel.sharded import _batch_specs, put_sharded

    img_s, cams_s, _, _ = _batch_specs(mesh)
    imgs_d = put_sharded(mesh, jnp.asarray(imgs_b), img_s)
    cams_d = jax.tree.map(
        lambda x, s: put_sharded(mesh, x, s), cams_b, cams_s,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    with mesh:
        prebuilt = parallel.build_batch_image_volumes(
            imgs_d, cams_d, 64, mesh, weak_cost_volumes=False,
        )

    out_pb = parallel.sharded_batch_pass(
        mesh, imgs_d, cams_d, jnp.asarray(src_valid), prior, keys, rth, cfg,
        weak_capacity=0, use_volumes=True, num_slices=64, prebuilt=prebuilt,
    )
    out_scan = parallel.sharded_batch_pass(
        mesh, imgs_d, cams_d, jnp.asarray(src_valid), prior, keys, rth, cfg,
        weak_capacity=0, use_volumes=True, num_slices=64,
    )
    for a, b in zip(jax.tree_util.tree_leaves(out_pb),
                    jax.tree_util.tree_leaves(out_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # PARTIAL cache (round-5 per-problem granularity): a 2-view-shard mesh
    # with each shard's FIRST problem cached and the second rebuilt
    # in-scan must still be bit-identical to the full in-scan run
    mesh2 = parallel.make_mesh(n_view=2, n_space=1)
    img_s2, cams_s2, _, _ = _batch_specs(mesh2)
    imgs_d2 = put_sharded(mesh2, jnp.asarray(imgs_b), img_s2)
    cams_d2 = jax.tree.map(
        lambda x, s: put_sharded(mesh2, x, s), cams_b, cams_s2,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    sub = np.asarray([0, 2])  # each shard's first local problem (n_local=2)
    imgs_sub = put_sharded(mesh2, jnp.asarray(imgs_b[sub]), img_s2)
    cams_sub = jax.tree.map(
        lambda x, s: put_sharded(mesh2, jnp.asarray(np.asarray(x)[sub]), s),
        cams_b, cams_s2,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    with mesh2:
        pb_part = parallel.build_batch_image_volumes(
            imgs_sub, cams_sub, 64, mesh2, weak_cost_volumes=False,
        )
    out_part = parallel.sharded_batch_pass(
        mesh2, imgs_d2, cams_d2, jnp.asarray(src_valid), prior, keys, rth,
        cfg, weak_capacity=0, use_volumes=True, num_slices=64,
        prebuilt=pb_part,
    )
    out_scan2 = parallel.sharded_batch_pass(
        mesh2, imgs_d2, cams_d2, jnp.asarray(src_valid), prior, keys, rth,
        cfg, weak_capacity=0, use_volumes=True, num_slices=64,
    )
    for a, b in zip(jax.tree_util.tree_leaves(out_part),
                    jax.tree_util.tree_leaves(out_scan2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
