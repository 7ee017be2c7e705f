"""Multi-chip view-sharded execution on the virtual 8-device CPU mesh.

Validates (1) the sharded batched pass compiles and runs over a 2D
(view, space) mesh with real collectives, and (2) numerical equivalence
with the single-problem path under identical PRNG keys (the algorithm is
deterministic given a key, so sharding must not change results beyond
reduction-order noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apdmvs_tpu import geometry, parallel, pipeline
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PassConfig, PixelState, RunState


@pytest.fixture(scope="module")
def small_scene():
    cams, planes = synthetic.make_ring_scene(num_views=4, width=96, height=80)
    images, depths, normals = synthetic.render_scene(cams, planes)
    return cams, planes, images, depths, normals


def _problem_arrays(cams, images, order):
    """Build batched per-problem stacks: each problem sees its own view
    first, then the other views as sources."""
    V = len(order[0])
    N = len(order)
    imgs = np.stack([images[list(ids)] for ids in order])  # [N, V, H, W]
    K = np.stack([np.stack([cams[i].K for i in ids]) for ids in order])
    R = np.stack([np.stack([cams[i].R for i in ids]) for ids in order])
    t = np.stack([np.stack([cams[i].t for i in ids]) for ids in order])
    dmin = np.full((N, V), 2.0 * 0.6, np.float32)
    dmax = np.full((N, V), 8.0 * 1.2, np.float32)
    gc = jax.vmap(geometry.make_cameras)(
        jnp.asarray(K, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(dmin), jnp.asarray(dmax),
    )
    src_valid = np.zeros((N, V), bool)
    src_valid[:, 1:] = True
    return imgs.astype(np.float32), gc, src_valid


def test_sharded_first_init_matches_single(small_scene):
    cams, planes, images, depths, normals = small_scene
    N = 4
    order = [[i] + [j for j in range(N) if j != i] for i in range(N)]
    imgs, gc, src_valid = _problem_arrays(cams, images, order)
    _, V, H, W = imgs.shape

    cfg = PassConfig(
        state=RunState.FIRST_INIT, geom_consistency=False, use_APD=False,
        max_iterations=1, weak_peak_radius=6,
    )
    prior = pipeline.PassState(
        depth=jnp.zeros((N, H, W), jnp.float32),
        normal_world=jnp.zeros((N, H, W, 3), jnp.float32),
        pixel_state=jnp.full((N, H, W), PixelState.STRONG, jnp.uint8),
        selected=jnp.zeros((N, V, H, W), bool),
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(N, dtype=jnp.uint32))
    rth = jnp.full((N,), 0.005, jnp.float32)

    mesh = parallel.make_mesh(n_view=4, n_space=2)
    out = parallel.sharded_batch_pass(
        mesh, jnp.asarray(imgs), gc, jnp.asarray(src_valid), prior, keys, rth, cfg
    )
    batched_depth = np.asarray(out.depth)

    # single-problem reference with the identical key
    single = pipeline.patchmatch_pass_impl(
        jnp.asarray(imgs[0]),
        jax.tree.map(lambda x: x[0], gc),
        jnp.asarray(src_valid[0]),
        jax.tree.map(lambda x: x[0], prior),
        keys[0], cfg, rth[0],
    )
    single_depth = np.asarray(single.depth)

    gt = depths[0]
    interior = np.zeros_like(gt, bool)
    interior[10:-10, 10:-10] = gt[10:-10, 10:-10] > 0
    rel = np.abs(batched_depth[0] - gt)[interior] / gt[interior]
    assert np.median(rel) < 0.02, np.median(rel)
    # determinism across sharding: same key, same math
    mismatch = np.abs(batched_depth[0] - single_depth)
    assert np.mean(mismatch < 1e-3) > 0.99, np.mean(mismatch < 1e-3)


def test_sharded_geom_pass_with_depth_exchange(small_scene):
    """Geom pass: source depths come from the sharded [N, H, W] stack via a
    cross-shard gather (the collective replacing the reference's disk
    round-trip, APD.cpp:492-510)."""
    cams, planes, images, depths, normals = small_scene
    N = 4
    order = [[i] + [j for j in range(N) if j != i] for i in range(N)]
    imgs, gc, src_valid = _problem_arrays(cams, images, order)
    _, V, H, W = imgs.shape

    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=False,
        max_iterations=1, weak_peak_radius=4,
    )
    # prior = oracle depths/normals (stand-in for an earlier pass)
    prior = pipeline.PassState(
        depth=jnp.asarray(depths),
        normal_world=jnp.asarray(normals),
        pixel_state=jnp.full((N, H, W), PixelState.STRONG, jnp.uint8),
        selected=jnp.asarray(np.broadcast_to(src_valid[:, :, None, None], (N, V, H, W))),
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + N, dtype=jnp.uint32))
    rth = jnp.full((N,), 0.005, jnp.float32)
    all_depths = jnp.asarray(depths)  # problem i owns view i's depth
    src_index = jnp.asarray(np.array(order, np.int32))

    mesh = parallel.make_mesh(n_view=4, n_space=2)
    out = parallel.sharded_batch_pass(
        mesh, jnp.asarray(imgs), gc, jnp.asarray(src_valid), prior, keys, rth,
        cfg, all_depths=all_depths, src_index=src_index,
    )
    d = np.asarray(out.depth)
    for i in range(N):
        gt = depths[i]
        interior = np.zeros_like(gt, bool)
        interior[10:-10, 10:-10] = gt[10:-10, 10:-10] > 0
        rel = np.abs(d[i] - gt)[interior] / gt[interior]
        assert np.median(rel) < 0.01, (i, np.median(rel))


def test_weak_path_on_2d_mesh(small_scene):
    """APD weak machinery + spatial sharding on one (view, space) mesh.

    Regression for the XLA:CPU collective-scheduler deadlock: the weak
    worklist collectives and the spatial halo exchanges used to rendezvous
    in different orders on different devices and abort the process; the
    conftest serializes CPU collectives in program order (as a real TPU
    does natively), so this must now run to completion."""
    cams, planes, images, depths, normals = small_scene
    N = 4
    order = [[i] + [j for j in range(N) if j != i] for i in range(N)]
    imgs, gc, src_valid = _problem_arrays(cams, images, order)
    _, V, H, W = imgs.shape

    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=True,
        max_iterations=1, weak_peak_radius=4,
    )
    ps = np.full((N, H, W), PixelState.STRONG, np.uint8)
    ps[:, 10 : H - 10, 10 : W - 10] = PixelState.WEAK  # spans both space shards
    prior = pipeline.PassState(
        depth=jnp.asarray(depths),
        normal_world=jnp.asarray(normals),
        pixel_state=jnp.asarray(ps),
        selected=jnp.asarray(np.broadcast_to(src_valid[:, :, None, None], (N, V, H, W))),
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(N, dtype=jnp.uint32))
    rth = jnp.full((N,), 0.005, jnp.float32)

    mesh = parallel.make_mesh(n_view=4, n_space=2)
    out = parallel.sharded_batch_pass(
        mesh, jnp.asarray(imgs), gc, jnp.asarray(src_valid), prior, keys, rth,
        cfg, weak_capacity=2048, all_depths=jnp.asarray(depths),
        src_index=jnp.asarray(np.array(order, np.int32)),
    )
    d = np.asarray(out.depth)
    assert d.shape == (N, H, W) and np.isfinite(d[:, 8:-8, 8:-8]).all()


def test_shard_problems_padding():
    padded, owners = parallel.shard_problems(10, 4)
    assert padded == 12
    assert owners.shape == (12,)
    assert set(owners) == {0, 1, 2, 3}
