"""View-sharded batched PatchMatch over a 2D (view, space) device mesh.

Design (SURVEY.md §2.8 "TPU-native equivalents"):

- **view axis (DP analogue)**: the batch of N reference-view problems is
  sharded across chips; every chip runs full PatchMatch for its shard.
- **space axis (SP analogue)**: image rows are additionally sharded, so a
  single large view can span chips; XLA inserts halo/gather collectives for
  the checkerboard propagation and warp gathers.
- **cross-view depth exchange**: geometric-consistency passes read other
  views' freshly-estimated depth maps. The reference round-trips these
  through the filesystem (APD.cpp:492-510); here the [N, H, W] depth stack
  is sharded over 'view' and each problem gathers its source views' depths
  with a global take — XLA turns that into an all-gather over ICI.

Everything is plain ``jax.jit`` with ``NamedSharding`` annotations: XLA's
SPMD partitioner places the collectives (the scaling-book recipe) rather
than hand-written ``ppermute`` schedules.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apdmvs_tpu import pipeline
from apdmvs_tpu.geometry import Cameras
from apdmvs_tpu.params import PassConfig


def make_mesh(
    n_view: Optional[int] = None, n_space: int = 1, devices=None
) -> Mesh:
    """A (view, space) mesh. Defaults to all devices on the view axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_view is None:
        n_view = len(devices) // n_space
    devs = np.array(devices[: n_view * n_space]).reshape(n_view, n_space)
    return Mesh(devs, ("view", "space"))


def put_sharded(mesh: Mesh, x, spec):
    """Host array -> global sharded device array under ``spec``.

    Multi-host: host inputs (and process-local arrays, e.g. eagerly
    computed keys) are identical on every process — a shared-FS scene —
    so upload only this host's shards; arrays already global (the
    device-resident prior/depths/volume cache) pass through."""
    if jax.process_count() > 1:
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            from apdmvs_tpu.parallel import multihost

            return multihost.global_batch(mesh, spec, np.asarray(x))
        return x
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_problems(num_problems: int, n_shards: int) -> Tuple[int, np.ndarray]:
    """Pad the problem count to a multiple of the view-shard count and
    return (padded_n, owner shard per problem)."""
    padded = ((num_problems + n_shards - 1) // n_shards) * n_shards
    owners = np.arange(padded) % n_shards
    return padded, owners


def _batch_specs(mesh: Mesh):
    """PartitionSpecs for the batched pass inputs/outputs."""
    img = P("view", None, "space", None)  # [N, V, H, W]
    plane2d = P("view", "space", None)  # [N, H, W]
    vec3 = P("view", "space", None, None)  # [N, H, W, 3]
    sel = P("view", None, "space", None)  # [N, V, H, W]
    cams = Cameras(
        K=P("view"), R=P("view"), t=P("view"), c=P("view"),
        depth_min=P("view"), depth_max=P("view"),
    )
    prior = pipeline.PassState(
        depth=plane2d, normal_world=vec3, pixel_state=plane2d, selected=sel
    )
    out = pipeline.PassOutputs(
        depth=plane2d, normal_world=vec3, pixel_state=plane2d,
        selected=sel, costs=plane2d,
    )
    return img, cams, prior, out


@functools.partial(
    jax.jit, static_argnames=("cfg", "weak_capacity", "use_geom")
)
def _batched_pass(
    images: jax.Array,  # [N, V, H, W]
    cams: Cameras,  # fields [N, V, ...]
    src_valid: jax.Array,  # [N, V]
    prior: pipeline.PassState,  # fields [N, ...]
    keys: jax.Array,  # [N, 2]
    ransac_threshold: jax.Array,  # [N]
    all_depths: jax.Array,  # [N, H, W] current estimates of every problem
    src_index: jax.Array,  # [N, V] int32 indices into all_depths (0 for ref/pad)
    cfg: PassConfig,
    weak_capacity: int,
    use_geom: bool,
) -> pipeline.PassOutputs:
    def one(images_i, cams_i, valid_i, prior_i, key_i, rth_i, depth_maps_i):
        return pipeline.patchmatch_pass_impl(
            images_i, cams_i, valid_i, prior_i, key_i, cfg, rth_i,
            depth_maps=depth_maps_i if use_geom else None,
            weak_capacity=weak_capacity,
        )

    if use_geom:
        # cross-shard gather of source-view depths: XLA lowers the global
        # take over the view-sharded stack to an all-gather over ICI.
        depth_maps = jnp.take(all_depths, src_index, axis=0)  # [N, V, H, W]
    else:
        depth_maps = None
    return jax.vmap(one)(
        images, cams, src_valid, prior, keys, ransac_threshold,
        depth_maps if use_geom else jnp.zeros((images.shape[0],), jnp.float32),
    )


def gather_depth_maps(outputs: pipeline.PassOutputs) -> jax.Array:
    """The sharded [N, H, W] depth stack for the next geom pass."""
    return outputs.depth


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "weak_cost_volumes", "mesh"),
)
def build_batch_image_volumes(
    images: jax.Array,  # [N, V, H, W] view-sharded
    cams: Cameras,  # fields [N, V, ...]
    num_slices: int,
    mesh: Mesh,
    weak_cost_volumes: bool = True,
):
    """Stacked per-problem image-volume sets [N, ...], view-sharded.

    The image volumes depend only on (problem, scale) — not on pass or
    hypotheses — so the batched runner builds them ONCE per scale and
    reuses them across every pass of every round at that scale, matching
    the sequential runner's SceneCache amortization (scene.py). Built by
    a shard_map'd scan so each device only ever materializes its own
    problems' sets; the caller gates on HBM budget (a VGA 5-view set is
    ~2.1 GB/problem) and falls back to in-scan building when too large.
    """
    from apdmvs_tpu import ncc

    P_view = P("view")

    def shard_body(images_l, cams_l):
        def body(carry, xs):
            images_i, cams_i = xs
            vs = ncc.build_image_volume_set(
                images_i, cams_i, cams_i.depth_min[0], cams_i.depth_max[0],
                num_slices=num_slices, weak_cost_volumes=weak_cost_volumes,
            )
            return carry, vs

        _, sets = jax.lax.scan(body, 0, (images_l, cams_l))
        return sets

    probe = jax.eval_shape(
        lambda il, cl: shard_body(il, cl), images, cams
    )
    out_specs = jax.tree.map(lambda _: P_view, probe)
    return jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P_view, jax.tree.map(lambda _: P_view, cams)),
        out_specs=out_specs,
        check_vma=False,
    )(images, cams)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weak_capacity", "use_geom", "num_slices", "mesh"),
)
def _volume_batched_pass(
    images: jax.Array,  # [N, V, H, W]
    cams: Cameras,  # fields [N, V, ...]
    src_valid: jax.Array,  # [N, V]
    prior: pipeline.PassState,  # fields [N, ...]
    keys: jax.Array,  # [N, 2]
    ransac_threshold: jax.Array,  # [N]
    all_depths: jax.Array,  # [N, H, W]
    src_index: jax.Array,  # [N, V]
    cfg: PassConfig,
    weak_capacity: int,
    use_geom: bool,
    num_slices: int,
    mesh: Mesh,
    prebuilt=None,  # stacked image VolumeSet [M, ...] per shard, or None
) -> pipeline.PassOutputs:
    """View-sharded batched pass on the Pallas volume fast path.

    Unlike :func:`_batched_pass` (vmap over problems), each view shard
    runs a ``lax.scan`` over its local problems: the per-problem volume
    set ([V-1, K, PH, PW] image + cost volumes) comes from ``prebuilt``
    (the once-per-scale stacked cache, build_batch_image_volumes) or is
    built *inside* the scan body, so at most ONE problem's transient
    volumes are live per device at a time — the memory-bounded
    per-problem staging of SURVEY.md §7 step 7 — and every Pallas kernel
    runs unbatched, exactly as in the sequential runner. The cross-shard
    depth exchange is an explicit ``all_gather`` over the view axis (the
    reference's filesystem round-trip, APD.cpp:492-510, as one ICI
    collective). Depth volumes (geometric consistency) always build
    in-scan — they depend on the pass's current depth estimates.

    ``prebuilt`` may cover only the FIRST M <= n_local problems of each
    shard (the HBM-budgeted subset, scene.run_scene_batched): the scan
    body fetches cached sets for i < M and rebuilds in-scan beyond —
    safe at per-problem granularity here because the cache is fully
    built BEFORE the pass, so a transient build is co-resident with the
    pinned sets by construction and the caller budgets for it (unlike
    the sequential SceneCache's all-or-nothing policy, scene.py).
    """
    from apdmvs_tpu import ncc

    P_view = P("view")
    n_prob = jax.tree.map(lambda _: P_view, prior)
    out_specs = jax.tree.map(lambda _: P_view, pipeline.PassOutputs(0, 0, 0, 0, 0))
    n_local = prior.depth.shape[0] // mesh.shape["view"]
    m_pre = 0 if prebuilt is None else prebuilt.E.shape[0] // mesh.shape["view"]

    def shard_body(
        images_l, cams_l, valid_l, prior_l, keys_l, rth_l, depths_l, srcidx_l,
        prebuilt_l,
    ):
        depth_full = (
            jax.lax.all_gather(depths_l, "view", axis=0, tiled=True)
            if use_geom
            else None
        )

        def body(carry, xs):
            i = carry
            images_i, cams_i, valid_i, prior_i, key_i, rth_i, srcidx_i = xs
            dmin = cams_i.depth_min[0]
            dmax = cams_i.depth_max[0]
            dm_i = (
                jnp.take(depth_full, srcidx_i, axis=0) if use_geom else None
            )  # [V, H, W]

            # with a partial cache the fetch/build cond branches must
            # return ONE pytree structure, so the in-scan build mirrors
            # the cached sets' weak_cost_volumes choice exactly
            build_cv = (
                cfg.use_APD if prebuilt_l is None else prebuilt_l.C36 is not None
            )

            def build(_):
                return ncc.build_image_volume_set(
                    images_i, cams_i, dmin, dmax, num_slices=num_slices,
                    weak_cost_volumes=build_cv,
                )

            if prebuilt_l is None:
                vols = build(None)
            elif m_pre >= n_local:
                vols = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(
                        x, i, 0, keepdims=False
                    ),
                    prebuilt_l,
                )
            else:
                def fetch(_):
                    return jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, jnp.minimum(i, m_pre - 1), 0, keepdims=False
                        ),
                        prebuilt_l,
                    )

                vols = jax.lax.cond(i < m_pre, fetch, build, None)
            if use_geom:
                vols = ncc.add_depth_volumes(vols, dm_i, cams_i, dmin, dmax)
            out = pipeline.patchmatch_pass_impl(
                images_i, cams_i, valid_i, prior_i, key_i, cfg, rth_i,
                depth_maps=dm_i, weak_capacity=weak_capacity, volumes=vols,
            )
            return i + 1, out

        _, outs = jax.lax.scan(
            body, jnp.asarray(0, jnp.int32),
            (images_l, cams_l, valid_l, prior_l, keys_l, rth_l, srcidx_l),
        )
        return outs

    return jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P_view, jax.tree.map(lambda _: P_view, cams), P_view,
                  n_prob, P_view, P_view, P_view, P_view,
                  jax.tree.map(lambda _: P_view, prebuilt)),
        out_specs=out_specs,
        check_vma=False,
    )(images, cams, src_valid, prior, keys, ransac_threshold,
      all_depths, src_index, prebuilt)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weak_capacity", "use_geom", "num_slices", "mesh"),
)
def _spaced_volume_batched_pass(
    images: jax.Array,  # [N, V, H, W]
    cams: Cameras,
    src_valid: jax.Array,
    prior: pipeline.PassState,
    keys: jax.Array,
    ransac_threshold: jax.Array,
    all_depths: jax.Array,
    src_index: jax.Array,
    cfg: PassConfig,
    weak_capacity: int,
    use_geom: bool,
    num_slices: int,
    mesh: Mesh,
) -> pipeline.PassOutputs:
    """Volume fast path on a SPACE-sharded mesh (n_view == 1): problems run
    sequentially (lax.scan), each problem's volumes built and evaluated as
    per-shard haloed row slabs (ncc.build_volume_set_spaced; the shard_map
    kernel islands live inside this jit). This is the big-single-image
    regime — one view's volumes split across chips (the reference's
    arbitrary-image-size-per-GPU capability, APD.cpp:596-602)."""
    from apdmvs_tpu import ncc

    def body(carry, xs):
        images_i, cams_i, valid_i, prior_i, key_i, rth_i, srcidx_i = xs
        dm_i = jnp.take(all_depths, srcidx_i, axis=0) if use_geom else None
        vols = ncc.build_volume_set_spaced(
            images_i, cams_i, cams_i.depth_min[0], cams_i.depth_max[0], mesh,
            num_slices=num_slices, depth_maps=dm_i,
            weak_cost_volumes=cfg.use_APD,
        )
        out = pipeline.patchmatch_pass_impl(
            images_i, cams_i, valid_i, prior_i, key_i, cfg, rth_i,
            depth_maps=dm_i, weak_capacity=weak_capacity, volumes=vols,
        )
        return carry, out

    _, outs = jax.lax.scan(
        body, 0,
        (images, cams, src_valid, prior, keys, ransac_threshold, src_index),
    )
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "weak_capacity", "use_geom", "num_slices", "mesh"),
)
def _composed_volume_batched_pass(
    images: jax.Array,  # [N, V, H, W]
    cams: Cameras,
    src_valid: jax.Array,
    prior: pipeline.PassState,
    keys: jax.Array,
    ransac_threshold: jax.Array,
    all_depths: jax.Array,
    src_index: jax.Array,
    cfg: PassConfig,
    weak_capacity: int,
    use_geom: bool,
    num_slices: int,
    mesh: Mesh,
) -> pipeline.PassOutputs:
    """Volume fast path on a COMBINED (view > 1, space > 1) mesh: problems
    shard over 'view' (each view-shard row scans its local problems,
    exchanging depths with one 'view' all_gather), and within each problem
    the volumes are per-space-shard haloed row slabs (round-5: the two
    regimes compose — a pod reconstructing many large views needs both
    axes at once; the reference needs neither, one process per GPU,
    main.cpp:148-153).

    Implementation: ONE shard_map with both axes manual; the spaced
    helpers run in ``spaced.space_manual_context()`` mode, resolving
    their axis_index('space') / 'space' collectives against this context
    instead of entering their own shard_map (nesting shard_maps over
    disjoint axis subsets segfaults on this JAX version). Every non-slab
    array is replicated across the 'space' row, so outputs are identical
    on all space shards of a view row (out_specs mention only 'view').
    """
    from apdmvs_tpu import ncc
    from apdmvs_tpu.parallel import spaced as spmod

    spmod.set_space_mesh(mesh)
    P_view = P("view")
    n_prob = jax.tree.map(lambda _: P_view, prior)
    out_specs = jax.tree.map(lambda _: P_view, pipeline.PassOutputs(0, 0, 0, 0, 0))

    def shard_body(
        images_l, cams_l, valid_l, prior_l, keys_l, rth_l, depths_l, srcidx_l,
    ):
        depth_full = (
            jax.lax.all_gather(depths_l, "view", axis=0, tiled=True)
            if use_geom
            else None
        )

        def body(carry, xs):
            images_i, cams_i, valid_i, prior_i, key_i, rth_i, srcidx_i = xs
            dm_i = jnp.take(depth_full, srcidx_i, axis=0) if use_geom else None
            vols = ncc.build_volume_set_spaced(
                images_i, cams_i, cams_i.depth_min[0], cams_i.depth_max[0],
                mesh, num_slices=num_slices, depth_maps=dm_i,
                weak_cost_volumes=cfg.use_APD,
            )
            out = pipeline.patchmatch_pass_impl(
                images_i, cams_i, valid_i, prior_i, key_i, cfg, rth_i,
                depth_maps=dm_i, weak_capacity=weak_capacity, volumes=vols,
            )
            return carry, out

        _, outs = jax.lax.scan(
            body, 0,
            (images_l, cams_l, valid_l, prior_l, keys_l, rth_l, srcidx_l),
        )
        return outs

    with spmod.space_manual_context():
        return jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P_view, jax.tree.map(lambda _: P_view, cams), P_view,
                      n_prob, P_view, P_view, P_view, P_view),
            out_specs=out_specs,
            check_vma=False,
        )(images, cams, src_valid, prior, keys, ransac_threshold,
          all_depths, src_index)


def sharded_batch_pass(
    mesh: Mesh,
    images: jax.Array,
    cams: Cameras,
    src_valid: jax.Array,
    prior: pipeline.PassState,
    keys: jax.Array,
    ransac_threshold: jax.Array,
    cfg: PassConfig,
    weak_capacity: int = 0,
    all_depths: Optional[jax.Array] = None,
    src_index: Optional[jax.Array] = None,
    use_volumes: bool = False,
    num_slices: int = 160,
    prebuilt=None,
) -> pipeline.PassOutputs:
    """Run one pass for a batch of N reference views, view+space sharded.

    N must be a multiple of the mesh's 'view' size (pad with dummy problems
    via :func:`shard_problems`). For geometric-consistency passes provide
    ``all_depths`` [N, H, W] (each problem's current depth estimate) and
    ``src_index`` [N, V] mapping each problem's view slot to the problem
    index owning that view (slot 0 / padding -> own index; they are masked
    out by ``src_valid`` anyway).

    ``use_volumes`` routes by mesh shape: view-only meshes take
    :func:`_volume_batched_pass` (full-image volumes, one problem's sets
    resident per device at a time), space-only meshes take
    :func:`_spaced_volume_batched_pass` (per-shard haloed row slabs), and
    COMBINED (view > 1, space > 1) meshes take
    :func:`_composed_volume_batched_pass` (problems over 'view', slabs
    over 'space'). ``prebuilt`` (from :func:`build_batch_image_volumes`)
    supplies the stacked once-per-scale image-volume cache for the
    view-only path — it may cover just each shard's first M problems;
    without it the scan rebuilds each problem's volumes every pass.
    """
    img_s, cams_s, prior_s, out_s = _batch_specs(mesh)
    use_geom = all_depths is not None
    N, V, H, W = images.shape
    spaced_vols = use_volumes and mesh.shape["space"] != 1
    composed_vols = spaced_vols and mesh.shape["view"] != 1
    if spaced_vols:
        from apdmvs_tpu.parallel import spaced as spmod

        spmod.set_space_mesh(mesh)

    def put(x, spec):
        return put_sharded(mesh, x, spec)

    images = put(images, img_s)
    cams = jax.tree.map(
        lambda x, s: put(x, s), cams, cams_s,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
    )
    src_valid = put(src_valid, P("view", None))
    prior = pipeline.PassState(
        depth=put(prior.depth, prior_s.depth),
        normal_world=put(prior.normal_world, prior_s.normal_world),
        pixel_state=put(prior.pixel_state, prior_s.pixel_state),
        selected=put(prior.selected, prior_s.selected),
    )
    keys = put(keys, P("view", None))
    ransac_threshold = put(ransac_threshold, P("view"))
    if use_geom:
        all_depths = put(all_depths, P("view", "space", None))
        src_index = put(src_index, P("view", None))
    else:
        all_depths = put(jnp.zeros((N, H, W), jnp.float32), P("view", "space", None))
        src_index = put(jnp.zeros((N, V), jnp.int32), P("view", None))

    with mesh:
        if composed_vols:
            return _composed_volume_batched_pass(
                images, cams, src_valid, prior, keys, ransac_threshold,
                all_depths, src_index, cfg, weak_capacity, use_geom,
                num_slices, mesh,
            )
        if spaced_vols:
            return _spaced_volume_batched_pass(
                images, cams, src_valid, prior, keys, ransac_threshold,
                all_depths, src_index, cfg, weak_capacity, use_geom,
                num_slices, mesh,
            )
        if use_volumes:
            return _volume_batched_pass(
                images, cams, src_valid, prior, keys, ransac_threshold,
                all_depths, src_index, cfg, weak_capacity, use_geom,
                num_slices, mesh, prebuilt,
            )
        return _batched_pass(
            images, cams, src_valid, prior, keys, ransac_threshold,
            all_depths, src_index, cfg, weak_capacity, use_geom,
        )
