"""The per-(view, pass) PatchMatch program — RunPatchMatch, TPU-style.

Replaces the reference's 15-kernel DAG with sync points (APD.cu:2386-2495)
by jitted stage programs over whole-image arrays. Stage order is identical:

  [weak prep: nearest-strong, anchor search, reliability demotion]
  RandomInitialization
  for iter in range(max_iterations):
      strong black half-sweep ; strong red half-sweep
      [RANSAC fit planes ; weak sweep]
  planes -> (world normal, depth)
  checkerboard median filter (black ; red)
  DepthToWeak reclassification
  LocalRefine

Weak-pixel stages (in weak.py) run over a compacted worklist whose capacity
is chosen host-side from the actual weak count (the weak map is a pass
input, so this is known before tracing) — the TPU equivalent of the
reference's ``neighbours_map`` compaction (APD.cpp:526-538).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Trace-time path flag, read once at import (see classify.USE_SWEEP for
#: the why); override the module attribute + retrace to experiment.
USE_REBASE = os.environ.get("APDMVS_REBASE", "1") == "1"

from apdmvs_tpu import classify, filters, geometry, hypotheses, ncc, propagation, weak
from apdmvs_tpu.geometry import Cameras
from apdmvs_tpu.params import PassConfig, PixelState, RunState
from apdmvs_tpu.propagation import StrongState


class PassState(NamedTuple):
    """Inter-pass persistent state (the reference's depths.dmb/normals.dmb/
    weak.bin/selected_views.bin contract, main.cpp:117-124, as arrays)."""

    depth: jax.Array  # [H, W] f32
    normal_world: jax.Array  # [H, W, 3] f32
    pixel_state: jax.Array  # [H, W] u8
    selected: jax.Array  # [V, H, W] bool


class PassOutputs(NamedTuple):
    depth: jax.Array
    normal_world: jax.Array
    pixel_state: jax.Array
    selected: jax.Array
    costs: jax.Array


class DebugProbes(NamedTuple):
    """The reference's compiled-out debug probes (main.h:42-43) as optional
    pass outputs: the weak worklist + anchors (DEBUG_NEIGHBOUR,
    APD.cu:2421-2438) and the DepthToWeak disparity cost sweep
    (DEBUG_COST_LINE, APD.cu:2084-2091). Persisted by debug.dump_probes."""

    weak_xy: Optional[jax.Array]  # [N, 2] int (x, y), -1 padding
    anchor_coords: Optional[jax.Array]  # [N, 9, 2] (slot 0 = self)
    sweep: jax.Array  # [61, H, W] classification cost curves


def patchmatch_pass_impl(
    images: jax.Array,  # [V, H, W] f32
    cams: Cameras,  # ref depth range pre-scaled by 0.6/1.2 (APD.cpp:454-455)
    src_valid: jax.Array,  # [V] bool
    prior: PassState,
    key: jax.Array,
    cfg: PassConfig,
    ransac_threshold: jax.Array,
    depth_maps: Optional[jax.Array] = None,  # [V, H, W] for geom passes
    weak_capacity: int = 0,
    volumes: Optional[ncc.VolumeSet] = None,  # Pallas fast-path volumes
    debug: bool = False,
) -> PassOutputs:
    """One full pass over one reference view. See module docstring.

    ``debug`` additionally returns :class:`DebugProbes` (a second tuple
    element); it changes only the outputs, never the pass computation."""
    V, H, W = images.shape
    ctx = ncc.make_context(images, cams, src_valid, depth_maps, volumes=volumes)
    depth_min = cams.depth_min[0]
    depth_max = cams.depth_max[0]

    k_init, k_anchor, k_iters = jax.random.split(key, 3)

    pixel_state = prior.pixel_state
    if not cfg.use_APD:
        # no weak machinery this pass: everything STRONG (APD.cpp:540-548)
        pixel_state = jnp.full((H, W), PixelState.STRONG, jnp.uint8)

    # ---- weak prep: nearest strong, anchors, reliability ----
    # Anchor 3D points use the *prior* depth map, exactly as the reference's
    # GenNeighbours reads pre-initialization plane_hypotheses[...].w
    # (APD.cu:1866-1877 runs before RandomInitialization, APD.cu:2415-2440).
    if cfg.use_APD and weak_capacity > 0:
        weak_xy = weak.compact_weak_pixels(pixel_state, weak_capacity)
        anchors, pixel_state = weak.generate_anchors(
            ctx, prior.depth, pixel_state, weak_xy, k_anchor, cfg, ransac_threshold
        )
        # anchors are fixed for the whole pass (APD.cu:2415), so the
        # scattered cost/depth-volume columns are gathered once here and
        # every weak-sweep lookup becomes a dense contraction (ops/cols.py)
        wcols = (
            weak.build_weak_cols(ctx, weak_xy, anchors)
            if volumes is not None and volumes.C36 is not None
            else None
        )
    else:
        weak_xy = None
        anchors = None
        wcols = None

    def rebased(ctx_, planes_):
        """Context with volumes rebased on planes_' depth (ops/ncc_volume.py
        "Rebased volumes"): the base map absorbs the scene's slopes AND
        depth edges, so the propagation sweeps' NCC fetches run over the
        static RB_BAND deviation band (exact — escapes take the cond-gated
        L2 fixup). Default on; APDMVS_REBASE=0 (read once at import, see
        classify.USE_SWEEP note) forces the direct kernel (same results,
        slower at depth edges)."""
        if volumes is None or not USE_REBASE:
            return ctx_
        d = geometry.depth_from_plane(cams.K[0], planes_, ctx_.x, ctx_.y)
        return ctx_._replace(volumes=ncc.rebase_volume_set(volumes, cams, d))

    # ---- RandomInitialization (APD.cu:806-835) ----
    if cfg.state == RunState.FIRST_INIT:
        planes = hypotheses.random_plane(
            k_init, cams.K[0], ctx.x, ctx.y, ctx.dirs, depth_min, depth_max
        )
        # no rebase for the random seed: its depth field is per-pixel
        # random, so a base map built from it is uncorrelated with the
        # window samples — the direct kernel's L2 handles it exactly
        costs, selected = ncc.initial_cost_and_views(
            ctx, planes,
            cfg.strong_radius, cfg.strong_increment, cfg.top_k,
        )
    else:
        planes = geometry.depth_normal_to_planes(
            cams, prior.depth, prior.normal_world, H, W
        )
        costs, selected = ncc.recost_selected_views(
            rebased(ctx, planes), planes,
            prior.selected, cfg.strong_radius, cfg.strong_increment,
        )

    st = StrongState(
        planes=planes,
        costs=costs,
        selected=selected,
        view_weights=jnp.zeros((V, H, W), jnp.float32),
    )

    # ---- propagation iterations ----
    for it in range(cfg.max_iterations):
        k_it = jax.random.fold_in(k_iters, it)
        k_black, k_red, k_weak = jax.random.split(k_it, 3)
        iter_idx = jnp.asarray(it)
        ctx_it = rebased(ctx, st.planes)  # fast fetch band for this iter
        st = propagation.propagate_strong_color(
            ctx_it, st, pixel_state, iter_idx, k_black, cfg, color=0
        )
        st = propagation.propagate_strong_color(
            ctx_it, st, pixel_state, iter_idx, k_red, cfg, color=1
        )
        if weak_xy is not None:
            st = weak.propagate_weak(
                ctx_it, st, pixel_state, weak_xy, anchors, iter_idx, k_weak,
                cfg, wcols=wcols,
            )

    # ---- readout: plane -> depth + world normal (APD.cu:1587-1602) ----
    depth, n_world = geometry.planes_to_depth_normal(cams, st.planes, H, W)
    planes_world = jnp.concatenate([n_world, depth[..., None]], axis=-1)

    # ---- median filter (APD.cu:1604-1748) ----
    planes_world = filters.checkerboard_median_filter(
        planes_world, st.costs, pixel_state
    )

    # ---- DepthToWeak reclassification (APD.cu:1990-2144) ----
    new_state = classify.depth_to_weak(
        ctx, planes_world, st.selected, st.view_weights, cfg.weak_peak_radius,
        cfg, return_sweep=debug,
    )
    if debug:
        new_state, sweep = new_state

    # ---- LocalRefine (APD.cu:2146-2232) ----
    planes_world = classify.local_refine(
        ctx, planes_world, st.selected, st.view_weights, cfg
    )

    out = PassOutputs(
        depth=planes_world[..., 3],
        normal_world=planes_world[..., :3],
        pixel_state=new_state,
        selected=st.selected,
        costs=st.costs,
    )
    if debug:
        return out, DebugProbes(
            weak_xy=weak_xy,
            anchor_coords=anchors.coords if anchors is not None else None,
            sweep=sweep,
        )
    return out


#: Jitted entry used by the host orchestrator (scene.py). The raw
#: implementation stays exposed for vmap/shard_map composition (parallel/)
#: and for the driver's compile checks (__graft_entry__.py).
patchmatch_pass = jax.jit(
    patchmatch_pass_impl, static_argnames=("cfg", "weak_capacity", "debug")
)


def clamp_outputs(
    out: PassOutputs, depth_min: float, depth_max: float
) -> PassOutputs:
    """Out-of-range depths -> 0 and UNKNOWN (reference: main.cpp:105-115)."""
    bad = (out.depth < depth_min) | (out.depth > depth_max)
    return out._replace(
        depth=jnp.where(bad, 0.0, out.depth),
        pixel_state=jnp.where(bad, jnp.uint8(PixelState.UNKNOWN), out.pixel_state),
    )


def selected_to_bitmask(selected: np.ndarray) -> np.ndarray:
    """[V, H, W] bool -> int32 bitmask with bit (v-1) for camera v
    (reference bit layout: APD.cu:42-55, selected_views_host CV_32SC1)."""
    V = selected.shape[0]
    out = np.zeros(selected.shape[1:], np.int64)
    for v in range(1, V):
        out |= selected[v].astype(np.int64) << (v - 1)
    return out.astype(np.int32)


def bitmask_to_selected(mask: np.ndarray, num_views: int) -> np.ndarray:
    out = np.zeros((num_views,) + mask.shape, bool)
    m = mask.astype(np.int64) & 0xFFFFFFFF
    for v in range(1, num_views):
        out[v] = (m >> (v - 1)) & 1
    return out
