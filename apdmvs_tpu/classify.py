"""Pixel-state classification (DepthToWeak) and local disparity refinement.

Vectorized equivalents of the reference's full-grid kernels:
- DepthToWeak (APD.cu:1990-2144): sweep 61 disparity steps around the
  current depth along the mean-baseline disparity, analyze the cost-curve
  peaks, and classify each pixel STRONG / WEAK / UNKNOWN.
- LocalRefine (APD.cu:2146-2232): +-5 disparity polish of the depth under
  the current view weights; accepted when the cost improves by > 0.1.

Both run after planes are converted to (world normal, depth) and use the
persistent Monte-Carlo view weights from propagation.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.ncc import COST_MAX, CostContext
from apdmvs_tpu.params import PassConfig, PixelState

#: Route the classification/refinement sweeps through the sweep evaluator
#: (ncc.sweep_cost_vector). Read ONCE at import from APDMVS_SWEEP: these
#: flags pick a code path at TRACE time and do not participate in the jit
#: cache key, so toggling the env var mid-process would silently have no
#: effect on already-traced programs. Experiments that need both variants
#: in one process override the module attribute and build fresh
#: jax.jit wrappers per variant (scripts/ab_pass.py).
USE_SWEEP = os.environ.get("APDMVS_SWEEP", "1") == "1"

#: Disparity steps per sweep-evaluator chunk (each chunk rebases on its
#: own mid step; the rebase window ncc_volume.SWEEP_J2 must cover
#: (chunk/2) * delta + band — pair APDMVS_SWEEP_CHUNK=16 with
#: APDMVS_SWEEP_J2=81). Env-at-import like USE_SWEEP.
SWEEP_CHUNK = int(os.environ.get("APDMVS_SWEEP_CHUNK", "8"))

_MIN_MARGIN = 6  # reference: APD.cu:1998
_SWEEP_RADIUS = 30  # reference: APD.cu:2055


def _weighted_sweep_cost(
    ctx: CostContext,
    n_cam: jax.Array,
    depth: jax.Array,
    selected: jax.Array,
    view_weights: jax.Array,
    weight_norm: jax.Array,
    cfg: PassConfig,
) -> jax.Array:
    """Selected-view weighted NCC (+ geometric) cost of the plane with
    normal ``n_cam`` at ``depth`` per pixel (APD.cu:2069-2082)."""
    w = geometry.dist_to_origin(ctx.cams.K[0], ctx.x, ctx.y, depth, n_cam)
    plane = jnp.concatenate([n_cam, w[..., None]], axis=-1)
    cv = ncc.cost_vector(ctx, plane, cfg.strong_radius, cfg.strong_increment)
    if cfg.geom_consistency:
        cv = cv + cfg.geom_factor * ncc.geom_cost_vector(ctx, plane)
    wsel = jnp.where(selected, view_weights, 0.0)
    return jnp.sum(wsel * cv, axis=0) / jnp.maximum(weight_norm, 1e-30)




def _weighted_sweep_costs_batched(
    ctx: CostContext,
    n_cam: jax.Array,  # [H, W, 3]
    depths: jax.Array,  # [S, H, W]
    selected: jax.Array,
    view_weights: jax.Array,
    weight_norm: jax.Array,
    cfg: PassConfig,
    baseline=None,  # [H, W] mean selected baseline (enables the sweep path)
) -> jax.Array:
    """All S sweep depths as chunked multi-candidate evaluations — feeds
    the Pallas kernel C=8 plane batches instead of S sequential C=1 calls.
    Returns [S, H, W].

    ``baseline`` (per-pixel mean selected-view baseline) routes the NCC
    term through the sweep evaluator (ncc.sweep_cost_vector): each chunk
    rebases on its mid step's depth field, and the kernel fetches each
    candidate through a narrow per-(tile, candidate) AUTO-CENTERED band
    instead of paying the direct kernel's full-K fixup on ragged fields
    (PERF_NOTES round-4 closing: that fixup was ~1/3 of the pass)."""
    S = depths.shape[0]
    S_pad = ((S + SWEEP_CHUNK - 1) // SWEEP_CHUNK) * SWEEP_CHUNK
    if S_pad != S:
        depths = jnp.concatenate(
            [depths, jnp.broadcast_to(depths[-1:], (S_pad - S,) + depths.shape[1:])]
        )
    w = geometry.dist_to_origin(
        ctx.cams.K[0], ctx.x, ctx.y, depths, n_cam[None]
    )  # [S_pad, H, W]
    planes = jnp.concatenate(
        [jnp.broadcast_to(n_cam[None], depths.shape + (3,)), w[..., None]], axis=-1
    )
    planes_chunks = planes.reshape(
        S_pad // SWEEP_CHUNK, SWEEP_CHUNK, *planes.shape[1:]
    )
    wsel = jnp.where(selected, view_weights, 0.0)

    use_sweep = (
        baseline is not None
        and ctx.volumes is not None
        and not ctx.volumes.spaced
        and USE_SWEEP
    )
    if use_sweep:
        # each chunk rebases on its mid step's depth field; the kernel
        # auto-centers each candidate's fetch band per tile from the data
        # (no per-candidate global offsets — those mis-placed the band
        # wherever the per-pixel baseline deviated from the mean and paid
        # the L2 fixup for it)
        mid = SWEEP_CHUNK // 2
        base_chunks = depths.reshape(
            S_pad // SWEEP_CHUNK, SWEEP_CHUNK, *depths.shape[1:]
        )[:, mid]

    def chunk_cost(args):
        pl_chunk, base_mid = args
        if use_sweep:
            cv = ncc.sweep_cost_vector(
                ctx, pl_chunk, base_mid,
                cfg.strong_radius, cfg.strong_increment,
            )
        else:
            cv = ncc.cost_vector(
                ctx, pl_chunk, cfg.strong_radius, cfg.strong_increment
            )
        if cfg.geom_consistency:
            cv = cv + cfg.geom_factor * ncc.geom_cost_vector(ctx, pl_chunk)
        return jnp.sum(wsel[:, None] * cv, axis=0) / jnp.maximum(
            weight_norm[None], 1e-30
        )  # [chunk, H, W]

    xs = (planes_chunks, base_chunks if use_sweep else planes_chunks[:, 0, ..., 3])
    if os.environ.get("APDMVS_SWEEP_UNROLL"):
        # diagnostic: unrolled chunk loop keeps every _fixup_call in the
        # top trace scope so APDMVS_FLAG_STATS can thread stats out
        costs = jnp.stack([
            chunk_cost(jax.tree.map(lambda a: a[i], xs))
            for i in range(planes_chunks.shape[0])
        ])
    else:
        costs = jax.lax.map(chunk_cost, xs)
    return costs.reshape(S_pad, *depths.shape[1:])[:S]


def _mean_baseline(ctx: CostContext, selected: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean camera-center distance over each pixel's selected views and the
    selected count (APD.cu:2037-2052)."""
    dists = jnp.linalg.norm(ctx.cams.c - ctx.cams.c[0][None], axis=-1)  # [V]
    cnt = jnp.sum(selected, axis=0).astype(jnp.float32)
    total = jnp.sum(jnp.where(selected, dists[:, None, None], 0.0), axis=0)
    return total / jnp.maximum(cnt, 1.0), cnt


def depth_to_weak(
    ctx: CostContext,
    planes_world: jax.Array,
    selected: jax.Array,
    view_weights: jax.Array,
    weak_peak_radius: int,
    cfg: PassConfig,
    return_sweep: bool = False,
) -> jax.Array:
    """Reclassify every pixel from its depth cost curve (APD.cu:1990-2144).

    planes_world: [H, W, 4] = (world normal, depth). Returns pixel_state u8;
    with ``return_sweep`` also the [61, H, W] disparity cost sweep (the
    DEBUG_COST_LINE probe buffer, APD.cu:2084-2091).
    """
    H, W = ctx.height, ctx.width
    K0 = ctx.cams.K[0]
    n_cam = geometry.normal_world_to_cam(ctx.cams.R[0], planes_world[..., :3])
    origin_depth = planes_world[..., 3]

    margin = (
        (ctx.x < _MIN_MARGIN)
        | (ctx.y < _MIN_MARGIN)
        | (ctx.x >= W - _MIN_MARGIN)
        | (ctx.y >= H - _MIN_MARGIN)
    )

    baseline, valid_cnt = _mean_baseline(ctx, selected)
    weight_norm = jnp.sum(jnp.where(selected, view_weights, 0.0), axis=0)
    disp = K0[0, 0] * baseline / jnp.where(origin_depth == 0, 1.0, origin_depth)

    steps = jnp.arange(-_SWEEP_RADIUS, _SWEEP_RADIUS + 1, dtype=jnp.float32)

    p_depths = K0[0, 0] * baseline[None] / (disp[None] + steps[:, None, None])
    in_range = (p_depths >= ctx.cams.depth_min[0]) & (
        p_depths <= ctx.cams.depth_max[0]
    )
    raw = _weighted_sweep_costs_batched(
        ctx, n_cam, p_depths, selected, view_weights, weight_norm, cfg,
        baseline=baseline,
    )
    p_costs = jnp.where(in_range, jnp.minimum(COST_MAX, raw), COST_MAX)  # [61, H, W]

    # --- peak analysis (APD.cu:2092-2142) ---
    S = 2 * _SWEEP_RADIUS + 1
    interior = p_costs[2 : S - 2]
    is_peak = (p_costs[1 : S - 3] > interior) & (p_costs[3 : S - 1] > interior)
    is_peak = jnp.pad(is_peak, ((2, 2), (0, 0), (0, 0)), constant_values=False)
    peak_count = jnp.sum(is_peak, axis=0)
    peak_vals = jnp.where(is_peak, p_costs, jnp.inf)
    min_val = jnp.min(peak_vals, axis=0)
    min_peak = jnp.where(min_val < COST_MAX, jnp.argmin(peak_vals, axis=0), 0)
    min_cost = jnp.minimum(min_val, COST_MAX)
    from apdmvs_tpu import sampling

    cost_at_min_peak = sampling.select_index(p_costs, min_peak)

    off_center = jnp.abs(min_peak - _SWEEP_RADIUS) > weak_peak_radius
    weak_now = off_center | (cost_at_min_peak > 0.5)

    single_peak = peak_count == 1
    strong_single = cost_at_min_peak <= 0.15

    others = is_peak & (
        jax.lax.broadcasted_iota(jnp.int32, p_costs.shape, 0) != min_peak[None]
    )
    var = jnp.sqrt(
        jnp.sum(jnp.where(others, (p_costs - min_cost[None]) ** 2, 0.0), axis=0)
    ) / jnp.maximum(peak_count - 1, 1).astype(jnp.float32)
    strong_multi = var > 0.2

    state = jnp.where(
        weak_now,
        PixelState.WEAK,
        jnp.where(
            single_peak,
            jnp.where(strong_single, PixelState.STRONG, PixelState.WEAK),
            jnp.where(strong_multi, PixelState.STRONG, PixelState.WEAK),
        ),
    ).astype(jnp.uint8)

    unknown = margin | (origin_depth == 0) | (valid_cnt == 0)
    out = jnp.where(unknown, jnp.uint8(PixelState.UNKNOWN), state)
    return (out, p_costs) if return_sweep else out


def local_refine(
    ctx: CostContext,
    planes_world: jax.Array,
    selected: jax.Array,
    view_weights: jax.Array,
    cfg: PassConfig,
) -> jax.Array:
    """+-5 disparity depth polish (APD.cu:2146-2232). Updates only the depth
    channel where the swept cost beats the current cost by > 0.1."""
    K0 = ctx.cams.K[0]
    n_cam = geometry.normal_world_to_cam(ctx.cams.R[0], planes_world[..., :3])
    origin_depth = planes_world[..., 3]
    baseline, valid_cnt = _mean_baseline(ctx, selected)
    weight_norm = jnp.sum(jnp.where(selected, view_weights, 0.0), axis=0)

    cost_now = _weighted_sweep_cost(
        ctx, n_cam, origin_depth, selected, view_weights, weight_norm, cfg
    )
    disp = K0[0, 0] * baseline / jnp.where(origin_depth == 0, 1.0, origin_depth)

    steps = jnp.arange(-5, 6, dtype=jnp.float32)
    p_depths = K0[0, 0] * baseline[None] / (disp[None] + steps[:, None, None])
    in_range = (p_depths >= ctx.cams.depth_min[0]) & (
        p_depths <= ctx.cams.depth_max[0]
    )
    raw = _weighted_sweep_costs_batched(
        ctx, n_cam, p_depths, selected, view_weights, weight_norm, cfg,
        baseline=baseline,
    )
    costs = jnp.where(in_range, raw, COST_MAX)  # [11, H, W]
    best = jnp.argmin(costs, axis=0)
    from apdmvs_tpu import sampling

    min_cost = sampling.select_index(costs, best)
    best_depth = sampling.select_index(p_depths, best)
    accept = (
        (cost_now - min_cost > 0.1)
        & (origin_depth != 0)
        & (weight_norm > 0)
        & (valid_cnt > 0)
    )
    new_depth = jnp.where(accept, best_depth, origin_depth)
    return planes_world.at[..., 3].set(new_depth)
