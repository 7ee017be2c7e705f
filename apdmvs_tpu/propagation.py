"""Red-black checkerboard PatchMatch propagation for strong-texture pixels.

TPU reformulation of the reference's half-grid kernels
(CheckerboardPropagationStrong: APD.cu:982-1321, red/black scheduling:
APD.cu:1547-1585, refinement: APD.cu:837-890):

- The data-dependent "best pixel in strip" gathers become: stack statically
  shifted cost maps per region, argmin over the (fixed-size) strip, then one
  coordinate gather of the winning plane. All candidate offsets have odd
  parity, so candidates always live in the *other* checkerboard color — the
  reference's in-place half-sweeps are reproduced exactly by two functional
  masked updates per iteration.
- Monte-Carlo joint view selection (APD.cu:1203-1259) vectorizes the 15
  CDF-inversion draws into bin-counting over the per-view CDF.

Deliberate reference-quirk handling (SURVEY.md §7 item 6):
- ``float cost_array[8][32] = {2.0f}`` zero-fills all but [0][0], so
  *invalid* candidate regions contribute cost 0 to the view-selection
  statistics and final costs (adoption is still blocked by the flag check at
  APD.cu:1299). We reproduce the zero-fill (without the lone 2.0) since it
  shapes border behavior; see _cost_array masking below.
- weight_norm == 0 produces NaNs in the reference; we skip the update for
  such pixels instead (keeps state finite, affects only degenerate pixels).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, hypotheses, ncc, sampling
from apdmvs_tpu.ncc import COST_MAX, CostContext
from apdmvs_tpu.params import PassConfig, PixelState, RunState

INF = jnp.inf


def _region_offsets() -> Tuple[list, np.ndarray, np.ndarray]:
    """Candidate (dx, dy) strip tables for the 8 regions, in the reference's
    scan order (first minimum wins, matching the strict '<' updates at
    APD.cu:1022-1199). Returns (list of [C_k, 2] arrays, base offsets [8,2],
    region kind mask)."""
    regions = []
    # 0: up_near — base (0,-1) then V-shape
    r = [(0, -1)]
    for i in range(3):
        r += [(-(1 + i), -(2 + i)), (+(1 + i), -(2 + i))]
    regions.append(r)
    # 1: up_far — column strip
    regions.append([(0, -(3 + 2 * i)) for i in range(11)])
    # 2: down_near
    r = [(0, 1)]
    for i in range(3):
        r += [(-(1 + i), (2 + i)), (+(1 + i), (2 + i))]
    regions.append(r)
    # 3: down_far
    regions.append([(0, (3 + 2 * i)) for i in range(11)])
    # 4: left_near
    r = [(-1, 0)]
    for i in range(3):
        r += [(-(2 + i), -(1 + i)), (-(2 + i), +(1 + i))]
    regions.append(r)
    # 5: left_far
    regions.append([(-(3 + 2 * i), 0) for i in range(11)])
    # 6: right_near
    r = [(1, 0)]
    for i in range(3):
        r += [((2 + i), -(1 + i)), ((2 + i), +(1 + i))]
    regions.append(r)
    # 7: right_far
    regions.append([((3 + 2 * i), 0) for i in range(11)])
    return [np.asarray(r, np.int32) for r in regions]


_REGIONS = _region_offsets()


def checkerboard_candidates(
    costs: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per region: the strip position with minimum current cost.

    costs: [H, W]. Returns (cand_x [8,H,W] i32, cand_y [8,H,W] i32,
    flag [8,H,W] bool). flag mirrors the reference's base-offset bounds
    checks (APD.cu:1022,1041,1060,1079,1098,1124,1150,1176).
    """
    H, W = costs.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cand_x, cand_y, flags = [], [], []
    for offs in _REGIONS:
        # running strict-< min keeps the FIRST minimum — same tie-breaking
        # as argmin over the stacked strips, without materializing the
        # [C, H, W] stack or the index-select loops (half-sweep glue is a
        # measured pass cost, round-4 PERF_NOTES)
        best = jnp.full((H, W), INF, costs.dtype)
        bdx = jnp.zeros((H, W), jnp.int32)
        bdy = jnp.zeros((H, W), jnp.int32)
        for dx, dy in offs:
            c = sampling.shift2d(costs, int(dx), int(dy), INF)
            better = c < best
            best = jnp.where(better, c, best)
            bdx = jnp.where(better, int(dx), bdx)
            bdy = jnp.where(better, int(dy), bdy)
        cand_x.append(x + bdx)
        cand_y.append(y + bdy)
        bx, by = int(offs[0, 0]), int(offs[0, 1])
        flags.append(
            ((x + bx) >= 0) & ((x + bx) < W) & ((y + by) >= 0) & ((y + by) < H)
        )
    return jnp.stack(cand_x), jnp.stack(cand_y), jnp.stack(flags)


def neighbor_view_priors(
    selected: jax.Array, near_flags: jax.Array, src_valid: jax.Array
) -> jax.Array:
    """View-selection priors from the 4-neighborhood's selected views
    (reference: APD.cu:1208-1222): +0.9 per neighbor that selected the view,
    +0.1 per neighbor that did not.

    selected: [V, H, W] bool; near_flags: [4, H, W] (up, down, left, right
    region validity). Returns [V, H, W].
    """
    offs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
    priors = jnp.zeros_like(selected, jnp.float32)
    for i, (dx, dy) in enumerate(offs):
        nb = sampling.shift2d(
            jnp.moveaxis(selected, 0, -1).astype(jnp.float32), dx, dy, 0.0
        )  # [H, W, V]
        nb = jnp.moveaxis(nb, -1, 0)
        contrib = jnp.where(nb > 0.5, 0.9, 0.1)
        priors = priors + jnp.where(near_flags[i][None], contrib, 0.0)
    return priors * src_valid[:, None, None]


def joint_view_selection(
    cost_array: jax.Array,
    priors: jax.Array,
    iter_idx: jax.Array,
    key: jax.Array,
    num_samples: int = 15,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Monte-Carlo joint view selection (reference: APD.cu:1224-1271).

    cost_array: [8, V, ...]; priors: [V, ...].
    Returns (view_weights [V, ...] f32 counts, weight_norm [...],
    temp_selected [V, ...] bool).
    """
    thr = 0.8 * jnp.exp(iter_idx.astype(jnp.float32) ** 2 / -90.0)
    good = cost_array < thr
    count = jnp.sum(good, axis=0).astype(jnp.float32)
    count_false = jnp.sum(cost_array > 1.2, axis=0)
    tmpw = jnp.sum(jnp.where(good, jnp.exp(cost_array**2 / -0.18), 0.0), axis=0)
    probs = jnp.where(
        (count > 2) & (count_false < 3),
        tmpw / jnp.maximum(count, 1.0),
        jnp.where(count_false < 3, jnp.exp(thr**2 / -0.32), 0.0),
    )
    probs = probs * priors  # [V, ...]

    cum = jnp.cumsum(probs, axis=0)
    total = cum[-1]
    cdf = cum / jnp.maximum(total, 1e-30)  # total==0 -> cdf ~ 0 -> no draws hit
    cdf = jnp.where(total[None] > 0.0, cdf, 0.0)

    # all draws in one batched reduce (a lax.scan here costs 15 sequential
    # tiny-step iterations of XLA glue per half-sweep; same keys and
    # uniforms as the scan form, so numerically identical)
    keys = jax.random.split(key, num_samples)
    u = jax.vmap(lambda k: jax.random.uniform(k, total.shape))(keys) - (
        jnp.finfo(jnp.float32).eps
    )  # [S, ...]
    below = jnp.sum(
        (cdf[:, None] > u[None]).astype(jnp.float32), axis=1
    )  # [V, ...]
    # weights[v] = #draws landing in bin v = below[v] - below[v-1]
    weights = below - jnp.concatenate([jnp.zeros_like(below[:1]), below[:-1]], axis=0)
    weight_norm = jnp.sum(weights, axis=0)
    return weights, weight_norm, weights > 0.0


def _weighted(cost_vec: jax.Array, weights: jax.Array, weight_norm: jax.Array) -> jax.Array:
    """Sum_v w_v c_v / weight_norm with a zero-norm guard."""
    return jnp.sum(weights * cost_vec, axis=0) / jnp.maximum(weight_norm, 1e-30)


class StrongState(NamedTuple):
    planes: jax.Array  # [H, W, 4] (ref-cam normal + dist-to-origin)
    costs: jax.Array  # [H, W]
    selected: jax.Array  # [V, H, W] bool
    view_weights: jax.Array  # [V, H, W] f32 (persistent MC counts)


def propagate_strong_color(
    ctx: CostContext,
    st: StrongState,
    pixel_state: jax.Array,
    iter_idx: jax.Array,
    key: jax.Array,
    cfg: PassConfig,
    color: int,
) -> StrongState:
    """One half-sweep (one checkerboard color) of strong-pixel propagation.

    color: 0 = "black" ((x+y) even), 1 = "red" (reference: APD.cu:1547-1585).
    Updates only non-WEAK pixels of that color.
    """
    H, W = ctx.height, ctx.width
    r, inc = cfg.strong_radius, cfg.strong_increment
    planes, costs, selected, vw_store = st
    # The ref camera's depth range is pre-scaled by the pipeline with the
    # reference's 0.6/1.2 factors (APD.cpp:454-455).
    depth_min = ctx.cams.depth_min[0]
    depth_max = ctx.cams.depth_max[0]

    cand_x, cand_y, flags = checkerboard_candidates(costs)
    # candidate planes via select-over-static-shifts (XLA's general gather
    # lowering is ~50 cycles/element on TPU, PERF_NOTES.md; each region has
    # <= 11 static strip offsets, so shifted selects are strictly cheaper)
    x_i = ctx.x.astype(jnp.int32)
    y_i = ctx.y.astype(jnp.int32)
    cand_list = []
    for r_idx, offs in enumerate(_REGIONS):
        dxs = cand_x[r_idx] - x_i  # [H, W] in the region's offset set
        dys = cand_y[r_idx] - y_i
        acc = jnp.zeros_like(planes)
        for dx, dy in offs:
            hit = (dxs == int(dx)) & (dys == int(dy))
            acc = jnp.where(
                hit[..., None], sampling.shift2d(planes, int(dx), int(dy), 0.0), acc
            )
        cand_list.append(acc)
    cand_planes = jnp.stack(cand_list)  # [8, H, W, 4]

    # all 8 candidate regions + the current plane in ONE fused batch (plane
    # batch dims broadcast through the NCC evaluator): one kernel dispatch
    # and one volume-window residency instead of two
    cv9 = ncc.cost_vector(
        ctx, jnp.concatenate([cand_planes, planes[None]], axis=0), r, inc
    )  # [V, 9, H, W]
    cost_array = jnp.moveaxis(cv9[:, :8], 0, 1)  # [8, V, H, W]
    cost_vec_now = cv9[:, 8]  # [V, H, W]
    # reference aggregate-init quirk: invalid regions contribute cost 0
    cost_array = jnp.where(flags[:, None], cost_array, 0.0)

    near_flags = flags[jnp.asarray([0, 2, 4, 6])]
    priors = neighbor_view_priors(selected, near_flags, ctx.src_valid)
    k_mc, k_ref = jax.random.split(key)
    weights, weight_norm, temp_sel = joint_view_selection(
        cost_array, priors, iter_idx, k_mc, cfg.num_mc_samples
    )

    final_costs = jnp.sum(weights[None] * cost_array, axis=1) / jnp.maximum(
        weight_norm[None], 1e-30
    )  # [8, H, W]
    min_idx = jnp.argmin(final_costs, axis=0)  # [H, W]

    cost_now = _weighted(cost_vec_now, weights, weight_norm)  # [H, W]
    cost_pre = cost_now  # reference: costs[center] = cost_now (APD.cu:1295)

    best_flag = sampling.select_index(flags, min_idx)
    best_cost = sampling.select_index(final_costs, min_idx)
    best_plane = sampling.select_index(cand_planes, min_idx)  # [H, W, 4]
    depth_before = geometry.depth_from_plane(ctx.cams.K[0], best_plane, ctx.x, ctx.y)
    adopt = (
        best_flag
        & (depth_before >= depth_min)
        & (depth_before <= depth_max)
        & (best_cost < cost_now)
    )
    plane_now = jnp.where(adopt[..., None], best_plane, planes)
    cost_now = jnp.where(adopt, best_cost, cost_now)
    sel_now = jnp.where(adopt[None], temp_sel, selected)

    # --- refinement: 5 perturbed combos (APD.cu:837-890) ---
    # The reference's sequential accept-if-better chain against a running
    # best is equivalent to an argmin over {current} U {valid combos}
    # (first minimum wins); one batched C=5 evaluation replaces 5
    # sequential ones.
    cur_depth = geometry.depth_from_plane(ctx.cams.K[0], plane_now, ctx.x, ctx.y)
    depths5, normals5 = hypotheses.refinement_combos(
        k_ref, ctx.cams.K[0], ctx.x, ctx.y, ctx.dirs,
        plane_now[..., :3], cur_depth, depth_min, depth_max,
    )
    w5 = geometry.dist_to_origin(
        ctx.cams.K[0], ctx.x, ctx.y, depths5, normals5
    )  # [5, H, W]
    planes5 = jnp.concatenate([normals5, w5[..., None]], axis=-1)  # [5, H, W, 4]
    # combos 0/2 carry the per-pixel uniform-RANDOM depth draw and combo 1
    # the per-pixel RANDOM normal — their slice index (or window shear) is
    # structurally unbounded, so all three route to the exact full-K
    # kernel. Only 3/4 (perturbed normal <= 0.02*pi off current, depth
    # +-2% of current) stay on the banded fast path: round-5 per-call
    # fixup traces showed the random-normal combo's shear flagging ~40
    # tiles on EVERY half-sweep, paying more in L2 fixups than the full-K
    # evaluation costs outright.
    cv_b = ncc.cost_vector(
        ctx, jnp.stack([planes5[3], planes5[4]]), r, inc
    )  # [V, 2, H, W]
    cv_r = ncc.cost_vector_full(
        ctx, jnp.stack([planes5[0], planes5[1], planes5[2]]), r, inc
    )  # [V, 3, H, W]
    cv5 = jnp.stack(
        [cv_r[:, 0], cv_r[:, 1], cv_r[:, 2], cv_b[:, 0], cv_b[:, 1]], axis=1
    )  # [V, 5, H, W]
    c5 = jnp.sum(weights[:, None] * cv5, axis=0) / jnp.maximum(
        weight_norm[None], 1e-30
    )  # [5, H, W]
    d_chk = geometry.depth_from_plane(ctx.cams.K[0], planes5, ctx.x, ctx.y)
    c5 = jnp.where((d_chk >= depth_min) & (d_chk <= depth_max), c5, jnp.inf)
    all_costs = jnp.concatenate([cost_now[None], c5], axis=0)  # [6, H, W]
    best_i = jnp.argmin(all_costs, axis=0)
    cost_now = sampling.select_index(all_costs, best_i)
    all_planes = jnp.concatenate([plane_now[None], planes5], axis=0)
    plane_now = sampling.select_index(all_planes, best_i)

    # --- acceptance by run state (APD.cu:1311-1320) ---
    if cfg.state == RunState.REFINE_INIT:
        accept = cost_now < cost_pre - 0.1
        plane_final = jnp.where(accept[..., None], plane_now, planes)
        cost_final = jnp.where(accept, cost_now, cost_pre)
    else:
        plane_final = plane_now
        cost_final = cost_now

    # --- apply only to this color's non-WEAK pixels ---
    parity = (ctx.x.astype(jnp.int32) + ctx.y.astype(jnp.int32)) % 2
    processed = (parity == color) & (pixel_state != PixelState.WEAK)
    # plane/cost/selection updates additionally require weight_norm > 0 (the
    # reference would write NaNs there; we keep the previous state finite)
    upd = processed & (weight_norm > 0)
    return StrongState(
        planes=jnp.where(upd[..., None], plane_final, planes),
        costs=jnp.where(upd, cost_final, costs),
        selected=jnp.where(upd[None], sel_now, selected),
        # view weights persist for all processed pixels (APD.cu:1204-1259)
        view_weights=jnp.where(processed[None], weights, vw_store),
    )
