"""Fused multi-candidate NCC cost evaluation over plane-sweep volumes.

The hot kernels of the framework (replace the XLA formulation of
ComputeBilateralNCCOld + ComputeMultiViewCostVector, reference:
APD.cu:530-614, 696-716, whose gather lowering is ~50 cycles/element —
PERF_NOTES.md).

Architecture (round-3 redesign, measured on v5e — PERF_NOTES):

Every evaluator is EXACT (bit-matches the XLA mirror) via a two-level
scheme:

  L1 *hot kernel* — a fixed, fully-unrolled select band emulates the
     per-pixel slice interpolation:
       - rebased path (_kernel_rb): the per-pixel index relative to the
         base map b(p) deviates ~0.6 slices (p90) on real fields, so a
         STATIC band of RB_BAND slices centered on the rebased origin J
         covers almost everything. No per-tile scalar work in the hot
         loop.
       - direct path (_kernel): per-tile shared dynamic base c0 (min of
         the candidates' closed-form ranges — k is linear in the window
         offset) + a SUB_BAND-wide unrolled band.
     Loads are shared across candidates (offset -> slice -> candidate
     loop order): one slice load serves every candidate's select, the
     single biggest measured win (PERF_NOTES round-3: 46 -> 35 ms naive).
     Candidates whose index range escapes the band write a -1 sentinel
     and flag their tile.
  L2 *full-range fixup* (_fixup_call -> _kernel_fullk with sentinel
     passthrough) — recomputes flagged tiles with a chunked full-K select
     over E. Dispatch is gated by a host-level ``lax.cond(any(flags))``,
     so calls with no escapes (the common case) pay nothing.

``ncc_volume_cost_view_fullk`` exposes the full-K kernel directly for
hypotheses that are *structurally* out-of-band — e.g. the refinement
random-depth combos, whose per-pixel slice index is uniform over the
whole depth range (propagation.py splits those off statically).

Spatial padding convention: arrays are padded by (PAD_Y, PAD_X) =
(8, 128) per side; E is *built* on the padded pixel grid (ops/volume
build over padded dirs) so halo samples are exact, not border-clamped.
The padded interior height must be a multiple of NCC_TILE_H (the volume
builders pad to it).

Measurement note: any per-call timing on the axon platform includes a
~25 ms dispatch/transfer floor — a no-op pallas_call measures ~25 ms.
Kernel costs below are AMORTIZED (fori_loop of chained calls inside one
jit): the rebased hot kernel runs 5.4 ms at C=9, VGA, 1 view.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: Trace-time path flag, read once at import (see classify.USE_SWEEP for
#: the why); override the module attribute + retrace to experiment.
#: Default OFF: the two-band L2a measured a per-tile WASH against the
#: full-K fixup on v5e (scripts/bench_fixup.py; the dense recompute is
#: formulation-insensitive) — kept as the recorded negative result.
USE_BAND2 = os.environ.get("APDMVS_BAND2", "0") == "1"

PAD_Y = 8
PAD_X = 128
TILE_H = 8  # builder/geom kernels' tile height
TILE_W = 128
NCC_TILE_H = 16  # NCC cost kernels' tile height. 8 pays ~4x per-tile
# DMA/scalar overhead (round-3); 32 doubles every live accumulator to 4
# vregs and the spill traffic with it — 16 measured fastest (round 4:
# C=9 rebased view-call 55 -> 38 ms-class vs 32; exactness unchanged).
# Padded interior heights are multiples of this.
SUB_BAND = 32  # direct-kernel L1 band (slices); the base is one shared
# scalar per tile, so the band must cover the k spread across the whole
# tile plus the +-radius window; tiles that escape take the L2 fixup.
RB_BAND = 8  # rebased-kernel L1 band around the rebased origin J
FULLK_CHUNK = 32  # L2 full-range select chunk (fori over K/chunk trips)
BAND2 = 32  # L2a two-band fixup: each of the two dynamic windows' width.
# Escaped tiles are depth-edge tiles with BIMODAL needed-slice clusters;
# two BAND2 windows at the group range's ends cover them at ~K/(2*BAND2)
# of the full-K select work (round-5: the full-K fixups owned 57% of the
# pass wall). Inter-band misses escalate to the exact full-K kernel.
_CAND_GROUP = 3  # candidates per shared-load group in the wide-band
# kernels (direct L1, full-K): wider sharing at band>=25 exceeds Mosaic's
# 16 MB scoped-vmem spill stack
_RB_CAND_GROUP = 3  # rebased-L1 candidate group (round 4: the all-shared
# form held >100 live vregs at C=9 / TILE_H 32 — spill-bound)
COST_MAX = 2.0
MIN_VAR = 1e-5

# consts vector layout (one (1, 21) f32 SMEM block):
# [fx, fy, cx, cy, u_min, du, M00..M22 (9), b0, b1, b2, src_w, src_h, row0]
# row0 = first owned pixel row of a space shard's slab (0 unsharded): the
# kernels add it to their tile-local row iota so pixel directions and
# warps stay GLOBAL when operating on a row slab.
_NCONST = 21


def pack_consts(K0: jax.Array, M: jax.Array, b: jax.Array, u_min, du,
                src_w: int, src_h: int, row0=0) -> jax.Array:
    return jnp.concatenate(
        [
            jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]),
            jnp.stack([jnp.asarray(u_min, jnp.float32), jnp.asarray(du, jnp.float32)]),
            M.reshape(-1).astype(jnp.float32),
            b.reshape(-1).astype(jnp.float32),
            jnp.asarray([src_w, src_h], jnp.float32),
            jnp.asarray(row0, jnp.float32).reshape(1),
        ]
    ).reshape(1, _NCONST).astype(jnp.float32)


def _offsets(radius: int, increment: int):
    vals = list(range(-radius, radius + 1, increment))
    return [(dx, dy) for dx in vals for dy in vals]


def _group_bit(c: int) -> int:
    """L1 escape flags are a per-tile BITMASK with bit g set when
    candidate group g (of _CAND_GROUP) escaped — the L2 fixup skips clean
    groups of a flagged tile (the per-tile dense recompute cost is
    formulation-insensitive at ~0.5 ms, so the only lever is recomputing
    fewer (tile, group)s; scripts/bench_fixup.py)."""
    return 1 << (c // _CAND_GROUP)


def _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S):
    inv = 1.0 / S
    mr = s_r * inv
    ms = s_s * inv
    var_r = s_rr * inv - mr * mr
    var_s = s_ss * inv - ms * ms
    cov = s_rs * inv - mr * ms
    ncc_cost = 1.0 - cov * jax.lax.rsqrt(jnp.maximum(var_r * var_s, 1e-30))
    cost = jnp.clip(ncc_cost, 0.0, COST_MAX)
    return jnp.where((var_r < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost)


def _center_oob(consts_ref, v, dirx, diry, u_c):
    """Analytic out-of-source-bounds test of the center warp
    (APD.cu:546-556)."""
    M = [consts_ref[v, 6 + m] for m in range(9)]
    b0 = consts_ref[v, 15]
    b1 = consts_ref[v, 16]
    b2 = consts_ref[v, 17]
    src_w = consts_ref[v, 18]
    src_h = consts_ref[v, 19]
    qx = M[0] * dirx + M[1] * diry + M[2] + b0 * u_c
    qy = M[3] * dirx + M[4] * diry + M[5] + b1 * u_c
    qz = M[6] * dirx + M[7] * diry + M[8] + b2 * u_c
    wx = qx / qz
    wy = qy / qz
    return (wx < 0.0) | (wx >= src_w) | (wy < 0.0) | (wy >= src_h)


def _plane_fields(consts_ref, planes_ref, c, dirx, diry):
    """(u_c, k_c, kx, ky): the candidate's inverse-depth field at the tile
    and its exact per-offset slice gradient — k(p, D) = k_c + kx*Dx + ky*Dy
    (u(p+D) = u(p) - (nx Dx/fx + ny Dy/fy)/w, linear in the offset)."""
    fx = consts_ref[0, 0]
    fy = consts_ref[0, 1]
    u_min = consts_ref[0, 4]
    du = consts_ref[0, 5]
    nx = planes_ref[c, 0]
    ny = planes_ref[c, 1]
    nz = planes_ref[c, 2]
    w = planes_ref[c, 3]
    u_c = -(nx * dirx + ny * diry + nz) / w
    k_c = (u_c - u_min) / du
    kx = -nx / (fx * w * du)
    ky = -ny / (fy * w * du)
    return u_c, k_c, kx, ky


def _tile_grids(consts_ref, i, j, th):
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (th, TILE_W), 0) + i * th
    ).astype(jnp.float32) + consts_ref[0, 20]  # + slab row0 (global rows)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (th, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    dirx = (xs - consts_ref[0, 2]) / consts_ref[0, 0]
    diry = (ys - consts_ref[0, 3]) / consts_ref[0, 1]
    return dirx, diry


def _ref_sums(ref_tile, offsets, th):
    s_r = jnp.zeros((th, TILE_W), jnp.float32)
    s_rr = jnp.zeros((th, TILE_W), jnp.float32)
    for (dx, dy) in offsets:
        rv = ref_tile[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
        s_r = s_r + rv
        s_rr = s_rr + rv * rv
    return s_r, s_rr


# ---------------------------------------------------------------------------
# L1 kernels
# ---------------------------------------------------------------------------


def _kernel_rb(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    r_hbm,  # ANY [J2, PH, PW] rebased volume
    bf_hbm,  # ANY [PH, PW] f32 clipped base map
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TH, TILE_W] (-1 = needs exact fixup)
    flag_ref,  # SMEM out [Ty, Tx] i32 — any candidate escaped, per tile
    r_win,  # scratch VMEM [J2, TH + 2*PAD_Y, 3*TILE_W]
    bf_win,  # scratch VMEM [TH + 2*PAD_Y, 3*TILE_W] f32
    ref_tile,  # scratch VMEM [TH + 2*PAD_Y, 3*TILE_W] f32
    sems,  # DMA semaphores (3,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
    j2: int,
):
    """Rebased L1: static RB_BAND-slice select around the rebased origin J.

    The rebased index j = k(candidate, sample) - b(sample) + J is the
    candidate's deviation from the current estimate at the sample position
    (~0.6 slices p90 on real fields; PERF_NOTES round-3), so the static
    narrow band covers almost all tiles. Loads are shared across all
    candidates per (offset, slice). Escapes are sentinel-marked for the
    cond-gated L2.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th = NCC_TILE_H
    i = pl.program_id(0)
    j = pl.program_id(1)
    J = (j2 - 1) // 2

    def win(hbm, dst, sem):
        return pltpu.make_async_copy(
            hbm.at[..., pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
            dst,
            sem,
        )

    ref_dma = win(ref_hbm, ref_tile, sems.at[0])
    bf_dma = win(bf_hbm, bf_win, sems.at[1])
    r_dma = win(r_hbm, r_win, sems.at[2])
    ref_dma.start()
    bf_dma.start()
    r_dma.start()

    dirx, diry = _tile_grids(consts_ref, i, j, th)
    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    kmaxf = float(num_slices - 1)

    ref_dma.wait()
    s_r, s_rr = _ref_sums(ref_tile, offsets, th)
    bf_dma.wait()
    r_dma.wait()

    # candidates in groups of _RB_CAND_GROUP: the (sums + acc0/acc1) live
    # set at C=9 and TILE_H=32 is >100 vregs — far beyond the register
    # file — so full load-sharing across all candidates trades a little
    # slice-load reuse for a lot of Mosaic spill traffic (the kernels are
    # spill-bound, round-3 ledger).
    # Round-5: the band is AUTO-CENTERED per group — a cheap first pass
    # accumulates the group's raw-index range (elementwise min/max) and
    # the shared RB_BAND window is placed on its center instead of the
    # static J. Systematically-offset candidate groups (e.g. candidates
    # from across a depth edge whose deviation is uniform over the tile)
    # then still FIT, where the static band escaped them to the L2 fixup.
    need_e = jnp.asarray(0, jnp.int32)
    for g0 in range(0, num_cands, _RB_CAND_GROUP):
        cg = list(range(g0, min(g0 + _RB_CAND_GROUP, num_cands)))
        fields = {
            c: _plane_fields(consts_ref, planes_ref, c, dirx, diry) for c in cg
        }
        # pass 1: per-candidate raw ranges via elementwise accumulators
        lo_e = {c: None for c in cg}
        hi_e = {c: None for c in cg}
        for (dx, dy) in offsets:
            bfs = bf_win[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            for c in cg:
                _, k_c, kx, ky = fields[c]
                raw = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf) - bfs
                lo_e[c] = raw if lo_e[c] is None else jnp.minimum(lo_e[c], raw)
                hi_e[c] = raw if hi_e[c] is None else jnp.maximum(hi_e[c], raw)
        jmin = {c: jnp.min(lo_e[c]) + J for c in cg}
        jmax = {c: jnp.max(hi_e[c]) + J for c in cg}
        gmin = jmin[cg[0]]
        gmax = jmax[cg[0]]
        for c in cg[1:]:
            # NaN candidate ranges must not poison the group band (their
            # fits is False regardless); min/max propagate NaN, so guard
            gmin = jnp.minimum(gmin, jnp.where(jnp.isnan(jmin[c]), jnp.inf, jmin[c]))
            gmax = jnp.maximum(gmax, jnp.where(jnp.isnan(jmax[c]), -jnp.inf, jmax[c]))
        gmin = jnp.where(jnp.isfinite(gmin), gmin, float(J))
        gmax = jnp.where(jnp.isfinite(gmax), gmax, float(J))
        g_lo = jnp.clip(
            jnp.floor((gmin + gmax) * 0.5).astype(jnp.int32) - RB_BAND // 2,
            0, max(j2 - RB_BAND, 0),
        )
        g_lof = g_lo.astype(jnp.float32)

        sums = {c: [jnp.zeros((th, TILE_W), jnp.float32) for _ in range(3)]
                for c in cg}
        for (dx, dy) in offsets:
            bfs = bf_win[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            r0i, fr = {}, {}
            acc0 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
            acc1 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
            for c in cg:
                u_c, k_c, kx, ky = fields[c]
                k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                raw = k - bfs + J
                rel = jnp.clip(raw - g_lof, 0.0, RB_BAND - 1.0)
                r0 = jnp.floor(rel)
                r0i[c] = r0.astype(jnp.int32)
                fr[c] = rel - r0
            prev = {c: None for c in cg}
            for bb in range(RB_BAND):
                ev = r_win[
                    g_lo + bb, PAD_Y + dy : PAD_Y + dy + th,
                    TILE_W + dx : 2 * TILE_W + dx,
                ].astype(jnp.float32)
                for c in cg:
                    eq = r0i[c] == bb
                    acc0[c] = jnp.where(eq, ev, acc0[c])
                    if prev[c] is not None:
                        acc1[c] = jnp.where(prev[c], ev, acc1[c])
                    prev[c] = eq
            rv = ref_tile[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            for c in cg:
                sv = acc0[c] * (1.0 - fr[c]) + acc1[c] * fr[c]
                sums[c][0] = sums[c][0] + sv
                sums[c][1] = sums[c][1] + sv * sv
                sums[c][2] = sums[c][2] + rv * sv

        for c in cg:
            cost = _ncc_epilogue(s_r, s_rr, sums[c][0], sums[c][1], sums[c][2], S)
            oob = _center_oob(consts_ref, 0, dirx, diry, fields[c][0])
            # NaN jmin/jmax propagate -> fits False -> L2 recomputes exactly
            fits = (jmin[c] >= g_lof) & (jmax[c] <= g_lof + RB_BAND - 1.5)
            need_e = need_e | jnp.where(fits, 0, _group_bit(c))
            cost_ref[c] = jnp.where(oob, COST_MAX, jnp.where(fits, cost, -1.0))
    flag_ref[i, j] = need_e


def _kernel(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TH, TILE_W] (-1 = needs exact fixup)
    flag_ref,  # SMEM out [Ty, Tx] i32
    e_win,  # scratch VMEM [K, TH + 2*PAD_Y, 3*TILE_W]
    ref_tile,  # scratch VMEM [TH + 2*PAD_Y, 3*TILE_W] f32
    sems,  # DMA semaphores (2,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """Direct L1: SUB_BAND-slice select at a per-tile shared dynamic base.

    The shared base c0 = clip(floor(min_c k_lo_c)) lets one slice load
    serve every candidate's select (the candidates of one call are
    adjacent hypotheses, so their ranges largely overlap). Candidates
    whose range escapes [c0, c0 + SUB_BAND) are sentinel-marked for the
    cond-gated L2 (depth-edge tiles: the k spread across a 128-lane tile
    exceeds the band exactly where the scene depth jumps — measured 13%
    of (candidate, pixel)s differ >0.1 under the old silent clamp).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th = NCC_TILE_H
    i = pl.program_id(0)
    j = pl.program_id(1)

    ref_dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
        ref_tile,
        sems.at[0],
    )
    ref_dma.start()
    e_dma = pltpu.make_async_copy(
        e_hbm.at[:, pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
        e_win,
        sems.at[1],
    )
    e_dma.start()

    dirx, diry = _tile_grids(consts_ref, i, j, th)
    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    K = num_slices
    kmaxf = float(K - 1)
    band = min(SUB_BAND, K)

    ref_dma.wait()
    s_r, s_rr = _ref_sums(ref_tile, offsets, th)
    e_dma.wait()

    # candidates in groups of _CAND_GROUP: loads are shared within a
    # group; larger groups at this band width blow Mosaic's 16 MB scoped-
    # vmem spill stack (measured: band 25, group 9, TILE 32 -> 16.34 MB)
    need_e = jnp.asarray(0, jnp.int32)
    for g0 in range(0, num_cands, _CAND_GROUP):
        cg = list(range(g0, min(g0 + _CAND_GROUP, num_cands)))
        fields = {
            c: _plane_fields(consts_ref, planes_ref, c, dirx, diry) for c in cg
        }
        # shared per-group base from the candidates' closed-form ranges
        k_lo_all = jnp.asarray(jnp.inf)
        k_hi, k_lo = {}, {}
        for c in cg:
            _, k_c, kx, ky = fields[c]
            span = radius * (jnp.abs(kx) + jnp.abs(ky))
            lo = jnp.min(k_c - span)
            hi = jnp.max(k_c + span)
            lo = jnp.clip(jnp.where(jnp.isnan(lo), 0.0, lo), 0.0, kmaxf)
            hi = jnp.clip(jnp.where(jnp.isnan(hi), kmaxf, hi), 0.0, kmaxf)
            # NaN ranges (degenerate w) force the fixup
            nan = jnp.isnan(jnp.min(k_c)) | jnp.isnan(jnp.max(k_c))
            k_lo[c] = lo
            k_hi[c] = jnp.where(nan, jnp.inf, hi)
            k_lo_all = jnp.minimum(k_lo_all, lo)
        c0 = jnp.clip(jnp.floor(k_lo_all).astype(jnp.int32), 0, max(K - band, 0))
        c0f = c0.astype(jnp.float32)

        sums = {c: [jnp.zeros((th, TILE_W), jnp.float32) for _ in range(3)]
                for c in cg}
        for (dx, dy) in offsets:
            r0i, fr = {}, {}
            acc0 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
            acc1 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
            for c in cg:
                _, k_c, kx, ky = fields[c]
                k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                rel = jnp.clip(k - c0f, 0.0, band - 1.0)
                r0 = jnp.floor(rel)
                r0i[c] = r0.astype(jnp.int32)
                fr[c] = rel - r0
            prev = {c: None for c in cg}
            for bb in range(band):
                ev = e_win[
                    c0 + bb,
                    PAD_Y + dy : PAD_Y + dy + th,
                    TILE_W + dx : 2 * TILE_W + dx,
                ].astype(jnp.float32)
                for c in cg:
                    eq = r0i[c] == bb
                    acc0[c] = jnp.where(eq, ev, acc0[c])
                    if prev[c] is not None:
                        acc1[c] = jnp.where(prev[c], ev, acc1[c])
                    prev[c] = eq
            rv = ref_tile[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            for c in cg:
                sv = acc0[c] * (1.0 - fr[c]) + acc1[c] * fr[c]
                sums[c][0] = sums[c][0] + sv
                sums[c][1] = sums[c][1] + sv * sv
                sums[c][2] = sums[c][2] + rv * sv

        for c in cg:
            cost = _ncc_epilogue(s_r, s_rr, sums[c][0], sums[c][1], sums[c][2], S)
            oob = _center_oob(consts_ref, 0, dirx, diry, fields[c][0])
            # exact when every sample's floor(k)+1 stays inside the band
            # (k_hi = K-1 exactly has f = 0, so <= band - 1 suffices there;
            # we conservatively flag it — rare top-edge tiles recompute)
            fits = (k_lo[c] >= c0f) & ((k_hi[c] - c0f) <= (band - 1.5))
            need_e = need_e | jnp.where(fits, 0, _group_bit(c))
            cost_ref[c] = jnp.where(oob, COST_MAX, jnp.where(fits, cost, -1.0))
    flag_ref[i, j] = need_e


# ---------------------------------------------------------------------------
# L2: full-range kernel (fixup + structurally-out-of-band hypotheses)
# ---------------------------------------------------------------------------


def _fullk_group(
    consts_ref, planes_ref, e_win, ref_tile, dirx, diry,
    num_slices, cg, offsets, s_r, s_rr,
):
    """Exact full-K NCC costs of one candidate group over a tile: chunked
    select over all slices (fori over K/FULLK_CHUNK trips with an unrolled
    chunk body — straight-line inside, bounded compile size outside).
    Returns {c: cost}."""
    th = NCC_TILE_H
    S = float(len(offsets))
    K = num_slices
    kmaxf = float(K - 1)
    chunk = min(FULLK_CHUNK, K)
    trips = -(-K // chunk)

    costs = {}
    if True:
        fields = {
            c: _plane_fields(consts_ref, planes_ref, c, dirx, diry) for c in cg
        }
        # dynamic trip bounds: only slice chunks intersecting the group's
        # needed range [floor(min k), floor(max k) + 1] are scanned (the
        # needed range is closed-form — k is linear in the offset). NaN
        # ranges (degenerate w) fall back to the full scan.
        rad = max(abs(d) for off in offsets for d in off)
        g_lo = jnp.asarray(jnp.inf)
        g_hi = jnp.asarray(-jnp.inf)
        for c in cg:
            _, k_c, kx, ky = fields[c]
            span = rad * (jnp.abs(kx) + jnp.abs(ky))
            lo = jnp.min(k_c - span)
            hi = jnp.max(k_c + span)
            g_lo = jnp.minimum(g_lo, jnp.where(jnp.isnan(lo), -jnp.inf, lo))
            g_hi = jnp.maximum(g_hi, jnp.where(jnp.isnan(hi), jnp.inf, hi))
        g_lo = jnp.clip(jnp.where(jnp.isfinite(g_lo), g_lo, 0.0), 0.0, kmaxf)
        g_hi = jnp.clip(jnp.where(jnp.isfinite(g_hi), g_hi, kmaxf), 0.0, kmaxf)
        t_lo = jnp.floor(g_lo).astype(jnp.int32) // chunk
        t_hi = jnp.minimum(
            (jnp.floor(g_hi).astype(jnp.int32) + 1) // chunk + 1, trips
        )

        sums = {c: [jnp.zeros((th, TILE_W), jnp.float32) for _ in range(3)]
                for c in cg}
        for (dx, dy) in offsets:
            r0i, fr = {}, {}
            for c in cg:
                _, k_c, kx, ky = fields[c]
                k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                r0 = jnp.floor(k)
                r0i[c] = r0.astype(jnp.int32)
                fr[c] = k - r0

            def body(ci, carry, _r0i=r0i, _dx=dx, _dy=dy, _cg=cg):
                accs = list(carry)
                base = ci * chunk
                for bb in range(chunk):
                    ev = e_win[
                        base + bb,
                        PAD_Y + _dy : PAD_Y + _dy + th,
                        TILE_W + _dx : 2 * TILE_W + _dx,
                    ].astype(jnp.float32)
                    for ci_, c in enumerate(_cg):
                        sl = base + bb
                        accs[2 * ci_] = jnp.where(
                            _r0i[c] == sl, ev, accs[2 * ci_]
                        )
                        accs[2 * ci_ + 1] = jnp.where(
                            _r0i[c] == sl - 1, ev, accs[2 * ci_ + 1]
                        )
                return tuple(accs)

            z = jnp.zeros((th, TILE_W), jnp.float32)
            accs = jax.lax.fori_loop(t_lo, t_hi, body, (z,) * (2 * len(cg)))
            rv = ref_tile[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            for ci_, c in enumerate(cg):
                sv = accs[2 * ci_] * (1.0 - fr[c]) + accs[2 * ci_ + 1] * fr[c]
                sums[c][0] = sums[c][0] + sv
                sums[c][1] = sums[c][1] + sv * sv
                sums[c][2] = sums[c][2] + rv * sv

        for c in cg:
            cost = _ncc_epilogue(s_r, s_rr, sums[c][0], sums[c][1], sums[c][2], S)
            oob = _center_oob(consts_ref, 0, dirx, diry, fields[c][0])
            costs[c] = jnp.where(oob, COST_MAX, cost)
    return costs


def _kernel_fullk(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TH, TILE_W]
    e_win,
    ref_tile,
    sems,
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """Standalone exact full-K evaluator (no L1): for hypotheses whose
    slice index is structurally unbounded (refinement random-depth combos,
    reference APD.cu:855-867 — per-pixel uniform over the depth range)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th = NCC_TILE_H
    i = pl.program_id(0)
    j = pl.program_id(1)
    ref_dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
        ref_tile,
        sems.at[0],
    )
    ref_dma.start()
    e_dma = pltpu.make_async_copy(
        e_hbm.at[:, pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
        e_win,
        sems.at[1],
    )
    e_dma.start()
    dirx, diry = _tile_grids(consts_ref, i, j, th)
    offsets = _offsets(radius, increment)
    ref_dma.wait()
    s_r, s_rr = _ref_sums(ref_tile, offsets, th)
    e_dma.wait()
    for g0 in range(0, num_cands, _CAND_GROUP):
        cg = list(range(g0, min(g0 + _CAND_GROUP, num_cands)))
        costs = _fullk_group(
            consts_ref, planes_ref, e_win, ref_tile, dirx, diry,
            num_slices, cg, offsets, s_r, s_rr,
        )
        for c in cg:
            cost_ref[c] = costs[c]


def _fixup_kernel(
    flags_ref,  # SMEM [Ty, Tx] i32 per-tile escape flags from the L1 kernel
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    cost_in_ref,  # VMEM [C, TH, TILE_W] L1 costs (-1 sentinel)
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_out_ref,  # VMEM out [C, TH, TILE_W]
    e_win,
    ref_tile,
    sems,
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """L2: exact recomputation of sentinel-marked costs, skipping clean
    tiles (separate kernel + host-level lax.cond gate, see module
    docstring; an inline @pl.when in the hot kernel measured ~25 us/tile
    even untaken). The flag word is a per-candidate-GROUP bitmask
    (_group_bit), and clean groups of a flagged tile are skipped too —
    the dense per-tile recompute cost is formulation-insensitive, so
    (tile, group) skip granularity is the lever."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # program ids must be read OUTSIDE the pl.when bodies (the interpret
    # path lowers branch bodies as plain lax.cond, where program_id has no
    # lowering rule)
    i = pl.program_id(0)
    j = pl.program_id(1)
    flag = flags_ref[i, j]

    # sentinel passthrough for every candidate; flagged groups overwrite
    # their sentinels below (in-kernel writes execute in program order)
    for c in range(num_cands):
        cost_out_ref[c] = cost_in_ref[c]

    @pl.when(flag != 0)
    def _recompute():
        th = NCC_TILE_H
        ref_dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
            ref_tile,
            sems.at[0],
        )
        ref_dma.start()
        e_dma = pltpu.make_async_copy(
            e_hbm.at[:, pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
            e_win,
            sems.at[1],
        )
        e_dma.start()
        dirx, diry = _tile_grids(consts_ref, i, j, th)
        offsets = _offsets(radius, increment)
        ref_dma.wait()
        s_r, s_rr = _ref_sums(ref_tile, offsets, th)
        e_dma.wait()
        for g0 in range(0, num_cands, _CAND_GROUP):
            cg = list(range(g0, min(g0 + _CAND_GROUP, num_cands)))

            @pl.when((flag & _group_bit(g0)) != 0)
            def _fix_group(cg=cg):
                costs = _fullk_group(
                    consts_ref, planes_ref, e_win, ref_tile, dirx, diry,
                    num_slices, cg, offsets, s_r, s_rr,
                )
                for c in cg:
                    prev = cost_in_ref[c]
                    cost_out_ref[c] = jnp.where(prev < 0.0, costs[c], prev)


#: APDMVS_FLAG_STATS=1 appends per-_fixup_call escape statistics at TRACE
#: time: (flagged_tile_count, total_tiles, per_cand_sentinel_counts).
#: These are traced arrays — a caller must clear the list, trace the
#: program, and return the list's entries as jit outputs (axon has no
#: host callbacks; scripts/flag_stats.py is the harness). Call sites
#: inside lax.map/scan would leak tracers — the harness unrolls the
#: classify chunk map via APDMVS_SWEEP_UNROLL=1. Diagnostic only.
STATS_TRACE: list = []


def _band2_kernel(
    flags_ref,  # SMEM [Ty, Tx] i32 per-tile escape flags from the L1 kernel
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    cost_in_ref,  # VMEM [C, TH, TILE_W] L1 costs (-1 sentinel)
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_out_ref,  # VMEM out [C, TH, TILE_W] (-1 = band2 also missed)
    flag2_ref,  # SMEM out [Ty, Tx] i32 — some sentinel still missed
    e_win,
    ref_tile,
    sems,
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """L2a: TWO dynamic BAND2-slice windows per candidate group instead of
    the full-K select chain (round-5 timeline profiling: the full-K fixup
    branches owned 57% of the pass wall).

    Escaped tiles are depth-edge tiles, where the needed slice indices are
    BIMODAL — one cluster per side of the edge — so two bands anchored at
    the group's closed-form [min, max] k range cover almost every sample
    at ~K/(2*BAND2) of the full-K work. Samples falling between the bands
    stay sentinel (-1) and escalate to the exact full-K _fixup_kernel via
    a second host-level cond (rare: needs 3+ depth levels inside one tile
    or an edge taller than can matter). Band values are bit-exact with the
    full-K path: integer band bases preserve floor/frac and read the same
    E slices. Flag words are per-group bitmasks; clean groups are skipped
    and flags2 carries the escalated groups' bits.

    Measured on v5e: per-tile cost is a WASH vs the full-K fixup (the
    dense recompute is formulation-insensitive; scripts/bench_fixup.py),
    so this path is OFF by default (USE_BAND2) — kept as the recorded
    negative result."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    flag = flags_ref[i, j]
    flag2_ref[i, j] = 0
    for c in range(num_cands):
        cost_out_ref[c] = cost_in_ref[c]

    @pl.when(flag != 0)
    def _recompute():
        th = NCC_TILE_H
        ref_dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
            ref_tile,
            sems.at[0],
        )
        ref_dma.start()
        dirx, diry = _tile_grids(consts_ref, i, j, th)
        offsets = _offsets(radius, increment)
        S = float(len(offsets))
        K = num_slices
        kmaxf = float(K - 1)
        band = min(BAND2, K)
        ref_dma.wait()
        s_r, s_rr = _ref_sums(ref_tile, offsets, th)

        def win_dma(base, dst, sem):
            return pltpu.make_async_copy(
                e_hbm.at[
                    pl.ds(base, band),
                    pl.ds(i * th, th + 2 * PAD_Y),
                    pl.ds(j * TILE_W, 3 * TILE_W),
                ],
                dst,
                sem,
            )

        for g0 in range(0, num_cands, _CAND_GROUP):
            cg = list(range(g0, min(g0 + _CAND_GROUP, num_cands)))

            @pl.when((flag & _group_bit(g0)) != 0)
            def _fix_group(cg=cg):
                fields = {
                    c: _plane_fields(consts_ref, planes_ref, c, dirx, diry)
                    for c in cg
                }
                # closed-form group k range -> the two band bases
                k_lo_all = jnp.asarray(jnp.inf)
                k_hi_all = jnp.asarray(-jnp.inf)
                for c in cg:
                    _, k_c, kx, ky = fields[c]
                    span = radius * (jnp.abs(kx) + jnp.abs(ky))
                    lo = jnp.min(k_c - span)
                    hi = jnp.max(k_c + span)
                    k_lo_all = jnp.minimum(
                        k_lo_all, jnp.where(jnp.isnan(lo), jnp.inf, lo)
                    )
                    k_hi_all = jnp.maximum(
                        k_hi_all, jnp.where(jnp.isnan(hi), -jnp.inf, hi)
                    )
                # all-NaN groups leave the range infinite: anchor the bands
                # anywhere valid (every sample misses and escalates)
                k_lo_all = jnp.where(jnp.isfinite(k_lo_all), k_lo_all, 0.0)
                k_hi_all = jnp.where(jnp.isfinite(k_hi_all), k_hi_all, kmaxf)
                a0 = jnp.clip(
                    jnp.floor(k_lo_all).astype(jnp.int32), 0, max(K - band, 0)
                )
                b0 = jnp.clip(
                    jnp.ceil(k_hi_all).astype(jnp.int32) - (band - 1),
                    0, max(K - band, 0),
                )
                b0 = jnp.maximum(b0, a0)
                a_dma = win_dma(a0, e_win.at[0], sems.at[1])
                b_dma = win_dma(b0, e_win.at[1], sems.at[2])
                a_dma.start()
                b_dma.start()
                a0f = a0.astype(jnp.float32)
                b0f = b0.astype(jnp.float32)
                a_dma.wait()
                b_dma.wait()
                win_a = e_win[0]
                win_b = e_win[1]

                sums = {c: [jnp.zeros((th, TILE_W), jnp.float32) for _ in range(3)]
                        for c in cg}
                miss = {c: jnp.zeros((th, TILE_W), jnp.bool_) for c in cg}
                for (dx, dy) in offsets:
                    r0i, fr = {}, {}
                    acc0 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
                    acc1 = {c: jnp.zeros((th, TILE_W), jnp.float32) for c in cg}
                    for c in cg:
                        _, k_c, kx, ky = fields[c]
                        k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                        in_a = k <= a0f + (band - 1.5)
                        # the B band covers [b0, b0 + band - 1] >= k_hi_all
                        # by construction; only the inter-band gap misses
                        fits = in_a | (k >= b0f)
                        miss[c] = miss[c] | ~fits
                        rel = jnp.where(in_a, k - a0f, k - b0f + band)
                        rel = jnp.clip(rel, 0.0, 2.0 * band - 1.0)
                        r0 = jnp.floor(rel)
                        r0i[c] = r0.astype(jnp.int32)
                        fr[c] = rel - r0
                    prev = {c: None for c in cg}
                    for bb in range(2 * band):
                        src = win_a if bb < band else win_b
                        ev = src[
                            bb % band,
                            PAD_Y + dy : PAD_Y + dy + th,
                            TILE_W + dx : 2 * TILE_W + dx,
                        ].astype(jnp.float32)
                        for c in cg:
                            eq = r0i[c] == bb
                            acc0[c] = jnp.where(eq, ev, acc0[c])
                            if prev[c] is not None:
                                acc1[c] = jnp.where(prev[c], ev, acc1[c])
                            prev[c] = eq
                    rv = ref_tile[
                        PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx
                    ]
                    for c in cg:
                        sv = acc0[c] * (1.0 - fr[c]) + acc1[c] * fr[c]
                        sums[c][0] = sums[c][0] + sv
                        sums[c][1] = sums[c][1] + sv * sv
                        sums[c][2] = sums[c][2] + rv * sv

                missed_bits = jnp.asarray(0, jnp.int32)
                for c in cg:
                    cost = _ncc_epilogue(
                        s_r, s_rr, sums[c][0], sums[c][1], sums[c][2], S
                    )
                    oob = _center_oob(consts_ref, 0, dirx, diry, fields[c][0])
                    cost = jnp.where(oob, COST_MAX, cost)
                    prev_c = cost_in_ref[c]
                    need = prev_c < 0.0
                    # NaN plane fields make miss False by comparison
                    # semantics; force those to stay sentinel (the full-K
                    # escalation handles them exactly)
                    bad = miss[c] | jnp.isnan(fields[c][1])
                    fixed = jnp.where(bad, -1.0, cost)
                    out = jnp.where(need, fixed, prev_c)
                    missed_bits = missed_bits | jnp.where(
                        jnp.any(need & bad), _group_bit(c), 0
                    )
                    cost_out_ref[c] = out
                flag2_ref[i, j] = flag2_ref[i, j] | missed_bits


def _fixup_pallas(kernel_fn, n_out, flags, consts, planes_cf, cost1, E_pad,
                  ref_pad, interpret):
    """Shared pallas_call plumbing for the L2a/L2b fixup kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _, H, W = planes_cf.shape
    K = E_pad.shape[0]
    Ty, Tx = H // NCC_TILE_H, W // TILE_W
    if n_out == 2:  # band2: (A, B) band windows
        band = min(BAND2, K)
        e_scratch = pltpu.VMEM(
            (2, band, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), E_pad.dtype
        )
        n_sems = 3
    else:  # full-K
        e_scratch = pltpu.VMEM(
            (K, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), E_pad.dtype
        )
        n_sems = 2
    out_shape = [jax.ShapeDtypeStruct((C, H, W), jnp.float32)]
    out_specs = [
        pl.BlockSpec(
            (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        )
    ]
    if n_out == 2:
        out_shape.append(jax.ShapeDtypeStruct((Ty, Tx), jnp.int32))
        out_specs.append(
            pl.BlockSpec((Ty, Tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
        )
    return pl.pallas_call(
        kernel_fn,
        out_shape=out_shape if n_out == 2 else out_shape[0],
        grid=(Ty, Tx),
        in_specs=[
            pl.BlockSpec((Ty, Tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, NCC_TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs if n_out == 2 else out_specs[0],
        scratch_shapes=[
            e_scratch,
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        interpret=interpret,
    )(flags, consts, planes_cf, cost1, E_pad, ref_pad)


def _fixup_call(flags, consts, planes_cf, cost1, E_pad, ref_pad,
                num_slices, radius, increment, interpret):
    """Cond-gated L2 dispatch: L2a two-band recompute when some tile
    flagged, escalating to the exact full-K L2b only for samples the two
    bands miss (host-level lax.cond chain — calls with no escapes pay
    nothing; under vmap the conds degrade to selects and all branches
    run). APDMVS_BAND2=1 routes through the two-band L2a first (measured
    a wash on v5e — default off, see USE_BAND2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if os.environ.get("APDMVS_FLAG_STATS"):
        STATS_TRACE.append(
            (jnp.sum(flags != 0), flags.size,
             jnp.sum(cost1 < 0.0, axis=tuple(range(1, cost1.ndim))))
        )

    C = planes_cf.shape[0]
    common = dict(
        num_slices=num_slices, num_cands=C, radius=radius, increment=increment
    )
    fullk = functools.partial(_fixup_kernel, **common)
    band2 = functools.partial(_band2_kernel, **common)

    def fix_fullk(flags_, cost_):
        return _fixup_pallas(
            fullk, 1, flags_, consts, planes_cf, cost_, E_pad, ref_pad,
            interpret,
        )

    if not USE_BAND2:
        return jax.lax.cond(
            jnp.any(flags != 0),
            lambda c: fix_fullk(flags, c),
            lambda c: c,
            cost1,
        )

    def fix(cost1_):
        cost2, flags2 = _fixup_pallas(
            band2, 2, flags, consts, planes_cf, cost1_, E_pad, ref_pad,
            interpret,
        )
        return jax.lax.cond(
            jnp.any(flags2 != 0),
            lambda c: fix_fullk(flags2, c),
            lambda c: c,
            cost2,
        )

    return jax.lax.cond(jnp.any(flags != 0), fix, lambda c: c, cost1)


# ---------------------------------------------------------------------------
# Rebased volumes: R[j, p] = E[b(p) + j - J, p]
# ---------------------------------------------------------------------------
#
# The direct kernel's band must cover the k spread across a whole
# (NCC_TILE_H x 128) tile — ~16 slices at VGA on sloped scenes, and far
# beyond SUB_BAND wherever the tile crosses a depth edge. Rebasing the
# volume on a per-pixel base slice b(p) (the slice of the *current depth
# estimate* at p) makes the index j = k_cand(p+D) - b(p+D) the *deviation
# of the candidate from the current estimate at the sample position* —
# measured ~0.6 slices (p99 ~12) on real plane fields, because candidate
# planes and the current depth both follow the local surface slope AND its
# discontinuities (the base map jumps with the scene, absorbing depth
# edges entirely). The fetch loop then runs over a static RB_BAND-slice
# band of R; candidates deviating beyond it (wild hypotheses) take the L2
# fixup from E, so the result is exact everywhere.

J_REBASE = 12  # R covers b(p) +- J_REBASE slices
J2_REBASE = 2 * J_REBASE + 1


def _rebase_kernel(e_ref, bk_ref, r_ref, bf_ref, *, num_slices, j2):
    """R[j] = E[clip(round(base_k), J, K-1-J) + j - J], bf = the clipped
    integer base as f32. Pointwise in pixels — no halo needed; runs once
    per (view, iteration) and amortizes over every cost call."""
    J = (j2 - 1) // 2
    b = jnp.clip(
        jnp.round(bk_ref[...]), float(J), float(num_slices - 1 - J)
    )
    bf_ref[...] = b
    bi = b.astype(jnp.int32)
    accs = [jnp.zeros(b.shape, jnp.float32) for _ in range(j2)]
    for s in range(num_slices):
        ev = e_ref[s].astype(jnp.float32)
        jf = s - bi + J  # slice s lands in output row jf
        for j in range(j2):
            accs[j] = jnp.where(jf == j, ev, accs[j])
    for j in range(j2):
        r_ref[j] = accs[j].astype(r_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_slices", "j2", "interpret"))
def build_rebased_view(
    E_pad: jax.Array,  # [K, PH, PW] bf16/f32
    base_k: jax.Array,  # [PH, PW] f32 — fractional slice of the base depth
    num_slices: int,
    j2: int = J2_REBASE,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (R [j2, PH, PW] same dtype as E, bf [PH, PW] f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, PH, PW = E_pad.shape
    if interpret is None:
        if jax.default_backend() == "cpu":
            J = (j2 - 1) // 2
            b = jnp.clip(jnp.round(base_k), J, num_slices - 1 - J)
            bi = b.astype(jnp.int32)
            idx = bi[None] + (jnp.arange(j2) - J)[:, None, None]
            R = jnp.stack(
                [jnp.take_along_axis(E_pad, idx[j][None], axis=0)[0]
                 for j in range(j2)]
            ).astype(E_pad.dtype)
            return R, b.astype(jnp.float32)
        interpret = False
    kernel = functools.partial(_rebase_kernel, num_slices=num_slices, j2=j2)
    R, bf = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((j2, PH, PW), E_pad.dtype),
            jax.ShapeDtypeStruct((PH, PW), jnp.float32),
        ),
        grid=(PH // TILE_H, PW // TILE_W),
        in_specs=[
            pl.BlockSpec(
                (K, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((j2, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(E_pad, base_k)
    return R, bf


# ---------------------------------------------------------------------------
# Public evaluators
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_rebased_cost_view(
    R_pad: jax.Array,  # [J2, PH, PW] rebased volume
    bf_pad: jax.Array,  # [PH, PW] f32 clipped base map
    E_pad: jax.Array,  # [K, PH, PW] full volume (L2 fixup source)
    ref_pad: jax.Array,  # [PH, PW] f32
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [1, NCONST]
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact NCC costs [C, H, W] through the rebased fast path (results are
    identical to :func:`ncc_volume_cost_view`; only the fetch strategy
    differs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: interpret-mode Pallas execution is ~3 orders
            # slower than the XLA mirror (72 s vs <1 s for one VGA call) —
            # route through the mirror. interpret=True forces the
            # interpreter for kernel-equivalence tests.
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    J2 = R_pad.shape[0]
    assert H % NCC_TILE_H == 0 and W % TILE_W == 0

    kernel = functools.partial(
        _kernel_rb,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
        j2=J2,
    )
    grid = (H // NCC_TILE_H, W // TILE_W)
    cost1, flags = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            jax.ShapeDtypeStruct(grid, jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, NCC_TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(grid, lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((J2, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), R_pad.dtype),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(consts, planes, R_pad, bf_pad, ref_pad)
    return _fixup_call(
        flags, consts, planes, cost1, E_pad, ref_pad,
        num_slices, radius, increment, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_volume_cost_view(
    E_pad: jax.Array,  # [K, H+2*PAD_Y, W+2*PAD_X] bf16/f32
    ref_pad: jax.Array,  # [H+2*PAD_Y, W+2*PAD_X] f32
    planes: jax.Array,  # [C, 4, H, W] f32 — (n_cam, w) channel-first
    consts: jax.Array,  # [1, NCONST] f32 (pack_consts)
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact fused plain-NCC costs of C candidate plane fields against one
    source view via its plane-sweep volume. Returns [C, H, W] f32.

    H must be a multiple of NCC_TILE_H and W of TILE_W (callers pad the
    pixel grid).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: route through the XLA mirror (see
            # ncc_rebased_cost_view).
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    K = E_pad.shape[0]
    assert H % NCC_TILE_H == 0 and W % TILE_W == 0
    assert E_pad.shape[1] == H + 2 * PAD_Y and E_pad.shape[2] == W + 2 * PAD_X

    kernel = functools.partial(
        _kernel,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
    )
    grid = (H // NCC_TILE_H, W // TILE_W)
    cost1, flags = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            jax.ShapeDtypeStruct(grid, jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, NCC_TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(grid, lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(consts, planes, E_pad, ref_pad)
    return _fixup_call(
        flags, consts, planes, cost1, E_pad, ref_pad,
        num_slices, radius, increment, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_volume_cost_view_fullk(
    E_pad: jax.Array,
    ref_pad: jax.Array,
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact NCC costs via the full-K select kernel — no L1 band, no
    flags. For hypotheses whose slice index is structurally unbounded
    (refinement random-depth combos). ~K/SUB_BAND x the L1 cost."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    K = E_pad.shape[0]
    assert H % NCC_TILE_H == 0 and W % TILE_W == 0

    kernel = functools.partial(
        _kernel_fullk,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
    )
    grid = (H // NCC_TILE_H, W // TILE_W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, NCC_TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((K, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(consts, planes, E_pad, ref_pad)


# ---------------------------------------------------------------------------
# Geometric-consistency cost over depth volumes
# ---------------------------------------------------------------------------

# geom consts layout (one (1, 33) f32 SMEM block):
# [fx, fy, cx, cy, u_min, du, M(9), b(3), A(9), t'(3), src_w, src_h, row0]
_NGEOM = 33
GEOM_COST_MAX = 3.0


def pack_geom_consts(
    K0: jax.Array, M: jax.Array, b: jax.Array, A: jax.Array, t2: jax.Array,
    u_min, du, src_w: int, src_h: int, row0=0
) -> jax.Array:
    """A = K_ref R_ref R_src^T K_src^{-1}; t2 = K_ref R_ref (c_src - c_ref):
    closed-form reprojection of (src pixel, src depth) back into the ref
    view (reference ComputeGeomConsistencyCost: APD.cu:752-789)."""
    return jnp.concatenate(
        [
            jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]),
            jnp.stack([jnp.asarray(u_min, jnp.float32), jnp.asarray(du, jnp.float32)]),
            M.reshape(-1).astype(jnp.float32),
            b.reshape(-1).astype(jnp.float32),
            A.reshape(-1).astype(jnp.float32),
            t2.reshape(-1).astype(jnp.float32),
            jnp.asarray([src_w, src_h], jnp.float32),
            jnp.asarray(row0, jnp.float32).reshape(1),
        ]
    ).reshape(1, _NGEOM).astype(jnp.float32)


def _geom_kernel(
    consts_ref,  # SMEM [1, _NGEOM]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W]
    d_ref,  # VMEM [K, TILE_H, TILE_W] depth-volume block (no halo needed)
    cost_ref,  # VMEM out [C, TILE_H, TILE_W]
    *,
    num_slices: int,
    num_cands: int,
):
    """Nearest-slice depth lookup + analytic reprojection. The lookup
    selects over ALL K slices (exact — no band, so no depth-edge clamp
    divergence; there is no 36-offset loop here, so full-K is cheap)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    fx = consts_ref[0, 0]
    fy = consts_ref[0, 1]
    cx = consts_ref[0, 2]
    cy = consts_ref[0, 3]
    u_min = consts_ref[0, 4]
    du = consts_ref[0, 5]
    M = [consts_ref[0, 6 + m] for m in range(9)]
    b0, b1, b2 = consts_ref[0, 15], consts_ref[0, 16], consts_ref[0, 17]
    A = [consts_ref[0, 18 + m] for m in range(9)]
    t0, t1, t2 = consts_ref[0, 27], consts_ref[0, 28], consts_ref[0, 29]
    src_w = consts_ref[0, 30]
    src_h = consts_ref[0, 31]
    row0 = consts_ref[0, 32]

    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32) + row0
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy

    # per-candidate nearest-slice indices (shared slice loads across
    # candidates, like the NCC kernels)
    ri = []
    us = []
    for c in range(num_cands):
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        u = -(nx * dirx + ny * diry + nz) / w
        us.append(u)
        k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
        ri.append(jnp.round(k).astype(jnp.int32))
    sd = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(num_cands)]
    for bb in range(num_slices):
        dv = d_ref[bb].astype(jnp.float32)
        for c in range(num_cands):
            sd[c] = jnp.where(ri[c] == bb, dv, sd[c])

    for c in range(num_cands):
        u = us[c]
        # warped src position (analytic)
        qx = M[0] * dirx + M[1] * diry + M[2] + b0 * u
        qy = M[3] * dirx + M[4] * diry + M[5] + b1 * u
        qz = M[6] * dirx + M[7] * diry + M[8] + b2 * u
        px = qx / qz
        py = qy / qz
        oob = (px < 0.0) | (px >= src_w) | (py < 0.0) | (py >= src_h)

        # reproject (src pixel, src depth) into ref: q2 = sd * A ps~ + t'
        rx_ = A[0] * px + A[1] * py + A[2]
        ry_ = A[3] * px + A[4] * py + A[5]
        rz_ = A[6] * px + A[7] * py + A[8]
        q2x = sd[c] * rx_ + t0
        q2y = sd[c] * ry_ + t1
        q2z = sd[c] * rz_ + t2
        bx = q2x / q2z
        by = q2y / q2z
        err = jnp.sqrt((xs - bx) * (xs - bx) + (ys - by) * (ys - by))
        cost = jnp.minimum(err, GEOM_COST_MAX)
        cost = jnp.where((sd[c] == 0.0) | oob, GEOM_COST_MAX, cost)
        cost_ref[c] = cost


def geom_volume_cost_view_ref(
    D: jax.Array,  # [K, H, W]
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [1, _NGEOM]
    num_slices: int,
) -> jax.Array:
    """Pure-XLA mirror of :func:`geom_volume_cost_view` (exact
    nearest-slice selection)."""
    C, _, H, W = planes.shape
    fx, fy, cx, cy, u_min, du = (consts[0, m] for m in range(6))
    M = consts[0, 6:15].reshape(3, 3)
    b = consts[0, 15:18]
    A = consts[0, 18:27].reshape(3, 3)
    t2 = consts[0, 27:30]
    src_w, src_h = consts[0, 30], consts[0, 31]
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    ys = ys + consts[0, 32]
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy
    out = []
    for c in range(C):
        n = planes[c]
        u = -(n[0] * dirx + n[1] * diry + n[2]) / n[3]
        k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
        ri = jnp.round(k).astype(jnp.int32)
        sd = jnp.take_along_axis(D, ri[None], axis=0)[0].astype(jnp.float32)
        qx = M[0, 0] * dirx + M[0, 1] * diry + M[0, 2] + b[0] * u
        qy = M[1, 0] * dirx + M[1, 1] * diry + M[1, 2] + b[1] * u
        qz = M[2, 0] * dirx + M[2, 1] * diry + M[2, 2] + b[2] * u
        px = qx / qz
        py = qy / qz
        oob = (px < 0.0) | (px >= src_w) | (py < 0.0) | (py >= src_h)
        rx_ = A[0, 0] * px + A[0, 1] * py + A[0, 2]
        ry_ = A[1, 0] * px + A[1, 1] * py + A[1, 2]
        rz_ = A[2, 0] * px + A[2, 1] * py + A[2, 2]
        bx = (sd * rx_ + t2[0]) / (sd * rz_ + t2[2])
        by = (sd * ry_ + t2[1]) / (sd * rz_ + t2[2])
        err = jnp.sqrt((xs - bx) ** 2 + (ys - by) ** 2)
        cost = jnp.minimum(err, GEOM_COST_MAX)
        out.append(jnp.where((sd == 0.0) | oob, GEOM_COST_MAX, cost))
    return jnp.stack(out)


@functools.partial(
    jax.jit, static_argnames=("num_slices", "interpret")
)
def geom_volume_cost_view(
    D: jax.Array,  # [K, Hp, Wp] f32/bf16 depth volume (unpadded spatially)
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [1, _NGEOM]
    num_slices: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Geometric-consistency costs [C, H, W] via the depth volume."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: XLA mirror (exact nearest-slice);
            # interpret=True forces the Pallas interpreter.
            return geom_volume_cost_view_ref(D, planes, consts, num_slices)
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    K = D.shape[0]
    kernel = functools.partial(
        _geom_kernel, num_slices=num_slices, num_cands=C
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid=(H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec((1, _NGEOM), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(consts, planes, D)


# ---------------------------------------------------------------------------
# XLA reference implementation (same volume semantics, for tests + CPU)
# ---------------------------------------------------------------------------


def ncc_volume_cost_view_ref(
    E_pad: jax.Array,
    ref_pad: jax.Array,
    planes: jax.Array,
    consts: jax.Array,
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
) -> jax.Array:
    """Pure-XLA mirror of the kernels (full-range interpolation).

    Structured compile-friendly: a ``lax.scan`` over the window offsets
    with candidates vectorized, so the jaxpr stays small — this is also
    the production CPU path (auto-redirect in the evaluators), not just a
    test oracle."""
    C, _, H, W = planes.shape
    K = E_pad.shape[0]
    fx, fy, cx, cy, u_min, du = (consts[0, m] for m in range(6))
    M = consts[0, 6:15].reshape(3, 3)
    b = consts[0, 15:18]
    src_w, src_h = consts[0, 18], consts[0, 19]
    row0 = consts[0, 20]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ys = ys + row0
    offsets = jnp.asarray(_offsets(radius, increment), jnp.int32)  # [S, 2]
    S = float(offsets.shape[0])
    n = planes[:, :3]  # [C, 3, H, W]
    w = planes[:, 3]  # [C, H, W]

    def body(carry, off):
        s_r, s_rr, s_s, s_ss, s_rs = carry
        dx, dy = off[0], off[1]
        dxf = dx.astype(jnp.float32)
        dyf = dy.astype(jnp.float32)
        dirx = (xs + dxf - cx) / fx
        diry = (ys + dyf - cy) / fy
        u = -(n[:, 0] * dirx + n[:, 1] * diry + n[:, 2]) / w  # [C, H, W]
        k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
        E_sh = jax.lax.dynamic_slice(
            E_pad, (0, PAD_Y + dy, PAD_X + dx), (K, H, W)
        )
        k0 = jnp.floor(k).astype(jnp.int32)
        k1 = jnp.minimum(k0 + 1, K - 1)
        f = k - k0.astype(jnp.float32)
        e0 = jax.vmap(
            lambda kk: jnp.take_along_axis(E_sh, kk[None], axis=0)[0]
        )(k0).astype(jnp.float32)
        e1 = jax.vmap(
            lambda kk: jnp.take_along_axis(E_sh, kk[None], axis=0)[0]
        )(k1).astype(jnp.float32)
        sv = e0 * (1.0 - f) + e1 * f  # [C, H, W]
        rv = jax.lax.dynamic_slice(ref_pad, (PAD_Y + dy, PAD_X + dx), (H, W))
        return (
            s_r + rv, s_rr + rv * rv, s_s + sv, s_ss + sv * sv, s_rs + rv * sv
        ), None

    zc = jnp.zeros((C, H, W), jnp.float32)
    z = jnp.zeros((H, W), jnp.float32)
    (s_r, s_rr, s_s, s_ss, s_rs), _ = jax.lax.scan(
        body, (z, z, zc, zc, zc), offsets
    )
    inv = 1.0 / S
    mr, ms = s_r * inv, s_s * inv
    var_r = s_rr * inv - mr * mr
    var_s = s_ss * inv - ms * ms
    cov = s_rs * inv - mr * ms
    cost = jnp.clip(1.0 - cov * jax.lax.rsqrt(jnp.maximum(var_r * var_s, 1e-30)),
                    0.0, COST_MAX)
    cost = jnp.where((var_r < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy
    u_c = -(n[:, 0] * dirx + n[:, 1] * diry + n[:, 2]) / w  # [C, H, W]
    qx = M[0, 0] * dirx + M[0, 1] * diry + M[0, 2] + b[0] * u_c
    qy = M[1, 0] * dirx + M[1, 1] * diry + M[1, 2] + b[1] * u_c
    qz = M[2, 0] * dirx + M[2, 1] * diry + M[2, 2] + b[2] * u_c
    oob = (qx / qz < 0) | (qx / qz >= src_w) | (qy / qz < 0) | (qy / qz >= src_h)
    return jnp.where(oob, COST_MAX, cost)


# ---------------------------------------------------------------------------
# Sweep evaluator: rebased L1 with auto-centered per-candidate bands
# ---------------------------------------------------------------------------
#
# The DepthToWeak / LocalRefine disparity sweeps (classify.py) evaluate S
# candidates that share the pixel's normal and differ by an ARITHMETIC
# inverse-depth step: k_s(p) = k_mid(p) + (s - mid) * delta(p). On ragged
# post-propagation fields the direct kernel's per-tile shared band blows
# up (depth edges inflate the tile k-spread) and the L2 full-K fixup fires
# on essentially every call — measured ~1/3 of the whole pass (PERF_NOTES
# round-4 closing). Rebasing on the MID step's slice map absorbs the
# field's slopes and edges exactly as the propagation rebase does, and
# each candidate's residual index is ~(s - mid) * delta(p): a narrow band
# placed per (tile, candidate). Round-5: the band is AUTO-CENTERED on the
# candidate's measured raw-index range (a cheap elementwise min/max first
# pass) instead of a global round((s - mid) * delta_bar) offset — the
# global offset mis-placed the band wherever the per-pixel baseline
# deviated from the mean, escaping whole tiles to the L2 fixup for no
# reason. Only genuine > RB_BAND spreads (depth edges) still escape.

#: Rebase window for the sweep evaluator (covers |s - mid| * delta <=
#: (SWEEP_J2 - 1)/2 - band). Env-at-import so classify.SWEEP_CHUNK
#: experiments can pair e.g. chunk 16 with J2 81 (scripts/ab_pass.py).
SWEEP_J2 = int(os.environ.get("APDMVS_SWEEP_J2", "49"))


def _kernel_rb_offs(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TH, TILE_W]
    r_hbm,  # ANY [J2, PH, PW] rebased volume (mid-step base)
    bf_hbm,  # ANY [PH, PW] f32 clipped base map
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TH, TILE_W] (-1 = needs exact fixup)
    flag_ref,  # SMEM out [Ty, Tx] i32
    r_win,  # scratch VMEM [J2, TH + 2*PAD_Y, 3*TILE_W]
    bf_win,  # scratch VMEM [TH + 2*PAD_Y, 3*TILE_W] f32
    ref_tile,  # scratch VMEM [TH + 2*PAD_Y, 3*TILE_W] f32
    sems,
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
    j2: int,
):
    """Sweep L1: AUTO-CENTERED per-candidate dynamic bands.

    Round-5 revision: the original form placed each candidate's band at a
    GLOBAL offset round((s - mid) * delta_bar) from SMEM. delta(p) is set
    by the pixel's mean SELECTED-view baseline, which jumps wherever view
    selection differs from the average, so whole tiles escaped to the L2
    fixup for a merely mis-PLACED band (the fixup owns most of the pass
    wall; scripts/timeline_pass.py). Instead, a cheap first pass
    accumulates each candidate's raw index range over the tile
    (elementwise min/max, one scalar reduce per candidate) and centers
    the band on it: band placement errors vanish, and only tiles whose
    per-candidate spread genuinely exceeds RB_BAND (depth edges under the
    window) still escape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th = NCC_TILE_H
    i = pl.program_id(0)
    j = pl.program_id(1)
    J = (j2 - 1) // 2

    def win(hbm, dst, sem):
        return pltpu.make_async_copy(
            hbm.at[..., pl.ds(i * th, th + 2 * PAD_Y), pl.ds(j * TILE_W, 3 * TILE_W)],
            dst,
            sem,
        )

    ref_dma = win(ref_hbm, ref_tile, sems.at[0])
    bf_dma = win(bf_hbm, bf_win, sems.at[1])
    r_dma = win(r_hbm, r_win, sems.at[2])
    ref_dma.start()
    bf_dma.start()
    r_dma.start()

    dirx, diry = _tile_grids(consts_ref, i, j, th)
    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    kmaxf = float(num_slices - 1)

    ref_dma.wait()
    s_r, s_rr = _ref_sums(ref_tile, offsets, th)
    bf_dma.wait()
    r_dma.wait()

    fields = [
        _plane_fields(consts_ref, planes_ref, c, dirx, diry)
        for c in range(num_cands)
    ]

    # pass 1: per-candidate raw-index range over all samples (elementwise
    # accumulators; one scalar reduce per candidate at the end)
    lo_e = [None] * num_cands
    hi_e = [None] * num_cands
    for (dx, dy) in offsets:
        bfs = bf_win[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
        for c in range(num_cands):
            _, k_c, kx, ky = fields[c]
            raw = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf) - bfs
            lo_e[c] = raw if lo_e[c] is None else jnp.minimum(lo_e[c], raw)
            hi_e[c] = raw if hi_e[c] is None else jnp.maximum(hi_e[c], raw)

    need_e = jnp.asarray(0, jnp.int32)
    for c in range(num_cands):
        u_c, k_c, kx, ky = fields[c]
        jmin = jnp.min(lo_e[c]) + J
        jmax = jnp.max(hi_e[c]) + J
        # NaN ranges (degenerate w) propagate -> fits False -> L2
        center = (jmin + jmax) * 0.5
        b_lo = jnp.clip(
            jnp.floor(center).astype(jnp.int32) - RB_BAND // 2,
            0, max(j2 - RB_BAND, 0),
        )
        b_lof = b_lo.astype(jnp.float32)
        sums = [jnp.zeros((th, TILE_W), jnp.float32) for _ in range(3)]
        for (dx, dy) in offsets:
            bfs = bf_win[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
            raw = k - bfs + J
            rel = jnp.clip(raw - b_lof, 0.0, RB_BAND - 1.0)
            r0 = jnp.floor(rel)
            r0i = r0.astype(jnp.int32)
            fr = rel - r0
            acc0 = jnp.zeros((th, TILE_W), jnp.float32)
            acc1 = jnp.zeros((th, TILE_W), jnp.float32)
            prev = None
            for bb in range(RB_BAND):
                ev = r_win[
                    b_lo + bb, PAD_Y + dy : PAD_Y + dy + th,
                    TILE_W + dx : 2 * TILE_W + dx,
                ].astype(jnp.float32)
                eq = r0i == bb
                acc0 = jnp.where(eq, ev, acc0)
                if prev is not None:
                    acc1 = jnp.where(prev, ev, acc1)
                prev = eq
            rv = ref_tile[PAD_Y + dy : PAD_Y + dy + th, TILE_W + dx : 2 * TILE_W + dx]
            sv = acc0 * (1.0 - fr) + acc1 * fr
            sums[0] = sums[0] + sv
            sums[1] = sums[1] + sv * sv
            sums[2] = sums[2] + rv * sv

        cost = _ncc_epilogue(s_r, s_rr, sums[0], sums[1], sums[2], S)
        oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
        fits = (jmin >= b_lof) & (jmax <= b_lof + RB_BAND - 1.5)
        need_e = need_e | jnp.where(fits, 0, _group_bit(c))
        cost_ref[c] = jnp.where(oob, COST_MAX, jnp.where(fits, cost, -1.0))
    flag_ref[i, j] = need_e


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_rebased_sweep_cost_view(
    R_pad: jax.Array,  # [J2, PH, PW] mid-step-rebased volume
    bf_pad: jax.Array,  # [PH, PW] f32 clipped base map
    E_pad: jax.Array,  # [K, PH, PW] full volume (L2 fixup source)
    ref_pad: jax.Array,  # [PH, PW] f32
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [1, NCONST]
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """Exact sweep NCC costs [C, H, W]: rebased L1 at AUTO-CENTERED
    per-candidate bands + the cond-gated L2 fixup (results identical to
    :func:`ncc_volume_cost_view`; only the fetch strategy differs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    J2 = R_pad.shape[0]
    assert H % NCC_TILE_H == 0 and W % TILE_W == 0

    kernel = functools.partial(
        _kernel_rb_offs,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
        j2=J2,
    )
    grid = (H // NCC_TILE_H, W // TILE_W)
    cost1, flags = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            jax.ShapeDtypeStruct(grid, jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, NCC_TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, NCC_TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(grid, lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((J2, NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), R_pad.dtype),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.VMEM((NCC_TILE_H + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(consts, planes, R_pad, bf_pad, ref_pad)
    return _fixup_call(
        flags, consts, planes, cost1, E_pad, ref_pad,
        num_slices, radius, increment, interpret,
    )
