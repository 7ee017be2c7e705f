"""Fused multi-candidate NCC cost evaluation over plane-sweep volumes.

The hot kernel of the framework (replaces the XLA formulation of
ComputeBilateralNCCOld + ComputeMultiViewCostVector, reference:
APD.cu:530-614, 696-716, whose gather lowering is ~50 cycles/element —
PERF_NOTES.md).

Per (view, pixel-tile) the hot kernel:
  1. DMAs the halo'd spatial window of the padded volume (all K slices of
     E, or the 2J+1 rebased slices of R) and the padded ref image into
     VMEM,
  2. computes the fractional slice index k = (1/depth - u_min)/du of every
     candidate plane once per candidate (k is exactly linear in the window
     offset — pure VPU math, the depth-only warp identity, ops/__init__),
  3. interpolates along K with a fixed fully-unrolled select band sized by
     the candidate's closed-form index range; (tile, candidate)s whose
     range escapes the band are sentinel-marked and recomputed exactly by
     a separate fixup kernel (_fixup_kernel), so results match the XLA
     mirror everywhere,
  4. accumulates NCC sums for all candidates x window samples against one
     VMEM residency of the window,
  5. emits cost = clamp(1 - ncc, 0, 2) with the reference's degenerate-
     variance and out-of-source-bounds cost_max policy (APD.cu:541-613).

Spatial padding convention: arrays are padded by (PAD_Y, PAD_X) =
(8, 128) per side; E is *built* on the padded pixel grid (ops/volume
build over padded dirs) so halo samples are exact, not border-clamped.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_Y = 8
PAD_X = 128
TILE_H = 8
TILE_W = 128
SUB_BAND = 32  # direct-kernel interpolation band (slices). The base slice
# is one scalar per (tile, candidate), so the band must cover the k spread
# across the whole 8x128 tile plus the +-radius window — measured ~16
# slices at VGA (PERF_NOTES round-3); ranges that escape are exact-fixed
# by _fixup_kernel.
COST_MAX = 2.0
MIN_VAR = 1e-5

# consts vector layout (one (1, 20) f32 SMEM block):
# [fx, fy, cx, cy, u_min, du, M00..M22 (9), b0, b1, b2, src_w, src_h]
_NCONST = 20


def pack_consts(K0: jax.Array, M: jax.Array, b: jax.Array, u_min, du,
                src_w: int, src_h: int) -> jax.Array:
    return jnp.concatenate(
        [
            jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]),
            jnp.stack([jnp.asarray(u_min, jnp.float32), jnp.asarray(du, jnp.float32)]),
            M.reshape(-1).astype(jnp.float32),
            b.reshape(-1).astype(jnp.float32),
            jnp.asarray([src_w, src_h], jnp.float32),
        ]
    ).reshape(1, _NCONST).astype(jnp.float32)


def _offsets(radius: int, increment: int):
    vals = list(range(-radius, radius + 1, increment))
    return [(dx, dy) for dx in vals for dy in vals]


def _accumulate_ncc_unrolled(
    winref, fields, ref_vals, offsets, c0, c0f, band
):
    """NCC partial sums via a fixed fully-unrolled ``band``-slice select
    loop starting at slice ``c0`` (in-kernel indices clamp to the band —
    callers flag out-of-band tiles and exact-recompute them, see
    _kernel/_kernel_rb). This is the hot structure: Mosaic pipelines the
    straight-line unrolled body; fori_loop variants measured ~3.5 us of
    overhead PER LOOP (36 per candidate!) and lax.cond per candidate
    ~0.8 s/pass of spill — both rejected empirically (PERF_NOTES)."""
    s_s = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_ss = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_rs = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for s_idx, (dx, dy) in enumerate(offsets):
        rel = jnp.clip(fields[s_idx] - c0f, 0.0, band - 1.0)
        r0 = jnp.floor(rel)
        f = rel - r0
        r0i = r0.astype(jnp.int32)
        acc0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc1 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        prev_eq = None
        for bb in range(band):
            ev = winref[
                c0 + bb,
                TILE_H + dy : 2 * TILE_H + dy,
                TILE_W + dx : 2 * TILE_W + dx,
            ].astype(jnp.float32)
            eq = r0i == bb
            acc0 = jnp.where(eq, ev, acc0)
            if prev_eq is not None:
                acc1 = jnp.where(prev_eq, ev, acc1)
            prev_eq = eq
        sv = acc0 * (1.0 - f) + acc1 * f
        rv = ref_vals[s_idx]
        s_s = s_s + sv
        s_ss = s_ss + sv * sv
        s_rs = s_rs + rv * sv
    return s_s, s_ss, s_rs


def _accumulate_ncc(
    winref, fields, ref_vals, offsets, c0, c0f, trips, chunk, nmax
):
    """NCC partial sums via adaptive-trip chunked select loops — exact for
    ANY index range (trip bases clip to ``nmax - chunk``; the overlap
    re-selects identical values — the equality select is idempotent).

    Used ONLY on the rare exact-fixup path: the fori_loop costs ~3.5 us
    per invocation, far too slow for the hot path (measured 342 ms/call
    when used for everything) but fine for the few flagged tiles.

    fields[s]: the fractional slice-index field of offset s, already
    expressed relative to winref's slice axis. Requires fields >= c0 - ulp
    and floor(fields)+1 <= c0 + trips*chunk (callers size trips so).
    """
    s_s = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_ss = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_rs = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for s_idx, (dx, dy) in enumerate(offsets):
        # max() guards the ulp where the field lands just under c0
        rel = jnp.maximum(fields[s_idx] - c0f, 0.0)
        r0 = jnp.floor(rel)
        f = rel - r0
        r0i = r0.astype(jnp.int32)

        def body(ci, carry, _r0i=r0i, _dx=dx, _dy=dy):
            a0, a1 = carry
            base = jnp.minimum(c0 + ci * chunk, nmax - chunk)
            rbase = base - c0
            for bb in range(chunk):
                ev = winref[
                    base + bb,
                    TILE_H + _dy : 2 * TILE_H + _dy,
                    TILE_W + _dx : 2 * TILE_W + _dx,
                ].astype(jnp.float32)
                a0 = jnp.where(_r0i == rbase + bb, ev, a0)
                a1 = jnp.where(_r0i == rbase + bb - 1, ev, a1)
            return (a0, a1)

        z = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc0, acc1 = jax.lax.fori_loop(0, trips, body, (z, z))
        sv = acc0 * (1.0 - f) + acc1 * f
        rv = ref_vals[s_idx]
        s_s = s_s + sv
        s_ss = s_ss + sv * sv
        s_rs = s_rs + rv * sv
    return s_s, s_ss, s_rs


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


def _kernel(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W] (n_cam, w) fields
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TILE_H, TILE_W] f32 (-1 = needs exact fixup)
    flag_ref,  # SMEM out [Ty, Tx] i32 — any candidate escaped, per tile
    e_win,  # scratch VMEM [K, 3*TILE_H, 3*TILE_W]
    ref_tile,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    sems,  # DMA semaphores (2,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
    mark_escapes: bool,
):
    """Direct (non-rebased) kernel.

    v2 design (PERF_NOTES round-3 ledger):
    - *Linear k*: the slice index is exactly linear in the window offset
      (u(p+Δ) = u(p) − (nxΔx/fx + nyΔy/fy)/w): per candidate, compute the
      center field k_c and gradients (kx, ky) once; each offset is 2 FMAs,
      and the select-loop base comes from the closed-form k range — no
      per-offset pre-pass.
    - *Hot path stays straight-line*: a fixed fully-unrolled SUB_BAND
      select loop per (candidate, offset), exactly v1's structure (per-
      candidate lax.cond and per-offset adaptive fori_loops both measured
      much slower — see _accumulate_ncc_unrolled).
    - *Exactness via per-tile fixup*: candidates whose k range escapes the
      band are recomputed exactly in ONE @pl.when block per tile (rare:
      measured tile k-spread is ~16 slices at VGA). v1's silent SUB_BAND
      clamp is gone — results match the XLA mirror everywhere.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)

    fx = consts_ref[0, 0]
    fy = consts_ref[0, 1]
    cx = consts_ref[0, 2]
    cy = consts_ref[0, 3]
    u_min = consts_ref[0, 4]
    du = consts_ref[0, 5]

    ref_dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
        ref_tile,
        sems.at[0],
    )
    ref_dma.start()
    e_dma = pltpu.make_async_copy(
        e_hbm.at[:, pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
        e_win,
        sems.at[1],
    )
    e_dma.start()

    # Mosaic iota must be integer-typed
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy

    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    K = num_slices
    kmaxf = float(K - 1)
    band = min(SUB_BAND, K)

    ref_dma.wait()
    s_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_rr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ref_vals = []
    for (dx, dy) in offsets:
        rv = ref_tile[
            TILE_H + dy : 2 * TILE_H + dy, TILE_W + dx : 2 * TILE_W + dx
        ]
        ref_vals.append(rv)
        s_r = s_r + rv
        s_rr = s_rr + rv * rv

    e_dma.wait()

    def k_range(c):
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        u_c = -(nx * dirx + ny * diry + nz) / w
        k_c = (u_c - u_min) / du
        # k(p, Δ) = k_c(p) + kx(p)·Δx + ky(p)·Δy — exactly linear in Δ
        kx = -nx / (fx * w * du)
        ky = -ny / (fy * w * du)
        span = radius * (jnp.abs(kx) + jnp.abs(ky))
        k_lo = jnp.min(k_c - span)
        k_hi = jnp.max(k_c + span)
        # NaN (degenerate w) -> full range
        k_lo = jnp.clip(jnp.where(jnp.isnan(k_lo), 0.0, k_lo), 0.0, kmaxf)
        k_hi = jnp.clip(jnp.where(jnp.isnan(k_hi), kmaxf, k_hi), 0.0, kmaxf)
        return u_c, k_c, kx, ky, k_lo, k_hi

    need_e = jnp.asarray(False)
    for c in range(num_cands):
        u_c, k_c, kx, ky, k_lo, k_hi = k_range(c)
        c0 = jnp.clip(jnp.floor(k_lo).astype(jnp.int32), 0, max(K - band, 0))
        c0f = c0.astype(jnp.float32)
        # exact when every sample's floor(k)+1 stays inside the band
        # (k_hi = K-1 exactly has f = 0, so <= band - 1 suffices there;
        # we conservatively flag it — rare top-edge tiles recompute)
        fits = (k_hi - c0f) <= (band - 1.5)
        need_e = need_e | ~fits

        ks = [
            jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
            for (dx, dy) in offsets
        ]
        s_s, s_ss, s_rs = _accumulate_ncc_unrolled(
            e_win, ks, ref_vals, offsets, c0, c0f, band
        )
        cost = _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S)
        oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
        if mark_escapes:
            # escaped candidates marked with the -1 sentinel; the separate
            # fixup kernel recomputes exactly those pixels. (Any in-kernel
            # branch — even untaken — measured far too expensive, hence
            # the two-kernel structure; the fixup dispatch itself costs
            # ~13 ms/call, hence exact mode is opt-in: PERF_NOTES round-3.)
            cost_ref[c] = jnp.where(
                oob, COST_MAX, jnp.where(fits, cost, -1.0)
            )
        else:
            # band-clamped semantics: escaped samples decorrelate -> high
            # cost -> the hypothesis is rejected (conservative); measured
            # tile k-spread is ~16 <= SUB_BAND on real scenes
            cost_ref[c] = jnp.where(oob, COST_MAX, cost)
    flag_ref[i, j] = need_e.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Rebased volumes: R[j, p] = E[b(p) + j - J, p]
# ---------------------------------------------------------------------------
#
# The direct kernel's cost is dominated by emulating the per-pixel slice
# gather with a select loop whose width must cover the k spread across the
# 8x128 tile — ~16 slices at VGA on sloped scenes (the 128-lane extent), so
# every tile pays a >=SUB_BAND-wide loop. Rebasing the volume on a per-pixel
# base slice b(p) (the slice of the *current depth estimate* at p) makes the
# index j = k_cand(p+Δ) - b(p+Δ) the *deviation of the candidate from the
# current estimate at the sample position* — measured ~0.6 slices (p99 ~12)
# on real plane fields, because candidate planes and the current depth both
# follow the local surface slope. The fetch loop then runs over an 8-slice
# band of R instead of 32+ of E; candidates deviating beyond R (depth edges,
# wild hypotheses) fall back to an exact adaptive-trip loop over E, so the
# result is exact everywhere (identical to ncc_volume_cost_view).

J_REBASE = 12  # R covers b(p) +- J_REBASE slices
J2_REBASE = 2 * J_REBASE + 1
RB_CHUNK = 8  # R-path select-loop chunk
E_CHUNK = 32  # E-path (fallback) select-loop chunk


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


def _kernel_rb(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W]
    r_hbm,  # ANY [J2, PH, PW] rebased volume
    bf_hbm,  # ANY [PH, PW] f32 clipped base map
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TILE_H, TILE_W] (-1 = needs exact fixup)
    flag_ref,  # SMEM out [Ty, Tx] i32 — any candidate escaped, per tile
    r_win,  # scratch VMEM [J2, 3*TILE_H, 3*TILE_W]
    bf_win,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    ref_tile,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    sems,  # DMA semaphores (3,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
    j2: int,
):
    """Rebased fast-path kernel (see the section comment above).

    Every candidate runs a fixed unrolled RB_CHUNK-slice select over the
    rebased window — 4x less select work than the direct kernel's
    slope-spread band, and ~6x less HBM traffic (R's 2J+1 slices move
    instead of E's K). Candidates whose rebased index range escapes the
    band are sentinel-marked (cost -1) and the tile flagged; the separate
    _fixup_kernel recomputes them exactly from E. No in-kernel branch —
    even an untaken @pl.when measured ~25 us/tile of spill overhead
    (PERF_NOTES round-3).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    J = (j2 - 1) // 2

    fx = consts_ref[0, 0]
    fy = consts_ref[0, 1]
    cx = consts_ref[0, 2]
    cy = consts_ref[0, 3]
    u_min = consts_ref[0, 4]
    du = consts_ref[0, 5]

    def win(hbm, dst, sem):
        return pltpu.make_async_copy(
            hbm.at[..., pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
            dst,
            sem,
        )

    ref_dma = win(ref_hbm, ref_tile, sems.at[0])
    bf_dma = win(bf_hbm, bf_win, sems.at[1])
    r_dma = win(r_hbm, r_win, sems.at[2])
    ref_dma.start()
    bf_dma.start()
    r_dma.start()

    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy

    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    K = num_slices
    kmaxf = float(K - 1)
    rb_chunk = min(RB_CHUNK, j2)

    ref_dma.wait()
    s_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_rr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ref_vals = []
    for (dx, dy) in offsets:
        rv = ref_tile[TILE_H + dy : 2 * TILE_H + dy, TILE_W + dx : 2 * TILE_W + dx]
        ref_vals.append(rv)
        s_r = s_r + rv
        s_rr = s_rr + rv * rv
    bf_dma.wait()
    bf_shifts = [
        bf_win[TILE_H + dy : 2 * TILE_H + dy, TILE_W + dx : 2 * TILE_W + dx]
        for (dx, dy) in offsets
    ]
    r_dma.wait()

    need_e = jnp.asarray(False)
    for c in range(num_cands):
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        u_c = -(nx * dirx + ny * diry + nz) / w
        k_c = (u_c - u_min) / du
        kx = -nx / (fx * w * du)
        ky = -ny / (fy * w * du)

        js = []
        jmin = jnp.asarray(float(j2), jnp.float32)
        jmax = jnp.asarray(-1.0, jnp.float32)
        for s_idx, (dx, dy) in enumerate(offsets):
            k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
            jf = k - bf_shifts[s_idx] + J
            js.append(jf)
            jmin = jnp.minimum(jmin, jnp.min(jf))
            jmax = jnp.maximum(jmax, jnp.max(jf))
        c0 = jnp.clip(jnp.floor(jmin).astype(jnp.int32), 0, max(j2 - rb_chunk, 0))
        c0f = c0.astype(jnp.float32)
        # NaN jmin/jmax propagate -> fits False -> exact fixup; the band
        # test keeps the hot loop a fixed unrolled rb_chunk slices
        fits = (jmin >= 0.0) & (jmax - c0f <= rb_chunk - 1.5)
        need_e = need_e | ~fits

        s_s, s_ss, s_rs = _accumulate_ncc_unrolled(
            r_win, js, ref_vals, offsets, c0, c0f, rb_chunk
        )
        cost = _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S)
        oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
        cost_ref[c] = jnp.where(
            oob, COST_MAX, jnp.where(fits, cost, -1.0)
        )
    flag_ref[i, j] = need_e.astype(jnp.int32)


def _fixup_kernel(
    flags_ref,  # SMEM [Ty, Tx] i32 per-tile escape flags from the hot kernel
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W]
    cost_in_ref,  # VMEM [C, TILE_H, TILE_W] hot-kernel costs (-1 sentinel)
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_out_ref,  # VMEM out [C, TILE_H, TILE_W]
    e_win,  # scratch VMEM [K, 3*TILE_H, 3*TILE_W]
    ref_tile,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    sems,  # DMA semaphores (2,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """Exact recomputation of sentinel-marked costs, skipping clean tiles.

    A separate kernel so the skip branch has nothing live to spill (an
    inline @pl.when in the hot kernel measured ~25 us/tile even untaken).
    Flagged tiles recompute every candidate with the adaptive-trip exact
    loop and keep non-sentinel pixels from the hot kernel's output, so the
    combined result equals the XLA mirror everywhere.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # program ids must be read OUTSIDE the pl.when bodies (the interpret
    # path lowers branch bodies as plain lax.cond, where program_id has no
    # lowering rule)
    i = pl.program_id(0)
    j = pl.program_id(1)
    flag = flags_ref[i, j]

    @pl.when(flag == 0)
    def _copy_through():
        for c in range(num_cands):
            cost_out_ref[c] = cost_in_ref[c]

    @pl.when(flag != 0)
    def _recompute():
        fx = consts_ref[0, 0]
        fy = consts_ref[0, 1]
        cx = consts_ref[0, 2]
        cy = consts_ref[0, 3]
        u_min = consts_ref[0, 4]
        du = consts_ref[0, 5]

        ref_dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
            ref_tile,
            sems.at[0],
        )
        ref_dma.start()
        e_dma = pltpu.make_async_copy(
            e_hbm.at[:, pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
            e_win,
            sems.at[1],
        )
        e_dma.start()

        ys = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
        ).astype(jnp.float32)
        xs = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
        ).astype(jnp.float32)
        dirx = (xs - cx) / fx
        diry = (ys - cy) / fy

        offsets = _offsets(radius, increment)
        S = float(len(offsets))
        K = num_slices
        kmaxf = float(K - 1)
        chunk = min(E_CHUNK, K)

        ref_dma.wait()
        s_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        s_rr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        ref_vals = []
        for (dx, dy) in offsets:
            rv = ref_tile[
                TILE_H + dy : 2 * TILE_H + dy, TILE_W + dx : 2 * TILE_W + dx
            ]
            ref_vals.append(rv)
            s_r = s_r + rv
            s_rr = s_rr + rv * rv
        e_dma.wait()

        def cand_body(c, _):
            nx = planes_ref[c, 0]
            ny = planes_ref[c, 1]
            nz = planes_ref[c, 2]
            w = planes_ref[c, 3]
            u_c = -(nx * dirx + ny * diry + nz) / w
            k_c = (u_c - u_min) / du
            kx = -nx / (fx * w * du)
            ky = -ny / (fy * w * du)
            span = radius * (jnp.abs(kx) + jnp.abs(ky))
            k_lo = jnp.min(k_c - span)
            k_hi = jnp.max(k_c + span)
            k_lo = jnp.clip(jnp.where(jnp.isnan(k_lo), 0.0, k_lo), 0.0, kmaxf)
            k_hi = jnp.clip(jnp.where(jnp.isnan(k_hi), kmaxf, k_hi), 0.0, kmaxf)
            c0 = jnp.clip(
                jnp.floor(k_lo).astype(jnp.int32), 0, max(K - chunk, 0)
            )
            c0f = c0.astype(jnp.float32)
            trips = jnp.clip(
                jnp.ceil((k_hi + 2.0 - c0f) / chunk).astype(jnp.int32),
                1,
                -(-K // chunk),
            )
            ks = [
                jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                for (dx, dy) in offsets
            ]
            s_s, s_ss, s_rs = _accumulate_ncc(
                e_win, ks, ref_vals, offsets, c0, c0f, trips, chunk, K
            )
            cost = _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S)
            oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
            cost = jnp.where(oob, COST_MAX, cost)
            prev = cost_in_ref[c]
            cost_out_ref[c] = jnp.where(prev < 0.0, cost, prev)
            return 0

        jax.lax.fori_loop(0, num_cands, cand_body, 0)


def _fixup_call(flags, consts, planes_cf, cost1, E_pad, ref_pad,
                num_slices, radius, increment, interpret):
    """Dispatch the exact-fixup kernel over the hot kernel's outputs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, _, H, W = planes_cf.shape
    K = E_pad.shape[0]
    kernel = functools.partial(
        _fixup_kernel,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid=(H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec(
                (H // TILE_H, W // TILE_W), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((K, 3 * TILE_H, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(flags, consts, planes_cf, cost1, E_pad, ref_pad)


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_rebased_cost_view(
    R_pad: jax.Array,  # [J2, PH, PW] rebased volume
    bf_pad: jax.Array,  # [PH, PW] f32 clipped base map
    E_pad: jax.Array,  # [K, PH, PW] full volume (exact fallback)
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
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    K = E_pad.shape[0]
    J2 = R_pad.shape[0]
    assert H % TILE_H == 0 and W % TILE_W == 0

    kernel = functools.partial(
        _kernel_rb,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
        j2=J2,
    )
    grid = (H // TILE_H, W // TILE_W)
    cost1, flags = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            jax.ShapeDtypeStruct((H // TILE_H, W // TILE_W), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H // TILE_H, W // TILE_W), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((J2, 3 * TILE_H, 3 * TILE_W), R_pad.dtype),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
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
    static_argnames=("num_slices", "radius", "increment", "interpret", "exact"),
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
    exact: bool = False,
) -> jax.Array:
    """Fused plain-NCC costs of C candidate plane fields against one source
    view via its plane-sweep volume. Returns [C, H, W] f32.

    H must be a multiple of 8 and W of 128 (callers pad the pixel grid).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: interpret-mode Pallas execution is ~3 orders
            # slower than the XLA mirror (72 s vs <1 s for one VGA call) —
            # route through the mirror. Divergence from the TPU kernel is
            # the sub-band clamp only (extreme-tilt hypotheses; see
            # tests/test_ncc_volume.py). interpret=True forces the
            # interpreter for kernel-equivalence tests.
            return ncc_volume_cost_view_ref(
                E_pad, ref_pad, planes, consts, num_slices,
                radius=radius, increment=increment,
            )
        interpret = False
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    K = E_pad.shape[0]
    assert H % TILE_H == 0 and W % TILE_W == 0
    assert E_pad.shape[1] == H + 2 * PAD_Y and E_pad.shape[2] == W + 2 * PAD_X

    kernel = functools.partial(
        _kernel,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
        mark_escapes=exact,
    )
    grid = (H // TILE_H, W // TILE_W)
    cost1, flags = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), jnp.float32),
            jax.ShapeDtypeStruct((H // TILE_H, W // TILE_W), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, TILE_H, TILE_W), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H // TILE_H, W // TILE_W), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, 3 * TILE_H, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(consts, planes, E_pad, ref_pad)
    if not exact:
        return cost1
    return _fixup_call(
        flags, consts, planes, cost1, E_pad, ref_pad,
        num_slices, radius, increment, interpret,
    )


# ---------------------------------------------------------------------------
# Geometric-consistency cost over depth volumes
# ---------------------------------------------------------------------------

# geom consts layout (one (1, 32) f32 SMEM block):
# [fx, fy, cx, cy, u_min, du, M(9), b(3), A(9), t'(3), src_w, src_h, 0]
_NGEOM = 32
GEOM_COST_MAX = 3.0


def pack_geom_consts(
    K0: jax.Array, M: jax.Array, b: jax.Array, A: jax.Array, t2: jax.Array,
    u_min, du, src_w: int, src_h: int
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

    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy

    for c in range(num_cands):
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        u = -(nx * dirx + ny * diry + nz) / w
        k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
        # nearest-slice depth lookup via per-tile sub-band select
        c0 = jnp.clip(
            jnp.floor(jnp.min(k)).astype(jnp.int32),
            0,
            max(num_slices - SUB_BAND, 0),
        )
        rel = jnp.clip(k - c0.astype(jnp.float32), 0.0, SUB_BAND - 1.0)
        ri = jnp.round(rel).astype(jnp.int32)
        sd = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for bb in range(SUB_BAND):
            dv = d_ref[c0 + bb].astype(jnp.float32)
            sd = jnp.where(ri == bb, dv, sd)

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
        q2x = sd * rx_ + t0
        q2y = sd * ry_ + t1
        q2z = sd * rz_ + t2
        bx = q2x / q2z
        by = q2y / q2z
        err = jnp.sqrt((xs - bx) * (xs - bx) + (ys - by) * (ys - by))
        cost = jnp.minimum(err, GEOM_COST_MAX)
        cost = jnp.where((sd == 0.0) | oob, GEOM_COST_MAX, cost)
        cost_ref[c] = cost


def geom_volume_cost_view_ref(
    D: jax.Array,  # [K, H, W]
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [1, _NGEOM]
    num_slices: int,
) -> jax.Array:
    """Pure-XLA mirror of :func:`geom_volume_cost_view` (exact
    nearest-slice selection; the kernel's per-tile sub-band clamp can
    diverge on extreme-tilt hypotheses only)."""
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
            # CPU auto mode: XLA mirror (exact nearest-slice, no sub-band
            # clamp); interpret=True forces the Pallas interpreter.
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
# XLA reference implementation (same volume semantics, for tests)
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
    """Pure-XLA mirror of the kernel (full-range interpolation, no
    sub-band clamping).

    Structured compile-friendly: a ``lax.scan`` over the window offsets
    with candidates vectorized, so the jaxpr stays small — this is also
    the production CPU path (auto-redirect in ncc_volume_cost_view), not
    just a test oracle."""
    C, _, H, W = planes.shape
    K = E_pad.shape[0]
    fx, fy, cx, cy, u_min, du = (consts[0, m] for m in range(6))
    M = consts[0, 6:15].reshape(3, 3)
    b = consts[0, 15:18]
    src_w, src_h = consts[0, 18], consts[0, 19]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
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
