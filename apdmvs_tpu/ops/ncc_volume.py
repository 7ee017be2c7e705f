"""Fused multi-candidate NCC cost evaluation over plane-sweep volumes.

The hot kernel of the framework (replaces the XLA formulation of
ComputeBilateralNCCOld + ComputeMultiViewCostVector, reference:
APD.cu:530-614, 696-716, whose gather lowering is ~50 cycles/element —
PERF_NOTES.md).

Per (view, pixel-tile) the kernel:
  1. DMAs the halo'd spatial window of the padded volume E (all K slices)
     and of the padded ref image into VMEM,
  2. computes the fractional slice index k = (1/depth - u_min)/du of every
     candidate plane at every window sample position (pure VPU math — the
     depth-only warp identity, ops/__init__),
  3. per candidate, restricts interpolation to an 8-slice sub-band around
     the candidate's own k range (plane tilt moves k only slightly across
     a +-radius window; extreme tilts clamp, which only mis-costs
     hypotheses that are already near-degenerate),
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
SUB_BAND = 32  # per-(tile, candidate) interpolation sub-band (slices).
# The base slice is one scalar per (tile, candidate), so the band must
# cover the k spread across the whole 8x128 tile plus the +-radius window;
# hypotheses whose spread exceeds it get clamped samples (decorrelated ->
# high cost -> rejected), which is the conservative failure direction.
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


def _kernel(
    consts_ref,  # SMEM [1, NCONST]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W] (n_cam, w) fields
    e_hbm,  # ANY [K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [C, TILE_H, TILE_W] f32
    e_win,  # scratch VMEM [K, 3*TILE_H, 3*TILE_W]
    ref_tile,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    sems,  # DMA semaphores (2,)
    *,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
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
    src_w = consts_ref[0, 18]
    src_h = consts_ref[0, 19]

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

    # per-pixel coordinates of the tile centers (unpadded pixel coords);
    # Mosaic iota must be integer-typed
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)

    offsets = _offsets(radius, increment)
    S = float(len(offsets))

    def k_of(c, dx, dy):
        """Fractional slice index of candidate c's plane at pixel p+Δ,
        clamped to the volume range; also returns inverse depth."""
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        dirx = (xs + dx - cx) / fx
        diry = (ys + dy - cy) / fy
        u = -(nx * dirx + ny * diry + nz) / w
        k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
        return k, u

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

    for c in range(num_cands):
        ks = [k_of(c, dx, dy)[0] for (dx, dy) in offsets]
        kc_min = ks[0]
        for k in ks[1:]:
            kc_min = jnp.minimum(kc_min, k)
        c0 = jnp.clip(
            jnp.floor(jnp.min(kc_min)).astype(jnp.int32) - 1,
            0,
            max(num_slices - SUB_BAND, 0),
        )
        c0f = c0.astype(jnp.float32)

        s_s = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        s_ss = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        s_rs = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for s_idx, (dx, dy) in enumerate(offsets):
            rel = jnp.clip(ks[s_idx] - c0f, 0.0, SUB_BAND - 1.0)
            r0 = jnp.floor(rel)
            f = rel - r0
            r0i = r0.astype(jnp.int32)
            acc0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            acc1 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for bb in range(SUB_BAND):
                ev = e_win[
                    c0 + bb,
                    TILE_H + dy : 2 * TILE_H + dy,
                    TILE_W + dx : 2 * TILE_W + dx,
                ].astype(jnp.float32)
                acc0 = jnp.where(r0i == bb, ev, acc0)
                acc1 = jnp.where(jnp.minimum(r0i + 1, SUB_BAND - 1) == bb, ev, acc1)
            sv = acc0 * (1.0 - f) + acc1 * f
            rv = ref_vals[s_idx]
            s_s = s_s + sv
            s_ss = s_ss + sv * sv
            s_rs = s_rs + rv * sv

        inv = 1.0 / S
        mr = s_r * inv
        ms = s_s * inv
        var_r = s_rr * inv - mr * mr
        var_s = s_ss * inv - ms * ms
        cov = s_rs * inv - mr * ms
        ncc_cost = 1.0 - cov * jax.lax.rsqrt(jnp.maximum(var_r * var_s, 1e-30))
        cost = jnp.clip(ncc_cost, 0.0, COST_MAX)
        cost = jnp.where((var_r < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost)

        # center warp out-of-source-bounds -> cost_max (APD.cu:546-556)
        _, u_c = k_of(c, 0, 0)
        dirx = (xs - cx) / fx
        diry = (ys - cy) / fy
        M = [consts_ref[0, 6 + m] for m in range(9)]
        b0 = consts_ref[0, 15]
        b1 = consts_ref[0, 16]
        b2 = consts_ref[0, 17]
        qx = M[0] * dirx + M[1] * diry + M[2] + b0 * u_c
        qy = M[3] * dirx + M[4] * diry + M[5] + b1 * u_c
        qz = M[6] * dirx + M[7] * diry + M[8] + b2 * u_c
        wx = qx / qz
        wy = qy / qz
        oob = (wx < 0.0) | (wx >= src_w) | (wy < 0.0) | (wy >= src_h)
        cost_ref[c] = jnp.where(oob, COST_MAX, cost)


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
    )
    grid = (H // TILE_H, W // TILE_W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
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
        out_specs=pl.BlockSpec(
            (C, TILE_H, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((K, 3 * TILE_H, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(consts, planes, E_pad, ref_pad)


def _kernel_mv(
    consts_ref,  # SMEM [V, NCONST]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W]
    e_hbm,  # ANY [V, K, PH, PW]
    ref_hbm,  # ANY [PH, PW] f32
    cost_ref,  # VMEM out [V, C, TILE_H, TILE_W]
    e_win,  # scratch VMEM [2, K, 3*TILE_H, 3*TILE_W] (double-buffered)
    ref_tile,  # scratch VMEM [3*TILE_H, 3*TILE_W] f32
    acc_s,  # scratch VMEM [C, 3, TILE_H, TILE_W]: s_s, s_ss, s_rs
    kmin_s,  # scratch SMEM [C, 1] per-candidate tile k minimum
    sems,  # DMA semaphores (3,)
    *,
    num_views: int,
    num_slices: int,
    num_cands: int,
    radius: int,
    increment: int,
):
    """All (source view, candidate) NCC costs for one tile in a single
    kernel instance: one ref-tile DMA, V double-buffered volume-window
    DMAs, all candidates and window samples evaluated per residency.

    Loop order is chosen for compiled-code size (the remote Mosaic
    compiler rejects multi-MB kernels): the 36 static window offsets are
    the only unrolled python loop; candidates and band slices run as
    fori_loops with VMEM/SMEM accumulators, so the instruction count is
    O(V * S), not O(V * S * C * BAND)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)

    ref_dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)],
        ref_tile,
        sems.at[0],
    )
    ref_dma.start()

    def e_copy(v, slot):
        return pltpu.make_async_copy(
            e_hbm.at[
                v, :, pl.ds(i * TILE_H, 3 * TILE_H), pl.ds(j * TILE_W, 3 * TILE_W)
            ],
            e_win.at[slot],
            sems.at[1 + slot],
        )

    e_copy(1, 1 % 2).start()

    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)
    offsets = _offsets(radius, increment)
    S = float(len(offsets))

    ref_dma.wait()
    s_r = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    s_rr = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ref_vals = []
    for (dx, dy) in offsets:
        rv = ref_tile[TILE_H + dy : 2 * TILE_H + dy, TILE_W + dx : 2 * TILE_W + dx]
        ref_vals.append(rv)
        s_r = s_r + rv
        s_rr = s_rr + rv * rv

    for v in range(1, num_views):
        slot = v % 2
        e_copy(v, slot).wait()
        if v + 1 < num_views:
            e_copy(v + 1, (v + 1) % 2).start()

        fx = consts_ref[v, 0]
        fy = consts_ref[v, 1]
        cx = consts_ref[v, 2]
        cy = consts_ref[v, 3]
        u_min = consts_ref[v, 4]
        du = consts_ref[v, 5]
        src_w = consts_ref[v, 18]
        src_h = consts_ref[v, 19]

        def k_of_c(c, dx, dy):
            """k field of (fori-traced) candidate c at offset (dx, dy)."""
            nx = planes_ref[c, 0]
            ny = planes_ref[c, 1]
            nz = planes_ref[c, 2]
            w = planes_ref[c, 3]
            dirx = (xs + dx - cx) / fx
            diry = (ys + dy - cy) / fy
            u = -(nx * dirx + ny * diry + nz) / w
            return jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0), u

        # ---- pass 1: per-candidate k minimum over all samples ----
        def kmin_body(c, _):
            m = jnp.asarray(num_slices - 1.0, jnp.float32)
            for (dx, dy) in offsets:
                k, _u = k_of_c(c, dx, dy)
                m = jnp.minimum(m, jnp.min(k))
            kmin_s[c, 0] = m
            return 0

        jax.lax.fori_loop(0, num_cands, kmin_body, 0)

        # ---- pass 2: accumulate NCC sums per candidate ----
        def zero_body(c, _):
            acc_s[c, 0] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            acc_s[c, 1] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            acc_s[c, 2] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            return 0

        jax.lax.fori_loop(0, num_cands, zero_body, 0)

        for s_idx, (dx, dy) in enumerate(offsets):
            rv = ref_vals[s_idx]

            def cand_body(c, _, _dx=dx, _dy=dy, _rv=rv, _slot=slot):
                k, _u = k_of_c(c, _dx, _dy)
                c0 = jnp.clip(
                    jnp.floor(kmin_s[c, 0]).astype(jnp.int32) - 1,
                    0,
                    max(num_slices - SUB_BAND, 0),
                )
                rel = jnp.clip(k - c0.astype(jnp.float32), 0.0, SUB_BAND - 1.0)
                r0 = jnp.floor(rel)
                f = rel - r0
                r0i = r0.astype(jnp.int32)

                def band_body(bb, carry):
                    a0, a1 = carry
                    ev = e_win[
                        _slot,
                        c0 + bb,
                        TILE_H + _dy : 2 * TILE_H + _dy,
                        TILE_W + _dx : 2 * TILE_W + _dx,
                    ].astype(jnp.float32)
                    a0 = jnp.where(r0i == bb, ev, a0)
                    a1 = jnp.where(
                        jnp.minimum(r0i + 1, SUB_BAND - 1) == bb, ev, a1
                    )
                    return (a0, a1)

                acc0, acc1 = jax.lax.fori_loop(
                    0, SUB_BAND, band_body,
                    (
                        jnp.zeros((TILE_H, TILE_W), jnp.float32),
                        jnp.zeros((TILE_H, TILE_W), jnp.float32),
                    ),
                )
                sv = acc0 * (1.0 - f) + acc1 * f
                acc_s[c, 0] = acc_s[c, 0] + sv
                acc_s[c, 1] = acc_s[c, 1] + sv * sv
                acc_s[c, 2] = acc_s[c, 2] + _rv * sv
                return 0

            jax.lax.fori_loop(0, num_cands, cand_body, 0)

        # ---- pass 3: NCC + bounds policy per candidate ----
        def out_body(c, _):
            inv = 1.0 / S
            mr = s_r * inv
            ms = acc_s[c, 0] * inv
            var_r = s_rr * inv - mr * mr
            var_s = acc_s[c, 1] * inv - ms * ms
            cov = acc_s[c, 2] * inv - mr * ms
            ncc_cost = 1.0 - cov * jax.lax.rsqrt(
                jnp.maximum(var_r * var_s, 1e-30)
            )
            cost = jnp.clip(ncc_cost, 0.0, COST_MAX)
            cost = jnp.where(
                (var_r < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost
            )
            _k, u_c = k_of_c(c, 0, 0)
            dirx = (xs - cx) / fx
            diry = (ys - cy) / fy
            M = [consts_ref[v, 6 + m] for m in range(9)]
            b0 = consts_ref[v, 15]
            b1 = consts_ref[v, 16]
            b2 = consts_ref[v, 17]
            qx = M[0] * dirx + M[1] * diry + M[2] + b0 * u_c
            qy = M[3] * dirx + M[4] * diry + M[5] + b1 * u_c
            qz = M[6] * dirx + M[7] * diry + M[8] + b2 * u_c
            oob = (
                (qx / qz < 0.0)
                | (qx / qz >= src_w)
                | (qy / qz < 0.0)
                | (qy / qz >= src_h)
            )
            cost_ref[v, c] = jnp.where(oob, COST_MAX, cost)
            return 0

        jax.lax.fori_loop(0, num_cands, out_body, 0)

    # view 0: never used (masked by src_valid); fill with COST_MAX
    def v0_body(c, _):
        cost_ref[0, c] = jnp.full((TILE_H, TILE_W), COST_MAX, jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_cands, v0_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_slices", "radius", "increment", "interpret"),
)
def ncc_volume_cost_allviews(
    E_pad: jax.Array,  # [V, K, H+2*PAD_Y, W+2*PAD_X] bf16/f32
    ref_pad: jax.Array,  # [H+2*PAD_Y, W+2*PAD_X] f32
    planes: jax.Array,  # [C, 4, H, W] f32
    consts: jax.Array,  # [V, NCONST] f32
    num_slices: int,
    radius: int = 5,
    increment: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """All source views in one kernel: returns [V, C, H, W] f32 (view 0 =
    COST_MAX). One pallas site per cost evaluation keeps XLA programs small
    (35 single-view sites made passes uncompilable in reasonable time)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V = E_pad.shape[0]
    K = E_pad.shape[1]
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    assert H % TILE_H == 0 and W % TILE_W == 0

    kernel = functools.partial(
        _kernel_mv,
        num_views=V,
        num_slices=num_slices,
        num_cands=C,
        radius=radius,
        increment=increment,
    )
    grid = (H // TILE_H, W // TILE_W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, C, H, W), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (V, C, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K, 3 * TILE_H, 3 * TILE_W), E_pad.dtype),
            pltpu.VMEM((3 * TILE_H, 3 * TILE_W), jnp.float32),
            pltpu.VMEM((C, 3, TILE_H, TILE_W), jnp.float32),
            pltpu.SMEM((C, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(consts, planes, E_pad, ref_pad)


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


def _geom_kernel_mv(
    consts_ref,  # SMEM [V, _NGEOM]
    planes_ref,  # VMEM [C, 4, TILE_H, TILE_W]
    d_ref,  # VMEM [V, K, TILE_H, TILE_W]
    cost_ref,  # VMEM out [V, C, TILE_H, TILE_W]
    *,
    num_views: int,
    num_slices: int,
    num_cands: int,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + i * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + j * TILE_W
    ).astype(jnp.float32)

    def v0_body(c, _):
        cost_ref[0, c] = jnp.full((TILE_H, TILE_W), GEOM_COST_MAX, jnp.float32)
        return 0

    jax.lax.fori_loop(0, num_cands, v0_body, 0)
    for v in range(1, num_views):
        fx = consts_ref[v, 0]
        fy = consts_ref[v, 1]
        cx = consts_ref[v, 2]
        cy = consts_ref[v, 3]
        u_min = consts_ref[v, 4]
        du = consts_ref[v, 5]
        M = [consts_ref[v, 6 + m] for m in range(9)]
        b0, b1, b2 = consts_ref[v, 15], consts_ref[v, 16], consts_ref[v, 17]
        A = [consts_ref[v, 18 + m] for m in range(9)]
        t0, t1, t2 = consts_ref[v, 27], consts_ref[v, 28], consts_ref[v, 29]
        src_w = consts_ref[v, 30]
        src_h = consts_ref[v, 31]
        dirx = (xs - cx) / fx
        diry = (ys - cy) / fy

        def cand_body(c, _, _v=v):
            nx = planes_ref[c, 0]
            ny = planes_ref[c, 1]
            nz = planes_ref[c, 2]
            w = planes_ref[c, 3]
            u = -(nx * dirx + ny * diry + nz) / w
            k = jnp.clip((u - u_min) / du, 0.0, num_slices - 1.0)
            c0 = jnp.clip(
                jnp.floor(jnp.min(k)).astype(jnp.int32),
                0,
                max(num_slices - SUB_BAND, 0),
            )
            rel = jnp.clip(k - c0.astype(jnp.float32), 0.0, SUB_BAND - 1.0)
            ri = jnp.round(rel).astype(jnp.int32)

            def sd_body(bb, sd_c):
                dv = d_ref[_v, c0 + bb].astype(jnp.float32)
                return jnp.where(ri == bb, dv, sd_c)

            sd = jax.lax.fori_loop(
                0, SUB_BAND, sd_body, jnp.zeros((TILE_H, TILE_W), jnp.float32)
            )

            qx = M[0] * dirx + M[1] * diry + M[2] + b0 * u
            qy = M[3] * dirx + M[4] * diry + M[5] + b1 * u
            qz = M[6] * dirx + M[7] * diry + M[8] + b2 * u
            px = qx / qz
            py = qy / qz
            oob = (px < 0.0) | (px >= src_w) | (py < 0.0) | (py >= src_h)
            rx_ = A[0] * px + A[1] * py + A[2]
            ry_ = A[3] * px + A[4] * py + A[5]
            rz_ = A[6] * px + A[7] * py + A[8]
            q2x = sd * rx_ + t0
            q2y = sd * ry_ + t1
            q2z = sd * rz_ + t2
            err = jnp.sqrt((xs - q2x / q2z) ** 2 + (ys - q2y / q2z) ** 2)
            cost = jnp.minimum(err, GEOM_COST_MAX)
            cost_ref[_v, c] = jnp.where((sd == 0.0) | oob, GEOM_COST_MAX, cost)
            return 0

        jax.lax.fori_loop(0, num_cands, cand_body, 0)


@functools.partial(jax.jit, static_argnames=("num_slices", "interpret"))
def geom_volume_cost_allviews(
    D: jax.Array,  # [V, K, Hp, Wp]
    planes: jax.Array,  # [C, 4, H, W]
    consts: jax.Array,  # [V, _NGEOM]
    num_slices: int,
    interpret: bool | None = None,
) -> jax.Array:
    """All source views' geometric costs in one kernel: [V, C, H, W]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V, K = D.shape[0], D.shape[1]
    C = planes.shape[0]
    H, W = planes.shape[2], planes.shape[3]
    kernel = functools.partial(
        _geom_kernel_mv, num_views=V, num_slices=num_slices, num_cands=C
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, C, H, W), jnp.float32),
        grid=(H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec((V, _NGEOM), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (V, K, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (V, C, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
            memory_space=pltpu.VMEM,
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
