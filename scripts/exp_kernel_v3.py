"""Experiment: rebased-NCC kernel variants to find the Mosaic cost driver.

Variants (all rebased-volume hot path, C=9 candidates, 1 view, VGA):
  A. current _kernel_rb (dynamic per-candidate c0, band 8) — baseline
  B. static full band (c0 = 0, band = J2, no jmin/jmax reduction)
  C. B + shared slice loads (offset -> slice -> candidates loop order)
  D. C with candidate groups of 3 (register pressure probe)
  F. C with TILE_H = 32 (fixed-overhead probe)

Usage: python scripts/exp_kernel_v3.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.ops import ncc_volume
from apdmvs_tpu.ops.ncc_volume import (
    COST_MAX, PAD_X, PAD_Y, TILE_H, TILE_W, _NCONST,
    _center_oob, _ncc_epilogue, _offsets,
)


def timeit(name, fn, n=5):
    def force(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])

    force(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        force(out)
        ts.append(time.time() - t0)
    print(f"{name:52s} {min(ts)*1000:8.1f} ms (min of {n})")
    return out


# ---------------------------------------------------------------------------
# variant kernels
# ---------------------------------------------------------------------------

def _kernel_rb_static(
    consts_ref, planes_ref, r_hbm, bf_hbm, ref_hbm, cost_ref,
    r_win, bf_win, ref_tile, sems,
    *, num_slices, num_cands, radius, increment, j2,
    shared_loads: bool, group: int, tile_h: int,
    band: int | None = None, flag_escapes: bool = False,
):
    """Static band over the whole R (c0=0, band=j2); optionally shares the
    slice load across candidate groups (offset->slice->cands order)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, TW = tile_h, TILE_W
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
            hbm.at[..., pl.ds(i * TH, TH + 2 * PAD_Y), pl.ds(j * TW, 3 * TW)],
            dst, sem,
        )

    ref_dma = win(ref_hbm, ref_tile, sems.at[0])
    bf_dma = win(bf_hbm, bf_win, sems.at[1])
    r_dma = win(r_hbm, r_win, sems.at[2])
    ref_dma.start()
    bf_dma.start()
    r_dma.start()

    ys = (jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + i * TH).astype(jnp.float32)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + j * TW).astype(jnp.float32)
    dirx = (xs - cx) / fx
    diry = (ys - cy) / fy

    offsets = _offsets(radius, increment)
    S = float(len(offsets))
    kmaxf = float(num_slices - 1)

    ref_dma.wait()
    s_r = jnp.zeros((TH, TW), jnp.float32)
    s_rr = jnp.zeros((TH, TW), jnp.float32)
    ref_vals = []
    for (dx, dy) in offsets:
        rv = ref_tile[PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx]
        ref_vals.append(rv)
        s_r = s_r + rv
        s_rr = s_rr + rv * rv
    bf_dma.wait()
    r_dma.wait()

    # per-candidate plane fields
    cand_fields = []
    for c in range(num_cands):
        nx = planes_ref[c, 0]
        ny = planes_ref[c, 1]
        nz = planes_ref[c, 2]
        w = planes_ref[c, 3]
        u_c = -(nx * dirx + ny * diry + nz) / w
        k_c = (u_c - u_min) / du
        kx = -nx / (fx * w * du)
        ky = -ny / (fy * w * du)
        cand_fields.append((u_c, k_c, kx, ky))

    if shared_loads == "slim":
        # spill-free candidate-major: nothing precomputed, every ref/bf/R
        # value sliced from VMEM scratch on demand; live set ~13 vregs.
        b_lo = J - band // 2
        b_hi = b_lo + band
        for c in range(num_cands):
            u_c, k_c, kx, ky = cand_fields[c]
            s_s = jnp.zeros((TH, TW), jnp.float32)
            s_ss = jnp.zeros((TH, TW), jnp.float32)
            s_rs = jnp.zeros((TH, TW), jnp.float32)
            for (dx, dy) in offsets:
                bfs = bf_win[PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx]
                rel = jnp.clip(
                    k_c + (kx * dx + ky * dy) - bfs + J,
                    float(b_lo), b_hi - 1.0,
                )
                r0 = jnp.floor(rel)
                f = rel - r0
                r0i = r0.astype(jnp.int32)
                acc0 = jnp.zeros((TH, TW), jnp.float32)
                acc1 = jnp.zeros((TH, TW), jnp.float32)
                prev_eq = None
                for bb in range(b_lo, b_hi):
                    ev = r_win[
                        bb, PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx
                    ].astype(jnp.float32)
                    eq = r0i == bb
                    acc0 = jnp.where(eq, ev, acc0)
                    if prev_eq is not None:
                        acc1 = jnp.where(prev_eq, ev, acc1)
                    prev_eq = eq
                sv = acc0 * (1.0 - f) + acc1 * f
                rv = ref_tile[PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx]
                s_s = s_s + sv
                s_ss = s_ss + sv * sv
                s_rs = s_rs + rv * sv
            cost = _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S)
            oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
            cost_ref[c] = jnp.where(oob, COST_MAX, cost)
        return

    if not shared_loads:
        # candidate-major, static band over whole R
        for c in range(num_cands):
            u_c, k_c, kx, ky = cand_fields[c]
            s_s = jnp.zeros((TH, TW), jnp.float32)
            s_ss = jnp.zeros((TH, TW), jnp.float32)
            s_rs = jnp.zeros((TH, TW), jnp.float32)
            for s_idx, (dx, dy) in enumerate(offsets):
                k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                bfs = bf_win[PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx]
                rel = jnp.clip(k - bfs + J, 0.0, j2 - 1.0)
                r0 = jnp.floor(rel)
                f = rel - r0
                r0i = r0.astype(jnp.int32)
                acc0 = jnp.zeros((TH, TW), jnp.float32)
                acc1 = jnp.zeros((TH, TW), jnp.float32)
                prev_eq = None
                for bb in range(j2):
                    ev = r_win[
                        bb, PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx
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
            cost = _ncc_epilogue(s_r, s_rr, s_s, s_ss, s_rs, S)
            oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
            cost_ref[c] = jnp.where(oob, COST_MAX, cost)
        return

    # shared loads: offset -> slice -> candidate-group
    # Optional narrow static band centered on J: slices [b_lo, b_lo+band).
    if band is None:
        b_lo, b_hi = 0, j2
    else:
        b_lo = J - band // 2
        b_hi = b_lo + band
    n_groups = (num_cands + group - 1) // group
    escaped = jnp.asarray(False)
    for g in range(n_groups):
        cs = list(range(g * group, min((g + 1) * group, num_cands)))
        sums = {c: [jnp.zeros((TH, TW), jnp.float32) for _ in range(3)] for c in cs}
        for s_idx, (dx, dy) in enumerate(offsets):
            bfs = bf_win[PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx]
            rel_g, f_g = {}, {}
            acc0 = {c: jnp.zeros((TH, TW), jnp.float32) for c in cs}
            acc1 = {c: jnp.zeros((TH, TW), jnp.float32) for c in cs}
            for c in cs:
                u_c, k_c, kx, ky = cand_fields[c]
                k = jnp.clip(k_c + kx * dx + ky * dy, 0.0, kmaxf)
                relraw = k - bfs + J
                if flag_escapes:
                    escaped = escaped | (jnp.max(relraw) > b_hi - 1.5) | (
                        jnp.min(relraw) < b_lo
                    )
                rel = jnp.clip(relraw, float(b_lo), b_hi - 1.0)
                r0 = jnp.floor(rel)
                rel_g[c] = r0.astype(jnp.int32)
                f_g[c] = rel - r0
            prev = {}
            for bb in range(b_lo, b_hi):
                ev = r_win[
                    bb, PAD_Y + dy : PAD_Y + dy + TH, TW + dx : 2 * TW + dx
                ].astype(jnp.float32)
                for c in cs:
                    eq = rel_g[c] == bb
                    acc0[c] = jnp.where(eq, ev, acc0[c])
                    if bb > b_lo:
                        acc1[c] = jnp.where(prev[c], ev, acc1[c])
                    prev[c] = eq
            rv = ref_vals[s_idx]
            for c in cs:
                sv = acc0[c] * (1.0 - f_g[c]) + acc1[c] * f_g[c]
                sums[c][0] = sums[c][0] + sv
                sums[c][1] = sums[c][1] + sv * sv
                sums[c][2] = sums[c][2] + rv * sv
        for c in cs:
            u_c = cand_fields[c][0]
            cost = _ncc_epilogue(s_r, s_rr, sums[c][0], sums[c][1], sums[c][2], S)
            oob = _center_oob(consts_ref, 0, dirx, diry, u_c)
            cost = jnp.where(oob, COST_MAX, cost)
            if flag_escapes and c == num_cands - 1:
                # keep the escape reduction alive for the timing probe
                cost = cost - 1e-30 * escaped.astype(jnp.float32)
            cost_ref[c] = cost


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_slices", "j2", "shared_loads", "group", "tile_h", "band",
        "flag_escapes",
    ),
)
def rb_variant(R, bf, ref_pad, planes_cf, consts, num_slices, j2,
               shared_loads=False, group=9, tile_h=TILE_H, band=None,
               flag_escapes=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = planes_cf.shape[0]
    H, W = planes_cf.shape[2], planes_cf.shape[3]
    TH = tile_h
    kernel = functools.partial(
        _kernel_rb_static,
        num_slices=num_slices, num_cands=C, radius=5, increment=2, j2=j2,
        shared_loads=shared_loads, group=group, tile_h=TH, band=band,
        flag_escapes=flag_escapes,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid=(H // TH, W // TILE_W),
        in_specs=[
            pl.BlockSpec((1, _NCONST), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (C, 4, TH, TILE_W), lambda i, j: (0, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, TH, TILE_W), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((j2, TH + 2 * PAD_Y, 3 * TILE_W), R.dtype),
            pltpu.VMEM((TH + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.VMEM((TH + 2 * PAD_Y, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(consts, planes_cf, R, bf, ref_pad)


def main():
    V, W, H, C = 5, 640, 480, 9
    cams, planes_s = synthetic.make_ring_scene(num_views=V, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes_s)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R_ = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R_, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    imgs = jnp.asarray(images)
    vs = ncc.build_image_volume_set(
        imgs, gc, 1.2, 9.6, num_slices=160, weak_cost_volumes=False
    )
    np.asarray(vs.E[0, 0, 0])

    pl0 = geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0]), jnp.asarray(normals[0]), H, W
    )
    cands = [pl0]
    rng = np.random.default_rng(0)
    for i in range(C - 1):
        dx, dy = int(rng.integers(-11, 12)) | 1, int(rng.integers(-11, 12)) | 1
        cands.append(jnp.roll(pl0, (dy, dx), axis=(0, 1)))
    planes = jnp.stack(cands)
    Hp = vs.ref_pad.shape[0] - 2 * PAD_Y
    Wp = vs.ref_pad.shape[1] - 2 * PAD_X
    pcf = jnp.moveaxis(planes, -1, 1)
    if (Hp, Wp) != (H, W):
        p1 = jnp.zeros((C, 4, Hp - H, W), jnp.float32).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        pcf = jnp.concatenate([pcf, p1], 2)
        p2 = jnp.zeros((C, 4, Hp, Wp - W), jnp.float32).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        pcf = jnp.concatenate([pcf, p2], 3)

    d0 = jnp.asarray(depths[0])
    vs_rb = ncc.rebase_volume_set(vs, gc, d0)
    np.asarray(vs_rb.R[1, 0, 0])
    Rv, bfv = vs_rb.R[0], vs_rb.base_k
    j2 = ncc_volume.J2_REBASE

    # A: current rebased (incl. fixup dispatch)
    call_a = jax.jit(
        lambda Rv_, bfv_, E_, rp_, p_, cs_: ncc_volume.ncc_rebased_cost_view(
            Rv_, bfv_, E_, rp_, p_, cs_, 160
        )
    )
    out_a = timeit(
        "A  current rebased (hot + fixup)",
        lambda: call_a(Rv, bfv, vs.E[0], vs.ref_pad, pcf, vs.consts[0]),
    )

    out_b = timeit(
        "B  static full band (c0=0, band=j2)",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2),
    )
    out_c = timeit(
        "C  B + shared loads (group=9)",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=9),
    )
    out_d = timeit(
        "D  B + shared loads (group=3)",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3),
    )
    out_f = timeit(
        "F  shared loads (group=3) TILE_H=32",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3, tile_h=32),
    )
    out_f16 = timeit(
        "F' shared loads (group=3) TILE_H=16",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3, tile_h=16),
    )

    out_g = timeit(
        "G  narrow band 8, group=3, TILE_H=32",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3, tile_h=32, band=8),
    )
    out_h = timeit(
        "H  G + escape-flag reductions",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3, tile_h=32, band=8,
                           flag_escapes=True),
    )
    out_g9 = timeit(
        "G9 narrow band 8, group=9, TILE_H=32",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=9, tile_h=32, band=8),
    )
    out_g12 = timeit(
        "G12 band 12, group=3, TILE_H=32",
        lambda: rb_variant(Rv, bfv, vs.ref_pad, pcf, vs.consts[0], 160, j2,
                           shared_loads=True, group=3, tile_h=32, band=12),
    )

    a = np.asarray(out_a)
    for name, o in [("B", out_b), ("C", out_c), ("D", out_d), ("F", out_f),
                    ("F16", out_f16), ("G", out_g), ("H", out_h),
                    ("G12", out_g12)]:
        d = np.abs(np.asarray(o) - a)
        print(f"  {name} vs A: max|diff| {d.max():.2e} frac>0.01 {(d>0.01).mean():.4f}")


if __name__ == "__main__":
    main()
