"""Direct measurement of the L2 fixup kernels on a ragged depth field.

Round-5: the band2 (two-band) fixup A/B'd as a pass-level WASH against
full-K despite 2.5x less select work. This benchmarks the fixup kernels
in isolation on a classify-like candidate set over a depth field with a
sharp fg/bg edge (the regime that flags in-pass):

  - full-K _fixup_kernel, all tiles flagged
  - band2 _band2_kernel, all tiles flagged (+ its flags2 escalation rate)
  - a DMA-only probe kernel (same e_win window DMA, no compute)

Eager timings carry the ~25 ms dispatch floor; a no-op kernel measures
the floor for subtraction. Repeats with min/median reported.

Usage: python scripts/bench_fixup.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, reps=6):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        for leaf in (r if isinstance(r, (tuple, list)) else [r]):
            np.asarray(leaf)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts), float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from apdmvs_tpu import geometry, ncc
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.ops import ncc_volume, volume

    H, W, V = 480, 640, 5
    cams, planes = synthetic.make_ring_scene(num_views=V, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    wc = geometry.warp_constants(gc)
    K_slices = 160
    u_min, du = volume.inv_depth_grid(1.2, 9.6, K_slices)
    v = 1
    E = volume.build_volume_padded(
        jnp.asarray(images[v]), wc.M[v], wc.b[v], gc.K[0], H, W, u_min, du,
        K_slices, ncc_volume.PAD_Y, ncc_volume.PAD_X, dtype=jnp.bfloat16,
    )
    ref_pad = jnp.pad(
        jnp.asarray(images[0]),
        ((ncc_volume.PAD_Y,) * 2, (ncc_volume.PAD_X,) * 2), mode="edge",
    )
    consts = ncc_volume.pack_consts(gc.K[0], wc.M[v], wc.b[v], u_min, du, W, H)

    # classify-like candidates over a RAGGED field: oracle depth + fg card
    x, y = geometry.pixel_grid(H, W)
    d = np.where(depths[0] > 0, depths[0], 4.0)
    d[150:330, 200:440] *= 0.55  # sharp fg card: ~edge-height in slices
    d = jnp.asarray(d)
    n_cam = geometry.normal_world_to_cam(gc.R[0], jnp.asarray(normals[0]))
    fx = gc.K[0][0, 0]
    B = 1.0
    disp = fx * B / d
    C = 8
    steps = jnp.arange(C, dtype=jnp.float32) - C // 2
    d_s = fx * B / (disp[None] + steps[:, None, None])
    ws = geometry.dist_to_origin(gc.K[0], x, y, d_s, n_cam[None])
    pl_cf = jnp.moveaxis(
        jnp.concatenate(
            [jnp.broadcast_to(n_cam[None], d_s.shape + (3,)), ws[..., None]], -1
        ), -1, 1,
    )  # [C, 4, H, W]

    Ty, Tx = H // ncc_volume.NCC_TILE_H, W // ncc_volume.TILE_W
    flags_all = jnp.ones((Ty, Tx), jnp.int32)
    cost_sent = jnp.full((C, H, W), -1.0, jnp.float32)
    common = dict(num_slices=K_slices, num_cands=C, radius=5, increment=2)

    fullk = jax.jit(lambda f, c: ncc_volume._fixup_pallas(
        functools.partial(ncc_volume._fixup_kernel, **common), 1,
        f, consts, pl_cf, c, E, ref_pad, None))
    band2 = jax.jit(lambda f, c: ncc_volume._fixup_pallas(
        functools.partial(ncc_volume._band2_kernel, **common), 2,
        f, consts, pl_cf, c, E, ref_pad, None))

    # floor + DMA probes
    def _noop_kernel(f, co, pc, ci, e, r, out, e_win, rt, sems):
        out[0] = ci[0]

    def _dma_kernel(f, co, pc, ci, e, r, out, e_win, rt, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        th = ncc_volume.NCC_TILE_H
        dma = pltpu.make_async_copy(
            e.at[:, pl.ds(i * th, th + 2 * ncc_volume.PAD_Y),
                 pl.ds(j * ncc_volume.TILE_W, 3 * ncc_volume.TILE_W)],
            e_win, sems.at[1],
        )
        dma.start()
        dma.wait()
        out[0] = ci[0] + e_win[0, :th, :ncc_volume.TILE_W].astype(jnp.float32)

    noop = jax.jit(lambda f, c: ncc_volume._fixup_pallas(
        _noop_kernel, 1, f, consts, pl_cf, c, E, ref_pad, None))
    dma = jax.jit(lambda f, c: ncc_volume._fixup_pallas(
        _dma_kernel, 1, f, consts, pl_cf, c, E, ref_pad, None))

    # warm all
    r_f = fullk(flags_all, cost_sent)
    r_b, fl2 = band2(flags_all, cost_sent)
    noop(flags_all, cost_sent)
    dma(flags_all, cost_sent)
    jax.block_until_ready((r_f, r_b))

    fl2 = np.asarray(fl2)
    sent_left = int(np.asarray(jnp.sum(r_b < 0)))
    print(f"band2 escalation: {int((fl2 != 0).sum())}/{fl2.size} tiles, "
          f"{sent_left}/{r_b.size} sentinels remain")
    ok = np.asarray(r_b) >= 0
    diff = np.abs(np.asarray(r_f)[ok] - np.asarray(r_b)[ok])
    print(f"band2-fixed vs fullk maxdiff: {diff.max():.2e}")

    t_noop = timed(lambda: noop(flags_all, cost_sent))
    t_dma = timed(lambda: dma(flags_all, cost_sent))
    t_f = timed(lambda: fullk(flags_all, cost_sent))
    t_b = timed(lambda: band2(flags_all, cost_sent))
    print(f"noop  (floor):      min {t_noop[0]:7.1f}  med {t_noop[1]:7.1f} ms")
    print(f"dma-only:           min {t_dma[0]:7.1f}  med {t_dma[1]:7.1f} ms")
    print(f"fullk (150 tiles):  min {t_f[0]:7.1f}  med {t_f[1]:7.1f} ms")
    print(f"band2 (150 tiles):  min {t_b[0]:7.1f}  med {t_b[1]:7.1f} ms")
    ntiles = Ty * Tx
    print(f"per-tile (floor-sub): dma {(t_dma[0]-t_noop[0])/ntiles*1e3:.0f} us, "
          f"fullk {(t_f[0]-t_noop[0])/ntiles*1e3:.0f} us, "
          f"band2 {(t_b[0]-t_noop[0])/ntiles*1e3:.0f} us")


if __name__ == "__main__":
    main()
