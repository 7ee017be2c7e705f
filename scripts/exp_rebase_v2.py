"""Experiment: windowed barrel-shift rebase builder vs the r3 select-chain.

The r3 rebase builder (ops/ncc_volume.build_rebased_view) loads ALL K
slices per tile and runs a K x J2 where-chain (~4000 vreg ops/px at
K=160, J2=25) — measured ~15% of VPU bound, 105 ms/iteration at 4 views
(PERF_NOTES round-3 ledger). This prototype:

  1. DMAs only a WIN-slice dynamic window of E per tile (window base =
     per-tile min of the base map, computed in-kernel);
  2. clamps the per-pixel base into the window's coverage (exactness is
     preserved by design: the NCC kernel's fits-check reads the CLAMPED
     base map back, so escaped candidates take the L2 fixup — any base is
     a valid base, ops/ncc_volume.py rebase rationale);
  3. emits R[j] = win[rel + j] via a log2 barrel shift over the window
     (6 x WIN selects) instead of the K x J2 chain.

Usage: python scripts/exp_rebase_v2.py [--w 640 --h 480 --k 160]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu.ops import ncc_volume as nv

TILE_H = 8
TILE_W = 128


def _rebase_kernel_v2(e_hbm, bk_ref, r_ref, bf_ref, win, sem, *,
                      num_slices, j2, win_sz):
    """Windowed barrel-shift rebase. Grid (PH/8, PW/128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    J = (j2 - 1) // 2
    K = num_slices

    b_raw = jnp.clip(jnp.round(bk_ref[...]), float(J), float(K - 1 - J))
    # per-tile window base: min of the tile's clipped bases, minus J
    m0 = jnp.min(b_raw).astype(jnp.int32) - J
    m0 = jnp.clip(m0, 0, max(K - win_sz, 0))
    dma = pltpu.make_async_copy(
        e_hbm.at[pl.ds(m0, win_sz), pl.ds(i * TILE_H, TILE_H),
                 pl.ds(j * TILE_W, TILE_W)],
        win,
        sem,
    )
    dma.start()

    # clamp the base into the window's coverage; the CLAMPED base is what
    # bf reports, so downstream reads stay self-consistent (exact)
    m0f = m0.astype(jnp.float32)
    b = jnp.clip(b_raw, m0f + J, m0f + float(win_sz - 1 - J))
    bf_ref[...] = b
    rel = (b - m0f).astype(jnp.int32) - J  # in [0, win_sz - j2]

    dma.wait()

    # barrel shift: out rows [0, j2) = win rows [rel, rel + j2)
    rows = [win[s].astype(jnp.float32) for s in range(win_sz)]
    span = win_sz
    bit = 1
    while bit < win_sz - j2 + 1:
        take = (rel & bit) != 0
        nspan = max(span - bit, j2)
        rows = [
            jnp.where(take, rows[s + bit] if s + bit < span else rows[span - 1],
                      rows[s])
            for s in range(nspan)
        ]
        span = nspan
        bit <<= 1
    for s in range(j2):
        r_ref[s] = rows[s].astype(r_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_slices", "j2", "win_sz"))
def build_rebased_view_v2(E_pad, base_k, num_slices, j2=nv.J2_REBASE,
                          win_sz=64):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, PH, PW = E_pad.shape
    kernel = functools.partial(
        _rebase_kernel_v2, num_slices=num_slices, j2=j2, win_sz=win_sz
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((j2, PH, PW), E_pad.dtype),
            jax.ShapeDtypeStruct((PH, PW), jnp.float32),
        ),
        grid=(PH // TILE_H, PW // TILE_W),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((j2, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((64, TILE_H, TILE_W), E_pad.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(E_pad, base_k)


def amortized(fn, *args, n=10):
    """Amortized per-call time via a fori chain inside one jit
    (PERF_NOTES: ~25 ms dispatch floor per eager call on axon)."""

    @jax.jit
    def chain(*a):
        def body(_, carry):
            out = fn(*a)
            # depend on the previous iteration to serialize
            first = jax.tree_util.tree_leaves(out)[0]
            return carry + first.astype(jnp.float32).ravel()[0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r = chain(*args)
    np.asarray(r)
    t0 = time.time()
    r = chain(*args)
    np.asarray(r)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--k", type=int, default=160)
    ap.add_argument("--win", type=int, default=64)
    args = ap.parse_args()

    H = ((args.h + nv.NCC_TILE_H - 1) // nv.NCC_TILE_H) * nv.NCC_TILE_H
    W = ((args.w + nv.TILE_W - 1) // nv.TILE_W) * nv.TILE_W
    PH, PW = H + 2 * nv.PAD_Y, W + 2 * nv.PAD_X
    K = args.k
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.random((K, PH, PW), np.float32), jnp.bfloat16)
    # realistic base: smooth slope + a depth edge band
    yy, xx = np.mgrid[0:PH, 0:PW].astype(np.float32)
    base = 40.0 + 25.0 * xx / PW + 18.0 * yy / PH
    base[PH // 3 : PH // 3 + 40] += 55.0  # depth edge
    base_k = jnp.asarray(base)

    R1, bf1 = nv.build_rebased_view(E, base_k, K)
    R2, bf2 = build_rebased_view_v2(E, base_k, K, win_sz=args.win)
    R1, bf1, R2, bf2 = map(np.asarray, (R1, bf1, R2, bf2))

    # exactness of the v2 output AGAINST ITS OWN base map: R2[j] must be
    # E[bf2 + j - J] everywhere (self-consistency = downstream exactness)
    J = (nv.J2_REBASE - 1) // 2
    idx = np.clip(bf2.astype(np.int64)[None] + np.arange(nv.J2_REBASE)[:, None, None] - J, 0, K - 1)
    expect = np.take_along_axis(np.asarray(E, np.float32), idx, axis=0)
    err = np.abs(R2.astype(np.float32) - expect).max()
    clamped = float((bf2 != bf1).mean())
    print(f"self-consistency max err: {err} (must be 0)")
    print(f"base clamped (vs exact rebase) at {100*clamped:.3f}% of pixels")

    t1 = amortized(
        functools.partial(nv.build_rebased_view, num_slices=K), E, base_k
    )
    t2 = amortized(
        functools.partial(build_rebased_view_v2, num_slices=K, win_sz=args.win),
        E, base_k,
    )
    print(f"r3 select-chain: {t1*1000:.2f} ms/view")
    print(f"v2 window+barrel: {t2*1000:.2f} ms/view ({t1/t2:.1f}x)")


if __name__ == "__main__":
    main()
