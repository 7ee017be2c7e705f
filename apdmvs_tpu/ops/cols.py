"""Worklist K-column gather + dense slice lookups for the weak (APD) path.

The weak machinery evaluates patch NCCs at *scattered* positions (a weak
pixel's 8 anchors sit up to thousands of pixels away, SURVEY.md §7 "hard
parts" #1). Round 1 turned each patch NCC into a 2-element cost-volume
fetch (ops/cost_volume.py), but those fetches are still XLA gathers at
~25 M elem/s (PERF_NOTES.md), and the propagation loop re-gathers every
iteration: ~15 M gathers/iter dominated prop_weak (1.1 s/iter at VGA).

This module removes gathers from the iteration loop entirely:

1. Once per pass (anchors are fixed for a whole pass, APD.cu:2415), a
   Pallas kernel DMAs the full K-column of every (position, view) —
   ``gather_rows``: one descriptor per worklist position, fetching a
   contiguous [(V-1) * K] row of the position-major cost-volume table.
2. Every per-iteration lookup then becomes a *dense* contraction over the
   resident columns: linear interpolation along K is a tent-weight
   reduce (``tent_lookup``), nearest-slice selection a one-hot reduce
   (``nearest_lookup``) — pure VPU math, no gathers.

The reference evaluates anchor patches with per-thread texture loops
(ComputeBilateralNCCNew, APD.cu:400-528); this is its TPU-native shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# positions per kernel program: bounds in-flight DMAs and the VMEM block
_BLOCK = 64

# indices per pallas_call: the worklist is scalar-prefetched into SMEM, so
# one call's index array must fit the scalar memory budget. 64k int32 =
# 256 KB is comfortably under it (512 KB measured working on v5e; 1 MB
# fails); the caller loops over chunks for larger worklists — chunking
# costs nothing, the DMA work is identical.
_CHUNK = 65536


def _group_for(dtype) -> int:
    """HBM row-group a DMA slice must be aligned to: Mosaic requires dim-0
    slices of a tiled (8, 128) HBM memref to be 8-row aligned (16 for
    packed bf16) — single-row DMAs do not compile on real hardware."""
    return 16 if jnp.dtype(dtype).itemsize < 4 else 8


def _make_gather_kernel(group: int):
    def kernel(idx_ref, table_hbm, out_ref, scratch, sems):
        """One program: DMA the aligned GROUP-row block containing each of
        the _BLOCK requested rows, then pick the wanted row with a one-hot
        sublane reduce (dynamic single-row HBM slices are not tileable).

        idx_ref is the scalar-prefetched chunk index array (<= _CHUNK
        int32 resident in SMEM; larger worklists are chunked by the
        caller — a pipelined per-program SMEM window was measured 7x
        slower than scalar prefetch on v5e)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        g = pl.program_id(0)

        def dma(i):
            row = idx_ref[g * _BLOCK + i]
            base = (row // group) * group
            return pltpu.make_async_copy(
                table_hbm.at[pl.ds(base, group), :], scratch.at[i], sems.at[i]
            )

        for i in range(_BLOCK):
            dma(i).start()
        for i in range(_BLOCK):
            dma(i).wait()
            row = idx_ref[g * _BLOCK + i]
            sub = row - (row // group) * group
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0) == sub
            ).astype(jnp.float32)
            picked = jnp.sum(
                scratch[i].astype(jnp.float32) * onehot, axis=0, keepdims=True
            )
            out_ref[pl.ds(i, 1), :] = picked.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    table: jax.Array,  # [R, C] (C a multiple of 128)
    idx: jax.Array,  # [M] int32 row indices, M a multiple of _BLOCK
    interpret: bool | None = None,
) -> jax.Array:
    """out[m] = table[idx[m]] via per-row-group DMA (the TPU-native
    worklist gather: descriptors are issued by the scalar core, rows move
    at DMA bandwidth — no VPU gather lowering involved)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: plain XLA gather (identical semantics);
            # interpret=True forces the Pallas interpreter (tests).
            return gather_rows_ref(table, idx)
        interpret = False
    R, C = table.shape
    group = _group_for(table.dtype)
    # lane-align the row width (full-table pad; no-op for the common
    # V=5, K=160 -> C=640 configuration) and group-align the row count
    Cp = ((C + 127) // 128) * 128
    Rp = ((R + group - 1) // group) * group
    if Cp != C or Rp != R:
        table = jnp.pad(table, ((0, Rp - R), (0, Cp - C)))
    M = idx.shape[0]
    Mp = ((M + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Mp != M:
        idx = jnp.pad(idx, (0, Mp - M))
    idx = jnp.clip(idx.astype(jnp.int32), 0, R - 1)

    def call(idx_chunk):
        m = idx_chunk.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // _BLOCK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_BLOCK, Cp), lambda g, idx_ref: (g, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_BLOCK, group, Cp), table.dtype),
                pltpu.SemaphoreType.DMA((_BLOCK,)),
            ],
        )
        return pl.pallas_call(
            _make_gather_kernel(group),
            out_shape=jax.ShapeDtypeStruct((m, Cp), table.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(idx_chunk, table)

    if Mp <= _CHUNK:
        out = call(idx)
    else:
        out = jnp.concatenate(
            [call(idx[s : s + _CHUNK]) for s in range(0, Mp, _CHUNK)]
        )
    return out[:M, :C] if (Mp != M or Cp != C) else out


def _make_sorted_gather_kernel(group: int):
    def kernel(idx_ref, table_hbm, out_ref, scratch, sems):
        """Sorted-index variant: consecutive requests that fall in the same
        aligned GROUP-row block reuse the previous request's scratch slot
        (VMEM copy) instead of issuing a fresh DMA. Worklists are
        raster-order compactions, so dense weak regions collapse up to
        ``group``x fewer DMAs — the gather is DMA-descriptor-issue bound
        (~1.6 us/DMA on v5e), so dedup is a direct speedup."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        g = pl.program_id(0)

        def base(i):
            row = idx_ref[g * _BLOCK + i]
            return (row // group) * group

        def dma(i):
            return pltpu.make_async_copy(
                table_hbm.at[pl.ds(base(i), group), :], scratch.at[i], sems.at[i]
            )

        # i == 0 always DMAs: the previous block's scratch is gone
        dma(0).start()
        for i in range(1, _BLOCK):
            @pl.when(base(i) != base(i - 1))
            def _start(i=i):
                dma(i).start()

        for i in range(_BLOCK):
            if i == 0:
                dma(0).wait()
            else:
                fresh = base(i) != base(i - 1)

                @pl.when(fresh)
                def _wait(i=i):
                    dma(i).wait()

                @pl.when(jnp.logical_not(fresh))
                def _copy(i=i):
                    scratch[i] = scratch[i - 1]

            row = idx_ref[g * _BLOCK + i]
            sub = row - (row // group) * group
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0) == sub
            ).astype(jnp.float32)
            picked = jnp.sum(
                scratch[i].astype(jnp.float32) * onehot, axis=0, keepdims=True
            )
            out_ref[pl.ds(i, 1), :] = picked.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_sorted(
    table: jax.Array,  # [R, C]
    idx: jax.Array,  # [M] int32, MUST be non-decreasing (caller invariant)
    interpret: bool | None = None,
) -> jax.Array:
    """gather_rows for non-decreasing ``idx`` (raster-order worklists):
    identical output, fewer DMAs (adjacent same-group requests share one).
    The sortedness is a correctness-neutral invariant — an unsorted input
    still returns correct rows, just without the dedup win."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            return gather_rows_ref(table, idx)
        interpret = False
    R, C = table.shape
    group = _group_for(table.dtype)
    Cp = ((C + 127) // 128) * 128
    Rp = ((R + group - 1) // group) * group
    if Cp != C or Rp != R:
        table = jnp.pad(table, ((0, Rp - R), (0, Cp - C)))
    M = idx.shape[0]
    Mp = ((M + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Mp != M:
        # pad with the LAST index so sortedness (and group-dedup) holds
        idx = jnp.pad(idx, (0, Mp - M), mode="edge")
    idx = jnp.clip(idx.astype(jnp.int32), 0, R - 1)

    def call(idx_chunk):
        m = idx_chunk.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // _BLOCK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_BLOCK, Cp), lambda g, idx_ref: (g, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_BLOCK, group, Cp), table.dtype),
                pltpu.SemaphoreType.DMA((_BLOCK,)),
            ],
        )
        return pl.pallas_call(
            _make_sorted_gather_kernel(group),
            out_shape=jax.ShapeDtypeStruct((m, Cp), table.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(idx_chunk, table)

    if Mp <= _CHUNK:
        out = call(idx)
    else:
        out = jnp.concatenate(
            [call(idx[s : s + _CHUNK]) for s in range(0, Mp, _CHUNK)]
        )
    return out[:M, :C] if (Mp != M or Cp != C) else out


def pack_volume_rows(C_vol: jax.Array) -> jax.Array:
    """[Vs, K, PH, PW] source-view cost/depth volume -> position-major row
    table [PH * PW, Vs * K] (VolumeSet fields store source views only)."""
    Vs, K, PH, PW = C_vol.shape
    t = jnp.moveaxis(C_vol, (0, 1), (2, 3))  # [PH, PW, Vs, K]
    return t.reshape(PH * PW, Vs * K)


def flat_index(xs: jax.Array, ys: jax.Array, pad_y: int, pad_x: int, PH: int, PW: int):
    """Row index of unpadded pixel coords into the padded position grid;
    invalid (negative) coords clamp to row 0 (callers mask the result)."""
    xi = jnp.clip(xs.astype(jnp.int32) + pad_x, 0, PW - 1)
    yi = jnp.clip(ys.astype(jnp.int32) + pad_y, 0, PH - 1)
    return yi * PW + xi


def tent_lookup(cols: jax.Array, k: jax.Array) -> jax.Array:
    """Linear interpolation along the minor K axis as a dense tent-weight
    contraction: out[...] = sum_i cols[..., i] * max(0, 1 - |k - i|).

    cols: [..., K]; k broadcasts against cols[..., 0]'s shape (extra
    *leading* dims on k are allowed — e.g. a candidate axis). Matches
    ops.cost_volume.fetch_cost's clamped 2-point interpolation exactly.
    """
    K = cols.shape[-1]
    kc = jnp.clip(k, 0.0, K - 1.0)[..., None]
    ki = jax.lax.broadcasted_iota(jnp.float32, (1, K), 1).reshape(K)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(kc - ki))
    return jnp.sum(cols.astype(jnp.float32) * w, axis=-1)


def nearest_lookup(cols: jax.Array, k: jax.Array) -> jax.Array:
    """Nearest-slice selection along K as a one-hot contraction (the depth
    volume's truncation semantics, ops/ncc_volume._geom_kernel)."""
    K = cols.shape[-1]
    ki = jnp.round(jnp.clip(k, 0.0, K - 1.0))[..., None]
    ii = jax.lax.broadcasted_iota(jnp.float32, (1, K), 1).reshape(K)
    return jnp.sum(
        cols.astype(jnp.float32) * (ki == ii).astype(jnp.float32), axis=-1
    )


def gather_rows_ref(table: jax.Array, idx: jax.Array) -> jax.Array:
    """XLA reference implementation of gather_rows (tests)."""
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)


# ---------------------------------------------------------------------------
# Read-once multi-candidate contraction over TRANSPOSED column tables
# ---------------------------------------------------------------------------
#
# The weak sweep evaluates ~10 candidate planes per call; tent_lookup on
# the [Vs, N, K] tables re-reads the whole table per candidate (the
# candidate axis broadcasts OUTSIDE the contraction), making the sweep
# HBM-traffic bound (ROADMAP perf #3, round-4 profile). The kernel below
# takes the TRANSPOSED layout [Vs, K, R] (positions in the 128-lane
# dimension; one transpose per pass in build_weak_cols) and evaluates
# ALL candidates per resident block: the table streams from HBM exactly
# once per call regardless of B.
#
# Exactness vs the tent_lookup/nearest_lookup mirrors: the tent has
# <= 2 adjacent nonzero weights (one-hot has 1) and x + 0.0 == x in fp,
# so reduce order cannot change the result; the two products may fuse
# into an FMA differently between lowerings (<= 1 ulp, test_cols).

_CT_TR = 512  # positions per contraction block (lane dim; R % 128 == 0)


def _contract_kernel(k_ref, cols_ref, out_ref, *, n_views, n_k, n_b, nearest, tr):
    # Mosaic's tpu.iota only produces integer vectors; build in int32 and
    # convert (a float iota fails kernel verification on real TPU).
    ki = jax.lax.broadcasted_iota(jnp.int32, (n_k, tr), 0).astype(jnp.float32)
    cols = [cols_ref[v].astype(jnp.float32) for v in range(n_views)]
    for b in range(n_b):
        kb = jnp.clip(k_ref[b], 0.0, n_k - 1.0)[None, :]  # [1, TR]
        if nearest:
            w = (jnp.round(kb) == ki).astype(jnp.float32)
        else:
            w = jnp.maximum(0.0, 1.0 - jnp.abs(kb - ki))
        for v in range(n_views):
            out_ref[b, v] = jnp.sum(cols[v] * w, axis=0)


@functools.partial(jax.jit, static_argnames=("nearest", "interpret"))
def contract_lookup(
    cols_t: jax.Array,  # [Vs, K, R] (R lane-major, R % 128 == 0)
    k: jax.Array,  # [B, R] slice indices per candidate
    nearest: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """out[b, v, r] = tent/nearest contraction of cols_t[v, :, r] at
    k[b, r] — all B candidates in one pass over the table."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Vs, K, R = cols_t.shape
    B = k.shape[0]
    if interpret is None:
        if jax.default_backend() == "cpu":
            look = nearest_lookup if nearest else tent_lookup
            # mirror on the transposed layout: [Vs, K, R] -> [Vs, R, K]
            return look(
                jnp.moveaxis(cols_t, 1, -1)[None], k[:, None, :]
            )
        interpret = False
    TR = min(_CT_TR, R)
    Rp = ((R + TR - 1) // TR) * TR
    if Rp != R:
        cols_t = jnp.pad(cols_t, ((0, 0), (0, 0), (0, Rp - R)))
        k = jnp.pad(k, ((0, 0), (0, Rp - R)))
    kernel = functools.partial(
        _contract_kernel, n_views=Vs, n_k=K, n_b=B, nearest=nearest, tr=TR
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Vs, Rp), jnp.float32),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((B, TR), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Vs, K, TR), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (B, Vs, TR), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(k.astype(jnp.float32), cols_t)
    return out[..., :R]
