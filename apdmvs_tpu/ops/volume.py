"""Epipolar plane-sweep volumes and the Pallas K-select sampler.

See ops/__init__ for the architecture rationale. Key objects:

- ``inv_depth_grid``: the inverse-depth slice grid u_k (plane-sweep
  convention; uniform in 1/depth so pixel motion per slice is ~constant).
- ``build_volume``: E[k, y, x] = src image bilinearly sampled at the warp
  of ref pixel (x, y) under the fronto-parallel plane at inverse depth
  u_k — one global homography per slice. Any plane hypothesis's warp of
  (x, y) equals E sampled at k(depth_pi(x, y)), *exactly* (the warp
  position depends only on depth along the ray; reference warp:
  APD.cu:303-372).
- ``volume_sample``: Pallas TPU kernel computing linear interpolation
  along K with per-pixel fractional slice indices — an in-VMEM K-way
  select running at VPU rate (measured ~100-1000x XLA's gather lowering).
  Out-of-range k clamps to the border slice.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, sampling


def inv_depth_grid(depth_min, depth_max, num_slices: int):
    """Slice grid uniform in inverse depth: u_k = 1/depth_max + k * du,
    k = (1/d - 1/depth_max) / du. Returns (u_min, du)."""
    u_min = 1.0 / depth_max
    u_max = 1.0 / depth_min
    du = (u_max - u_min) / (num_slices - 1)
    return u_min, du


def depth_to_slice(depth, u_min, du):
    """Fractional slice coordinate of a depth value (clamps nothing)."""
    return (1.0 / depth - u_min) / du


def build_volume(
    src_image: jax.Array,  # [H, W] f32
    M: jax.Array,  # [3, 3] K_src R_rel (geometry.WarpConstants.M[v])
    b: jax.Array,  # [3] K_src t_rel
    dirs: jax.Array,  # [H, W, 3] ref pixel directions K_ref^-1 p
    u_min,
    du,
    num_slices: int,
    dtype=jnp.float32,
    trunc: bool = False,
) -> jax.Array:
    """E [K, H, W]: slice k = src warped by the global inverse-depth-u_k
    homography. Border-clamped bilinear sampling; the analytic
    out-of-bounds test lives in the *evaluator* (matching the reference's
    cost_max policy, APD.cu:541-613) so the volume itself is dense.
    ``trunc`` floors the warped coords first (the depth-texture nearest
    read, APD.cu:770-772), matching the Pallas builder's trunc mode.

    This is the slow-but-simple XLA build (K*H*W gathers, amortized over a
    whole pass: the volume depends only on (view pair, scale, depth grid),
    not on hypotheses or iteration).
    """
    Md = geometry.mat3_vec(M, dirs)  # [H, W, 3]

    def slice_k(k):
        u = u_min + k.astype(jnp.float32) * du
        q = Md + b * u
        x = q[..., 0] / q[..., 2]
        y = q[..., 1] / q[..., 2]
        if trunc:
            x = jnp.floor(x)
            y = jnp.floor(y)
        return sampling.bilinear_sample(src_image, x, y).astype(dtype)

    return jax.lax.map(slice_k, jnp.arange(num_slices))


def build_volume_padded(
    src_image: jax.Array,
    M: jax.Array,
    b: jax.Array,
    K0: jax.Array,  # [3, 3] ref intrinsics
    height: int,
    width: int,
    u_min,
    du,
    num_slices: int,
    pad_y: int,
    pad_x: int,
    dtype=jnp.bfloat16,
    trunc: bool = False,
    row0=0,
) -> jax.Array:
    """Volume over the spatially padded ref pixel grid
    ([row0-pad_y, row0+H+pad_y) x [-pad_x, W+pad_x)) so kernel halo
    samples are exact warps rather than border clamps. ``row0`` (may be a
    traced scalar) offsets the pixel rows — a space shard builds its own
    haloed row slab of the global volume by passing its first owned row.
    Returns [K, H+2*pad_y, W+2*pad_x]."""
    y = (
        jax.lax.broadcasted_iota(jnp.float32, (height + 2 * pad_y, width + 2 * pad_x), 0)
        - pad_y
        + row0
    )
    x = (
        jax.lax.broadcasted_iota(jnp.float32, (height + 2 * pad_y, width + 2 * pad_x), 1)
        - pad_x
    )
    dirs = geometry.pixel_dirs(K0, x, y)
    return build_volume(
        src_image, M, b, dirs, u_min, du, num_slices, dtype=dtype, trunc=trunc
    )


_WIN_H = 24  # window origin is aligned down to 8 rows -> up to 7 wasted
_WIN_W = 384  # origin aligned down to 128 lanes -> up to 127 wasted


def _build_kernel(
    consts_ref,  # SMEM [1, 12]: M(9), b(3)
    grid_ref,  # SMEM [1, 6]: u_min, du, pad_y, pad_x, src_w, src_h
    src_hbm,  # ANY [SH, SW] f32
    out_ref,  # VMEM [1, 8, 128] (slice k, tile)
    win,  # scratch VMEM [_WIN_H, _WIN_W] f32
    sem,
    *,
    trunc: bool = False,
):
    """One (slice, 8x128 tile): warp the tile by the slice's global
    homography. The warp is globally smooth, so the source samples of a
    tile live in a small window whose origin comes from the tile's corner
    warps (projective extremes are at corners); the window is DMA'd and
    sampled with in-window bilinear built from 128-lane gathers + row
    selects (the only gather forms Mosaic lowers fast)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    M = [consts_ref[0, m] for m in range(9)]
    b0, b1, b2 = consts_ref[0, 9], consts_ref[0, 10], consts_ref[0, 11]
    u_min = grid_ref[0, 0]
    du = grid_ref[0, 1]
    pad_y = grid_ref[0, 2]
    pad_x = grid_ref[0, 3]
    src_w = grid_ref[0, 4]
    src_h = grid_ref[0, 5]
    row0 = grid_ref[0, 6]  # first owned row (space-shard slab offset)
    u = u_min + k.astype(jnp.float32) * du

    # tile pixel coords in ref (padded-grid offsets removed)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) + ti * 8).astype(
        jnp.float32
    ) - pad_y + row0
    xs = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) + tj * 128).astype(
        jnp.float32
    ) - pad_x

    def warp(x, y):
        # dir components are already absorbed: consts M = M_view @ K_ref^-1
        qx = M[0] * x + M[1] * y + M[2] + b0 * u
        qy = M[3] * x + M[4] * y + M[5] + b1 * u
        qz = M[6] * x + M[7] * y + M[8] + b2 * u
        qz = jnp.where(jnp.abs(qz) < 1e-12, 1e-12, qz)
        sx = jnp.clip(qx / qz, 0.0, src_w - 1.0)
        sy = jnp.clip(qy / qz, 0.0, src_h - 1.0)
        return sx, sy

    sx, sy = warp(xs, ys)

    # window origin from the tile's corner warps (pure scalar math)
    x00 = (tj * 128).astype(jnp.float32) - pad_x
    y00 = (ti * 8).astype(jnp.float32) - pad_y + row0
    cxs = []
    cys = []
    for (cx_, cy_) in ((0.0, 0.0), (127.0, 0.0), (0.0, 7.0), (127.0, 7.0)):
        a, bb = warp(x00 + cx_, y00 + cy_)
        cxs.append(a)
        cys.append(bb)
    ox = jnp.minimum(jnp.minimum(cxs[0], cxs[1]), jnp.minimum(cxs[2], cxs[3]))
    oy = jnp.minimum(jnp.minimum(cys[0], cys[1]), jnp.minimum(cys[2], cys[3]))
    # align origins down to the (8, 128) tiling so Mosaic can prove DMA
    # alignment; the window carries slack for the wasted rows/lanes
    ox = jnp.clip(jnp.floor(ox).astype(jnp.int32) - 1, 0, jnp.maximum(src_w.astype(jnp.int32) - _WIN_W, 0))
    oy = jnp.clip(jnp.floor(oy).astype(jnp.int32) - 1, 0, jnp.maximum(src_h.astype(jnp.int32) - _WIN_H, 0))
    ox = pl.multiple_of((ox // 128) * 128, 128)
    oy = pl.multiple_of((oy // 8) * 8, 8)

    dma = pltpu.make_async_copy(
        src_hbm.at[pl.ds(oy, _WIN_H), pl.ds(ox, _WIN_W)], win, sem
    )
    dma.start()

    if trunc:
        # truncation/nearest sampling (reference depth-texture reads:
        # tex2D(depth, (int)x + .5, (int)y + .5), APD.cu:770-772)
        sx = jnp.floor(sx)
        sy = jnp.floor(sy)
    rx = jnp.clip(sx - ox.astype(jnp.float32), 0.0, _WIN_W - 1.001)
    ry = jnp.clip(sy - oy.astype(jnp.float32), 0.0, _WIN_H - 1.001)
    x0 = jnp.floor(rx).astype(jnp.int32)
    y0 = jnp.floor(ry).astype(jnp.int32)
    fx = rx - x0.astype(jnp.float32)
    fy = ry - y0.astype(jnp.float32)
    x1 = jnp.minimum(x0 + 1, _WIN_W - 1)
    y1 = jnp.minimum(y0 + 1, _WIN_H - 1)

    dma.wait()

    def xgather(row_8w, idx):
        """row replicated to [8, _WIN_W] -> values at per-element idx via
        per-128-window lane gathers + select."""
        res = jnp.zeros((8, 128), jnp.float32)
        for wwin in range(_WIN_W // 128):
            seg = row_8w[:, wwin * 128 : (wwin + 1) * 128]
            g = jnp.take_along_axis(seg, jnp.clip(idx - wwin * 128, 0, 127), axis=1)
            res = jnp.where(idx // 128 == wwin, g, res)
        return res

    if trunc:
        # integer sample coords: fx = fy = 0 exactly, so only the (y0, x0)
        # tap contributes — half the gathers and a quarter of the selects
        # of the bilinear path (this is the depth-volume build, rebuilt
        # every geom pass, so it is the hot builder)
        v00 = jnp.zeros((8, 128), jnp.float32)
        for row in range(_WIN_H):
            row_vals = pltpu.repeat(win[row : row + 1, :], 8, axis=0)
            v00 = jnp.where(y0 == row, xgather(row_vals, x0), v00)
        out_ref[0] = v00.astype(out_ref.dtype)
        return

    v00 = jnp.zeros((8, 128), jnp.float32)
    v01 = jnp.zeros((8, 128), jnp.float32)
    v10 = jnp.zeros((8, 128), jnp.float32)
    v11 = jnp.zeros((8, 128), jnp.float32)
    for row in range(_WIN_H):
        row_vals = pltpu.repeat(win[row : row + 1, :], 8, axis=0)
        gx0 = xgather(row_vals, x0)
        gx1 = xgather(row_vals, x1)
        m0 = y0 == row
        m1 = y1 == row
        v00 = jnp.where(m0, gx0, v00)
        v01 = jnp.where(m0, gx1, v01)
        v10 = jnp.where(m1, gx0, v10)
        v11 = jnp.where(m1, gx1, v11)

    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out_ref[0] = (top * (1.0 - fy) + bot * fy).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "num_slices", "pad_y", "pad_x", "dtype",
        "trunc", "interpret",
    ),
)
def build_volume_pallas(
    src_image: jax.Array,  # [SH, SW] f32
    M: jax.Array,  # [3, 3] K_src R_rel (warp_constants.M[v])
    b: jax.Array,  # [3]
    K0: jax.Array,  # [3, 3] ref intrinsics
    height: int,
    width: int,
    u_min,
    du,
    num_slices: int,
    pad_y: int = 8,
    pad_x: int = 128,
    dtype=jnp.bfloat16,
    trunc: bool = False,
    interpret: bool | None = None,
    row0=0,
) -> jax.Array:
    """Pallas volume builder: [K, H+2*pad_y, W+2*pad_x] in ``dtype``.
    ``row0`` (static or traced scalar) offsets the pixel rows so a space
    shard can build its haloed row slab of the global volume.

    Equivalent to :func:`build_volume_padded` (border-clamped bilinear of
    the global slice homography) but ~3 orders faster than XLA's gather
    lowering. Window-miss caveat: slices whose homography stretches an
    8x128 ref tile beyond a 16x384 source window produce clamped samples
    there (extreme-warp slices only; their costs are high either way).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        if jax.default_backend() == "cpu":
            # CPU auto mode: the interpret-mode Pallas builder is ~100x
            # slower than the XLA build — use the exact XLA path. Pass
            # interpret=True explicitly to force the interpreter (kernel
            # equivalence tests only).
            return build_volume_padded(
                src_image, M, b, K0, height, width, u_min, du, num_slices,
                pad_y=pad_y, pad_x=pad_x, dtype=dtype, trunc=trunc, row0=row0,
            )
        interpret = False
    PH = height + 2 * pad_y
    PW = width + 2 * pad_x
    assert PH % 8 == 0 and PW % 128 == 0
    SH, SW = src_image.shape
    # the DMA window must fit inside the source array; pad small images
    # (sample coords are clipped to the true [0, SW-1]x[0, SH-1] range, so
    # the padding is never actually sampled)
    if SH < _WIN_H or SW < _WIN_W:
        src_image = jnp.pad(
            src_image,
            ((0, max(0, _WIN_H - SH)), (0, max(0, _WIN_W - SW))),
            mode="edge",
        )
    # absorb K_ref^-1 into M so the kernel warps pixel coords directly
    M_eff = geometry.mat3_mat3(M, geometry.k_inverse_zero_skew(K0))
    consts = jnp.concatenate([M_eff.reshape(-1), b.reshape(-1)]).reshape(1, 12).astype(jnp.float32)
    grid_c = jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in
         (u_min, du, pad_y, pad_x, SW, SH, row0)]
    ).reshape(1, 7)
    return pl.pallas_call(
        functools.partial(_build_kernel, trunc=trunc),
        out_shape=jax.ShapeDtypeStruct((num_slices, PH, PW), dtype),
        grid=(num_slices, PH // 8, PW // 128),
        in_specs=[
            pl.BlockSpec((1, 12), lambda k, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7), lambda k, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda k, i, j: (k, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_WIN_H, _WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(consts, grid_c, jnp.asarray(src_image, jnp.float32))


def volume_oob(
    M: jax.Array,
    b: jax.Array,
    dirs: jax.Array,
    u: jax.Array,  # [...] inverse depth per pixel
    width: int,
    height: int,
) -> jax.Array:
    """Analytic out-of-source-bounds test of the warped center (cheap VPU
    math replacing the reference's texture-bounds check, APD.cu:546-556)."""
    q = geometry.mat3_vec(M, dirs) + b * u[..., None]
    x = q[..., 0] / q[..., 2]
    y = q[..., 1] / q[..., 2]
    return (x < 0.0) | (x >= width) | (y < 0.0) | (y >= height)


def volume_sample_ref(E: jax.Array, k: jax.Array) -> jax.Array:
    """Reference (XLA) implementation of linear K-interpolation with
    border clamping. E: [K, H, W]; k: [H, W] float; returns [H, W] f32."""
    K = E.shape[0]
    kc = jnp.clip(k, 0.0, K - 1.0)
    k0 = jnp.floor(kc).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, K - 1)
    f = (kc - k0.astype(jnp.float32)).astype(jnp.float32)
    e0 = jnp.take_along_axis(E, k0[None], axis=0)[0].astype(jnp.float32)
    e1 = jnp.take_along_axis(E, k1[None], axis=0)[0].astype(jnp.float32)
    return e0 * (1.0 - f) + e1 * f


def _select_kernel(e_ref, k_ref, o_ref, *, num_slices: int):
    """out = lerp(E[k0], E[k0+1], frac) via an unrolled K-way vreg select."""
    kf = k_ref[...]
    kc = jnp.clip(kf, 0.0, num_slices - 1.0)
    k0 = jnp.floor(kc).astype(jnp.int32)
    f = kc - k0.astype(jnp.float32)
    acc0 = jnp.zeros(kf.shape, jnp.float32)
    acc1 = jnp.zeros(kf.shape, jnp.float32)
    for kk in range(num_slices):
        row = e_ref[kk].astype(jnp.float32)
        acc0 = jnp.where(k0 == kk, row, acc0)
        acc1 = jnp.where(jnp.minimum(k0 + 1, num_slices - 1) == kk, row, acc1)
    o_ref[...] = acc0 * (1.0 - f) + acc1 * f


@functools.partial(jax.jit, static_argnames=("interpret",))
def volume_sample(E: jax.Array, k: jax.Array, interpret: bool = False) -> jax.Array:
    """Pallas K-interpolation: E [K, H, W] (f32 or bf16), k [H, W] float32
    -> [H, W] f32. H must be a multiple of 8 and W of 128 (callers pad)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K, H, W = E.shape
    TH, TW = 8, 128
    grid = (H // TH, W // TW)
    kernel = functools.partial(_select_kernel, num_slices=K)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(E, k)
