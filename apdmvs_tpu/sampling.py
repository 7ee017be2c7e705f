"""Image sampling utilities: bilinear gathers and static patch shifts.

The reference relies on CUDA texture hardware (bilinear filtering, texel
centers at i+0.5; reference: APD.cpp:596-602 and ``tex2D(img, x+0.5, y+0.5)``
call sites). Here sampling at floating pixel coordinate (x, y) with integer
x, y returning image[y, x] reproduces that convention. Out-of-range reads
clamp to the border (the reference wraps, a hardware artifact its cost code
never depends on meaningfully — OOB patch centers are rejected with
cost_max; divergence documented in SURVEY.md §7 item 6).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(image: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample of a single-channel image at float pixel coords.

    image: [H, W]; x, y: arbitrary matching shapes. Border-clamped with
    CUDA clamp-addressing semantics (coordinates clamped *before* the
    fractional split, so out-of-range reads return pure edge values —
    matching the reference's texture setup, APD.cpp:596-602).
    """
    H, W = image.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    flat = image.reshape(-1)
    v00 = jnp.take(flat, y0 * W + x0)
    v01 = jnp.take(flat, y0 * W + x1)
    v10 = jnp.take(flat, y1 * W + x0)
    v11 = jnp.take(flat, y1 * W + x1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def nearest_sample_trunc(image: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Nearest sample with *truncation* semantics: image[int(y), int(x)].

    Matches the reference's geometric-consistency depth lookup
    ``tex2D(depth, (int)pt.x + 0.5f, (int)pt.y + 0.5f)``
    (reference: APD.cu:772). Border-clamped.
    """
    H, W = image.shape
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    return jnp.take(image.reshape(-1), yi * W + xi)


def gather_grid(field: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Integer-coordinate gather from a [H, W, ...] field; clamped."""
    H, W = field.shape[:2]
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    flat = field.reshape((H * W,) + field.shape[2:])
    return jnp.take(flat, yi * W + xi, axis=0)


def shift2d(arr: jax.Array, dx: int, dy: int, fill) -> jax.Array:
    """Static shift: out[y, x] = arr[y + dy, x + dx], OOB -> fill.

    Implemented with pad + slice so XLA keeps it a cheap copy (used to build
    the checkerboard candidate strips; reference: APD.cu:1012-1199).
    """
    H, W = arr.shape[:2]
    pad_top = max(dy, 0)
    pad_bot = max(-dy, 0)
    pad_left = max(dx, 0)
    pad_right = max(-dx, 0)
    pads = [(pad_bot, pad_top), (pad_right, pad_left)] + [(0, 0)] * (arr.ndim - 2)
    padded = jnp.pad(arr, pads, constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, pad_bot + dy, H, axis=0),
        pad_right + dx,
        W,
        axis=1,
    )


def select_index(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values[idx] along axis 0 via a C-way select loop.

    values: [C, ...]; idx: broadcastable to values.shape[1:]. For small C
    this is strictly cheaper than XLA's TPU gather lowering
    (~50 cycles/element, PERF_NOTES.md).
    """
    C = values.shape[0]
    extra = values.ndim - 1 - idx.ndim
    idx_b = idx.reshape(idx.shape + (1,) * extra)
    out = jnp.zeros(values.shape[1:], values.dtype)
    for c in range(C):
        out = jnp.where(idx_b == c, values[c], out)
    return out


def select_axis1(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values[n, idx[n, ...]] via a D-way select loop along axis 1.

    values: [N, D, *rest]; idx: [N, *extra] int, entries in [0, D).
    Returns [N, *extra, *rest]. For the small per-row tables of the weak
    machinery (D <= 32 probe slots / anchors) the dense select chain fuses
    into the surrounding elementwise work, while XLA's take_along_axis
    lowers to a ~50-cycle/element gather (PERF_NOTES.md).
    """
    N, D = values.shape[0], values.shape[1]
    rest = values.shape[2:]
    extra = idx.shape[1:]
    idx_b = idx.reshape(idx.shape + (1,) * len(rest))
    v_shape = (N,) + (1,) * len(extra) + rest
    out = jnp.zeros((N,) + extra + rest, values.dtype)
    for d in range(D):
        out = jnp.where(idx_b == d, values[:, d].reshape(v_shape), out)
    return out


def patch_offsets(radius: int, increment: int) -> np.ndarray:
    """The reference NCC window offsets: i, j in [-radius, radius] step
    increment (reference: APD.cu:461-468, 561-569). Returns int [S, 2]
    (dx, dy) pairs.

    radius=5, increment=2 -> 6x6 = 36 samples (strong patches);
    radius=5, increment=5 -> 3x3 = 9 samples (anchor patches).
    """
    vals = list(range(-radius, radius + 1, increment))
    offs = [(i, j) for i in vals for j in vals]
    return np.asarray(offs, np.int32)
