"""Checkerboard median depth filter.

Vectorized equivalent of CheckerboardFilterStrong (reference:
APD.cu:1604-1714) and its red/black scheduling (APD.cu:1716-1748). Runs after
planes have been converted to (world normal, depth) — only the depth channel
(w) is filtered. All 20 neighbor offsets have odd parity, so the reference's
in-place half-sweeps are reproduced by two functional masked updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import sampling
from apdmvs_tpu.params import PixelState

# (dx, dy) neighbor offsets in the reference's push order (APD.cu:1642-1703).
_FILTER_OFFSETS = np.asarray(
    [
        (0, -1), (0, -3), (0, -5),
        (0, 1), (0, 3), (0, 5),
        (-1, 0), (-3, 0), (-5, 0),
        (1, 0), (3, 0), (5, 0),
        (2, -1), (2, 1), (-2, -1), (-2, 1),
        (-1, -2), (1, -2), (-1, 2), (1, 2),
    ],
    np.int32,
)


def _median_filter_values(depth: jax.Array, costs: jax.Array, pixel_state: jax.Array) -> jax.Array:
    """Median of self + STRONG in-bounds checkerboard neighbors per pixel."""
    H, W = depth.shape
    vals = [depth]  # self first (APD.cu:1620)
    valid = [jnp.ones((H, W), bool)]
    strong = pixel_state == PixelState.STRONG
    for dx, dy in _FILTER_OFFSETS:
        v = sampling.shift2d(depth, int(dx), int(dy), jnp.inf)
        ok = sampling.shift2d(strong.astype(jnp.float32), int(dx), int(dy), 0.0) > 0.5
        vals.append(jnp.where(ok, v, jnp.inf))
        valid.append(ok)
    stack = jnp.stack(vals)  # [21, H, W]; invalid -> +inf sorts last
    n = jnp.sum(jnp.stack(valid), axis=0).astype(jnp.int32)  # includes self
    s = jnp.sort(stack, axis=0)
    lo = jnp.take_along_axis(s, ((n - 1) // 2)[None], axis=0)[0]
    hi = jnp.take_along_axis(s, (n // 2)[None], axis=0)[0]
    return 0.5 * (lo + hi)


def checkerboard_median_filter(
    planes: jax.Array, costs: jax.Array, pixel_state: jax.Array
) -> jax.Array:
    """Two red-black masked median sweeps over non-WEAK pixels; pixels with
    cost < 0.001 are left untouched (APD.cu:1638-1640)."""
    H, W = costs.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    parity = (x + y) % 2
    out = planes
    for color in (0, 1):  # black then red (APD.cu:2462-2465)
        depth = out[..., 3]
        med = _median_filter_values(depth, costs, pixel_state)
        upd = (
            (parity == color)
            & (pixel_state != PixelState.WEAK)
            & (costs >= 0.001)
        )
        out = out.at[..., 3].set(jnp.where(upd, med, depth))
    return out
