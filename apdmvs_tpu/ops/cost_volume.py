"""Per-slice NCC cost volumes for the weak-texture (APD) machinery.

C[k, y, x] = plain-NCC cost of the patch centered at ref pixel (y, x)
against source view v, assuming the fronto-parallel plane at inverse depth
u_k — i.e. the classic plane-sweep cost volume, computed from the image
volume E (ops/volume.py) and the reference image with static shifted sums
(no gathers).

Why: the reference's deformed NCC (ComputeBilateralNCCNew, APD.cu:400-528)
evaluates patch NCCs at up to 8 *scattered* anchors per weak pixel. On TPU
those scattered patch evaluations are gather-bound (PERF_NOTES.md). With
cost volumes, each anchor term becomes a single k-interpolated lookup:
the patch is approximated as fronto-parallel at the candidate plane's
depth *at that anchor* — plane normals still act through the 1+8 depths
at which the scattered patches are sampled, which is the dominant signal;
the within-patch tilt (sub-pixel over a +-5 px window) is dropped. The
strong-pixel path keeps the exact per-sample formulation
(ops/ncc_volume.py), so this approximation touches only the weak machinery.
Validated by the weak-path metric tests and end-to-end F-scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

COST_MAX = 2.0
MIN_VAR = 1e-5


def _offsets(radius: int, increment: int):
    vals = list(range(-radius, radius + 1, increment))
    return [(dx, dy) for dx in vals for dy in vals]


@functools.partial(jax.jit, static_argnames=("radius", "increment", "chunk"))
def build_cost_volume(
    E_pad: jax.Array,  # [K, PH, PW] image volume (bf16 ok)
    ref_pad: jax.Array,  # [PH, PW] f32
    radius: int = 5,
    increment: int = 2,
    chunk: int = 8,
) -> jax.Array:
    """[K, PH, PW] bf16 NCC cost volume via static shifted sums.

    Border rows/cols within ``radius`` of the padded edge contain clamped
    sums — callers never fetch there (the classifier's margin policy and
    the volume's spatial padding keep all real lookups interior).
    """
    K, PH, PW = E_pad.shape
    vals = list(range(-radius, radius + 1, increment))
    S = float(len(vals) ** 2)
    R = radius

    def sep_sum(a):
        """Separable patch sum over the rectangular offset grid:
        36 shifted adds become 6 + 6 (sum along x, then along y)."""
        ax = jnp.zeros_like(a)
        for dx in vals:
            ax = ax.at[..., R : PW - R].add(a[..., R + dx : PW - R + dx])
        out = jnp.zeros_like(a)
        for dy in vals:
            out = out.at[..., R : PH - R, :].add(
                ax[..., R + dy : PH - R + dy, :]
            )
        return out

    ref = jnp.asarray(ref_pad, jnp.float32)
    inv = 1.0 / S
    mr = sep_sum(ref) * inv
    var_r = sep_sum(ref * ref) * inv - mr * mr

    Kc = (K + chunk - 1) // chunk

    def per_chunk(ci):
        e = jax.lax.dynamic_slice_in_dim(E_pad, ci * chunk, chunk, axis=0)
        e = e.astype(jnp.float32)
        ms = sep_sum(e) * inv
        var_s = sep_sum(e * e) * inv - ms * ms
        cov = sep_sum(ref[None] * e) * inv - mr[None] * ms
        cost = 1.0 - cov * jax.lax.rsqrt(
            jnp.maximum(var_r[None] * var_s, 1e-30)
        )
        cost = jnp.clip(cost, 0.0, COST_MAX)
        cost = jnp.where(
            (var_r[None] < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost
        )
        return cost.astype(jnp.bfloat16)

    out = jax.lax.map(per_chunk, jnp.arange(Kc))  # [Kc, chunk, PH, PW]
    return out.reshape(Kc * chunk, PH, PW)[:K]


def fetch_cost(
    C: jax.Array,  # [K, PH, PW] bf16 cost volume
    xs: jax.Array,  # [...] integer ref x (unpadded coords)
    ys: jax.Array,  # [...] integer ref y
    k: jax.Array,  # [...] fractional slice index
    pad_y: int,
    pad_x: int,
) -> jax.Array:
    """k-interpolated cost lookup at integer pixel positions (2 gathers)."""
    K, PH, PW = C.shape
    kc = jnp.clip(k, 0.0, K - 1.0)
    k0 = jnp.floor(kc).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, K - 1)
    f = kc - k0.astype(jnp.float32)
    xi = jnp.clip(xs.astype(jnp.int32) + pad_x, 0, PW - 1)
    yi = jnp.clip(ys.astype(jnp.int32) + pad_y, 0, PH - 1)
    flat = C.reshape(-1)
    base = yi * PW + xi
    c0 = jnp.take(flat, k0 * (PH * PW) + base).astype(jnp.float32)
    c1 = jnp.take(flat, k1 * (PH * PW) + base).astype(jnp.float32)
    return c0 * (1.0 - f) + c1 * f
