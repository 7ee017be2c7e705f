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
) -> jax.Array:
    """E [K, H, W]: slice k = src warped by the global inverse-depth-u_k
    homography. Border-clamped bilinear sampling; the analytic
    out-of-bounds test lives in the *evaluator* (matching the reference's
    cost_max policy, APD.cu:541-613) so the volume itself is dense.

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
        return sampling.bilinear_sample(src_image, x, y).astype(dtype)

    return jax.lax.map(slice_k, jnp.arange(num_slices))


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
