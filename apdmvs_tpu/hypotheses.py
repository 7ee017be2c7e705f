"""Random plane-hypothesis generation and perturbation.

Stateless jax.random equivalents of the reference's curand device functions
(reference: APD.cu:211-301). The reference seeds curand from clock64()
(APD.cu:803), so bitwise parity is impossible by construction; we match the
*distributions*:

- GenerateRandomNormal (APD.cu:211-237): Marsaglia uniform-on-sphere +
  flip toward the camera. We draw an isotropic Gaussian and normalize —
  the same uniform-sphere distribution, with no rejection loop.
- GeneratePerturbedNormal (APD.cu:239-274): Euler-angle perturbation,
  fall back to the original normal if the perturbed one faces away.
- Depth perturbation (APD.cu:857-862): the reference's do/while rejection
  condition ``depth < depth_min && depth > depth_max`` can never hold, so
  it is effectively a single uniform draw in [0.98, 1.02] * depth; we
  implement exactly that single draw.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from apdmvs_tpu import geometry
from apdmvs_tpu.geometry import mat3_vec


def random_normal_facing(key: jax.Array, dirs: jax.Array) -> jax.Array:
    """Uniform unit normal on the hemisphere facing the camera.

    dirs: [..., 3] pixel viewing directions (need not be normalized — only
    the sign of the dot product matters, as in APD.cu:228-234).
    """
    v = jax.random.normal(key, dirs.shape, jnp.float32)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    dot = jnp.sum(v * dirs, axis=-1, keepdims=True)
    return jnp.where(dot > 0.0, -v, v)


def _euler_rotation(a1: jax.Array, a2: jax.Array, a3: jax.Array) -> jax.Array:
    """Rotation matrix from the reference's Euler composition
    (APD.cu:247-263). Returns [..., 3, 3]."""
    s1, s2, s3 = jnp.sin(a1), jnp.sin(a2), jnp.sin(a3)
    c1, c2, c3 = jnp.cos(a1), jnp.cos(a2), jnp.cos(a3)
    row0 = jnp.stack([c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2], -1)
    row1 = jnp.stack([c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1], -1)
    row2 = jnp.stack([-s2, c2 * s1, c1 * c2], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def perturbed_normal(
    key: jax.Array, dirs: jax.Array, normal: jax.Array, perturbation: float
) -> jax.Array:
    """Euler-perturbed normal; keeps the original when the perturbed normal
    faces away from the camera (reference: APD.cu:239-274)."""
    angles = (jax.random.uniform(key, normal.shape[:-1] + (3,)) - 0.5) * perturbation
    R = _euler_rotation(angles[..., 0], angles[..., 1], angles[..., 2])
    n_pert = mat3_vec(R, normal)
    facing_away = jnp.sum(n_pert * dirs, axis=-1, keepdims=True) >= 0.0
    n_out = jnp.where(facing_away, normal, n_pert)
    return n_out / jnp.maximum(jnp.linalg.norm(n_out, axis=-1, keepdims=True), 1e-12)


def random_depth(key: jax.Array, shape, depth_min, depth_max) -> jax.Array:
    return jax.random.uniform(key, shape, jnp.float32, 0.0, 1.0) * (
        depth_max - depth_min
    ) + depth_min


def perturbed_depth(key: jax.Array, depth: jax.Array, perturbation: float = 0.02) -> jax.Array:
    """Single uniform draw in [(1-p), (1+p)] * depth (see module docstring)."""
    u = jax.random.uniform(key, depth.shape, jnp.float32)
    lo = (1.0 - perturbation) * depth
    hi = (1.0 + perturbation) * depth
    return u * (hi - lo) + lo


def random_plane(
    key: jax.Array,
    K: jax.Array,
    x: jax.Array,
    y: jax.Array,
    dirs: jax.Array,
    depth_min,
    depth_max,
) -> jax.Array:
    """Random full plane hypothesis (reference GenerateRandomPlaneHypothesis:
    APD.cu:276-282): uniform depth, uniform facing normal, w from depth."""
    kd, kn = jax.random.split(key)
    depth = random_depth(kd, x.shape, depth_min, depth_max)
    n = random_normal_facing(kn, dirs)
    w = geometry.dist_to_origin(K, x, y, depth, n)
    return jnp.concatenate([n, w[..., None]], axis=-1)


def refinement_combos(
    key: jax.Array,
    K: jax.Array,
    x: jax.Array,
    y: jax.Array,
    dirs: jax.Array,
    cur_normal: jax.Array,
    cur_depth: jax.Array,
    depth_min,
    depth_max,
) -> Tuple[jax.Array, jax.Array]:
    """The 5 refinement candidates (reference: APD.cu:855-867):

      depths  = [rand, cur, rand, cur,  perturbed]
      normals = [cur,  rand, rand, pert, cur]

    Returns (depths [5, ...], normals [5, ..., 3]).
    """
    kd, kn, kp, ke = jax.random.split(key, 4)
    d_rand = random_depth(kd, cur_depth.shape, depth_min, depth_max)
    n_rand = random_normal_facing(kn, dirs)
    d_pert = perturbed_depth(kp, cur_depth)
    n_pert = perturbed_normal(ke, dirs, cur_normal, 0.02 * jnp.pi)
    depths = jnp.stack([d_rand, cur_depth, d_rand, cur_depth, d_pert], axis=0)
    normals = jnp.stack([cur_normal, n_rand, n_rand, n_pert, cur_normal], axis=0)
    return depths, normals
