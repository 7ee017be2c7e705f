"""Pure-JAX multi-view geometry core.

Vectorized equivalents of the reference device math (reference:
APD.cu:57-392, APD.cu:718-789, APD.cpp:776-812), designed for whole-image
[H, W] fields rather than per-thread scalars.

Conventions (identical to the reference):
  - Camera: ``x_cam = R @ X_world + t``; world center ``c = -R^T t``
    (reference: APD.cpp:73-77).
  - Plane hypothesis = float4 ``(nx, ny, nz, w)``: unit normal in the
    *reference-camera* frame during optimization, with ``w`` the
    plane-to-origin distance: the plane satisfies ``n . X + w = 0``
    (reference: APD.cu:187-192). At readout ``w`` becomes depth and the
    normal is rotated to world frame (reference: APD.cu:1587-1602).
  - Intrinsics: zero skew assumed by the reference's K inverse
    (reference: APD.cu:343-352); we use the same closed form.

The warp identity used throughout the cost path:
  ``H @ (p + i*e0 + j*e1) = H@p + i*(H@e0) + j*(H@e1)`` — so a full NCC
  patch warp needs only three homogeneous vectors per (pixel, view,
  hypothesis), each expressible from per-view constants:

    H = K_src (R_rel - t_rel n^T / w) K_ref^{-1}
      = A - b (n~)^T / w,   A = K_src R_rel K_ref^{-1},  b = K_src t_rel,
      n~ = K_ref^{-T} n     (i.e. n~ . p == n . (K_ref^{-1} p))

    H @ p  = A @ p  - b * (n . dir(p)) / w,   dir(p) = K_ref^{-1} p
    H @ e0 = A[:,0] - b * nx / (fx * w)
    H @ e1 = A[:,1] - b * ny / (fy * w)

  ``A @ p`` depends only on (pixel, view) and is hoisted out of the
  per-hypothesis loop (ncc.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Cameras(NamedTuple):
    """A stack of V cameras; index 0 is the reference view.

    All fields are arrays with a leading view axis. Width/height are kept
    static (Python ints) alongside, not inside, this pytree.
    """

    K: jax.Array  # [V, 3, 3] float32
    R: jax.Array  # [V, 3, 3] float32 (world -> cam)
    t: jax.Array  # [V, 3] float32
    c: jax.Array  # [V, 3] float32 world-frame centers (-R^T t)
    depth_min: jax.Array  # [V] float32
    depth_max: jax.Array  # [V] float32

    @property
    def num_views(self) -> int:
        return self.K.shape[0]



def mat3_vec(M: jax.Array, v: jax.Array) -> jax.Array:
    """Explicit 3x3 @ 3-vector with broadcasting, written as elementwise
    multiply-adds so XLA never routes it through the MXU (which would drop
    to bf16 precision by default on TPU). M: [..., 3, 3], v: [..., 3]."""
    return jnp.stack(
        [
            M[..., 0, 0] * v[..., 0] + M[..., 0, 1] * v[..., 1] + M[..., 0, 2] * v[..., 2],
            M[..., 1, 0] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 1, 2] * v[..., 2],
            M[..., 2, 0] * v[..., 0] + M[..., 2, 1] * v[..., 1] + M[..., 2, 2] * v[..., 2],
        ],
        axis=-1,
    )


def mat3_t_vec(M: jax.Array, v: jax.Array) -> jax.Array:
    """Explicit M^T @ v (see mat3_vec)."""
    return jnp.stack(
        [
            M[..., 0, 0] * v[..., 0] + M[..., 1, 0] * v[..., 1] + M[..., 2, 0] * v[..., 2],
            M[..., 0, 1] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 2, 1] * v[..., 2],
            M[..., 0, 2] * v[..., 0] + M[..., 1, 2] * v[..., 1] + M[..., 2, 2] * v[..., 2],
        ],
        axis=-1,
    )


def mat3_mat3(A: jax.Array, B: jax.Array) -> jax.Array:
    """Explicit 3x3 @ 3x3 (see mat3_vec)."""
    cols = [mat3_vec(A, B[..., :, k]) for k in range(3)]
    return jnp.stack(cols, axis=-1)


def make_cameras(K, R, t, depth_min, depth_max) -> Cameras:
    K = jnp.asarray(K, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    c = -jax.vmap(mat3_t_vec)(R, t)  # -R^T t (reference: APD.cpp:73-77)
    return Cameras(
        K=K,
        R=R,
        t=t,
        c=c,
        depth_min=jnp.asarray(depth_min, jnp.float32),
        depth_max=jnp.asarray(depth_max, jnp.float32),
    )


def scale_intrinsics(K: jax.Array, scale_x: float, scale_y: float) -> jax.Array:
    """Rescale fx, cx by scale_x and fy, cy by scale_y
    (reference: APD.cpp:480-483)."""
    K = jnp.asarray(K)
    out = K
    out = out.at[..., 0, 0].multiply(scale_x)
    out = out.at[..., 0, 2].multiply(scale_x)
    out = out.at[..., 1, 1].multiply(scale_y)
    out = out.at[..., 1, 2].multiply(scale_y)
    return out


def pixel_grid(height: int, width: int) -> Tuple[jax.Array, jax.Array]:
    """Integer pixel coordinate fields x[H,W], y[H,W] as float32."""
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    return x, y


def pixel_dirs(K: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Back-projection directions ``K^{-1} (x, y, 1)`` assuming zero skew:
    ((x-cx)/fx, (y-cy)/fy, 1) (reference: APD.cu:159-171).

    K: [3,3]; x, y: [...]; returns [..., 3].
    """
    fx, cx = K[0, 0], K[0, 2]
    fy, cy = K[1, 1], K[1, 2]
    dx = (x - cx) / fx
    dy = (y - cy) / fy
    return jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)


def depth_from_plane(K: jax.Array, plane: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Depth of the plane at pixel (x, y) (reference: APD.cu:206-209).

    plane: [..., 4] in ref-cam frame; returns [...].
    Equivalent to ``-w / (n . dir(p))``.
    """
    n = plane[..., :3]
    w = plane[..., 3]
    d = pixel_dirs(K, x, y)
    denom = jnp.sum(n * d, axis=-1)
    return -w / denom


def dist_to_origin(
    K: jax.Array, x: jax.Array, y: jax.Array, depth: jax.Array, normal: jax.Array
) -> jax.Array:
    """Plane-to-origin distance w = -(n . X) with X = depth * dir(p)
    (reference: APD.cu:187-192)."""
    d = pixel_dirs(K, x, y)
    return -depth * jnp.sum(normal[..., :3] * d, axis=-1)


def view_directions(K: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Unit viewing ray per pixel (reference: APD.cu:173-185; depth cancels
    under normalization for depth > 0)."""
    d = pixel_dirs(K, x, y)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def relative_pose(cams: Cameras, src: int | jax.Array) -> Tuple[jax.Array, jax.Array]:
    """R_rel = R_src R_ref^T and t_rel = R_src (C_ref - C_src)
    (reference: APD.cu:303-331)."""
    R_ref = cams.R[0]
    R_src = cams.R[src]
    r_rel = mat3_mat3(R_src, jnp.swapaxes(R_ref, -1, -2))
    t_rel = mat3_vec(R_src, cams.c[0] - cams.c[src])
    return r_rel, t_rel


def k_inverse_zero_skew(K: jax.Array) -> jax.Array:
    """Closed-form K^{-1} under the reference's zero-skew assumption
    (reference: APD.cu:343-352)."""
    fx, cx = K[0, 0], K[0, 2]
    fy, cy = K[1, 1], K[1, 2]
    z = jnp.zeros((), K.dtype)
    o = jnp.ones((), K.dtype)
    return jnp.array(
        [
            [1.0 / fx, z, -cx / fx],
            [z, 1.0 / fy, -cy / fy],
            [z, z, o],
        ]
    )


class WarpConstants(NamedTuple):
    """Per-(ref, src) homography constants: H(plane) = A - b (n~)^T / w.

    With dir(p) = K_ref^{-1} p the warp evaluates as
      H @ p  = M @ dir(p) - b * (n . dir(p)) / w
      H @ e0 = (M[:, 0] - b * nx / w) * inv_fx
      H @ e1 = (M[:, 1] - b * ny / w) * inv_fy
    (module docstring; M absorbs K_ref^{-1} through dir()).
    """

    A: jax.Array  # [V, 3, 3]: K_src R_rel K_ref^{-1}
    M: jax.Array  # [V, 3, 3]: K_src R_rel
    b: jax.Array  # [V, 3]: K_src t_rel
    # Columns of K_ref^{-1} scaled: used for patch-offset increments.
    inv_fx: jax.Array  # [] float32: 1/fx of ref
    inv_fy: jax.Array  # [] float32: 1/fy of ref


def warp_constants(cams: Cameras) -> WarpConstants:
    """Precompute per-view homography constants for all source views.

    Index v of A/b corresponds to camera v (entry 0 is ref-vs-ref and unused).
    """
    K_ref_inv = k_inverse_zero_skew(cams.K[0])

    def per_view(v):
        r_rel, t_rel = relative_pose(cams, v)
        M = mat3_mat3(cams.K[v], r_rel)
        A = mat3_mat3(M, K_ref_inv)
        b = mat3_vec(cams.K[v], t_rel)
        return A, M, b

    V = cams.num_views
    A, M, b = jax.vmap(per_view)(jnp.arange(V))
    return WarpConstants(
        A=A,
        M=M,
        b=b,
        inv_fx=1.0 / cams.K[0, 0, 0],
        inv_fy=1.0 / cams.K[0, 1, 1],
    )


def homography(cams: Cameras, src: int, plane: jax.Array) -> jax.Array:
    """Full 3x3 plane-induced homography (reference: APD.cu:303-363).

    plane: [..., 4] -> H: [..., 3, 3]. Mostly for tests; the cost path uses
    the decomposed A/b form.
    """
    r_rel, t_rel = relative_pose(cams, src)
    K_ref_inv = k_inverse_zero_skew(cams.K[0])
    n = plane[..., :3]
    w = plane[..., 3:4]
    mid = r_rel - t_rel[:, None] * (n / w)[..., None, :]
    return mat3_mat3(mat3_mat3(jnp.broadcast_to(cams.K[src], mid.shape), mid),
                     jnp.broadcast_to(K_ref_inv, mid.shape))


def apply_homography(H: jax.Array, x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Warp pixel (x, y) by H (reference: APD.cu:365-372)."""
    p = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    q = mat3_vec(H, p)
    return q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]


def normal_cam_to_world(R: jax.Array, n: jax.Array) -> jax.Array:
    """R^T n (reference TransformNormal: APD.cu:374-382)."""
    return mat3_t_vec(R, n)


def normal_world_to_cam(R: jax.Array, n: jax.Array) -> jax.Array:
    """R n (reference TransformNormal2RefCam: APD.cu:384-392)."""
    return mat3_vec(R, n)


def backproject_world(
    x: jax.Array, y: jax.Array, depth: jax.Array, K: jax.Array, R: jax.Array, c: jax.Array
) -> jax.Array:
    """Pixel + depth -> world point (reference Get3DPointonWorld_cu:
    APD.cu:718-738): X = R^T (depth * dir) + c."""
    X_cam = depth[..., None] * pixel_dirs(K, x, y)
    return mat3_t_vec(R, X_cam) + c


def project_camera(
    X: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """World point -> (px, py, depth) (reference ProjectonCamera_cu:
    APD.cu:740-750). Uses full K rows like the reference."""
    x_cam = mat3_vec(R, X) + t
    depth = K[2, 0] * x_cam[..., 0] + K[2, 1] * x_cam[..., 1] + K[2, 2] * x_cam[..., 2]
    px = (K[0, 0] * x_cam[..., 0] + K[0, 1] * x_cam[..., 1] + K[0, 2] * x_cam[..., 2]) / depth
    py = (K[1, 0] * x_cam[..., 0] + K[1, 1] * x_cam[..., 1] + K[1, 2] * x_cam[..., 2]) / depth
    return px, py, depth


def planes_to_depth_normal(
    cams: Cameras, planes: jax.Array, height: int, width: int
) -> Tuple[jax.Array, jax.Array]:
    """Optimization-frame planes -> (depth [H,W], world normals [H,W,3])
    (reference GetDepthandNormal: APD.cu:1587-1602)."""
    x, y = pixel_grid(height, width)
    depth = depth_from_plane(cams.K[0], planes, x, y)
    n_world = normal_cam_to_world(cams.R[0], planes[..., :3])
    return depth, n_world


def depth_normal_to_planes(
    cams: Cameras, depth: jax.Array, normal_world: jax.Array, height: int, width: int
) -> jax.Array:
    """(depth, world normal) -> optimization-frame planes (reference
    RandomInitialization reload branch: APD.cu:826-833)."""
    x, y = pixel_grid(height, width)
    n_cam = normal_world_to_cam(cams.R[0], normal_world)
    w = dist_to_origin(cams.K[0], x, y, depth, n_cam)
    return jnp.concatenate([n_cam, w[..., None]], axis=-1)
