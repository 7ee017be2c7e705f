"""Multi-view NCC cost evaluation — the hot path.

TPU-native reformulation of the reference's per-thread NCC inner loops
(ComputeBilateralNCCOld: APD.cu:530-614, cost vectors: APD.cu:696-716,
initial cost + top-k view seeding: APD.cu:616-693, geometric consistency:
APD.cu:752-789).

Key reformulation (geometry.py docstring): the homography patch warp is
affine in the patch offset, so a candidate evaluation needs three
homogeneous vectors per (pixel, view) — after that every window sample is a
handful of VPU FMAs, one divide, and one bilinear gather. Reference-image
samples on the full grid use static shifted slices (no gather at all).

Costs are "1 - NCC" clamped to [0, 2]; degenerate patches (variance < 1e-5)
and out-of-view warps cost 2 (reference: APD.cu:541-613).

Note the reference's "bilateral" weights are hardcoded to 1.0
(APD.cu:473,575), so NCC is unweighted; sigma_spatial/sigma_color are
vestigial (SURVEY.md §2.2). We implement the effective behavior.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, sampling
from apdmvs_tpu.geometry import Cameras, WarpConstants, mat3_vec

COST_MAX = 2.0
GEOM_COST_MAX = 3.0
MIN_VAR = 1e-5


class VolumeSet(NamedTuple):
    """Per-source-view plane-sweep volumes for the Pallas fast path
    (ops/__init__ rationale; PERF_NOTES.md measurements).

    All per-view fields store SOURCE views only — index v-1 for camera v
    (round 5: the previous layout carried an all-zero view-0 plane in
    every field, ~20% of the set's HBM and build traffic for nothing).

    E: [V-1, K, Hp+2*PAD_Y, Wp+2*PAD_X] bf16; (Hp, Wp) = image dims
      padded up to (8, 128) multiples.
    consts: [V-1, 1, 21] f32 — ncc_volume.pack_consts per source view.
    ref_pad: [Hp+2*PAD_Y, Wp+2*PAD_X] f32 — padded reference image.
    D / geom_consts: optional source-depth volumes (trunc-sampled,
      [V-1, K, Hp, Wp]) + reprojection constants for geometric-
      consistency passes.
    """

    E: jax.Array
    consts: jax.Array
    ref_pad: jax.Array
    D: Optional[jax.Array] = None
    geom_consts: Optional[jax.Array] = None
    # NCC cost volumes for the weak/APD machinery (ops/cost_volume.py):
    # C36 = strong patch config (radius 5, step 2), C9 = anchor patch
    # config (radius 5, step 5). [V-1, K, PH, PW] bf16.
    C36: Optional[jax.Array] = None
    C9: Optional[jax.Array] = None
    # Rebased volumes R[v, j, p] = E[v, b(p) + j - J, p] around the current
    # depth estimate's slice map b (ops/ncc_volume.py "Rebased volumes"
    # rationale): grid NCC fetches then run over an 8-slice deviation band
    # instead of the ~16-slice slope spread. Rebuilt per iteration via
    # rebase_volume_set; None falls back to the direct kernel.
    R: Optional[jax.Array] = None
    base_k: Optional[jax.Array] = None

    @property
    def spaced(self) -> bool:
        """True when the set stores per-space-shard haloed row slabs
        (leading [S] axis on every pixel-grid field; parallel/spaced.py)."""
        return self.E.ndim == 5

    @property
    def num_slices(self) -> int:
        return self.E.shape[2] if self.spaced else self.E.shape[1]

    @property
    def u_grid(self):
        """(u_min, du) of the slice grid as traced scalars."""
        c = self.consts[0] if self.consts.ndim == 4 else self.consts
        return c[0, 0, 4], c[0, 0, 5]


class CostContext(NamedTuple):
    """Per-pass immutable inputs to all cost evaluations.

    images: [V, H, W] float32, index 0 = reference view.
    src_valid: [V] bool — True for real source views (False for view 0 and
      any padding views); invalid views always cost COST_MAX, reproducing
      the reference's 2.0-initialized cost vectors (APD.cu:626-627).
    depth_maps: [V, H, W] source-view depths for geometric-consistency
      passes (entry 0 = this view's own previous depth, unused) or None.
    volumes: optional VolumeSet enabling the Pallas NCC fast path for
      full-grid evaluations (point-mode/worklist evaluation keeps the
      XLA path).
    """

    images: jax.Array
    cams: Cameras
    wc: WarpConstants
    dirs: jax.Array  # [H, W, 3] ref pixel directions K_ref^{-1} p
    x: jax.Array  # [H, W]
    y: jax.Array  # [H, W]
    src_valid: jax.Array  # [V] bool
    depth_maps: Optional[jax.Array]
    volumes: Optional[VolumeSet] = None
    # bf16 copy for point-mode (worklist) gathers: TPU gather time scales
    # with bytes (PERF_NOTES.md) and images are 8-bit quantized anyway.
    images_bf16: Optional[jax.Array] = None

    @property
    def height(self) -> int:
        return self.images.shape[1]

    @property
    def width(self) -> int:
        return self.images.shape[2]

    @property
    def num_views(self) -> int:
        return self.images.shape[0]


def make_context(
    images: jax.Array,
    cams: Cameras,
    src_valid: jax.Array,
    depth_maps: Optional[jax.Array] = None,
    volumes: Optional[VolumeSet] = None,
) -> CostContext:
    V, H, W = images.shape
    x, y = geometry.pixel_grid(H, W)
    dirs = geometry.pixel_dirs(cams.K[0], x, y)
    wc = geometry.warp_constants(cams)
    return CostContext(
        images=jnp.asarray(images, jnp.float32),
        cams=cams,
        wc=wc,
        dirs=dirs,
        x=x,
        y=y,
        src_valid=jnp.asarray(src_valid, bool),
        depth_maps=None if depth_maps is None else jnp.asarray(depth_maps, jnp.float32),
        volumes=volumes,
        images_bf16=jnp.asarray(images, jnp.bfloat16),
    )


def _ceil_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@partial(jax.jit, static_argnames=("num_slices", "weak_cost_volumes"))
def build_image_volume_set(
    images: jax.Array,  # [V, H, W] f32
    cams: Cameras,
    depth_min,
    depth_max,
    num_slices: int = 160,
    weak_cost_volumes: bool = True,
) -> VolumeSet:
    """Build the image-dependent plane-sweep volumes (Pallas builder).

    These (E, ref_pad, C36/C9) depend only on (images, cameras, depth
    grid) — NOT on hypotheses, iteration, or pass — so the scene runner
    caches them device-resident per (problem, scale) and reuses the set
    across the round's 4 passes (scene.SceneCache.image_volumes; measured
    1.56 s/build at 640x480x5v, scripts/measure_build.py). Depth volumes
    for geometric-consistency passes depend on the src views' current
    estimates and are attached per pass via ``add_depth_volumes``.
    """
    from apdmvs_tpu.ops import ncc_volume, volume as vol

    V, H, W = images.shape
    Hp = _ceil_to(H, ncc_volume.NCC_TILE_H)
    Wp = _ceil_to(W, ncc_volume.TILE_W)
    wc = geometry.warp_constants(cams)
    u_min, du = vol.inv_depth_grid(depth_min, depth_max, num_slices)
    # source views only (index v-1 for camera v): a zero view-0 plane
    # would be ~20% of the set's HBM + build traffic for nothing
    Es = []
    consts = []
    for v in range(1, V):
        Es.append(
            vol.build_volume_pallas(
                images[v], wc.M[v], wc.b[v], cams.K[0], Hp, Wp, u_min, du,
                num_slices, pad_y=ncc_volume.PAD_Y, pad_x=ncc_volume.PAD_X,
                dtype=jnp.bfloat16,
            )
        )
        consts.append(ncc_volume.pack_consts(cams.K[0], wc.M[v], wc.b[v], u_min, du, W, H))
    ref_pad = jnp.pad(
        jnp.asarray(images[0], jnp.float32),
        (
            (ncc_volume.PAD_Y, ncc_volume.PAD_Y + Hp - H),
            (ncc_volume.PAD_X, ncc_volume.PAD_X + Wp - W),
        ),
        mode="edge",
    )
    C36 = C9 = None
    if weak_cost_volumes:
        from apdmvs_tpu.ops import cost_volume as cv

        C36 = jnp.stack(
            [cv.build_cost_volume(E, ref_pad, radius=5, increment=2) for E in Es]
        )
        C9 = jnp.stack(
            [cv.build_cost_volume(E, ref_pad, radius=5, increment=5) for E in Es]
        )
    return VolumeSet(
        E=jnp.stack(Es),
        consts=jnp.stack(consts),
        ref_pad=ref_pad,
        C36=C36,
        C9=C9,
    )


@jax.jit
def add_depth_volumes(
    vs: VolumeSet,
    depth_maps: jax.Array,  # [V, H, W] source-view depth estimates
    cams: Cameras,
    depth_min,
    depth_max,
) -> VolumeSet:
    """Attach the per-pass depth volumes (geometric consistency) to a cached
    image volume set. Rebuilt every geom pass — the src views' depth
    estimates change each pass (reference re-reads depths.dmb per pass,
    APD.cpp:492-510).

    Jitted as one program: built eagerly, the ~100 small const-packing ops
    each pay a dispatch round-trip (2.5 s total on the tunneled chip vs
    ~0.4 s of actual builder-kernel time — scripts/measure_build.py)."""
    from apdmvs_tpu.ops import ncc_volume, volume as vol

    V = depth_maps.shape[0]
    num_slices = vs.num_slices
    Hp = vs.ref_pad.shape[0] - 2 * ncc_volume.PAD_Y
    Wp = vs.ref_pad.shape[1] - 2 * ncc_volume.PAD_X
    H, W = depth_maps.shape[1], depth_maps.shape[2]
    wc = geometry.warp_constants(cams)
    u_min, du = vol.inv_depth_grid(depth_min, depth_max, num_slices)
    K_ref = cams.K[0]
    R_ref = cams.R[0]
    Ds = []
    gconsts = []
    for v in range(1, V):
        Ds.append(
            vol.build_volume_pallas(
                depth_maps[v], wc.M[v], wc.b[v], cams.K[0], Hp, Wp,
                u_min, du, num_slices, pad_y=0, pad_x=0,
                dtype=jnp.float32, trunc=True,
            )
        )
        # A = K_r R_r R_s^T K_s^{-1}; t' = K_r R_r (c_s - c_r)
        A = geometry.mat3_mat3(
            geometry.mat3_mat3(
                geometry.mat3_mat3(K_ref, R_ref), jnp.swapaxes(cams.R[v], -1, -2)
            ),
            geometry.k_inverse_zero_skew(cams.K[v]),
        )
        t2 = geometry.mat3_vec(
            geometry.mat3_mat3(K_ref, R_ref), cams.c[v] - cams.c[0]
        )
        gconsts.append(
            ncc_volume.pack_geom_consts(
                cams.K[0], wc.M[v], wc.b[v], A, t2, u_min, du, W, H
            )
        )
    return vs._replace(D=jnp.stack(Ds), geom_consts=jnp.stack(gconsts))


@jax.jit
def rebase_volume_set(vs: VolumeSet, cams: Cameras, depth: jax.Array) -> VolumeSet:
    """Attach rebased volumes R (and the clipped base map) centered on the
    slice of ``depth`` at every pixel (ops/ncc_volume.py "Rebased volumes").

    Called once per propagation iteration with the current depth estimate;
    costs ~a dozen ms and makes every grid NCC fetch in the iteration run
    over an 8-slice deviation band. Results are exact regardless of the
    base (out-of-band candidates take the kernel's exact fallback), so any
    depth — including FIRST_INIT's random seed — is a valid base.
    """
    from apdmvs_tpu.ops import ncc_volume

    if vs.spaced:
        return rebase_volume_set_spaced(vs, cams, depth)
    if jax.default_backend() == "cpu":
        # CPU grid calls route through the XLA mirror; R would be unused
        return vs
    u_min, du = vs.u_grid
    K = vs.num_slices
    H, W = depth.shape
    PH, PW = vs.ref_pad.shape
    valid = depth > 0.0
    k = (1.0 / jnp.where(valid, depth, 1.0) - u_min) / du
    k = jnp.where(valid, jnp.clip(k, 0.0, K - 1.0), K / 2.0)
    base_k = jnp.pad(
        k, ((ncc_volume.PAD_Y, PH - H - ncc_volume.PAD_Y),
            (ncc_volume.PAD_X, PW - W - ncc_volume.PAD_X)),
        mode="edge",
    )
    Rs = []
    bf = None
    for vi in range(vs.E.shape[0]):
        Rv, bf = ncc_volume.build_rebased_view(vs.E[vi], base_k, K)
        Rs.append(Rv)
    return vs._replace(R=jnp.stack(Rs), base_k=bf)


def build_volume_set(
    images: jax.Array,  # [V, H, W] f32
    cams: Cameras,
    depth_min,
    depth_max,
    num_slices: int = 160,
    depth_maps: Optional[jax.Array] = None,  # [V, H, W] for geom passes
    weak_cost_volumes: bool = True,
) -> VolumeSet:
    """One-shot build of image (+ optional depth) volumes — the uncached
    path; see build_image_volume_set for the amortization contract."""
    vs = build_image_volume_set(
        images, cams, depth_min, depth_max, num_slices=num_slices,
        weak_cost_volumes=weak_cost_volumes,
    )
    if depth_maps is not None:
        vs = add_depth_volumes(vs, depth_maps, cams, depth_min, depth_max)
    return vs


def _cost_vector_volume(
    ctx: CostContext, plane: jax.Array, radius: int, increment: int
) -> jax.Array:
    """Grid-mode cost vector through the fused Pallas kernel.

    plane: [H, W, 4] or [C, H, W, 4] -> [V, H, W] / [V, C, H, W].
    """
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    if vs.spaced:
        return _cost_vector_volume_spaced(ctx, plane, radius, increment)
    H, W = ctx.height, ctx.width
    Hp = vs.ref_pad.shape[0] - 2 * ncc_volume.PAD_Y
    Wp = vs.ref_pad.shape[1] - 2 * ncc_volume.PAD_X
    squeeze = plane.ndim == 3
    if squeeze:
        plane = plane[None]
    C = plane.shape[0]
    planes_cf = jnp.moveaxis(plane, -1, 1)  # [C, 4, H, W]
    if (Hp, Wp) != (H, W):
        # pad with a benign fronto-parallel plane (results sliced off)
        pad_plane = jnp.zeros((C, 4, Hp - H, W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad_plane], axis=2)
        pad_plane2 = jnp.zeros((C, 4, Hp, Wp - W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad_plane2], axis=3)

    V = ctx.num_views
    # per-view unrolled kernels: measured 5x faster than a fori_loop-based
    # all-views kernel (Mosaic pipelines unrolled bodies; fori adds per-
    # iteration overhead on tiny [8,128] ops)
    if vs.R is not None:
        outs = [
            ncc_volume.ncc_rebased_cost_view(
                vs.R[v - 1], vs.base_k, vs.E[v - 1], vs.ref_pad, planes_cf,
                vs.consts[v - 1], vs.num_slices,
                radius=radius, increment=increment,
            )[:, :H, :W]
            for v in range(1, V)
        ]
    else:
        outs = [
            ncc_volume.ncc_volume_cost_view(
                vs.E[v - 1], vs.ref_pad, planes_cf, vs.consts[v - 1],
                vs.num_slices,
                radius=radius, increment=increment,
            )[:, :H, :W]
            for v in range(1, V)
        ]
    costs = jnp.concatenate(
        [jnp.full((1,) + outs[0].shape, COST_MAX, jnp.float32), jnp.stack(outs)]
    )  # [V, C, H, W]
    shape = (V,) + (1,) * (costs.ndim - 1)
    costs = jnp.where(ctx.src_valid.reshape(shape), costs, COST_MAX)
    return costs[:, 0] if squeeze else costs


def _warp_basis(
    ctx: CostContext, v: jax.Array, plane: jax.Array, dirs: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Hp, He0, He1 homogeneous warp vectors for plane at pixels with
    directions ``dirs`` (geometry.py docstring identities)."""
    n = plane[..., :3]
    w = plane[..., 3]
    Mv = ctx.wc.M[v]  # [3,3]
    bv = ctx.wc.b[v]  # [3]
    ndir = jnp.sum(n * dirs, axis=-1)
    Hp = mat3_vec(Mv, dirs) - bv * (ndir / w)[..., None]
    He0 = (Mv[:, 0] - bv * (n[..., 0] / w)[..., None]) * ctx.wc.inv_fx
    He1 = (Mv[:, 1] - bv * (n[..., 1] / w)[..., None]) * ctx.wc.inv_fy
    return Hp, He0, He1


def _project(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]


def _ncc_from_sums(s_r, s_rr, s_s, s_ss, s_rs, count):
    """cost = clamp(1 - cov/sqrt(var_r var_s), 0, 2); degenerate -> 2
    (reference: APD.cu:592-610)."""
    inv = 1.0 / count
    mr = s_r * inv
    ms = s_s * inv
    var_r = s_rr * inv - mr * mr
    var_s = s_ss * inv - ms * ms
    cov = s_rs * inv - mr * ms
    ncc_cost = 1.0 - cov * jax.lax.rsqrt(jnp.maximum(var_r * var_s, 1e-30))
    cost = jnp.clip(ncc_cost, 0.0, COST_MAX)
    return jnp.where((var_r < MIN_VAR) | (var_s < MIN_VAR), COST_MAX, cost)


def ncc_cost_view(
    ctx: CostContext,
    v: jax.Array,
    plane: jax.Array,
    radius: int,
    increment: int,
    xs: Optional[jax.Array] = None,
    ys: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain NCC cost of ``plane`` against source view ``v``.

    Grid mode (xs is None): evaluates every pixel of the full [H, W] grid;
    reference-patch samples come from static shifted slices.

    Point mode: evaluates at float coords (xs, ys) of any shape — used for
    worklist (weak-pixel) evaluation and anchor patches, where the plane may
    belong to a different pixel than the patch center (deformed NCC;
    reference: APD.cu:400-528 anchor loop). ``plane`` may carry extra
    leading batch dims relative to xs/ys (e.g. plane [C, N, 4] with xs [N]
    evaluates C candidate planes per point in one fused batch); the result
    has the broadcast shape.

    Matches ComputeBilateralNCCOld (APD.cu:530-614): the patch-center warp
    out of source bounds costs COST_MAX.
    """
    offsets = sampling.patch_offsets(radius, increment)
    S = offsets.shape[0]
    grid_mode_pre = xs is None
    if grid_mode_pre or ctx.images_bf16 is None:
        src_img = jnp.take(ctx.images, v, axis=0)
        ref_img = ctx.images[0]
    else:
        # point mode: bf16 gather sources (gather cost scales with bytes)
        src_img = jnp.take(ctx.images_bf16, v, axis=0)
        ref_img = ctx.images_bf16[0]
    H, W = ctx.height, ctx.width
    src_h = H  # all views share one resolution (reference: main.cpp:51-70)
    src_w = W

    grid_mode = xs is None
    if grid_mode:
        xs_, ys_ = ctx.x, ctx.y
        dirs = ctx.dirs
        pad = radius
        ref_padded = jnp.pad(ref_img, pad, mode="edge")
    else:
        xs_, ys_ = xs, ys
        dirs = geometry.pixel_dirs(ctx.cams.K[0], xs_, ys_)

    Hp, He0, He1 = _warp_basis(ctx, v, plane, dirs)
    cx, cy = _project(Hp)
    center_oob = (cx < 0.0) | (cx >= src_w) | (cy < 0.0) | (cy >= src_h)

    offs = jnp.asarray(offsets, jnp.float32)

    def body(carry, off):
        s_r, s_rr, s_s, s_ss, s_rs = carry
        di, dj = off[0], off[1]
        q = Hp + di[..., None] * He0 + dj[..., None] * He1
        sx_, sy_ = _project(q)
        src_pix = sampling.bilinear_sample(src_img, sx_, sy_)
        if grid_mode:
            # static-offset shifted slice of the edge-padded reference image
            ref_pix = jax.lax.dynamic_slice(
                ref_padded,
                (
                    (dj + pad).astype(jnp.int32),
                    (di + pad).astype(jnp.int32),
                ),
                (H, W),
            )
        else:
            ref_pix = sampling.bilinear_sample(ref_img, xs_ + di, ys_ + dj)
        return (
            s_r + ref_pix,
            s_rr + ref_pix * ref_pix,
            s_s + src_pix,
            s_ss + src_pix * src_pix,
            s_rs + ref_pix * src_pix,
        ), None

    out_shape = jnp.broadcast_shapes(plane.shape[:-1], xs_.shape)
    zeros = jnp.zeros(out_shape, jnp.float32)
    (s_r, s_rr, s_s, s_ss, s_rs), _ = jax.lax.scan(
        body, (zeros, zeros, zeros, zeros, zeros), offs
    )
    cost = _ncc_from_sums(s_r, s_rr, s_s, s_ss, s_rs, float(S))
    return jnp.where(center_oob, COST_MAX, cost)


def point_warp_oob(
    ctx: CostContext, v_consts: jax.Array, dirs: jax.Array, u: jax.Array
) -> jax.Array:
    """Analytic out-of-source-bounds test of a warped point from packed
    per-view consts (replaces texture-bounds checks; APD.cu:546-556)."""
    M = v_consts[6:15].reshape(3, 3)
    b = v_consts[15:18]
    src_w = v_consts[18]
    src_h = v_consts[19]
    q = geometry.mat3_vec(M, dirs) + b * u[..., None]
    px = q[..., 0] / q[..., 2]
    py = q[..., 1] / q[..., 2]
    return (px < 0.0) | (px >= src_w) | (py < 0.0) | (py >= src_h)


def point_cost_volume(
    ctx: CostContext,
    plane: jax.Array,  # [..., P, 4]
    xs: jax.Array,  # [P] or [P, A] integer coords
    ys: jax.Array,
    which: str,  # 'C36' (radius 5 step 2) | 'C9' (radius 5 step 5)
) -> Tuple[jax.Array, jax.Array]:
    """Point-mode patch NCC via the precomputed cost volumes
    (ops/cost_volume.py; fronto-parallel-at-center approximation).

    Returns (costs [V, ..., P(, A)], oob [V, ..., P(, A)]); view 0 =
    COST_MAX. Invalid views masked by the caller.
    """
    from apdmvs_tpu.ops import cost_volume as cvol, ncc_volume

    vs = ctx.volumes
    C = vs.C36 if which == "C36" else vs.C9
    u_min, du = vs.u_grid
    dirs = geometry.pixel_dirs(ctx.cams.K[0], xs.astype(jnp.float32), ys.astype(jnp.float32))
    n = plane[..., :3]
    w = plane[..., 3]
    u = -jnp.sum(n * dirs, axis=-1) / w  # [..., P(, A)]
    k = (u - u_min) / du
    V = ctx.num_views
    costs = []
    oobs = []
    for v in range(1, V):
        c = cvol.fetch_cost(
            C[v - 1], xs, ys, k, ncc_volume.PAD_Y, ncc_volume.PAD_X
        )
        o = point_warp_oob(ctx, vs.consts[v - 1, 0], dirs, u)
        costs.append(jnp.where(o, COST_MAX, c))
        oobs.append(o)
    pad = jnp.full_like(costs[0], COST_MAX)
    cost_all = jnp.concatenate([pad[None], jnp.stack(costs)])
    oob_all = jnp.concatenate([jnp.ones_like(oobs[0])[None], jnp.stack(oobs)])
    shape = (V,) + (1,) * (cost_all.ndim - 1)
    cost_all = jnp.where(ctx.src_valid.reshape(shape), cost_all, COST_MAX)
    return cost_all, oob_all


def cost_vector(
    ctx: CostContext,
    plane: jax.Array,
    radius: int,
    increment: int,
    xs: Optional[jax.Array] = None,
    ys: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-source-view plain-NCC costs [V, ...] (entry 0 and padding views
    = COST_MAX), matching ComputeMultiViewCostVectorOld (APD.cu:707-716)
    shifted so index v corresponds to camera v.

    Grid-mode evaluations route through the fused Pallas volume kernel
    when the context carries volumes (PERF_NOTES.md: ~55x the XLA path);
    point-mode (worklist) evaluations with the standard patch configs use
    the precomputed cost volumes."""
    if xs is None and ctx.volumes is not None:
        return _cost_vector_volume(ctx, plane, radius, increment)
    if (
        xs is not None
        and ctx.volumes is not None
        and ctx.volumes.C36 is not None
        and (radius, increment) in ((5, 2), (5, 5))
    ):
        which = "C36" if (radius, increment) == (5, 2) else "C9"
        costs, _ = point_cost_volume(ctx, plane, xs, ys, which)
        return costs

    def per_view(v):
        return ncc_cost_view(ctx, v, plane, radius, increment, xs, ys)

    costs = jax.lax.map(per_view, jnp.arange(ctx.num_views))
    shape = (ctx.num_views,) + (1,) * (costs.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), costs, COST_MAX)


def cost_vector_full(
    ctx: CostContext,
    plane: jax.Array,
    radius: int,
    increment: int,
) -> jax.Array:
    """Grid-mode per-view NCC costs via the exact full-K kernel — for
    hypotheses whose slice index is structurally unbounded (the refinement
    random-depth combos, APD.cu:855-867: per-pixel uniform over the whole
    depth range, so no fetch band can hold them and the L1+L2 scheme would
    flag every tile). Point-mode and no-volume contexts fall back to
    :func:`cost_vector` (its XLA paths are exact for any plane)."""
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    if vs is None:
        return cost_vector(ctx, plane, radius, increment)
    if vs.spaced:
        return _cost_vector_full_spaced(ctx, plane, radius, increment)
    H, W = ctx.height, ctx.width
    Hp = vs.ref_pad.shape[0] - 2 * ncc_volume.PAD_Y
    Wp = vs.ref_pad.shape[1] - 2 * ncc_volume.PAD_X
    squeeze = plane.ndim == 3
    if squeeze:
        plane = plane[None]
    C = plane.shape[0]
    planes_cf = jnp.moveaxis(plane, -1, 1)
    if (Hp, Wp) != (H, W):
        pad1 = jnp.zeros((C, 4, Hp - H, W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad1], axis=2)
        pad2 = jnp.zeros((C, 4, Hp, Wp - W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad2], axis=3)
    V = ctx.num_views
    outs = [
        ncc_volume.ncc_volume_cost_view_fullk(
            vs.E[v - 1], vs.ref_pad, planes_cf, vs.consts[v - 1],
            vs.num_slices,
            radius=radius, increment=increment,
        )[:, :H, :W]
        for v in range(1, V)
    ]
    costs = jnp.concatenate(
        [jnp.full((1,) + outs[0].shape, COST_MAX, jnp.float32), jnp.stack(outs)]
    )
    shape = (V,) + (1,) * (costs.ndim - 1)
    costs = jnp.where(ctx.src_valid.reshape(shape), costs, COST_MAX)
    return costs[:, 0] if squeeze else costs


def geom_cost_view(
    ctx: CostContext,
    v: jax.Array,
    plane: jax.Array,
    xs: Optional[jax.Array] = None,
    ys: Optional[jax.Array] = None,
) -> jax.Array:
    """Geometric consistency: forward-project through the source view's
    depth map and measure reprojection error, clamped at 3
    (reference ComputeGeomConsistencyCost: APD.cu:752-789)."""
    assert ctx.depth_maps is not None, "geom pass needs source depth maps"
    if xs is None:
        xs_, ys_, dirs = ctx.x, ctx.y, ctx.dirs
    else:
        xs_, ys_ = xs, ys
        dirs = geometry.pixel_dirs(ctx.cams.K[0], xs_, ys_)
    n = plane[..., :3]
    w = plane[..., 3]
    depth = -w / jnp.sum(n * dirs, axis=-1)
    cams = ctx.cams
    X = geometry.backproject_world(xs_, ys_, depth, cams.K[0], cams.R[0], cams.c[0])
    px, py, _ = geometry.project_camera(X, cams.K[v], cams.R[v], cams.t[v])
    src_depth = sampling.nearest_sample_trunc(jnp.take(ctx.depth_maps, v, axis=0), px, py)
    X2 = geometry.backproject_world(px, py, src_depth, cams.K[v], cams.R[v], cams.c[v])
    bx, by, _ = geometry.project_camera(X2, cams.K[0], cams.R[0], cams.t[0])
    err = jnp.sqrt((xs_ - bx) ** 2 + (ys_ - by) ** 2)
    return jnp.where(src_depth == 0.0, GEOM_COST_MAX, jnp.minimum(GEOM_COST_MAX, err))


def _geom_cost_vector_volume(ctx: CostContext, plane: jax.Array) -> jax.Array:
    """Grid-mode geometric costs via the depth-volume Pallas kernel."""
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    if vs.spaced:
        return _geom_cost_vector_volume_spaced(ctx, plane)
    H, W = ctx.height, ctx.width
    Hp, Wp = vs.D.shape[2], vs.D.shape[3]
    squeeze = plane.ndim == 3
    if squeeze:
        plane = plane[None]
    C = plane.shape[0]
    planes_cf = jnp.moveaxis(plane, -1, 1)
    if (Hp, Wp) != (H, W):
        pad1 = jnp.zeros((C, 4, Hp - H, W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad1], axis=2)
        pad2 = jnp.zeros((C, 4, Hp, Wp - W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad2], axis=3)
    V = ctx.num_views
    outs = [
        ncc_volume.geom_volume_cost_view(
            vs.D[v - 1], planes_cf, vs.geom_consts[v - 1], vs.num_slices
        )[:, :H, :W]
        for v in range(1, V)
    ]
    costs = jnp.concatenate(
        [jnp.full((1,) + outs[0].shape, GEOM_COST_MAX, jnp.float32), jnp.stack(outs)]
    )
    shape = (V,) + (1,) * (costs.ndim - 1)
    costs = jnp.where(ctx.src_valid.reshape(shape), costs, GEOM_COST_MAX)
    return costs[:, 0] if squeeze else costs


def geom_cost_vector(
    ctx: CostContext,
    plane: jax.Array,
    xs: Optional[jax.Array] = None,
    ys: Optional[jax.Array] = None,
) -> jax.Array:
    if xs is None and ctx.volumes is not None and ctx.volumes.D is not None:
        return _geom_cost_vector_volume(ctx, plane)

    def per_view(v):
        return geom_cost_view(ctx, v, plane, xs, ys)

    costs = jax.lax.map(per_view, jnp.arange(ctx.num_views))
    shape = (ctx.num_views,) + (1,) * (costs.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), costs, GEOM_COST_MAX)


def initial_cost_and_views(
    ctx: CostContext, plane: jax.Array, radius: int, increment: int, top_k: int
) -> Tuple[jax.Array, jax.Array]:
    """FIRST_INIT seeding: per-view costs, select the top-k (<=4) views with
    cost < 2, return (mean top-k cost, selected [V, H, W] bool)
    (reference ComputeMultiViewInitialCostandSelectedViews: APD.cu:616-662).
    """
    costs = cost_vector(ctx, plane, radius, increment)  # [V, H, W]
    V = ctx.num_views
    num_valid = jnp.sum(costs < COST_MAX, axis=0)  # [H, W]
    k = jnp.minimum(num_valid, top_k)  # [H, W]
    sorted_costs = jnp.sort(costs, axis=0)  # ascending
    # mean of the k smallest (k >= 1 guarded below)
    ranks = jax.lax.broadcasted_iota(jnp.int32, costs.shape, 0)
    topk_sum = jnp.sum(jnp.where(ranks < k[None], sorted_costs, 0.0), axis=0)
    mean_cost = topk_sum / jnp.maximum(k, 1)
    # threshold = k-th smallest cost; selected = cost <= threshold
    kth = jnp.take_along_axis(
        sorted_costs, jnp.maximum(k - 1, 0)[None], axis=0
    )[0]
    selected = (costs <= kth[None]) & ctx.src_valid.reshape((V, 1, 1))
    cost = jnp.where(k > 0, mean_cost, COST_MAX)
    selected = jnp.where((k > 0)[None], selected, False)
    return cost, selected


def recost_selected_views(
    ctx: CostContext,
    plane: jax.Array,
    selected: jax.Array,
    radius: int,
    increment: int,
) -> Tuple[jax.Array, jax.Array]:
    """REFINE_* re-seeding: cost the loaded hypothesis over the loaded
    selected views, dropping views that now fail (cost >= 2)
    (reference ComputeMultiViewInitialCost: APD.cu:664-693; we clear only
    the failing bit — the reference's unSetBit also clears all lower bits,
    a bug we deliberately do not reproduce, SURVEY.md §7 item 6)."""
    costs = cost_vector(ctx, plane, radius, increment)  # [V, H, W]
    ok = selected & (costs < COST_MAX)
    count = jnp.sum(ok, axis=0)
    total = jnp.sum(jnp.where(ok, costs, 0.0), axis=0)
    cost = jnp.where(count > 0, total / jnp.maximum(count, 1), COST_MAX)
    return cost, ok


# ---------------------------------------------------------------------------
# Space-sharded (row-slab) volumes — parallel/spaced.py rationale
# ---------------------------------------------------------------------------


def view_consts(vs: VolumeSet) -> jax.Array:
    """[V-1, NCONST] per-SOURCE-view warp consts (slot v-1 = camera v).
    For spaced sets, shard 0's copy — every field a consumer may read
    (intrinsics, M, b, src dims, u grid) is shard-invariant; only row0
    (index 20) differs per shard and must not be read through this
    accessor."""
    return vs.consts[0, :, 0] if vs.consts.ndim == 4 else vs.consts[:, 0]


def view_geom_consts(vs: VolumeSet) -> jax.Array:
    return (
        vs.geom_consts[0, :, 0]
        if vs.geom_consts.ndim == 4
        else vs.geom_consts[:, 0]
    )


def _space_geom(vs: VolumeSet):
    """(S, V, Hs, Wp, Hp) of a spaced set (V includes the ref view; the
    set stores V-1 source-view slabs). Inside the combined view x space
    manual context the set is one shard's LOCAL slab (leading axis 1), so
    S comes from the registered mesh."""
    from apdmvs_tpu.ops import ncc_volume
    from apdmvs_tpu.parallel import spaced as spmod

    S = spmod.space_size() if spmod.inside_space_context() else vs.E.shape[0]
    V = vs.E.shape[1] + 1
    Hs = vs.E.shape[-2] - 2 * ncc_volume.PAD_Y
    Wp = vs.E.shape[-1] - 2 * ncc_volume.PAD_X
    return S, V, Hs, Wp, S * Hs


def build_volume_set_spaced(
    images: jax.Array,  # [V, H, W] f32 (replicated)
    cams: Cameras,
    depth_min,
    depth_max,
    mesh,
    num_slices: int = 160,
    depth_maps: Optional[jax.Array] = None,
    weak_cost_volumes: bool = True,
) -> VolumeSet:
    """VolumeSet of per-space-shard HALOED row slabs, every pixel field
    with a leading [S] axis sharded over ``mesh``'s 'space' axis.

    Shard s owns interior rows [s*Hs, (s+1)*Hs) and stores rows
    [s*Hs - PAD_Y, (s+1)*Hs + PAD_Y): the halos are built EXACTLY (the
    warp builders take the slab's global row offset), so the NCC/geom
    kernels run unchanged per slab and need no runtime halo exchange.
    The slab's C36/C9 halo rows within ``radius`` of the slab edge carry
    clamped sums, but only interior rows are ever fetched (ownership
    masking in the spaced build_weak_cols)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    from apdmvs_tpu.ops import cost_volume as cvmod, ncc_volume, volume as vol
    from apdmvs_tpu.parallel import spaced as spmod

    spmod.set_space_mesh(mesh)
    V, H, W = images.shape
    S = dict(zip(mesh.axis_names, mesh.devices.shape))["space"]
    Hp = _ceil_to(H, ncc_volume.NCC_TILE_H * S)
    Hs = Hp // S
    Wp = _ceil_to(W, ncc_volume.TILE_W)
    PWp = Wp + 2 * ncc_volume.PAD_X
    PAD_Y = ncc_volume.PAD_Y
    wc = geometry.warp_constants(cams)
    u_min, du = vol.inv_depth_grid(depth_min, depth_max, num_slices)
    ref_pad_g = jnp.pad(
        jnp.asarray(images[0], jnp.float32),
        ((PAD_Y, Hp - H + PAD_Y), (ncc_volume.PAD_X, Wp - W + ncc_volume.PAD_X)),
        mode="edge",
    )

    def build_body(images_, K0_, M_, b_, ref_g):
        s = jax.lax.axis_index("space")
        row0 = (s * Hs).astype(jnp.float32)
        Es, consts = [], []
        for v in range(1, V):
            Es.append(vol.build_volume_pallas(
                images_[v], M_[v], b_[v], K0_, Hs, Wp, u_min, du, num_slices,
                pad_y=PAD_Y, pad_x=ncc_volume.PAD_X, dtype=jnp.bfloat16,
                row0=row0,
            ))
            consts.append(ncc_volume.pack_consts(
                K0_, M_[v], b_[v], u_min, du, W, H, row0=row0))
        ref_slab = jax.lax.dynamic_slice(
            ref_g, ((s * Hs).astype(jnp.int32), 0), (Hs + 2 * PAD_Y, PWp))
        C36 = C9 = None
        if weak_cost_volumes:
            C36 = jnp.stack([
                cvmod.build_cost_volume(E, ref_slab, radius=5, increment=2)
                for E in Es
            ])
            C9 = jnp.stack([
                cvmod.build_cost_volume(E, ref_slab, radius=5, increment=5)
                for E in Es
            ])
        out = VolumeSet(
            E=jnp.stack(Es)[None],
            consts=jnp.stack(consts)[None],
            ref_pad=ref_slab[None],
            C36=None if C36 is None else C36[None],
            C9=None if C9 is None else C9[None],
        )
        if depth_maps is not None:
            out = out._replace(**_spaced_depth_fields(
                cams, depth_maps, u_min, du, num_slices, Hs, Wp, W, H, row0))
        return out

    args = (jnp.asarray(images, jnp.float32), cams.K[0], wc.M, wc.b, ref_pad_g)
    if spmod.inside_space_context():
        # already inside a manual 'space' context (the combined
        # view x space batched pass): the body's axis_index('space')
        # resolves against it, and the result is this shard's LOCAL slab
        return build_body(*args)
    build = _ft.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=jax.tree.map(lambda _: P("space"), VolumeSet(
            0, 0, 0,
            D=0 if depth_maps is not None else None,
            geom_consts=0 if depth_maps is not None else None,
            C36=0 if weak_cost_volumes else None,
            C9=0 if weak_cost_volumes else None,
        )),
        check_vma=False,
    )(build_body)
    return build(*args)


def _spaced_depth_fields(cams, depth_maps, u_min, du, num_slices, Hs, Wp,
                         W, H, row0):
    """Per-shard depth-volume slabs + geom consts (inside the build body)."""
    from apdmvs_tpu.ops import ncc_volume, volume as vol

    V = depth_maps.shape[0]
    wc = geometry.warp_constants(cams)
    K_ref, R_ref = cams.K[0], cams.R[0]
    Ds, gconsts = [], []
    for v in range(1, V):
        Ds.append(vol.build_volume_pallas(
            depth_maps[v], wc.M[v], wc.b[v], cams.K[0], Hs, Wp, u_min, du,
            num_slices, pad_y=0, pad_x=0, dtype=jnp.float32, trunc=True,
            row0=row0,
        ))
        A = geometry.mat3_mat3(
            geometry.mat3_mat3(
                geometry.mat3_mat3(K_ref, R_ref), jnp.swapaxes(cams.R[v], -1, -2)
            ),
            geometry.k_inverse_zero_skew(cams.K[v]),
        )
        t2 = geometry.mat3_vec(
            geometry.mat3_mat3(K_ref, R_ref), cams.c[v] - cams.c[0]
        )
        gconsts.append(ncc_volume.pack_geom_consts(
            cams.K[0], wc.M[v], wc.b[v], A, t2, u_min, du, W, H, row0=row0))
    return dict(D=jnp.stack(Ds)[None], geom_consts=jnp.stack(gconsts)[None])


def _pad_planes_cf(planes_cf: jax.Array, Hp: int, Wp: int) -> jax.Array:
    """Pad channel-first plane fields to the (Hp, Wp) kernel grid with a
    benign fronto-parallel plane."""
    C, _, H, W = planes_cf.shape
    if Hp != H:
        pad = jnp.zeros((C, 4, Hp - H, W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad], axis=2)
    if Wp != W:
        pad = jnp.zeros((C, 4, Hp, Wp - W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad], axis=3)
    return planes_cf


def _spaced_grid_call(ctx: CostContext, plane: jax.Array, per_view_slab,
                      needs_R: bool = False, cost_pad: float = COST_MAX):
    """Shared spaced grid-evaluation harness: pad + slab-split the plane
    fields, run ``per_view_slab(vs_local, planes_local)`` per shard under
    shard_map, stitch rows back. Returns [V, C, H, W] (view 0 = pad)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    from apdmvs_tpu.parallel import spaced as spmod

    vs = ctx.volumes
    S, V, Hs, Wp, Hp = _space_geom(vs)
    H, W = ctx.height, ctx.width
    squeeze = plane.ndim == 3
    if squeeze:
        plane = plane[None]
    C = plane.shape[0]
    planes_cf = _pad_planes_cf(jnp.moveaxis(plane, -1, 1), Hp, Wp)

    if spmod.inside_space_context():
        # combined view x space context: slab-split locally, evaluate this
        # shard's rows, reassemble the full field with one 'space'
        # all_gather (the same exchange the shard_map wrapper's sharded
        # outputs imply when consumed replicated)
        s = jax.lax.axis_index("space")
        planes_l = jax.lax.dynamic_slice(
            planes_cf, (0, 0, s * Hs, 0), (C, 4, Hs, Wp)
        )
        vloc = jax.tree.map(lambda x: x[0], vs)
        outs = jnp.stack(
            [per_view_slab(vloc, v, planes_l) for v in range(1, V)]
        )  # [Vs, C, Hs, Wp]
        out = jax.lax.all_gather(
            outs, "space", axis=2, tiled=True
        )  # [Vs, C, Hp, Wp]
        out = out[:, :, :H, :W]
    else:
        mesh = spmod.space_mesh()
        planes_sp = jnp.moveaxis(
            planes_cf.reshape(C, 4, S, Hs, Wp), 2, 0)  # [S, C, 4, Hs, Wp]

        vs_specs = jax.tree.map(lambda _: P("space"), vs)

        @_ft.partial(
            jax.shard_map, mesh=mesh, in_specs=(vs_specs, P("space")),
            out_specs=P("space"), check_vma=False,
        )
        def body(vs_l, planes_l):
            vloc = jax.tree.map(lambda x: x[0], vs_l)
            outs = [per_view_slab(vloc, v, planes_l[0]) for v in range(1, V)]
            return jnp.stack(outs)[None]  # [1, Vs, C, Hs, Wp]

        out = body(vs, planes_sp)  # [S, Vs, C, Hs, Wp]
        out = jnp.moveaxis(out, 0, 2).reshape(V - 1, C, Hp, Wp)[:, :, :H, :W]
    costs = jnp.concatenate(
        [jnp.full((1,) + out.shape[1:], cost_pad, jnp.float32), out]
    )
    shape = (V,) + (1,) * (costs.ndim - 1)
    costs = jnp.where(ctx.src_valid.reshape(shape), costs, cost_pad)
    return costs[:, 0] if squeeze else costs


def _cost_vector_volume_spaced(ctx, plane, radius, increment):
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    nsl = vs.num_slices

    def per_view(vloc, v, planes_l):
        if vloc.R is not None:
            return ncc_volume.ncc_rebased_cost_view(
                vloc.R[v - 1], vloc.base_k, vloc.E[v - 1], vloc.ref_pad,
                planes_l, vloc.consts[v - 1], nsl,
                radius=radius, increment=increment,
            )
        return ncc_volume.ncc_volume_cost_view(
            vloc.E[v - 1], vloc.ref_pad, planes_l, vloc.consts[v - 1], nsl,
            radius=radius, increment=increment,
        )

    return _spaced_grid_call(ctx, plane, per_view)


def _cost_vector_full_spaced(ctx, plane, radius, increment):
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    nsl = vs.num_slices

    def per_view(vloc, v, planes_l):
        return ncc_volume.ncc_volume_cost_view_fullk(
            vloc.E[v - 1], vloc.ref_pad, planes_l, vloc.consts[v - 1], nsl,
            radius=radius, increment=increment,
        )

    return _spaced_grid_call(ctx, plane, per_view)


def _geom_cost_vector_volume_spaced(ctx, plane):
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    nsl = vs.num_slices

    def per_view(vloc, v, planes_l):
        # geom depth slabs and planes_l share the unpadded (Hs, Wp) kernel
        # grid, so the plane slab feeds the kernel as-is (no slicing)
        return ncc_volume.geom_volume_cost_view(
            vloc.D[v - 1],
            planes_l,
            vloc.geom_consts[v - 1], nsl,
        )

    return _spaced_grid_call(ctx, plane, per_view, cost_pad=GEOM_COST_MAX)


def rebase_volume_set_spaced(vs: VolumeSet, cams: Cameras, depth: jax.Array) -> VolumeSet:
    """Spaced variant of :func:`rebase_volume_set`: each shard rebases its
    own slab on its slab of the base map (the depth field is tiny, so the
    padded global base is computed replicated and sliced per shard)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    from apdmvs_tpu.ops import ncc_volume
    from apdmvs_tpu.parallel import spaced as spmod

    if jax.default_backend() == "cpu":
        # spaced CPU slab calls route through the XLA mirrors; R is unused
        return vs
    S, V, Hs, Wp, Hp = _space_geom(vs)
    u_min, du = vs.u_grid
    K = vs.num_slices
    H, W = depth.shape
    PAD_Y, PAD_X = ncc_volume.PAD_Y, ncc_volume.PAD_X
    valid = depth > 0.0
    k = (1.0 / jnp.where(valid, depth, 1.0) - u_min) / du
    k = jnp.where(valid, jnp.clip(k, 0.0, K - 1.0), K / 2.0)
    base_g = jnp.pad(
        k, ((PAD_Y, Hp - H + PAD_Y), (PAD_X, Wp - W + PAD_X)), mode="edge"
    )

    def body(vs_l, base_g_):
        s = jax.lax.axis_index("space")
        slab = jax.lax.dynamic_slice(
            base_g_, ((s * Hs).astype(jnp.int32), 0),
            (Hs + 2 * PAD_Y, Wp + 2 * PAD_X),
        )
        Rs = []
        bf = None
        for vi in range(V - 1):
            Rv, bf = ncc_volume.build_rebased_view(vs_l.E[0, vi], slab, K)
            Rs.append(Rv)
        return jnp.stack(Rs)[None], bf[None]

    if spmod.inside_space_context():
        R, bf = body(vs, base_g)
        return vs._replace(R=R, base_k=bf)

    mesh = spmod.space_mesh()
    vs_specs = jax.tree.map(lambda _: P("space"), vs)
    R, bf = _ft.partial(
        jax.shard_map, mesh=mesh, in_specs=(vs_specs, P()),
        out_specs=(P("space"), P("space")), check_vma=False,
    )(body)(vs, base_g)
    return vs._replace(R=R, base_k=bf)


def sweep_cost_vector(
    ctx: CostContext,
    plane: jax.Array,  # [C, H, W, 4] — arithmetic-sweep candidates
    base_depth: jax.Array,  # [H, W] the chunk-mid step's depth field
    radius: int,
    increment: int,
) -> jax.Array:
    """Grid-mode NCC for the classify disparity sweeps: rebase on the
    chunk-mid step's slice map and fetch each candidate through an
    AUTO-CENTERED narrow band (ops/ncc_volume.py "Sweep evaluator"
    rationale — the direct kernel's per-tile shared band blows up on
    ragged fields and pays the full-K fixup on ~every call; measured
    ~1/3 of the pass). Exact: escapes take the same L2 fixup. Falls back
    to :func:`cost_vector` without (unsharded) volumes or on CPU."""
    from apdmvs_tpu.ops import ncc_volume

    vs = ctx.volumes
    if vs is None or vs.spaced or jax.default_backend() == "cpu":
        return cost_vector(ctx, plane, radius, increment)
    H, W = ctx.height, ctx.width
    PH, PW = vs.ref_pad.shape
    Hp = PH - 2 * ncc_volume.PAD_Y
    Wp = PW - 2 * ncc_volume.PAD_X
    K = vs.num_slices
    u_min, du = vs.u_grid

    valid = base_depth > 0.0
    k = (1.0 / jnp.where(valid, base_depth, 1.0) - u_min) / du
    k = jnp.where(valid, jnp.clip(k, 0.0, K - 1.0), K / 2.0)
    base_k = jnp.pad(
        k, ((ncc_volume.PAD_Y, PH - H - ncc_volume.PAD_Y),
            (ncc_volume.PAD_X, PW - W - ncc_volume.PAD_X)),
        mode="edge",
    )

    C = plane.shape[0]
    planes_cf = jnp.moveaxis(plane, -1, 1)
    if (Hp, Wp) != (H, W):
        pad1 = jnp.zeros((C, 4, Hp - H, W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad1], axis=2)
        pad2 = jnp.zeros((C, 4, Hp, Wp - W), planes_cf.dtype).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, pad2], axis=3)

    V = ctx.num_views
    outs = []
    for v in range(1, V):
        Rv, bf = ncc_volume.build_rebased_view(
            vs.E[v - 1], base_k, K, j2=ncc_volume.SWEEP_J2
        )
        outs.append(
            ncc_volume.ncc_rebased_sweep_cost_view(
                Rv, bf, vs.E[v - 1], vs.ref_pad, planes_cf, vs.consts[v - 1],
                K, radius=radius, increment=increment,
            )[:, :H, :W]
        )
    costs = jnp.concatenate(
        [jnp.full((1,) + outs[0].shape, COST_MAX, jnp.float32), jnp.stack(outs)]
    )
    shape = (V,) + (1,) * (costs.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), costs, COST_MAX)
