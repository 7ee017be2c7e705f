"""Weak-texture (APD) machinery: anchors, RANSAC planes, deformed NCC.

TPU reformulation of the reference's adaptive-patch-deformation core:

- FindNearestStrongPoint (APD.cu:2234-2270): the reference scans a 201x201
  window per pixel; we run jump flooding over the full grid (log-step
  passes), then apply the same |dx|,|dy| <= 100 acceptance box. JFA is the
  standard O(log R) nearest-seed transform; its rare off-by-a-few-pixels
  approximations are immaterial here (the result only seeds anchor snapping).
- GenNeighbours (APD.cu:1750-1969): 8 base directions x rotate_time
  rotations; per direction a radius march with jittered rays, snapping
  non-STRONG hits to the nearest strong pixel, accepting the first hit
  inside the angular cone; then 50-iteration RANSAC over the hits (triangle
  must contain the pixel, >= 6 inliers) and the 8 inliers nearest the best
  plane become the anchors. The march runs a fixed-trip masked scan over
  ``radius_schedule`` — the reference's doubling phase verbatim, its +25
  arithmetic phase thinned to the snap-box coverage bound, capped at the
  image diagonal exactly as the reference's boundary break (APD.cu:1809-
  1811) — with 2 jittered rays per radius (vs 4). Coverage equivalence is
  validated against a NumPy replica of the reference search
  (tests/test_anchor_oracle.py).
- RANSACToGetFitPlane (APD.cu:2272-2384): per-iteration plane fit over the
  anchors' current 3D points.
- ComputeBilateralNCCNew (APD.cu:400-528): deformed NCC = 0.25 * center
  patch + 0.75 * mean(anchor patches), all warped by the candidate's
  homography; anchors whose warp leaves the image contribute the max cost
  if that view is selected at the anchor, else are excluded.
- CheckerboardPropagationWeak (APD.cu:1323-1508): candidates are the 8
  anchors' hypotheses (STRONG anchors only). Weak pixels read only
  strong-pixel state, so the reference's red-black split is a no-op for
  correctness; we run one full worklist sweep per iteration.

All weak-pixel work runs over a compacted fixed-capacity worklist [N]
(the weak count is host-known between passes), the TPU equivalent of the
reference's ``neighbours_map`` ordinal compaction (APD.cpp:526-538).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, hypotheses, ncc, sampling
from apdmvs_tpu.geometry import Cameras
from apdmvs_tpu.ncc import COST_MAX, GEOM_COST_MAX, CostContext
from apdmvs_tpu.params import NEIGHBOUR_NUM, PassConfig, PixelState, RunState
from apdmvs_tpu.propagation import StrongState, joint_view_selection

_MIN_MARGIN = 6  # reference: APD.cu:1765
_NEAREST_RADIUS = 100  # reference: APD.cu:2250
_RANSAC_ITERS = 50  # reference: APD.cu:1880, 2316
_RANSAC_CHUNK = 10  # triangles evaluated per scan step (see ransac_step)
_NUM_ANCHORS = NEIGHBOUR_NUM - 1  # 8
_JITTERS_PER_RADIUS = 2  # reference uses 4 (APD.cu:1812); see radius_schedule
# Max gap between consecutive probe radii: every probe's landing snaps to
# the nearest STRONG pixel within a +-100 px box (APD.cu:1822-1828), whose
# along-ray reach is >= 100/sqrt(2) ~ 70 px per side, so steps <= ~140 px
# leave no strong region between probes unreachable. 125 keeps slack.
_MAX_RADIUS_GAP = 125


def radius_schedule(width: int, height: int) -> Tuple[int, ...]:
    """Probe radii equivalent in coverage to the reference march.

    The reference marches r = 2, then r = min(2r, r+25) until the
    unjittered probe leaves the image (the loop *breaks* at the image
    boundary, APD.cu:1808-1812 — it never actually reaches
    MAX_SEARCH_RADIUS=4096 unless the image is that large), testing 4
    jittered rays per radius with break-on-first-accept. Because every
    landing snaps to the nearest strong pixel within a 100 px box, the +25
    steps are ~8x redundant; we keep the doubling phase verbatim (which
    fixes the near-anchor-first acceptance order) and thin the arithmetic
    phase to _MAX_RADIUS_GAP steps, capped at the image diagonal.
    Coverage-equivalence is validated against a NumPy replica of the
    reference search in tests/test_anchor_oracle.py.
    """
    limit = min(4096, int(math.hypot(width, height)))
    radii = []
    r = 2
    while r <= limit and r < 125:  # doubling phase: 2,4,8,16,32,57,82,107
        radii.append(r)
        r = min(2 * r, r + 25)
    last = radii[-1] if radii else 2
    radii.extend(range(last + _MAX_RADIUS_GAP, limit + 1, _MAX_RADIUS_GAP))
    return tuple(radii)


def compact_weak_pixels(pixel_state: jax.Array, capacity: int) -> jax.Array:
    """Coordinates of WEAK pixels as a fixed-capacity worklist [N, 2] (x, y),
    padded with -1 (the reference's neighbours_map compaction,
    APD.cpp:526-538)."""
    ys, xs = jnp.nonzero(
        pixel_state == PixelState.WEAK, size=capacity, fill_value=-1
    )
    return jnp.stack([xs, ys], axis=-1).astype(jnp.int32)


def nearest_strong_map(pixel_state: jax.Array) -> jax.Array:
    """Per-pixel coordinates of the nearest STRONG pixel within a 100px box,
    (-1, -1) if none — jump-flooding equivalent of FindNearestStrongPoint
    (APD.cu:2234-2270). Returns [H, W, 2] int32 (x, y)."""
    H, W = pixel_state.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    strong = pixel_state == PixelState.STRONG
    best_x = jnp.where(strong, x, -1)
    best_y = jnp.where(strong, y, -1)

    def dist2(bx, by):
        # sentinel for empty lanes must exceed any real squared distance
        # (max ~2*4096^2 < 2^26) without overflowing int32 — a prior
        # (1<<20)**2 sentinel wrapped to 0 and froze the flood, silently
        # disabling anchor snapping (fixed in round 2; caught by
        # tests/test_anchor_oracle.py)
        dx = bx - x
        dy = by - y
        return jnp.where(bx >= 0, dx * dx + dy * dy, jnp.int32(1 << 30))

    # scan over flood step sizes (one compiled body, dynamic-shift slices);
    # steps larger than the grid are dropped statically
    steps = [s for s in (128, 64, 32, 16, 8, 4, 2, 1, 1) if s < max(H, W)]
    pad = max(steps)

    def flood(carry, step):
        bx, by = carry
        cur_d = dist2(bx, by)
        bx_p = jnp.pad(bx, pad, constant_values=-1)
        by_p = jnp.pad(by, pad, constant_values=-1)
        for dy_s, dx_s in (
            (-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 1), (1, -1), (1, 0), (1, 1),
        ):
            start = (pad + dy_s * step, pad + dx_s * step)
            nbx = jax.lax.dynamic_slice(bx_p, start, (H, W))
            nby = jax.lax.dynamic_slice(by_p, start, (H, W))
            nd = dist2(nbx, nby)
            better = nd < cur_d
            bx = jnp.where(better, nbx, bx)
            by = jnp.where(better, nby, by)
            cur_d = jnp.where(better, nd, cur_d)
        return (bx, by), None

    (best_x, best_y), _ = jax.lax.scan(
        flood, (best_x, best_y), jnp.asarray(steps, jnp.int32)
    )
    # the reference accepts only |dx|,|dy| <= 100 (window box)
    in_box = (
        (best_x >= 0)
        & (jnp.abs(best_x - x) <= _NEAREST_RADIUS)
        & (jnp.abs(best_y - y) <= _NEAREST_RADIUS)
    )
    best_x = jnp.where(in_box, best_x, -1)
    best_y = jnp.where(in_box, best_y, -1)
    return jnp.stack([best_x, best_y], axis=-1)


def _base_directions(rotate_time: int) -> np.ndarray:
    """The 8 x rotate_time probe directions in the reference's order
    (APD.cu:1797-1851): base dirs from the (dx, dy) double loop, each
    rotated rotate_time times by 45/rotate_time degrees."""
    dirs = []
    angle = 45.0 / rotate_time
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            d = np.array([ox, oy], np.float64)
            d /= np.linalg.norm(d)
            for r in range(rotate_time):
                a = math.radians(angle * r)
                ca, sa = math.cos(a), math.sin(a)
                dirs.append([d[0] * ca - d[1] * sa, d[0] * sa + d[1] * ca])
    return np.asarray(dirs, np.float32)  # [8 * rotate_time, 2]


class AnchorData(NamedTuple):
    """Per-weak-pixel anchors: coords [N, 9, 2] int32 (slot 0 = self,
    (-1, -1) = missing), mirroring the reference's neighbours_cuda layout
    (APD.cu:1774-1781)."""

    coords: jax.Array


class WeakCols(NamedTuple):
    """Per-pass resident K-columns of the cost/depth volumes at every
    worklist position (ops/cols.py rationale: anchors are fixed for a
    whole pass, so the scattered gathers are hoisted out of the iteration
    loop and every lookup becomes a dense contraction).

    Round 5: stored TRANSPOSED — positions in the minor (128-lane)
    dimension — so the read-once contraction kernel
    (ops/cols.contract_lookup) streams each table from HBM once per
    multi-candidate evaluation instead of once per candidate (the sweep
    was HBM-traffic bound re-reading the tables ~10x; ROADMAP perf #3).

    c36: [Vs, K, N] bf16 — C36 columns at the weak pixels (Vs = V - 1
      source views; view v corresponds to slot v-1). Kept in the table's
      bf16: the values are bf16-quantized at the source anyway.
    c9: [Vs, K, N * 8] bf16 — C9 columns at the anchors (minor index
      r = n * 8 + anchor).
    d: [Vs, K, N] f32 or None — depth-volume columns at the weak pixels
      (geometric-consistency passes; f32 — depths feed reprojection math).
    """

    c36: jax.Array
    c9: jax.Array
    d: Optional[jax.Array]


def _build_weak_cols_spaced(
    ctx: CostContext, weak_xy: jax.Array, anchors: AnchorData
) -> WeakCols:
    """Spaced-volume cols: each space shard gathers the columns of the
    positions IT OWNS from its local slab tables, zeroes the rest, and a
    psum over 'space' assembles the full (replicated) column set — the
    distributed form of the per-pass worklist gather (no position is owned
    twice, so the sum is exact; slab halo rows are never owned and their
    clamped cost-volume sums are never read)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    from apdmvs_tpu.ops import cols as colsmod, ncc_volume
    from apdmvs_tpu.parallel import spaced as spmod

    vs = ctx.volumes
    Vs = vs.E.shape[1]
    K = vs.num_slices
    hs = vs.C36.shape[-2]  # Hs + 2*PAD_Y
    PWp = vs.C36.shape[-1]
    Hs = hs - 2 * ncc_volume.PAD_Y
    N = weak_xy.shape[0]
    a = anchors.coords[:, 1:]  # [N, 8, 2]

    def local_gather(table_vol, xs, ys, pad_y, pad_x, hs_, ww, s):
        row0 = s * Hs
        owned = (ys >= row0) & (ys < row0 + Hs) & (xs >= 0)
        xi = jnp.clip(xs + pad_x, 0, ww - 1)
        yi = jnp.clip(ys - row0 + pad_y, 0, hs_ - 1)
        idx = (yi * ww + xi).reshape(-1).astype(jnp.int32)
        rows = colsmod.gather_rows(colsmod.pack_volume_rows(table_vol), idx)
        return jnp.where(owned.reshape(-1)[:, None], rows, 0)

    def body(vs_l, wxy, a_):
        s = jax.lax.axis_index("space")
        vloc = jax.tree.map(lambda x: x[0], vs_l)
        c36 = local_gather(
            vloc.C36, wxy[..., 0], wxy[..., 1],
            ncc_volume.PAD_Y, ncc_volume.PAD_X, hs, PWp, s,
        )
        c36 = jax.lax.psum(c36, "space")
        c9 = local_gather(
            vloc.C9, a_[..., 0], a_[..., 1],
            ncc_volume.PAD_Y, ncc_volume.PAD_X, hs, PWp, s,
        )
        c9 = jax.lax.psum(c9, "space")
        d = None
        if vloc.D is not None:
            Wd = vloc.D.shape[-1]
            d = local_gather(
                vloc.D, wxy[..., 0], wxy[..., 1], 0, 0, Hs, Wd, s
            )
            d = jax.lax.psum(d, "space")
        return c36, c9, d

    if spmod.inside_space_context():
        c36, c9, d = body(vs, weak_xy, a)
    else:
        mesh = spmod.space_mesh()
        vs_specs = jax.tree.map(lambda _: P("space"), vs)
        c36, c9, d = _ft.partial(
            jax.shard_map, mesh=mesh, in_specs=(vs_specs, P(), P()),
            out_specs=(P(), P(), P() if vs.D is not None else None),
            check_vma=False,
        )(body)(vs, weak_xy, a)
    c36 = jnp.transpose(c36.reshape(N, Vs, K), (1, 2, 0))
    c9 = jnp.transpose(c9.reshape(N * _NUM_ANCHORS, Vs, K), (1, 2, 0))
    if d is not None:
        d = jnp.transpose(d.reshape(N, Vs, K), (1, 2, 0)).astype(jnp.float32)
    return WeakCols(c36=c36, c9=c9, d=d)


def build_weak_cols(
    ctx: CostContext, weak_xy: jax.Array, anchors: AnchorData
) -> WeakCols:
    """Gather the per-pass column sets (one DMA per position; ops/cols.py)."""
    from apdmvs_tpu.ops import cols as colsmod, ncc_volume

    vs = ctx.volumes
    if vs.spaced:
        return _build_weak_cols_spaced(ctx, weak_xy, anchors)
    Vs, K = vs.C36.shape[0], vs.C36.shape[1]
    PH, PW = vs.C36.shape[2], vs.C36.shape[3]
    N = weak_xy.shape[0]

    # weak_xy is a raster-order compaction so the sorted-dedup gather
    # applies, but on-chip it LOSES to the plain per-row kernel (v5e:
    # 35 vs 30 ms at 131k x 640 — the dedup's VMEM slot copy costs more
    # than the grouped DMA it saves; scripts/bench_gather.py)
    # cols stay bf16 (the table dtype): the volume values are already
    # bf16-quantized, so widening stores nothing — and the per-sweep tent
    # contractions re-read the c9 table once per candidate, making the
    # sweep HBM-traffic bound (round-4 profile); bf16 halves that traffic
    idx_c = colsmod.flat_index(
        weak_xy[..., 0], weak_xy[..., 1], ncc_volume.PAD_Y, ncc_volume.PAD_X, PH, PW
    )
    c36 = colsmod.gather_rows(colsmod.pack_volume_rows(vs.C36), idx_c)
    c36 = jnp.transpose(c36.reshape(N, Vs, K), (1, 2, 0))

    a = anchors.coords[:, 1:]  # [N, 8, 2]
    idx_a = colsmod.flat_index(
        a[..., 0], a[..., 1], ncc_volume.PAD_Y, ncc_volume.PAD_X, PH, PW
    ).reshape(-1)
    c9 = colsmod.gather_rows(colsmod.pack_volume_rows(vs.C9), idx_a)
    c9 = jnp.transpose(c9.reshape(N * _NUM_ANCHORS, Vs, K), (1, 2, 0))

    d = None
    if vs.D is not None:
        DH, DW = vs.D.shape[2], vs.D.shape[3]
        idx_d = colsmod.flat_index(weak_xy[..., 0], weak_xy[..., 1], 0, 0, DH, DW)
        d = colsmod.gather_rows(colsmod.pack_volume_rows(vs.D), idx_d)
        d = jnp.transpose(d.reshape(N, Vs, K), (1, 2, 0)).astype(jnp.float32)
    return WeakCols(c36=c36, c9=c9, d=d)


def _plane_from_triangle(A: jax.Array, B: jax.Array, C: jax.Array):
    """Unit plane (n, w) through 3 points; returns (plane [..., 4], degenerate
    mask) (reference cross-product construction: APD.cu:1897-1907)."""
    n = jnp.cross(A - C, B - C)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = (norm[..., 0] < 1e-12) | ~jnp.isfinite(norm[..., 0])
    n = n / jnp.maximum(norm, 1e-30)
    w = -jnp.sum(n * A, axis=-1)
    return jnp.concatenate([n, w[..., None]], axis=-1), degenerate


def _point_in_triangle(
    A: jax.Array, B: jax.Array, C: jax.Array, P: jax.Array
) -> jax.Array:
    """2D containment with the reference's degeneracy rejection
    (PointinTriangle: APD.cu:91-112). A, B, C, P: [..., 2] float."""
    ab = jnp.linalg.norm(B - A, axis=-1)
    bc = jnp.linalg.norm(C - B, axis=-1)
    ca = jnp.linalg.norm(A - C, axis=-1)
    ok = (ab > 2.0) & (bc > 2.0) & (ca > 2.0)
    ok &= (ab + bc > ca) & (bc + ca > ab) & (ab + ca > bc)

    def cross2(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    pa, pb, pc = A - P, B - P, C - P
    t1 = cross2(pa, pb)
    t2 = cross2(pb, pc)
    t3 = cross2(pc, pa)
    return ok & (t1 * t2 >= 0) & (t1 * t3 >= 0)


def probe_strong_points(
    pixel_state: jax.Array,
    weak_xy: jax.Array,
    key: jax.Array,
    rotate_time: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Directional probe stage of GenNeighbours (APD.cu:1793-1851): per
    (weak pixel, direction) march the ``radius_schedule`` with jittered
    rays, snap non-STRONG landings to the nearest strong pixel, accept the
    first hit inside the angular cone (masked fixed-trip scan replacing
    the reference's break-on-accept).

    Grid formulation (round-4 redesign): the jitter of a probe step is
    drawn once per (direction, step) and SHARED across pixels, so every
    landing is a uniform offset of the pixel grid — the per-(pixel, probe)
    snapped-strong lookup becomes a static shift (dynamic_slice) of the
    packed nearest-strong grid instead of an XLA gather. The worklist
    formulation gathered 131k x D indices per step (~35 ms/step, 918 ms
    per pass at VGA — round-4 profile); the grid scan runs the same probe
    schedule in ~1 ms/step. Per-pixel acceptance statistics are unchanged
    (each pixel still sees an independent-per-step jittered ray drawn from
    the reference's distribution, APD.cu:1812-1828); only the cross-pixel
    jitter correlation differs, which the anchor-oracle parity test bounds.

    Returns (found [N, D] bool, spx [N, D], spy [N, D]) with
    D = 8 * rotate_time. Compared against a NumPy replica of the
    reference's full march in tests/test_anchor_oracle.py.
    """
    H, W = pixel_state.shape
    nearest = nearest_strong_map(pixel_state)  # [H, W, 2]
    # one packed int32 per pixel: the flat index of the snapped strong
    # point (strong pixels snap to themselves — their nearest is their own
    # coordinate), -1 if none in the box
    snap_flat = jnp.where(
        nearest[..., 0] >= 0, nearest[..., 1] * W + nearest[..., 0], -1
    ).astype(jnp.int32)
    # landings with |offset| >= image extent are always outside the margin,
    # so (H, W) padding suffices for every schedule radius; clamped slices
    # read -1 padding, masked by in_margin anyway
    snap_pad = jnp.pad(snap_flat, ((H, H), (W, W)), constant_values=-1)

    dirs_np = _base_directions(rotate_time)  # [D, 2]
    D = dirs_np.shape[0]
    angle = 45.0 / rotate_time
    cos_threshold = math.cos(math.radians(angle / 2.0))
    shift_range = max(int(math.tan(math.radians(angle / 2.0)) * 20), 1)

    # --- probe schedule (radius_schedule: reference-march coverage) ---
    schedule = radius_schedule(W, H)
    P = len(schedule) * _JITTERS_PER_RADIUS
    radii = np.repeat(np.asarray(schedule, np.float32), _JITTERS_PER_RADIUS)

    base_all = jnp.asarray(dirs_np)  # [D, 2]
    x_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xf = x_i.astype(jnp.float32)
    yf = y_i.astype(jnp.float32)

    # First-accept order per (pixel, direction) is preserved: radii ascend
    # along the scan, jitters within a radius are consecutive steps.
    def probe_step(carry, inputs):
        found_flat = carry  # [D, H, W] int32 snapped flat index, -1 = none
        radius, k_step = inputs
        shifts = jax.random.randint(k_step, (D, 2), -shift_range + 1, shift_range)
        d = base_all * 20.0 + shifts.astype(jnp.float32)  # [D, 2]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        off = jnp.floor(d * radius).astype(jnp.int32)  # [D, 2]
        new_ff = []
        for di in range(D):
            ox, oy = off[di, 0], off[di, 1]
            s = jax.lax.dynamic_slice(snap_pad, (H + oy, W + ox), (H, W))
            lx = x_i + ox
            ly = y_i + oy
            in_margin = (
                (lx >= _MIN_MARGIN)
                & (ly >= _MIN_MARGIN)
                & (lx < W - _MIN_MARGIN)
                & (ly < H - _MIN_MARGIN)
            )
            has_pt = in_margin & (s >= 0)
            # angular-cone acceptance (APD.cu:1829-1832)
            tdx = (s % W).astype(jnp.float32) - xf
            tdy = (s // W).astype(jnp.float32) - yf
            tn = jnp.maximum(jnp.sqrt(tdx * tdx + tdy * tdy), 1e-12)
            cos_a = (tdx * base_all[di, 0] + tdy * base_all[di, 1]) / tn
            accept = has_pt & (cos_a > cos_threshold) & (found_flat[di] < 0)
            new_ff.append(jnp.where(accept, s, found_flat[di]))
        return jnp.stack(new_ff), None

    keys = jax.random.split(key, P)
    init = jnp.full((D, H, W), -1, jnp.int32)
    found_flat, _ = jax.lax.scan(probe_step, init, (jnp.asarray(radii), keys))

    # one worklist gather at the end (vs one per probe step)
    s_at = sampling.gather_grid(
        jnp.moveaxis(found_flat, 0, -1), weak_xy[..., 0], weak_xy[..., 1]
    )  # [N, D]
    found = s_at >= 0
    spx = jnp.where(found, s_at % W, -1)
    spy = jnp.where(found, s_at // W, -1)
    return found, spx, spy


def generate_anchors(
    ctx: CostContext,
    prior_depth: jax.Array,
    pixel_state: jax.Array,
    weak_xy: jax.Array,
    key: jax.Array,
    cfg: PassConfig,
    ransac_threshold: jax.Array,
) -> Tuple[AnchorData, jax.Array]:
    """Anchor search + RANSAC reliability filter (GenNeighbours,
    APD.cu:1750-1969, and NeigbourUpdate, APD.cu:1971-1987).

    prior_depth: [H, W] — the pass-input depth map; anchor 3D points use it
    exactly as the reference uses pre-initialization plane_hypotheses[...].w.
    Returns (AnchorData, updated pixel_state with unreliable WEAK -> UNKNOWN).
    """
    H, W = ctx.height, ctx.width
    N = weak_xy.shape[0]
    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)
    alive = weak_xy[..., 0] >= 0

    k_probe, k_ransac = jax.random.split(key)
    found, spx, spy = probe_strong_points(
        pixel_state, weak_xy, k_probe, cfg.rotate_time
    )
    num_found = jnp.sum(found, axis=1)

    # --- compact valid strong points to the front of the D slots ---
    order = jnp.argsort(~found, axis=1, stable=True)  # valid first
    spx = jnp.take_along_axis(spx, order, axis=1)
    spy = jnp.take_along_axis(spy, order, axis=1)
    found = jnp.take_along_axis(found, order, axis=1)

    # --- 3D points from the prior depth (APD.cu:1866-1877) ---
    depth_at = sampling.gather_grid(prior_depth, spx, spy)  # [N, D]
    pts3d = geometry.pixel_dirs(
        ctx.cams.K[0], spx.astype(jnp.float32), spy.astype(jnp.float32)
    ) * depth_at[..., None]  # [N, D, 3]
    center_depth = sampling.gather_grid(prior_depth, weak_xy[..., 0], weak_xy[..., 1])
    center3d = geometry.pixel_dirs(ctx.cams.K[0], wx, wy) * center_depth[..., None]

    depth_diff = ctx.cams.depth_max[0] - ctx.cams.depth_min[0]
    thr = ransac_threshold

    # --- RANSAC for the best anchor plane (APD.cu:1879-1945) ---
    # _RANSAC_CHUNK triangles are drawn and evaluated per scan step (dense
    # D-way selects, not gathers — PERF_NOTES round-3), then folded into
    # the running best sequentially so the reference's first-wins
    # tie-breaking order is preserved. A 1-triangle-per-step scan was
    # device-loop-overhead bound like the probe march.
    def ransac_step(carry, k_it):
        best_count, best_center_dist, best_plane, best_abc, has_plane = carry
        idx = jax.random.randint(k_it, (N, _RANSAC_CHUNK, 3), 0, 1 << 30)
        idx = idx % jnp.maximum(num_found, 1)[:, None, None]
        ia, ib, ic = idx[..., 0], idx[..., 1], idx[..., 2]  # [N, T]
        distinct = (ia != ib) & (ib != ic) & (ia != ic)

        def takepts(i):
            return (
                sampling.select_axis1(pts3d, i),  # [N, T, 3]
                jnp.stack(
                    [
                        sampling.select_axis1(spx, i),
                        sampling.select_axis1(spy, i),
                    ],
                    -1,
                ).astype(jnp.float32),
            )

        A3, A2 = takepts(ia)
        B3, B2 = takepts(ib)
        C3, C2 = takepts(ic)
        contains = _point_in_triangle(
            A2, B2, C2, jnp.stack([wx, wy], -1)[:, None]
        )
        plane, degen = _plane_from_triangle(A3, B3, C3)  # [N, T, 4]
        ok = distinct & contains & ~degen

        dist = jnp.abs(
            jnp.sum(plane[:, :, None, :3] * pts3d[:, None], axis=-1)
            + plane[:, :, 3:4]
        )  # [N, T, D]
        inlier = found[:, None] & (dist / depth_diff < thr)
        count = jnp.sum(inlier, axis=2)  # [N, T]
        ok &= count >= 6  # APD.cu:1918
        center_dist = jnp.abs(
            jnp.sum(plane[..., :3] * center3d[:, None], axis=-1) + plane[..., 3]
        )  # [N, T]
        abc = jnp.stack([ia, ib, ic], -1)  # [N, T, 3]
        for t in range(_RANSAC_CHUNK):
            better = ok[:, t] & (
                (count[:, t] > best_count)
                | ((count[:, t] == best_count) & (center_dist[:, t] < best_center_dist))
            )
            best_count = jnp.where(better, count[:, t], best_count)
            best_center_dist = jnp.where(better, center_dist[:, t], best_center_dist)
            best_plane = jnp.where(better[:, None], plane[:, t], best_plane)
            best_abc = jnp.where(better[:, None], abc[:, t], best_abc)
            has_plane = has_plane | better
        return (
            best_count, best_center_dist, best_plane, best_abc, has_plane
        ), None

    init = (
        jnp.full((N,), 3, jnp.int32),  # max_count starts at 3 (APD.cu:1882)
        jnp.full((N,), jnp.inf),
        jnp.zeros((N, 4), jnp.float32),
        jnp.full((N, 3), -1, jnp.int32),
        jnp.zeros((N,), bool),
    )
    keys = jax.random.split(k_ransac, _RANSAC_ITERS // _RANSAC_CHUNK)
    (best_count, _, best_plane, best_abc, has_plane), _ = jax.lax.scan(
        ransac_step, init, keys
    )

    # --- select the 8 inliers nearest the best plane (APD.cu:1950-1967) ---
    dist = jnp.abs(
        jnp.sum(best_plane[:, None, :3] * pts3d, axis=-1) + best_plane[:, None, 3]
    )
    inlier = found & (dist / depth_diff < thr)
    slot = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    is_vertex = (
        (slot == best_abc[:, 0:1]) | (slot == best_abc[:, 1:2]) | (slot == best_abc[:, 2:3])
    )
    weight = jnp.where(inlier, dist - is_vertex.astype(jnp.float32), jnp.inf)
    order2 = jnp.argsort(weight, axis=1, stable=True)[:, :_NUM_ANCHORS]
    ax = jnp.take_along_axis(jnp.where(inlier, spx, -1), order2, axis=1)
    ay = jnp.take_along_axis(jnp.where(inlier, spy, -1), order2, axis=1)

    reliable = has_plane & (num_found > 3) & alive
    ax = jnp.where(reliable[:, None], ax, -1)
    ay = jnp.where(reliable[:, None], ay, -1)

    coords = jnp.concatenate(
        [weak_xy[:, None, :], jnp.stack([ax, ay], -1)], axis=1
    )  # [N, 9, 2]

    # NeigbourUpdate: unreliable WEAK -> UNKNOWN (APD.cu:1971-1987)
    demote = alive & ~reliable
    iy = jnp.where(demote, weak_xy[:, 1], -1)
    ix = jnp.where(demote, weak_xy[:, 0], -1)
    ps = pixel_state.at[iy, ix].set(jnp.uint8(PixelState.UNKNOWN), mode="drop")
    return AnchorData(coords=coords), ps


def deformed_cost_vector(
    ctx: CostContext,
    weak_xy: jax.Array,
    plane: jax.Array,
    anchors: AnchorData,
    selected_grid: jax.Array,
    cfg: PassConfig,
    wcols: Optional[WeakCols] = None,
    sel_at_anchor: Optional[jax.Array] = None,
) -> jax.Array:
    """Deformed (APD) NCC per view: [V, ..., N]
    (ComputeBilateralNCCNew: APD.cu:400-528).

    cost = 0.25 * center_patch + 0.75 * mean(anchor patches), with anchors
    warped by the *center pixel's* candidate homography. Anchors warping
    out of the image contribute COST_MAX if that view is selected at the
    anchor pixel, and are excluded otherwise.

    ``plane`` may carry leading batch dims ([..., N, 4], e.g. [8, N, 4] for
    8 candidate planes per weak pixel): all (batch, anchor) patch NCCs are
    evaluated in one fused batched gather per view — the TPU-native layout
    of the reference's per-thread anchor loop (APD.cu:452-513).

    When the context carries precomputed cost volumes, every patch term is
    a 2-gather k-interpolated lookup instead (ops/cost_volume.py); with a
    per-pass WeakCols (resident columns) every lookup is a dense tent
    contraction with zero gathers (ops/cols.py).
    """
    if wcols is not None:
        if sel_at_anchor is None:
            a = anchors.coords[:, 1:]
            sel = sampling.gather_grid(
                jnp.moveaxis(selected_grid, 0, -1), a[..., 0], a[..., 1]
            )  # [N, 8, V]
            sel_at_anchor = jnp.moveaxis(sel, -1, 0)[1:]  # [Vs, N, 8]
        return _deformed_cost_vector_cols(
            ctx, weak_xy, plane, anchors, sel_at_anchor, wcols
        )
    if ctx.volumes is not None and getattr(ctx.volumes, "C36", None) is not None:
        return _deformed_cost_vector_volume(
            ctx, weak_xy, plane, anchors, selected_grid, cfg
        )
    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)
    H, W = ctx.height, ctx.width

    a = anchors.coords[:, 1:]  # [N, 8, 2]
    axf = a[..., 0].astype(jnp.float32)
    ayf = a[..., 1].astype(jnp.float32)
    valid = a[..., 0] >= 0  # [N, 8]
    plane_b = plane[..., None, :]  # [..., N, 1, 4]
    adirs = geometry.pixel_dirs(ctx.cams.K[0], axf, ayf)  # [N, 8, 3]

    def per_view(v):
        center = ncc.ncc_cost_view(
            ctx, v, plane, cfg.strong_radius, cfg.strong_increment, xs=wx, ys=wy
        )  # [..., N]
        # warp of the anchor points themselves (bounds check, APD.cu:438-450)
        n = plane_b[..., :3]
        w = plane_b[..., 3]
        ndir = jnp.sum(n * adirs, axis=-1)  # [..., N, 8]
        Hp = geometry.mat3_vec(ctx.wc.M[v], adirs) - ctx.wc.b[v] * (
            ndir / w
        )[..., None]
        qx = Hp[..., 0] / Hp[..., 2]
        qy = Hp[..., 1] / Hp[..., 2]
        oob = (qx < 0) | (qy < 0) | (qx >= W) | (qy >= H)  # [..., N, 8]
        cost = ncc.ncc_cost_view(
            ctx, v, plane_b, cfg.weak_radius, cfg.weak_increment, xs=axf, ys=ayf
        )  # [..., N, 8]
        sel_at_anchor = sampling.gather_grid(
            selected_grid[v], a[..., 0], a[..., 1]
        )  # [N, 8]
        include = valid & (~oob | sel_at_anchor)
        value = jnp.where(oob, COST_MAX, cost)
        costs_a = jnp.where(include, value, 0.0)
        cnt = jnp.sum(include, axis=-1).astype(jnp.float32)  # [..., N]
        strong_cost = jnp.minimum(
            jnp.sum(costs_a, axis=-1) / jnp.maximum(cnt, 1.0), COST_MAX
        )
        return jnp.where(cnt > 0, 0.25 * center + 0.75 * strong_cost, center)

    costs = jax.lax.map(per_view, jnp.arange(ctx.num_views))  # [V, ..., N]
    shape = (ctx.num_views,) + (1,) * (costs.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), costs, COST_MAX)


def _deformed_cost_vector_volume(
    ctx: CostContext,
    weak_xy: jax.Array,
    plane: jax.Array,
    anchors: AnchorData,
    selected_grid: jax.Array,
    cfg: PassConfig,
) -> jax.Array:
    """Deformed NCC via precomputed cost volumes: center term from C36 at
    the weak pixel, anchor terms from C9 at each anchor, all indexed by the
    candidate plane's depth at the respective position. Keeps the
    reference's include/penalty policy (APD.cu:438-521)."""
    wx = weak_xy[..., 0]
    wy = weak_xy[..., 1]
    a = anchors.coords[:, 1:]  # [N, 8, 2]
    valid = a[..., 0] >= 0

    center, _ = ncc.point_cost_volume(ctx, plane, wx, wy, "C36")  # [V, ..., N]
    plane_b = plane[..., None, :]  # [..., N, 1, 4]
    a_cost, a_oob = ncc.point_cost_volume(
        ctx, plane_b, a[..., 0], a[..., 1], "C9"
    )  # [V, ..., N, 8]

    V = ctx.num_views
    sel_at_anchor = sampling.gather_grid(
        jnp.moveaxis(selected_grid, 0, -1), a[..., 0], a[..., 1]
    )  # [N, 8, V]
    sel_va = jnp.moveaxis(sel_at_anchor, -1, 0)  # [V, N, 8]
    extra = a_cost.ndim - sel_va.ndim
    sel_b = sel_va.reshape(sel_va.shape[:1] + (1,) * extra + sel_va.shape[1:])
    include = valid & (~a_oob | sel_b)
    value = jnp.where(a_oob, COST_MAX, a_cost)
    costs_a = jnp.where(include, value, 0.0)
    cnt = jnp.sum(include, axis=-1).astype(jnp.float32)  # [V, ..., N]
    strong_cost = jnp.minimum(
        jnp.sum(costs_a, axis=-1) / jnp.maximum(cnt, 1.0), COST_MAX
    )
    total = jnp.where(cnt > 0, 0.25 * center + 0.75 * strong_cost, center)
    shape = (V,) + (1,) * (total.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), total, COST_MAX)


def _warp_oob_batched(
    ctx: CostContext, Md: jax.Array, u: jax.Array
) -> jax.Array:
    """Analytic out-of-source-bounds tests for all source views at once.

    Md: [Vs, *pos, 3] precomputed M_v @ dir per position; u: [B, *pos]
    inverse depths (plane-dependent). Returns [B, Vs, *pos] bool.
    Same math as ncc.point_warp_oob (texture-bounds policy, APD.cu:546-556).
    """
    cons = ncc.view_consts(ctx.volumes)  # [Vs, NC] (source views)
    b = cons[:, 15:18]
    src_w = cons[:, 18]
    src_h = cons[:, 19]
    pos_ndim = Md.ndim - 2
    shape_v = (1, -1) + (1,) * pos_ndim
    q = Md[None] + b.reshape(shape_v + (3,)) * u[:, None, ..., None]
    px = q[..., 0] / q[..., 2]
    py = q[..., 1] / q[..., 2]
    return (
        (px < 0.0)
        | (px >= src_w.reshape(shape_v))
        | (py < 0.0)
        | (py >= src_h.reshape(shape_v))
    )


def _deformed_cost_vector_cols(
    ctx: CostContext,
    weak_xy: jax.Array,
    plane: jax.Array,  # [..., N, 4]
    anchors: AnchorData,
    sel_at_anchor: jax.Array,  # [Vs, N, 8] bool (selected views at anchors)
    wcols: WeakCols,
) -> jax.Array:
    """Deformed NCC via per-pass resident columns (WeakCols): every lookup
    is a dense tent contraction — zero gathers per call. Policy identical
    to _deformed_cost_vector_volume (APD.cu:438-521). Returns [V, ..., N].
    """
    from apdmvs_tpu.ops import cols as colsmod

    vs = ctx.volumes
    u_min, du = vs.u_grid
    N = weak_xy.shape[0]
    V = ctx.num_views
    lead = plane.shape[:-2]
    B = 1
    for s in lead:
        B *= s
    p = plane.reshape((B, N, 4))

    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)
    a = anchors.coords[:, 1:]  # [N, 8, 2]
    valid = a[..., 0] >= 0

    cons = ncc.view_consts(vs)  # [Vs, NC] (source views)
    M = cons[:, 6:15].reshape(-1, 3, 3)

    # ---- center term ----
    dirs_c = geometry.pixel_dirs(ctx.cams.K[0], wx, wy)  # [N, 3]
    u_c = -jnp.einsum("bnc,nc->bn", p[..., :3], dirs_c) / p[..., 3]  # [B, N]
    k_c = (u_c - u_min) / du
    center = colsmod.contract_lookup(wcols.c36, k_c)  # [B, Vs, N]
    Md_c = jnp.einsum("vij,nj->vni", M, dirs_c)  # [Vs, N, 3]
    oob_c = _warp_oob_batched(ctx, Md_c, u_c)  # [B, Vs, N]
    center = jnp.where(oob_c, COST_MAX, center)

    # ---- anchor terms ----
    adirs = geometry.pixel_dirs(
        ctx.cams.K[0], a[..., 0].astype(jnp.float32), a[..., 1].astype(jnp.float32)
    )  # [N, 8, 3]
    u_a = -jnp.einsum("bnc,nac->bna", p[..., :3], adirs) / p[..., 3:4]  # [B, N, 8]
    k_a = (u_a - u_min) / du
    a_val = colsmod.contract_lookup(
        wcols.c9, k_a.reshape(B, N * _NUM_ANCHORS)
    ).reshape(B, -1, N, _NUM_ANCHORS)  # [B, Vs, N, 8]
    Md_a = jnp.einsum("vij,naj->vnai", M, adirs)  # [Vs, N, 8, 3]
    a_oob = _warp_oob_batched(ctx, Md_a, u_a)  # [B, Vs, N, 8]

    include = valid[None, None] & (~a_oob | sel_at_anchor[None])
    value = jnp.where(a_oob, COST_MAX, a_val)
    costs_a = jnp.where(include, value, 0.0)
    cnt = jnp.sum(include, axis=-1).astype(jnp.float32)  # [B, Vs, N]
    strong_cost = jnp.minimum(
        jnp.sum(costs_a, axis=-1) / jnp.maximum(cnt, 1.0), COST_MAX
    )
    total = jnp.where(cnt > 0, 0.25 * center + 0.75 * strong_cost, center)

    out = jnp.concatenate(
        [jnp.full((B, 1, N), COST_MAX, jnp.float32), total], axis=1
    )  # [B, V, N]
    out = jnp.moveaxis(out, 1, 0).reshape((V,) + lead + (N,))
    shape = (V,) + (1,) * (out.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), out, COST_MAX)


def _geom_cost_vector_cols(
    ctx: CostContext,
    weak_xy: jax.Array,
    plane: jax.Array,  # [..., N, 4]
    wcols: WeakCols,
) -> jax.Array:
    """Geometric-consistency costs via resident depth columns: identical
    nearest-slice semantics to the grid depth-volume kernel
    (ops/ncc_volume._geom_kernel; reference: APD.cu:752-789).
    Returns [V, ..., N]."""
    from apdmvs_tpu.ops import cols as colsmod

    vs = ctx.volumes
    u_min, du = vs.u_grid
    N = weak_xy.shape[0]
    V = ctx.num_views
    lead = plane.shape[:-2]
    B = 1
    for s in lead:
        B *= s
    p = plane.reshape((B, N, 4))
    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)
    dirs_c = geometry.pixel_dirs(ctx.cams.K[0], wx, wy)  # [N, 3]

    g = ncc.view_geom_consts(vs)  # [Vs, _NGEOM] (source views)
    M = g[:, 6:15].reshape(-1, 3, 3)
    b = g[:, 15:18]
    A = g[:, 18:27].reshape(-1, 3, 3)
    t2 = g[:, 27:30]
    src_w = g[:, 30]
    src_h = g[:, 31]

    u = -jnp.einsum("bnc,nc->bn", p[..., :3], dirs_c) / p[..., 3]  # [B, N]
    k = (u - u_min) / du
    sd = colsmod.contract_lookup(wcols.d, k, nearest=True)  # [B, Vs, N]

    Md = jnp.einsum("vij,nj->vni", M, dirs_c)  # [Vs, N, 3]
    q = Md[None] + b[None, :, None, :] * u[:, None, :, None]  # [B, Vs, N, 3]
    px = q[..., 0] / q[..., 2]
    py = q[..., 1] / q[..., 2]
    oob = (
        (px < 0.0)
        | (px >= src_w[None, :, None])
        | (py < 0.0)
        | (py >= src_h[None, :, None])
    )
    # reproject (src pixel, src depth) into ref: q2 = sd * A ps~ + t'
    r = (
        A[None, :, None, :, 0] * px[..., None]
        + A[None, :, None, :, 1] * py[..., None]
        + A[None, :, None, :, 2]
    )  # [B, Vs, N, 3]
    q2 = sd[..., None] * r + t2[None, :, None, :]
    bx = q2[..., 0] / q2[..., 2]
    by = q2[..., 1] / q2[..., 2]
    err = jnp.sqrt((wx - bx) ** 2 + (wy - by) ** 2)
    cost = jnp.minimum(err, GEOM_COST_MAX)
    cost = jnp.where((sd == 0.0) | oob, GEOM_COST_MAX, cost)

    out = jnp.concatenate(
        [jnp.full((B, 1, N), GEOM_COST_MAX, jnp.float32), cost], axis=1
    )
    out = jnp.moveaxis(out, 1, 0).reshape((V,) + lead + (N,))
    shape = (V,) + (1,) * (out.ndim - 1)
    return jnp.where(ctx.src_valid.reshape(shape), out, GEOM_COST_MAX)


def ransac_fit_planes(
    ctx: CostContext,
    planes_grid: jax.Array,
    weak_xy: jax.Array,
    anchors: AnchorData,
    key: jax.Array,
) -> jax.Array:
    """Per-iteration RANSAC plane fit over the anchors' current 3D points
    (RANSACToGetFitPlane: APD.cu:2272-2384). Returns [N, 4]; all-zero when
    no valid plane was found."""
    N = weak_xy.shape[0]
    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)

    a = anchors.coords[:, 1:]  # [N, 8, 2]
    valid = a[..., 0] >= 0
    # compact valid anchors to the front
    order = jnp.argsort(~valid, axis=1, stable=True)
    a = jnp.take_along_axis(a, order[..., None].repeat(2, -1), axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    cnt = jnp.sum(valid, axis=1)

    axf = a[..., 0].astype(jnp.float32)
    ayf = a[..., 1].astype(jnp.float32)
    anchor_planes = sampling.gather_grid(planes_grid, a[..., 0], a[..., 1])  # [N,8,4]
    depth = geometry.depth_from_plane(ctx.cams.K[0], anchor_planes, axf, ayf)
    pts3d = geometry.pixel_dirs(ctx.cams.K[0], axf, ayf) * depth[..., None]

    # chunked like generate_anchors' RANSAC: _RANSAC_CHUNK triangles per
    # scan step (dense selects), sequential first-wins fold
    def step(carry, k_it):
        best_cost, best_plane, has = carry
        idx = jax.random.randint(k_it, (N, _RANSAC_CHUNK, 3), 0, 1 << 30)
        idx = idx % jnp.maximum(cnt, 1)[:, None, None]
        ia, ib, ic = idx[..., 0], idx[..., 1], idx[..., 2]  # [N, T]
        distinct = (ia != ib) & (ib != ic) & (ia != ic)

        def take3(i):
            p3 = sampling.select_axis1(pts3d, i)  # [N, T, 3]
            p2 = sampling.select_axis1(a, i)  # [N, T, 2]
            return p3, p2.astype(jnp.float32)

        A3, A2 = take3(ia)
        B3, B2 = take3(ib)
        C3, C2 = take3(ic)
        contains = _point_in_triangle(
            A2, B2, C2, jnp.stack([wx, wy], -1)[:, None]
        )
        plane, degen = _plane_from_triangle(A3, B3, C3)  # [N, T, 4]
        slot = jnp.arange(valid.shape[1])[None, None]  # [1, 1, 8]
        chosen = (
            (slot == ia[..., None])
            | (slot == ib[..., None])
            | (slot == ic[..., None])
        )  # [N, T, 8]
        dist = jnp.abs(
            jnp.sum(plane[:, :, None, :3] * pts3d[:, None], -1)
            + plane[:, :, 3:4]
        )  # [N, T, 8]
        cost = jnp.sum(
            jnp.where(valid[:, None] & ~chosen, dist, 0.0), axis=2
        )  # [N, T]
        ok = distinct & contains & ~degen & (cnt >= 3)[:, None]
        for t in range(_RANSAC_CHUNK):
            better = ok[:, t] & (cost[:, t] < best_cost)
            best_cost = jnp.where(better, cost[:, t], best_cost)
            best_plane = jnp.where(better[:, None], plane[:, t], best_plane)
            has = has | better
        return (best_cost, best_plane, has), None

    init = (jnp.full((N,), jnp.inf), jnp.zeros((N, 4), jnp.float32), jnp.zeros((N,), bool))
    keys = jax.random.split(key, _RANSAC_ITERS // _RANSAC_CHUNK)
    (_, best_plane, has), _ = jax.lax.scan(step, init, keys)

    # orient toward the camera (APD.cu:2368-2380); only the ray direction
    # matters for the sign
    dirs = geometry.pixel_dirs(ctx.cams.K[0], wx, wy)
    flip = jnp.sum(best_plane[:, :3] * dirs, axis=-1) > 0
    best_plane = jnp.where(flip[:, None], -best_plane, best_plane)
    return jnp.where(has[:, None], best_plane, 0.0)


def propagate_weak(
    ctx: CostContext,
    st: StrongState,
    pixel_state: jax.Array,
    weak_xy: jax.Array,
    anchors: AnchorData,
    iter_idx: jax.Array,
    key: jax.Array,
    cfg: PassConfig,
    wcols: Optional[WeakCols] = None,
) -> StrongState:
    """One weak-pixel sweep (CheckerboardPropagationWeak + weak refinement +
    plain-NCC cost rewrite; APD.cu:1323-1508, 892-980).

    ``wcols`` (built once per pass by :func:`build_weak_cols`) switches all
    deformed-NCC and geometric lookups to the gather-free resident-column
    path."""
    planes_grid, costs_grid, selected_grid, vw_grid = st
    N = weak_xy.shape[0]
    wx = weak_xy[..., 0].astype(jnp.float32)
    wy = weak_xy[..., 1].astype(jnp.float32)
    alive = weak_xy[..., 0] >= 0
    # a pixel may have been demoted to UNKNOWN by NeigbourUpdate
    still_weak = alive & (
        sampling.gather_grid(pixel_state, weak_xy[..., 0], weak_xy[..., 1])
        == PixelState.WEAK
    )
    depth_min = ctx.cams.depth_min[0]
    depth_max = ctx.cams.depth_max[0]
    k_fit, k_mc, k_ref = jax.random.split(key, 3)

    # --- per-iteration RANSAC fit planes (APD.cu:2449) ---
    fit_planes = ransac_fit_planes(ctx, planes_grid, weak_xy, anchors, k_fit)

    dirs_c = geometry.pixel_dirs(ctx.cams.K[0], wx, wy)  # [N, 3]

    # --- candidates: the 8 anchors' hypotheses, STRONG anchors only ---
    acoords = anchors.coords[:, 1:]  # [N, 8, 2]
    a_state = sampling.gather_grid(pixel_state, acoords[..., 0], acoords[..., 1])
    flag = (acoords[..., 0] >= 0) & (a_state == PixelState.STRONG)  # [N, 8]
    cand_planes = sampling.gather_grid(planes_grid, acoords[..., 0], acoords[..., 1])

    # --- selected views at the anchors: gathered once, reused by the
    # priors and by every deformed-cost evaluation this sweep ---
    a_sel = sampling.gather_grid(
        jnp.moveaxis(selected_grid, 0, -1), acoords[..., 0], acoords[..., 1]
    )  # [N, 8, V]
    sel_at_anchor = jnp.moveaxis(a_sel, -1, 0)[1:]  # [Vs, N, 8]

    def deformed(plane):
        return deformed_cost_vector(
            ctx, weak_xy, plane, anchors, selected_grid, cfg,
            wcols=wcols, sel_at_anchor=sel_at_anchor,
        )

    def geom(plane):
        if wcols is not None and wcols.d is not None:
            return _geom_cost_vector_cols(ctx, weak_xy, plane, wcols)
        return ncc.geom_cost_vector(ctx, plane, xs=wx, ys=wy)

    # all 8 anchor candidates + the current plane + the RANSAC fit plane in
    # ONE fused batch: the tent contractions over the resident cols are
    # HBM-traffic bound (round-4 profile), so fewer larger batches let XLA
    # share reads and scheduling across them
    cur_plane = sampling.gather_grid(planes_grid, weak_xy[..., 0], weak_xy[..., 1])
    cand_planes_b = jnp.moveaxis(cand_planes, 1, 0)  # [8, N, 4]
    planes10 = jnp.concatenate(
        [cand_planes_b, cur_plane[None], fit_planes[None]], axis=0
    )  # [10, N, 4]
    d10 = deformed(planes10)  # [V, 10, N]
    g10 = geom(planes10) if cfg.geom_consistency else None

    cost_array = jnp.moveaxis(d10[:, :8], 0, 1)  # [8, V, N]
    # aggregate-init quirk: invalid candidates contribute 0 (see propagation)
    cost_array = jnp.where(flag.T[:, None, :], cost_array, 0.0)

    # --- priors from anchors' selected views (APD.cu:1370-1384) ---
    a_valid = (acoords[..., 0] >= 0)[..., None]
    priors = jnp.sum(
        jnp.where(a_valid, jnp.where(a_sel, 0.9, 0.1), 0.0), axis=1
    ).T  # [V, N]
    priors = priors * ctx.src_valid[:, None]

    weights, weight_norm, temp_sel = joint_view_selection(
        cost_array, priors, iter_idx, k_mc, cfg.num_mc_samples
    )  # [V, N]

    # --- geometric consistency terms (APD.cu:1441-1447) ---
    if cfg.geom_consistency:
        geom_arr = jnp.moveaxis(g10[:, :8], 0, 1)  # [8, V, N]
        geom_arr = jnp.where(
            flag.T[:, None, :], geom_arr, GEOM_COST_MAX
        )  # missing candidate -> penalty 3.0
        total_arr = cost_array + cfg.geom_factor * geom_arr
    else:
        total_arr = cost_array

    final_costs = jnp.sum(weights[None] * total_arr, axis=1) / jnp.maximum(
        weight_norm[None], 1e-30
    )  # [8, N]
    min_idx = jnp.argmin(final_costs, axis=0)  # [N]

    # --- current-plane cost under the new weights ---
    cv_now = d10[:, 8]
    if cfg.geom_consistency:
        cv_now = cv_now + cfg.geom_factor * g10[:, 8]
    cost_now = jnp.sum(weights * cv_now, axis=0) / jnp.maximum(weight_norm, 1e-30)
    cost_pre = cost_now

    best_flag = sampling.select_axis1(flag, min_idx)
    best_cost = sampling.select_index(final_costs, min_idx)
    best_plane = sampling.select_axis1(cand_planes, min_idx)
    depth_before = geometry.depth_from_plane(ctx.cams.K[0], best_plane, wx, wy)
    adopt = (
        best_flag
        & (depth_before >= depth_min)
        & (depth_before <= depth_max)
        & (best_cost < cost_now)
    )
    plane_now = jnp.where(adopt[:, None], best_plane, cur_plane)
    cost_now = jnp.where(adopt, best_cost, cost_now)
    sel_now = jnp.where(adopt[None], temp_sel, sampling.gather_grid(
        jnp.moveaxis(selected_grid, 0, -1), weak_xy[..., 0], weak_xy[..., 1]
    ).T)

    # --- weak refinement (APD.cu:892-980) ---
    def eval_plane(plane):
        """Weighted deformed cost; supports plane batch dims [..., N, 4]."""
        cv = deformed(plane)
        if cfg.geom_consistency:
            cv = cv + cfg.geom_factor * geom(plane)
        w_b = weights.reshape((weights.shape[0],) + (1,) * (cv.ndim - 2) + (weights.shape[1],))
        return jnp.sum(w_b * cv, axis=0) / jnp.maximum(weight_norm, 1e-30)

    # the fit plane is tested first; if it is the zero plane, the reference
    # returns before the random refinement (APD.cu:910-914)
    fit_zero = jnp.all(fit_planes[:, :3] == 0.0, axis=-1)
    fit_cv = d10[:, 9]
    if cfg.geom_consistency:
        fit_cv = fit_cv + cfg.geom_factor * g10[:, 9]
    fit_cost = jnp.sum(weights * fit_cv, axis=0) / jnp.maximum(weight_norm, 1e-30)
    fit_depth = geometry.depth_from_plane(ctx.cams.K[0], fit_planes, wx, wy)
    fit_ok = (
        ~fit_zero
        & (fit_depth >= depth_min)
        & (fit_depth <= depth_max)
        & (fit_cost < cost_now)
    )
    plane_now = jnp.where(fit_ok[:, None], fit_planes, plane_now)
    cost_now = jnp.where(fit_ok, fit_cost, cost_now)

    # batched equivalent of the reference's sequential accept-if-better
    # chain (argmin over {current} U {valid combos}; first minimum wins)
    cur_depth = geometry.depth_from_plane(ctx.cams.K[0], plane_now, wx, wy)
    depths5, normals5 = hypotheses.refinement_combos(
        k_ref, ctx.cams.K[0], wx, wy, dirs_c,
        plane_now[..., :3], cur_depth, depth_min, depth_max,
    )
    w5 = geometry.dist_to_origin(ctx.cams.K[0], wx, wy, depths5, normals5)
    planes5 = jnp.concatenate([normals5, w5[..., None]], axis=-1)  # [5, N, 4]
    c5 = eval_plane(planes5)  # [5, N]
    d_chk = geometry.depth_from_plane(ctx.cams.K[0], planes5, wx, wy)
    ok5 = (
        ~fit_zero[None]  # reference returns early on zero fit plane
        & (d_chk >= depth_min)
        & (d_chk <= depth_max)
    )
    c5 = jnp.where(ok5, c5, jnp.inf)
    all_costs = jnp.concatenate([cost_now[None], c5], axis=0)  # [6, N]
    best_i = jnp.argmin(all_costs, axis=0)
    cost_now = sampling.select_index(all_costs, best_i)
    all_planes = jnp.concatenate([plane_now[None], planes5], axis=0)
    plane_now = sampling.select_index(all_planes, best_i)

    # --- acceptance by run state (APD.cu:1488-1497) ---
    if cfg.state == RunState.REFINE_INIT:
        accept = cost_now < cost_pre - 0.1
        plane_final = jnp.where(accept[:, None], plane_now, cur_plane)
    else:
        plane_final = plane_now

    # --- scatter the adopted planes to the grid first, so the cost
    # rewrite below can run in grid mode over the updated field ---
    upd = still_weak & (weight_norm > 0)
    ix = jnp.where(upd, weak_xy[..., 0], -1)
    iy = jnp.where(upd, weak_xy[..., 1], -1)
    planes_grid = planes_grid.at[iy, ix].set(plane_final, mode="drop")

    # --- cost rewrite with plain NCC for strong/weak comparability
    # (APD.cu:1499-1507). Evaluated through the same exact evaluator as
    # the strong path (grid mode -> the fused Pallas kernel when volumes
    # are present, whose slice index is computed per sample) rather than
    # the C36 cost volume's fronto-parallel-at-center approximation —
    # mixed exact/approx costs would bias later strong-vs-weak argmins.
    if ctx.volumes is not None:
        cv_grid = ncc.cost_vector(
            ctx, planes_grid, cfg.strong_radius, cfg.strong_increment
        )  # [V, H, W]
        cv_plain = sampling.gather_grid(
            jnp.moveaxis(cv_grid, 0, -1), weak_xy[..., 0], weak_xy[..., 1]
        ).T  # [V, N]
    else:
        cv_plain = ncc.cost_vector(
            ctx, plane_final, cfg.strong_radius, cfg.strong_increment, xs=wx, ys=wy
        )
    cost_final = jnp.sum(weights * cv_plain, axis=0) / jnp.maximum(weight_norm, 1e-30)

    costs_grid = costs_grid.at[iy, ix].set(cost_final, mode="drop")
    sel_grid_T = jnp.moveaxis(selected_grid, 0, -1).at[iy, ix].set(
        sel_now.T, mode="drop"
    )
    vw_grid_T = jnp.moveaxis(vw_grid, 0, -1).at[iy, ix].set(weights.T, mode="drop")
    return StrongState(
        planes=planes_grid,
        costs=costs_grid,
        selected=jnp.moveaxis(sel_grid_T, -1, 0),
        view_weights=jnp.moveaxis(vw_grid_T, -1, 0),
    )
