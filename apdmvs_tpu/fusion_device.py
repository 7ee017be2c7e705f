"""Device-side (TPU) depth-map fusion — the distributed redesign of the
reference's host-only fusion (reference RunFusion: APD.cpp:826-977).

The reference fuses on the CPU with sequential greedy dedup: views are
processed in order and each emitted point consumes its consistent source
pixels so later views cannot re-emit them (APD.cpp:955-959). That
cross-view chain is inherently sequential, but everything *inside* a view
is per-pixel parallel — so the TPU-native shape is a ``lax.scan`` over
reference views whose body is dense whole-image math, with the consumed
masks [Nv, H, W] as the scan carry. Under a device mesh the pixel axes
shard across chips and XLA inserts the cross-shard gathers for the
source-view lookups; view order (and therefore the reference's greedy
semantics) is preserved exactly.

Same-view collisions (two raster pixels of one view claiming the same
source pixel) are resolved first-raster-pixel-wins by a scatter-min of
the raster index — the same deterministic rule as fusion.fuse_eth's
vectorized backend, validated against the native sequential core in
tests/test_native.py.

Float32 on device vs float64 on host: acceptance thresholds (2 px
reprojection, 1% depth, 10 deg normal) can flip for borderline pixels;
parity with the host backends is therefore at the >=99% decision level
(tests/test_fusion_device.py), not bitwise.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu.params import PixelState

_BIG = np.int32(2**31 - 1)


class FusionArrays(NamedTuple):
    """Stacked per-view fusion inputs (all views at one resolution)."""

    K: jax.Array  # [Nv, 3, 3]
    R: jax.Array  # [Nv, 3, 3]
    t: jax.Array  # [Nv, 3]
    c: jax.Array  # [Nv, 3] camera centers
    depth: jax.Array  # [Nv, H, W]
    normal: jax.Array  # [Nv, H, W, 3]
    color: jax.Array  # [Nv, H, W, 3] f32 BGR
    factor: jax.Array  # [Nv, H, W] per-pixel acceptance factor
    valid0: jax.Array  # [Nv, H, W] depth>0 & block mask
    src_idx: jax.Array  # [Nv, J] int32, -1 padding


def pack_views(views, src_ids) -> FusionArrays:
    """Stack host FusionView structs into device arrays."""
    Nv = len(views)
    J = max((len(s) for s in src_ids), default=1) or 1
    src = np.full((Nv, J), -1, np.int32)
    for i, s in enumerate(src_ids):
        src[i, : len(s)] = s
    K = np.stack([v.K for v in views]).astype(np.float32)
    R = np.stack([v.R for v in views]).astype(np.float32)
    t = np.stack([v.t for v in views]).astype(np.float32)
    c = np.stack([v.c for v in views]).astype(np.float32)
    depth = np.stack([v.depth for v in views]).astype(np.float32)
    normal = np.stack([v.normal for v in views]).astype(np.float32)
    color = np.stack([v.image_bgr for v in views]).astype(np.float32)
    factor = np.full(depth.shape, 0.3, np.float32)
    for i, v in enumerate(views):
        if v.weak is not None:
            factor[i] = np.where(v.weak == PixelState.WEAK, 0.45, 0.3)
    valid0 = depth > 0.0
    for i, v in enumerate(views):
        if v.block is not None:
            valid0[i] &= v.block >= 128
    return FusionArrays(
        K=jnp.asarray(K), R=jnp.asarray(R), t=jnp.asarray(t), c=jnp.asarray(c),
        depth=jnp.asarray(depth), normal=jnp.asarray(normal),
        color=jnp.asarray(color), factor=jnp.asarray(factor),
        valid0=jnp.asarray(valid0), src_idx=jnp.asarray(src),
    )


def _backproject_world(K, R, c, xs, ys, depth):
    """Get3DPointonWorld (APD.cpp:776-800)."""
    px = depth * (xs - K[0, 2]) / K[0, 0]
    py = depth * (ys - K[1, 2]) / K[1, 1]
    pts = jnp.stack([px, py, depth], axis=-1)
    return pts @ R + c


def _project(K, R, t, X):
    """ProjectCamera (APD.cpp:802-812)."""
    xc = X @ R.T + t
    depth = xc @ K[2]
    px = (xc @ K[0]) / depth
    py = (xc @ K[1]) / depth
    return px, py, depth


def _angle(n1, n2):
    dot = jnp.sum(n1 * n2, axis=-1)
    ang = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    return jnp.where(jnp.isnan(ang), 0.0, ang)


def _fuse_eth_body(
    fa: FusionArrays,
    masks0: jax.Array,
    weak_factor: float = 0.45,
    strong_factor: float = 0.3,
):
    """The scanned fusion program. Returns per-view dense emission fields
    (accept [Nv, H, W], X [Nv, H, W, 3], color [Nv, H, W, 3]).

    ``masks0`` [Nv, H, W] bool is the consumed-mask scan carry's initial
    value; passing it in (rather than creating it inside the jit) lets the
    caller pin its sharding — under a (view, space) mesh the masks shard
    over the space (row) axis like every other pixel field, and XLA's SPMD
    partitioner inserts the cross-shard collectives for the scattered
    source-pixel reads/updates (SURVEY §7 step 6: distributed fusion)."""
    Nv, H, W = fa.depth.shape
    J = fa.src_idx.shape[1]
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    raster = (ys * W + xs).astype(jnp.int32)

    def view_step(masks, i):
        Ki = fa.K[i]
        Ri = fa.R[i]
        ci = fa.c[i]
        depth_i = fa.depth[i]
        valid = fa.valid0[i] & ~masks[i]
        X = _backproject_world(Ki, Ri, ci, xs, ys, depth_i)

        def src_gather(jj):
            j = fa.src_idx[i, jj]
            jc = jnp.maximum(j, 0)
            px, py, _ = _project(fa.K[jc], fa.R[jc], fa.t[jc], X)
            cc = jnp.clip((px + 0.5).astype(jnp.int32), 0, W - 1)
            rr = jnp.clip((py + 0.5).astype(jnp.int32), 0, H - 1)
            inb = (px + 0.5 >= 0) & (px + 0.5 < W) & (py + 0.5 >= 0) & (py + 0.5 < H)
            src_depth = fa.depth[jc][rr, cc]
            ok = (
                (j >= 0) & inb & ~masks[jc][rr, cc] & (src_depth > 0.0)
            )
            X2 = _backproject_world(
                fa.K[jc], fa.R[jc], fa.c[jc],
                cc.astype(jnp.float32), rr.astype(jnp.float32), src_depth,
            )
            bx, by, proj_depth = _project(Ki, Ri, fa.t[i], X2)
            err = jnp.sqrt((xs - bx) ** 2 + (ys - by) ** 2)
            rel = jnp.abs(proj_depth - depth_i) / jnp.maximum(depth_i, 1e-12)
            ang = _angle(fa.normal[i], fa.normal[jc][rr, cc])
            cons = ok & (err < 2.0) & (rel < 0.01) & (ang < 0.174533) & valid
            score = jnp.where(cons, jnp.exp(-(err + 200.0 * rel + 10.0 * ang)), 0.0)
            return cons, score, rr, cc

        cons, scores, used_r, used_c = jax.vmap(src_gather)(jnp.arange(J))

        factor = fa.factor[i]
        num = jnp.sum(cons, axis=0)
        dyn = jnp.sum(scores, axis=0)
        accept = valid & (num >= 1) & (dyn > factor * num)

        # same-view collision resolution: first raster pixel wins a src
        # pixel (scatter-min of the raster index, fusion.py's rule)
        def resolve(jj, cons_):
            m = accept & cons_[jj]
            flat = used_r[jj] * W + used_c[jj]
            order = jnp.full((H * W,), _BIG, jnp.int32)
            # losers (and non-claims) scatter _BIG, which never wins
            order = order.at[flat].min(jnp.where(m, raster, _BIG))
            winner = (order[flat] == raster) & m
            return cons_.at[jj].set(jnp.where(m, winner, cons_[jj]))

        cons = jax.lax.fori_loop(0, J, resolve, cons)

        num = jnp.sum(cons, axis=0)
        dyn = jnp.sum(jnp.where(cons, scores, 0.0), axis=0)
        accept = valid & (num >= 1) & (dyn > factor * num)

        # mark consumed source pixels (APD.cpp:955-959)
        def consume(jj, masks_):
            j = fa.src_idx[i, jj]
            jc = jnp.maximum(j, 0)
            m = accept & cons[jj]
            return masks_.at[jc, used_r[jj], used_c[jj]].max(m)

        masks = jax.lax.fori_loop(0, J, consume, masks)

        # averaged BGR color over {self} U consistent sources
        def add_color(jj, csum):
            jc = jnp.maximum(fa.src_idx[i, jj], 0)
            m = accept & cons[jj]
            return csum + jnp.where(
                m[..., None], fa.color[jc][used_r[jj], used_c[jj]], 0.0
            )

        csum = jax.lax.fori_loop(0, J, add_color, fa.color[i])
        color = csum / (num[..., None].astype(jnp.float32) + 1.0)
        return masks, (accept, X, color)

    _, (accepts, Xs, colors) = jax.lax.scan(
        view_step, masks0, jnp.arange(Nv)
    )
    return accepts, Xs, colors


_fuse_eth_program = jax.jit(
    _fuse_eth_body, static_argnames=("weak_factor", "strong_factor")
)


@functools.lru_cache(maxsize=8)
def _fuse_eth_program_mesh(mesh):
    """Mesh-specialized fusion program (replicated outputs), hoisted so
    repeated fuse_eth_device calls hit the jit cache instead of
    recompiling a fresh wrapper per invocation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(
        _fuse_eth_body,
        static_argnames=("weak_factor", "strong_factor"),
        out_shardings=NamedSharding(mesh, P()),
    )


def fuse_eth_device(
    views: Sequence, src_ids: Sequence[Sequence[int]],
    weak_factor: float = 0.45, strong_factor: float = 0.3,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device fusion with fusion.fuse_eth's interface; requires all views
    at one resolution. Host compacts the dense emission fields at the end.

    ``mesh``: an optional ``jax.sharding.Mesh`` with a 'space' axis — the
    per-view pixel fields AND the consumed-mask scan carry are then
    row-sharded over it (the distributed-fusion redesign: the view scan
    stays sequential, everything inside a view is pixel-parallel across
    devices; XLA inserts the cross-shard gathers for the scattered
    source-pixel reads and mask updates).
    """
    if not all(v.depth.shape == views[0].depth.shape for v in views):
        raise ValueError("device fusion requires uniform depth-map shapes")
    fa = pack_views(views, src_ids)
    masks0 = jnp.zeros(fa.depth.shape, bool)
    if mesh is None:
        accepts, Xs, colors = _fuse_eth_program(
            fa, masks0, weak_factor=weak_factor, strong_factor=strong_factor
        )
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def rows(nd_after_h):
            return NamedSharding(mesh, P(None, "space", *([None] * nd_after_h)))

        def srepl(x):
            # small/replicated inputs still need global placement on a
            # multi-process mesh
            return jax.device_put(x, NamedSharding(mesh, P()))

        fa = FusionArrays(
            K=srepl(fa.K), R=srepl(fa.R), t=srepl(fa.t), c=srepl(fa.c),
            depth=jax.device_put(fa.depth, rows(1)),
            normal=jax.device_put(fa.normal, rows(2)),
            color=jax.device_put(fa.color, rows(2)),
            factor=jax.device_put(fa.factor, rows(1)),
            valid0=jax.device_put(fa.valid0, rows(1)),
            src_idx=srepl(fa.src_idx),
        )
        masks0 = jax.device_put(masks0, rows(1))
        # replicated outputs: every process can host-read the full dense
        # emission fields (multi-host PLY export happens on process 0)
        prog = _fuse_eth_program_mesh(mesh)
        with mesh:
            accepts, Xs, colors = prog(
                fa, masks0, weak_factor=weak_factor, strong_factor=strong_factor
            )
    accepts = np.asarray(accepts)
    Xs = np.asarray(Xs)
    colors = np.asarray(colors)
    coords: List[np.ndarray] = []
    cols: List[np.ndarray] = []
    for i in range(len(views)):
        m = accepts[i]
        if m.any():
            coords.append(Xs[i][m].astype(np.float32))
            cols.append(np.clip(colors[i][m], 0, 255).astype(np.uint8))
    if not coords:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
    return np.concatenate(coords), np.concatenate(cols)
