"""Per-stage wall-clock profile of one REFINE_ITER pass on the real chip.

Times each pipeline stage (anchor probe / RANSAC, init recost, strong
half-sweeps, weak sweep, classification, median filter, local refine) in
isolation with forced host transfers (PERF_NOTES.md: block_until_ready on
the axon platform returns early — always transfer).

Usage: python scripts/profile_stages.py [--width 640 --height 480 --views 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import classify, filters, geometry, hypotheses, ncc, pipeline, propagation, weak
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PassConfig, PixelState, RunState


def timeit(name, fn, n=3):
    out = fn()  # compile
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
    np.asarray(leaves[0].ravel()[:4])
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")]
        for l in leaves:
            jax.block_until_ready(l)
        np.asarray(leaves[0].ravel()[:4])
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1000:8.1f} ms (min of {n})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--no-volumes", action="store_true")
    args = ap.parse_args()
    V, W, H = args.views, args.width, args.height

    cams, planes_s = synthetic.make_ring_scene(
        num_views=V, width=W, height=H, include_flat_region=True
    )
    images, depths, normals = synthetic.render_scene(cams, planes_s)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    src_valid = jnp.asarray(np.arange(V) > 0)
    imgs = jnp.asarray(images)
    dm = jnp.asarray(np.stack(depths))
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=True,
        max_iterations=3, weak_peak_radius=2, rotate_time=4,
    )
    rth = jnp.asarray(0.00875, jnp.float32)

    vols = None
    if not args.no_volumes:
        vols = ncc.build_volume_set(imgs, gc, 1.2, 9.6, num_slices=160, depth_maps=dm)
    ctx = ncc.make_context(imgs, gc, src_valid, dm, volumes=vols)

    # realistic prior: run classification once to get a real weak map
    planes0 = geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0]), jnp.asarray(normals[0]), H, W
    )
    sel0 = jnp.asarray(np.broadcast_to((np.arange(V) > 0)[:, None, None], (V, H, W)))
    pw = jnp.concatenate(
        [jnp.asarray(normals[0]), jnp.asarray(depths[0])[..., None]], -1
    )
    # NOTE: arrays must be jit ARGUMENTS, not closure captures — closed-over
    # concrete arrays are baked into the program as constants and the axon
    # remote_compile rejects the inflated body with HTTP 413 (PERF_NOTES.md).
    d2w_j = jax.jit(
        lambda ctx_, pw_, sel_, vw_, r: classify.depth_to_weak(ctx_, pw_, sel_, vw_, r, cfg),
        static_argnums=(4,),
    )
    # a realistic weak map: centered box covering 25% of pixels (real
    # scenes run ~10-50% WEAK; the zero-view-weight classification used
    # before marked ~96% WEAK and OOM'd the cols tables)
    ps_np = np.full((H, W), PixelState.STRONG, np.uint8)
    ps_np[H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = PixelState.WEAK
    ps = jnp.asarray(ps_np)
    weak_count = int(np.sum(np.asarray(ps) == PixelState.WEAK))
    N = max(1 << int(np.ceil(np.log2(max(weak_count, 1)))), 1024)
    print(f"scene {W}x{H}x{V}v, weak {100.0*weak_count/(H*W):.1f}% -> capacity {N}")

    weak_xy = jax.jit(weak.compact_weak_pixels, static_argnames="capacity")(
        ps, capacity=N
    )
    key = jax.random.PRNGKey(0)

    # --- stage: nearest strong map ---
    nsm_j = jax.jit(weak.nearest_strong_map)
    timeit("nearest_strong_map", lambda: nsm_j(ps))
    # --- stage: probe ---
    probe_j = jax.jit(weak.probe_strong_points, static_argnames="rotate_time")
    found, spx, spy = timeit(
        "probe_strong_points",
        lambda: probe_j(ps, weak_xy, key, cfg.rotate_time),
    )
    # --- stage: anchors total (probe + RANSAC + demote) ---
    anch_j = jax.jit(
        lambda ctx_, d_, ps_, wxy_, k_, rth_: weak.generate_anchors(
            ctx_, d_, ps_, wxy_, k_, cfg, rth_
        )
    )
    d0 = jnp.asarray(depths[0])
    anchors, ps2 = timeit(
        "generate_anchors (total)", lambda: anch_j(ctx, d0, ps, weak_xy, key, rth)
    )

    # --- stage: recost init ---
    st = propagation.StrongState(
        planes=planes0,
        costs=jnp.full((H, W), 0.5, jnp.float32),
        selected=sel0,
        view_weights=jnp.zeros((V, H, W), jnp.float32),
    )
    recost_j = jax.jit(ncc.recost_selected_views, static_argnums=(3, 4))
    timeit("recost_selected_views", lambda: recost_j(ctx, planes0, sel0, 5, 2))

    # --- stage: strong half-sweep ---
    it0 = jnp.asarray(0)
    prop_j = jax.jit(
        lambda ctx_, st_, ps_, it_, k_, c: propagation.propagate_strong_color(
            ctx_, st_, ps_, it_, k_, cfg, color=c
        ),
        static_argnums=(5,),
    )
    timeit(
        "propagate_strong (1 half-sweep)", lambda: prop_j(ctx, st, ps2, it0, key, 0)
    )

    # --- weak sweep sub-stages ---
    rfp_j = jax.jit(weak.ransac_fit_planes)
    timeit("ransac_fit_planes", lambda: rfp_j(ctx, planes0, weak_xy, anchors, key))
    pw_j = jax.jit(
        lambda ctx_, st_, ps_, wxy_, a_, it_, k_: weak.propagate_weak(
            ctx_, st_, ps_, wxy_, a_, it_, k_, cfg
        )
    )
    timeit(
        "propagate_weak (1 sweep)",
        lambda: pw_j(ctx, st, ps2, weak_xy, anchors, it0, key),
    )
    if vols is not None and vols.C36 is not None:
        bwc_j = jax.jit(weak.build_weak_cols)
        wcols = timeit(
            "build_weak_cols (once/pass)", lambda: bwc_j(ctx, weak_xy, anchors)
        )
        pwc_j = jax.jit(
            lambda ctx_, st_, ps_, wxy_, a_, it_, k_, wc_: weak.propagate_weak(
                ctx_, st_, ps_, wxy_, a_, it_, k_, cfg, wcols=wc_
            )
        )
        timeit(
            "propagate_weak (cols, 1 sweep)",
            lambda: pwc_j(ctx, st, ps2, weak_xy, anchors, it0, key, wcols),
        )

    # --- classification + refine + filter ---
    cmf_j = jax.jit(filters.checkerboard_median_filter)
    timeit("checkerboard_median_filter", lambda: cmf_j(pw, st.costs, ps2))
    timeit("depth_to_weak", lambda: d2w_j(ctx, pw, sel0, st.view_weights, 2))
    lr_j = jax.jit(
        lambda ctx_, pw_, sel_, vw_: classify.local_refine(ctx_, pw_, sel_, vw_, cfg)
    )
    timeit("local_refine", lambda: lr_j(ctx, pw, sel0, st.view_weights))

    # --- whole pass for reference ---
    prior = pipeline.PassState(
        depth=jnp.asarray(depths[0]),
        normal_world=jnp.asarray(normals[0]),
        pixel_state=ps,
        selected=sel0,
    )
    timeit(
        "FULL PASS (3 iters)",
        lambda: pipeline.patchmatch_pass(
            imgs, gc, src_valid, prior, key, cfg, rth,
            depth_maps=dm, weak_capacity=N, volumes=vols,
        ),
        n=2,
    )


if __name__ == "__main__":
    main()
