"""Measure the L2 fixup escape statistics of one bench pass.

Round-5 timeline profiling (scripts/timeline_pass.py) attributed 57% of
the pass wall to the L2 full-K fixup branches. This script runs the same
bench pass with trace-time stat collection (APDMVS_FLAG_STATS=1 +
APDMVS_SWEEP_UNROLL=1, see ops/ncc_volume.STATS_TRACE) and prints, per
_fixup_call: how many tiles flagged and the per-candidate sentinel-pixel
counts — the data that decides whether the fix is fewer firings, cheaper
per-tile recompute, or a worklist L2.

Usage: python scripts/flag_stats.py [--width 640 --height 480]
"""

import argparse
import os
import sys

os.environ["APDMVS_FLAG_STATS"] = "1"
os.environ["APDMVS_SWEEP_UNROLL"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, ncc, pipeline
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.ops import ncc_volume
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    # the evaluators that reach _fixup_call carry inner @jax.jit wrappers
    # whose trace scope would swallow the stat appends — unwrap them
    for name in (
        "ncc_rebased_cost_view",
        "ncc_volume_cost_view",
        "ncc_rebased_sweep_cost_view",
    ):
        fn = getattr(ncc_volume, name)
        if hasattr(fn, "__wrapped__"):
            setattr(ncc_volume, name, fn.__wrapped__)

    V, W, H = args.views, args.width, args.height
    cams, planes = synthetic.make_ring_scene(num_views=V, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    src_valid = np.zeros(V, bool)
    src_valid[1:] = True
    ps = np.full((H, W), PixelState.STRONG, np.uint8)
    ps[H // 2 - H // 8 : H // 2 + H // 8, W // 2 - W // 8 : W // 2 + W // 8] = (
        PixelState.WEAK
    )
    prior = pipeline.PassState(
        depth=jnp.asarray(depths[0]), normal_world=jnp.asarray(normals[0]),
        pixel_state=jnp.asarray(ps),
        selected=jnp.asarray(
            np.broadcast_to(src_valid[:, None, None], (V, H, W))
        ),
    )
    cfg = PassConfig(
        state=RunState.REFINE_ITER, geom_consistency=True, use_APD=True,
        max_iterations=3, weak_peak_radius=4,
    )
    dm = jnp.asarray(depths)
    vols = ncc.build_volume_set(
        jnp.asarray(images), gc, 1.2, 9.6, num_slices=160, depth_maps=dm
    )

    def run(images_, src_valid_, prior_, key, thr, dm_, vols_):
        ncc_volume.STATS_TRACE.clear()
        out = pipeline.patchmatch_pass_impl(
            images_, gc, src_valid_, prior_, key, cfg, thr,
            depth_maps=dm_, weak_capacity=24576, volumes=vols_,
        )
        return out.depth, list(ncc_volume.STATS_TRACE)

    depth, stats = jax.jit(run)(
        jnp.asarray(images), jnp.asarray(src_valid), prior,
        jax.random.PRNGKey(1), jnp.asarray(0.00875, jnp.float32), dm, vols,
    )
    np.asarray(depth)

    print(f"\n{len(stats)} _fixup_call sites:")
    tot_tiles = tot_flag = tot_sent = 0
    for i, (nf, nt, per_cand) in enumerate(stats):
        nf = int(nf)
        pc = np.asarray(per_cand)
        print(
            f"  site {i:3d}: {nf:4d}/{nt} tiles flagged, {int(pc.sum()):7d} "
            f"sentinel px over C={pc.size} cands  per-cand={pc.tolist()}"
        )
        tot_tiles += int(nt)
        tot_flag += nf
        tot_sent += int(pc.sum())
    print(
        f"\ntotals: {tot_flag}/{tot_tiles} tiles "
        f"({100 * tot_flag / max(tot_tiles, 1):.1f}%), "
        f"{tot_sent} sentinel (cand, px) entries"
    )


if __name__ == "__main__":
    main()
