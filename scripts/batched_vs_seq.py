"""Batched-vs-sequential runner throughput on one chip (round-3 VERDICT
next-round item 3's done-criterion: batched >= sequential per problem on
>= 4 problems, with the once-per-scale prebuilt volume cache engaged).

Builds a >=4-view ring scene at a resolution where the stacked prebuilt
cache fits the HBM gate (480x352 x 5 views ~ 1.2 GB/problem), runs BOTH
runners end-to-end (all rounds + fusion), and reports wall-clock per
problem + fused-cloud agreement. Results go to BASELINE.md.

Usage: python scripts/batched_vs_seq.py [--width 480 --height 352
       --views 5] [--out DIR]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--out", default="/tmp/apd_bvs")
    args = ap.parse_args()

    from apdmvs_tpu import eval as eval_mod
    from apdmvs_tpu import scene
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.io import formats

    cams, prims = synthetic.make_ring_scene(
        num_views=args.views, width=args.width, height=args.height,
        include_flat_region=True,
    )
    images, depths, normals = synthetic.render_scene(cams, prims)
    gt = synthetic.gt_cloud(cams, depths, stride=3)
    Np = args.views  # one problem per view

    results = {}
    for runner in ("seq", "batched"):
        # two identical runs: the first pays every jit compile, the second
        # is the steady-state production number (one process, warm cache)
        for tag in ("warm", "steady"):
            folder = os.path.join(args.out, runner)
            if os.path.exists(folder):
                shutil.rmtree(folder)
            synthetic.write_mvsnet_dataset(folder, cams, prims, images=images)
            t0 = time.time()
            if runner == "seq":
                ply = scene.run_scene(folder, seed=0, verbose=(tag == "steady"))
            else:
                ply = scene.run_scene_batched(
                    folder, seed=0, verbose=(tag == "steady")
                )
            wall = time.time() - t0
            print(f"[{runner}/{tag}] wall {wall:.1f} s", flush=True)
        coords, _ = formats.read_point_cloud(ply)
        m = eval_mod.cloud_metrics(coords, gt, thresholds=(0.05,))[0.05]
        results[runner] = {
            "wall_s": round(wall, 1),
            "s_per_problem": round(wall / Np, 2),
            "points": int(m.num_points),
            "f1": round(m.f1, 4),
        }
        print(f"[{runner}] {json.dumps(results[runner])}", flush=True)
        shutil.rmtree(folder, ignore_errors=True)

    r = {
        "scene": f"{args.width}x{args.height}x{args.views}v, {Np} problems",
        **results,
        "batched_over_seq": round(
            results["seq"]["wall_s"] / max(results["batched"]["wall_s"], 1e-9), 3
        ),
    }
    print(json.dumps(r))


if __name__ == "__main__":
    main()
