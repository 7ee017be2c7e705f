"""High-resolution end-to-end run: the natural multi-round trigger.

Generates a >=1100 px synthetic ring scene so ``compute_round_num``
returns 2 WITHOUT any min_rounds override (reference main.cpp:72-88:
halve the max dimension until <= 1000), runs the full pipeline through
BOTH runners (sequential run_scene and batched run_scene_batched) to
fused clouds, and reports F-scores + per-pass wall-clock — the first
realistically-sized perf/quality data point (round-3 VERDICT next-round
item 2). Results go to BASELINE.md.

Usage: python scripts/highres_scene.py [--width 1104 --height 828
       --views 4] [--runner seq|batched|both] [--out DIR]
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
    ap.add_argument("--width", type=int, default=1104)
    ap.add_argument("--height", type=int, default=828)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--runner", choices=["seq", "batched", "both"], default="both")
    ap.add_argument("--out", default="/tmp/apd_highres")
    ap.add_argument("--num-slices", type=int, default=128,
                    help="slice count; 128 keeps the >=1100 px volume set "
                    "inside one chip's HBM (160 OOMs at 1104x828x4v)")
    ap.add_argument("--cache-gb", type=float, default=0.0,
                    help="sequential volume-cache budget. 0 at this size: "
                    "pinning one problem's 3.7 GB set while another's "
                    "uncached set is live OOMs the geom passes on one "
                    "16 GB chip -- the multi-chip answer is the spaced "
                    "row-slab path (parallel/spaced.py)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from apdmvs_tpu import eval as eval_mod
    from apdmvs_tpu import scene
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.io import formats
    from apdmvs_tpu.params import compute_round_num

    rn = compute_round_num(args.width, args.height)
    print(f"scene {args.width}x{args.height}x{args.views}v -> "
          f"compute_round_num = {rn} (no override)")
    assert rn >= 2, "scene too small to trigger the natural multi-round path"

    cams, prims = synthetic.make_ring_scene(
        num_views=args.views, width=args.width, height=args.height,
        include_flat_region=True,
    )
    images, depths, normals = synthetic.render_scene(cams, prims)
    imgs_in = synthetic.perturb_radiometric(images, seed=11)
    gt = synthetic.gt_cloud(cams, depths, stride=3)

    results = {}
    for runner in (["seq", "batched"] if args.runner == "both" else [args.runner]):
        folder = os.path.join(args.out, runner)
        if os.path.exists(folder):
            shutil.rmtree(folder)
        synthetic.write_mvsnet_dataset(folder, cams, prims, images=imgs_in)
        t0 = time.time()
        if runner == "seq":
            ply = scene.run_scene(folder, seed=0, verbose=True,
                                  num_slices=args.num_slices,
                                  volume_cache_gb=args.cache_gb)
        else:
            ply = scene.run_scene_batched(folder, seed=0, verbose=True,
                                          num_slices=args.num_slices)
        wall = time.time() - t0
        coords, _ = formats.read_point_cloud(ply)
        m = eval_mod.cloud_metrics(coords, gt, thresholds=(0.05,))[0.05]
        results[runner] = {
            "wall_s": round(wall, 1),
            "points": int(m.num_points),
            "f1": round(m.f1, 4),
            "accuracy": round(m.accuracy, 4),
            "completeness": round(m.completeness, 4),
        }
        print(f"[{runner}] {json.dumps(results[runner])}")
        if not args.keep:
            shutil.rmtree(folder, ignore_errors=True)

    print(json.dumps({"scene": f"{args.width}x{args.height}x{args.views}v",
                      "rounds": rn, **results}))


if __name__ == "__main__":
    main()
