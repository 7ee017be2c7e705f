"""Turnkey ETH3D scene evaluation: COLMAP model -> reconstruction -> F1.

The container has no network egress, so the dataset cannot be fetched
here — this script makes an ETH3D data drop one command. Download (on a
machine with network):

  https://www.eth3d.net/data/<scene>_dslr_undistorted.7z   (images+COLMAP)
  https://www.eth3d.net/data/<scene>_dslr_scan_eval.7z     (GT scan .ply)

unpack both under one folder, then:

  python scripts/eth3d_eval.py /path/to/<scene> \
      --gt /path/to/<scene>/dslr_scan_eval/scan_clean.ply \
      [--scale-factor 2] [--batched] [--fusion eth]

Steps: datasets/colmap.py conversion (pair scoring, cams, resized
images), scene.run_scene / run_scene_batched, eval.cloud_metrics at the
ETH3D thresholds (2 cm / 5 cm; the scans are in meters). Prints one JSON
blob; parity target is the reference binary's APD.ply on the same scene
(BASELINE.md protocol, reference README.md:43-67).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene", help="ETH3D undistorted scene folder "
                    "(contains dslr_calibration_undistorted/ + images/)")
    ap.add_argument("--gt", required=True, help="ground-truth scan PLY")
    ap.add_argument("--work", default=None,
                    help="work dir for the converted dataset + outputs "
                    "(default <scene>/apdmvs_work)")
    ap.add_argument("--scale-factor", type=float, default=2.0,
                    help="image downscale for conversion (ETH3D DSLR is "
                    "6048x4032; the reference protocol evaluates half-res)")
    ap.add_argument("--batched", action="store_true",
                    help="use the batched/sharded runner")
    ap.add_argument("--fusion", default="eth",
                    choices=["eth", "eth-device", "tat_intermediate", "tat_advanced"])
    ap.add_argument("--thresholds", type=float, nargs="+", default=[0.02, 0.05])
    ap.add_argument("--pred", default=None,
                    help="skip reconstruction and evaluate this PLY instead "
                    "(e.g. the reference binary's APD.ply for the baseline row)")
    args = ap.parse_args()

    from apdmvs_tpu import eval as eval_mod
    from apdmvs_tpu.io import formats

    work = args.work or os.path.join(args.scene, "apdmvs_work")
    ply = args.pred
    if ply is None:
        from apdmvs_tpu.datasets import colmap as colmap_mod

        model_dir = os.path.join(args.scene, "dslr_calibration_undistorted")
        image_dir = os.path.join(args.scene, "images")
        if not os.path.isdir(model_dir):
            model_dir = args.scene  # already a sparse-model folder
        colmap_mod.convert(
            dense_folder=args.scene, save_folder=work,
            model_dir=model_dir, image_dir=image_dir,
            scale_factor=args.scale_factor,
        )
        from apdmvs_tpu import scene as scene_mod

        if args.batched:
            ply = scene_mod.run_scene_batched(work, fusion_variant=args.fusion)
        else:
            ply = scene_mod.run_scene(work, fusion_variant=args.fusion)

    pred, _ = formats.read_point_cloud(ply)
    gt, _ = formats.read_point_cloud(args.gt)
    metrics = eval_mod.cloud_metrics(pred, gt, thresholds=args.thresholds)
    print(json.dumps(
        {
            "scene": os.path.basename(os.path.normpath(args.scene)),
            "pred_ply": ply,
            "metrics": {str(t): m.to_dict() for t, m in metrics.items()},
        },
        indent=2,
    ))


if __name__ == "__main__":
    main()
