"""Regenerate the BASELINE.md synthetic quality table on the CURRENT
kernels (round-3 VERDICT next-round item 5: the round-2 table predates the
band-clamp exactness fix and the rebased-volume default).

Runs the same four scene-family configs as tests/test_quality.py through
the full pipeline (on TPU this exercises the production Pallas volume
path, rebased default; on CPU the exact XLA mirrors) and prints a
markdown table row per family.

Usage: python scripts/quality_table.py [--families ring,occlusion,...]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_family(name, tmp_root):
    from apdmvs_tpu import eval as eval_mod
    from apdmvs_tpu import scene
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.io import formats

    run_kw = {}
    noise = True
    if name == "multiround":
        cams, prims = synthetic.make_ring_scene(
            num_views=4, width=128, height=96, include_flat_region=True
        )
        noise = False
        run_kw["min_rounds"] = 2
    elif name == "occlusion":
        cams, prims = synthetic.make_occlusion_scene(num_views=4)
    elif name == "curved":
        cams, prims = synthetic.make_curved_scene(num_views=4)
    elif name == "ring":
        cams, prims = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    else:
        raise ValueError(name)

    folder = os.path.join(tmp_root, name)
    if os.path.exists(folder):
        shutil.rmtree(folder)
    images, depths, normals = synthetic.render_scene(cams, prims)
    imgs_in = synthetic.perturb_radiometric(images, seed=11) if noise else images
    synthetic.write_mvsnet_dataset(folder, cams, prims, images=imgs_in)
    ply = scene.run_scene(folder, seed=0, verbose=False, **run_kw)
    coords, _ = formats.read_point_cloud(ply)
    gt = synthetic.gt_cloud(cams, depths, stride=2)
    m = eval_mod.cloud_metrics(coords, gt, thresholds=(0.05,))[0.05]
    shutil.rmtree(folder, ignore_errors=True)
    return {
        "family": name,
        "points": int(m.num_points),
        "accuracy": round(m.accuracy, 3),
        "completeness": round(m.completeness, 3),
        "f1": round(m.f1, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families", default="multiround,occlusion,curved,ring"
    )
    ap.add_argument("--out", default="/tmp/apd_quality")
    args = ap.parse_args()
    import jax

    print(f"backend: {jax.default_backend()}")
    rows = []
    for fam in args.families.split(","):
        r = run_family(fam.strip(), args.out)
        rows.append(r)
        print(json.dumps(r))
    print("\n| Scene family | Points | Accuracy | Completeness | F1 |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['family']} | {r['points']} | {r['accuracy']} "
            f"| {r['completeness']} | {r['f1']} |"
        )


if __name__ == "__main__":
    main()
