"""Root-cause the occlusion scene's 0.452 completeness (round-3 VERDICT
weak #3): is the missing surface lost at ESTIMATION (bad per-view depths),
CLASSIFICATION (UNKNOWN demotion zeroing depths), or FUSION (acceptance /
consumed-mask rejection of correct depths)?

Runs the occlusion scene with intermediates kept, then reports per view:
  - depth-map accuracy vs the oracle render (fraction within 1% rel)
  - pixel-state distribution (STRONG/WEAK/UNKNOWN)
  - of GT-correct pixels, how many survive fusion acceptance
and a completeness breakdown of the fused cloud per GT view.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from apdmvs_tpu import eval as eval_mod
    from apdmvs_tpu import scene
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.io import formats
    from apdmvs_tpu.params import PixelState

    folder = "/tmp/apd_occl_diag/scene"
    if os.path.exists(folder):
        shutil.rmtree(folder)
    cams, prims = synthetic.make_occlusion_scene(num_views=4)
    images, depths, normals = synthetic.render_scene(cams, prims)
    imgs_in = synthetic.perturb_radiometric(images, seed=11)
    synthetic.write_mvsnet_dataset(folder, cams, prims, images=imgs_in)
    ply = scene.run_scene(folder, seed=0, verbose=False, keep_intermediates=True)
    coords, _ = formats.read_point_cloud(ply)

    V = len(cams)
    print(f"fused points: {len(coords)}")
    for v in range(V):
        rf = os.path.join(folder, "APD", f"{v:08d}")
        d = formats.read_bin_mat(os.path.join(rf, "depths.dmb"))
        w = formats.read_bin_mat(os.path.join(rf, "weak.bin"))
        gt_d = depths[v]
        valid = d > 0
        rel = np.abs(d - gt_d) / np.maximum(gt_d, 1e-6)
        good = valid & (rel < 0.01)
        n_states = {
            "WEAK": float(np.mean(w == PixelState.WEAK)),
            "STRONG": float(np.mean(w == PixelState.STRONG)),
            "UNKNOWN": float(np.mean(w == PixelState.UNKNOWN)),
        }
        print(
            f"view {v}: depth>0 {valid.mean():.3f}, accurate(1%) of all "
            f"{good.mean():.3f}, of valid {good.sum()/max(valid.sum(),1):.3f}, "
            f"states {n_states}"
        )

    # completeness per GT view: which views' surfaces are missing?
    from scipy.spatial import cKDTree

    tree = cKDTree(coords) if len(coords) else None
    for v in range(V):
        gt_v = synthetic.gt_cloud([cams[v]], [depths[v]], stride=2)
        if tree is None:
            print(f"view {v}: completeness 0 (no points)")
            continue
        dist, _ = tree.query(gt_v, workers=-1)
        print(
            f"view {v}: GT pts {len(gt_v)}, completeness@0.05 "
            f"{np.mean(dist < 0.05):.3f}"
        )

    # where are the misses in image space? (view 0, uncompacted grid)
    cam0 = cams[0]
    d0 = depths[0][::2, ::2]
    H, W = depths[0].shape
    ys, xs = np.mgrid[0:H:2, 0:W:2].astype(np.float64)
    fx, fy = cam0.K[0, 0], cam0.K[1, 1]
    cx, cy = cam0.K[0, 2], cam0.K[1, 2]
    dirs = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    Xw = (dirs * d0[..., None] - cam0.t) @ cam0.R
    dist0, _ = tree.query(Xw.reshape(-1, 3), workers=-1)
    miss_map = (dist0 >= 0.05).reshape(d0.shape) & (d0 > 0)
    print("view-0 miss fraction by image-row band (8 bands):")
    for b in range(8):
        lo = b * miss_map.shape[0] // 8
        hi = (b + 1) * miss_map.shape[0] // 8
        sel = d0[lo:hi] > 0
        frac = miss_map[lo:hi][sel].mean() if sel.any() else 0.0
        print(f"  rows {lo*2:4d}-{hi*2:4d}: {frac:.3f}")
    print("view-0 miss fraction by image-col band (8 bands):")
    for b in range(8):
        lo = b * miss_map.shape[1] // 8
        hi = (b + 1) * miss_map.shape[1] // 8
        sel = d0[:, lo:hi] > 0
        frac = miss_map[:, lo:hi][sel].mean() if sel.any() else 0.0
        print(f"  cols {lo*2:4d}-{hi*2:4d}: {frac:.3f}")


if __name__ == "__main__":
    main()
