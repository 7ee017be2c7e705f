"""Microbenchmark of the fused NCC volume kernel (the strong-path hot op).

Builds one realistic source-view volume (ring scene at VGA) and times
``ncc_volume_cost_view`` for a C=9 candidate batch of realistic planes
(current depth/normal field + 8 shifted copies — the checkerboard
candidate structure), plus the rebased-volume variant when present.

Usage: python scripts/bench_ncc_kernel.py [--width 640 --height 480]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n=5):
    def force(out):
        # slice ON DEVICE first: np.asarray(whole array) would time the
        # axon tunnel transfer (~30 MB/s), not the kernel
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])

    force(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        force(out)
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)*1000:8.1f} ms (min of {n})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--cands", type=int, default=9)
    args = ap.parse_args()
    W, H, C = args.width, args.height, args.cands

    from apdmvs_tpu import geometry, ncc
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.ops import ncc_volume

    V = 5
    cams, planes_s = synthetic.make_ring_scene(num_views=V, width=W, height=H)
    images, depths, normals = synthetic.render_scene(cams, planes_s)
    K = np.stack([c.K for c in cams]).astype(np.float32)
    R = np.stack([c.R for c in cams]).astype(np.float32)
    t = np.stack([c.t for c in cams]).astype(np.float32)
    gc = geometry.make_cameras(
        K, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32)
    )
    imgs = jnp.asarray(images)

    vs = ncc.build_image_volume_set(
        imgs, gc, 1.2, 9.6, num_slices=160, weak_cost_volumes=False
    )
    np.asarray(vs.E[0, 0, 0])

    # realistic candidate planes: the scene's depth/normal planes + shifts
    pl0 = geometry.depth_normal_to_planes(
        gc, jnp.asarray(depths[0]), jnp.asarray(normals[0]), H, W
    )
    cands = [pl0]
    rng = np.random.default_rng(0)
    for i in range(C - 1):
        dx, dy = int(rng.integers(-11, 12)) | 1, int(rng.integers(-11, 12)) | 1
        cands.append(jnp.roll(pl0, (dy, dx), axis=(0, 1)))
    planes = jnp.stack(cands)  # [C, H, W, 4]

    Hp = vs.ref_pad.shape[0] - 2 * ncc_volume.PAD_Y
    Wp = vs.ref_pad.shape[1] - 2 * ncc_volume.PAD_X
    planes_cf = jnp.moveaxis(planes, -1, 1)
    if (Hp, Wp) != (H, W):
        p1 = jnp.zeros((C, 4, Hp - H, W), jnp.float32).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, p1], axis=2)
        p2 = jnp.zeros((C, 4, Hp, Wp - W), jnp.float32).at[:, 2].set(-1.0).at[:, 3].set(1.0)
        planes_cf = jnp.concatenate([planes_cf, p2], axis=3)

    call = jax.jit(
        lambda E, rp, p, cs: ncc_volume.ncc_volume_cost_view(
            E, rp, p, cs, 160, radius=5, increment=2
        )
    )
    timeit(
        f"ncc_volume_cost_view (C={C}, 1 view)",
        lambda: call(vs.E[0], vs.ref_pad, planes_cf, vs.consts[0]),
    )

    if hasattr(ncc, "rebase_volume_set"):
        d0 = jnp.asarray(depths[0])
        vs_rb = ncc.rebase_volume_set(vs, gc, d0)
        np.asarray(vs_rb.R[1, 0, 0])
        timeit(
            "rebase_volume_set (per iteration)",
            lambda: ncc.rebase_volume_set(vs, gc, d0).R,
        )
        call_rb = jax.jit(
            lambda Rv, bfp, E, rp, p, cs: ncc_volume.ncc_rebased_cost_view(
                Rv, bfp, E, rp, p, cs, 160, radius=5, increment=2
            )
        )
        out_rb = timeit(
            f"ncc_rebased_cost_view (C={C}, 1 view)",
            lambda: call_rb(
                vs_rb.R[0], vs_rb.base_k, vs.E[0], vs.ref_pad, planes_cf,
                vs.consts[0],
            ),
        )
        out = call(vs.E[0], vs.ref_pad, planes_cf, vs.consts[0])
        d = np.abs(np.asarray(out) - np.asarray(out_rb))
        print(f"rebased vs direct: max|diff| {d.max():.2e}  mean {d.mean():.2e}")


if __name__ == "__main__":
    main()
