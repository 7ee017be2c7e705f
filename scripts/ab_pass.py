"""Interleaved same-process pass-level A/B for trace-time env toggles.

The only trustworthy pass benchmark on the tunneled chip is an
interleaved same-process A/B (PERF_NOTES: cross-session walls vary ±20%).
Trace-time flags (APDMVS_BAND2, APDMVS_SWEEP, APDMVS_REBASE, ...) don't
participate in the jit cache key, so each variant gets its OWN
jax.jit(patchmatch_pass_impl) wrapper traced under its env value; timed
runs then alternate A/B/A/B... in one process.

Usage:
    python scripts/ab_pass.py --env APDMVS_BAND2 --values 1,0 --reps 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--values", required=True, help="comma-separated")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument(
        "--slices", type=int, default=160,
        help="volume slice count (128 fits one 16 GB chip at >= 1100 px)",
    )
    args = ap.parse_args()
    values = args.values.split(",")

    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, ncc, pipeline
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

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
    from apdmvs_tpu.scene import _bucket_capacity

    weak_capacity = _bucket_capacity((H // 4) * (W // 4), H * W)
    dm = jnp.asarray(depths)
    vols = ncc.build_volume_set(
        jnp.asarray(images), gc, 1.2, 9.6, num_slices=args.slices,
        depth_maps=dm,
    )
    images_j = jnp.asarray(images)
    sv_j = jnp.asarray(src_valid)
    thr = jnp.asarray(0.00875, jnp.float32)

    # trace-time flags are read ONCE at module import into module globals;
    # A/B variants override the attribute and trace a fresh wrapper
    from apdmvs_tpu import classify
    from apdmvs_tpu import pipeline as pl_mod
    from apdmvs_tpu.ops import ncc_volume

    flag_attr = {
        "APDMVS_SWEEP": (classify, "USE_SWEEP", lambda v: v == "1"),
        "APDMVS_REBASE": (pl_mod, "USE_REBASE", lambda v: v == "1"),
        "APDMVS_BAND2": (ncc_volume, "USE_BAND2", lambda v: v == "1"),
        "APDMVS_SWEEP_CHUNK": (classify, "SWEEP_CHUNK", int),
        "APDMVS_SWEEP_J2": (ncc_volume, "SWEEP_J2", int),
    }
    # --env may be a comma-list with ':'-paired values, e.g.
    #   --env APDMVS_SWEEP_CHUNK,APDMVS_SWEEP_J2 --values 8:49,16:81
    env_names = args.env.split(",")

    fns = {}
    outs = {}
    for val in values:
        for name, v in zip(env_names, val.split(":")):
            os.environ[name] = v
            if name in flag_attr:
                mod, attr, conv = flag_attr[name]
                setattr(mod, attr, conv(v))
        fn = jax.jit(
            pipeline.patchmatch_pass_impl,
            static_argnames=("cfg", "weak_capacity", "debug"),
        )
        # compile + warm under this env value
        out = fn(
            images_j, gc, sv_j, prior, jax.random.PRNGKey(0), cfg, thr,
            depth_maps=dm, weak_capacity=weak_capacity, volumes=vols,
        )
        outs[val] = np.asarray(out.depth)
        fns[val] = fn
        print(f"compiled {args.env}={val}")

    base = values[0]
    for val in values[1:]:
        same = np.array_equal(outs[base], outs[val])
        md = float(np.max(np.abs(outs[base] - outs[val])))
        print(f"outputs {base} vs {val}: bit-identical={same} maxdiff={md:.2e}")

    times = {v: [] for v in values}
    for rep in range(args.reps):
        for val in values:
            t0 = time.perf_counter()
            out = fns[val](
                images_j, gc, sv_j, prior, jax.random.PRNGKey(rep + 1), cfg,
                thr, depth_maps=dm, weak_capacity=weak_capacity, volumes=vols,
            )
            np.asarray(out.depth)
            dt = (time.perf_counter() - t0) * 1e3
            times[val].append(dt)
            print(f"rep {rep} {args.env}={val}: {dt:.0f} ms")

    print()
    for val in values:
        ts = times[val]
        print(
            f"{args.env}={val}: median {np.median(ts):.0f} ms  "
            f"min {min(ts):.0f}  all={[int(t) for t in ts]}"
        )


if __name__ == "__main__":
    main()
