"""Op-level trace of one jitted bench pass.

CAVEAT (round 5): the per-op-name totals printed here DOUBLE-COUNT
nested spans — a %conditional op's duration contains its branch
custom-calls. For a true wall decomposition use
scripts/timeline_pass.py on the trace dir this script writes: it
computes nesting-aware SELF time (Σ self = busy wall), union occupancy,
and a gap ledger. This script remains the convenient trace *capturer*
(isolated-stage timings on smooth oracle fields understate the
classify/refine sweeps ~2.3x, per-call timings carry a ~25 ms dispatch
floor, and cross-session pass walls vary ±20% — PERF_NOTES).

Usage: python scripts/trace_pass.py [--width 640 --height 480]
       python scripts/timeline_pass.py --trace-dir /tmp/apd_trace
"""

import argparse
import glob
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_traced(width, height, views, trace_dir):
    import jax
    import jax.numpy as jnp

    from apdmvs_tpu import geometry, ncc, pipeline
    from apdmvs_tpu.datasets import synthetic
    from apdmvs_tpu.params import PassConfig, PixelState, RunState

    V, W, H = views, width, height
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

    def run(seed):
        out = pipeline.patchmatch_pass(
            jnp.asarray(images), gc, jnp.asarray(src_valid), prior,
            jax.random.PRNGKey(seed), cfg,
            jnp.asarray(0.00875, jnp.float32),
            depth_maps=dm, weak_capacity=24576, volumes=vols,
        )
        np.asarray(out.depth)

    run(0)  # compile + warm
    with jax.profiler.trace(trace_dir):
        run(1)


def report(trace_dir, top_n=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                n = ev_names.get(ev.metadata_id, "?")
                agg[n] += ev.duration_ps / 1e9
                cnt[n] += 1
        print(f"== {plane.name} (XLA Ops; conditionals include their "
              "branch bodies; *-start ops are async spans) ==")
        for n, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ms:9.1f} ms x{cnt[n]:5d}  {n[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--trace-dir", default="/tmp/apd_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    if os.path.exists(args.trace_dir):
        shutil.rmtree(args.trace_dir)
    run_traced(args.width, args.height, args.views, args.trace_dir)
    report(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
