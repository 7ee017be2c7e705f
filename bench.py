"""Benchmark: full PatchMatch-pass throughput on one chip, honestly costed.

Measures the flagship program — one complete REFINE_ITER pass (strong
checkerboard propagation + APD weak machinery + geometric consistency +
classification + refinement) on a synthetic 5-view scene at 640x480 —
and reports depth-maps/sec *including amortized volume builds*:

  per-pass cost = image_volume_build / 4 + depth_volume_build + pass_time

which models one steady production round (scene.py): image volumes are
cached per (problem, scale) and reused across the round's 4 passes;
depth volumes are rebuilt every pass (charged on all 4 here, though the
round's init pass actually skips them — conservative).

The reference publishes no numbers (BASELINE.md): its only perf output is
an unpersisted per-pass "Cost time" print (reference: main.cpp:135-137) on
a Titan RTX. ``vs_baseline`` is therefore measured against this repo's own
recorded baseline (`BENCH_BASELINE` below: the round-1 naive XLA-gather
port on one TPU chip, which had no volume builds to amortize) so
round-over-round progress is visible.

A speed-of-light estimate goes to stderr: the algorithm's required NCC
sample-FMAs per pass (analytic count below) against a nominal VPU peak.

Prints exactly one JSON line on stdout:
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

# v5e per-chip VPU peak (vector f32): 4 MXU-adjacent SIMD units x (8, 128)
# lanes x 2 flops x ~0.94 GHz ~= 7.9e12. Used only for the stderr
# speed-of-light estimate; stated assumption, not a measured roofline.
VPU_PEAK_FLOPS = 7.9e12
FLOPS_PER_SAMPLE = 10.0  # 5 NCC accumulate-FMAs + slice-interp/warp share


def required_ncc_samples(H: int, W: int, V: int, iters: int, weak_frac: float) -> float:
    """Analytic count of (pixel, candidate, view, window-sample) NCC
    sample-FMAs one REFINE_ITER pass fundamentally requires (reference
    kernel DAG, APD.cu:2386-2495). Window = 36 samples (radius 5 step 2),
    anchor patches = 9 (radius 5 step 5)."""
    hw = H * W
    vsrc = V - 1
    strong = iters * hw * (8 + 6) * 36 * vsrc  # 8 candidates + ~6 refine/recost
    classify = hw * 61 * 36 * min(vsrc, 4)  # DepthToWeak disparity sweep
    refine = hw * 11 * 36 * min(vsrc, 4)  # LocalRefine
    nweak = weak_frac * hw
    weak = iters * nweak * (8 + 7) * (36 + 8 * 9) * V  # candidates+fit+combos
    seed = hw * 36 * vsrc  # initial recost
    return float(strong + classify + refine + weak + seed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--batched-problems", type=int, default=4,
        help="also time the batched/sharded runner with this many problems "
        "in ONE jitted program (volume fast path, once-per-scale prebuilt "
        "volume cache); 0 disables. Reported to stderr and as the "
        "batched_maps_per_sec key of the JSON line — the primary metric "
        "is unchanged",
    )
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
    from apdmvs_tpu.scene import _bucket_capacity

    weak_capacity = _bucket_capacity((H // 4) * (W // 4), H * W)

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
    dmin, dmax = 2.0 * 0.6, 8.0 * 1.2

    from apdmvs_tpu import ncc

    def build_image_vols():
        vs = ncc.build_image_volume_set(imgs, gc, dmin, dmax, num_slices=160)
        np.asarray(vs.E[0, 0, 0])  # force completion (axon: PERF_NOTES.md)
        return vs

    def build_depth_vols(vs):
        out = ncc.add_depth_volumes(vs, dm, gc, dmin, dmax)
        np.asarray(out.D[0, 0, 0])
        return out

    # compile + warm both builders, then time them
    vols_img = build_image_vols()
    vols = build_depth_vols(vols_img)
    t0 = time.time()
    vols_img = build_image_vols()
    img_build_s = time.time() - t0
    t0 = time.time()
    vols = build_depth_vols(vols_img)
    depth_build_s = time.time() - t0

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
    pass_times = []
    for i in range(args.repeats):
        t0 = time.time()
        run(i + 1)
        pass_times.append(time.time() - t0)

    # steady-round amortization: image volumes reused across 4 passes,
    # depth volumes rebuilt per pass. Per-rep throughputs -> median
    # headline + min + spread, so BENCH files are comparable across
    # rounds at the chip's ±20% session-noise level (VERDICT r4 weak #1).
    build_s = img_build_s / 4.0 + depth_build_s
    rates = sorted(1.0 / (build_s + p) for p in pass_times)
    maps_per_sec = float(np.median(rates))
    maps_min = rates[0]
    spread_pct = 100.0 * (rates[-1] - rates[0]) / maps_per_sec
    pass_s = float(np.median(pass_times))
    amortized_s = build_s + pass_s

    samples = required_ncc_samples(H, W, V, cfg.max_iterations, 0.0625)
    sol_s = samples * FLOPS_PER_SAMPLE / VPU_PEAK_FLOPS
    print(
        f"pass {pass_s*1000:.0f} ms + image-volume build {img_build_s*1000:.0f} ms/4"
        f" + depth-volume build {depth_build_s*1000:.0f} ms"
        f" => amortized {amortized_s*1000:.0f} ms/pass",
        file=sys.stderr,
    )
    print(
        f"speed-of-light estimate: {samples/1e9:.2f} G NCC samples/pass x "
        f"{FLOPS_PER_SAMPLE:.0f} flops / {VPU_PEAK_FLOPS:.1e} flops/s = "
        f"{sol_s*1000:.0f} ms ideal; achieved {amortized_s*1000:.0f} ms = "
        f"{100.0*sol_s/amortized_s:.1f}% of VPU-peak-equivalent",
        file=sys.stderr,
    )

    batched_maps_per_sec = None
    if args.batched_problems > 0:
        # batched path: N problems through one jitted scan on the device
        # mesh (all local devices on the view axis), with the once-per-
        # scale prebuilt image-volume cache (scene.run_scene_batched's
        # amortization: prebuild charged at 1/4 — one build serves the
        # round's 4 passes — depth volumes rebuilt in-scan every pass).
        from apdmvs_tpu import parallel
        from apdmvs_tpu.parallel.sharded import _batch_specs, put_sharded
        from apdmvs_tpu.ops import ncc_volume
        from apdmvs_tpu.ncc import _ceil_to

        # budget the prebuilt cache like scene.run_scene_batched: pin the
        # first M problems' sets that fit 6 GB (minus one transient
        # in-scan build when partial); the scan rebuilds the rest. The
        # problem COUNT is no longer clamped (round-5: per-problem cache
        # granularity + the view-0 plane drop).
        PHp = _ceil_to(H, ncc_volume.NCC_TILE_H) + 2 * ncc_volume.PAD_Y
        PWp = _ceil_to(W, ncc_volume.TILE_W) + 2 * ncc_volume.PAD_X
        per_problem = 3 * (V - 1) * 160 * PHp * PWp * 2
        n_devices = len(jax.devices())
        N = args.batched_problems
        n_local = max(1, N // n_devices)
        m_fit = int(6e9 // per_problem)
        if m_fit < n_local:
            m_fit = max(0, m_fit - 1)
        m_fit = min(m_fit, n_local)
        M = m_fit * n_devices
        if M < N:
            print(
                f"batched row: pinning {M}/{N} problems' volume sets "
                f"({per_problem/1e9:.2f} GB each; 6 GB budget), rest "
                "rebuild in-scan",
                file=sys.stderr,
            )
        mesh = parallel.make_mesh(n_space=1)
        img_s, cams_s, _, _ = _batch_specs(mesh)
        imgs_b = put_sharded(mesh, jnp.broadcast_to(imgs, (N,) + imgs.shape), img_s)
        gc_b = jax.tree.map(
            lambda x, s: put_sharded(
                mesh, jnp.broadcast_to(x, (N,) + x.shape), s
            ),
            gc, cams_s,
            is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
        )
        sv_b = jnp.broadcast_to(sv, (N, V))
        prior_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (N,) + x.shape), prior
        )
        keys_b = jax.vmap(jax.random.PRNGKey)(jnp.arange(N, dtype=jnp.uint32))
        rth_b = jnp.full((N,), 0.00875, jnp.float32)
        dm_b = jnp.broadcast_to(dm[0][None], (N, H, W))
        src_index = jnp.zeros((N, V), jnp.int32)

        def build_prebuilt():
            if M == 0:
                return None
            imgs_m = jax.tree.map(lambda x: x[:M], imgs_b)
            gc_m = jax.tree.map(
                lambda x: x[:M], gc_b,
                is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
            )
            with mesh:
                pb = parallel.build_batch_image_volumes(
                    imgs_m, gc_m, 160, mesh,
                )
            np.asarray(pb.E[0, 0, 0, 0])
            return pb

        pb = build_prebuilt()  # compile + warmup
        t0 = time.time()
        pb = build_prebuilt()
        pb_build_s = time.time() - t0

        def run_batched(keys):
            out = parallel.sharded_batch_pass(
                mesh, imgs_b, gc_b, sv_b, prior_b, keys, rth_b, cfg,
                weak_capacity=weak_capacity, all_depths=dm_b,
                src_index=src_index, use_volumes=True, num_slices=160,
                prebuilt=pb,
            )
            np.asarray(out.depth[0, 0, :4])
            return out

        run_batched(keys_b)  # compile + warmup
        b_times = []
        for rep in range(args.repeats):
            t0 = time.time()
            run_batched(jax.vmap(jax.random.PRNGKey)(
                jnp.arange((rep + 1) * N, (rep + 2) * N, dtype=jnp.uint32)
            ))
            b_times.append(time.time() - t0)
        batched_s = (float(np.median(b_times)) + pb_build_s / 4.0) / N
        batched_maps_per_sec = 1.0 / batched_s
        print(
            f"batched runner ({N} problems, {len(jax.devices())} device(s), "
            f"prebuilt volumes {pb_build_s*1000:.0f} ms/4): "
            f"{batched_s*1000:.0f} ms/problem amortized "
            f"({batched_maps_per_sec:.3f} maps/s)",
            file=sys.stderr,
        )

    vs = maps_per_sec / BENCH_BASELINE if BENCH_BASELINE else 1.0
    row = {
        "metric": f"depth_maps_per_sec_{W}x{H}x{V}v_full_pass_incl_builds",
        "value": round(maps_per_sec, 4),
        "unit": "depth-maps/s",
        "vs_baseline": round(vs, 3),
        "min": round(maps_min, 4),
        "spread_pct": round(spread_pct, 1),
        "repeats": args.repeats,
    }
    if batched_maps_per_sec is not None:
        row["batched_maps_per_sec"] = round(batched_maps_per_sec, 4)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
