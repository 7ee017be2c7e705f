"""CLI: ``python -m apdmvs_tpu <dense_folder>`` — the reference's
``./APD <dense_folder> [gpu_index]`` (main.cpp:140-153), with flags for the
extra capabilities (fusion variants, debug dumps, intermediates policy)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="apdmvs_tpu",
        description="TPU-native APD-MVS: multi-view stereo reconstruction",
    )
    ap.add_argument("dense_folder", help="dataset folder with images/ cams/ pair.txt")
    ap.add_argument("--seed", type=int, default=0, help="PRNG seed")
    ap.add_argument(
        "--fusion",
        choices=["eth", "eth-device", "tat_intermediate", "tat_advanced"],
        default="eth",
        help="fusion variant (reference: APD.cpp:826-1296); eth-device "
        "runs the ETH algorithm on the TPU mesh (fusion_device.py)",
    )
    ap.add_argument(
        "--show-medium-result",
        action="store_true",
        help="dump per-pass depth/normal/weak JPEGs (reference: main.cpp:127-134)",
    )
    ap.add_argument(
        "--delete-intermediates",
        action="store_true",
        help="remove per-view result dirs after fusion (reference default, main.cpp:220-230)",
    )
    ap.add_argument("--max-rounds", type=int, default=None, help="cap pyramid rounds")
    ap.add_argument(
        "--min-rounds", type=int, default=None,
        help="force at least this many coarse-to-fine rounds (the reference "
        "only adds rounds above 1000 px, main.cpp:72-88; this exercises the "
        "full REFINE_INIT/APD/annealing schedule on small scenes)",
    )
    ap.add_argument(
        "--allow-missing-prior",
        action="store_true",
        help="re-initialize a view from scratch when its prior state files "
        "are missing mid-schedule instead of failing loudly (the reference "
        "exits, APD.cpp:514-518)",
    )
    ap.add_argument(
        "--camera-model",
        choices=["eth", "dtu"],
        default="eth",
        help="camera-file depth-range convention; dtu derives depth_max = "
        "interval * 192 + depth_min (reference: APD.cpp:84-89)",
    )
    ap.add_argument(
        "--debug-dumps",
        action="store_true",
        help="persist the DEBUG_NEIGHBOUR / DEBUG_COST_LINE probe files "
        "(neighbour_map.bin, neighbour.bin, weak_cost_line.dmb) per pass "
        "(the reference's compiled-out probes, main.h:42-43; sequential "
        "runner only)",
    )
    ap.add_argument(
        "--profile-dir", default=None,
        help="write a jax.profiler trace of the whole run here (view in "
        "TensorBoard / xprof; sequential runner only)",
    )
    ap.add_argument(
        "--volume-cache-gb", type=float, default=6.0,
        help="HBM byte budget for the per-(problem, scale) image-volume "
        "cache (amortizes builds across each round's 4 passes)",
    )
    ap.add_argument(
        "--no-volumes",
        action="store_true",
        help="disable the Pallas plane-sweep-volume fast path "
        "(default: on for TPU, off for CPU; for --batched: on when "
        "--space-shards is 1)",
    )
    ap.add_argument(
        "--batched",
        action="store_true",
        help="run all views of each pass as one jitted batched program, "
        "view-sharded over the device mesh (the TPU production path)",
    )
    ap.add_argument(
        "--view-shards", type=int, default=None,
        help="device-mesh view-axis size for --batched (default: all devices)",
    )
    ap.add_argument(
        "--space-shards", type=int, default=1,
        help="device-mesh spatial-axis size for --batched",
    )
    ap.add_argument(
        "--coordinator", default=None,
        help="multi-host: coordinator address host:port for "
        "jax.distributed.initialize; run the same command on every host "
        "with --num-processes/--process-id (or export APD_COORDINATOR / "
        "APD_NUM_PROCESSES / APD_PROCESS_ID). TPU pods with cluster "
        "auto-detection need none of these.",
    )
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu", "axon"],
        help="force a JAX platform (the container preimports JAX with the "
        "TPU platform, so JAX_PLATFORMS in the environment is too late; "
        "this updates the live config before any computation)",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.batched:
            # provision enough virtual CPU devices for the requested mesh
            need = (args.view_shards or 1) * args.space_shards
            if need > 1:
                jax.config.update("jax_num_cpu_devices", need)

    from apdmvs_tpu.parallel import multihost

    multihost.maybe_initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from apdmvs_tpu import scene

    if args.batched:
        scene.run_scene_batched(
            args.dense_folder,
            seed=args.seed,
            fusion_variant=args.fusion,
            keep_intermediates=not args.delete_intermediates,
            max_rounds=args.max_rounds,
            min_rounds=args.min_rounds,
            n_view_shards=args.view_shards,
            n_space_shards=args.space_shards,
            camera_model=args.camera_model,
            show_medium_result=args.show_medium_result,
            use_volumes=False if args.no_volumes else None,
        )
    else:
        scene.run_scene(
            args.dense_folder,
            seed=args.seed,
            fusion_variant=args.fusion,
            show_medium_result=args.show_medium_result,
            keep_intermediates=not args.delete_intermediates,
            max_rounds=args.max_rounds,
            min_rounds=args.min_rounds,
            use_volumes=False if args.no_volumes else None,
            camera_model=args.camera_model,
            allow_missing_prior=args.allow_missing_prior,
            volume_cache_gb=args.volume_cache_gb,
            debug_dumps=args.debug_dumps,
            profile_dir=args.profile_dir,
        )


if __name__ == "__main__":
    main()
