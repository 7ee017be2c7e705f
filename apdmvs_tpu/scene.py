"""Scene orchestrator: problem list, multi-scale round scheduler, fusion.

The TPU-native equivalent of the reference's L4/L3 host layers
(main.cpp:140-233 `main`, main.cpp:91-138 `ProcessProblem`,
APD.cpp:399-583 `InuputInitialization`): thin host Python that loads the
dataset contract, drives one jitted PatchMatch program per (view, pass),
and persists the inter-pass state files.

The file contract is kept byte-compatible with the reference
(`APD/<id>/depths.dmb|normals.dmb|weak.bin|selected_views.bin`,
main.cpp:117-124) because it *is* the checkpoint/resume system (SURVEY.md
§5): a killed run resumes mid-schedule by construction. For speed, freshly
written arrays are also kept in an in-memory store so geometric-consistency
passes read from RAM instead of the filesystem round-trip the reference
does (APD.cpp:492-510).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import shutil
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import fusion as fusion_mod
from apdmvs_tpu import geometry, pipeline
from apdmvs_tpu.io import formats, images as imio, render
from apdmvs_tpu.params import (
    MAX_IMAGES,
    PassConfig,
    PassSpec,
    PixelState,
    Problem,
    RunState,
    build_schedule,
    compute_round_num,
    scaled_size,
)


def generate_sample_list(dense_folder: str | os.PathLike) -> List[Problem]:
    """Parse pair.txt into problems, dropping sources with score <= 0 and
    creating per-view result dirs (reference GenerateSampleList:
    main.cpp:6-49)."""
    dense_folder = str(dense_folder)
    pairs = formats.read_pair_file(os.path.join(dense_folder, "pair.txt"))
    result_root = os.path.join(dense_folder, "APD")
    os.makedirs(result_root, exist_ok=True)
    problems: List[Problem] = []
    for index, (ref_id, srcs) in enumerate(pairs):
        src_ids = [sid for sid, score in srcs if score > 0.0]
        # cap total views at MAX_IMAGES (reference: APD.cpp:428-431 exits;
        # we truncate to the best-scored sources instead and keep going)
        src_ids = src_ids[: MAX_IMAGES - 1]
        result_folder = os.path.join(result_root, formats.to_format_index(ref_id))
        os.makedirs(result_folder, exist_ok=True)
        problems.append(
            Problem(
                index=index,
                ref_image_id=ref_id,
                src_image_ids=src_ids,
                dense_folder=dense_folder,
                result_folder=result_folder,
            )
        )
    return problems


def check_images(dense_folder: str | os.PathLike, problems: Sequence[Problem]) -> Tuple[int, int]:
    """Assert all reference images share one resolution; return (w, h)
    (reference CheckImages: main.cpp:51-70)."""
    from PIL import Image

    size: Optional[Tuple[int, int]] = None
    for p in problems:
        path = os.path.join(
            str(dense_folder), "images", formats.to_format_index(p.ref_image_id) + ".jpg"
        )
        with Image.open(path) as im:
            if size is None:
                size = im.size
            elif im.size != size:
                raise ValueError(
                    f"image {p.ref_image_id} size {im.size} != {size}; "
                    "all images must share one resolution"
                )
    assert size is not None
    return size


def _bucket_capacity(count: int, total: int) -> int:
    """Round the weak-pixel worklist capacity up to a {1, 1.5} x power-of-two
    bucket: bounds jit recompiles across (image, pass) combinations at <= 2
    buckets per octave while capping padding waste at 33% (every [N]-shaped
    weak stage scales with the capacity; pure power-of-two buckets wasted up
    to 2x — e.g. 76.8k weak pixels ran at N=131072, round-4 profile)."""
    if count <= 0:
        return 0
    cap = 1024
    while cap < count:
        if count <= cap + cap // 2:
            return min(cap + cap // 2, total)
        cap *= 2
    return min(cap, total)


@dataclasses.dataclass(frozen=True)
class ProblemStats:
    """Per-(view, pass) outcome: wall-clock seconds and the fraction of
    pixels classified WEAK by this pass's DepthToWeak (the reference logs
    the weak ratio at APD.cpp:538)."""

    seconds: float
    weak_pct: float


class SceneCache:
    """Host-side caches: full-res grayscale images + cameras per image id,
    per-scale resized image stacks, and the freshly-written pass outputs
    (in-memory mirror of the reference's on-disk inter-pass state)."""

    def __init__(
        self,
        dense_folder: str,
        camera_model: str = "eth",
        volume_cache_bytes: float = 6e9,
    ):
        self.dense_folder = dense_folder
        # 'eth' reads depth_max from the file; 'dtu' derives it as
        # interval * 192 + depth_min (the reference's commented-out DTU
        # branch, APD.cpp:84-89)
        self.camera_model = camera_model
        self._gray: Dict[int, np.ndarray] = {}
        self._cam: Dict[int, dict] = {}
        self._scaled: Dict[Tuple[int, int], np.ndarray] = {}
        # in-memory pass outputs: id -> dict with depth/normal/weak/selected
        self.outputs: Dict[int, Dict[str, np.ndarray]] = {}
        # device-resident image volume sets, keyed (image_id, width): the
        # image volumes depend only on (problem, scale), so each set is
        # reused across the round's 4 passes. Host staging is not an
        # option (device<->host of one VGA set costs minutes over the
        # axon tunnel, scripts/measure_build.py), so the cache is bounded
        # by an HBM byte budget. Insertion is first-come-pinned (no
        # eviction within a scale): under the pass-major round-robin
        # access pattern, pinning the first problems that fit is the
        # Belady-optimal policy (LRU would evict every entry just before
        # its reuse). Scale changes clear the cache (old-scale sets are
        # never reused once the pyramid advances).
        self.volume_cache_bytes = float(volume_cache_bytes)
        self._volumes: Dict[Tuple[int, int], object] = {}
        self._volumes_width: Optional[int] = None
        self._volumes_bytes: int = 0
        self.volume_stats = {"hits": 0, "misses": 0, "uncached": 0}
        # set by the runner: number of problems sharing a scale. Caching
        # is all-or-nothing per scale — pinning SOME problems' sets while
        # the rest rebuild uncached makes the pinned bytes co-resident
        # with every uncached build and OOMs large scenes (round 4: a
        # 1104x828x4v set is 3.7 GB; pinning one while building another
        # exhausted the 16 GB chip in the geom passes).
        self.expected_sets: Optional[int] = None

    def image_volumes(self, image_id: int, width: int, builder):
        """Cached per-(problem, scale) image volume set; ``builder()``
        constructs it on a miss. Returns the (possibly uncached) set."""
        if self._volumes_width != width:
            self._volumes.clear()
            self._volumes_bytes = 0
            self._volumes_width = width
        key = (image_id, width)
        vs = self._volumes.get(key)
        if vs is not None:
            self.volume_stats["hits"] += 1
            return vs
        vs = builder()
        nbytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(vs)
            if hasattr(x, "size")
        )
        if (
            self.expected_sets is not None
            and self.expected_sets * nbytes > self.volume_cache_bytes
        ):
            # the full scale's sets cannot all fit: cache nothing (see
            # __init__ note)
            self.volume_stats["uncached"] += 1
            return vs
        if self._volumes_bytes + nbytes <= self.volume_cache_bytes:
            self._volumes[key] = vs
            self._volumes_bytes += nbytes
            self.volume_stats["misses"] += 1
        else:
            self.volume_stats["uncached"] += 1
        return vs

    def gray(self, image_id: int) -> np.ndarray:
        if image_id not in self._gray:
            path = os.path.join(
                self.dense_folder, "images", formats.to_format_index(image_id) + ".jpg"
            )
            self._gray[image_id] = imio.load_gray_f32(path)
        return self._gray[image_id]

    def camera(self, image_id: int) -> dict:
        if image_id not in self._cam:
            path = os.path.join(
                self.dense_folder, "cams", formats.to_format_index(image_id) + "_cam.txt"
            )
            reader = (
                formats.read_camera_dtu
                if self.camera_model == "dtu"
                else formats.read_camera
            )
            self._cam[image_id] = reader(path)
        return self._cam[image_id]

    def gray_scaled(self, image_id: int, new_w: int, new_h: int) -> np.ndarray:
        key = (image_id, new_w)
        if key not in self._scaled:
            img = self.gray(image_id)
            self._scaled[key] = imio.resize_bilinear(img, new_w, new_h).astype(np.float32)
        return self._scaled[key]


def _load_prior(
    cache: SceneCache,
    problem: Problem,
    num_views: int,
    W: int,
    H: int,
    missing_ok: bool = False,
) -> Optional[pipeline.PassState]:
    """Load the previous pass's outputs for this view (memory first, then
    disk), rescaled to the current pyramid level (reference:
    APD.cpp:552-581).

    Missing state under a non-FIRST pass is an error by default — the
    reference exits loudly when weak.bin is absent (APD.cpp:514-518), and
    silently re-initializing would mask data loss as a quality regression
    in a long sharded run. ``missing_ok=True`` restores the lenient
    restart-from-scratch behavior (returns None)."""
    out = cache.outputs.get(problem.ref_image_id)
    if out is None:
        depth_path = os.path.join(problem.result_folder, "depths.dmb")
        if not os.path.exists(depth_path):
            if missing_ok:
                return None
            raise FileNotFoundError(
                f"prior state missing for view {problem.ref_image_id:08d} "
                f"({depth_path}): a non-FIRST_INIT pass requires the previous "
                "pass's outputs (reference exits here, APD.cpp:514-518). "
                "Pass allow_missing_prior=True / --allow-missing-prior to "
                "re-initialize this view from scratch instead."
            )
        out = {
            "depth": formats.read_bin_mat(depth_path),
            "normal": formats.read_bin_mat(
                os.path.join(problem.result_folder, "normals.dmb")
            ),
            "weak": formats.read_bin_mat(os.path.join(problem.result_folder, "weak.bin")),
            "selected": formats.read_bin_mat(
                os.path.join(problem.result_folder, "selected_views.bin")
            ),
        }
        cache.outputs[problem.ref_image_id] = out
    depth = imio.resize_nearest(out["depth"], W, H)
    normal = imio.resize_nearest(out["normal"], W, H)
    weak = imio.resize_nearest(out["weak"], W, H)
    sel_mask = imio.resize_nearest(out["selected"], W, H)
    selected = pipeline.bitmask_to_selected(sel_mask, num_views)
    return pipeline.PassState(
        depth=jnp.asarray(depth, jnp.float32),
        normal_world=jnp.asarray(normal, jnp.float32),
        pixel_state=jnp.asarray(weak, jnp.uint8),
        selected=jnp.asarray(selected),
    )


def _load_src_depths(
    cache: SceneCache, problem: Problem, view_ids: Sequence[int], W: int, H: int
) -> np.ndarray:
    """Current depth estimates of the source views for geometric-consistency
    costing, rescaled to this pass's resolution (reference: APD.cpp:492-510).
    Entry 0 (the ref view itself) is zeros (unused)."""
    V = len(view_ids)
    depths = np.zeros((V, H, W), np.float32)
    for v, vid in enumerate(view_ids):
        if v == 0:
            continue
        out = cache.outputs.get(vid)
        if out is None:
            path = os.path.join(
                cache.dense_folder, "APD", formats.to_format_index(vid), "depths.dmb"
            )
            if not os.path.exists(path):
                continue
            d = formats.read_bin_mat(path)
        else:
            d = out["depth"]
        depths[v] = imio.resize_nearest(d, W, H)
    return depths


def process_problem(
    cache: SceneCache,
    problem: Problem,
    spec: PassSpec,
    full_size: Tuple[int, int],
    key: jax.Array,
    num_views_pad: Optional[int] = None,
    show_medium_result: bool = False,
    use_volumes: bool = False,
    num_slices: int = 160,
    allow_missing_prior: bool = False,
    debug_dumps: bool = False,
) -> "ProblemStats":
    """One (view, pass): the reference's ProcessProblem (main.cpp:91-138).

    Loads inputs, runs the jitted PatchMatch pass, clamps out-of-range
    depths, persists the four state files. Returns per-problem stats
    (wall-clock seconds, weak percentage). ``debug_dumps`` additionally
    persists the DEBUG_NEIGHBOUR / DEBUG_COST_LINE probe files
    (apdmvs_tpu.debug).
    """
    t0 = time.time()
    # capture before any per-problem spec downgrade (weak_capacity == 0,
    # missing-prior re-init): the cached volume set is shared by all of
    # this (problem, scale)'s passes and must match the ROUND's APD mode
    round_use_apd = spec.use_APD
    full_w, full_h = full_size
    W, H = scaled_size(full_w, full_h, spec.scale_size)

    view_ids = [problem.ref_image_id] + list(problem.src_image_ids)
    V_real = len(view_ids)
    V = num_views_pad or V_real

    # ---- images at this scale, padded to V views ----
    imgs = np.zeros((V, H, W), np.float32)
    for v, vid in enumerate(view_ids):
        imgs[v] = cache.gray_scaled(vid, W, H)
    src_valid = np.zeros(V, bool)
    src_valid[1:V_real] = True

    # ---- cameras, intrinsics scaled to this level (APD.cpp:480-483) ----
    Ks, Rs, ts = [], [], []
    for vid in view_ids:
        cam = cache.camera(vid)
        Ks.append(cam["K"])
        Rs.append(cam["R"])
        ts.append(cam["t"])
    for _ in range(V - V_real):  # pad with the ref camera (marked invalid)
        Ks.append(Ks[0])
        Rs.append(Rs[0])
        ts.append(ts[0])
    K = np.stack(Ks).astype(np.float32)
    scale_x = W / float(full_w)
    scale_y = H / float(full_h)
    K = np.asarray(geometry.scale_intrinsics(jnp.asarray(K), scale_x, scale_y))
    ref_cam = cache.camera(problem.ref_image_id)
    # depth range: ref view's range x 0.6 / 1.2 (reference: APD.cpp:454-455)
    dmin = float(ref_cam["depth_min"]) * 0.6
    dmax = float(ref_cam["depth_max"]) * 1.2
    cams = geometry.make_cameras(
        K, np.stack(Rs), np.stack(ts), np.full(V, dmin, np.float32), np.full(V, dmax, np.float32)
    )

    # ---- prior state ----
    prior = None
    if spec.state != RunState.FIRST_INIT:
        prior = _load_prior(cache, problem, V, W, H, missing_ok=allow_missing_prior)
    if prior is None:
        prior = pipeline.PassState(
            depth=jnp.zeros((H, W), jnp.float32),
            normal_world=jnp.zeros((H, W, 3), jnp.float32),
            pixel_state=jnp.full((H, W), PixelState.STRONG, jnp.uint8),
            selected=jnp.zeros((V, H, W), bool),
        )
        spec = dataclasses.replace(spec, state=RunState.FIRST_INIT, use_APD=False,
                                   geom_consistency=False)

    # ---- weak worklist capacity (host-known: weak map is a pass input) ----
    weak_capacity = 0
    if spec.use_APD:
        count = int(np.sum(np.asarray(prior.pixel_state) == PixelState.WEAK))
        weak_capacity = _bucket_capacity(count, H * W)
        if weak_capacity == 0:
            spec = dataclasses.replace(spec, use_APD=False)

    # ---- source depth maps for geometric consistency ----
    depth_maps = None
    if spec.geom_consistency:
        dm = _load_src_depths(cache, problem, view_ids, W, H)
        if dm[1:V_real].any():
            pad = np.zeros((V - V_real, H, W), np.float32)
            depth_maps = jnp.asarray(np.concatenate([dm, pad]) if V > V_real else dm)
        else:
            spec = dataclasses.replace(spec, geom_consistency=False)

    # plane-sweep volumes (Pallas fast path; PERF_NOTES.md). The image
    # volumes are cached device-resident per (problem, scale) and reused
    # across the round's 4 passes; only the depth volumes (src-view
    # estimates, geom passes) are rebuilt per pass — the amortization
    # policy of ncc.build_image_volume_set.
    volumes = None
    if use_volumes:
        from apdmvs_tpu import ncc

        volumes = cache.image_volumes(
            problem.ref_image_id,
            W,
            # use_APD is constant within a round (build_schedule) and the
            # cache never outlives a round (scale changes clear it), so
            # the C36/C9 build can be skipped for non-APD rounds
            builder=lambda: ncc.build_image_volume_set(
                jnp.asarray(imgs), cams, dmin, dmax, num_slices=num_slices,
                weak_cost_volumes=round_use_apd,
            ),
        )
        if depth_maps is not None:
            volumes = ncc.add_depth_volumes(volumes, depth_maps, cams, dmin, dmax)

    cfg = PassConfig.from_spec(spec)
    out = pipeline.patchmatch_pass(
        jnp.asarray(imgs),
        cams,
        jnp.asarray(src_valid),
        prior,
        key,
        cfg,
        jnp.asarray(spec.ransac_threshold, jnp.float32),
        depth_maps=depth_maps,
        weak_capacity=weak_capacity,
        volumes=volumes,
        debug=debug_dumps,
    )
    if debug_dumps:
        from apdmvs_tpu import debug as debug_mod

        out, probes = out
        debug_mod.dump_probes(problem.result_folder, probes, H, W)
    out = pipeline.clamp_outputs(out, dmin, dmax)

    # ---- persist (main.cpp:117-124) + in-memory mirror ----
    depth = np.asarray(out.depth, np.float32)
    normal = np.asarray(out.normal_world, np.float32)
    weak = np.asarray(out.pixel_state, np.uint8)
    selected = pipeline.selected_to_bitmask(np.asarray(out.selected))
    formats.write_bin_mat(os.path.join(problem.result_folder, "depths.dmb"), depth)
    formats.write_bin_mat(os.path.join(problem.result_folder, "normals.dmb"), normal)
    formats.write_bin_mat(os.path.join(problem.result_folder, "weak.bin"), weak)
    formats.write_bin_mat(
        os.path.join(problem.result_folder, "selected_views.bin"), selected
    )
    cache.outputs[problem.ref_image_id] = {
        "depth": depth,
        "normal": normal,
        "weak": weak,
        "selected": selected,
    }

    if show_medium_result:
        tag = f"{spec.pass_index}"
        imio.save_image_u8(
            os.path.join(problem.result_folder, f"depth_{tag}.jpg"),
            render.render_depth(depth, dmin, dmax),
        )
        imio.save_image_u8(
            os.path.join(problem.result_folder, f"normal_{tag}.jpg"),
            render.render_normal(normal),
        )
        imio.save_image_u8(
            os.path.join(problem.result_folder, f"weak_{tag}.jpg"),
            render.render_weak(weak),
        )
    weak_pct = 100.0 * float(np.mean(weak == PixelState.WEAK))
    return ProblemStats(seconds=time.time() - t0, weak_pct=weak_pct)


def run_scene_batched(
    dense_folder: str | os.PathLike,
    seed: int = 0,
    fusion_variant: str = "eth",
    keep_intermediates: bool = True,
    max_rounds: Optional[int] = None,
    min_rounds: Optional[int] = None,
    n_view_shards: Optional[int] = None,
    n_space_shards: int = 1,
    camera_model: str = "eth",
    show_medium_result: bool = False,
    verbose: bool = True,
    use_volumes: Optional[bool] = None,
    num_slices: int = 160,
    volume_cache_gb: float = 6.0,
) -> str:
    """Batched/sharded reconstruction: all reference views of a pass run as
    ONE jitted program over a (view, space) device mesh.

    This is the TPU-native production path (SURVEY.md §2.8): the reference
    processes views sequentially and exchanges state through the filesystem;
    here the problem batch is view-sharded across devices, per-pass depth
    maps stay device-resident, and geometric-consistency passes gather
    source-view depths through XLA collectives. Files are still persisted
    per pass (the checkpoint/resume contract).

    ``use_volumes`` (default: on when the mesh has no space axis) runs each
    shard's problems through the Pallas plane-sweep-volume fast path, one
    problem's volumes resident per device at a time
    (parallel.sharded._volume_batched_pass).

    Multi-host: call ``parallel.multihost.maybe_initialize()`` (or export
    APD_COORDINATOR/APD_NUM_PROCESSES/APD_PROCESS_ID — the CLI does this)
    before this function and run it identically on every process. The mesh
    then spans all hosts' devices, each host uploads/persists only its
    addressable problem rows, and process 0 runs fusion. The scene folder
    must be on a filesystem every host can read and each owned result
    folder writable by its owner (the reference's own multi-GPU deployment
    assumption, main.cpp:148-153, minus its by-hand scene splitting).
    """
    import jax.numpy as jnp

    from apdmvs_tpu import parallel
    from apdmvs_tpu.parallel import multihost

    multi = jax.process_count() > 1

    dense_folder = str(dense_folder)
    problems = generate_sample_list(dense_folder)
    if verbose:
        print(f"There are {len(problems)} problems needed to be processed!")
    full_size = check_images(dense_folder, problems)
    round_num = compute_round_num(*full_size)
    if min_rounds is not None:
        round_num = max(round_num, min_rounds)
    if max_rounds is not None:
        round_num = min(round_num, max_rounds)
    schedule = build_schedule(round_num)
    cache = SceneCache(dense_folder, camera_model=camera_model)
    Np = len(problems)
    V = max(1 + len(p.src_image_ids) for p in problems)
    id_to_pos = {p.ref_image_id: i for i, p in enumerate(problems)}

    n_devices = len(jax.devices())
    if n_view_shards is None:
        n_view_shards = max(1, n_devices // n_space_shards)
        # no point sharding views beyond the problem count
        n_view_shards = min(n_view_shards, Np)
    mesh = parallel.make_mesh(n_view=n_view_shards, n_space=n_space_shards)
    N = ((Np + n_view_shards - 1) // n_view_shards) * n_view_shards  # padded
    owned_rows = (
        multihost.addressable_problems(mesh, N) if multi else np.arange(N)
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    # small per-problem reductions whose values drive host-side decisions
    # must come back fully replicated so every process can read them and
    # take the same branch
    _repl = NamedSharding(mesh, P())
    _weak_counts = jax.jit(
        lambda ps: jnp.sum(ps == PixelState.WEAK, axis=(1, 2)),
        out_shardings=_repl,
    )
    _any_pos = jax.jit(lambda d: jnp.any(d > 0), out_shardings=_repl)
    _weak_pct = jax.jit(
        lambda ps, n: 100.0 * jnp.mean(ps[:n] == PixelState.WEAK),
        static_argnums=1, out_shardings=_repl,
    )

    @jax.jit
    def _clamp(out, dmin_col, dmax_col):
        # out-of-range depths -> 0 / UNKNOWN (main.cpp:105-115)
        bad = (out.depth < dmin_col[..., None]) | (out.depth > dmax_col[..., None])
        return pipeline.PassState(
            depth=jnp.where(bad, 0.0, out.depth),
            normal_world=out.normal_world,
            pixel_state=jnp.where(
                bad, jnp.uint8(PixelState.UNKNOWN), out.pixel_state
            ),
            selected=out.selected,
        )
    if use_volumes is None:
        # volumes need whole images per problem (no space axis); interpret-
        # mode Pallas on CPU is test-only, so default off there too
        use_volumes = n_space_shards == 1 and jax.default_backend() != "cpu"

    root_key = jax.random.PRNGKey(seed)
    state: Optional[pipeline.PassState] = None  # batched [N, ...]
    # once-per-scale stacked image-volume cache (the batched analogue of
    # the sequential SceneCache.image_volumes amortization): image volumes
    # depend only on (problem, scale), so every pass of a round reuses one
    # build. Gated on the per-device HBM budget; a miss falls back to the
    # in-scan rebuild (memory-bounded staging).
    vol_cache: dict = {}

    for spec in schedule:
        t0 = time.time()
        full_w, full_h = full_size
        W, H = scaled_size(full_w, full_h, spec.scale_size)

        # ---- batched inputs ----
        imgs = np.zeros((N, V, H, W), np.float32)
        Ks = np.zeros((N, V, 3, 3), np.float32)
        Rs = np.zeros((N, V, 3, 3), np.float32)
        ts_ = np.zeros((N, V, 3), np.float32)
        src_valid = np.zeros((N, V), bool)
        dmins = np.ones((N, V), np.float32)
        dmaxs = np.full((N, V), 2.0, np.float32)
        src_index = np.zeros((N, V), np.int32)
        scale_x = W / float(full_w)
        scale_y = H / float(full_h)
        for n, p in enumerate(problems):
            view_ids = [p.ref_image_id] + list(p.src_image_ids)
            for v, vid in enumerate(view_ids):
                imgs[n, v] = cache.gray_scaled(vid, W, H)
                cam = cache.camera(vid)
                Ks[n, v] = cam["K"]
                Rs[n, v] = cam["R"]
                ts_[n, v] = cam["t"]
                src_index[n, v] = id_to_pos.get(vid, n)
            for v in range(len(view_ids), V):  # pad with ref camera
                Ks[n, v] = Ks[n, 0]
                Rs[n, v] = Rs[n, 0]
                ts_[n, v] = ts_[n, 0]
                src_index[n, v] = n
            src_valid[n, 1 : len(view_ids)] = True
            ref_cam = cache.camera(p.ref_image_id)
            dmins[n, :] = float(ref_cam["depth_min"]) * 0.6
            dmaxs[n, :] = float(ref_cam["depth_max"]) * 1.2
        for n in range(Np, N):  # padded problems: copy problem 0, no sources
            imgs[n] = imgs[0]
            Ks[n], Rs[n], ts_[n] = Ks[0], Rs[0], ts_[0]
            dmins[n], dmaxs[n] = dmins[0], dmaxs[0]
            src_index[n] = n

        Ks = np.asarray(
            geometry.scale_intrinsics(jnp.asarray(Ks), scale_x, scale_y)
        )
        cams_b = jax.vmap(geometry.make_cameras)(
            jnp.asarray(Ks), jnp.asarray(Rs), jnp.asarray(ts_),
            jnp.asarray(dmins), jnp.asarray(dmaxs),
        )

        # ---- prior state (resampled between pyramid levels) ----
        eff = spec
        if state is None:
            if eff.state != RunState.FIRST_INIT:
                eff = dataclasses.replace(
                    eff, state=RunState.FIRST_INIT, use_APD=False,
                    geom_consistency=False,
                )
            prior = pipeline.PassState(
                depth=np.zeros((N, H, W), np.float32),
                normal_world=np.zeros((N, H, W, 3), np.float32),
                pixel_state=np.full((N, H, W), PixelState.STRONG, np.uint8),
                selected=np.zeros((N, V, H, W), bool),
            )
        else:
            prev_hw = state.depth.shape[1:3]
            if prev_hw != (H, W):
                # nearest-neighbor resample of the prior state to the new
                # pyramid level (APD.cpp:552-581), ON DEVICE: the index
                # maps are static (imio.resize_nearest's exact formula),
                # so the resample is a jitted slice-gather over the sharded
                # state — no host round-trip, works identically multi-host
                # (global arrays in, global arrays out)
                ph, pw = prev_hw
                ys_i = jnp.asarray(
                    np.minimum((np.arange(H) * (ph / H)).astype(np.int64), ph - 1)
                )
                xs_i = jnp.asarray(
                    np.minimum((np.arange(W) * (pw / W)).astype(np.int64), pw - 1)
                )
                img_sp = P("view", None, "space", None)
                p2d = P("view", "space", None)
                v3 = P("view", "space", None, None)
                out_sh = pipeline.PassState(
                    depth=NamedSharding(mesh, p2d),
                    normal_world=NamedSharding(mesh, v3),
                    pixel_state=NamedSharding(mesh, p2d),
                    selected=NamedSharding(mesh, img_sp),
                )

                @functools.partial(jax.jit, out_shardings=out_sh)
                def _resample(st):
                    def rz2(a):  # [..., H', W'] trailing spatial axes
                        return jnp.take(jnp.take(a, ys_i, axis=-2), xs_i, axis=-1)

                    return pipeline.PassState(
                        depth=rz2(st.depth),
                        normal_world=jnp.take(
                            jnp.take(st.normal_world, ys_i, axis=1), xs_i, axis=2
                        ),
                        pixel_state=rz2(st.pixel_state),
                        selected=rz2(st.selected),
                    )

                with mesh:
                    prior = _resample(state)
            else:
                prior = state

        # ---- uniform weak capacity across the batch ----
        weak_capacity = 0
        if eff.use_APD:
            # replicated reduction: every process reads the same counts
            # and takes the same branch
            counts = np.asarray(_weak_counts(prior.pixel_state))
            cmax = int(counts.max())
            weak_capacity = _bucket_capacity(cmax, H * W)
            if weak_capacity == 0:
                eff = dataclasses.replace(eff, use_APD=False)

        all_depths = prior.depth if eff.geom_consistency else None
        if eff.geom_consistency and not bool(np.asarray(_any_pos(all_depths))):
            eff = dataclasses.replace(eff, geom_consistency=False)
            all_depths = None

        keys = np.asarray(
            jax.vmap(
                lambda n: jax.random.fold_in(
                    jax.random.fold_in(root_key, spec.pass_index), n
                )
            )(jnp.arange(N))
        )
        rth = np.full((N,), eff.ransac_threshold, np.float32)

        cfg = PassConfig.from_spec(eff)

        # ---- once-per-scale stacked volume cache ----
        # Skipped on space-sharded meshes: sharded_batch_pass routes those
        # to the spaced row-slab path, which builds its own per-shard slab
        # volumes and ignores ``prebuilt`` — building the cache there would
        # replicate up to volume_cache_gb of HBM per device (it shards only
        # over 'view') in exactly the memory-constrained regime spaced mode
        # targets.
        prebuilt = None
        if use_volumes and mesh.shape.get("space", 1) == 1:
            prebuilt = vol_cache.get((W, H))
            if prebuilt is None:
                vol_cache.clear()  # schedule never revisits a finished scale
                from apdmvs_tpu import ncc as ncc_mod
                from apdmvs_tpu.ops import ncc_volume
                from apdmvs_tpu.parallel.sharded import _batch_specs, put_sharded

                PHp = ncc_mod._ceil_to(H, ncc_volume.NCC_TILE_H) + 2 * ncc_volume.PAD_Y
                PWp = ncc_mod._ceil_to(W, ncc_volume.TILE_W) + 2 * ncc_volume.PAD_X
                # E + C36 + C9, bf16 (ncc.build_image_volume_set layout)
                per_problem = 3 * (V - 1) * num_slices * PHp * PWp * 2
                n_local = N // n_view_shards
                # per-problem granularity: cache the first M local problems
                # that fit the budget; the scan rebuilds the rest in-scan.
                # When partial, reserve one set's worth for the transient
                # in-scan build that is co-resident with the pinned cache.
                m_fit = int(volume_cache_gb * 1e9 // per_problem)
                if m_fit < n_local:
                    m_fit = max(0, m_fit - 1)
                m_fit = min(m_fit, n_local)
                if m_fit < n_local and jax.process_count() > 1:
                    # the subset gather below is host-local; multihost runs
                    # keep the all-or-nothing policy
                    m_fit = n_local if m_fit >= n_local else 0
                if m_fit > 0:
                    img_s, cams_s, _, _ = _batch_specs(mesh)
                    if m_fit < n_local:
                        # each shard's first m_fit problems (problems are
                        # sharded in contiguous blocks over the view axis)
                        sub = np.concatenate([
                            np.arange(s * n_local, s * n_local + m_fit)
                            for s in range(n_view_shards)
                        ])
                        imgs_c = np.asarray(imgs)[sub]
                        cams_c = jax.tree.map(
                            lambda x: np.asarray(x)[sub], cams_b,
                            is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
                        )
                        if verbose and jax.process_index() == 0:
                            print(
                                f"volume cache: pinning {m_fit}/{n_local} "
                                f"local problems ({per_problem/1e9:.2f} GB "
                                f"each, budget {volume_cache_gb} GB); rest "
                                "rebuild in-scan"
                            )
                    else:
                        imgs_c, cams_c = imgs, cams_b
                    imgs_c = put_sharded(mesh, imgs_c, img_s)
                    cams_c = jax.tree.map(
                        lambda x, s: put_sharded(mesh, x, s), cams_c, cams_s,
                        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)),
                    )
                    with mesh:
                        prebuilt = parallel.build_batch_image_volumes(
                            imgs_c, cams_c, num_slices, mesh,
                        )
                    vol_cache[(W, H)] = prebuilt
                elif verbose and jax.process_index() == 0:
                    print(
                        f"volume cache: {n_local} local problems x "
                        f"{per_problem/1e9:.2f} GB exceeds budget "
                        f"{volume_cache_gb} GB -> in-scan rebuild per pass"
                    )

        out = parallel.sharded_batch_pass(
            mesh, imgs, cams_b, src_valid, prior,
            keys, rth, cfg, weak_capacity=weak_capacity,
            all_depths=all_depths,
            src_index=src_index if all_depths is not None else None,
            use_volumes=use_volumes, num_slices=num_slices,
            prebuilt=prebuilt,
        )
        out = jax.block_until_ready(out)
        dmin_col, dmax_col = dmins[:, :1], dmaxs[:, :1]
        if multi:  # numpy args must become (replicated) global arrays
            dmin_col = multihost.global_batch(mesh, P(), dmin_col)
            dmax_col = multihost.global_batch(mesh, P(), dmax_col)
        state = _clamp(out, dmin_col, dmax_col)

        # ---- persist the checkpoint contract per pass (each problem's
        # files written by exactly one host) ----
        rows_d = multihost.fetch_rows(state.depth, owned_rows)
        rows_n = multihost.fetch_rows(state.normal_world, owned_rows)
        rows_p = multihost.fetch_rows(state.pixel_state, owned_rows)
        rows_s = multihost.fetch_rows(state.selected, owned_rows)
        for n, p in enumerate(problems):
            if n not in rows_d:
                continue
            formats.write_bin_mat(
                os.path.join(p.result_folder, "depths.dmb"), rows_d[n]
            )
            formats.write_bin_mat(
                os.path.join(p.result_folder, "normals.dmb"), rows_n[n]
            )
            formats.write_bin_mat(
                os.path.join(p.result_folder, "weak.bin"), rows_p[n]
            )
            formats.write_bin_mat(
                os.path.join(p.result_folder, "selected_views.bin"),
                pipeline.selected_to_bitmask(rows_s[n]),
            )
            if show_medium_result:  # debug dumps (main.cpp:127-134)
                ref_cam = cache.camera(p.ref_image_id)
                tag = f"{spec.pass_index}"
                imio.save_image_u8(
                    os.path.join(p.result_folder, f"depth_{tag}.jpg"),
                    render.render_depth(
                        rows_d[n],
                        float(ref_cam["depth_min"]) * 0.6,
                        float(ref_cam["depth_max"]) * 1.2,
                    ),
                )
                imio.save_image_u8(
                    os.path.join(p.result_folder, f"normal_{tag}.jpg"),
                    render.render_normal(rows_n[n]),
                )
                imio.save_image_u8(
                    os.path.join(p.result_folder, f"weak_{tag}.jpg"),
                    render.render_weak(rows_p[n]),
                )
        # compute UNCONDITIONALLY: the replicated reduction is a collective,
        # and in multi-process runs every process must issue the same
        # collectives even if only some of them print (verbose may differ
        # per process — e.g. log on process 0 only)
        weak_pct = float(np.asarray(_weak_pct(state.pixel_state, Np)))
        if verbose:
            print(
                f"round {spec.round_index} pass {spec.pass_index} "
                f"({eff.state.name}, scale 1/{spec.scale_size}, "
                f"{Np} views batched over {n_view_shards}x{n_space_shards} mesh): "
                f"{(time.time()-t0)*1000:.0f} ms, weak {weak_pct:.1f}%"
            )

    if multi:
        # all hosts' checkpoint files must be on disk before fusion reads
        # them; fusion itself is host-side and runs once (process 0)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("apdmvs_pre_fusion")
    ply = os.path.join(dense_folder, "APD", "APD.ply")
    if jax.process_index() == 0:
        ply = run_fusion(dense_folder, problems, variant=fusion_variant)
        if verbose:
            print(f"Fused point cloud: {ply}")
        if not keep_intermediates:
            for p in problems:
                shutil.rmtree(p.result_folder, ignore_errors=True)
    return ply


def _load_fusion_views(
    dense_folder: str, problems: Sequence[Problem]
) -> Tuple[List["fusion_mod.FusionView"], List[List[int]]]:
    """Per-view fusion inputs from the persisted pass outputs
    (the reference re-reads depths/normals/weak per view, APD.cpp:826-900)."""
    id_to_pos = {p.ref_image_id: i for i, p in enumerate(problems)}
    views: List[fusion_mod.FusionView] = []
    for p in problems:
        cam = formats.read_camera(
            os.path.join(dense_folder, "cams", formats.to_format_index(p.ref_image_id) + "_cam.txt")
        )
        depth = formats.read_bin_mat(os.path.join(p.result_folder, "depths.dmb"))
        normal = formats.read_bin_mat(os.path.join(p.result_folder, "normals.dmb"))
        weak = formats.read_bin_mat(os.path.join(p.result_folder, "weak.bin"))
        H, W = depth.shape
        bgr = imio.load_bgr_u8(
            os.path.join(dense_folder, "images", formats.to_format_index(p.ref_image_id) + ".jpg")
        )
        # rescale color image + K to depth-map size (APD.cpp:729-750)
        if bgr.shape[:2] != (H, W):
            scale_x = W / bgr.shape[1]
            scale_y = H / bgr.shape[0]
            bgr = imio.resize_bilinear(bgr.astype(np.float32), W, H).astype(np.uint8)
            K = np.asarray(geometry.scale_intrinsics(jnp.asarray(cam["K"]), scale_x, scale_y))
        else:
            K = cam["K"]
        block = None
        block_path = os.path.join(dense_folder, "blocks", f"mask_{p.ref_image_id}.jpg")
        if os.path.exists(block_path):  # optional ROI masks (APD.cpp:848-852)
            block = imio.load_gray_f32(block_path).astype(np.uint8)
            block = imio.resize_nearest(block, W, H)
        views.append(
            fusion_mod.FusionView(
                K=np.asarray(K, np.float64),
                R=np.asarray(cam["R"], np.float64),
                t=np.asarray(cam["t"], np.float64),
                image_bgr=bgr,
                depth=depth,
                normal=normal,
                weak=weak,
                block=block,
            )
        )
    src_ids = [
        [id_to_pos[s] for s in p.src_image_ids if s in id_to_pos] for p in problems
    ]
    return views, src_ids


def run_fusion(
    dense_folder: str | os.PathLike,
    problems: Sequence[Problem],
    variant: str = "eth",
    out_name: str = "APD.ply",
) -> str:
    """Load all per-view outputs and fuse to a point cloud
    (reference RunFusion: APD.cpp:826-977, called at main.cpp:219)."""
    dense_folder = str(dense_folder)
    views, src_ids = _load_fusion_views(dense_folder, problems)
    if variant == "eth":
        coords, colors = fusion_mod.fuse_eth(views, src_ids)
    elif variant == "eth-device":
        # the TPU-resident fusion (lax.scan over views, pixel-parallel on
        # the device mesh) — fusion_device.py
        from apdmvs_tpu import fusion_device

        coords, colors = fusion_device.fuse_eth_device(views, src_ids)
    elif variant == "tat_intermediate":
        coords, colors = fusion_mod.fuse_tat(views, src_ids, advanced=False)
    elif variant == "tat_advanced":
        coords, colors = fusion_mod.fuse_tat(views, src_ids, advanced=True)
    else:
        raise ValueError(f"unknown fusion variant {variant!r}")
    out_path = os.path.join(dense_folder, "APD", out_name)
    formats.export_point_cloud(out_path, coords, colors)
    return out_path


def run_fusion_device_sharded(
    dense_folder: str | os.PathLike,
    problems: Sequence[Problem],
    mesh=None,
    out_name: str = "APD_device.ply",
) -> str:
    """Distributed device fusion: the ETH fusion scan with the consumed-mask
    carry ROW-SHARDED across all devices (fusion_device.fuse_eth_device's
    mesh mode). COLLECTIVE: in a multi-process run every process must call
    this (the program spans the global mesh); process 0 writes the PLY and
    every process returns its path. Contrast run_fusion, which fuses
    host-side on the calling process only (the reference's host-only shape,
    APD.cpp:826)."""
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh

    from apdmvs_tpu import fusion_device

    dense_folder = str(dense_folder)
    views, src_ids = _load_fusion_views(dense_folder, problems)
    if mesh is None:
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(1, -1), ("view", "space")
        )
    coords, colors = fusion_device.fuse_eth_device(views, src_ids, mesh=mesh)
    out_path = os.path.join(dense_folder, "APD", out_name)
    if jax.process_index() == 0:
        formats.export_point_cloud(out_path, coords, colors)
    return out_path


def run_scene(
    dense_folder: str | os.PathLike,
    seed: int = 0,
    fusion_variant: str = "eth",
    show_medium_result: bool = False,
    keep_intermediates: bool = True,
    max_rounds: Optional[int] = None,
    min_rounds: Optional[int] = None,
    use_volumes: Optional[bool] = None,
    camera_model: str = "eth",
    allow_missing_prior: bool = False,
    volume_cache_gb: float = 6.0,
    verbose: bool = True,
    debug_dumps: bool = False,
    profile_dir: Optional[str] = None,
    num_slices: int = 160,
) -> str:
    """Full reconstruction: the reference `main()` (main.cpp:140-233).

    Multi-scale round scheduler -> per-(view, pass) PatchMatch -> fusion ->
    APD/APD.ply. Returns the PLY path.

    ``min_rounds`` forces extra coarse-to-fine rounds below the reference's
    1000 px trigger (main.cpp:72-88) so the full REFINE_INIT / APD /
    annealing schedule can be exercised on small scenes.
    """
    dense_folder = str(dense_folder)
    problems = generate_sample_list(dense_folder)
    if verbose:
        print(f"There are {len(problems)} problems needed to be processed!")
    full_size = check_images(dense_folder, problems)
    round_num = compute_round_num(*full_size)
    if min_rounds is not None:
        round_num = max(round_num, min_rounds)
    if max_rounds is not None:
        round_num = min(round_num, max_rounds)
    if verbose:
        print(f"Round num: {round_num}")
    schedule = build_schedule(round_num)
    cache = SceneCache(
        dense_folder, camera_model=camera_model,
        volume_cache_bytes=volume_cache_gb * 1e9,
    )
    cache.expected_sets = len(problems)
    V_pad = max(1 + len(p.src_image_ids) for p in problems)
    root_key = jax.random.PRNGKey(seed)
    if use_volumes is None:
        # the Pallas volume path is the TPU production path; CPU runs use
        # the XLA reference implementation (volumes would hit interpret
        # mode, which is slower than the direct path)
        use_volumes = jax.default_backend() not in ("cpu",)

    import contextlib

    trace_cm = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    with trace_cm:
      for spec in schedule:
        for problem in problems:
            key = jax.random.fold_in(
                jax.random.fold_in(root_key, spec.pass_index), problem.index
            )
            stats = process_problem(
                cache, problem, spec, full_size, key,
                num_views_pad=V_pad, show_medium_result=show_medium_result,
                use_volumes=use_volumes, num_slices=num_slices,
                allow_missing_prior=allow_missing_prior,
                debug_dumps=debug_dumps,
            )
            if verbose:
                # per-pass timing + weak ratio (reference: main.cpp:135-137
                # "Cost time", APD.cpp:538 weak percentage)
                print(
                    f"round {spec.round_index} pass {spec.pass_index} "
                    f"view {problem.ref_image_id:08d} ({spec.state.name}, "
                    f"scale 1/{spec.scale_size}): {stats.seconds*1000:.0f} ms, "
                    f"weak {stats.weak_pct:.1f}%"
                )

    ply = run_fusion(dense_folder, problems, variant=fusion_variant)
    if verbose:
        print(f"Fused point cloud: {ply}")

    if not keep_intermediates:  # reference deletes per-view dirs (main.cpp:220-230)
        for p in problems:
            shutil.rmtree(p.result_folder, ignore_errors=True)
    return ply
