"""End-to-end scene tests: dataset contract -> scheduler -> fusion -> PLY.

Mirrors the reference's only smoke flow (README.md:45-67: convert a scene,
run ./APD, inspect APD.ply) as automated metric tests on synthetic oracle
scenes (SURVEY.md §4 item 5).
"""

import os

import numpy as np
import pytest

from apdmvs_tpu import fusion, scene
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.io import formats
from apdmvs_tpu.params import PixelState

pytestmark = pytest.mark.slow  # scene-level end-to-end (fast tier: -m 'not slow')


def _point_to_planes_dist(points: np.ndarray, planes) -> np.ndarray:
    """Min |n . (X - p0)| over scene planes for each point."""
    d = np.full(points.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((points - pl.p0) @ pl.n))
    return d


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("synth_scene")
    cams, planes = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))
    return str(folder), cams, planes


def test_generate_sample_list(scene_dir):
    folder, cams, planes = scene_dir
    problems = scene.generate_sample_list(folder)
    assert len(problems) == 4
    assert problems[0].ref_image_id == 0
    assert all(len(p.src_image_ids) == 3 for p in problems)
    w, h = scene.check_images(folder, problems)
    assert (w, h) == (160, 120)


def test_fusion_oracle(scene_dir):
    """Fusion of oracle depth/normal maps must reproduce the scene planes."""
    folder, cams, planes = scene_dir
    images, depths, normals = synthetic.render_scene(cams, planes)
    views = []
    for i, cam in enumerate(cams):
        bgr = np.repeat(
            np.clip(images[i], 0, 255).astype(np.uint8)[..., None], 3, axis=-1
        )
        views.append(
            fusion.FusionView(
                K=cam.K.astype(np.float64),
                R=cam.R.astype(np.float64),
                t=cam.t.astype(np.float64),
                image_bgr=bgr,
                depth=depths[i],
                normal=normals[i],
                weak=np.full(depths[i].shape, PixelState.STRONG, np.uint8),
            )
        )
    n = len(views)
    src_ids = [[j for j in range(n) if j != i] for i in range(n)]
    coords, colors = fusion.fuse_eth(views, src_ids)
    assert coords.shape[0] > 10000  # dense acceptance on oracle inputs
    dist = _point_to_planes_dist(coords.astype(np.float64), planes)
    assert np.median(dist) < 0.01
    assert np.mean(dist < 0.05) > 0.95

    # TAT variants also accept oracle inputs
    c2, _ = fusion.fuse_tat(views, src_ids, advanced=False)
    c3, _ = fusion.fuse_tat(views, src_ids, advanced=True)
    assert c2.shape[0] > 10000
    assert c3.shape[0] > 10000


def test_run_scene_end_to_end(scene_dir):
    """Full pipeline on a synthetic scene: PLY points must lie on the scene
    planes (metric parity, SURVEY.md §7 item 5)."""
    folder, cams, planes = scene_dir
    ply = scene.run_scene(folder, seed=0, verbose=False)
    assert os.path.exists(ply)
    coords, colors = formats.read_point_cloud(ply)
    assert coords.shape[0] > 3000, coords.shape
    dist = _point_to_planes_dist(coords.astype(np.float64), planes)
    # points within 1% of the ~4m scene depth
    assert np.median(dist) < 0.04, np.median(dist)
    assert np.mean(dist < 0.1) > 0.80, np.mean(dist < 0.1)
    # per-view state files persisted (checkpoint/resume contract)
    d = formats.read_bin_mat(os.path.join(folder, "APD", "00000000", "depths.dmb"))
    assert d.shape == (120, 160)
    # resume-from-files: wiping the memory cache and fusing again works
    problems = scene.generate_sample_list(folder)
    ply2 = scene.run_fusion(folder, problems, out_name="APD2.ply")
    c2, _ = formats.read_point_cloud(ply2)
    assert c2.shape[0] == coords.shape[0]


def test_blocks_mask_file_suppresses_ref_pixels(scene_dir):
    """A real blocks/mask_<id>.jpg ROI file must be picked up by
    run_fusion (scene.py block_path; reference APD.cpp:848-852): masked
    reference pixels of that view emit no points, an all-keep mask is a
    byte-level no-op. Runs after test_run_scene_end_to_end so the
    per-view state files exist (module-scoped scene_dir)."""
    import shutil

    from apdmvs_tpu.io import images as imio

    folder, cams, planes = scene_dir
    if not os.path.exists(os.path.join(folder, "APD", "00000000", "depths.dmb")):
        scene.run_scene(folder, seed=0, verbose=False)
    problems = scene.generate_sample_list(folder)
    base_ply = scene.run_fusion(folder, problems, out_name="APD_nomask.ply")
    base, _ = formats.read_point_cloud(base_ply)

    blocks = os.path.join(folder, "blocks")
    os.makedirs(blocks, exist_ok=True)
    try:
        # all-keep mask: identical output
        imio.save_image_u8(
            os.path.join(blocks, "mask_0.jpg"),
            np.full((120, 160), 255, np.uint8),
        )
        keep_ply = scene.run_fusion(folder, problems, out_name="APD_keep.ply")
        keep, _ = formats.read_point_cloud(keep_ply)
        assert keep.shape == base.shape
        np.testing.assert_array_equal(keep, base)

        # half mask on view 0: its masked ref pixels emit nothing
        m = np.full((120, 160), 255, np.uint8)
        m[:, : 160 // 2] = 0
        imio.save_image_u8(os.path.join(blocks, "mask_0.jpg"), m)
        half_ply = scene.run_fusion(folder, problems, out_name="APD_half.ply")
        half, _ = formats.read_point_cloud(half_ply)
        # view-0's masked half lost its ref-pixel emissions
        lost = base.shape[0] - half.shape[0]
        assert lost > 100, (half.shape, base.shape)
    finally:
        shutil.rmtree(blocks, ignore_errors=True)


def test_missing_prior_fails_loudly(tmp_path):
    """A non-FIRST_INIT pass without prior state files must raise (the
    reference exits, APD.cpp:514-518); allow_missing_prior restores the
    lenient re-initialization."""
    import jax

    from apdmvs_tpu.params import build_schedule

    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(num_views=3, width=96, height=80)
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))
    problems = scene.generate_sample_list(folder)
    cache = scene.SceneCache(folder)
    spec = build_schedule(1)[1]  # first REFINE_ITER pass
    key = jax.random.PRNGKey(0)
    with pytest.raises(FileNotFoundError):
        scene.process_problem(cache, problems[0], spec, (96, 80), key)
    # lenient mode re-initializes from scratch instead
    stats = scene.process_problem(
        cache, problems[0], spec, (96, 80), key, allow_missing_prior=True
    )
    assert stats.seconds > 0
    d = formats.read_bin_mat(os.path.join(problems[0].result_folder, "depths.dmb"))
    assert d.shape == (80, 96)


def test_multi_round_resume_bit_compatible(tmp_path):
    """Multi-round schedule (REFINE_INIT + use_APD + scale boundary) with a
    mid-schedule kill/resume: re-running the remaining passes from the
    on-disk state files must reproduce the uninterrupted run bit-for-bit
    (the file contract IS the checkpoint system, SURVEY.md §5)."""
    import shutil

    import jax

    from apdmvs_tpu.params import build_schedule

    folder = str(tmp_path / "scene")
    cams, planes = synthetic.make_ring_scene(
        num_views=3, width=96, height=72, include_flat_region=True
    )
    synthetic.write_mvsnet_dataset(folder, cams, planes, depth_ranges=(2.0, 8.0))
    problems = scene.generate_sample_list(folder)
    full_size = (96, 72)
    schedule = build_schedule(2)  # forced 2 rounds: scale 1/2 then 1/1
    assert schedule[4].state.name == "REFINE_INIT" and schedule[4].use_APD
    root_key = jax.random.PRNGKey(0)
    V_pad = max(1 + len(p.src_image_ids) for p in problems)

    def run_passes(cache, specs):
        for spec in specs:
            for problem in problems:
                key = jax.random.fold_in(
                    jax.random.fold_in(root_key, spec.pass_index), problem.index
                )
                scene.process_problem(
                    cache, problem, spec, full_size, key, num_views_pad=V_pad
                )

    # uninterrupted run, snapshotting the state dir mid-schedule (after the
    # coarse round, right before the scale boundary)
    kill_at = 4
    cache = scene.SceneCache(folder)
    run_passes(cache, schedule[:kill_at])
    snap = str(tmp_path / "snap")
    shutil.copytree(os.path.join(folder, "APD"), snap)
    run_passes(cache, schedule[kill_at:])
    final = {
        p.ref_image_id: formats.read_bin_mat(
            os.path.join(p.result_folder, "depths.dmb")
        )
        for p in problems
    }
    weak_final = {
        p.ref_image_id: formats.read_bin_mat(
            os.path.join(p.result_folder, "weak.bin")
        )
        for p in problems
    }

    # "killed" run: restore the snapshot, resume with a cold cache
    shutil.rmtree(os.path.join(folder, "APD"))
    shutil.copytree(snap, os.path.join(folder, "APD"))
    cache2 = scene.SceneCache(folder)
    run_passes(cache2, schedule[kill_at:])
    for p in problems:
        d = formats.read_bin_mat(os.path.join(p.result_folder, "depths.dmb"))
        np.testing.assert_array_equal(d, final[p.ref_image_id])
        wk = formats.read_bin_mat(os.path.join(p.result_folder, "weak.bin"))
        np.testing.assert_array_equal(wk, weak_final[p.ref_image_id])
    # the APD machinery actually ran: some pixels classified WEAK somewhere
    # along the final round's outputs (flat region present in the scene)
    assert any(
        (w == PixelState.WEAK).any() or (w == PixelState.UNKNOWN).any()
        for w in weak_final.values()
    )
