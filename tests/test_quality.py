"""Scene-family quality harness: full pipeline -> fused cloud -> F-score
against oracle geometry (eval.py), under per-view radiometric gain/bias +
pixel noise (VERDICT round-1 item 6: beyond two clean planes — occlusion,
curvature, radiometric robustness).

Thresholds are in scene units on ~4 m scenes: 0.05 ~ 1.2% of depth."""

import os

import numpy as np
import pytest

from apdmvs_tpu import eval as eval_mod
from apdmvs_tpu import scene
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.io import formats

pytestmark = pytest.mark.slow  # scene-level end-to-end (fast tier: -m 'not slow')


def _run_and_eval(tmp_path, cams, prims, seed=0, noise=True, **run_kw):
    folder = str(tmp_path / "scene")
    images, depths, normals = synthetic.render_scene(cams, prims)
    imgs_in = synthetic.perturb_radiometric(images, seed=11) if noise else images
    synthetic.write_mvsnet_dataset(folder, cams, prims, images=imgs_in)
    ply = scene.run_scene(folder, seed=seed, verbose=False, **run_kw)
    coords, _ = formats.read_point_cloud(ply)
    gt = synthetic.gt_cloud(cams, depths, stride=2)
    metrics = eval_mod.cloud_metrics(coords, gt, thresholds=(0.05,))
    return metrics[0.05], coords, depths


def test_occlusion_scene_quality(tmp_path):
    """Foreground card over a wall: fusion must reject half-occluded
    matches (the consistency thresholds' purpose, APD.cpp:918-951)."""
    cams, prims = synthetic.make_occlusion_scene(num_views=4)
    m, coords, depths = _run_and_eval(tmp_path, cams, prims)
    # floors ~0.9x of measured (BASELINE.md quality table: acc 0.904,
    # f1 0.603) so a real regression cannot pass silently (VERDICT r3)
    assert m.num_points > 3000, m
    assert m.accuracy > 0.81, m
    assert m.f1 > 0.54, m


def test_curved_scene_quality(tmp_path):
    """Sphere + wall: per-pixel local planes must track curvature."""
    cams, prims = synthetic.make_curved_scene(num_views=4)
    m, coords, depths = _run_and_eval(tmp_path, cams, prims)
    # ~0.9x measured (acc 0.990, f1 0.805)
    assert m.num_points > 3000, m
    assert m.accuracy > 0.89, m
    assert m.f1 > 0.72, m


def test_multi_round_apd_end_to_end(tmp_path):
    """Forced 2-round schedule through run_scene (main.cpp:164-217
    semantics on a small scene): REFINE_INIT re-seeding, prior rescaling
    across the scale boundary, ransac/rotate annealing, use_APD=True on
    round 1 — asserted at the fused-cloud metric level. Also exercises the
    DEBUG_NEIGHBOUR / DEBUG_COST_LINE probe dumps (debug.py)."""
    import numpy as np

    from apdmvs_tpu import debug as debug_mod

    cams, prims = synthetic.make_ring_scene(
        num_views=4, width=96, height=72, include_flat_region=True
    )
    m, coords, depths = _run_and_eval(
        tmp_path, cams, prims, noise=False, min_rounds=2, debug_dumps=True
    )
    # ~0.9x measured (acc 0.997, f1 0.870)
    assert m.num_points > 1500, m
    assert m.accuracy > 0.90, m
    assert m.f1 > 0.78, m

    # probe files for view 0 parse and are self-consistent
    folder = str(tmp_path / "scene")
    rf = os.path.join(folder, "APD", "00000000")
    sweep = formats.read_bin_mat(os.path.join(rf, "weak_cost_line.dmb"))
    assert sweep.shape == (61, 96), sweep.shape
    nb_path = os.path.join(rf, "neighbour.bin")
    if os.path.exists(nb_path):  # written only for passes with weak pixels
        nb = debug_mod.read_neighbours(nb_path)
        nb_map = formats.read_bin_mat(os.path.join(rf, "neighbour_map.bin"))
        assert nb.shape[1:] == (9, 2)
        assert (nb_map >= -1).all()
        assert int((nb_map >= 0).sum()) == nb.shape[0]


def test_radiometric_robustness(tmp_path):
    """NCC is affine-invariant: gain/bias + noise must not collapse quality
    relative to the clean run (same ring scene as test_scene.py)."""
    cams, prims = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    m_noisy, _, _ = _run_and_eval(tmp_path, cams, prims, noise=True)
    # ~0.9x measured (acc 0.999, f1 0.902)
    assert m_noisy.num_points > 3000, m_noisy
    assert m_noisy.accuracy > 0.90, m_noisy
    assert m_noisy.f1 > 0.81, m_noisy
