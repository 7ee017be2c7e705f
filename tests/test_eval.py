"""Evaluation harness metrics (eval.py)."""

import numpy as np

from apdmvs_tpu import eval as ev


def test_cloud_metrics_identical():
    rng = np.random.RandomState(0)
    pts = rng.rand(5000, 3)
    m = ev.cloud_metrics(pts, pts, thresholds=(0.01,))[0.01]
    assert m.accuracy == 1.0 and m.completeness == 1.0 and m.f1 == 1.0


def test_cloud_metrics_offset_and_partial():
    rng = np.random.RandomState(1)
    gt = rng.rand(4000, 3)
    # half the prediction matches GT, half is offset far away
    pred = np.concatenate([gt[:2000], gt[2000:] + 10.0])
    m = ev.cloud_metrics(pred, gt, thresholds=(0.005,))[0.005]
    assert abs(m.accuracy - 0.5) < 0.02
    # completeness: gt[:2000] covered exactly; the rest only by accident
    assert 0.45 < m.completeness < 0.6
    assert 0.45 < m.f1 < 0.6


def test_depth_metrics():
    gt = np.full((10, 10), 4.0)
    pred = gt * 1.01
    pred[0, 0] = 0.0  # missing estimate
    m = ev.depth_metrics(pred, gt)
    assert abs(m["median_rel_err"] - 0.01) < 1e-6
    assert m["coverage"] == 0.99
    assert m["frac_lt_2pct"] == 1.0
