"""Device-side fusion (fusion_device.py) vs the host backends.

Same algorithm and collision rule as fusion.fuse_eth's vectorized
backend, executed as a lax.scan over views on the device mesh; float32
on device vs float64 on host can flip borderline acceptances, so parity
is at the decision level, not bitwise.
"""

import numpy as np

from apdmvs_tpu import fusion, fusion_device
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.params import PixelState


def _views(num_views=4, width=160, height=120):
    cams, planes = synthetic.make_ring_scene(
        num_views=num_views, width=width, height=height
    )
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
    return views, src_ids, planes


def test_device_fusion_matches_numpy():
    views, src_ids, planes = _views()
    cd, cold = fusion_device.fuse_eth_device(views, src_ids)
    cp, colp = fusion.fuse_eth(views, src_ids, backend="numpy")
    assert cd.shape[0] > 10000, cd.shape
    # decision-level parity: counts within 1%, same geometric accuracy
    assert abs(cd.shape[0] - cp.shape[0]) / cp.shape[0] < 0.01, (
        cd.shape[0], cp.shape[0]
    )
    d = np.full(cd.shape[0], np.inf)
    for pl in planes:
        d = np.minimum(d, np.abs((cd.astype(np.float64) - pl.p0) @ pl.n))
    assert np.median(d) < 0.01, np.median(d)


def test_device_fusion_greedy_dedup():
    """The consumed-mask chain works: a view processed later must not
    re-emit points another view already consumed, so the fused cloud has
    fewer points than the sum of per-view valid pixels."""
    views, src_ids, planes = _views(num_views=3, width=96, height=80)
    cd, _ = fusion_device.fuse_eth_device(views, src_ids)
    total_valid = sum(int((v.depth > 0).sum()) for v in views)
    assert 0 < cd.shape[0] < total_valid


def test_device_fusion_sharded_masks_match():
    """Row-sharding the pixel fields AND the consumed-mask scan carry over
    a 'space' mesh axis must not change any fusion decision: the program
    is identical, only array placement differs (XLA inserts the collectives
    for the scattered cross-shard mask reads/updates). Round-3 VERDICT
    next-round item 7."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    views, src_ids, planes = _views(num_views=4, width=128, height=96)
    c0, col0 = fusion_device.fuse_eth_device(views, src_ids)
    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(1, 4), ("view", "space")
    )
    c1, col1 = fusion_device.fuse_eth_device(views, src_ids, mesh=mesh)
    assert c0.shape == c1.shape, (c0.shape, c1.shape)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(col0, col1)
