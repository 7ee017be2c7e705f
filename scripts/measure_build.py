"""Measure volume-set build components + host<->device transfer on TPU.

Decides the amortization policy for VERDICT round-2 item 1: cache image
volumes across a round's 4 passes (host RAM vs device) vs rebuild.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from apdmvs_tpu import geometry, ncc
from apdmvs_tpu.datasets import synthetic
from apdmvs_tpu.ops import ncc_volume, volume as vol, cost_volume as cv

V, W, H = 5, 640, 480
K = 160
cams, planes = synthetic.make_ring_scene(num_views=V, width=W, height=H)
images, depths, normals = synthetic.render_scene(cams, planes)
Km = np.stack([c.K for c in cams]).astype(np.float32)
R = np.stack([c.R for c in cams]).astype(np.float32)
t = np.stack([c.t for c in cams]).astype(np.float32)
gc = geometry.make_cameras(Km, R, t, np.full(V, 1.2, np.float32), np.full(V, 9.6, np.float32))
imgs = jnp.asarray(images)
dm = jnp.asarray(np.stack(depths))


def timeit(name, fn, n=3):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn()
        # force a (small) transfer to ensure completion
        leaves = jax.tree_util.tree_leaves(r)
        np.asarray(leaves[0].ravel()[:8] if hasattr(leaves[0], "ravel") else leaves[0])
        for l in leaves:
            l.block_until_ready() if hasattr(l, "block_until_ready") else None
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.0f} ms (min of {n})")
    return r


full = timeit("full build_volume_set (E+C36+C9+D)", lambda: ncc.build_volume_set(
    imgs, gc, 1.2, 9.6, num_slices=K, depth_maps=dm, weak_cost_volumes=True))

img_only = timeit("image-only build (E+C36+C9)", lambda: ncc.build_volume_set(
    imgs, gc, 1.2, 9.6, num_slices=K, depth_maps=None, weak_cost_volumes=True))

e_only = timeit("E-only build", lambda: ncc.build_volume_set(
    imgs, gc, 1.2, 9.6, num_slices=K, depth_maps=None, weak_cost_volumes=False))

# isolated C volume build from a fixed E
E1 = img_only.E[0]
refp = img_only.ref_pad
c36 = timeit("one C36 build (per view)", lambda: cv.build_cost_volume(E1, refp, radius=5, increment=2))

# D-only (geom depth volumes): full minus img? measure one view
wc = geometry.warp_constants(gc)
u_min, du = vol.inv_depth_grid(1.2, 9.6, K)
Hp = ((H + 7) // 8) * 8
Wp = ((W + 127) // 128) * 128
d1 = timeit("one D build (per view)", lambda: vol.build_volume_pallas(
    dm[1], wc.M[1], wc.b[1], gc.K[0], Hp, Wp, u_min, du, K, pad_y=0, pad_x=0,
    dtype=jnp.float32, trunc=True))

# transfer: device -> host -> device of the E+C36+C9 stack
nbytes = sum(x.size * x.dtype.itemsize for x in (img_only.E, img_only.C36, img_only.C9))
print(f"image volumes size: {nbytes/1e9:.2f} GB")
t0 = time.time()
hostE = np.asarray(img_only.E)
hostC36 = np.asarray(img_only.C36)
hostC9 = np.asarray(img_only.C9)
print(f"device->host: {(time.time()-t0)*1000:.0f} ms")
t0 = time.time()
dE = jnp.asarray(hostE)
dC36 = jnp.asarray(hostC36)
dC9 = jnp.asarray(hostC9)
dE.block_until_ready(); dC36.block_until_ready(); dC9.block_until_ready()
np.asarray(dE.ravel()[:8])
print(f"host->device: {(time.time()-t0)*1000:.0f} ms")
