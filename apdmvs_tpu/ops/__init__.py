"""TPU kernels (Pallas) and the epipolar-volume sampling architecture.

Why this exists (measured on TPU v5e, see PERF_NOTES.md): XLA lowers
arbitrary 2D image gathers — the reference's `tex2D` equivalent — at
~0.01-0.04 G elements/s, which makes direct per-pixel homography warps
(reference: APD.cu:365-372 + tex2D call sites) the bottleneck of every NCC
evaluation.

The TPU-native reformulation rests on an exact identity: the warped
position of a ref pixel under a plane hypothesis depends only on the
*depth of the plane along that pixel's ray*, not on the plane normal:

    H(pi) p = K_src (R_rel d~ + t_rel / depth_pi(p)),  d~ = K_ref^-1 p

(derived from the homography decomposition in geometry.py; the normal
enters only through depth_pi(p)). Therefore every sample any plane
hypothesis can ever request for pixel p lies on a 1-parameter family —
p's epipolar curve — parameterized by inverse depth. Precomputing a
per-view plane-sweep volume E[k, y, x] = src sampled at inverse-depth
u_k (a single *global* homography warp per slice) turns all hot-path
sampling into interpolation along the K axis, which Pallas implements as
an in-VMEM K-way select at VPU speed.
"""

from apdmvs_tpu.ops.volume import (  # noqa: F401
    build_volume,
    inv_depth_grid,
    volume_sample,
    volume_sample_ref,
)
