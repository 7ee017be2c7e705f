"""apdmvs_tpu — a TPU-native PatchMatch multi-view-stereo framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of APD-MVS
(CVPR 2023, "Adaptive Patch Deformation for Textureless-Resilient Multi-View
Stereo"; reference CUDA implementation surveyed in SURVEY.md):

- multi-scale red-black checkerboard PatchMatch depth/normal estimation,
- plain + anchor-deformed multi-view NCC cost aggregation,
- Monte-Carlo joint view selection,
- RANSAC reliable-anchor selection for weak-texture pixels,
- geometric-consistency refinement,
- depth-map fusion to a point cloud,
- reference views sharded over TPU meshes (parallel/) with collective
  depth-map exchange replacing the reference's filesystem round trips.

The compute path is pure JAX (VPU-friendly elementwise + gather formulations
of every reference CUDA kernel) with optional Pallas acceleration for the hot
NCC evaluator; host orchestration is thin Python driving jitted programs.
"""

__version__ = "0.1.0"

from apdmvs_tpu.params import (  # noqa: F401
    PatchMatchParams,
    Problem,
    RunState,
    PixelState,
)
