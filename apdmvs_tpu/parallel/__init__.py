"""Multi-chip scaling: view-sharded PatchMatch over a TPU device mesh.

The reference is single-process/single-GPU (SURVEY.md §2.8); its only scale
axes are manual multi-process runs and the filesystem as an inter-view
exchange. Here scaling is first-class: reference views are sharded across a
``jax.sharding.Mesh`` (the data-parallel analogue), images are additionally
sharded spatially, and the geometric-consistency pass's cross-view depth
exchange rides XLA collectives over ICI instead of disk round-trips.
"""

from apdmvs_tpu.parallel import multihost  # noqa: F401
from apdmvs_tpu.parallel.sharded import (  # noqa: F401
    build_batch_image_volumes,
    make_mesh,
    shard_problems,
    sharded_batch_pass,
    gather_depth_maps,
)
