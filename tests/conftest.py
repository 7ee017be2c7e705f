"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-host behavior is validated without a pod via virtual CPU devices
(SURVEY.md §4 item 4). The container's sitecustomize pre-imports jax with the
TPU ('axon') platform selected, so env vars are too late — we override the
live config instead, before any backend is initialized.

XLA_FLAGS is still read lazily at backend init, so the CPU scheduler
override below does take effect: XLA:CPU's concurrency-optimized scheduler
lets independent collectives on overlapping device groups start in
different orders on different virtual devices, deadlocking the in-process
rendezvous (reproduced with the weak path's worklist collectives + spatial
halo exchanges on a (view, space) mesh). Disabling it serializes
collectives in program order — which is how a real TPU executes them
anyway (statically scheduled stream), so CPU validation matches TPU
semantics.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: the suite compiles
    hundreds of distinct programs (scene runners x pass configs x meshes),
    and the accumulated executables + constants have aborted XLA:CPU
    compiles late in a full-suite run (memory pressure; the same test
    passes in isolation). Per-module clearing caps the footprint without
    losing intra-module jit reuse."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def ring_scene():
    from apdmvs_tpu.datasets import synthetic

    cams, planes = synthetic.make_ring_scene(num_views=4, width=160, height=120)
    images, depths, normals = synthetic.render_scene(cams, planes)
    return cams, planes, images, depths, normals


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scene-level end-to-end tests (minutes each on the CPU mesh); "
        "deselect with -m 'not slow' for the fast unit/kernel tier",
    )
