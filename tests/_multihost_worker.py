"""Subprocess worker for the simulated 2-host test (tests/test_multihost.py).

Each worker is one JAX process with 4 virtual CPU devices; together they
form an 8-device global mesh spanning 2 "hosts". Run:

    python tests/_multihost_worker.py <process_id> <num_processes> <port> <scene_folder>
"""

import sys

pid, nproc, port, folder = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
try:  # cross-process CPU collectives
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from apdmvs_tpu.parallel import multihost  # noqa: E402

assert multihost.maybe_initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

from apdmvs_tpu import scene  # noqa: E402

ply = scene.run_scene_batched(
    folder, seed=0, n_view_shards=4 * nproc, n_space_shards=1,
    verbose=(pid == 0),
    # 2 rounds: the scale boundary exercises the device-side prior
    # resample (a collective program every process must enter)
    min_rounds=2,
)

# distributed device fusion on the SAME outputs: the consumed-mask scan
# carry row-shards across both processes' devices (collective program —
# every process enters; process 0 writes APD_device.ply)
problems = scene.generate_sample_list(folder)
plyd = scene.run_fusion_device_sharded(folder, problems)
print(f"WORKER_OK {pid} {ply} {plyd}", flush=True)
