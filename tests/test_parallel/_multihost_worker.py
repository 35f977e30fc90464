"""Worker process for the 2-process multi-host test.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
Prints 'FINAL_COST <value>' on success.  Env is configured BEFORE jax
import: CPU backend, 4 virtual devices per process (8 global), gloo
cross-process collectives.
"""

import os
import sys

# Script dir is tests/test_parallel; the package lives at the repo root.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
)

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
# Force exactly 4 local virtual devices, overriding anything inherited
# (pytest's conftest exports an 8-device XLA_FLAGS).
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:%s" % port
os.environ["JAX_NUM_PROCESSES"] = str(num_processes)
os.environ["JAX_PROCESS_ID"] = str(process_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mayamatchmovesolver_tpu.parallel import ba_sharded, multihost  # noqa
from mayamatchmovesolver_tpu.solver import ba  # noqa: E402


def synthetic_ba(num_frames, num_bundles, seed=3, perturb=0.03):
    """Deterministic problem — identical on every process."""
    rng = np.random.RandomState(seed)
    cam_true = np.zeros((num_frames, 6))
    cam_true[:, 0] = np.linspace(-2, 2, num_frames)
    cam_true[:, 1] = 1.0
    cam_true[:, 2] = 10.0
    cam_true[:, 4] = np.linspace(-5, 5, num_frames)
    bnd_true = np.stack([
        rng.uniform(-4, 4, num_bundles),
        rng.uniform(-2, 2, num_bundles),
        rng.uniform(-8, -3, num_bundles),
    ], axis=-1)
    problem0 = ba.make_ba_problem(
        marker_uv=np.zeros((num_bundles, num_frames, 2)),
        weight=np.ones((num_bundles, num_frames)),
        mkr_bnd_index=np.arange(num_bundles),
        cam_params=cam_true,
        bnd_params=bnd_true,
    )
    r = ba.ba_residuals(
        problem0, jnp.asarray(cam_true), jnp.asarray(bnd_true)
    )
    uv_true = -np.asarray(r) / problem0.image_width
    return problem0._replace(
        marker_uv=jnp.asarray(uv_true),
        cam_params=jnp.asarray(
            cam_true + rng.normal(0, perturb, cam_true.shape)
        ),
        bnd_params=jnp.asarray(
            bnd_true + rng.normal(0, perturb, bnd_true.shape)
        ),
    )


def main():
    assert multihost.initialize(), "distributed bootstrap failed"
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    mesh = multihost.frame_mesh()
    problem = synthetic_ba(num_frames=4 * len(jax.devices()),
                           num_bundles=8)
    sharded = ba_sharded.shard_ba_problem(problem, mesh)
    result = ba_sharded.sharded_solve_ba(
        sharded, mesh, max_iterations=15, cg_iterations=25
    )
    cam = multihost.gather_to_primary(result.cam_params)
    assert cam.shape == problem.cam_params.shape
    multihost.sync_hosts("done")
    if multihost.is_primary():
        print("FINAL_COST %.12e" % float(result.cost))
        print("INITIAL_COST %.12e" % float(result.cost_initial))
    print("WORKER_%d_OK" % process_id)


main()
