"""Test configuration.

Notes on this sandbox: the JAX platform is forced to the 'axon' TPU
tunnel (JAX_PLATFORMS=cpu is ignored), every XLA compile is a remote
round-trip, and f64 LU/QR/Cholesky decompositions are not implemented by
the TPU compiler.  Therefore:
  * a persistent compilation cache makes re-runs fast;
  * solver linear algebra uses our own jnp implementations
    (mayamatchmovesolver_tpu/solver/linalg.py) that compile for f64;
  * float64 is enabled for parity assertions (TPU emulates f64
    arithmetic; only the library decompositions are missing).

On a normal host (e.g. the driver's dryrun with
--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) this
conftest keeps the same behavior on the CPU backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# TPU matmuls default to reduced-precision passes; parity tests need the
# full-precision algorithm.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
