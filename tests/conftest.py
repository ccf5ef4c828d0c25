"""Test config: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md sect. 4 point d).

NOTE: this environment pre-imports jax and registers a TPU PJRT plugin in
sitecustomize for EVERY python process, with JAX_PLATFORMS=axon exported.
Setting env vars here is too late — we must flip the already-imported jax
config to CPU before any backend initializes (the TPU tunnel is single-client
and tests must never grab it).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# persistent XLA compile cache: integrator graphs dominate suite wall time
# on few-core hosts; repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
