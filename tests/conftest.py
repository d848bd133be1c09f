import os

# Force CPU with a virtual 8-device mesh for the test suite (sharding tests
# need 8 devices; everything else is faster on CPU-JAX than the tunneled TPU).
# NOTE: the outer environment pre-sets JAX_PLATFORMS=axon, so these must be
# hard overrides, not setdefault (round-1 bug: setdefault left the suite on
# the single real TPU and no mesh test could ever have passed).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

# sitecustomize.py (axon) imports jax at interpreter startup, which snapshots
# JAX_PLATFORMS into jax.config before this file runs — update the live
# config too (the backend itself is still uninitialized here, so XLA_FLAGS
# above is picked up when the CPU client is created).
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the TPU-backend sweep compiles many
# programs; caching them on disk makes the subprocess-isolated groups in
# test_recon_tpu (and repeated CI runs) cheap after the first pass.
# The directory is per-configuration (cpu + 8 virtual devices): sharing
# one dir across backend/flag configurations makes XLA load AOT entries
# compiled under other machine flags, which can wedge the 8-device
# in-process collectives (observed: CHECK crash in
# InProcessCommunicator::AllReduce via AwaitAndLogIfStuck).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_libhm_cpu8")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

