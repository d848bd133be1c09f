import os
# force CPU with a virtual 8-device mesh for sharding tests
# (JAX_PLATFORM_NAME is the variable the installed axon plugin respects)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
