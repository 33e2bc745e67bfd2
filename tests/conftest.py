import os

# In plain environments (the driver's test runner) force a virtual 8-device
# CPU mesh so sharding logic is exercised without TPU hardware.  Under the
# axon TPU plugin (sitecustomize keyed on PALLAS_AXON_POOL_IPS) these are
# ignored and tests run on the real chip — which is fine for numerics.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Persistent compilation cache: amortizes XLA compiles across test runs
# (this host has a single CPU core; compiles dominate test wall time).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
