import os

# Force a virtual 8-device CPU mesh so sharding logic is exercised without
# TPU hardware.  The axon TPU plugin (sitecustomize keyed on
# PALLAS_AXON_POOL_IPS) is explicitly DISABLED for tests: its remote-compile
# helper is ~20x slower per compile than local CPU XLA (measured: the 3-test
# docking subset takes 34 s on clean CPU vs >590 s through the tunnel), and
# the suite is compile-bound on this 1-core host.  Numerics are
# backend-independent; the real chip is exercised by bench.py and the CLI
# verification flows instead.
# The ambient environment exports JAX_PLATFORMS=axon, so this must be a
# hard override (a setdefault silently left the whole suite running — and
# remote-compiling — through the TPU tunnel, ~20x slower per compile).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Persistent compilation cache: amortizes XLA compiles across test runs
# (this host has a single CPU core; compiles dominate test wall time).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
