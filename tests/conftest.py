"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware."""
import os

# XLA:CPU compiles are very slow on this machine (1 core); persist them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# In this JAX build the XLA_FLAGS/env mechanisms for virtual CPU devices do
# not take effect; the config API does (must run before backend init).
import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
