"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax initializes its backends, so environment variables are
set at import time of this conftest (pytest imports conftest before test
modules). Sharding/multi-chip tests rely on the 8 fake devices; numeric tests
just use them as ordinary CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize registers the axon TPU plugin and pins
# jax_platforms = "axon" through jax.config, which overrides the env var —
# force it back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The image's sitecustomize also wires JAX's persistent compilation cache
# (axon/register/ifrt.py patches jax._src.compilation_cache), so test
# processes write every CPU executable to .jax_cache — gigabytes of junk,
# and serializing large interpret-mode Pallas programs SEGFAULTS in
# put_executable_and_time (observed round 3: full suite rc=139 in the
# since-retired packed group-stats oracle test). Tests want fresh
# compiles; disable the cache entirely.
jax.config.update("jax_enable_compilation_cache", False)
