"""Test harness configuration.

All correctness tests run on CPU in float64/complex128 (that's where the
reference tolerances live); multi-device sharding tests use a virtual
8-device CPU mesh, following the reference's "same math two ways must agree"
testing template (SURVEY.md §4).

NOTE: the harness presets JAX_PLATFORMS=axon (remote TPU tunnel) and its
sitecustomize re-registers the platform at interpreter start, so the env var
alone is not enough — we must force the platform through jax.config before
any computation happens.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the fast tier is dominated by compiles of
# the big scan kernels (iar_jit, tiar_real, SPIKE), which are identical
# run-to-run.  Cache them next to the tests (gitignored); CI restores the
# directory between builds.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
