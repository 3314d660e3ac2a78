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
