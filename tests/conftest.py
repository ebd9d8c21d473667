"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's rebuild test strategy — multi-device behavior is
exercised on CPU via XLA's host platform device count so no TPU is needed
to keep the suite green.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NB: JAX_PLATFORMS=cpu is NOT honored in this environment (the axon TPU
# plugin registers regardless and wins default-backend priority), so force
# the CPU platform explicitly — tests must run on the virtual 8-device
# CPU mesh, with fp32 numerics.
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)
