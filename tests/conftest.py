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

# NB: the environment globally sets JAX_PLATFORMS=axon (the tunneled TPU
# plugin), so it must be OVERWRITTEN (not setdefault'd) before importing
# jax — tests run on the virtual 8-device CPU mesh with fp32 numerics and
# must never contact the axon compile service.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env var alone is NOT enough: the axon sitecustomize installs a
# jax-import hook that force-updates jax.config.jax_platforms to
# "axon,cpu", so the first backends() call would initialize the tunneled
# TPU client — and HANG the whole CPU suite whenever the relay is down.
# Re-pin at the config level (backends are not initialized yet here).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: XLA compiles dominate the suite's wall
# clock on this 1-core host (the tier was measured at ~27 min cold).
# Warm-cache reruns skip them; the cache key covers program + flags +
# platform, so it is correctness-neutral.
os.makedirs(os.path.join(os.path.dirname(__file__), ".jax_cache"),
            exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 item 2).  The FULL suite takes ~30 min on this
# 1-core host, which is how a red test got committed in round 3.  The
# default tier (plain ``pytest tests/``) excludes tests marked ``slow``
# — the heavyweight torch/reference oracle modules and CLI drives — and
# must stay under ~5 minutes; it gates every snapshot.  Run the FULL
# tier with ``pytest tests/ -q --runslow`` at least once per round.
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked 'slow' (the full ~30-min tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight oracle/CLI-drive test, excluded from the "
        "default (<5 min) tier; run with --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (run with --runslow for the full suite)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
