"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU via
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (SURVEY §4).

NOTE: this container ships an `axon` TPU-tunnel plugin loaded from a
sitecustomize on PYTHONPATH; its registration makes *process exit* hang for
minutes even when JAX computes on CPU.  The fastest way to run the suite:

    PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q

When the suite is launched without that, we still force the CPU backend
here (before anything imports jax) and hard-exit at session end so the
axon teardown cannot stall CI.
"""

import os
import sys

_AXON_ACTIVE = os.environ.get("JAX_PLATFORMS", "") == "axon" or (
    ".axon_site" in os.environ.get("PYTHONPATH", "")
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter start, so jax has
# already read JAX_PLATFORMS=axon from the env by the time this conftest
# runs — the env write above is too late and the suite would silently run
# on the TPU (where fp32 matmuls default to bf16 MXU passes and the torch
# parity tolerances fail).  Force the backend through the live config too.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    # runs AFTER the terminal summary is printed
    if _AXON_ACTIVE:
        # flush and skip interpreter teardown: the axon PJRT plugin's exit
        # path blocks for minutes in this sandbox.
        sys.stdout.flush()
        sys.stderr.flush()
        status = getattr(config, "_pvt_exitstatus", 0)
        os._exit(int(status))


def pytest_sessionfinish(session, exitstatus):
    session.config._pvt_exitstatus = int(exitstatus)
