"""Test harness config: run on CPU with 8 virtual devices.

Multi-host tests run without a pod via JAX's simulated-device backend
(SURVEY.md section 4: "the natural fake backend"). Must set env before the
first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
