"""Test harness config: run on CPU with 8 virtual devices.

Multi-host tests run without a pod via JAX's simulated-device backend
(SURVEY.md section 4: "the natural fake backend").

Note: this environment preloads jax from a sitecustomize (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon (the tunneled TPU), so setting env
vars here is too late -- we must override via jax.config before the backend
is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
