"""Test configuration: run on CPU with 8 virtual devices.

Fast core: ``pytest -m "not slow"`` deselects the >12 s tests (golden
image comparisons, multi-frame animation equivalence, PSNR measurements)
for quick iteration; the default run includes everything.


Multi-chip sharding tests use XLA's host-platform device-count flag — the
substitute for a real TPU pod that the reference never had an analog of
(it was single-GPU; SURVEY.md section 4).

Platform selection must use ``jax.config.update`` (not the JAX_PLATFORMS
env var): the TPU-tunnel plugin registered at interpreter startup overrides
the env var with ``jax_platforms="axon,cpu"``, and initializing that backend
costs a minutes-long network handshake the CPU tests don't need.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
