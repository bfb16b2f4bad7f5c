"""Test harness: force an 8-device virtual CPU platform so the real
pjit/shard_map code paths run multi-device without TPUs (SURVEY.md §4).

Note: this machine's sitecustomize registers an 'axon' TPU PJRT plugin and
pins ``jax_platforms="axon,cpu"`` via jax.config (so plain JAX_PLATFORMS env
overrides are ignored). We re-pin to cpu *after* import, before any backend
is materialized — compiles on the tunneled TPU cost minutes, CPU is what we
want for unit tests anyway.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
