"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``--xla_force_host_platform_device_count``), mirroring SURVEY.md §4's
recommendation; real-TPU benchmarking happens in bench.py instead.

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin in
every process and force-sets ``jax_platforms="axon,cpu"`` via jax.config
(which overrides the JAX_PLATFORMS env var), so we must update jax.config
back to cpu-only *after* importing jax and before any backend is touched.
"""

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
# force OUR device count even if the environment already carries one — an
# inherited count below 8 would silently skip every multi-chip test
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

# tests assume the energy VAD unless they opt in explicitly — a converted
# neural-VAD artifact in the developer's cache must not change test behavior
os.environ.setdefault("GIGAAM_VAD_ARTIFACT", "energy")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), (
    "tests must run on the virtual CPU mesh, not the TPU tunnel"
)
