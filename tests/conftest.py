"""Test configuration: force an 8-device CPU mesh.

Multi-chip behavior is validated on virtual CPU devices, standing in for a TPU
slice (SURVEY.md §4 implications): the axon TPU plugin registered by
sitecustomize is bypassed via jax.config (env vars alone are overridden by the
plugin registration), and XLA_FLAGS must be set before the CPU backend
initializes — hence this module-level code running at pytest collection time,
before any test imports trigger backend init.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
