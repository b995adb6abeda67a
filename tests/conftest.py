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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen intermittently SEGFAULTs mid-compile
    # under long suites with large SPMD programs (observed repeatedly in
    # backend_compile_and_load during test_sharded after ~200 tests);
    # parallel codegen buys nothing on this single-core host anyway
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """XLA:CPU segfaults inside backend_compile after a few hundred live
    compiled executables accumulate (observed repeatedly at ~230 tests in,
    always mid-compile of a large 8-device SPMD program, test position
    varying run to run). Dropping all jit caches between modules keeps the
    live-executable population bounded; modules re-compile what they share
    (seconds on CPU)."""
    yield
    jax.clear_caches()
    gc.collect()
