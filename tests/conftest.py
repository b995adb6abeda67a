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

# ---- slow tier (VERDICT r3 next #10): tests measured >= ~10 s on the
# 8-virtual-CPU mesh (suite durations, 2026-08-19). `pytest -m "not slow"`
# is the default CI loop (< 5 min); the full suite runs the batteries.
# Centralized here so the budget is one list, not 30 scattered decorators;
# parametrized variants match on the base name.
_SLOW_TESTS = {
    # hnsw build/churn batteries
    "test_churn_compaction_rebuilds_row_space",
    "test_ef_changes_beam_behavior",
    "test_update_churn_grows_row_space_past_capacity",
    "test_recall_against_oracle",
    "test_visited_bitmap_mode",
    "test_delete_removes_from_results",
    "test_incremental_inserts_match_quality",
    # sharded graph (8-device SPMD builds are compile-heavy on CPU)
    "test_fuzz_sharded_hnsw_random_ops",
    "test_sharded_hnsw_self_recall",
    "test_sharded_hnsw_incremental_matches_fresh_stack",
    "test_sharded_hnsw_incremental_stack_on_write",
    "test_sharded_hnsw_delete_and_underfill",
    "test_sharded_hnsw_mask_falls_back_sharded_exact",
    "test_sharded_hnsw_negative_rerank",
    "test_sharded_hnsw_topology_roundtrip",
    "test_sharded_hnsw_topology_mesh_mismatch_ignored",
    "test_sharded_hnsw_balanced_shards",
    "test_sharded_hnsw_subindex_rebuild_resyncs_mirror",
    "test_sharded_hnsw_recall_vs_oracle",
    "test_sharded_hnsw_results_sorted_and_valid",
    # topology persistence round-trips (full graph rebuild + compare)
    "test_topology_roundtrip_identical_graph",
    "test_topology_with_wal_mutations",
    "test_hybrid_engine_sidecar",
    # hybrid orchestration over the graph engine
    "test_batch_mixed_per_query_strategies",
    "test_hybrid_large_routes_hnsw",
    # ivf fused-formulation parity (pallas kernel compiles)
    "test_fused_formulation_matches_einsum",
    "test_fused_kg_batching_invariant",
    "test_ivf_fused_non_pow2_batch",
    "test_fuzz_sharded_ivf_random_ops",
    "test_sharded_write_paths",
}
_SLOW_FILES = {"test_fuzz_engines.py"}  # whole-file fuzz batteries


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS or item.path.name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    """Build the native WAL library if a toolchain is present, so the
    CRC/group-commit C++ path is exercised on any fresh checkout instead
    of silently regressing to the Python fallback (VERDICT r4 next #10;
    the reference's durability suite always runs,
    /root/reference/pkg/persistence/durability_test.go). Best-effort: no
    compiler -> the three native tests skip as before."""
    import subprocess

    native = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "quiver_tpu", "native",
    )
    so = os.path.join(native, "libquiver_wal.so")
    src = os.path.join(native, "wal.cc")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    try:
        subprocess.run(
            ["make", "-C", native], check=False, capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        pass


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
