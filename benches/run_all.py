"""Run every bench module; each prints JSON lines (BASELINE configs #1-#5).

cwd-independent: the repo root (where bench.py lives) is derived from this
file and put on sys.path, so `python benches/run_all.py` works from
anywhere; a headline-bench failure is reported, not swallowed.
"""

import os
import runpy
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

MODULES = [
    "benches.bench_hnsw",
    "benches.bench_ivf",
    "benches.bench_hybrid",
    "benches.bench_filtered",
    "benches.bench_persistence",
    "benches.bench_streaming",
    "benches.bench_churn",
    "benches.bench_latency",
    "benches.bench_api",
    "benches.bench_memory",
    "benches.bench_10m",
]
# benches.bench_skew runs separately: it forces the 8-virtual-CPU mesh
# via env vars that must be set before jax initializes.

if __name__ == "__main__":
    rc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")], cwd=ROOT,
    ).returncode
    if rc != 0:
        print(f"--- bench.py FAILED rc={rc}", flush=True)
    for mod in MODULES:
        print(f"--- {mod}", flush=True)
        try:
            runpy.run_module(mod, run_name="__main__")
        except Exception as e:
            print(f"{mod} failed: {e}", flush=True)
