"""Run every bench module; each prints JSON lines (BASELINE configs #1-#5)."""

import runpy
import subprocess
import sys

MODULES = [
    "benches.bench_hnsw",
    "benches.bench_ivf",
    "benches.bench_hybrid",
    "benches.bench_filtered",
    "benches.bench_persistence",
    "benches.bench_streaming",
]

if __name__ == "__main__":
    subprocess.run([sys.executable, "bench.py"], check=False)
    for mod in MODULES:
        print(f"--- {mod}", flush=True)
        try:
            runpy.run_module(mod, run_name="__main__")
        except Exception as e:
            print(f"{mod} failed: {e}", flush=True)
