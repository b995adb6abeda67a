"""HNSW build wall-clock, per-batch: separates compile stalls from
steady-state throughput. N via argv (default 20000)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.hnsw import HNSWIndex

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    BB = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    D = 128
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(N, D)).astype(np.float32)
    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    idx = HNSWIndex(store, build_batch=BB, compute_dtype=jnp.bfloat16)

    t_all = time.perf_counter()
    done = 0
    while done < N:
        n = min(BB, N - done)
        t0 = time.perf_counter()
        slots = store.add_batch(
            [f"v{i}" for i in range(done, done + n)], vecs[done:done + n])
        t1 = time.perf_counter()
        idx.on_insert(slots, vecs[done:done + n])
        t2 = time.perf_counter()
        print(f"batch rows={n:6d} store={t1-t0:7.2f}s insert={t2-t1:7.2f}s",
              flush=True)
        done += n
    total = time.perf_counter() - t_all
    print(f"TOTAL N={N} in {total:.1f}s = {N/total:,.0f} inserts/s", flush=True)

    # steady-state: one more batch at the final shapes
    extra = rng.normal(size=(BB, D)).astype(np.float32)
    store2 = store  # capacity may grow; reuse
    t0 = time.perf_counter()
    slots = store2.add_batch([f"x{i}" for i in range(BB)], extra)
    idx.on_insert(slots, extra)
    dt = time.perf_counter() - t0
    print(f"steady-state batch {BB}: {dt:.2f}s = {BB/dt:,.0f} inserts/s",
          flush=True)


if __name__ == "__main__":
    main()
