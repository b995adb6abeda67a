"""HNSW fused-build throughput on the real chip (VERDICT weak #4: round-1
was 61.7 inserts/s, RTT-bound at ~25-30 dispatches per batch; the fused
step dispatches ONCE per batch with zero syncs)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.common import make_clustered_corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.hnsw import HNSWIndex
    from benches.common import recall_at_k

    N = int(os.environ.get("QUIVER_BENCH_N", 100_000))
    D, BB = 128, int(os.environ.get("QUIVER_BENCH_BUILD_BATCH", 8192))
    print("devices:", jax.devices(), "N:", N, "build_batch:", BB, flush=True)
    vecs, rng = make_clustered_corpus(N, D)
    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    idx = HNSWIndex(store, build_batch=BB, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    slots = store.add_batch([f"v{i}" for i in range(N)], vecs)
    idx.on_insert(slots, vecs)
    # force completion: fetch a tiny device value derived from the graph
    _ = int(idx._spill_dev) if idx._spill_dev is not None else 0
    dt = time.perf_counter() - t0
    print(f"build: {dt:.1f}s = {N/dt:,.0f} inserts/s  spill={_}", flush=True)

    B, K = 256, 10
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    _, truth = ExactIndex(store).search_slots(queries, K)
    for ef in (50, 100, 200):
        idx.config.ef_search = ef
        t0 = time.perf_counter()
        _, got = idx.search_slots(queries, K)
        warm = time.perf_counter() - t0
        rec = recall_at_k(got, truth, K)
        t0 = time.perf_counter()
        for _i in range(8):
            out = idx.search_slots(queries, K)
        dt = (time.perf_counter() - t0) / 8
        print(f"query ef={ef}: recall@10={rec:.4f}  {B/dt:,.0f} QPS "
              f"(warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
