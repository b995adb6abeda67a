"""BASELINE config #2: HNSW build + query (SIFT-like 128-d L2).

Build wall-clock, batched query QPS, recall@10 vs the exact oracle at the
default ef sweep. N via QUIVER_BENCH_N (default 50k; SIFT-1M shape at 1M).
"""

import time

import numpy as np

from benches.common import (
    emit,
    env_int,
    make_clustered_corpus,
    pipelined_ms,
    recall_at_k,
)


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.hnsw import HNSWIndex

    N = env_int("QUIVER_BENCH_N", 50_000)
    D, B, K = 128, 256, 10
    vecs, rng = make_clustered_corpus(N, D)
    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    idx = HNSWIndex(store, build_batch=env_int("QUIVER_BENCH_BUILD_BATCH", 8192),
                    compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    slots = store.add_batch([f"v{i}" for i in range(N)], vecs)
    idx.on_insert(slots, vecs)
    build_s = time.perf_counter() - t0
    emit(f"hnsw build wall-clock, N={N} d={D} M=16 efC=200", build_s, "s",
         inserts_per_s=round(N / build_s, 1))

    # near-corpus queries + EXACT oracles: f32 set-intersection recall AND
    # the tie-aware f64 recall the headline bench uses (clustered corpora
    # carry near-exact ties at the boundary rank — a returned row at the
    # k-th distance with a different id is not a miss)
    from benches.truth import exact_truth_f64, recall_with_ties

    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    exact = ExactIndex(store)
    _, truth = exact.search_slots(queries, K)
    d10 = exact_truth_f64(queries, vecs, K)[1][:, K - 1]
    for ef in (50, 100, 200):
        idx.config.ef_search = ef
        _, got = idx.search_slots(queries, K)
        rec = recall_at_k(got, truth, K)
        rec_t = recall_with_ties(np.asarray(got), queries, vecs, d10, K)
        ms = pipelined_ms(lambda: idx.search_slots(queries, K), depth=4)
        emit(f"hnsw query QPS, N={N} ef={ef}", B / (ms / 1e3), "qps",
             recall_at_10=round(rec, 4),
             recall_at_10_ties=round(rec_t, 4))


if __name__ == "__main__":
    main()
