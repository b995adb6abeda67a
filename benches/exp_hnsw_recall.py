"""Recall-plateau experiment: query_dtype x visited x ef at N=100k.

Round-2 diagnosis work (VERDICT r2 next-#5): HNSW recall sat at ~0.92 flat
across ef=50/100/200. Hypotheses under test:

* bf16 matmul INPUT rounding (~0.4% of |q||v|) exceeds the 10th-vs-11th
  neighbor distance gap -> ranking noise no ef can fix;
* beam termination used worst-of-padded-beam, making ef=50 and ef=100
  run the identical program (beam_len quantizes to the same pow2);
* ring visited-set re-expansion waste vs the true bitmap.

Builds once (bf16 construction, the production default), caches the
topology sidecar in /tmp, then sweeps the query-time knobs.
"""

import os
import time

import numpy as np

from benches.common import (
    emit,
    env_int,
    make_clustered_corpus,
    pipelined_ms,
    recall_at_k,
)

CACHE = "/tmp/hnsw_exp_topo_{n}_v2.npz"  # v2: keep_pruned build


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.hnsw import HNSWIndex

    N = env_int("QUIVER_BENCH_N", 100_000)
    D, B, K = 128, 256, 10
    vecs, rng = make_clustered_corpus(N, D)
    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    slots = store.add_batch([f"v{i}" for i in range(N)], vecs)
    idx = HNSWIndex(store, build_batch=8192, compute_dtype=jnp.bfloat16)
    cache = CACHE.format(n=N)
    if os.path.exists(cache):
        data = dict(np.load(cache))
        idx.import_topology(data, np.arange(store.capacity))
        print(f"# loaded topology from {cache}", flush=True)
    else:
        t0 = time.perf_counter()
        idx.on_insert(slots, vecs)
        print(f"# build {time.perf_counter() - t0:.1f}s", flush=True)
        np.savez(cache, **{k: v for k, v in idx.export_topology().items()})

    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    exact = ExactIndex(store)
    _, truth = exact.search_slots(queries, K)
    from benches.truth import exact_truth_f64, recall_with_ties

    d10 = exact_truth_f64(queries, vecs, K)[1][:, K - 1]

    for qd in ("float32", "bfloat16"):
        for visited in ("ring", "bitmap"):
            for ef in (50, 100, 200, 400):
                idx.set_optimization_parameters(
                    ef_search=ef, visited=visited, query_dtype=qd
                )
                _, got = idx.search_slots(queries, K)
                rec = recall_at_k(got, truth, K)
                rec_ties = recall_with_ties(
                    np.asarray(got), queries, vecs, d10, K
                )
                ms = pipelined_ms(
                    lambda: idx.search_slots(queries, K), depth=4
                )
                emit(
                    f"hnsw sweep N={N} qd={qd} visited={visited} ef={ef}",
                    B / (ms / 1e3), "qps", recall_at_10=round(rec, 4),
                    recall_at_10_ties=round(rec_ties, 4),
                )


if __name__ == "__main__":
    main()
