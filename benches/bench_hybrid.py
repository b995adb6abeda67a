"""BASELINE config #3: hybrid adaptive selection under batched mixed load."""

import numpy as np

from benches.common import emit, env_int, make_corpus, pipelined_ms


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.hybrid import HybridIndex

    N = env_int("QUIVER_BENCH_N", 20_000)
    D, B, K = 64, 128, 10
    vecs, rng = make_corpus(N, D)
    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    idx = HybridIndex(store, compute_dtype=jnp.bfloat16, build_batch=8192)
    slots = store.add_batch([f"v{i}" for i in range(N)], vecs)
    idx.on_insert(slots, vecs)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    # mixed load: alternating adaptive / forced-exact batches
    idx.search_slots(queries, K)
    idx.search_slots(queries, K, exact=True)
    ms = pipelined_ms(lambda: idx.search_slots(queries, K), depth=4)
    emit(f"hybrid adaptive QPS, N={N} d={D}", B / (ms / 1e3), "qps",
         strategy=idx.last_strategy,
         exact_threshold=idx.selector.exact_threshold)

    # IVF-backed hybrid (ann_backend="ivf"): the TPU-first configuration
    idx2 = HybridIndex(store, compute_dtype=jnp.bfloat16, ann_backend="ivf")
    idx2.on_insert(slots, vecs)
    idx2.search_slots(queries, K)
    ms = pipelined_ms(lambda: idx2.search_slots(queries, K), depth=4)
    emit(f"hybrid adaptive QPS (ivf backend), N={N} d={D}", B / (ms / 1e3),
         "qps", strategy=idx2.last_strategy)


if __name__ == "__main__":
    main()
