"""BASELINE config #5: persistence (Parquet + Arrow IPC) + negative rerank."""

import os
import tempfile
import time

import numpy as np

from benches.common import emit, env_int, make_corpus, pipelined_ms


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.persistence.arrow_io import load_arrow_ipc, save_arrow_ipc
    from quiver_tpu.persistence.parquet_io import (
        read_vectors_parquet,
        write_vectors_parquet,
    )

    N = env_int("QUIVER_BENCH_N", 100_000)
    D, B, K = 128, 256, 10
    vecs, rng = make_corpus(N, D)
    ids = [f"v{i}" for i in range(N)]
    mds = [{"i": i} for i in range(N)]
    with tempfile.TemporaryDirectory() as td:
        pq = os.path.join(td, "v.parquet")
        t0 = time.perf_counter()
        write_vectors_parquet(pq, ids, vecs, mds)
        emit(f"parquet snapshot write, N={N}", time.perf_counter() - t0, "s",
             mb=round(os.path.getsize(pq) / 1e6, 1))
        t0 = time.perf_counter()
        read_vectors_parquet(pq)
        emit(f"parquet snapshot read, N={N}", time.perf_counter() - t0, "s")
        ar = os.path.join(td, "v.arrow")
        t0 = time.perf_counter()
        save_arrow_ipc(ar, ids, vecs, mds)
        emit(f"arrow ipc write, N={N}", time.perf_counter() - t0, "s")
        t0 = time.perf_counter()
        load_arrow_ipc(ar)
        emit(f"arrow ipc read (mmap), N={N}", time.perf_counter() - t0, "s")

    store = VectorStore(dim=D, metric="euclidean", capacity=max(N, 1024))
    store.add_batch(ids, vecs)
    idx = ExactIndex(store, compute_dtype=jnp.bfloat16, approx_recall=0.95)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    neg = rng.normal(size=(B, D)).astype(np.float32)
    ms = pipelined_ms(
        lambda: idx.search_slots(queries, K, negative=neg, negative_weight=0.5),
        depth=4,
    )
    emit(f"negative-example rerank QPS, N={N}", B / (ms / 1e3), "qps")


if __name__ == "__main__":
    main()
