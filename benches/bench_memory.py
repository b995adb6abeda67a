"""Bytes/vector per engine — the memory side of "≥10x at equal memory"
(VERDICT r3 next #3; reference contrast: B/op columns in
/root/reference/final_bench.txt:18-19).

Builds each engine over the same 200k x 128-d clustered corpus and emits
its device-buffer footprint from ``device_bytes()`` (utils/memory.py):
engine-own bytes (blocks/graph/masks), the shared store copy, and
bytes/vector. Per-row cost is size-independent past ~100k rows, so the
200k figures transfer; the 10M run (bench_10m) records the same audit at
scale. Implied max-N-per-chip = usable HBM / bytes-per-vector.
"""

import numpy as np

from benches.common import emit, env_int

N = env_int("QUIVER_BENCH_MEM_N", 200_000)
D = 128


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(1000, D)).astype(np.float32)
    which = rng.integers(0, 1000, n)
    return (centers[which] + 0.25 * rng.normal(size=(n, D))
            ).astype(np.float32)


def audit(name, store, mem, extra=""):
    emit(
        f"device memory, {name} (N={N} x {D}-d{extra})",
        mem["total"] / 2**20, "MiB",
        engine_mib=round(mem["engine"] / 2**20, 1),
        store_mib=round(mem["store"] / 2**20, 1),
        bytes_per_vector=mem["per_vector"],
    )


def main():
    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.hnsw import HNSWIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    vecs = clustered(N)
    ids = [f"v{i}" for i in range(N)]

    store = VectorStore(dim=D, metric="euclidean")
    slots = store.add_batch(ids, vecs)
    # exact = the store's device view alone (vectors + norms + validity);
    # the view is lazily materialized, so force it before measuring
    store.device_view()
    from quiver_tpu.utils.memory import store_device_bytes

    store_b = store_device_bytes(store)
    emit(
        f"device memory, exact (N={N} x {D}-d)",
        store_b / 2**20, "MiB", engine_mib=0.0,
        store_mib=round(store_b / 2**20, 1),
        bytes_per_vector=round(store_b / N, 1),
    )

    ivf = IVFIndex(store, config=IVFConfig(
        n_clusters=512, n_probe=3, kmeans_iters=6, build_threshold=1024))
    ivf.on_insert(np.asarray(slots), vecs)
    audit("ivf", store, ivf.device_bytes(), extra=", K=512 bf16 blocks")

    g_store = VectorStore(dim=D, metric="euclidean")
    g_slots = g_store.add_batch(ids, vecs)
    import jax.numpy as jnp

    g = HNSWIndex(g_store, build_batch=8192, compute_dtype=jnp.bfloat16)
    g.on_insert(np.asarray(g_slots), vecs)
    audit("hnsw", g_store, g.device_bytes(), extra=", M=16")


if __name__ == "__main__":
    main()
