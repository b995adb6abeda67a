"""10M x 128-d on one chip (VERDICT r3 next #3).

The flagship claim is "the serving engine at scale", previously shown only
at 1M (~0.5 GB of a ~16 GB chip). This run demonstrates HBM-residency at
10x that: k-means build wall, the engine's device-byte audit
(engine.device_bytes(): blocks + masks + store view — memory_stats() is
unavailable over the tunnel, so accounting is from the buffers), QPS at
the headline batch, and tie-aware recall@10.

Oracle at 10M: the exact f64 host scan costs ~10 min on this 1-core host,
so ground truth is the device exact f32 scan's top-50 re-scored in f64 on
host — the true top-10 under near-ties; same tie-aware counting as
benches/truth.py.

Caches corpus/build to /tmp (the k-means wall is recorded on the cold
pass and reused after).
"""

import os
import time

import numpy as np

from benches.common import emit, env_int

N = env_int("QUIVER_BENCH_10M_N", 10_000_000)
D, K_TOP = 128, 10
N_CENTERS = 10_000
# 32k (not the 1M headline's 65k): the pairs-formulation score matrix is
# ~B*n_probe*cmax*4 B — 2.4 GiB at B=65536/cmax=3072, over the ~2.3 GiB
# left beside the 13.5 GiB resident build
B = env_int("QUIVER_BENCH_B", 32768)
B_ORACLE = 2048
DEPTH = env_int("QUIVER_BENCH_DEPTH", 16)
N_CLUSTERS = env_int("QUIVER_BENCH_10M_K", 4096)
BUILD_CACHE = f"/tmp/quiver_bench_ivf_build_10m_k{N_CLUSTERS}.npz"
TRUTH_CACHE = "/tmp/quiver_bench_truth_10m.npz"


def clustered(n, seed=0, block=2_000_000):
    """Same generator family as bench.py, blocked to bound peak host RAM."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    out = np.empty((n, D), np.float32)
    for s in range(0, n, block):
        e = min(n, s + block)
        which = rng.integers(0, N_CENTERS, e - s)
        out[s:e] = centers[which] + 0.25 * rng.normal(
            size=(e - s, D)).astype(np.float32)
    return out


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    t0 = time.perf_counter()
    vecs = clustered(N)
    print(f"# corpus gen {time.perf_counter() - t0:.0f}s", flush=True)
    rng = np.random.default_rng(1)
    queries = (vecs[:B_ORACLE] + 0.1 * rng.normal(size=(B_ORACLE, D))
               ).astype(np.float32)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    t0 = time.perf_counter()
    bs = 1_000_000
    for s in range(0, N, bs):
        store.add_batch([f"v{i}" for i in range(s, s + bs)], vecs[s: s + bs])
    print(f"# ingest {time.perf_counter() - t0:.0f}s", flush=True)

    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=N_CLUSTERS, n_probe=3, q_cap_factor=2, kmeans_iters=8,
        build_threshold=1024, rescore=False))
    if os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        t0 = time.perf_counter()
        # cache may predate a capacity-ladder change: live slots are
        # 0..N-1 (sequential ingest), rows past capacity are -1 padding
        assign = np.full(store.capacity, -1, np.int64)
        m = min(len(z["assign"]), store.capacity)
        assign[:m] = z["assign"][:m]
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": assign, "cmax": np.int64(z["cmax"])},
            np.arange(store.capacity))
        emit("ivf 10M layout from cached assignment",
             time.perf_counter() - t0, "s")
    else:
        t0 = time.perf_counter()
        eng.build()
        build_s = time.perf_counter() - t0
        emit(f"ivf 10M cold build (k-means K={N_CLUSTERS}, 8 iters"
             " + layout)", build_s, "s",
             inserts_per_s=round(N / build_s, 1))
        assign = np.full(store.capacity, -1, np.int64)
        live = eng._slot_pos[:, 0] >= 0
        assign[live] = eng._slot_pos[live, 0]
        np.savez(BUILD_CACHE, centroids=eng._centroids, assign=assign,
                 cmax=eng._block_slot.shape[1])

    mem = eng.device_bytes()
    emit("ivf 10M device memory", mem["total"] / 2**30, "GiB",
         engine_gib=round(mem["engine"] / 2**30, 2),
         store_gib=round(mem["store"] / 2**30, 2),
         bytes_per_vector=mem["per_vector"])

    # engine answers + f64 distances for recall BEFORE the oracle: the
    # oracle's exact device scan needs HBM headroom that only exists after
    # the engine's block layout is freed, so everything that touches the
    # engine happens first
    _, got = eng.search_slots(queries, K_TOP)
    got = np.asarray(got)
    dg = eng._host_dist_f64(queries, got)

    # throughput: pipelined, unique queries, fetch-last
    qb = (vecs[rng.integers(0, N, B)]
          + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    qj = jnp.asarray(qb)

    def timed_round():
        t0 = time.perf_counter()
        outs = [eng.search_slots_device(qj, K_TOP) for _ in range(DEPTH)]
        _ = np.asarray(outs[-1][0][0, 0])
        return (time.perf_counter() - t0) / DEPTH

    timed_round()
    per_batch = min(timed_round() for _ in range(3))
    del qj

    # oracle: device exact f32 top-50, f64-rescored on host. Free the
    # engine's device blocks first (engine 5.3 GiB + store 8.1 GiB left
    # ~2.3 GiB at 10M and the scan's candidate buffers OOMed even at
    # 512-query chunks — measured RESOURCE_EXHAUSTED, 2026-08-19); the
    # store (the scan's input) stays resident
    np_vectors = store._np_vectors

    def host_f64_l2(q, slots):
        # matches IVFIndex._host_dist_f64 euclidean semantics (sqrt, +inf
        # for sentinel slots) without keeping the engine object alive
        v = np_vectors[np.maximum(slots, 0)].astype(np.float64)
        d = np.sqrt(((q.astype(np.float64)[:, None, :] - v) ** 2).sum(axis=2))
        return np.where(slots >= 0, d, np.inf)

    if os.path.exists(TRUTH_CACHE):
        z = np.load(TRUTH_CACHE)
        d10 = z["d10"]
    else:
        import gc

        del eng
        gc.collect()
        exact = ExactIndex(store)
        t0 = time.perf_counter()
        d10_parts = []
        for s in range(0, B_ORACLE, 512):
            qc = queries[s: s + 512]
            _, cand = exact.search_slots(qc, 50)
            dc = host_f64_l2(qc, np.asarray(cand))
            dc.sort(axis=1)
            d10_parts.append(dc[:, K_TOP - 1])
        d10 = np.concatenate(d10_parts)
        print(f"# oracle {time.perf_counter() - t0:.0f}s", flush=True)
        np.savez(TRUTH_CACHE, d10=d10)

    thr = d10 * (1 + 1e-6) + 1e-12
    recall = float(np.minimum(
        ((got >= 0) & (dg <= thr[:, None])).sum(axis=1), K_TOP
    ).mean() / K_TOP)

    emit(f"ivf 10M x {D}-d QPS/chip, B={B}, n_probe=3,"
         f" recall@10={recall:.3f} (tie-aware)",
         B / per_batch, "qps",
         batch_latency_ms=round(per_batch * 1e3, 3),
         recall_at_10=round(recall, 4))


if __name__ == "__main__":
    main()
