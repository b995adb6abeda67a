"""Incremental-write workload at 1M: HNSW vs IVF under streaming inserts.

VERDICT r2 next-#6/#8: the graph engine's claimed niche is incremental
writes at beyond-scan scale — this bench tests it head-to-head instead of
asserting it. Both engines build at N=1M (the HNSW build row doubles as
the 1M-build matrix entry), then ingest STREAM_ROWS new rows in batches
while serving queries between batches; recall is measured against the
exact scan over the LIVE corpus (so late-arriving rows count against an
engine that can't see them).

Corpus/caches are shared with bench.py (same clustered generator), so a
warm /tmp makes re-runs cheap. Emits one JSON line per metric.
"""

import os
import time

import numpy as np

from bench import BUILD_CACHE, N_CENTERS, N_PROBE, clustered
from benches.common import emit, env_int, recall_at_k

N = env_int("QUIVER_BENCH_N", 1_000_000)
#: comma list: which engine legs to run (re-running one leg after an
#: engine change shouldn't pay the other's 1M build)
ENGINES = os.environ.get("QUIVER_BENCH_ENGINES", "ivf,hnsw").split(",")
D, B, K = 128, 256, 10
STREAM_BATCH = 8192
STREAM_BATCHES = env_int("QUIVER_BENCH_STREAM_BATCHES", 8)
# v2: full-coverage reverse-edge commit (ops/hnsw_kernels.connect_level) —
# v1 topologies were built with budget-capped back-links and understate
# both build quality and streaming reachability
HNSW_TOPO_CACHE = f"/tmp/hnsw_stream_topo_v2_{N}.npz"


def stream_rows(n: int, seed: int = 777) -> np.ndarray:
    """Fresh in-distribution rows: SAME blob centers as bench.clustered
    (so the stream doesn't read as distribution drift) but an independent
    noise stream. The base corpus must be EXACTLY clustered(N) — the
    generator consumes its RNG as a function of n, so slicing a larger
    draw would silently mismatch bench.py's build/truth caches."""
    centers = np.random.default_rng(0).normal(
        size=(N_CENTERS, D)).astype(np.float32)
    rng = np.random.default_rng(seed)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32)


def _stream(engine, store, corpus, base_n, exact, rng, label):
    """Ingest STREAM_BATCHES x STREAM_BATCH rows, querying between batches.
    The FIRST batch's samples are excluded from the emitted means — they
    carry one-time jit compilation (seconds-scale through the tunnel),
    which would swamp the steady-state rates every other bench warms away."""
    ins_s = []
    q_ms = []
    recalls = []
    at = base_n
    for b in range(STREAM_BATCHES):
        rows = corpus[at: at + STREAM_BATCH]
        t0 = time.perf_counter()
        slots = store.add_batch(
            [f"s{at + j}" for j in range(len(rows))], rows
        )
        engine.on_insert(np.asarray(slots), rows)
        ins_s.append(time.perf_counter() - t0)
        at += len(rows)
        # serve: queries near OLD rows and near the rows JUST inserted —
        # an engine that buffers/hides fresh rows loses recall here
        qold = corpus[rng.integers(0, base_n, B // 2)]
        qnew = rows[rng.integers(0, len(rows), B - B // 2)]
        q = np.concatenate([qold, qnew])
        q = (q + 0.1 * rng.normal(size=q.shape)).astype(np.float32)
        t0 = time.perf_counter()
        _, got = engine.search_slots(q, K)
        q_ms.append((time.perf_counter() - t0) * 1e3)
        _, truth = exact.search_slots(q, K)
        recalls.append(recall_at_k(got, truth, K))
    warm = 1 if STREAM_BATCHES > 1 else 0  # drop the compile-stall sample
    steady_rows = (STREAM_BATCHES - warm) * STREAM_BATCH
    emit(
        f"{label} streaming inserts/s, base N={N} stream "
        f"{STREAM_BATCHES * STREAM_BATCH}",
        steady_rows / sum(ins_s[warm:]), "inserts/s",
        query_qps_during_stream=round(
            B / (float(np.mean(q_ms[warm:])) / 1e3), 1
        ),
        recall_at_10_live=round(float(np.mean(recalls)), 4),
        first_batch_inserts_per_s=round(STREAM_BATCH / ins_s[0], 1),
    )


def main():
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.hnsw import HNSWIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    total = N + STREAM_BATCHES * STREAM_BATCH
    # base EXACTLY matches bench.py's corpus (cache identity); the stream
    # appends fresh same-distribution rows from an independent noise seed
    corpus = np.concatenate(
        [clustered(N), stream_rows(STREAM_BATCHES * STREAM_BATCH)]
    )
    assert len(corpus) == total
    rng = np.random.default_rng(7)

    # ---------------- IVF
    if "ivf" in ENGINES:
        store = VectorStore(dim=D, metric="euclidean", capacity=total)
        store.add_batch([f"v{i}" for i in range(N)], corpus[:N])
        eng = IVFIndex(store, config=IVFConfig(
            n_clusters=1024, n_probe=N_PROBE or 3, q_cap_factor=2,
            kmeans_iters=8, build_threshold=1024, rescore=False))
        if N == 1_000_000 and os.path.exists(BUILD_CACHE):
            z = np.load(BUILD_CACHE)
            assign = np.full(store.capacity, -1, np.int64)
            assign[: len(z["assign"])] = z["assign"]
            eng.import_topology(
                {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
                 "assign": assign, "cmax": np.int64(z["cmax"])},
                np.arange(store.capacity))
        else:
            t0 = time.perf_counter()
            eng.build()
            emit(f"ivf build wall-clock, N={N} d={D}",
                 time.perf_counter() - t0, "s", n_clusters=eng.n_clusters)
        exact = ExactIndex(store)
        warm_s = eng.warmup(query_batches=(B,), write_batches=(STREAM_BATCH,))
        emit("ivf warmup (serve+write compile ladder)", warm_s, "s")
        _stream(eng, store, corpus, N, exact, rng, "ivf")

        # rebuild-under-churn walls (VERDICT r2 weak #8): the cheap
        # re-layout on existing centroids vs a full k-means retrain, at
        # post-stream scale
        t0 = time.perf_counter()
        eng.refresh()
        emit(f"ivf refresh wall (existing centroids), N={store.size}",
             time.perf_counter() - t0, "s")
        t0 = time.perf_counter()
        eng.build()
        emit(f"ivf full rebuild wall (k-means retrain), N={store.size}",
             time.perf_counter() - t0, "s", n_clusters=eng.n_clusters)

    # ---------------- HNSW
    if "hnsw" in ENGINES:
        g_store = VectorStore(dim=D, metric="euclidean", capacity=total)
        g_slots = g_store.add_batch([f"v{i}" for i in range(N)], corpus[:N])
        idx = HNSWIndex(g_store, build_batch=8192,
                        compute_dtype=jnp.bfloat16)
        if os.path.exists(HNSW_TOPO_CACHE):
            idx.import_topology(dict(np.load(HNSW_TOPO_CACHE)),
                                np.arange(g_store.capacity))
            print("# hnsw topology loaded from cache", flush=True)
        else:
            t0 = time.perf_counter()
            idx.on_insert(np.asarray(g_slots), corpus[:N])
            build_s = time.perf_counter() - t0
            emit(f"hnsw build wall-clock, N={N} d={D} M=16 efC=200",
                 build_s, "s", inserts_per_s=round(N / build_s, 1))
            np.savez(HNSW_TOPO_CACHE,
                     **{k: v for k, v in idx.export_topology().items()})
        g_exact = ExactIndex(g_store)
        _stream(idx, g_store, corpus, N, g_exact, rng, "hnsw")


if __name__ == "__main__":
    main()
