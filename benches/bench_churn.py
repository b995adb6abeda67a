"""Forced-refresh availability run (VERDICT r3 next #1 done-criteria).

Streams >=35% of the 1M base corpus into the IVF engine at the DEFAULT
churn policy (rebuild_growth=0.3), so a background refresh is forced
mid-stream, and measures what an operator cares about while it runs:

* write-call wall per batch (p50/p99/max) — the triggering call must not
  stall behind the 50s+ re-layout (the round-3 cliff: maintenance ran
  synchronously inside on_insert while the docs called it background);
* query QPS + live recall between every insert batch AND while the
  maintenance job drains after the stream — availability is continuous;
* the maintenance counters: swaps >= 1, bounded locked-replay stall.

Engine.warmup() runs after build (emitted separately) so per-batch write
walls measure the write path, not first-shape XLA compiles (VERDICT r3
next #9). Shares bench.py's corpus/build caches.
"""

import time

import numpy as np

from bench import BUILD_CACHE, N_PROBE, clustered
from benches.bench_streaming import stream_rows
from benches.common import emit, env_int, recall_at_k

N = env_int("QUIVER_BENCH_N", 1_000_000)
D, B, K = 128, 256, 10
STREAM_BATCH = 8192
# 45 x 8192 = 368,640 rows = 36.9% of base: crosses the 0.3 default
# rebuild_growth threshold mid-stream
STREAM_BATCHES = env_int("QUIVER_BENCH_CHURN_BATCHES", 45)
QUERY_EVERY = env_int("QUIVER_BENCH_CHURN_QUERY_EVERY", 3)


def main():
    import os

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.exact import ExactIndex
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex

    total = N + STREAM_BATCHES * STREAM_BATCH
    corpus = np.concatenate(
        [clustered(N), stream_rows(STREAM_BATCHES * STREAM_BATCH)]
    )
    rng = np.random.default_rng(11)

    store = VectorStore(dim=D, metric="euclidean", capacity=total)
    slots = store.add_batch([f"v{i}" for i in range(N)], corpus[:N])
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=1024, n_probe=N_PROBE or 3, q_cap_factor=2, kmeans_iters=8,
        build_threshold=1024, rescore=False))  # default churn policy
    if N == 1_000_000 and os.path.exists(BUILD_CACHE):
        z = np.load(BUILD_CACHE)
        assign = np.full(store.capacity, -1, np.int64)
        assign[: len(z["assign"])] = z["assign"]
        eng.import_topology(
            {"kind": np.bytes_(b"ivf"), "centroids": z["centroids"],
             "assign": assign, "cmax": np.int64(z["cmax"])},
            np.arange(store.capacity))
    else:
        eng.build()
    exact = ExactIndex(store)

    warm_s = eng.warmup(query_batches=(B,), write_batches=(STREAM_BATCH,))
    emit("ivf warmup (serve+write compile ladder)", warm_s, "s")

    ins_ms, q_ms, recalls, swaps_seen = [], [], [], 0
    at = N
    qps_during_rebuild = []
    for b in range(STREAM_BATCHES):
        rows = corpus[at: at + STREAM_BATCH]
        t0 = time.perf_counter()
        sl = store.add_batch([f"s{at + j}" for j in range(len(rows))], rows)
        eng.on_insert(np.asarray(sl), rows)
        ins_ms.append((time.perf_counter() - t0) * 1e3)
        at += len(rows)
        if b % QUERY_EVERY:
            continue
        qold = corpus[rng.integers(0, N, B // 2)]
        qnew = rows[rng.integers(0, len(rows), B - B // 2)]
        q = (np.concatenate([qold, qnew])
             + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
        t0 = time.perf_counter()
        _, got = eng.search_slots(q, K)
        dt = time.perf_counter() - t0
        q_ms.append(dt * 1e3)
        _, truth = exact.search_slots(q, K)
        recalls.append(recall_at_k(got, truth, K))
        m = eng.get_detailed_metrics()["maintenance"]
        if m["inflight"]:
            qps_during_rebuild.append(B / dt)

    # drain: keep querying while the background job finishes, so the
    # availability window covers the whole rebuild
    while not eng.wait_maintenance(timeout=2.0):
        q = (corpus[rng.integers(0, at, B)]
             + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
        t0 = time.perf_counter()
        _, got = eng.search_slots(q, K)
        dt = time.perf_counter() - t0
        qps_during_rebuild.append(B / dt)
        _, truth = exact.search_slots(q, K)
        recalls.append(recall_at_k(got, truth, K))

    m = eng.get_detailed_metrics()["maintenance"]
    assert m["error"] is None, m["error"]
    assert m["swaps"] >= 1, "stream never forced a maintenance swap"

    # post-swap recall over the FULL corpus
    q = (corpus[rng.integers(0, at, B)]
         + 0.1 * rng.normal(size=(B, D))).astype(np.float32)
    _, got = eng.search_slots(q, K)
    _, truth = exact.search_slots(q, K)
    final_recall = recall_at_k(got, truth, K)

    ins = np.asarray(ins_ms)
    emit(
        f"ivf forced-refresh churn run: stream {STREAM_BATCHES * STREAM_BATCH}"
        f" rows ({STREAM_BATCHES * STREAM_BATCH / N:.0%} of {N}) at default"
        " rebuild_growth=0.3",
        float(np.percentile(ins, 99)), "ms write-call p99",
        write_ms_p50=round(float(np.percentile(ins, 50)), 1),
        write_ms_max=round(float(ins.max()), 1),
        inserts_per_s_steady=round(
            STREAM_BATCH / (float(np.percentile(ins, 50)) / 1e3), 1
        ),
        first_batch_inserts_per_s=round(STREAM_BATCH / (ins[0] / 1e3), 1),
        query_qps_mean=round(
            B / (float(np.mean(q_ms)) / 1e3), 1
        ) if q_ms else None,
        query_qps_during_rebuild_min=round(min(qps_during_rebuild), 1)
        if qps_during_rebuild else None,
        n_rebuild_overlap_samples=len(qps_during_rebuild),
        recall_at_10_live_min=round(float(np.min(recalls)), 4),
        recall_at_10_final=round(final_recall, 4),
        maint_swaps=m["swaps"],
        maint_swap_stall_ms=round(m["last_swap_stall_s"] * 1e3, 2),
    )


if __name__ == "__main__":
    main()
