"""IVF vs flat-scan on the real chip: 1M x 128, clustered corpus.

Sweeps n_probe (and optionally K / batch) for the recall/QPS frontier;
recall vs the f32 exact oracle (cached on disk — it costs ~250 s to
compute). Timing is pipelined with a host fetch (axon tunnel rule)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, B, K = 1_000_000, 128, 2048, 10
N_CENTERS = 1000  # synthetic blob count (SIFT-like local structure)
DEPTH = 16
ORACLE_CACHE = "/tmp/ivf_oracle_1m.npy"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32), centers, which


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.scan import flat_scan_topk

    print("devices:", jax.devices(), flush=True)
    vecs, centers, which = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    view = store.device_view()
    qd = jnp.asarray(queries)

    # exact f32 oracle (halved: full-sort top_k at B x 1M is heavy); cached
    if os.path.exists(ORACLE_CACHE):
        oracle = np.load(ORACLE_CACHE)
        print("oracle loaded from cache", flush=True)
    else:
        half = B // 2
        t0 = time.perf_counter()
        oracle = np.concatenate([
            np.asarray(flat_scan_topk(
                qd[i:i + half], view.vectors, view.valid, None,
                view.norms_sq, view.inv_norms,
                metric="euclidean", k=K, tile=view.capacity)[1])
            for i in (0, half)
        ])
        np.save(ORACLE_CACHE, oracle)
        print(f"oracle done in {time.perf_counter()-t0:.1f}s", flush=True)

    # flat-scan serving path reference point (bf16 + approx)
    corpus16 = view.vectors.astype(jnp.bfloat16)

    def flat():
        return flat_scan_topk(
            qd, corpus16, view.valid, None, view.norms_sq, view.inv_norms,
            metric="euclidean", k=K, tile=view.capacity,
            compute_dtype=jnp.bfloat16, approx_recall=0.95)[0]

    def timed(fn):
        outs = [fn() for _ in range(2)]
        _ = np.asarray(outs[-1])[:1]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(DEPTH)]
        _ = np.asarray(outs[-1])[:1]
        return (time.perf_counter() - t0) / DEPTH

    dt = timed(flat)
    print(f"flat bf16+approx: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} QPS", flush=True)

    for n_clusters in (4096, 2048):
        t0 = time.perf_counter()
        eng = IVFIndex(store, config=IVFConfig(
            n_clusters=n_clusters, n_probe=8, kmeans_iters=8,
            build_threshold=1024))
        eng.build()
        print(f"IVF build K={n_clusters} (8 iters): "
              f"{time.perf_counter()-t0:.1f}s Cmax={eng._block_slot.shape[1]} "
              f"K'={eng.n_clusters} "
              f"fill={eng._fill.sum()/eng._block_slot.size:.2f}", flush=True)

        for n_probe in (4, 8, 16):
            eng.set_optimization_parameters(n_probe=n_probe)
            d, i = eng.search_slots(queries, K)  # warm compile + recall
            rec = np.mean([
                len(set(i[b].tolist()) & set(oracle[b].tolist())) / K
                for b in range(B)
            ])

            def ivf_once():
                dev = store.device_view()
                cent_j, c_ns = eng._cent_dev
                from quiver_tpu.ops.ivf_kernels import ivf_query
                return ivf_query(
                    qd, cent_j, c_ns, eng._blocks, eng._block_slot,
                    eng._block_ns, eng._block_inv, eng._keep_dev(),
                    dev.vectors,
                    metric="euclidean", k=K, n_probe=n_probe,
                    q_cap=eng._q_cap(B, n_probe, eng.n_clusters),
                    compute_dtype=eng.compute_dtype,
                    oversample=eng.config.oversample,
                    probe_approx=eng.config.probe_approx,
                    probe_sel_approx=eng.config.probe_sel_approx)[0]

            dt = timed(ivf_once)
            print(f"IVF K={n_clusters} n_probe={n_probe:3d}: "
                  f"{dt*1e3:.2f} ms/batch = {B/dt:,.0f} QPS  "
                  f"recall@10={rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
