"""IVF vs flat-scan recall/QPS frontier on the real chip: 1M x 128-d L2
clustered corpus (BASELINE config — the headline engine's tuning bench).

Sweeps n_probe x rescore through the engine's device serving path;
tie-aware recall vs a cached exact f64 oracle (benches/truth.py). Timing
is pipelined with a fetch-last (axon tunnel rule).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.truth import exact_truth_f64, recall_with_ties

N, D, B, K_TOP = 1_000_000, 128, 2048, 10
N_CENTERS = 1000  # synthetic blob count (SIFT-like local structure)
DEPTH = 16
TRUTH_CACHE = "/tmp/truth_f64_1m.npz"


def clustered(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CENTERS, D)).astype(np.float32)
    which = rng.integers(0, N_CENTERS, n)
    out = centers[which] + 0.25 * rng.normal(size=(n, D)).astype(np.float32)
    return out.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from quiver_tpu.core.store import VectorStore
    from quiver_tpu.index.ivf import IVFConfig, IVFIndex
    from quiver_tpu.ops.scan import flat_scan_topk

    print("devices:", jax.devices(), flush=True)
    vecs = clustered(N)
    rng = np.random.default_rng(1)
    queries = (vecs[:B] + 0.1 * rng.normal(size=(B, D))).astype(np.float32)

    if os.path.exists(TRUTH_CACHE):
        d10 = np.load(TRUTH_CACHE)["d"][:, K_TOP - 1]
    else:
        idx, dst = exact_truth_f64(queries, vecs, K_TOP)
        np.savez(TRUTH_CACHE, i=idx, d=dst)
        d10 = dst[:, K_TOP - 1]

    store = VectorStore(dim=D, metric="euclidean", capacity=N)
    store.add_batch([f"v{i}" for i in range(N)], vecs)
    view = store.device_view()
    qd = jnp.asarray(queries)

    # flat-scan serving path reference point (bf16 + approx)
    corpus16 = view.vectors.astype(jnp.bfloat16)

    def flat():
        return flat_scan_topk(
            qd, corpus16, view.valid, None, view.norms_sq, view.inv_norms,
            metric="euclidean", k=K_TOP, tile=view.capacity,
            compute_dtype=jnp.bfloat16, approx_recall=0.95)

    def timed(fn):
        outs = [fn() for _ in range(2)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(DEPTH)]
        _ = np.asarray(outs[-1][0]).ravel()[:1]
        return (time.perf_counter() - t0) / DEPTH

    d, i = flat()
    rec = recall_with_ties(np.asarray(i), queries, vecs, d10, K_TOP)
    dt = timed(flat)
    print(f"flat bf16+approx: {dt*1e3:.2f} ms/batch = {B/dt:,.0f} QPS  "
          f"true recall {rec:.4f}", flush=True)

    t0 = time.perf_counter()
    eng = IVFIndex(store, config=IVFConfig(
        n_clusters=1024, n_probe=8, kmeans_iters=8, build_threshold=1024))
    eng.build()
    print(f"IVF build: {time.perf_counter()-t0:.1f}s "
          f"K'={eng.n_clusters} Cmax={eng._block_slot.shape[1]} "
          f"fill={eng._fill.sum()/eng._block_slot.size:.2f}", flush=True)

    for rescore in (False, True):
        eng.config.rescore = rescore
        for n_probe in (4, 8, 16):
            eng.config.n_probe = n_probe
            d, i = eng.search_slots_device(qd, K_TOP)
            rec = recall_with_ties(np.asarray(i), queries, vecs, d10, K_TOP)
            dt = timed(lambda: eng.search_slots_device(qd, K_TOP))
            print(f"IVF rescore={str(rescore):5s} n_probe={n_probe:3d}: "
                  f"{dt*1e3:.2f} ms/batch = {B/dt:,.0f} QPS  "
                  f"true recall {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
